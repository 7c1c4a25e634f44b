package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the third graph
  * primitive next to [[Dedup.resolveClusters]] (min-label propagation)
  * and [[Dedup.resolveClustersStars]] (star contraction): those answer
  * "which nodes belong together", PageRank answers "which nodes
  * MATTER". On a near-dup or citation graph over a training corpus,
  * rank picks the canonical document per neighborhood better than
  * naive per-cluster argmax when clusters are large and uneven; on an
  * entity graph it is the classic importance score.
  *
  * All rank arithmetic is 2^40 fixed-point over BIGINT (integer
  * division throughout), so every iteration — not just the fixed
  * point — is bit-identical across engines and the whole trajectory
  * is SQL-oracle-replayable, the same contract as
  * [[VectorStats.pcaProject]].
  */
object Graph {

  private val Scale = 1L << 40

  /** Node-keyed sides below this many keys are broadcast inside the
    * iterative operators (a node key + a long ≈ 16 bytes → ~128 MB at
    * the limit). The operators COUNT their input once (cheap — the
    * edge list is already checkpoint-materialized) and pick the plan,
    * because lazily-checkpointed leaves expose no size statistics for
    * AQE to make the same call. Graphs above the limit keep the
    * all-shuffle shape, which spills and scales to billions of
    * nodes. */
  val BroadcastNodeLimit: Long = 8L * 1000 * 1000

  /** Damped PageRank after `iters` synchronous iterations.
    *
    * `edges` is a directed edge list `(src, dst)` (any atomic key
    * type); multi-edges should be pre-`distinct`ed by the caller if
    * unwanted. Output: `(node, rank_fp, rank)` — the 2^40 fixed-point
    * rank and its exact double view (rank_fp < 2^41, so the division
    * by 2^40 is bit-exact in double on every engine).
    *
    * Per iteration (rank mass `r`, damping `d` = `dampingPct`/100,
    * `n` nodes, all in integer arithmetic):
    * {{{
    *   r'(v) = (100-d)% of S/n  +  d% of ( Σ_{u→v} r(u) div outdeg(u)
    *                                       + danglingMass div n )
    * }}}
    * where `danglingMass` is the summed rank of nodes with no
    * out-edges, redistributed uniformly (the standard correction —
    * without it a sink swallows mass every round).
    *
    * Scale shape: the driver holds only the node COUNT (one scalar);
    * ranks never leave the cluster. Each iteration costs two
    * key-shuffles of `(node, long)` pairs — the edge list joins the
    * 16-byte rank table on `src` (edge payloads are just the two
    * keys), partial-aggregated `sum` on `dst`, then a key-equi left
    * join back to the node set; the dangling term is a 1-row
    * aggregate broadcast back, never a shuffle. Rank state is
    * `localCheckpoint`ed per round (the [[Dedup.resolveClusters]]
    * pattern), so the lineage stays one-iteration deep no matter how
    * many rounds run. Edges and nodes are checkpointed once and
    * re-scanned from executor storage every round — at 100 TB the
    * fact-table join that DERIVED the edges runs once, not
    * per-iteration. */
  def pageRank(edges: DataFrame, iters: Int = 8, dampingPct: Int = 85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    // the edge list is materialized HASH-PARTITIONED BY dst (one
    // edge-sized shuffle, paid once before the loop): the per-round
    // received-mass aggregation groups by dst, so the checkpointed
    // partitioning satisfies its clustering and the round's Exchange
    // disappears — 8 node-keyed shuffles traded for one up-front edge
    // shuffle (guide §2.4: operations keyed the same way share one
    // exchange). localCheckpoint preserves outputPartitioning, so
    // every round's plan sees hash(dst).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("dst"))
      .localCheckpoint(eager = false) // re-scanned every iteration
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false) // re-joined every iteration
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge list")
    val init = Scale / n
    val base = (100L - dampingPct) * init / 100L
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // the loop state fuses (node, outdeg, rank) into ONE checkpointed
    // frame: out-degree is static, so carrying it kills both the
    // per-round outdeg join and the dangling ANTI-join (dangling ⇔
    // outdeg = 0, a plain aggregate over the state)
    var state = nodes
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        lit(init).as("rank"))
      .localCheckpoint()
    // the per-source contribution table is node-keyed: below the
    // broadcast limit it rides a broadcast into the edge join, so the
    // edge list never shuffles inside the loop (re-scanned map-side
    // each round); above it, the key-equi shuffle shape scales
    // unbounded
    val small = n <= BroadcastNodeLimit
    def nodeSide(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    var it = 0
    while (it < iters) {
      val contrib = state.where(col("outdeg") > 0)
        .select(col("node").as("src"), expr("rank div outdeg").as("c"))
      // recv is NOT broadcast: the (node, recv) partial agg flows into
      // the state-update join as an AQE stage of the same query — the
      // state side reuses the checkpoint's hash(node) partitioning, so
      // no extra exchange appears, and the separate per-round
      // broadcast-build query (plan + job + collect) is gone. The edge
      // join keeps the broadcast(contrib) map-side shape below the
      // node limit, so `e` still never shuffles inside the loop.
      val recv = e.join(nodeSide(contrib), "src")
        .groupBy(col("dst").as("node")).agg(sum("c").as("recv"))
      val dangling = state.agg(
        sum(when(col("outdeg") === 0L, col("rank")).otherwise(lit(0L)))
          .as("dm"))
      state = state.select("node", "outdeg")
        .join(recv, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("outdeg"),
          expr(s"$base + ($dampingPct * (coalesce(recv, 0L) + dm div $n))" +
            " div 100").as("rank"))
        // checkpoint every round: each round must materialize exactly
        // once (un-materialized rounds re-execute inside every later
        // round's broadcast build — measured O(rounds²) blowup)
        .localCheckpoint()
      it += 1
    }
    state.select(col("node"), col("rank").as("rank_fp"),
      (col("rank").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** k-core of an undirected graph by synchronous peeling — the
    * density primitive next to [[pageRank]] (importance),
    * [[triangles]] (local clustering) and [[Dedup.resolveClusters]]
    * (membership): the k-core is the maximal subgraph where every
    * node keeps ≥ k neighbors, the standard "dense nucleus" filter on
    * a near-dup or co-occurrence graph (template farms and SEO rings
    * survive aggressive k; organically linked documents don't).
    *
    * `edges` is any edge list `(src, dst)`; direction, duplicates and
    * self-loops are normalized away. Each round recomputes surviving
    * degrees and drops every node below `k` — the synchronous variant
    * of the classic peel, so the trajectory is deterministic and an
    * unrolled-SQL oracle replays it round for round. `rounds` bounds
    * the cascade depth; once a round drops nothing the iteration is
    * at the true k-core and further rounds are no-ops (callers size
    * `rounds` to their graph; the spec asserts convergence on the
    * test graphs). Output: `(node, deg)` — survivors of the peeled
    * subgraph with their within-subgraph degree (empty when the whole
    * graph dissolves).
    *
    * Scale shape: the edge list is (key, key) pairs, checkpointed
    * every round so lineage stays one round deep. A round is one
    * partial-agg'd degree count (16-byte rows) plus two payload-free
    * semi-joins of edges against the ≥k node set. The node set is
    * DATA-ADAPTIVELY broadcast: the initial edge count (one action on
    * the already-checkpointed list) bounds the node count, and below
    * [[BroadcastNodeLimit]] keys the ≥k set rides a broadcast so the
    * edge list never shuffles inside the loop — the same runtime
    * size-based join choice AQE makes, decided here because a lazy
    * checkpoint leaf carries no stats. Above the limit every round is
    * plain key-equi hash joins that spill; nothing per-node ever sits
    * in one executor's memory either way, and the corpus that derived
    * the edges is scanned exactly once, before round 0. */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // one scan of the edge list (explode, not a union of two scans)
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    // nodes ≤ 2·edges; the ≥k set only shrinks from there
    val small = e.count() * 2 <= BroadcastNodeLimit
    var it = 0
    while (it < rounds) {
      val keep0 = degrees(e).where(col("deg") >= k).select("node")
      val keep = if (small) broadcast(keep0) else keep0
      e = e.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        // every round materializes once; skipping this re-executes
        // prior rounds inside each later broadcast build (O(rounds²))
        .localCheckpoint()
      it += 1
    }
    degrees(e)
  }

  /** Synchronous label propagation (q70) — community detection, the
    * fourth graph primitive: [[Dedup.resolveClusters]] answers "which
    * nodes are CONNECTED" (components — every path counts),
    * [[pageRank]] answers "which nodes matter"; LPA answers "which
    * nodes cluster DENSELY" — a bridge edge between two tight
    * communities keeps them one component but LPA splits them,
    * which is the right grain for topic-bucketing a co-occurrence
    * graph. The classic algorithm (Raghavan et al. 2007) made
    * deterministic: every node starts as its own label, and each
    * synchronous round adopts the label most frequent among its
    * neighbors, ties to the SMALLEST label (the published random
    * tie-break is replaced by the total order, so every round — not
    * just the fixpoint — replays bit-for-bit as unrolled oracle
    * CTEs; synchronous LPA can oscillate on bipartite structure,
    * which fixed rounds + the exact trajectory gate make visible
    * instead of hiding).
    *
    * Per round: one key-equi join of the directed neighbor list with
    * the 16-byte label table, a (node, label) partial-agg count, and
    * a per-node `min_by((-count, label))` argmax — two narrow
    * shuffles, no corpus-sized window. Below [[BroadcastNodeLimit]]
    * nodes the label table rides a broadcast into the message join
    * (decided by ONE count of the materialized edge list — lazy
    * checkpoint leaves carry no stats for AQE); labels checkpoint per
    * round (the [[Dedup.resolveClusters]] pattern — lineage stays one
    * round deep). Output: `(node, lbl)` after `rounds` rounds. */
  def labelPropagation(edges: DataFrame, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    // directed neighbor list materialized HASH-PARTITIONED BY node
    // (guide §2.4): each round's vote is groupBy(node, lbl) then
    // groupBy(node) — hash(node) clusters BOTH (a partitioning on a
    // subset of the grouping keys satisfies the clustering), so the
    // rounds run with ZERO exchanges below the broadcast limit; one
    // edge-sized shuffle before the loop replaces 2·rounds node-keyed
    // ones. localCheckpoint preserves outputPartitioning.
    val dir = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
      .repartition(col("node"))
      .localCheckpoint()
    // the label-table broadcast decision uses the EXACT node count,
    // not kCore's nodes ≤ 2·edges bound: the node frame is needed for
    // label init anyway, and on a dense co-occurrence graph the bound
    // is loose by the average degree — measured 11× slower at 10×
    // data when 200k nodes fell off the broadcast path because 5M
    // edges tripped the bound
    val nodes = dir.select("node").distinct().localCheckpoint()
    val small = nodes.count() <= BroadcastNodeLimit
    var labels = nodes.withColumn("lbl", col("node"))
      .localCheckpoint()
    var it = 0
    while (it < rounds) {
      val lbls0 = labels.withColumnRenamed("node", "nbr")
      val lbls = if (small) broadcast(lbls0) else lbls0
      labels = dir.join(lbls, Seq("nbr"))
        .groupBy("node", "lbl").agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"),
          col("lbl").as("tl"))).as("lbl"))
        .localCheckpoint()
      it += 1
    }
    labels.select("node", "lbl")
  }

  /** Incremental community membership against a STANDING
    * [[labelPropagation]] label table (q71) — the graph family's
    * `*Against` member (the dd9/ss20/t25 standing-model discipline):
    * every index family serves arrivals at batch cost against a
    * frozen artifact, and before this the graph ops were the
    * exception — an arriving edge batch forced a full multi-round
    * re-run. Here each NEW node (present in the edge batch, absent
    * from the frozen table) adopts the most frequent FROZEN label
    * among its neighbors, ties to the smallest label (exactly one
    * synchronous LPA round against frozen state — the same vote rule
    * as [[labelPropagation]]); a new node with no labeled neighbor
    * keeps itself as its own label (the LPA init), surfacing as a
    * new singleton community until the next scheduled full re-run
    * (the ss28 retrain discipline — incremental assignment serves
    * arrivals, the full algorithm remains the scheduled offline
    * event that absorbs drift).
    *
    * Scale shape: the arriving batch normalizes and directs its own
    * edges (batch-sized), one anti-join against the frozen table
    * finds the new nodes, one key-equi join attaches frozen labels
    * to their neighbors, and the vote is a (node, label) partial agg
    * + `min_by` argmax — the 100 TB label table is probed by key,
    * never re-shuffled, and the corpus that derived the standing
    * labels is not touched at all. Votes between two NEW nodes
    * contribute nothing (neither side has a frozen label) — the
    * frozen table is the only authority, which is what makes the
    * assignment deterministic and oracle-replayable regardless of
    * batch arrival order. Streaming-legal in `foreachBatch` (proven
    * live in StreamingSpec).
    *
    * Output: `(node, lbl, n_votes)` for the NEW nodes only —
    * `n_votes` is the winning label's neighbor count (0 for a
    * singleton), the confidence signal a router thresholds on. */
  def labelPropagationAgainst(labels: DataFrame, newEdges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val und = newEdges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = false) // nodes + both directed legs
    val dir = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
    val fresh = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node"))).distinct()
      .join(labels.select("node"), Seq("node"), "left_anti")
    val votes = dir
      .join(fresh, Seq("node"), "left_semi")
      .join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
      .groupBy("node", "lbl").agg(count(lit(1)).as("c"))
      .groupBy("node")
      .agg(min_by(struct(col("lbl"), col("c")),
        struct((-col("c")).as("nc"), col("lbl").as("tl"))).as("w"))
      .select(col("node"), col("w.lbl").as("lbl"),
        col("w.c").as("n_votes"))
    fresh.join(votes, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("lbl"), col("node")).as("lbl"),
        coalesce(col("n_votes"), lit(0L)).as("n_votes"))
  }

  /** Drift census for a STANDING [[labelPropagation]] label table
    * (q72) — the guard-observability discipline the other standing
    * models already have (ss26's out-of-grid ppm schedules ss27's
    * stats refresh) applied to the graph family's newest artifact:
    * [[labelPropagationAgainst]] BY DESIGN ignores edges arriving
    * between two frozen nodes — communities never merge until the
    * scheduled full re-run — and before this nothing MEASURED that
    * drift, so the re-run had no number to trigger on.
    *
    * One row of scheduler-grade counters over the edges accumulated
    * since the freeze:
    *  - `n_edges` — normalized arriving edges;
    *  - `n_cross_edges` / `n_cross_pairs` — edges whose endpoints are
    *    BOTH frozen with DIFFERENT labels, and how many distinct
    *    community pairs they bridge: the frozen table cannot absorb
    *    these (they are invisible to the incremental vote), so this
    *    is THE number that schedules the full [[labelPropagation]]
    *    re-run;
    *  - `n_intra_edges` — both-frozen same-label arrivals (absorbed
    *    drift: density grows, membership doesn't);
    *  - `n_new_nodes` / `n_new_singletons` — arrivals the incremental
    *    vote CAN serve, and the subset it can only self-label (no
    *    frozen neighbor): a rising singleton share means whole new
    *    communities are forming outside the frozen table.
    *
    * Scale shape: the batch normalizes itself (batch-sized); the
    * frozen table is probed by TWO key-equi joins (endpoint
    * annotation) and one semi-join (voted-neighbor check) — probed by
    * key, never re-shuffled in full; every aggregate is a partial-agg
    * collapse to one row. Streaming-legal in `foreachBatch`. */
  def lpaDriftCensus(labels: DataFrame, newEdges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    // ONE annotation pass feeds the edge census, the pair census, and
    // the new-node leg — the frozen table is probed exactly twice
    // (endpoint labels) + once (voted check), never per-counter
    val ann = annotateDrift(labels, newEdges, srcCol, dstCol)
      .localCheckpoint(eager = false)
    val edgeCensus = ann.agg(
      count(lit(1)).as("n_edges"),
      coalesce(sum(when(col("la").isNotNull && col("lb").isNotNull &&
        col("la") === col("lb"), 1L).otherwise(0L)), lit(0L))
        .as("n_intra_edges"))
    val pairCensus = driftPairsOf(ann)
      .agg(coalesce(sum("n_edges"), lit(0L)).as("n_cross_edges"),
        count(lit(1)).as("n_cross_pairs"))
    // new-node leg: arrivals absent from the frozen table, split by
    // whether any neighbor carries a frozen label (the vote the
    // incremental assignment would get)
    val und = ann.select("a", "b")
    val dir = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
    val fresh = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node"))).distinct()
      .join(labels.select("node"), Seq("node"), "left_anti")
    val voted = dir.join(fresh, Seq("node"), "left_semi")
      .join(labels.select(col("node").as("nbr")), Seq("nbr"), "left_semi")
      .select("node").distinct().withColumn("has_vote", lit(1L))
    val newCensus = fresh.join(voted, Seq("node"), "left")
      .agg(count(lit(1)).as("n_new_nodes"),
        coalesce(sum(when(col("has_vote").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_new_singletons"))
    edgeCensus.crossJoin(broadcast(pairCensus))
      .crossJoin(broadcast(newCensus))
      .select("n_edges", "n_cross_edges", "n_cross_pairs",
        "n_intra_edges", "n_new_nodes", "n_new_singletons")
  }

  /** Per-community-pair detail behind [[lpaDriftCensus]]: how many
    * since-freeze edges bridge each pair of frozen communities —
    * `(lbl_a, lbl_b, n_edges)`, lbl_a < lbl_b. The triage view an
    * operator reads when the census's `n_cross_edges` trips: two
    * heavily-bridged communities are a merge the next full re-run
    * will perform; many lightly-bridged pairs are noise. */
  def lpaDriftPairs(labels: DataFrame, newEdges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    driftPairsOf(annotateDrift(labels, newEdges, srcCol, dstCol))

  private def driftPairsOf(ann: DataFrame): DataFrame =
    ann.filter(col("la").isNotNull && col("lb").isNotNull &&
        col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("lbl_a"),
        greatest(col("la"), col("lb")).as("lbl_b"))
      .groupBy("lbl_a", "lbl_b").agg(count(lit(1)).as("n_edges"))

  /** Normalized arriving edges with both endpoints' frozen labels
    * attached (null = not frozen) — shared by the census and the
    * per-pair detail. */
  private def annotateDrift(labels: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val und = newEdges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    und
      .join(labels.select(col("node").as("a"), col("lbl").as("la")),
        Seq("a"), "left")
      .join(labels.select(col("node").as("b"), col("lbl").as("lb")),
        Seq("b"), "left")
  }

  /** Per-node triangle counts via degree-oriented wedge counting —
    * the clustering-structure primitive next to [[pageRank]]
    * (importance) and [[Dedup.resolveClusters]] (membership): on a
    * co-occurrence or near-dup graph, a node's triangle count is the
    * standard local-clustering signal (dense cliques of templated
    * boilerplate score high; genuinely diverse documents low).
    *
    * `edges` is any edge list `(src, dst)`; direction, duplicates and
    * self-loops are normalized away (undirected simple graph).
    * Output: `(node, deg, triangles)` for every node, zero rows kept.
    *
    * The naive plan — join adjacency with itself per node — is
    * O(Σ deg²) and dies on the first celebrity node. The classic fix
    * (node-iterator++ / Schank): orient each undirected edge from the
    * (degree, node)-smaller endpoint to the larger, so every oriented
    * out-neighborhood is bounded by O(√m) REGARDLESS of skew. On the
    * oriented graph a triangle (u,v,w) exists iff w ∈ N⁺(u) ∩ N⁺(v)
    * for the oriented edge u→v, and it surfaces at exactly ONE edge —
    * so the plan is edge-iterator: build the oriented adjacency
    * lists, give every edge its endpoints' two lists, and intersect.
    * The O(m^1.5) candidate-wedge stream is never MATERIALIZED as
    * rows (a measured 41M-row, multi-GB wedge join at sf0.1 — and its
    * two-key semi-probe — collapses into per-row array intersections
    * inside one projection).
    *
    * Shuffle shape at 100 TB: the adjacency build is one partial-agg
    * shuffle of the m oriented (key,key) pairs; each list is O(√m)
    * long by the orientation bound, so rows stay bounded. Below
    * [[BroadcastNodeLimit]] edges (decided by ONE count of the
    * materialized edge list — checkpoint leaves carry no stats for
    * AQE) the adjacency table rides broadcasts into the edge
    * annotation joins, which then run map-side; above it they are
    * plain key-equi hash joins that spill. Per-node counts are a
    * partial-agg'd union of the three credit streams (u, v from the
    * intersection size; w from exploding the intersection — one row
    * per triangle, not per candidate). */
  def triangles(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    // canonical undirected simple edges: a < b; eagerly materialized —
    // it is scanned for deg, orient and closure, and its count picks
    // the closure-join strategy below
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val m = und.count()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    // orient low (deg, node) → high: out-degree ≤ O(√m) everywhere.
    // The degree table is node-keyed — broadcast below the limit so
    // the edge list annotates map-side instead of shuffling twice
    def degSide(d: DataFrame): DataFrame =
      if (m <= BroadcastNodeLimit) broadcast(d) else d
    val ab = und
      .join(degSide(deg.select(col("node").as("a"), col("deg").as("da"))), "a")
      .join(degSide(deg.select(col("node").as("b"), col("deg").as("db"))), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = ab.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint(eager = false) // adjacency build + edge stream
    // oriented out-adjacency: one partial-agg'd shuffle, each list
    // bounded O(√m) by the orientation. Long node keys get SORTED
    // lists so the intersection below runs as a codegen'd two-pointer
    // merge (sorted_long_intersect) instead of a per-row hash set
    val longKeys = und.schema("a").dataType == org.apache.spark.sql.types.LongType
    val nbrList =
      if (longKeys) sort_array(collect_list(col("v")))
      else collect_list(col("v"))
    val adj = oriented.groupBy(col("u")).agg(nbrList.as("nbrs"))
      .localCheckpoint(eager = false)
    // each oriented edge (u,v) annotated with N+(u) and N+(v); edges
    // whose v has no out-neighbors cannot close a triangle (inner
    // join drops them). Triangle (u,v,w) materializes exactly once:
    // at its (degree,node)-least vertex's edge u→v, as w in the
    // intersection.
    val pairs = oriented
      .join(degSide(adj.select(col("u"), col("nbrs").as("nu"))), Seq("u"))
      .join(degSide(adj.select(col("u").as("v"), col("nbrs").as("nv"))),
        Seq("v"))
      .select(col("u"), col("v"),
        (if (longKeys)
          graft.functions.hashFunctions.sorted_long_intersect(
            col("nu"), col("nv"))
        else array_intersect(col("nu"), col("nv"))).as("ws"))
    // per-node credit: u and v once per triangle on their edge, w
    // once per triangle from the intersection — fused into ONE
    // explode so the intersection is computed once per edge
    val c = size(col("ws")).cast("long")
    val credits = pairs.select(explode(concat(
        array(struct(col("u").as("node"), c.as("c")),
          struct(col("v").as("node"), c.as("c"))),
        transform(col("ws"), w => struct(w.as("node"), lit(1L).as("c")))))
      .as("cr"))
      .select(col("cr.node").as("node"), col("cr.c").as("c"))
    val perNode = credits.groupBy("node").agg(sum("c").as("triangles"))
    deg.join(if (m <= BroadcastNodeLimit) broadcast(perNode) else perNode,
        Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
