package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix rebalancing: deterministic down-sampling toward a
  * target group distribution (the "data mixing" step of an LLM
  * pipeline — e.g. cap English at its target share instead of letting
  * it dominate the token budget).
  *
  * Everything is integer arithmetic plus one stable per-row hash, so
  * the sample is reproducible run-to-run, engine-to-engine (the DuckDB
  * oracle replays it exactly), and independent of partitioning — the
  * properties `DataFrame.sample` does not give you.
  *
  * Scale shape: the per-group histogram is a vocabulary-sized
  * aggregate, broadcast back; the corpus pass is then a map-side
  * filter `hash(id) mod M < rate` — one scan, no corpus shuffle, no
  * driver collect, and adding 100× more data changes only the
  * histogram values.
  */
object Mixture {

  /** Deterministic train/val/test assignment by hash range:
    * `h = poly_hash(doc_id) mod 1000`, train < `trainMil` ≤ val <
    * `valMil` ≤ test. Purely per-row (no shuffle, no state), stable
    * under repartitioning and incremental appends — a new document's
    * split never depends on what else is in the batch, which is the
    * property a random split lacks. */
  def splitAssign(docs: DataFrame, trainMil: Int = 900,
      valMil: Int = 950): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        (TextAnalysis.fingerprint(col("doc_id").cast("string")) % 1000)
          .as("h"))
      .withColumn("split", splitOfHash(col("h"), trainMil, valMil))

  /** The hash-range → split-name rule, shared by [[splitAssign]] and
    * [[splitLeakage]] so it exists exactly once. */
  private def splitOfHash(h: Column, trainMil: Int, valMil: Int): Column =
    when(h < trainMil, "train").when(h < valMil, "val").otherwise("test")

  /** Split-leakage audit: every near-dup pair whose endpoints landed
    * in DIFFERENT train/val/test splits — the contamination a random
    * per-document split silently creates (a test document with a
    * near-copy in train inflates eval). Pairs come from the same
    * MinHash banding as dd3, so the audit cost is the pair-detection
    * cost; the split frame joins in as (id, split) keys only.
    *
    * An empty result certifies only that NO LSH-DETECTED pair crosses
    * splits: banding has false negatives (a near-dup pair whose
    * signatures collide in no band is never audited), so absence of
    * rows is not absence of leakage. For certification runs, feed
    * [[splitLeakageOver]] an exhaustive pair source (e.g.
    * [[Dedup.jaccardPairs]] with the df cap raised to the corpus
    * size). A non-empty result is the work-list for cluster-aware
    * reassignment (move whole [[Dedup.resolveClusters]] clusters into
    * one split). */
  def splitLeakage(docs: DataFrame, trainMil: Int = 900,
      valMil: Int = 950, k: Int = 3, pct: Int = 80): DataFrame =
    splitLeakageOver(Dedup.minhashPairs(docs, k = k, pct = pct),
      docs, trainMil, valMil)

  /** [[splitLeakage]] over a caller-supplied candidate-pair frame
    * `(a_id, b_id, common, union_size)` — the audit's recall equals
    * the pair source's recall, so a certification run can plug in an
    * exhaustive generator where the default LSH banding trades recall
    * for cost. */
  def splitLeakageOver(pairs: DataFrame, docs: DataFrame,
      trainMil: Int = 900, valMil: Int = 950): DataFrame = {
    // only (doc_id, split) is needed — unlike splitAssign's manifest,
    // the audit doesn't require a lang column on the input
    val splits = docs.select(col("doc_id"),
      splitOfHash(
        TextAnalysis.fingerprint(col("doc_id").cast("string")) % 1000,
        trainMil, valMil).as("split"))
    pairs
      .join(splits.toDF("a_id", "a_split"), "a_id")
      .join(splits.toDF("b_id", "b_split"), "b_id")
      .filter(col("a_split") =!= col("b_split"))
      .select("a_id", "b_id", "a_split", "b_split", "common", "union_size")
  }

  /** Leakage-free split assignment: the repair [[splitLeakage]]'s
    * findings call for. Near-dup documents are resolved into
    * transitive clusters ([[Dedup.resolveClusters]]) and the split is
    * hashed from the CLUSTER id, so every member of a duplicate
    * cluster lands in the same split by construction — zero
    * cross-split near-dup pairs, while unpaired documents (the vast
    * majority) keep exactly the [[splitAssign]] rule (their cluster
    * id is their own id, same hash, same split: assignments only move
    * for documents that were leaking).
    *
    * Scale shape: the cluster map exists only for PAIRED documents —
    * a corpus-scale left join against a near-dup-sized frame
    * (broadcast at sane dup rates) — and the label propagation runs
    * on the paired subset, never the corpus. */
  def clusterAwareSplit(docs: DataFrame, trainMil: Int = 900,
      valMil: Int = 950, k: Int = 3, pct: Int = 80): DataFrame = {
    val clusters = Dedup
      .resolveClusters(Dedup.minhashPairs(docs, k = k, pct = pct))
      .select(col("doc_id"), col("cluster_id"))
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("split", splitOfHash(
        TextAnalysis.fingerprint(col("cluster_id").cast("string")) % 1000,
        trainMil, valMil))
  }

  /** Down-sample `docs` so every `groupCol` value lands an
    * approximately equal share (uniform target mixture).
    *
    * Per-group keep rate in per-mil:
    * `min(M, total*M div (n_groups * n_group))` — groups below their
    * fair share keep everything, oversized groups keep the fair-share
    * fraction. A row survives iff
    * `poly_hash(doc_id) mod M < rate_mil`, the same deterministic
    * coin as the seeded-sample operator (st6).
    */
  def rebalanceUniform(docs: DataFrame, groupCol: String = "lang",
      mil: Long = 1000L): DataFrame = {
    val stats = docs.groupBy(groupCol).agg(count(lit(1)).as("n_grp"))
    val totals = stats.agg(sum("n_grp").as("total"),
      count(lit(1)).as("n_grps"))
    val rate = least(lit(mil), expr(s"(total * $mil) div (n_grps * n_grp)"))
    docs.join(broadcast(stats), Seq(groupCol))
      .crossJoin(broadcast(totals))
      .withColumn("rate_mil", rate)
      .filter(TextAnalysis.fingerprint(col("doc_id").cast("string"))
        % lit(mil) < col("rate_mil"))
      .select(col("doc_id"), col(groupCol), col("rate_mil"))
  }

  /** Temperature-flattened mixture (the multilingual-LM sampling rule:
    * sample groups ∝ share^α, α < 1, so dominant groups shrink and the
    * tail keeps more of its share than [[rebalanceUniform]]'s hard
    * cap). α is FIXED at 1/2 — the keep rate becomes
    * `(n_min / n_g)^(1/2)`, i.e. one `sqrt`, which IEEE requires to be
    * correctly rounded in every engine (a general `pow(x, α)` is
    * last-ulp engine-dependent and would break the oracle hash).
    * Expected group size is then `sqrt(n_min · n_g)` — the geometric
    * mean of the group and the smallest group. No group upsamples
    * (rate ≤ 1; the smallest group keeps everything).
    *
    * Same scale shape as [[rebalanceUniform]]: vocabulary-sized
    * histogram broadcast back, map-side hash-coin filter, one corpus
    * scan, no corpus shuffle. */
  def rebalanceSqrt(docs: DataFrame, groupCol: String = "lang",
      mil: Long = 1000L): DataFrame = {
    val stats = docs.groupBy(groupCol).agg(count(lit(1)).as("n_grp"))
    val totals = stats.agg(min("n_grp").as("n_min"))
    docs.join(broadcast(stats), Seq(groupCol))
      .crossJoin(broadcast(totals))
      .withColumn("rate_mil",
        floor(lit(mil.toDouble) *
          sqrt(col("n_min").cast("double") / col("n_grp").cast("double")))
          .cast("long"))
      .filter(TextAnalysis.fingerprint(col("doc_id").cast("string"))
        % lit(mil) < col("rate_mil"))
      .select(col("doc_id"), col(groupCol), col("rate_mil"))
  }

  /** Dedup-DISCOUNTED mixture weights (mx8): the composition of
    * [[CorpusStats.sourceOverlap]]'s redundancy audit into the
    * mixture planner. A pair of "independent" sources that are the
    * same crawl twice would be double-counted by any
    * tokens-proportional weighting ([[epochPlan]]); here each source
    * is discounted by the WORST containment it shows against a
    * larger source (larger by distinct-gram count, name as the tie
    * rule — the bigger side keeps its mass, the smaller side is the
    * duplicate), then weighted by the same α = 1/2 micro-frozen
    * sqrt rule as [[epochPlan]] over its EFFECTIVE tokens.
    *
    * All shares are the overflow-safe double-floor ppm surrogates;
    * the max-containment fold is an integer `max` (exact,
    * order-independent).
    *
    * Scale shape: one corpus (source, token) aggregation, the
    * sourceOverlap audit (whose pair space is n_sources², never
    * corpus-sized), and vocabulary-sized joins riding broadcasts.
    *
    * Output: `(source, n_tokens, dup_ppm, eff_tokens, weight_ppm)`. */
  def effectiveMixture(docs: DataFrame, k: Int = 5,
      sourceCol: String = "source"): DataFrame = {
    val ov = CorpusStats.sourceOverlap(docs, k)
    // orient every pair toward the side that LOSES the mass: the
    // smaller-gram source (ties → lexicographically larger name)
    val discounted = ov.select(
        when(col("grams_a") < col("grams_b")
          || (col("grams_a") === col("grams_b")
            && col("source_a") > col("source_b")), col("source_a"))
          .otherwise(col("source_b")).as("source"),
        col("containment_ppm"))
      .groupBy("source")
      .agg(max("containment_ppm").as("dup_ppm"))
    val stats = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(sum("n_tok").as("n_tokens"))
      .join(broadcast(discounted), Seq("source"), "left")
      .withColumn("dup_ppm", coalesce(col("dup_ppm"), lit(0L)))
      .withColumn("eff_tokens",
        col("n_tokens") - floor(col("n_tokens").cast("double")
          * col("dup_ppm").cast("double") / lit(1000000.0)).cast("long"))
      .withColumn("w_micro",
        floor(sqrt(col("eff_tokens").cast("double")) * lit(1000000.0))
          .cast("long"))
    val total = stats.agg(sum("w_micro").as("w_total"))
    stats.crossJoin(broadcast(total))
      .select(col("source"), col("n_tokens"), col("dup_ppm"),
        col("eff_tokens"),
        when(col("w_total") === 0, 0L).otherwise(
          floor(col("w_micro").cast("double") * lit(1000000.0)
            / col("w_total").cast("double")).cast("long"))
          .as("weight_ppm"))
  }

  /** Token-budget epoch plan (mx7) — the data-recipe planner for a
    * TRAINING RUN rather than a corpus rewrite: given a total token
    * budget, allocate it across sources with temperature-flattened
    * weights (α = 1/2, same engine-exact sqrt rule as
    * [[rebalanceSqrt]]) and report, per source, how many epochs of
    * that source the plan implies. `epochs_ppm > 10⁶` marks a source
    * the plan REPEATS (the data-constrained regime — small high-value
    * sources get multiple epochs while web-scale sources train
    * sub-epoch); downstream, the ppm drives [[rebalanceUniform]]-
    * style hash coins (sub-epoch) or an explicit repeat factor.
    *
    * Exactness: per-source `sqrt(n_tokens)` is one correctly-rounded
    * double, frozen to integer micro-units (⌊√n·10⁶⌋) BEFORE the
    * cross-source sum, so the normalization total is an integer sum —
    * order-independent, never a float reduction whose grouping could
    * differ between engines. The ppm SHARES are then double-floor
    * surrogates (`⌊a·10⁶/b⌋` via one IEEE product, one quotient, one
    * floor — each correctly rounded, so both engines produce the
    * same bits): integer `a * 1000000` would wrap Long silently at
    * the trillion-token scales this planner is FOR (a source above
    * ~8.5e13 tokens wraps `w_micro·10⁶`; a target above ~9.2e12
    * wraps `target_tokens·10⁶`), and non-ANSI Spark would emit a
    * negative ppm where the oracle errors.
    *
    * Scale shape: one map-side-combinable (source, token-count)
    * aggregation over the corpus — the only pass that touches
    * documents; the plan itself is vocabulary-sized rows and a 1-row
    * total riding broadcasts.
    *
    * Output: `(source, n_docs, n_tokens, weight_ppm, target_tokens,
    * epochs_ppm)`. */
  def epochPlan(docs: DataFrame, targetTokens: Long,
      sourceCol: String = "source"): DataFrame = {
    val stats = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .withColumn("w_micro",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0))
          .cast("long"))
    val total = stats.agg(sum("w_micro").as("w_total"))
    stats.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        when(col("w_total") === 0, 0L).otherwise(
          floor(col("w_micro").cast("double") * lit(1000000.0)
            / col("w_total").cast("double")).cast("long"))
          .as("weight_ppm"))
      .withColumn("target_tokens",
        floor(lit(targetTokens.toDouble) * col("weight_ppm").cast("double")
          / lit(1000000.0)).cast("long"))
      .withColumn("epochs_ppm",
        when(col("n_tokens") === 0, 0L).otherwise(
          floor(col("target_tokens").cast("double") * lit(1000000.0)
            / col("n_tokens").cast("double")).cast("long")))
  }

  /** EXACT stratified split (mx6): within every stratum, assign the
    * first `pctTrain`% of the seeded-hash order to train, the next
    * `pctVal`% to val, the rest to test — integer threshold
    * arithmetic on the dense per-stratum rank, so the quotas are MET
    * EXACTLY per stratum. [[splitAssign]]'s per-row hash coin is
    * stable under append but only hits 80/10/10 in expectation (±√n
    * noise — material for small strata); this is the other point in
    * the trade: exact proportions, ranks shift when the stratum's
    * membership changes.
    *
    * Scale shape: the per-stratum rank is
    * [[Packing.seededRankByKey]]'s two-phase range-bucket cumsum
    * (histogram broadcast, windows partitioned by (stratum, range) —
    * a dominant stratum never sorts on one reducer); stratum sizes
    * are a vocabulary-sized aggregate riding a broadcast; the
    * threshold compare is per-row.
    *
    * Output: `(doc_id, stratum, strat_rank, strat_size, split)`. */
  /** DSIR-style importance selection (ds1) — Data Selection via
    * Importance Resampling (Xie et al. 2023, arXiv:2302.03169): score
    * every raw document by how much its hashed n-gram bag looks like a
    * TARGET corpus (the high-quality exemplar set) relative to the raw
    * corpus itself, then sample ∝ weight with a deterministic hash
    * coin. Features are the unigram+bigram fingerprints folded into
    * `buckets` hash buckets (the paper's hashed n-gram model); bucket
    * rates carry add-one smoothing so unseen buckets never zero a
    * document out.
    *
    * Integer surrogate (the repo's no-transcendentals discipline): the
    * paper's log-likelihood-ratio Σ c_b·(log t̂_b − log r̂_b) is
    * replaced by the log-free rational
    * `score_ppm = (Σ c_b·t̂_b) · 10⁶ div (Σ c_b·r̂_b)` — the document's
    * average target-rate over its grams against its average raw-rate
    * (rates in parts-per-billion, sums in DECIMAL(38,0)). Same sign
    * structure (>10⁶ ⇔ target-like), DuckDB-exact. Acceptance is
    * Bernoulli ∝ weight against the corpus max:
    * `coin(seed, doc_id) · max_score < score · 10⁶`.
    *
    * Scale shape: ONE gram scan of the raw corpus — the per-(doc,
    * bucket) count frame is checkpoint-shared between the corpus
    * bucket census (Σ over docs) and the per-doc scoring, so raw
    * bytes are tokenized exactly once; the bucket weight table
    * (≤ `buckets` rows, both rates + both totals) broadcasts onto
    * that frame; per-doc masses partial-aggregate map-side (grams of
    * one document never cross the wire individually — the shuffle is
    * ≤ distinct-buckets-per-doc rows and collapses to one row per
    * doc); the max-score gate is a 1-row broadcast. The target side
    * is the small exemplar set by construction.
    *
    * Output: `(doc_id, n_grams, score_ppm, selected)`. */
  def dsirSelect(raw: DataFrame, target: DataFrame, buckets: Int = 4096,
      seed: Long = 42L): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val rawB = bucketedGrams(raw, buckets)
      .localCheckpoint(eager = false) // census + total + scoring
    val weights = dsirModelFromBuckets(rawB,
      bucketedGrams(target, buckets), buckets)
    val scored = rawB.join(broadcast(weights), "b")
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"),
        sum(col("c").cast("decimal(38,0)") * col("t_ppb")).as("tm"),
        sum(col("c").cast("decimal(38,0)") * col("r_ppb")).as("rm"))
      .withColumn("score_ppm",
        expr("cast(tm * 1000000 div rm as bigint)"))
    val mx = scored.agg(max("score_ppm").as("mx"))
    scored.crossJoin(broadcast(mx))
      .withColumn("coin", TextAnalysis.fingerprint(
        concat_ws(":", lit(seed), col("doc_id"))) % 1000000L)
      .withColumn("selected",
        col("coin").cast("decimal(38,0)") * col("mx") <
          col("score_ppm").cast("decimal(38,0)") * lit(1000000L))
      .select("doc_id", "n_grams", "score_ppm", "selected")
  }

  /** Topic-balanced mixture (mx9) — the composition the t26 keywords
    * exist for: each document's topic is its top tf·idf term
    * ([[Retrieval.tfidfKeywords]] at k = 1 — the argmax keyword is a
    * cheap, deterministic topic label), and the corpus is then
    * temperature-flattened over TOPICS with [[rebalanceSqrt]]'s
    * α = ½ rule — so one dominant subject (one hot crawl vertical)
    * stops crowding out the tail subjects, the same anti-domination
    * rule mx5 applies to languages and cr1 applies to sources.
    *
    * One lazy plan: the topic frame (doc_id, topic) is checkpoint-
    * shared between the topic histogram and the keep-filter join; the
    * histogram is vocabulary-sized and broadcasts; the keep decision
    * is the per-row hash coin. Output: `(doc_id, topic, rate_mil)`
    * for the kept documents. */
  def topicMixture(docs: DataFrame, mil: Long = 1000L): DataFrame = {
    val topics = Retrieval.tfidfKeywords(docs, k = 1)
      .select(col("doc_id"), col("term").as("topic"))
      .localCheckpoint(eager = false) // histogram + keep-filter join
    rebalanceSqrt(topics, groupCol = "topic", mil = mil)
  }

  /** DSIR bucket-collision census (ds3) — the ss15 guard-observability
    * discipline applied to the hashed-gram feature space: ds1/ds2 fix
    * `buckets` and hash collisions then merge unrelated n-grams into
    * one importance weight SILENTLY, skewing scores with no visible
    * cost. This report makes the bucket count a number you can size:
    * vocabulary size, occupied buckets, the worst bucket's load, how
    * many distinct grams share a bucket with another gram
    * (`collided_grams`) and that as a ppm of the vocabulary
    * (`collision_ppm`) — when collision_ppm is high, raise `buckets`
    * and retrain the standing model (the ss15→retrain loop).
    *
    * Scale shape: ONE tokenize scan → a vocabulary-sized DISTINCT on
    * the gram fingerprint (map-side combinable — corpus text never
    * leaves the scan), a bucket-keyed count (≤ `buckets` groups) and
    * a 1-row rollup. Output: one row `(n_grams, buckets, occupied,
    * max_load, collided_grams, collision_ppm)`. */
  def dsirBucketCensus(docs: DataFrame, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import graft.functions.hashFunctions.gram_fps
    docs
      .select(explode(concat(gram_fps(col("text"), 1),
        gram_fps(col("text"), 2))).as("fp"))
      .distinct()
      .groupBy((col("fp") % buckets).as("b"))
      .agg(count(lit(1)).as("load"))
      .agg(coalesce(sum("load"), lit(0L)).as("n_grams"),
        count(lit(1)).as("occupied"),
        coalesce(max("load"), lit(0L)).as("max_load"),
        coalesce(sum(when(col("load") > 1, col("load"))
          .otherwise(0L)), lit(0L)).as("collided_grams"))
      .select(col("n_grams"), lit(buckets.toLong).as("buckets"),
        col("occupied"), col("max_load"), col("collided_grams"),
        expr("CASE WHEN n_grams = 0 THEN 0L ELSE " +
          "collided_grams * 1000000 div n_grams END")
          .as("collision_ppm"))
  }

  /** Per-(doc, hash-bucket) gram counts — the shared feature step of
    * the DSIR family: unigram+bigram fingerprints folded into
    * `buckets` buckets, multiplicities kept. */
  private def bucketedGrams(docs: DataFrame, buckets: Int): DataFrame = {
    import graft.functions.hashFunctions.gram_fps
    docs
      .select(col("doc_id"),
        explode(concat(gram_fps(col("text"), 1),
          gram_fps(col("text"), 2))).as("fp"))
      .select(col("doc_id"), (col("fp") % buckets).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
  }

  /** The bucket weight table from already-bucketed count frames:
    * EXACTLY `buckets` rows (the full domain, so probe-side lookups
    * never miss), rates in ppb with add-one smoothing in the decimal
    * lane; totals ride 1-row broadcasts. */
  private def dsirModelFromBuckets(rawB: DataFrame, tgtB0: DataFrame,
      buckets: Int): DataFrame = {
    val tgtB = tgtB0.localCheckpoint(eager = false) // census + total
    // totals coalesce to 0 on an EMPTY side (sum over zero rows is
    // null): the weights then degrade to the pure add-one-smoothed
    // uniform rate instead of nulling every score downstream
    rawB.sparkSession.range(buckets).select(col("id").as("b"))
      .join(rawB.groupBy("b").agg(sum("c").as("rc")), Seq("b"), "left")
      .join(tgtB.groupBy("b").agg(sum("c").as("tc")), Seq("b"), "left")
      .crossJoin(broadcast(
        rawB.agg(coalesce(sum("c"), lit(0L)).as("rtot"))))
      .crossJoin(broadcast(
        tgtB.agg(coalesce(sum("c"), lit(0L)).as("ttot"))))
      .select(col("b"),
        // clamp ppb rates to ≥ 1: past ~10⁹ total grams the integer
        // div floors a rare bucket's rate to 0, which would let a
        // document's rm sum to 0 and null its score — the add-one
        // smoothing guarantee ("unseen never zeroes a doc out") must
        // survive the 100 TB regime, not just the test scale where
        // rates are always ≥ 1 anyway
        expr(s"greatest(cast((coalesce(rc, 0) + 1) as decimal(38,0))"
          + s" * 1000000000 div (rtot + $buckets), 1)")
          .cast("long").as("r_ppb"),
        expr(s"greatest(cast((coalesce(tc, 0) + 1) as decimal(38,0))"
          + s" * 1000000000 div (ttot + $buckets), 1)")
          .cast("long").as("t_ppb"))
  }

  /** The STANDING DSIR model (ds2's train step): the full-domain
    * bucket weight table `(b, r_ppb, t_ppb)` — `buckets` rows,
    * materialize once (persist/localCheckpoint at the caller), score
    * arriving documents forever after with [[dsirScoreAgainst]]
    * without ever re-reading the raw corpus. One raw tokenize scan,
    * one target tokenize scan. */
  def dsirModel(raw: DataFrame, target: DataFrame,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    dsirModelFromBuckets(
      bucketedGrams(raw, buckets).localCheckpoint(eager = false),
      bucketedGrams(target, buckets), buckets)
  }

  /** Score documents against a standing [[dsirModel]] — STREAMING-
    * LEGAL (the dd9/ss16/t25 standing-index discipline for importance
    * weights): the ≤`buckets`-row model packs into two in-row lookup
    * maps on a 1-row broadcast, and each document's masses fold over
    * its own gram array with a codegen'd higher-order aggregate — no
    * per-gram row ever exists, no aggregation, no shuffle on the
    * document side, so the same operator maps a LIVE document stream
    * batch-by-batch in append mode (proven in StreamingSpec).
    * Per-gram ppb values sum in a Long (≤10⁹ per gram — a 10⁹-gram
    * document would be needed to wrap); only the final ratio runs in
    * the decimal lane. Scores are IDENTICAL to [[dsirSelect]]'s on
    * the same corpus: Σ over gram occurrences ≡ Σ c_b·ŵ_b.
    *
    * Output: `(doc_id, n_grams, score_ppm)` — selection is the
    * caller's threshold (a batch-max coin needs the whole batch and
    * is [[dsirSelect]]'s job). */
  def dsirScoreAgainst(model: DataFrame, docs: DataFrame,
      buckets: Int = 4096): DataFrame = {
    import graft.functions.hashFunctions.gram_fps
    val packed = model.agg(
      map_from_entries(collect_list(struct(col("b"), col("r_ppb"))))
        .as("rmap"),
      map_from_entries(collect_list(struct(col("b"), col("t_ppb"))))
        .as("tmap"))
    docs.crossJoin(broadcast(packed))
      .withColumn("grams", concat(gram_fps(col("text"), 1),
        gram_fps(col("text"), 2)))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        expr(s"aggregate(grams, 0L, (a, g) -> " +
          s"a + element_at(tmap, g % $buckets))").as("tm"),
        expr(s"aggregate(grams, 0L, (a, g) -> " +
          s"a + element_at(rmap, g % $buckets))").as("rm"))
      .select(col("doc_id"), col("n_grams"),
        expr("cast(cast(tm as decimal(38,0)) * 1000000 div rm as bigint)")
          .as("score_ppm"))
  }

  /** DoReMi-style mixture reweighting (mx10): multiplicative
    * per-source weight updates from a frozen proxy-loss table —
    * the published Group-DRO recipe (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * Algorithm 1) under the t30 integer discipline so the full
    * trajectory replays bit-for-bit as unrolled DuckDB CTEs.
    *
    * The proxy loss here is the per-source chars-per-token rate in
    * ppm — a deterministic hardness surrogate computable from the
    * corpus itself (production runs swap in a real proxy-model loss
    * column; the trajectory arithmetic is loss-agnostic). Each round:
    *
    *   1. `mean = Σ α·L / S` — the current mixture's expected loss
    *      (the reference the excess is measured against; with a
    *      FROZEN loss table this coupling through α is what makes
    *      the rounds a genuine dynamical system, standing in for
    *      DoReMi's per-step proxy re-evaluation),
    *   2. `excess_i = max(0, L_i − mean)` (DoReMi's clipped excess),
    *   3. `λ_i ← λ_i · (S + η·excess_i/S) / S` — the linearized
    *      exponentiated-gradient update (the classic multiplicative-
    *      weights `(1 + η·ℓ)` form; `exp` is not cross-engine exact,
    *      the linearization is),
    *   4. renormalize `λ` to sum S, then smooth toward uniform:
    *      `α_i = ((S−c)·λ_i + c·⌊S/k⌋) / S` (DoReMi's uniform
    *      smoothing keeps every domain sampled).
    *
    * All floor divisions on non-negative longs — DuckDB's `//`
    * replays each round exactly. Sources above the current mixture's
    * mean loss gain weight; as weight shifts the mean shifts, and the
    * trajectory converges toward the hardest domain with the
    * smoothing floor keeping the mixture interior.
    *
    * Scale shape: ONE corpus job (the per-source (chars, tokens)
    * aggregation — map-side combinable into ≤ |sources| rows); every
    * round is pure driver arithmetic on the ≤ |sources|-entry weight
    * table (the t30 weights-as-driver-state contract — bounded like
    * the dim+1 gradient rows), and the emitted trajectory is
    * rounds·|sources| rows built driver-side. At 100 TB the corpus
    * pays exactly one scan regardless of round count. Long overflow
    * headroom: per-source `chars·1e6` caps at ~9e18, so beyond ~10 TB
    * of text per source the loss aggregation lifts to decimal — the
    * round arithmetic itself never exceeds ~4e12. */
  def doremiWeights(docs: DataFrame, rounds: Int = 8,
      etaPpm: Long = 500000L, smoothPpm: Long = 100000L,
      sourceCol: String = "source"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stats = doremiStats(docs, sourceCol)
    doremiTrajectory(stats.map(r => (r.getString(0), r.getLong(1))),
      rounds, etaPpm, smoothPpm)
      .toDF("round", "source", "loss_ppm", "excess_ppm", "alpha_ppm")
  }

  /** [[doremiWeights]] over a caller-supplied per-source loss table
    * `(source, loss_ppm)` — the production entry point the
    * chars-per-token surrogate stands in for: evaluate a real proxy /
    * reference model offline, land its per-source excess-loss ppm in
    * a table, and run the same integer trajectory over it. Same
    * output schema and arithmetic as [[doremiWeights]]. */
  def doremiWeightsFromLosses(losses: DataFrame, rounds: Int = 8,
      etaPpm: Long = 500000L, smoothPpm: Long = 100000L): DataFrame = {
    val spark = losses.sparkSession
    import spark.implicits._
    val stats = losses.select(col("source"),
        col("loss_ppm").cast("long").as("loss_ppm"))
      .orderBy("source")
      .collect() // bounded: one row per source
      .map(r => (r.getString(0), r.getLong(1)))
    doremiTrajectory(stats, rounds, etaPpm, smoothPpm)
      .toDF("round", "source", "loss_ppm", "excess_ppm", "alpha_ppm")
  }

  /** The one corpus job [[doremiWeights]] and [[doremiEpochPlan]]
    * share: per-source `(source, loss_ppm, n_docs, n_tokens)`, rows
    * collected source-ascending (bounded: one row per source). */
  private def doremiStats(docs: DataFrame, sourceCol: String)
    : Array[org.apache.spark.sql.Row] =
    docs.select(col(sourceCol).as("source"),
        length(col("text")).cast("long").as("nc"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("source")
      .agg(sum("nc").as("nc"), sum("nt").as("nt"),
        count(lit(1)).as("n_docs"))
      .select(col("source"),
        expr("(nc * 1000000L) DIV greatest(nt, 1L)").as("loss_ppm"),
        col("n_docs"), col("nt").as("n_tokens"))
      .orderBy("source")
      .collect()

  /** Upper bound on a per-source `loss_ppm` the round arithmetic
    * accepts: at 1e10 (a loss of 10,000 in ppm units — far above any
    * real LM loss or chars-per-token surrogate), `alpha·loss` stays
    * ≤ 1e16 per source (Long-safe summed over hundreds of sources)
    * and `etaPpm·excess` ≤ ~5e15 at the default η. Beyond it the
    * products silently wrap Long and the trajectory is garbage —
    * [[doremiTrajectory]] fails loudly instead. */
  val MaxLossPpm: Long = 10000000000L

  /** The integer Group-DRO round loop — pure driver arithmetic on the
    * ≤|sources| weight table, one definition for both mx10's
    * trajectory and mx11's plan tail. */
  private def doremiTrajectory(stats: Array[(String, Long)],
      rounds: Int, etaPpm: Long, smoothPpm: Long)
    : Seq[(Long, String, Long, Long, Long)] = {
    val S = 1000000L
    val srcs = stats.map(_._1)
    val loss = stats.map(_._2)
    val k = srcs.length.toLong
    require(k > 0, "doremiWeights: no sources")
    // loss bounds: negative loss_ppm breaks the floor-division
    // identity the oracle replay relies on; loss above MaxLossPpm
    // overflows alpha·loss / etaPpm·excess — both fail loudly here
    // rather than producing a silently wrong trajectory
    stats.foreach { case (src, l) =>
      require(l >= 0L && l <= MaxLossPpm,
        s"doremiTrajectory: loss_ppm for source '$src' is $l — must " +
          s"be in [0, $MaxLossPpm] (ppm units) for the integer round " +
          "arithmetic to stay exact")
    }
    val uniform = S / k
    val lam = Array.fill(srcs.length)(S)
    var alpha = Array.fill(srcs.length)(uniform)
    val traj = Array.newBuilder[(Long, String, Long, Long, Long)]
    for (t <- 1 to rounds) {
      val mean = lam.indices.map(i => alpha(i) * loss(i)).sum / S
      val excess = loss.map(l => math.max(0L, l - mean))
      lam.indices.foreach { i =>
        lam(i) = lam(i) * (S + (etaPpm * excess(i)) / S) / S
      }
      val slam = lam.sum
      lam.indices.foreach(i => lam(i) = lam(i) * S / slam)
      alpha = lam.map(l => ((S - smoothPpm) * l + smoothPpm * uniform) / S)
      lam.indices.foreach { i =>
        traj += ((t.toLong, srcs(i), loss(i), excess(i), alpha(i)))
      }
    }
    traj.result().toSeq
  }

  /** DoReMi weights driving the training plan (mx11) — the
    * composition the reweighting exists for: [[doremiWeights]]' final
    * round α replaces [[epochPlan]]'s √-temperature share, and the
    * fixed token budget splits by it: `target_tokens =
    * (budget · α) // 1e6`, `epochs_ppm = (target · 1e6) // n_tokens`
    * (0 for a token-less source) — epochs_ppm > 1e6 marks the
    * sources DRO asks to repeat (the data-constrained regime made
    * visible, exactly where the hardest domains are).
    *
    * Scale shape: the SAME single corpus job as mx10 (the per-source
    * loss agg also carries n_docs/n_tokens); rounds and the plan tail
    * are driver arithmetic on the ≤|sources| table. */
  def doremiEpochPlan(docs: DataFrame, targetTokens: Long,
      rounds: Int = 8, etaPpm: Long = 500000L,
      smoothPpm: Long = 100000L,
      sourceCol: String = "source"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val S = 1000000L
    val stats = doremiStats(docs, sourceCol)
    val traj = doremiTrajectory(
      stats.map(r => (r.getString(0), r.getLong(1))),
      rounds, etaPpm, smoothPpm)
    // rounds = 0 degrades to the uniform round-0 alpha (the same
    // no-reweighting degrade doremiWeights' empty frame implies) —
    // without this seed the empty trajectory made alphaF(src) throw
    val uniform = S / stats.length
    val alphaF =
      if (traj.isEmpty) stats.map(r => r.getString(0) -> uniform).toMap
      else traj.filter(_._1 == rounds.toLong)
        .map(t => t._2 -> t._5).toMap
    stats.toSeq.map { r =>
      val (src, lossPpm, nDocs, nTok) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val a = alphaF(src)
      val target = targetTokens * a / S
      val epochs = if (nTok == 0) 0L else target * S / nTok
      (src, nDocs, nTok, lossPpm, a, target, epochs)
    }.toDF("source", "n_docs", "n_tokens", "loss_ppm", "alpha_ppm",
      "target_tokens", "epochs_ppm")
  }

  def exactStratifiedSplit(docs: DataFrame, seed: Long,
      stratumCol: String = "lang", pctTrain: Int = 80,
      pctVal: Int = 10): DataFrame = {
    // pctTrain + pctVal = 100 is legal and yields an EMPTY test split
    // by construction (everything lands in train/val); the mx6 oracle
    // interpolates whatever percentages the declared query passes, so
    // non-default configurations stay gate-verified
    require(pctTrain + pctVal <= 100, "split percentages exceed 100")
    val ranked = Packing
      .seededRankByKey(docs, stratumCol, "doc_id", seed)
      .withColumnRenamed("key_rank", "strat_rank")
    val sizes = docs.groupBy(stratumCol)
      .agg(count(lit(1)).as("strat_size"))
    ranked.join(broadcast(sizes), stratumCol)
      .withColumn("split",
        when(col("strat_rank") * 100 < col("strat_size") * pctTrain,
          lit("train"))
          .when(col("strat_rank") * 100 <
            col("strat_size") * (pctTrain + pctVal), lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col(stratumCol), col("strat_rank"),
        col("strat_size"), col("split"))
  }
}
