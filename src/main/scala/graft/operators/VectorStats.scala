package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed analytics over an embedding column: per-class
  * centroids and int8 quantization — the vector-side counterparts of
  * the [[Similarity]] search operators (centroids seed IVF; int8 is
  * the standard storage/bandwidth compression for ANN serving).
  *
  * Cross-engine exactness: a float sum's value depends on fold order,
  * and a grouped aggregation has no deterministic order at scale — so
  * each addend is fixed-pointed FIRST (`floor(v * 2^40)`: multiplying
  * by a power of two is exact in IEEE double, floor is exact) and the
  * sum runs over those integers in DECIMAL (order-independent,
  * overflow-free). Engine-specific float→decimal casts are never used
  * — they round differently (measured: Spark's exact-BigDecimal
  * HALF_UP vs DuckDB's double-multiply path disagree in the last
  * decimal) — while integer→decimal and decimal→double conversions
  * are correctly rounded everywhere.
  */
object VectorStats {
  /** Fixed-point scale for centroid sums: 2^40 (exactly representable
    * in double; beyond float's relative precision for |v| > ~1e-5). */
  private val FixedScale = 1099511627776.0d

  /** Dimension-wise mean embedding per label (the centroid step of
    * IVF / k-means / class prototypes).
    *
    * Scale shape: `posexplode` fans each vector into (label, dim, v)
    * rows — dims× the row count but a few bytes each — then ONE
    * hash aggregation on (label, dim) with map-side partial sums;
    * the shuffle carries (label, dim, decimal sum, count) per
    * partition, i.e. O(labels × dims), independent of corpus size.
    * DECIMAL(38,0) holds ~1e25 scaled unit-norm addends. */
  def labelCentroids(embs: DataFrame): DataFrame =
    embs.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v").cast("double") * lit(FixedScale))
          .cast(DecimalType(38, 0))).as("s"))
      .select(col("label"), col("dim"), col("n"),
        (col("s").cast("double") / lit(FixedScale) / col("n").cast("double"))
          .as("centroid"))

  /** Distributed GRAM MATRIX accumulation — `G[i][j] = Σ_rows
    * x_i · x_j` over the whole corpus, the d×d second-moment input
    * every linear embedding transform starts from (PCA, whitening,
    * OPQ rotation for quantizers, least-squares probes): accumulate G
    * distributed, eigendecompose the d×d result wherever (it's tiny),
    * apply the rotation back as a ve-style per-row map. Paired with
    * [[labelCentroids]]' per-dim sums this yields the covariance
    * (`cov = G/n − μμᵀ`) without a second corpus pass.
    *
    * Scale shape: each vector folds its d(d+1)/2 upper-triangle
    * products into a per-partition accumulator INSIDE the
    * [[graft.functions.TypedAggregators.covMoments]] Aggregator —
    * zero generated rows, and the exchange carries one O(d²) cell
    * buffer per partition regardless of corpus size. CPU is the
    * algorithm's O(n·d²) as a tight JVM loop — at d beyond a few
    * thousand, block the (i, j) space into column ranges and run
    * blocks as separate passes.
    *
    * Exactness: a float×float product in double is EXACT (24-bit
    * mantissas → ≤ 48-bit product), and the sum fixed-points each
    * product first (class scaladoc) — the oracle reproduces G
    * bit-for-bit.
    *
    * Output: `(i, j, n, gram)` for the upper triangle `i ≤ j`. */
  def gramMatrix(embs: DataFrame): DataFrame =
    moments(embs)
      .select(col("i"), col("j"), col("n"),
        (col("s").cast("double") / lit(FixedScale)).as("gram"))

  /** Shared one-pass second+first-moment aggregation behind
    * [[gramMatrix]] and [[pcaProject]]: upper-triangle products plus,
    * on the diagonal rows only, the plain per-dim sum (`s1`) — so the
    * covariance `G/n − μμᵀ` costs ONE corpus scan, not two.
    *
    * The fan-out lives INSIDE the
    * [[graft.functions.TypedAggregators.covMoments]] typed
    * `Aggregator` (a per-partition outer-product fold): no exploded
    * row ever exists — the round-11 double-`posexplode` shape pushed
    * n·d(d+1)/2 generated rows through the hash-agg pipeline (~525k
    * per vector at d=1024), ~3 orders of magnitude more row traffic
    * for the identical O(d²) exchanged cells. Cell sums travel as
    * exact integer strings and surface as the same DECIMAL(38,0)
    * columns. */
  private def moments(embs: DataFrame): DataFrame =
    momentCells(embs
      .select(transform(col("embedding"), v => v.cast("double")).as("xd"))
      .agg(momentsUdaf(col("xd")).as("m"))
      .select(explode(col("m.cells")).as("cell")))

  private lazy val momentsUdaf =
    udaf(graft.functions.TypedAggregators.covMoments)

  /** Unpack [[graft.functions.TypedAggregators.CovCell]] structs into
    * the (i, j, n, s, s1) moment frame (s/s1 as DECIMAL(38,0) — the
    * string→decimal cast is exact). */
  private def momentCells(cells: DataFrame): DataFrame =
    cells.select(
      cells.columns.filter(_ != "cell").map(col) :+
        col("cell.i").as("i") :+ col("cell.j").as("j") :+
        col("cell.n").as("n") :+
        col("cell.s").cast(DecimalType(38, 0)).as("s") :+
        col("cell.s1").cast(DecimalType(38, 0)).as("s1"): _*)

  /** Top PRINCIPAL COMPONENT of the embedding corpus and every
    * vector's projection onto it — the 1-D PCA score behind variance
    * screens, outlier slicing, and whitening QA. Same division of
    * labor as Spark MLlib's own PCA: the corpus reduces to the d×d
    * covariance DISTRIBUTED (one scan, [[moments]]), the
    * eigenproblem is solved on the driver where a d×d matrix is
    * trivially small, and the resulting direction rides back to the
    * executors as a broadcast literal for a pure map-side projection.
    *
    * Scale shape: one O(n·d²) corpus scan collapsing to d(d+1)/2
    * partial-agg rows (the [[gramMatrix]] exchange), a driver loop
    * over 64×64 doubles, then ONE more corpus scan with zero
    * mid-plan exchanges — at 100 TB the projection is
    * scan-bandwidth-bound, exactly like ve2's quantization.
    *
    * Cross-engine exactness: the power iteration runs in the same
    * fixed-point arithmetic as every sum here — each matvec addend is
    * `floor(cov·v · 2^40)` (double product correctly rounded
    * identically everywhere, floor exact), summed as integers
    * (order-free), normalized by the integer max-abs; the final L2
    * norm square is again an integer sum, so its `sqrt` sees a
    * bit-identical argument. The oracle replays the IDENTICAL
    * trajectory as `iters` unrolled SQL CTEs over the gram table —
    * convergence is irrelevant to correctness, any fixed `iters`
    * agrees bit-for-bit. */
  def pcaProject(embs: DataFrame, iters: Int = 24): DataFrame = {
    val dir = pcaDirection(embs, iters)
    embs.select(col("vec_id"),
      (aggregate(
        zip_with(col("embedding"), typedLit(dir.toSeq), (x, w) =>
          floor(x.cast("double") * w * lit(FixedScale)).cast("long")),
        lit(0L), (acc, v) => acc + v).cast("double") / lit(FixedScale))
        .as("pc1"))
  }

  /** The unit top-eigenvector of the corpus covariance via `iters`
    * fixed-point power iterations from the all-ones start — see
    * [[pcaProject]] for the exactness contract. */
  def pcaDirection(embs: DataFrame, iters: Int = 24): Array[Double] =
    iterate(covMatrix(embs), iters)

  /** Collect the tiny d×d covariance from [[moments]]' one-pass
    * distributed aggregation (`cov = G/n − μμᵀ`, arithmetic in
    * oracle-matched association). */
  private def covMatrix(embs: DataFrame): Array[Array[Double]] = {
    val rows = moments(embs).collect()
    val d = rows.iterator.map(_.getInt(1)).max + 1
    val n = rows.head.getLong(2)
    val mu = new Array[Double](d)
    rows.foreach { r =>
      if (r.getInt(0) == r.getInt(1))
        mu(r.getInt(0)) = r.getDecimal(4).doubleValue / FixedScale / n
    }
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val gram = r.getDecimal(3).doubleValue / FixedScale
      val c = gram / n - mu(i) * mu(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    cov
  }

  /** `iters` fixed-point power iterations from all-ones, L2-normalized
    * by an integer norm-square — every step oracle-replayable. */
  private def iterate(cov: Array[Array[Double]], iters: Int)
      : Array[Double] = {
    val d = cov.length
    var v = Array.fill(d)(1.0)
    var it = 0
    while (it < iters) {
      val s = Array.tabulate(d) { i =>
        var acc = 0L; var j = 0
        while (j < d) {
          acc += math.floor(cov(i)(j) * v(j) * FixedScale).toLong; j += 1
        }
        acc
      }
      val m = s.map(math.abs).max
      v = s.map(x => x.toDouble / m.toDouble)
      it += 1
    }
    val n2 = v.map(x => math.floor(x * x * FixedScale).toLong).sum
    val norm = math.sqrt(n2.toDouble / FixedScale)
    v.map(_ / norm)
  }

  /** Fixed-point Rayleigh quotient `vᵀ·cov·v` of a unit vector — the
    * eigenvalue estimate behind [[pcaWhiten2]]'s whitening scale and
    * its deflation step. */
  private def rayleigh(cov: Array[Array[Double]],
      v: Array[Double]): Double = {
    val d = cov.length
    val t = Array.tabulate(d) { i =>
      var acc = 0L; var j = 0
      while (j < d) {
        acc += math.floor(cov(i)(j) * v(j) * FixedScale).toLong; j += 1
      }
      acc
    }
    var l = 0L
    var i = 0
    while (i < d) {
      l += math.floor(v(i) * (t(i).toDouble / FixedScale) * FixedScale)
        .toLong
      i += 1
    }
    l.toDouble / FixedScale
  }

  /** WHITENED 2-D PCA map (ve7): every vector projected onto the top
    * TWO principal components, each score divided by √eigenvalue — the
    * unit-variance "embedding map" behind drift dashboards, coverage
    * plots, and decorrelation QA. The second component comes from
    * HOTELLING DEFLATION: `cov₂ = cov − λ₁·v₁v₁ᵀ` (λ₁ the fixed-point
    * Rayleigh quotient), then the same power iteration — the textbook
    * top-k eigensolver, every step in oracle-replayable arithmetic.
    *
    * Scale shape: identical to [[pcaProject]] — one O(n·d²) moments
    * scan, driver loops over the d×d, then ONE zero-exchange
    * projection scan emitting both coordinates. */
  def pcaWhiten2(embs: DataFrame, iters: Int = 24): DataFrame = {
    val cov = covMatrix(embs)
    val v1 = iterate(cov, iters)
    val l1 = rayleigh(cov, v1)
    val d = cov.length
    val cov2 = Array.tabulate(d, d)((i, j) => cov(i)(j) - l1 * v1(i) * v1(j))
    val v2 = iterate(cov2, iters)
    val l2 = rayleigh(cov2, v2)
    def wcol(dir: Array[Double], lam: Double): Column =
      aggregate(
        zip_with(col("embedding"), typedLit(dir.toSeq), (x, w) =>
          floor(x.cast("double") * w * lit(FixedScale)).cast("long")),
        lit(0L), (acc, v) => acc + v).cast("double") /
        lit(FixedScale) / lit(math.sqrt(lam))
    embs.select(col("vec_id"), wcol(v1, l1).as("w1"), wcol(v2, l2).as("w2"))
  }

  /** Embedding outlier scores in the whitened PCA plane (ve9): each
    * vector's squared distance from the corpus mean along the top-2
    * whitened directions — a 2-component Mahalanobis surrogate, the
    * cheap "is this embedding even from this distribution" filter
    * that runs before expensive semantic dedup or ANN indexing
    * (encoder glitches, empty-input embeddings, and off-domain
    * content all land in the tail). Scores are exact products of the
    * [[pcaWhiten2]] coordinates (same fixed-point projections), so
    * the report is oracle-exact; output is the top `topN` outliers.
    *
    * Scale shape: [[pcaWhiten2]]'s one-scan covariance + driver-side
    * d×d iteration, then a zero-exchange map-side projection and a
    * `TakeOrdered` top-N — no global sort, nothing corpus-sized on
    * any exchange. */
  def whitenOutliers(embs: DataFrame, topN: Int = 20,
      iters: Int = 24): DataFrame =
    pcaWhiten2(embs, iters)
      .withColumn("dist2", col("w1") * col("w1") + col("w2") * col("w2"))
      .orderBy(col("dist2").desc, col("vec_id"))
      .limit(topN)

  /** Distribution drift between two embedding snapshots (ve8): the
    * monitoring primitive behind "did the corpus / the encoder
    * change" — per dimension, an equi-width histogram of the
    * reference side vs the current side and the L1 distance between
    * the two normalized histograms in INTEGER parts-per-million
    * (`Σ_b |cRef·1e6 div nRef − cCur·1e6 div nCur|`, i.e. 2e6 × the
    * total-variation distance, exact in BIGINT — no transcendental
    * PSI log that two engines round differently).
    *
    * Binning is `floor((x − lo)·bins/(hi−lo))` clamped to
    * `[0, bins)`: one multiply-and-floor in double, bit-identical
    * across engines when `bins/(hi−lo)` is a power of two (the
    * default 8 bins over [−1,1] gives scale 4.0).
    *
    * Scale shape: posexplode to (dim, bin, side) then TWO bounded
    * hash aggregations — (dim, bin) counts, dims×bins rows, then the
    * per-dim fold; both partial-aggregated map-side, so the exchange
    * carries O(dims × bins) counters regardless of corpus size. The
    * per-dim totals come from the histogram itself (no second corpus
    * scan) and join back on the dims×bins-row frame, broadcast. */
  /** COVARIANCE drift between two corpus halves (ve11): per (i, j)
    * upper-triangle cell, the covariance of the reference slice vs
    * the current slice and their absolute difference — the
    * second-moment companion of [[histogramDrift]]: per-dimension
    * histograms cannot see a CORRELATION shift (two dims whose
    * marginals are unchanged but whose joint structure rotated —
    * e.g. an encoder update that re-mixes feature axes); the d×d
    * covariance delta is exactly that detector.
    *
    * Scale shape: ONE corpus scan folding per-partition into the
    * [[graft.functions.TypedAggregators.covMoments]] outer-product
    * Aggregator — 2·d(d+1)/2 cells cross the exchange (the
    * [[gramMatrix]] shape with an `is_ref` group key), no exploded
    * rows anywhere;
    * means come from the diagonal cells and ride a 2d-row broadcast;
    * everything after the scan is d²-sized. Same fixed-point
    * integer-sum exactness as every moment here.
    *
    * Output: `(i, j, cov_ref, cov_cur, drift)`, j ≥ i. */
  def covDrift(embs: DataFrame, isRef: Column): DataFrame = {
    val m = momentCells(embs
      .select(isRef.as("is_ref"),
        transform(col("embedding"), v => v.cast("double")).as("xd"))
      .groupBy("is_ref")
      .agg(momentsUdaf(col("xd")).as("mc"))
      .select(col("is_ref"), explode(col("mc.cells")).as("cell")))
      .localCheckpoint(eager = false) // cells + the two mean joins
    val means = m.filter(col("i") === col("j"))
      .select(col("is_ref"), col("i").as("d"),
        (col("s1").cast("double") / lit(FixedScale)
          / col("n").cast("double")).as("mu"))
    val cov = m
      .join(broadcast(means.toDF("is_ref", "i", "mu_i")), Seq("is_ref", "i"))
      .join(broadcast(means.toDF("is_ref", "j", "mu_j")), Seq("is_ref", "j"))
      .select(col("is_ref"), col("i"), col("j"),
        (col("s").cast("double") / lit(FixedScale)
          / col("n").cast("double")
          - col("mu_i") * col("mu_j")).as("cov"))
    cov.filter(col("is_ref"))
      .select(col("i"), col("j"), col("cov").as("cov_ref"))
      .join(cov.filter(!col("is_ref"))
        .select(col("i"), col("j"), col("cov").as("cov_cur")), Seq("i", "j"))
      .select(col("i"), col("j"), col("cov_ref"), col("cov_cur"),
        abs(col("cov_ref") - col("cov_cur")).as("drift"))
  }

  def histogramDrift(embs: DataFrame, isRef: Column, bins: Int = 8,
      lo: Double = -1.0, hi: Double = 1.0): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val scale = bins / (hi - lo)
    val hist = embs
      .select(isRef.as("is_ref"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("is_ref"), col("dim"),
        least(greatest(floor((col("x").cast("double") - lit(lo)) *
          lit(scale)), lit(0.0)), lit(bins - 1.0)).cast("long").as("bin"))
      .groupBy("dim", "bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("c_cur"))
    val totals = hist.groupBy("dim")
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
    hist.join(broadcast(totals), "dim")
      .groupBy("dim")
      .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
        sum(abs(expr("c_ref * 1000000 div n_ref") -
          expr("c_cur * 1000000 div n_cur"))).as("l1_ppm"))
  }

  /** Fixed-order dot product of two DOUBLE arrays via HOFs — the
    * centroid side of k-means is double-valued, so the float-only
    * native `vec_dot` doesn't apply; fold order (element order, left
    * fold) matches the SQL oracle's `list_reduce`. */
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Distributed Lloyd k-means over the embedding column: `iters`
    * update rounds from a deterministic seed (the `k` lowest vec_ids,
    * matching [[Similarity.ivfTopK]]'s coarse quantizer), then the
    * final assignment `(vec_id, cluster_id, dist2)` under the last
    * centroids. Plugs directly into IVF as a trained quantizer.
    *
    * Scale shape (billions of vectors × small k):
    *  - centroids are always a k-row frame — every assignment is a
    *    `broadcast` nested-loop over ONE corpus scan, followed by a
    *    map-side-combinable `min_by` argmin ((dist², cid) total order:
    *    1 row per vector crosses the shuffle, never the k scored
    *    copies — the same shape as ivfTopK's assignment);
    *  - each update is ONE hash aggregation on (cid, dim): the
    *    shuffle carries O(k × dims) partial sums, independent of
    *    corpus size;
    *  - the corpus (cast to double once) is lazily checkpointed — it
    *    is scanned `iters + 1` times, which is Lloyd's inherent cost,
    *    but never recomputed; each round's k-row centroid frame is
    *    checkpointed to stop the per-round plan nesting that would
    *    otherwise grow the lineage geometrically.
    *
    * Cross-engine exactness: distances are fixed-order double folds
    * (`dist² = (x·x - 2·x·c) + c·c`, computed in exactly that
    * association), centroid means use the same fixed-point DECIMAL
    * sums as [[labelCentroids]], and ties in the argmin break on cid
    * — so the full two-round trajectory is bit-reproducible in the
    * DuckDB oracle. Clusters that lose all members simply drop out
    * (standard Lloyd behavior with a deterministic seed). */
  def kmeansAssign(embs: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    assignToCentroids(embs, kmeansCentroids(embs, k, iters))

  /** The trained centroids after `iters` Lloyd rounds: `(cid, cemb)`
    * with `cemb` a double array. See [[kmeansAssign]] for the scale
    * and exactness story. */
  def kmeansCentroids(embs: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val e = embs.select(col("vec_id"),
      transform(col("embedding"), v => v.cast("double")).as("emb"))
      .localCheckpoint(eager = false)
    // the k LOWEST ids, not `vec_id < k`: id spaces that don't start
    // at zero (hash ids, offset ranges) would otherwise yield partial
    // or zero seeds and silently garbage assignments downstream.
    // TakeOrdered of k rows — no global sort.
    var cents = e.orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("long").as("cid"), col("emb").as("cemb"))
    var round = 0
    while (round < iters) {
      // map-side argmin (the packed-broadcast fold, bit-identical to
      // the aggregated min_by form) with the embedding carried
      // in-row: ONE corpus-sized exchange per round — the (cid, dim)
      // partial-agg'd update — instead of the k-times-expanded
      // min_by shuffle plus a corpus self-join
      val packed = cents
        .withColumn("cc", dotD(col("cemb"), col("cemb")))
        .agg(collect_list(struct(col("cid"), col("cemb"), col("cc")))
          .as("cs"))
      cents = e
        .withColumn("xx", dotD(col("emb"), col("emb")))
        .crossJoin(broadcast(packed))
        .select(nearestIn(col("cs"), col("emb"), col("xx"))
          .getField("cid").as("cid"), col("emb"))
        .select(col("cid"), posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy("cid", "dim")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v") * lit(FixedScale))
            .cast(DecimalType(38, 0))).as("s"))
        .select(col("cid"), col("dim"),
          (col("s").cast("double") / lit(FixedScale) / col("n").cast("double"))
            .as("cv"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          p => p.getField("cv")).as("cemb"))
        .localCheckpoint(eager = false)
      round += 1
    }
    cents
  }

  /** Assign every vector to its nearest centroid — ENTIRELY map-side:
    * the k centroids are packed into ONE broadcast row and the argmin
    * is a fold over that array per vector, so assignment adds ZERO
    * exchanges to the corpus scan (the aggregated
    * `groupBy(vec_id).min_by` alternative shuffles one row per vector
    * — already narrow, but this shuffles nothing at all). Because
    * there is no stateful aggregation, the same operator runs
    * UNCHANGED on a stream of vectors against broadcast static
    * centroids — the realtime inference path of a trained quantizer.
    *
    * `vecs` needs (vec_id, embedding); `cents` is (cid, cemb) as
    * produced by [[kmeansCentroids]]. Distance math and (dist², cid)
    * tie-breaking are identical to the aggregated form — the fold
    * keeps the first strict improvement, so ties resolve to the
    * smallest cid regardless of the packed array's order. */
  def assignToCentroids(vecs: DataFrame, cents: DataFrame): DataFrame = {
    // ||c||² rides the broadcast row and ||x||² is computed once per
    // vector, so the fold does exactly ONE dot product per (vector,
    // centroid) — same association (x·x − 2·x·c) + c·c as the
    // aggregated form, hence bit-identical distances
    val packed = cents
      .withColumn("cc", dotD(col("cemb"), col("cemb")))
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cc"))).as("cs"))
    vecs
      .select(col("vec_id"),
        transform(col("embedding"), v => v.cast("double")).as("emb"))
      .withColumn("xx", dotD(col("emb"), col("emb")))
      .crossJoin(broadcast(packed))
      .select(col("vec_id"),
        nearestIn(col("cs"), col("emb"), col("xx")).as("best"))
      .select(col("vec_id"), col("best.cid").as("cluster_id"),
        col("best.dist2").as("dist2"))
  }

  /** Map-side argmin over a packed centroid array: the `(cid, dist2)`
    * struct of the nearest entry of `cs` (elements
    * `(cid, cemb, cc)`) to the double array `emb` whose self-dot is
    * `xx` — distance in the fixed association `(x·x − 2·x·c) + c·c`,
    * ties to the smaller cid. The broadcast fold shared by
    * [[assignToCentroids]] and [[Similarity.pqTopK]]'s per-subspace
    * encoder. */
  private[operators] def nearestIn(cs: Column, emb: Column,
      xx: Column): Column =
    aggregate(cs,
      struct(lit(Long.MaxValue).as("cid"),
        lit(Double.MaxValue).as("dist2")),
      (acc, c) => {
        val d = xx -
          lit(2.0) * dotD(emb, c.getField("cemb")) +
          c.getField("cc")
        val better = d < acc.getField("dist2") ||
          (d === acc.getField("dist2") &&
            c.getField("cid") < acc.getField("cid"))
        when(better, struct(c.getField("cid").as("cid"),
          d.as("dist2"))).otherwise(acc)
      })

  /** Reconstruction-error report for [[quantizeInt8]]: per vector,
    * the max and mean absolute error of `q_i·scale/127` against the
    * original — the QA readout that decides whether int8 storage is
    * acceptable for a corpus before re-encoding a billion vectors
    * (pairs with [[Similarity.annRecallReport]], which answers the
    * same question for the index). Per-row, shuffle-free; fixed-order
    * error fold so both engines produce identical doubles. */
  def quantError(embs: DataFrame): DataFrame =
    quantizedFrame(embs)
      .select(col("vec_id"), col("scale"), zip_with(col("emb"), col("q"),
        (v, qi) => abs(v - qi.cast("double") * col("scale") / lit(127.0)))
        .as("errs"), size(col("emb")).as("n"))
      .select(col("vec_id"), col("scale"),
        array_max(col("errs")).as("max_err"),
        (aggregate(col("errs"), lit(0.0), (acc, e) => acc + e)
          / col("n").cast("double")).as("mean_err"))

  /** Symmetric per-vector int8 quantization: `scale = max |v_i|`,
    * codes per the rounding rule in [[quantizedFrame]]. */
  def quantizeInt8(embs: DataFrame): DataFrame =
    quantizedFrame(embs).select(col("vec_id"), col("scale"), col("q"))

  /** The quantize subplan shared by [[quantizeInt8]] and
    * [[quantError]] — the rounding rule exists exactly once, and the
    * staged projections (doubles → scale → codes) make each array
    * expression a plain column reference downstream instead of a
    * re-evaluated `array_max(transform(...))` tree (Catalyst does not
    * CSE across higher-order functions). `q_i = floor(v_i·127/scale
    * + 0.5)` — round-half-up spelled as an explicit floor so every
    * engine rounds identically; builtin `round` is half-even in some
    * engines and half-away in others. All-zero vectors quantize to
    * zeros. Per-row, shuffle-free, stays inside whole-stage codegen. */
  /** Johnson–Lindenstrauss random projection (ve10): map every
    * embedding onto `outDims` sparse Achlioptas planes — component
    * (j, i) is +1 / −1 / 0 by the deterministic quadratic mix
    * `h = (i·1000003 + j + 715827883) mod p; m = (h² + h) mod p
    * mod 6`, p = 1e9+7 (the odd offset keeps every h in the reduced
    * regime — unreduced h(h+1) is even, which starves the −1 sign)
    * (0 → +1, 1 → −1, else 0; density 1/3), scaled by
    * `sqrt(3/outDims)` so squared distances are preserved in
    * expectation. The mix MUST be nonlinear in (i, j): a linear
    * residue like `(i·7 + j·13) mod 6` makes the sign matrix
    * 6-periodic in both indices (duplicate output columns, effective
    * rank ≤ 6), which silently voids the JL guarantee while staying
    * bit-identical to an oracle sharing the flaw. The dimension-reduction step run BEFORE
    * expensive indexing/clustering: a 64-d corpus becomes 16-d at
    * ~1/4 the index memory and dot-product cost, with distortion
    * bounded by the JL lemma (ε ≈ sqrt(8 ln n / outDims)).
    *
    * Per row the operator also reports `norm_ratio_ppm` =
    * ⌊10⁶·‖proj‖²/‖x‖²⌋ — the per-vector norm-preservation QA that
    * makes distortion OBSERVABLE in the output instead of assumed
    * (zero vectors report 10⁶ exactly).
    *
    * Scale shape: entirely map-side — fixed-order folds per output
    * dim, no shuffle, no state; the planes are arithmetic on indices
    * (nothing broadcast, nothing trained). Every fold is the same
    * sequential double fold the DuckDB oracle replays, so
    * coordinates compare bit-for-bit. */
  def jlProject(embs: DataFrame, outDims: Int = 16): DataFrame = {
    val xd = transform(col("embedding"), v => v.cast("double"))
    def fold(l: Column): Column =
      aggregate(l, lit(0.0), (a, v) => a + v)
    // native codegen'd projection — one JVM loop per row instead of
    // outDims interpreted fold closures (~10× at 64→16); the HOF
    // twin lives in the DuckDB oracle, and HashOpsProps pins the two
    // bit-equal
    val proj = graft.functions.hashFunctions
      .jl_project(col("embedding"), outDims)
    embs.select(col("vec_id"), proj.as("proj"),
        fold(transform(xd, v => v * v)).as("xn"))
      .withColumn("pn", fold(transform(col("proj"), v => v * v)))
      .select(col("vec_id"), col("proj"),
        when(col("xn") > 0,
          floor(lit(1000000.0) * col("pn") / col("xn")).cast("long"))
          .otherwise(lit(1000000L)).as("norm_ratio_ppm"))
  }

  private def quantizedFrame(embs: DataFrame): DataFrame =
    embs
      .select(col("vec_id"),
        transform(col("embedding"), v => v.cast("double")).as("emb"))
      .select(col("vec_id"), col("emb"),
        array_max(transform(col("emb"), v => abs(v))).as("scale"))
      .select(col("vec_id"), col("emb"), col("scale"),
        when(col("scale") > 0,
          transform(col("emb"),
            v => floor(v * lit(127.0) / col("scale") + lit(0.5))
              .cast("int")))
          .otherwise(transform(col("emb"), _ => lit(0))).as("q"))

  /** Matryoshka truncation recall (ve12): recall@k of brute cosine
    * retrieval over PREFIX-truncated embeddings vs the full-dimension
    * truth — the QA every MRL-style embedding deployment runs before
    * serving a cheaper prefix (Kusupati et al. 2022: if the encoder
    * was trained matryoshka, small prefixes keep most recall; if it
    * was NOT, this report is how you find out before the index ships
    * at a quarter of the memory and recall quietly craters).
    *
    * One |corpus|×|queries| pair frame (queries broadcast — the
    * ss12 brute-truth pattern, a MEASUREMENT tool, never a serving
    * path) is checkpointed once and re-scored per truncation: the
    * prefix dot is the prefix of the full fixed-order fold
    * (`dot(a[1:d], b[1:d])`), so every score is engine-exact and no
    * extra corpus scan exists per dims entry. The full-dimension row
    * is the truth compared against itself — its recall MUST be 1000,
    * which pins the machinery (GuardrailsSpec asserts it).
    *
    * Output: `(dims, n_truth, n_hits, recall_x1000)`, one row per
    * truncation. */
  def mrlRecall(corpus: DataFrame, queries: DataFrame,
      dims: Seq[Int] = Seq(16, 32, 64), k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Similarity.dot
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .localCheckpoint(eager = false) // re-scored per truncation
    def topk(d: Int): DataFrame = {
      val qa = slice(col("q_emb"), 1, d)
      val ca = slice(col("c_emb"), 1, d)
      pairs
        .withColumn("s",
          dot(qa, ca) / (sqrt(dot(qa, qa)) * sqrt(dot(ca, ca))))
        .withColumn("rank", row_number().over(Window
          .partitionBy("query_id")
          .orderBy(col("s").desc, col("neighbor_id"))))
        .filter(col("rank") <= k)
        .select("query_id", "neighbor_id")
    }
    val full = corpus.select(size(col("embedding"))).head.getInt(0)
    val truth = topk(full).localCheckpoint(eager = false)
    val nTruth = broadcast(truth.agg(count(lit(1)).as("n_truth")))
    dims.sorted.map { d =>
      require(d >= 1 && d <= full, s"dims $d outside 1..$full")
      truth.join(topk(d), Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(nTruth)
        .select(lit(d.toLong).as("dims"), col("n_truth"), col("n_hits"),
          expr("CASE WHEN n_truth = 0 THEN 0L " +
            "ELSE n_hits * 1000 div n_truth END").as("recall_x1000"))
    }.reduce(_ union _).orderBy("dims")
  }
}
