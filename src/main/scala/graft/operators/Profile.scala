package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-distribution diagnostics: the measurement step before every
  * skew decision — salting factor for [[SkewJoin]], AQE skew-join
  * thresholds, partition counts for a shuffle on the key. At 100 TB
  * you profile first; guessing a salt factor blind either
  * under-splits (one straggler task) or over-splits (a needless
  * explode of the other side).
  */
object Profile {

  /** Heavy-hitter profile of `keyCol`: the top `topN` keys by row
    * count, each with its integer-exact corpus share (parts per
    * million) plus the global key count and total, so one result row
    * answers "how bad is the worst key, and out of how many".
    *
    * Scale shape: ONE partial-aggregated hash shuffle on the key
    * (the same shuffle the eventual join would do — so the profile
    * costs no more than one round of the thing it protects); the
    * totals aggregate the per-key COUNTS, never re-scanning the
    * corpus, and ride back as a broadcast 1-row frame; the top-N is
    * a `TakeOrdered`, never a global sort. */
  /** Count-Min sketch frequency estimates (q59): a `depth × width`
    * counter grid — row `j` buckets each key by an independent hash,
    * a key's estimate is the MIN of its `depth` bucket counters
    * (never an underestimate; overestimate bounded by collisions,
    * E[err] ≤ n/width per row). Unlike sampled or order-sensitive
    * sketches, CMS is DETERMINISTIC and MERGEABLE — counters are
    * plain sums, so partial sketches combine map-side, across
    * partitions, days, or streams — which also makes it
    * SQL-oracle-exact (the gate recomputes the same grid).
    *
    * This report probes the sketch with the exact top-`topN` keys and
    * emits true vs estimated counts — the error measurement you run
    * before trusting a sketch config at scale (the ss4/ss7 "recall
    * measured, not guessed" discipline, applied to frequencies).
    *
    * Scale shape: the sketch build is ONE map-side-combinable
    * aggregation whose exchange carries at most `depth × width`
    * counters per partition — corpus size never crosses the wire;
    * the exact top-N (for the report only) reuses [[keySkew]]'s
    * partial-agg + TakeOrdered shape; probes join the 1024-row
    * sketch broadcast. */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, topN: Int = 20,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val js = lit((0 until depth).toArray)
    val rows = df.select(col(keyCol).cast("string").as("key"))
    val sketch = cmsSketch(df, keyCol, depth, width)
    val top = rows.groupBy("key").agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("key")).limit(topN)
    top.select(col("key"), col("n_true"), explode(js).as("j"))
      .select(col("key"), col("n_true"), col("j"),
        bucket(col("j"), col("key"), width).as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("key")
      .agg(max("n_true").as("n_true"),
        min(coalesce(col("c"), lit(0L))).as("n_est"))
      .orderBy(col("n_true").desc, col("key"))
  }

  /** The bare CMS counter grid `(j, bucket, c)` — `depth × width`
    * rows. A plain two-column streaming-legal aggregation: run it on
    * a `readStream` frame and Structured Streaming maintains the
    * sketch with O(depth × width) state over an unbounded stream
    * (update/complete mode), the canonical bounded-memory frequency
    * monitor; batch grids from different days merge by summing `c`.
    * Bucket hash: base-31 fingerprint of `"j:key"` — independent
    * rows via the seed prefix, cross-engine replayable. */
  def cmsSketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    val js = lit((0 until depth).toArray)
    df.select(explode(js).as("j"), col(keyCol).cast("string").as("key"))
      .select(col("j"), bucket(col("j"), col("key"), width).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
  }

  private def bucket(j: Column, key: Column, width: Int): Column =
    pmod(graft.operators.TextAnalysis.fingerprint(
      concat_ws(":", j, key)), lit(width.toLong))

  /** HyperLogLog cardinality sketch as DATA (q64): 256 max-rank
    * registers per group, built from the cross-engine-replayable
    * polynomial fingerprint — register = hash("r:"+key) mod 256, rank
    * = 1 + trailing-zero count of hash("z:"+key), capped at 16. Where
    * `approx_count_distinct` (st5) hides its HLL++ state inside an
    * opaque buffer, these registers are rows: mergeable across
    * partitions, days, or engines by `MAX` per register (max is
    * streaming-legal, so a `readStream` maintains the same sketch
    * with O(groups × 256) state), and integer-exact for the oracle
    * gate — DuckDB replays the identical hash and CASE ladder.
    *
    * The report emits, per group: registers touched, the exact
    * harmonic denominator `s = Σ 2^(16−rank)` (untouched registers
    * count 2^16), the raw HLL estimate in pure integer math
    * (`α·m²·2^16` scaled ppm — no float in either engine), and the
    * EXACT distinct count as the error probe — the same
    * measured-not-guessed discipline as q59/ss4.
    *
    * Scale shape: one map-side-combinable aggregation; the exchange
    * carries ≤ groups × 256 (register, max-rank) pairs per partition,
    * never the corpus. The exact-distinct probe is report-only — at
    * 100 TB you'd drop that column and keep the sketch. */
  def hllRegisters(df: DataFrame, groupCol: String,
      keyCol: String): DataFrame = {
    val m = 256
    val key = col(keyCol).cast("string")
    val reg = pmod(graft.operators.TextAnalysis.fingerprint(
      concat(lit("r:"), key)), lit(m.toLong))
    val z = graft.operators.TextAnalysis.fingerprint(
      concat(lit("z:"), key))
    // rank = 1 + trailing zeros of z, capped at 16: the largest
    // power-of-two divisor wins, so fold smallest→largest and let
    // each later `when` wrap (outermost test = 2^15)
    val rank = (1 to 15).foldLeft(lit(1)) { (acc, k) =>
      when(pmod(z, lit(1L << k)) === 0, k + 1).otherwise(acc)
    }
    val regs = df
      .select(col(groupCol).as("grp"), reg.as("reg"), rank.as("rnk"))
      .groupBy("grp", "reg").agg(max("rnk").as("rnk"))
    val sketch = regs.groupBy("grp").agg(
      count(lit(1)).as("registers_used"),
      (sum(expr("shiftleft(CAST(1 AS BIGINT), 16 - rnk)")) +
        (lit(m.toLong) - count(lit(1))) * lit(65536L)).as("s"))
    // raw HLL estimate, integer-only: est = α₂₅₆ · m² · 2^16 / s with
    // α as the ppm constant 718353 and m²·2^16 = 4294967296 — the
    // identical integer division in both engines
    val est = expr(
      s"718353L * ${m.toLong * m * 65536L}L div (1000000L * s)")
    val exact = df
      .select(col(groupCol).as("grp"), key.as("key"))
      .groupBy("grp").agg(countDistinct("key").as("n_exact"))
    sketch
      .join(exact, Seq("grp"))
      .select(col("grp"), col("registers_used"), col("s"),
        est.as("n_est"), col("n_exact"))
      .orderBy("grp")
  }

  /** Ordered n-step conversion funnel (q61): how many users performed
    * `steps(0)`, then `steps(1)` STRICTLY after it, then `steps(2)`
    * strictly after that — the sequential-pattern readout every
    * product-analytics engine ships (and the st7 attribution join
    * can't answer, because each step's clock starts at the PREVIOUS
    * step's first completion).
    *
    * Single-pass shape: one running window per step, all on the same
    * `(user, ts, event_id)` ordering — step i's earliest-completion
    * time is `min(ts | type = steps(i) ∧ ts > step_{i−1}_time)` over
    * the running frame, a chain Catalyst plans as ONE exchange + ONE
    * sort shared by every step (dependent windows reuse the
    * partitioning and ordering). Per-user reach flags then aggregate
    * on the already-user-partitioned rows (no second corpus
    * exchange), and the step totals are a single-row final reduce.
    * No self-joins: the naive k-step funnel is k−1 self-joins of the
    * event log — k−1 corpus shuffles — this is 1.
    *
    * Output: one row per step with reached-user count and ppm
    * conversion vs step 0 (integer math, oracle-exact). */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(steps.nonEmpty)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events.select(
      col("user_id"), col("event_id"), col("ts"), col("event_type"))
    steps.zipWithIndex.foreach { case (step, i) =>
      val hit = if (i == 0) col("event_type") === step
        else col("event_type") === step && col("ts") > col(s"s${i - 1}")
      df = df.withColumn(s"s$i", min(when(hit, col("ts"))).over(w))
    }
    val reachCols = steps.indices.map(i =>
      max(when(col(s"s$i").isNotNull, 1L).otherwise(0L)).as(s"r$i"))
    val reach = df.groupBy("user_id")
      .agg(reachCols.head, reachCols.tail: _*)
    val totals = reach.agg(
      sum(s"r0").as("n0"),
      steps.indices.drop(1).map(i => sum(s"r$i").as(s"n$i")): _*)
    val stepRows = steps.indices.map { i =>
      struct(lit(i).as("step"), lit(steps(i)).as("event_type"),
        col(s"n$i").as("users"),
        when(col("n0") === 0, lit(null).cast("long"))
          .otherwise(expr(s"n$i * 1000000L div n0")).as("conv_ppm"))
    }
    totals
      .select(explode(array(stepRows: _*)).as("x"))
      .select(col("x.step"), col("x.event_type"), col("x.users"),
        col("x.conv_ppm"))
      .orderBy("step")
  }

  /** First-order Markov transition matrix of the event stream (q65):
    * per (from_type → to_type) ordered-successor pair, the count and
    * the integer-exact row-conditional probability in ppm — the
    * behavioral summary behind next-event prediction features, funnel
    * DESIGN (which step orders actually occur), and bot detection
    * (impossible transition mass).
    *
    * Successor pairing is a `lead` window over `(user, ts, event_id)`
    * — ONE user-keyed exchange, the same partitioning [[funnel]]
    * uses; the (from, to) count is a map-side-combinable hash agg on
    * the few-distinct-types pairs, and the row totals come from a
    * window over that TINY matrix, never a second corpus pass.
    *
    * Output: `(from_type, to_type, n, p_ppm)` ordered by pair. */
  def eventTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = trans
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("row_total",
        sum("n").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div row_total").as("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  /** Weekly retention cohorts (q66): users grouped by first-active
    * week, each later week reporting how many came back — the
    * engagement triangle every activity dashboard starts from, and
    * on a training-data service the freshness measure of sources
    * (cohort = first-crawl week of a feed).
    *
    * Scale shape: ONE user-keyed exchange — the distinct
    * (user, week) pass; the per-user first week aggregates on the
    * same partitioning (no second corpus exchange), the join back is
    * key-equi on user, and the (cohort, offset) rollup is a
    * map-side-combinable agg over an already-narrow frame. Cohort
    * sizes come from a window over the tiny retention matrix itself
    * — never a corpus re-scan. Integer ppm, oracle-exact.
    *
    * Output: `(cohort_week, week_offset, n_users, retention_ppm)`. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uw = events
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
      .localCheckpoint(eager = false) // cohort agg + offset join
    val cohorts = uw.groupBy("user_id")
      .agg(min("week").as("cohort_week"))
    val m = uw.join(cohorts, "user_id")
      .select(col("cohort_week"),
        expr("CAST(datediff(week, cohort_week) div 7 AS BIGINT)")
          .as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    m.withColumn("cohort_size",
        max(when(col("week_offset") === 0L, col("n_users")))
          .over(Window.partitionBy("cohort_week")))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        expr("n_users * 1000000 div cohort_size").as("retention_ppm"))
      .orderBy("cohort_week", "week_offset")
  }

  /** EXACT quantiles without a global sort (q69): for each requested
    * `q_ppm`, return the actual element at 0-based rank
    * `⌊(n−1)·q/10⁶⌋` of the sorted column — discrete-quantile
    * semantics, bit-exact because a REAL element is returned, never
    * an interpolation.
    *
    * The naive plan (`row_number() OVER (ORDER BY v)`) is a
    * single-reducer sort of the corpus. Instead, the
    * histogram-refinement shape of `Packing.tokenBudgetSelect`:
    *
    *  0. a 1-row (min, max) pre-aggregation fixes the OBSERVED value
    *     domain (one extra pushed-down column scan) — the bucket key
    *     is the affine `⌊(v−lo)·B/(hi−lo)⌋`, NOT `⌊v⌋`, so a column
    *     whose whole domain is narrower than one unit (scores in
    *     [0,1), ratios, normalized floats) still spreads over B
    *     buckets instead of collapsing to a single-reducer corpus
    *     sort in pass 2;
    *  1. ONE map-side-combinable aggregation builds the B-bucket
    *     histogram — B is fixed (default 2¹⁶), independent of the
    *     corpus; its running totals are a window over that bounded
    *     frame;
    *  2. each target rank resolves to (bucket, intra-bucket offset)
    *     against the broadcast histogram; pass 2 re-reads ONLY the
    *     picked buckets (a broadcast semi-probe — at most one bucket
    *     per requested quantile) and ranks within each, windows
    *     partitioned per bucket.
    *
    * Equal values make the intra-bucket row_number choice arbitrary
    * but the returned VALUE identical — the output is deterministic.
    * A single massively-repeated value is the one residual hot spot:
    * equal keys are irreducible by any value-based split, so a picked
    * bucket holding one dominant value still ranks it on one
    * partition (ties sort cheaply, but the rows co-locate). The
    * all-equal COLUMN case short-circuits without any pass 2.
    *
    * Output: `(q_ppm, value)`, one row per requested quantile. */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qsPpm: Seq[Long], buckets: Int = 1 << 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // NOT checkpointed: each re-read is a 1-column pushed-down
    // parquet scan — at corpus scale re-scanning one column beats
    // materializing it, and the visible plan keeps its partial aggs
    val v = df.select(col(valueCol).cast("double").as("v"))
    // driver-side 1-row scalar: the observed domain for the affine key
    val mm = v.agg(min("v").as("lo"), max("v").as("hi")).head()
    if (mm.isNullAt(0))                       // empty (or all-null) input
      return qsPpm.toDF("q_ppm").select(col("q_ppm"),
        lit(null).cast("double").as("value")).limit(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    if (lo == hi)                             // all-equal column: rank-free
      return qsPpm.toDF("q_ppm").select(col("q_ppm"), lit(lo).as("value"))
    val bucketOf = affineBucket(col("v"), lo, hi, buckets)
    val hist = v.groupBy(bucketOf.as("b"))
      .agg(count(lit(1)).as("n"))
    // bounded by the value domain, not the corpus — the
    // tokenBudgetSelect precedent for an unpartitioned window
    val histW = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cumn", sum("n").over(histW))
      .withColumn("base", col("cumn") - col("n"))
    // rank = ⌊(n−1)·q/10⁶⌋ via the exact split
    // (kM+s)·q div M = k·q + (s·q div M) — never builds the raw
    // (n−1)·q product, which would wrap Long beyond ~9.2e12 rows
    // (the mx7 overflow lesson, solved in integers here because the
    // rank must be EXACT, not a ppm share)
    val qdf = qsPpm.toDF("q_ppm")
      .crossJoin(broadcast(hist.agg(sum("n").as("total"))))
      .withColumn("r", expr(
        "(total - 1) div 1000000 * q_ppm + " +
          "((total - 1) % 1000000) * q_ppm div 1000000"))
    val picks = cum.join(broadcast(qdf),
        col("base") <= col("r") && col("r") < col("cumn"))
      .select(col("q_ppm"), col("b"), (col("r") - col("base")).as("off"))
    val bucketRows = v
      .withColumn("b", bucketOf)
      .join(broadcast(picks.select("b").distinct()), Seq("b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("b").orderBy("v")).cast("long") - 1L)
    // picks is ≤ |qsPpm| rows — broadcast, never a shuffled join
    broadcast(picks).join(bucketRows,
        picks("b") === bucketRows("b") && col("off") === col("rn"))
      .select(col("q_ppm"), col("v").as("value"))
  }

  /** Affine domain-adaptive bucket key for [[exactQuantiles]]:
    * `⌊(v−lo)·B/(hi−lo)⌋` clamped to B−1 (so v=hi lands in the last
    * bucket). Monotonic in v — subtraction of a shared lo and
    * multiplication/division by positive constants are all monotone
    * under IEEE rounding — so cumulative bucket counts order
    * correctly. Exposed package-private so tests can pin the spread
    * bound on fractional domains. */
  private[graft] def affineBucket(v: Column, lo: Double, hi: Double,
      buckets: Int): Column =
    least(floor((v - lit(lo)) * lit(buckets.toDouble) / lit(hi - lo)),
      lit((buckets - 1).toDouble)).cast("long")

  def keySkew(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum("n").as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n"),
        expr("n * 1000000 div total").as("share_ppm"),
        col("total"), col("n_keys"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
  }
}
