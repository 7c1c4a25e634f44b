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
