package graft.operators

import org.apache.spark.sql.DataFrame
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
