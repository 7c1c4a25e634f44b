package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row of
  * the same key whose time is ≤ the left time. Spark has no built-in
  * as-of join; rather than a custom physical operator, this composes
  * union + window (the plan Spark would want anyway):
  *
  *  1. union both sides tagged (right=0, left=1), aligned schemas;
  *  2. one shuffle: window partitioned by key, ordered by
  *     (time, tag, right tie-break);
  *  3. `last(value, ignoreNulls)` over the unbounded-preceding frame
  *     carries the latest right values forward;
  *  4. keep left rows.
  *
  * Cost at scale: ONE shuffle of |L|+|R| rows on the key — no range
  * explosion, no per-key collect, and AQE handles key skew. This is
  * the sort-merge as-of pattern used by time-series engines,
  * expressed in Catalyst operators so codegen applies.
  */
object AsOfJoin {

  /** @param left       left frame
    * @param right      right frame (must be unique per (key, time) for
    *                   deterministic results; pre-aggregate if not)
    * @param leftKey    join key column on the left
    * @param rightKey   join key column on the right
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param rightVals  right columns to attach (name -> column name)
    */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
    val lAligned = rightVals.foldLeft(l)((df, v) =>
      df.withColumn(s"_rv_$v", lit(null).cast(right.schema(v).dataType)))
    val r0 = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_tag", lit(0))
    val rAligned = leftCols.foldLeft(r0)((df, c) =>
      df.withColumn(s"_lv_$c", lit(null).cast(left.schema(c).dataType)))
      .select(Seq(col("_k"), col("_t"), col("_tag")) ++
        leftCols.map(c => col(s"_lv_$c").as(c)) ++
        rightVals.map(v => col(v).as(s"_rv_$v")): _*)
    val lSel = lAligned.select(Seq(col("_k"), col("_t"), col("_tag")) ++
      leftCols.map(col) ++ rightVals.map(v => col(s"_rv_$v")): _*)

    val unioned = lSel.unionByName(rAligned)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned)((df, v) =>
      df.withColumn(s"_asof_$v",
        last(col(s"_rv_$v"), ignoreNulls = true).over(w)))
    carried
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"_asof_$v").as(s"asof_$v")): _*)
  }
}
