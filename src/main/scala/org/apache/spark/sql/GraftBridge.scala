package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` bridge: converts between public `Column`s
  * and Catalyst `Expression`s so graft's custom expressions
  * (PolyHash, VecDot, …) can surface as ordinary columns. This is the
  * standard third-party-connector pattern (the classic Column API
  * deliberately hides its expression in Spark 4). Nothing else in the
  * codebase lives in this package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder into an existing session's registry
    * (runtime equivalent of `SparkSessionExtensions.injectFunction`). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
