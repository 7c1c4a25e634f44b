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
  /** The Spark minor line this bridge's `private[sql]` surface
    * (`classic.ExpressionUtils`, `classic.SparkSession.sessionState`)
    * is written against. Internal APIs may move between minor
    * versions; a guard test asserts the runtime matches so an
    * accidental Spark bump fails loudly at build time instead of
    * linking against a moved internal. */
  val TargetSparkVersionPrefix = "4.1"

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder into an existing session's registry
    * (runtime equivalent of `SparkSessionExtensions.injectFunction`). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Register a TABLE-function builder into an existing session
    * (runtime equivalent of `SparkSessionExtensions
    * .injectTableFunction`) — for sessions built without the
    * extensions, e.g. an interactive shell that wants
    * `delta_share_list()` after the fact. */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState
      .tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
}
