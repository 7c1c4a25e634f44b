package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session extensions: registers graft's native expressions as SQL
  * functions at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *   // or .withExtensions(new GraftExtensions)
  * }}}
  *
  * then `SELECT poly_hash(text), simhash30(text) FROM docs`, or
  * `vec_dot(a, b)` in any SQL expression. (For an already-running
  * session, `graft.functions.hashFunctions.register(spark)` does the
  * same through the function registry.)
  *
  * No custom optimizer rules or strategies are injected: core parity
  * needs none (SURVEY.md §4 — the DSv2 connector interfaces cover the
  * reference's whole optimizer surface), and the pipeline operators
  * compose built-in operators that Catalyst already plans well.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", name)

    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "rolling polynomial hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash30"),
      info("simhash30", "30-bit simhash of whitespace tokens"),
      (exprs: Seq[Expression]) => SimHash30(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "fixed-order float-array dot product"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
  }
}
