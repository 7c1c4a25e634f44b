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

    // the k/dim parameters are STRUCTURAL (they size the generated
    // code), so SQL callers must pass integer literals — a column
    // argument has no single value at plan time
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an INTEGER LITERAL, got $other")
    }

    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "rolling polynomial hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash30"),
      info("simhash30", "30-bit simhash of whitespace tokens"),
      (exprs: Seq[Expression]) => SimHash30(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "fixed-order float-array dot product"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("trigram_lang_id"),
      info("trigram_lang_id", "character-trigram language id"),
      (exprs: Seq[Expression]) => TrigramLangId(exprs.head)))
    ext.injectFunction((FunctionIdentifier("shingle_fps"),
      info("shingle_fps", "distinct word-k-shingle fingerprints"),
      (exprs: Seq[Expression]) =>
        ShingleFps(exprs.head, intLit(exprs(1), "shingle_fps k"))))
    ext.injectFunction((FunctionIdentifier("gram_fps"),
      info("gram_fps", "word-k-gram fingerprints, multiplicity kept"),
      (exprs: Seq[Expression]) =>
        GramFps(exprs.head, intLit(exprs(1), "gram_fps k"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash signature over shingle fps"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs.head, intLit(exprs(1), "minhash_sig n"))))
    ext.injectFunction((FunctionIdentifier("hashed_bow"),
      info("hashed_bow", "feature-hashed bag-of-words counts"),
      (exprs: Seq[Expression]) =>
        HashedBow(exprs.head, intLit(exprs(1), "hashed_bow dim"))))
    ext.injectFunction((FunctionIdentifier("sorted_long_intersect"),
      info("sorted_long_intersect",
        "two-pointer intersection of sorted long arrays"),
      (exprs: Seq[Expression]) => SortedLongIntersect(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "60-bit simhash of whitespace tokens"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)))

    // ---- the reference's literal SQL table-function surface --------
    // (`duck_delta_share_extension.cpp:654-661`): builders live in
    // [[graft.sources.DeltaShare]] so an already-running session can
    // also register them via `DeltaShare.registerSql(spark)`.
    ext.injectTableFunction((FunctionIdentifier("delta_share_list"),
      info("delta_share_list",
        "list shares (0 args) / schemas (share) / tables (share, schema)"),
      graft.sources.DeltaShare.listTvfBuilder))
    ext.injectTableFunction((FunctionIdentifier("delta_share_read"),
      info("delta_share_read",
        "delta_share_read('share','schema','table') — shared-table scan"),
      graft.sources.DeltaShare.readTvfBuilder))
  }
}
