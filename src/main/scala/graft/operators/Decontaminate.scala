package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag every corpus
  * document that shares at least one word-k-gram with a held-out
  * evaluation set (the n-gram-overlap rule used to scrub eval leakage
  * from web-scale training data; k = 13 in the GPT-3 appendix, smaller
  * here to suit the fixture's short documents).
  *
  * Scale shape (100 TB corpus, MB–GB eval set):
  *
  *  1. k-gram fingerprints are computed per-row with the codegen'd
  *     [[graft.functions.ShingleFps]] expression (distinct per doc —
  *     one shared gram is enough to flag, multiplicity is irrelevant);
  *  2. the eval set's distinct gram fingerprints are tiny by
  *     construction (benchmarks are, at most, millions of grams ×
  *     8 bytes), so they are `broadcast()` and the corpus side is a
  *     map-side LEFT SEMI probe — the 100 TB side is never shuffled;
  *  3. per-doc hit counts aggregate (id, count) pairs only.
  *
  * The final left join restores zero-hit documents so the output is a
  * complete keep/drop manifest, not just the flagged subset.
  */
object Decontaminate {

  /** Per-document eval-overlap counts over word-`k`-grams.
    *
    * @param isEval predicate over `docs` columns selecting the
    *               held-out set; eval rows are excluded from the
    *               output manifest.
    * @return (doc_id, n_hits, contaminated) for every non-eval doc,
    *         where n_hits counts the doc's DISTINCT k-grams that also
    *         occur anywhere in the eval set.
    */
  def ngramOverlap(docs: DataFrame, isEval: Column, k: Int = 5): DataFrame = {
    val sh = docs.select(col("doc_id"), isEval.as("is_eval"),
      explode(Dedup.shingles(col("text"), k)).as("s"))
    val evalGrams = sh.filter(col("is_eval")).select("s").distinct()
    val hits = sh.filter(!col("is_eval"))
      .join(broadcast(evalGrams), Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    docs.filter(!isEval).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
