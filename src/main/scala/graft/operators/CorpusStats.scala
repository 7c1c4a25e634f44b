package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level co-occurrence statistics: document-frequency PMI over
  * word pairs (phrase mining / collocation discovery — the corpus-wide
  * counterpart of the per-document [[TextAnalysis]] signals).
  *
  * PMI surrogate: `pmi_x1000 = n_ab * N * 1000 div (n_a * n_b)` —
  * the log of this is PMI + log 1000, so rankings are identical to
  * true PMI while the score stays integer-exact for cross-engine
  * verification (same trade as the TF-IDF surrogate in
  * [[TextAnalysis.topTfidfTerm]]).
  *
  * Scale shape: pair generation joins the (doc, word) exploded frame
  * with itself ON doc_id — co-partitioned, so each document's pairs
  * are produced locally; cost is Σ(distinct words per doc)², bounded
  * by document length, never corpus². Word document-frequencies are a
  * vocabulary-sized frame, broadcast; the corpus count is a broadcast
  * 1-row frame (no eager count()); the final top-N is a
  * TakeOrdered, not a global sort.
  */
object CorpusStats {

  /** Corpus-bigram-LM predictability score per document — the CCNet
    * pattern (Wenzek et al. 2020 filter corpora by LM perplexity
    * buckets), with the LM being the corpus's own bigram statistics
    * and the score an INTEGER perplexity surrogate: per bigram
    * occurrence, the conditional-probability estimate
    * `count(w1 w2) * 1000 div count(w1)`; per document, the mean of
    * those per-milles. High = predictable/boilerplate-like text, low =
    * rare constructions — the tails are what quality filters cut. A
    * true perplexity needs `log`, whose last-ulp varies across libm
    * implementations; the integer mean keeps the ranking signal and
    * the cross-engine hash (same trade as the TF-IDF and PMI
    * surrogates).
    *
    * Scale shape: bigram/unigram count tables are vocabulary-sized
    * hash aggregations (map-side combinable); occurrences join them on
    * the gram fingerprint — narrow (id, fp) rows, no text and no
    * vectors on any exchange; the per-doc rollup is one more
    * map-side-combinable aggregation. Three shuffles total, all
    * bounded by occurrence/vocabulary counts. */
  def lmScore(docs: DataFrame): DataFrame = {
    import graft.functions.hashFunctions.gram_fps
    // (doc_id, bigram fp, first-token fp) per bigram occurrence — the
    // first token of the bigram at position i is unigram i. The gram
    // arrays are STAGED into their own projection first: Catalyst does
    // not CSE across higher-order functions, so referencing
    // gram_fps(text, 2) twice in one select would run the full
    // tokenize+fingerprint pass twice per row (the quantizedFrame
    // lesson).
    val staged = docs.select(col("doc_id"),
      gram_fps(col("text"), 2).as("g2s"),
      gram_fps(col("text"), 1).as("g1s"))
    val occ = staged.select(col("doc_id"),
      explode(zip_with(
        col("g2s"),
        slice(col("g1s"), lit(1), size(col("g2s"))),
        (b, u) => struct(b.as("g2"), u.as("g1")))).as("z"))
      .select(col("doc_id"), col("z.g2").as("g2"), col("z.g1").as("g1"))
      .localCheckpoint(eager = false) // consumed by both count joins
    val c2 = occ.groupBy("g2").agg(count(lit(1)).as("c2"))
    val c1 = occ.select(col("doc_id"), col("g1"))
      .groupBy("g1").agg(count(lit(1)).as("c1"))
    occ.join(c2, "g2").join(c1, "g1")
      .withColumn("s", expr("(c2 * 1000) div c1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(s) div count(1)").as("lm_score_pm"))
  }

  /** Top-`topN` word pairs by the integer PMI surrogate, among pairs
    * co-occurring in at least `minPairDocs` documents. All counts are
    * document frequencies (distinct words per document). */
  def pmiTopPairs(docs: DataFrame, minPairDocs: Long = 5L,
      topN: Int = 20): DataFrame = {
    val dw = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("w"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val wc = dw.groupBy("w").agg(count(lit(1)).as("nw"))
    val pairs = dw.toDF("doc_id", "wa")
      .join(dw.toDF("doc_id", "wb"), Seq("doc_id"))
      .filter(col("wa") < col("wb"))
      .groupBy("wa", "wb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairDocs)
    pairs
      .join(broadcast(wc.toDF("wa", "n_a")), Seq("wa"))
      .join(broadcast(wc.toDF("wb", "n_b")), Seq("wb"))
      .crossJoin(broadcast(nDocs))
      .select(col("wa"), col("wb"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(n_ab * n_docs * 1000) div (n_a * n_b)").as("pmi_x1000"))
      .orderBy(col("pmi_x1000").desc, col("wa"), col("wb"))
      .limit(topN)
  }

  /** Per-source boilerplate k-grams: for every `source`, the top-N
    * gram fingerprints by within-source document frequency, among
    * grams appearing in ≥ `minPct`% of that source's documents —
    * template/boilerplate mining (site headers, navigation text,
    * license blurbs), the measurement that justifies df-capped
    * candidate generation in [[Dedup.jaccardPairs]] and feeds
    * boilerplate-strip rules in a curation pipeline.
    *
    * Scale shape: ONE map-side-combinable hash aggregation on
    * (source, gram) — grams are distinct per doc ([[Dedup.shingles]]),
    * so the partial aggregates collapse before the exchange; per-source
    * doc counts are a sources-sized broadcast; the rank window runs
    * only over the df-filtered survivors (boilerplate grams are by
    * definition few per source). Corpus text never shuffles. */
  def boilerplateGrams(docs: DataFrame, k: Int = 3, minPct: Int = 10,
      topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = docs.select(col("source"),
      explode(Dedup.shingles(col("text"), k)).as("s"))
    val df = ex.groupBy("source", "s").agg(count(lit(1)).as("df"))
    val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("source").orderBy(col("df").desc, col("s"))
    df.join(broadcast(nd), "source")
      .filter(col("df") * 100 >= col("n_docs") * minPct)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select("source", "rank", "s", "df", "n_docs")
  }

  /** Per-source corpus-health panel (t19): the Zipf/Heaps-style
    * vocabulary statistics a crawl-quality dashboard watches —
    * token count, type (distinct-word) count, type/token ratio,
    * top-word mass share, and hapax-legomenon share (words seen
    * exactly once), all as integer ppm so the report is
    * cross-engine exact. A healthy natural-language source keeps
    * TTR and hapax share in a stable band; template/spam sources
    * crater both (few types, no hapaxes), and OCR-noise sources
    * inflate them (every garble is a new "word") — the two failure
    * modes this panel separates at a glance.
    *
    * Scale shape: one corpus scan explodes to (source, word-fp)
    * LONGS with multiplicity; the (source, fp) hash agg combines
    * map-side so the exchange carries ≤ per-source vocabulary rows;
    * the per-source rollup is a second bounded agg. Text never
    * shuffles. */
  /** Cross-source n-gram overlap matrix (t20): for every source
    * pair, how many distinct word-5-gram fingerprints they SHARE,
    * and the containment of the smaller side
    * (`⌊overlap·10⁶ / min(grams_a, grams_b)⌋`) — the redundancy
    * audit run BEFORE fixing a mixture: two "independent" web
    * sources with 40% containment are the same crawl twice, and
    * upweighting both double-counts the duplicated mass that
    * [[graft.operators.Mixture.epochPlan]] would then repeat.
    *
    * Scale shape: one distinct over (source, fp) — a map-side-
    * combinable exchange of 16-byte rows, ≤ per-source distinct-gram
    * counts whatever the corpus size; the per-gram pair expansion is
    * bounded by `n_sources²` per gram (sources are dozens, never
    * corpus-sized — this is the dimension that makes the self-join
    * safe where a per-DOC join would not be); totals ride a
    * broadcast. Text never shuffles. The containment is the same
    * double-floor ppm surrogate as `epochPlan` (one IEEE product,
    * quotient, floor — bit-identical cross-engine; integer
    * `overlap·10⁶` would wrap Long beyond ~9.2e12 grams).
    *
    * Output: `(source_a, source_b, grams_a, grams_b, overlap,
    * containment_ppm)`, one row per source pair sharing ≥ 1 gram. */
  def sourceOverlap(docs: DataFrame, k: Int = 5): DataFrame = {
    val g = docs.select(col("source"),
        explode(Dedup.shingles(col("text"), k)).as("fp"))
      .distinct()
      .localCheckpoint(eager = false) // totals + both pair-join sides
    val totals = g.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val pairs = g.toDF("source_a", "fp")
      .join(g.toDF("source_b", "fp"), Seq("fp"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("overlap"))
    pairs
      .join(broadcast(totals.toDF("source_a", "grams_a")), Seq("source_a"))
      .join(broadcast(totals.toDF("source_b", "grams_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("grams_a"),
        col("grams_b"), col("overlap"),
        floor(col("overlap").cast("double") * lit(1000000.0)
          / least(col("grams_a"), col("grams_b")).cast("double"))
          .cast("long").as("containment_ppm"))
  }

  def corpusHealth(docs: DataFrame): DataFrame = {
    import graft.functions.hashFunctions.gram_fps
    val words = docs.select(col("source"),
      explode(gram_fps(col("text"), 1)).as("fp"))
    val wc = words.groupBy("source", "fp").agg(count(lit(1)).as("n"))
    wc.groupBy("source").agg(
        sum("n").as("n_tokens"),
        count(lit(1)).as("n_types"),
        max("n").as("top_count"),
        sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        expr("top_count * 1000000 div n_tokens").as("top_share_ppm"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
      .orderBy("source")
  }
}
