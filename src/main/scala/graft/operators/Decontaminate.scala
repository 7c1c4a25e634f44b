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
  /** SURGICAL decontamination (dc7) — excise only the eval-matching
    * SPANS instead of dropping whole documents: a long document that
    * quotes one benchmark question loses those tokens, not its
    * million clean ones. Every maximal run of consecutive
    * eval-matching k-grams becomes one span (the dd16 gaps-and-islands
    * rule), the span's token range `[start, end+k−1]` is cut from the
    * normalized token stream, and the rewrite reports what left (the
    * dd17 contract, applied to contamination).
    *
    * Scale shape: the eval gram set is tiny and broadcasts (the dc1
    * discipline — unlike dd17's duplicate detector, NO corpus-wide
    * gram aggregation exists here: the 100 TB side is a map-side
    * posexplode + LEFT SEMI probe); matching gram positions are
    * hit-sized, island windows partition per affected doc, spans
    * aggregate to ONE bounded row per affected doc, and the corpus
    * text crosses only the final rewrite join (broadcast when the
    * affected set is small). The cut is a per-row indexed filter HOF.
    *
    * Output: `(doc_id, n_tokens, n_removed, clean_text)` for every
    * non-eval doc (`n_removed = 0`, untouched tokens when clean). */
  def stripEvalSpans(docs: DataFrame, isEval: Column,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.hashFunctions.gram_fps
    val evalGrams = docs.filter(isEval)
      .select(explode(array_distinct(gram_fps(col("text"), k))).as("h"))
      .distinct()
    val g = docs.filter(!isEval).select(col("doc_id"),
      posexplode(gram_fps(col("text"), k)).as(Seq("pos", "h")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val spans = g.join(broadcast(evalGrams), Seq("h"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("s0"), max("pos").as("e0"))
      .select(col("doc_id"), struct(col("s0").as("s"),
        (col("e0") + lit(k - 1)).as("e")).as("sp"))
      .groupBy("doc_id")
      .agg(collect_list(col("sp")).as("spans"))
    docs.filter(!isEval)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept", filter(col("toks"), (_, i) =>
        col("spans").isNull || !exists(col("spans"), sp =>
          i >= sp.getField("s") && i <= sp.getField("e"))))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }

  def ngramOverlap(docs: DataFrame, isEval: Column, k: Int = 5): DataFrame = {
    val sh = docs.select(col("doc_id"), isEval.as("is_eval"),
      explode(Dedup.shingles(col("text"), k)).as("s"))
    val evalGrams = sh.filter(col("is_eval")).select("s").distinct()
    val hits = sh.filter(!col("is_eval"))
      .join(broadcast(evalGrams), Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    manifest(docs, isEval, hits)
  }

  /** [[ngramOverlap]] with a Bloom-filter prefilter instead of a
    * broadcast hash join against the full eval-gram set — for when
    * the eval corpus itself is big (a merged suite of benchmarks,
    * dozens of GB of grams): a hash set that size can't ride every
    * executor, but `mBits` of bitmap can.
    *
    * Exactness is preserved, so the output is bit-identical to
    * [[ngramOverlap]] (one oracle covers both):
    *
    *  1. the bitmap is built AS DATA — each eval gram sets `nHashes`
    *     bits (affine probes mod `mBits`, same integer-hash family as
    *     MinHash), `bit_or`-aggregated into 64-bit words, collected
    *     into ONE map row and broadcast. No driver-side sketch
    *     object, no UDF: every step is a Catalyst expression;
    *  2. corpus grams probe the bitmap map-side. A Bloom filter has
    *     NO false negatives, so dropping bloom-negative grams loses
    *     nothing;
    *  3. bloom-POSITIVE grams (true hits + ~fpp false positives) go
    *     through the exact semi join against the real eval-gram set.
    *     That join now sees a tiny fraction of the corpus, so it can
    *     be an ordinary shuffled semi join — the eval set never needs
    *     to fit in a broadcast hash table.
    */
  def bloomNgramOverlap(docs: DataFrame, isEval: Column, k: Int = 5,
      mBits: Int = 1 << 20, nHashes: Int = 4): DataFrame = {
    require((mBits & (mBits - 1)) == 0, "mBits must be a power of two")
    val sh = docs.select(col("doc_id"), isEval.as("is_eval"),
      explode(Dedup.shingles(col("text"), k)).as("s"))
    val evalGrams = sh.filter(col("is_eval")).select("s").distinct()
    // probe positions for gram fingerprint s: affine family
    // (s*(2j+1) + j*12345) mod p, folded into [0, mBits)
    def pos(s: Column, j: Int): Column =
      pmod((s * lit(2L * j + 1) + lit(j * 12345L)) % lit(TextAnalysis.Mod),
        lit(mBits.toLong))
    // bitmap as one map<word_idx, word> row: eval grams explode to
    // bit positions, OR-fold into 64-bit words, collect to a map
    val words = evalGrams
      .select(explode(array((0 until nHashes).map(j => pos(col("s"), j)): _*))
        .as("p"))
      .select(shiftright(col("p"), 6).as("w"),
        expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").as("bit"))
      .groupBy("w").agg(bit_or(col("bit")).as("bits"))
    val bitmap = words
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("bm"))
    val corpus = sh.filter(!col("is_eval"))
      .crossJoin(broadcast(bitmap))
    val bloomHit = (0 until nHashes).map { j =>
      expr(s"(coalesce(element_at(bm, shiftright(p$j, 6)), cast(0 as bigint))" +
        s" >> cast(p$j % 64 as int)) & 1 = 1")
    }
    val probed = (0 until nHashes)
      .foldLeft(corpus) { (df, j) => df.withColumn(s"p$j", pos(col("s"), j)) }
      .filter(bloomHit.reduce(_ && _))
    // exact confirm: only bloom survivors reach the real eval set
    val hits = probed
      .join(evalGrams, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    manifest(docs, isEval, hits)
  }

  /** The REVERSE report: per EVAL document, how many corpus documents
    * share a k-gram with it and how many of its own grams are
    * compromised — the benchmark-health readout (dc1/dc2 tell you
    * which training docs to drop; this tells you which eval items are
    * already memorizable and should be excluded from scoring, the
    * direction actually published with eval results). Zero-overlap
    * eval docs appear with zeros: the manifest is complete.
    *
    * Scale shape: same gram streams as [[ngramOverlap]] — the eval
    * side's distinct grams broadcast, the corpus probes MAP-SIDE via
    * a left-semi-like inner join that only keeps matching grams, so
    * the 100 TB side still never shuffles in full: only MATCHING
    * (gram, corpus_doc) pairs reach the per-eval-doc aggregation. */
  def evalOverlapReport(docs: DataFrame, isEval: Column,
      k: Int = 5): DataFrame = {
    val sh = docs.select(col("doc_id"), isEval.as("is_eval"),
      explode(Dedup.shingles(col("text"), k)).as("s"))
    val evalSh = sh.filter(col("is_eval"))
      .select(col("doc_id").as("eval_id"), col("s"))
    // corpus grams that hit ANY eval gram, tagged with the corpus doc
    val matches = sh.filter(!col("is_eval"))
      .select(col("doc_id").as("corpus_id"), col("s"))
      .join(broadcast(evalSh), "s")
    val report = matches.groupBy("eval_id")
      .agg(countDistinct(col("corpus_id")).as("n_corpus_docs"),
        countDistinct(col("s")).as("n_shared_grams"))
    docs.filter(isEval).select(col("doc_id").as("eval_id"))
      .join(report, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_corpus_docs"), lit(0L)).as("n_corpus_docs"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("compromised", col("n_corpus_docs") > 0)
  }

  /** FUZZY decontamination (dc4): near-duplicate matching between the
    * corpus and the eval set — the contamination [[ngramOverlap]]'s
    * exact 5-grams miss once a benchmark item has been paraphrased,
    * truncated, or reformatted on its way into the crawl (the GPT-3
    * appendix-C lesson: exact n-gram filters under-count real
    * leakage). Matching is [[Dedup.minhashPairsAgainst]] with the
    * EVAL side as the broadcast batch: same banding/verify math as
    * the dedup family, so "contaminated" here means exactly "would
    * have been a near-dup pair at `pct`% Jaccard".
    *
    * Output: one row per FLAGGED corpus doc — its match count, the
    * best-matching eval item (highest Jaccard ppm, ties to the lower
    * eval id) and that score. Compose with [[ngramOverlap]] for the
    * union of exact and fuzzy hits.
    *
    * Scale shape: the eval side's band keys broadcast; the corpus is
    * probed map-side and only band-collision candidates reach the
    * verify join; the per-doc argmax is a map-side-combinable
    * `max_by`. The 100 TB side never shuffles in full. */
  def fuzzyContamination(docs: DataFrame, isEval: Column, k: Int = 3,
      numHashes: Int = 16, bands: Int = 4, pct: Int = 60): DataFrame = {
    val pairs = Dedup.minhashPairsAgainst(
      docs.filter(isEval), docs.filter(!isEval),
      k = k, numHashes = numHashes, bands = bands, pct = pct)
      .withColumn("score_ppm", expr("common * 1000000 div union_size"))
    pairs.groupBy(col("index_id").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        max_by(col("new_id"),
          struct(col("score_ppm"), -col("new_id"))).as("eval_id"),
        max("score_ppm").as("score_ppm"))
  }

  /** SEMANTIC contamination (dc5): flag every corpus item whose
    * EMBEDDING sits within cosine `threshold` of an eval item — the
    * tier above [[ngramOverlap]] (exact 5-grams) and
    * [[fuzzyContamination]] (near-dup Jaccard): it catches a
    * benchmark item that was fully REWRITTEN but kept its meaning,
    * which no surface-form matcher can. The detector is
    * `Similarity.lshCosinePairsAgainst` with the eval set as the
    * probe side and the corpus as the standing index.
    *
    * Output: one row per FLAGGED corpus vector — match count, the
    * best-matching eval item (highest cosine, ties to the lower
    * eval id) and that score.
    *
    * Scale shape: eval probes are a broadcast-sized frame; the
    * corpus side carries only (id, bucket-key) rows through the
    * guarded bucket join, and full vectors are fetched just for
    * band-collision candidates; the per-doc argmax is a
    * map-side-combinable `max_by`. The 100 TB side never shuffles
    * in full. */
  def semanticContamination(embs: DataFrame, isEval: Column,
      threshold: Double, nBits: Int = 6, tables: Int = 3): DataFrame = {
    val pairs = Similarity.lshCosinePairsAgainst(
      embs.filter(isEval), embs.filter(!isEval),
      threshold = threshold, nBits = nBits, tables = tables)
    pairs.groupBy(col("index_id").as("vec_id"))
      .agg(count(lit(1)).as("n_matches"),
        max_by(col("new_id"),
          struct(col("score"), -col("new_id"))).as("eval_id"),
        max("score").as("score"))
  }

  /** Left-join per-doc hit counts back onto the non-eval corpus so
    * zero-hit documents appear with `n_hits = 0`. */
  private def manifest(docs: DataFrame, isEval: Column,
      hits: DataFrame): DataFrame =
    docs.filter(!isEval).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
}
