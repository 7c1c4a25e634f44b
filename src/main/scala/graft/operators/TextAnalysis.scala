package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for LLM training-data pipelines (north-star
  * scope, SURVEY.md §2.3): tokenization stats, quality scoring,
  * language ID, and document fingerprinting.
  *
  * Everything here is built from codegen'd `functions._` higher-order
  * functions — per-row, no shuffle, no UDF — so at 100 TB each
  * operator is a single embarrassingly-parallel scan that whole-stage
  * codegen fuses with the parquet read. All arithmetic is
  * integer-exact (polynomial hashes mod 1e9+7) or IEEE-deterministic
  * (fixed fold order), which is what makes the DuckDB oracle
  * comparisons bit-exact.
  */
object TextAnalysis {
  val Mod = 1000000007L

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= "")

  /** The letter-RUN character classes of the script tier — one class
    * per alphabetic script family, each written as explicit literal
    * char ranges (class subtraction / `\p{...}` properties are NOT
    * portable between java.util.regex and DuckDB's RE2; literal
    * ranges are). After `lower()`:
    *
    *   - `a-z`     Latin
    *   - `а-ӿ`     Cyrillic U+0430–U+04FF (all lowercase incl. ё and
    *               the Ukrainian/Serbian/extended letters; the
    *               uppercase halves of the historic U+0460+ pairs are
    *               unreachable post-lower and harmless)
    *   - `ΐ-ώ`     Greek U+0390–U+03CE (every lowercase letter incl.
    *               accents, diaeresis and final sigma ς)
    *   - `א-ת`     Hebrew U+05D0–U+05EA (letters incl. final forms)
    *   - `ء-ٟ` + `ٮ-ۿ`  Arabic U+0621–U+065F (letters + harakat so
    *               vocalized words stay whole) and U+066E–U+06FF
    *               (Persian/Urdu extensions); the Arabic-Indic digit
    *               and punctuation stripe U+0660–U+066D delimits
    *   - `ऀ-ॣ` + `ॱ-ॿ`  Devanagari U+0900–U+0963 (consonants,
    *               matras, virama — combining marks must stay IN the
    *               run or every conjunct shatters) and U+0971–U+097F;
    *               danda punctuation + digits U+0964–U+0970 delimit
    */
  val ScriptLetterRuns: Seq[String] =
    Seq("a-z", "а-ӿ", "ΐ-ώ", "א-ת", "ء-ٟٮ-ۿ", "ऀ-ॣॱ-ॿ")

  /** The codepoint-class segmentation the mixed-script tier uses:
    * letter RUNS for every alphabetic script ([[ScriptLetterRuns]] —
    * Latin, Cyrillic, Greek, Hebrew, Arabic, Devanagari), digit RUNS,
    * and one token PER CODEPOINT for the no-whitespace scripts (CJK
    * Unified incl. Extension A, hiragana, katakana, hangul syllables,
    * Thai — the ranges are literal characters so the same pattern is
    * valid in both java.util.regex and DuckDB's RE2). Everything else
    * (punctuation, whitespace, symbols) is a delimiter. */
  val ScriptTokenPattern: String =
    ScriptLetterRuns.map(r => s"[$r]+").mkString("|") +
      "|[0-9]+|[一-鿿㐀-䶿぀-ゟ゠-ヿ가-힣ก-๛]"

  /** Anchored word gate for the tokenizer TRAINERS in script-tier
    * mode: a trainable word is one letter run of ONE alphabetic
    * script (digit runs and single CJK/Thai codepoints are not
    * vocabulary — CJK enters char-grain via the encode fallback).
    * Replaces the Latin-only `^[a-z]+$` gate that made alphabetic
    * non-Latin corpora train EMPTY vocabularies. `(?:…)` groups are
    * valid in both java.util.regex and RE2. */
  val ScriptWordGate: String =
    "^(?:" + ScriptLetterRuns.map(r => s"[$r]+").mkString("|") + ")$"

  /** Mixed-script tokenization tier: [[tokens]] is a lower-cased
    * whitespace split, which is correct for the Latin-script fixture
    * corpora but tokenizes a CJK/Thai document — scripts that write
    * WITHOUT spaces — to whole-sentence single tokens, and a
    * tokenizer trained on that learns an empty vocabulary (t33's own
    * edge test pins the degrade). This tier segments by codepoint
    * class instead ([[ScriptTokenPattern]]): Latin runs and digit
    * runs behave like words, no-whitespace scripts emit one token per
    * codepoint (the standard character-grain fallback BPE/unigram
    * trainers start from), punctuation delimits. Deterministic, one
    * codegen'd regexp per row (no shuffle, no UDF), and
    * SQL-replayable — the oracle runs the identical pattern through
    * DuckDB's regexp_extract_all.
    *
    * Deliberately a SIBLING of [[tokens]], not a replacement: the
    * whitespace tier keeps punctuation attached ("word," is a token)
    * and every t-family oracle pins that behavior; a multilingual
    * corpus opts into this tier (and can feed its output to the
    * trainers as pre-tokenized arrays). Gated by t41's per-script
    * fertility census. */
  def tokensScript(text: Column): Column =
    regexp_extract_all(lower(text), lit(ScriptTokenPattern), lit(0))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, single digits, and single
    * punctuation marks each count as one token. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Rolling polynomial hash (base 31, mod 1e9+7) over the code
    * points of `s` — the classic Rabin-Karp document fingerprint.
    * Exact integer math → identical in any engine. Backed by the
    * codegen'd [[graft.functions.PolyHash]] expression. */
  def fingerprint(s: Column): Column =
    graft.functions.hashFunctions.poly_hash(s)

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un", "une"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "ni", "ta"))

  /** Count of distinct English stopwords present (quality signal). */
  def stopwordHits(text: Column): Column =
    size(array_intersect(tokens(text),
      array(stopwords("en").map(lit): _*)))

  /** Composite quality score: all terms are exact integer ratios
    * evaluated in a fixed order, so the double result is
    * engine-independent. Higher is better. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val punct = punctCount(text).cast("double")
    val stops = stopwordHits(text).cast("double")
    (stops / nTok) - (punct / nChar) + least(nTok / lit(100.0), lit(1.0))
  }

  /** N-gram-heuristic language ID over the per-language stopword
    * lists; deterministic tie-break on language code. */
  def langId(text: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(tokens(text), array(words.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // max by (hits, then lang desc→ we want lang ASC tie-break, so
    // compare negated lang is awkward; use array_max over (hits,
    // reverse-rank) instead): encode rank so ties pick the
    // alphabetically-first language.
    val ranked = scored.zipWithIndex.map { case (s, i) =>
      struct(s.getField("hits").as("hits"),
        lit(stopwords.size - i).as("rank"),
        s.getField("lang").as("lang"))
    }
    array_max(array(ranked: _*)).getField("lang")
  }

  private val trigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "ing", "and", "ion", "ent", "er ", " th"),
    "es" -> Seq("que", "ión", "ent", "ar ", " de", "la ", "os "),
    "de" -> Seq("der", "ein", "ich", "sch", "und", "en ", " ge"),
    "fr" -> Seq("les", "ent", "ion", "de ", " le", "es ", "une"),
    "zh" -> Seq("shi", "zho", "ong", "ang", "ian", "eng", "uan"))

  /** Character-trigram language ID — the n-gram-profile heuristic
    * (Cavnar-Trenkle style, tiny fixed profiles): score = number of
    * profile trigrams present in the document's trigram set;
    * deterministic tie-break on language code.
    *
    * Backed by the codegen'd [[graft.functions.TrigramLangId]]
    * expression — one JVM substring scan per profile instead of the
    * interpreted per-character HOF chain ([[langIdTrigramHof]], kept
    * as the semantics twin the equivalence spec checks against). */
  def langIdTrigram(text: Column): Column =
    graft.functions.hashFunctions.trigram_lang_id(text)

  /** Reference HOF formulation of [[langIdTrigram]] — builds the
    * document's distinct-trigram set with higher-order functions and
    * intersects it with each profile. Interpreted per element, so it
    * is ~1000× slower than the native expression; retained only as
    * the executable spec the oracle SQL and the native expression are
    * both checked against. */
  def langIdTrigramHof(text: Column): Column = {
    val chars = filter(split(lower(text), ""), c => c =!= "")
    val grams = array_distinct(transform(
      sequence(lit(1), greatest(size(chars) - 2, lit(1))),
      i => array_join(slice(chars, i, lit(3)), "")))
    val ranked = trigramProfiles.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, profile), idx) =>
        struct(
          size(array_intersect(grams, array(profile.map(lit): _*))).as("hits"),
          lit(trigramProfiles.size - idx).as("rank"),
          lit(lang).as("lang"))
    }
    array_max(array(ranked: _*)).getField("lang")
  }

  /** TF-IDF with an integer-exact IDF surrogate
    * (`(N+1)*1000 div (df+1)` instead of a log — monotone in df, so
    * rankings match, and reproducible in any engine; swap in
    * `ln((N+1)/(df+1))+1` when cross-engine bit-parity isn't needed).
    * Returns one row per document: its highest-scoring term
    * (ties → lexicographically first term).
    *
    * Scale shape: one explode + two aggregations, all map-side
    * combinable; document frequency is a broadcast-sized side (vocab,
    * not corpus). The corpus count enters as a broadcast 1-row frame,
    * so the whole operator stays one lazy plan — no eager
    * `docs.count()` action scanning the corpus a second time at
    * call time. */
  def topTfidfTerm(docs: DataFrame): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val terms = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_x1000", expr("((n_docs + 1) * 1000) div (df + 1)"))
      .withColumn("score", col("tf") * col("idf_x1000"))
      .drop("n_docs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"),
        col("tf"), col("df"), col("score"))
  }

  /** Per-document repetition signals (Gopher-style quality filters:
    * Rae et al. 2021 §A1.1 use top-n-gram fraction and
    * duplicate-n-gram fraction to drop boilerplate/spam documents):
    *
    *  - `top_bigram_frac` — fraction of all word bigrams taken by the
    *    single most frequent bigram;
    *  - `dup_trigram_frac` — fraction of trigram OCCURRENCES whose
    *    trigram appears more than once in the document.
    *
    * Scale shape: ONE corpus scan — per-row native gram fingerprints
    * ([[graft.functions.GramFps]] — multiplicity-preserving, unlike
    * the dedup path's distinct shingles) for both gram sizes, tagged
    * with k and exploded together; then `groupBy(doc_id, k, gram)
    * .count` with map-side partial aggregation and a conditional
    * per-doc rollup (no bigram⋈trigram join, no second scan). The
    * shuffle carries (id, k, fp, count), never text. Counts are
    * integers and each fraction is one double division, so the DuckDB
    * oracle matches bit-for-bit. */
  /** Winnowing fingerprint selection (the MOSS scheme): over the
    * document's word-k-gram rolling hashes, slide a window of `w`
    * consecutive grams and keep each window's MINIMUM hash; the
    * per-doc fingerprint is the distinct set of selected minima.
    * Guarantee: every run of `w` consecutive grams contributes at
    * least one selected hash, so any shared substring of ≥ w+k-1
    * words between two documents shares a fingerprint — the
    * position-robust containment/overlap detector (plagiarism-style
    * partial overlap) that whole-set Jaccard and MinHash miss.
    * Density is ~2/(w+1) of the gram stream (the standard winnowing
    * expectation), i.e. a 5× cheaper index than the full gram set at
    * w=4. Documents with fewer than `w` grams keep the minimum of
    * what is there (one window over the whole document).
    *
    * Scale shape: per-row gram expansion (codegen'd `GramFps`), ONE
    * shuffle on doc_id for the ordered window pass (a document's
    * grams land in one task — documents are KBs), then the per-doc
    * distinct-and-sort; the shuffle carries (doc_id, pos, hash)
    * longs, never text. Output serializes the fingerprint list to
    * CSV so the result is hash-comparable across engines. */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    winnowFingerprintSets(docs, k, w)
      .select(col("doc_id"), col("n_fp"),
        array_join(transform(col("fps"), _.cast("string")), ",").as("fp_csv"))

  /** [[winnowFingerprints]] with the selected set kept as a sorted
    * array `(doc_id, fps, n_fp)` — the join-ready form
    * [[Dedup.winnowContainmentPairs]] consumes (which checkpoints it
    * before its multi-scan pair stage; single-consumer uses like t10
    * keep the plain lazy plan). */
  def winnowFingerprintSets(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = docs.select(col("doc_id"),
      posexplode(graft.functions.hashFunctions.gram_fps(col("text"), k))
        .as(Seq("pos", "h")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    val whole = Window.partitionBy("doc_id")
    g.withColumn("mn", min("h").over(win))
      .withColumn("n_g", count(lit(1)).over(whole))
      // keep only COMPLETE windows (each window's min sits at its last
      // position); a doc shorter than w keeps its single last-position
      // window = the min over the whole doc
      .filter(col("pos") >= least(lit(w - 1), col("n_g") - 1))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("mn"))).as("fps"))
      .select(col("doc_id"), col("fps"), size(col("fps")).as("n_fp"))
  }

  /** Feature-hashed bag-of-words vector per document (`dim` buckets,
    * token counts) — the fastText-style featurizer behind cheap
    * quality/domain classifiers. Native codegen'd expression (one
    * tokenize+hash loop per doc — a per-bucket HOF filter chain would
    * re-scan the token list `dim` times, the t07 mistake); per-row,
    * shuffle-free. Serialized to CSV for the cross-engine gate. */
  def hashedBow(docs: DataFrame, dim: Int = 32): DataFrame =
    docs.select(col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      array_join(transform(
        graft.functions.hashFunctions.hashed_bow(col("text"), dim),
        _.cast("string")), ",").as("bow_csv"))

  /** WHERE the repetition lives: maximal runs of word-`k`-gram
    * positions whose gram occurs MORE THAN ONCE within the same
    * document — the intra-document twin of `Dedup.duplicateSpans`
    * (which is cross-document), and the localizer for
    * [[repetitionScores]]' aggregate fractions: t08 tells you a doc
    * is 40% repeated trigrams, this tells you which token ranges to
    * cut or truncate (looping generation, boilerplate chrome, spam
    * keyword stuffing).
    *
    * Scale shape: per-row gram expansion, then EVERYTHING is
    * partitioned by doc_id — the within-doc multiplicity count and
    * the islands window run in the same doc-keyed exchange (one
    * shuffle of (doc_id, pos, h) longs, AQE reuses the partitioning;
    * no corpus-global aggregation at all, unlike dd16's gram-df).
    *
    * Output: `(doc_id, start_pos, end_pos, n_grams, n_tokens)` per
    * maximal repeated-gram run. */
  def repetitionSpans(docs: DataFrame, k: Int = 3,
      minGrams: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = docs.select(col("doc_id"),
      posexplode(graft.functions.hashFunctions.gram_fps(col("text"), k))
        .as(Seq("pos", "h")))
    val perDoc = Window.partitionBy("doc_id", "h")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    g.withColumn("occ", count(lit(1)).over(perDoc))
      .filter(col("occ") >= 2)
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("start_pos"), max("pos").as("end_pos"),
        count(lit(1)).as("n_grams"))
      .filter(col("n_grams") >= minGrams)
      .select(col("doc_id"), col("start_pos"), col("end_pos"),
        col("n_grams"), (col("end_pos") - col("start_pos") + k).as("n_tokens"))
  }

  /** fastText-style linear classifier INFERENCE over the hashed
    * bag-of-words features ([[hashedBow]]'s featurizer): margin =
    * Σ_bucket count·weight + bias, integer-exact (long weights ×
    * long counts — no float dot, so the cross-engine gate compares
    * margins bit-for-bit; a float model would quantize to fixed
    * point the same way).
    *
    * `weights` is the trained model: a `(bucket, weight)` frame, dim
    * rows. It is packed into ONE array row ordered by bucket and
    * broadcast — the corpus pass is a per-row `zip_with`/`aggregate`
    * fold against that constant, ZERO corpus shuffle (the ve3
    * packed-centroid shape): one scan of 100 TB, scoring inline.
    *
    * Output: `(doc_id, n_tokens, margin, label)` with label =
    * keep/drop by margin sign. */
  def classifierScore(docs: DataFrame, weights: DataFrame,
      dim: Int = 32, bias: Long = 0L): DataFrame = {
    // a bucket −1 row (the [[classifierTrain]] bias lane) folds into
    // the margin alongside the literal `bias` param — absent, it
    // contributes 0, so synthetic weight tables score as before
    val packed = weights
      .select(col("bucket").cast("int").as("bucket"),
        col("weight").cast("long").as("weight"))
      .agg(transform(array_sort(collect_list(
          when(col("bucket") >= 0,
            struct(col("bucket"), col("weight"))))),
          x => x.getField("weight")).as("w"),
        coalesce(sum(when(col("bucket") === -1, col("weight"))), lit(0L))
          .as("wb"))
    docs.select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
        graft.functions.hashFunctions.hashed_bow(col("text"), dim).as("bow"))
      .crossJoin(broadcast(packed))
      .select(col("doc_id"), col("n_tokens"),
        (aggregate(zip_with(col("bow"), col("w"),
          (c, wt) => c.cast("long") * wt), lit(0L), _ + _)
          + col("wb") + lit(bias))
          .as("margin"))
      .withColumn("label",
        when(col("margin") >= 0, "keep").otherwise("drop"))
  }

  /** Distributed linear classifier TRAINING over the [[hashedBow]]
    * features (t30) — full-batch perceptron in EXACT integers, the
    * trainer that makes [[classifierScore]]'s weight table a TRAINED
    * artifact instead of a synthetic stand-in.
    *
    * Why perceptron and not logistic: the logistic gradient needs
    * `exp`, which is not cross-engine bit-exact (the t09/t22 ban on
    * transcendental intermediates); the batch perceptron update
    * `w += Σ_misclassified y·x`, `b += Σ y` is pure integer
    * arithmetic over integer count features, so the whole
    * TRAJECTORY — every round's weight vector — replays bit-for-bit
    * in the DuckDB oracle as an unrolled CTE chain (the ve3/t18
    * fixed-point discipline), and full-batch (not per-row SGD) makes
    * it partition-order-free.
    *
    * Why POCKET: the η=1 full-batch update famously oscillates (a
    * period-2 cycle between over- and under-shooting the separator —
    * measured on the fixture: mis 150↔350 forever), so the trainer
    * keeps the weight vector with the FEWEST misclassifications seen
    * across all rounds (ties → earliest round) — Gallant's pocket
    * algorithm, a pure integer argmin the oracle replays exactly. On
    * separable data some round hits the separator and the pocket
    * keeps it (pinned in GuardrailsSpec: 0 errors on a planted-token
    * fixture by round 5).
    *
    * Scale shape per round: the featurized corpus (ONE tokenize+hash
    * scan, checkpoint-shared across all rounds) is scored per-row
    * against the round's weight vector folded in as a codegen
    * LITERAL (zero corpus shuffle — the ve3 packed-constant shape);
    * the misclassified gradient partial-aggregates map-side into
    * ≤ dim+1 rows (bucket keys plus a constant-1 bias bucket whose
    * row count doubles as the pocket's misclassification census), so
    * each round is exactly ONE job whose exchange carries dim+1 rows
    * per partition. Weights are 8·dim bytes of driver state (the BPE
    * merge-rules discipline) — rounds+1 corpus passes total, the
    * q58/ve3 fixed-point-iteration budget.
    *
    * `docs` must carry `doc_id`, `text` and an integer label `y`
    * ∈ {+1, −1}. Output: the trained `(bucket, weight)` table —
    * `dim` rows plus the bias as bucket −1 — ready for
    * [[classifierScore]]. */
  def classifierTrain(docs: DataFrame, dim: Int = 32,
      rounds: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val feats = docs.select(col("doc_id"), col("y").cast("long").as("y"),
        graft.functions.hashFunctions.hashed_bow(col("text"), dim)
          .as("bow"))
      .localCheckpoint(eager = false) // ONE featurize, every round reads it
    // one corpus pass per round, ONE job: margins under the literal
    // weight vector (codegen folds it into the scan), the
    // misclassified filter, then a single map-side-combinable
    // aggregation over dim+1 keys — buckets 0..dim−1 carry the
    // weight gradient Σ y·c, the appended constant-1 "bias bucket"
    // carries both the bias gradient Σ y and (via its row count) the
    // pocket's misclassification count. The ≤ dim+1 result rows come
    // back to the driver; the weights themselves are 8·dim bytes of
    // driver state, like the BPE merge rules.
    def roundPass(w: Array[Long], b: Long): (Long, Array[Long], Long) = {
      val wLit = array(w.map(lit(_)): _*)
      val rows = feats
        .withColumn("margin",
          aggregate(zip_with(col("bow"), wLit,
            (c, wt) => c.cast("long") * wt), lit(0L), _ + _) + lit(b))
        .filter(col("y") * col("margin") <= 0)
        .select(col("y"),
          posexplode(concat(col("bow"), array(lit(1L))))
            .as(Seq("bucket", "c")))
        .groupBy("bucket")
        .agg(sum(col("y") * col("c")).as("g"), count(lit(1)).as("n"))
        .collect()
      val g = Array.fill(dim)(0L)
      var gb = 0L
      var nMis = 0L
      rows.foreach { r =>
        val bkt = r.getInt(0)
        if (bkt == dim) { gb = r.getLong(1); nMis = r.getLong(2) }
        else g(bkt) = r.getLong(1)
      }
      (nMis, g, gb)
    }
    var w = Array.fill(dim)(0L)
    var b = 0L
    var pocketW = w
    var pocketB = b
    var pocketMis = Long.MaxValue
    for (_ <- 1 to rounds) {
      val (nMis, g, gb) = roundPass(w, b)
      // the pocket argmin: strictly-fewer wins, ties keep the EARLIER
      // round — a deterministic integer criterion the oracle replays
      if (nMis < pocketMis) { pocketMis = nMis; pocketW = w; pocketB = b }
      w = w.zip(g).map { case (a, x) => a + x }
      b = b + gb
    }
    // the post-update weights are the last pocket candidate
    if (roundPass(w, b)._1 < pocketMis) { pocketW = w; pocketB = b }
    import spark.implicits._
    (pocketW.toSeq.zipWithIndex.map { case (wt, i) => (i, wt) } :+
      ((-1, pocketB)))
      .toDF("bucket", "weight")
      .select(col("bucket").cast("int").as("bucket"), col("weight"))
  }

  /** Classifier calibration sweep (t31) — choosing [[classifierScore]]'s
    * keep/drop threshold is a MEASURED decision, not a default: sweep
    * `gridN+1` evenly spaced integer thresholds across the corpus's
    * observed margin range and report the confusion counts plus
    * precision / recall / F1 (exact ppm surrogates, zero-guarded) at
    * each — the report a data-quality pipeline reads before wiring a
    * trained filter in front of 100 TB (pick the threshold whose
    * precision clears the bar, read off the recall you paid).
    *
    * Scale shape: margins come from the [[classifierScore]] pass
    * (one corpus scan, weights broadcast); the scored frame is
    * checkpoint-shared between the 1-row min/max bounds aggregate
    * and the sweep; the sweep explodes each row into `gridN+1`
    * (threshold, outcome) pairs that partial-aggregate map-side into
    * gridN+1 keys — no sort, no global window, no driver loop (a
    * distinct-margin ROC would order the whole corpus through one
    * reducer; the fixed grid is the scale-safe report).
    *
    * `docs` must carry the ±1 label `y` (the [[classifierTrain]]
    * contract). Output: `(i, thr, tp, fp, fn, tn, precision_ppm,
    * recall_ppm, f1_ppm)`, one row per grid point, `i` ascending. */
  def classifierCalibration(docs: DataFrame, weights: DataFrame,
      dim: Int = 32, gridN: Int = 20): DataFrame = {
    val scored = classifierScore(docs, weights, dim)
      .join(docs.select(col("doc_id"), col("y").cast("long").as("y")),
        "doc_id")
      .select("y", "margin")
      .localCheckpoint(eager = false) // bounds agg + sweep share it
    val bounds = scored.agg(min("margin").as("mn"), max("margin").as("mx"))
    scored.crossJoin(broadcast(bounds))
      .select(col("y"), col("margin"), col("mn"), col("mx"),
        explode(sequence(lit(0L), lit(gridN.toLong))).as("i"))
      // grid arithmetic rides the decimal(38,0) lane: with extreme
      // trained weights the Long product i * (mx - mn) could overflow
      // before the div; decimal matches the oracle's HUGEINT headroom
      .withColumn("thr",
        expr(s"mn + CAST(i * CAST(mx - mn AS DECIMAL(38,0)) " +
          s"div $gridN AS BIGINT)"))
      .groupBy("i", "thr")
      .agg(
        sum(when(col("y") === 1 && col("margin") >= col("thr"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("y") =!= 1 && col("margin") >= col("thr"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("y") === 1 && col("margin") < col("thr"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("y") =!= 1 && col("margin") < col("thr"), 1L)
          .otherwise(0L)).as("tn"))
      .select(col("i"), col("thr"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0L " +
          "ELSE tp * 1000000 div (tp + fp) END").as("precision_ppm"),
        expr("CASE WHEN tp + fn = 0 THEN 0L " +
          "ELSE tp * 1000000 div (tp + fn) END").as("recall_ppm"))
      .withColumn("f1_ppm",
        expr("CASE WHEN precision_ppm + recall_ppm = 0 THEN 0L " +
          "ELSE 2 * precision_ppm * recall_ppm div " +
          "(precision_ppm + recall_ppm) END"))
  }

  /** PII regexes — the common Java-regex/RE2 subset (both engines
    * compile these identically): RFC-loose emails, dotted-quad IPv4,
    * and NANP-style 3-4 digit phone fragments. Kept deliberately
    * simple-and-portable; a production scrubber would widen the
    * pattern set, not the machinery. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Redact PII in `text`: emails, then IPv4 addresses, then phone
    * fragments (fixed order — redaction output feeds the next
    * pattern, so order is part of the contract). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document PII report over a text column: match counts per
    * pattern (on the unredacted text, each pattern independent) plus
    * the fingerprint and length of the redacted text — the audit
    * record a scrub job emits alongside the cleaned corpus. Per-row,
    * shuffle-free, codegen'd regex ops: ONE corpus scan at 100 TB. */
  def piiReport(docs: DataFrame, text: Column): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(text, lit(EmailRe)).as("n_emails"),
      regexp_count(text, lit(Ipv4Re)).as("n_ipv4"),
      regexp_count(text, lit(PhoneRe)).as("n_phones"),
      fingerprint(redactPii(text)).as("redacted_fp"),
      length(redactPii(text)).as("redacted_len"))

  /** Encoding-hygiene rollup (t17): per source, how many documents
    * carry control characters, how many control / U+FFFD replacement
    * characters in total, and the per-mille non-ASCII share — the
    * standard mojibake / binary-spill / double-decode triage a crawl
    * curation pass runs before any language work (a page that decoded
    * wrong is unusable however fluent its n-grams look).
    *
    * The test corpus is deliberately clean ASCII, so the probe chars
    * are INJECTED by a closed-form doc_id rule (the m4/m6 fixture
    * pattern): every doc_id ≡ 0 mod 7 gains two C0 controls, mod 5 a
    * replacement char, mod 3 two accented letters — both engines
    * apply the same rule, so the counts are exact and nonzero.
    *
    * Scale shape: per-row codegen'd regex counting folded map-side
    * into one tiny (source, counters) aggregation — ONE corpus scan,
    * the exchange carries a handful of longs per source. */
  def encodingReport(docs: DataFrame): DataFrame = {
    val seeded = docs.withColumn("t", concat(
      when(col("doc_id") % 7 === 0, lit("\u0001\u0002")).otherwise(lit("")),
      col("text"),
      when(col("doc_id") % 5 === 0, lit("\uFFFD")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, lit("\u00e9\u00ed")).otherwise(lit(""))))
    val t = col("t")
    def removed(pat: String): Column =
      length(t) - length(regexp_replace(t, pat, ""))
    val ctlClass = "[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]"
    seeded.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(t.rlike(ctlClass), 1L).otherwise(0L)).as("ctl_docs"),
      sum(removed(ctlClass)).as("ctl_chars"),
      sum(removed("\uFFFD")).as("fffd_chars"),
      // the regex stays a Column-level (Java) pattern: routed through
      // a SQL literal, '\x00' would be eaten by the SQL string parser
      sum(removed("[^\\x00-\\x7F]")).as("__na"),
      sum(length(t)).as("__len"))
      .withColumn("nonascii_pm", expr("(__na * 1000) div __len"))
      .drop("__na", "__len")
  }

  def repetitionScores(docs: DataFrame): DataFrame = {
    def tag(k: Int): Column = transform(
      graft.functions.hashFunctions.gram_fps(col("text"), k),
      g => struct(lit(k).as("k"), g.as("g")))
    val k = col("kg.k"); val n = col("n")
    docs.select(col("doc_id"), explode(concat(tag(2), tag(3))).as("kg"))
      .groupBy(col("doc_id"), col("kg")).agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(
        sum(when(k === 2, n).otherwise(0L)).as("bg_total"),
        max(when(k === 2, n).otherwise(0L)).as("bg_top"),
        sum(when(k === 3, n).otherwise(0L)).as("tg_total"),
        sum(when(k === 3 && n > 1, n).otherwise(0L)).as("tg_dup"))
      .select(col("doc_id"),
        col("bg_total").as("n_bigrams"),
        col("bg_top").as("top_bigram_n"),
        (col("bg_top").cast("double") / col("bg_total").cast("double"))
          .as("top_bigram_frac"),
        (col("tg_dup").cast("double") / col("tg_total").cast("double"))
          .as("dup_trigram_frac"))
  }

  /** Full per-document stats frame. */
  def analyze(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("lang"),
      tokenCount(col("text")).as("n_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"),
      punctCount(col("text")).as("n_punct"),
      stopwordHits(col("text")).as("n_stopwords"),
      qualityScore(col("text")).as("quality"),
      langId(col("text")).as("lang_pred"),
      fingerprint(col("text")).as("fingerprint"))
}
