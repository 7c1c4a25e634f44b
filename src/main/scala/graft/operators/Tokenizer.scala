package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer training primitives — the step every LLM data pipeline
  * runs once per corpus snapshot before token counting ([[TextAnalysis]])
  * and sequence packing ([[Packing]]) mean anything: the merge rules
  * themselves have to come from somewhere.
  *
  * [[bpeTrain]] is byte-pair-encoding merge learning (Sennrich et al.
  * 2016, the algorithm behind GPT-2/RoBERTa-style vocabularies) in the
  * classic word-frequency formulation every production trainer
  * (HuggingFace `tokenizers`, SentencePiece BPE mode) uses: the corpus
  * is scanned ONCE to build a word-frequency table, and all merge
  * iterations run over that vocabulary-sized table — at 100 TB the
  * petabyte never participates in the loop, only the few-hundred-MB
  * vocabulary does.
  */
object Tokenizer {

  /** Learn `merges` BPE merge rules from the corpus.
    *
    * Algorithm (per round, over the word-frequency vocabulary):
    *  1. count adjacent symbol pairs, weighted by word frequency
    *     (overlapping positions counted, the classic statistic);
    *  2. pick the most frequent pair — ties broken by pair text
    *     ascending, so the choice is total-ordered and reproducible;
    *  3. rewrite every word's symbol string, merging each
    *     left-to-right non-overlapping occurrence of the pair (the
    *     greedy application real BPE tokenizers use).
    *
    * Symbol strings are space-separated; the rewrite expands
    * separators to double spaces before substring replacement so that
    * (a) a multi-character symbol can never match across a symbol
    * boundary and (b) adjacent occurrences sharing one separator
    * (`l l l l` under merge `l l`) each merge, exactly as a
    * symbol-array scan would — both engines' `replace` scan
    * left-to-right over the same expansion, so the trajectory is
    * SQL-oracle-replayable (the [[Graph.pageRank]] contract).
    *
    * Scale shape: the corpus contributes ONE scan (tokenize → word
    * hash-agg, map-side combinable). Every round after that touches
    * only the vocabulary frame: one explode to (pair, freq) rows
    * (bounded by Σ word lengths over DISTINCT words), one
    * partial-agg'd pair count, a 1-row argmax consumed via
    * `crossJoin(broadcast(...))` — the winning pair never lands on
    * the driver — and a map-side rewrite. Vocabulary state is
    * `localCheckpoint`ed per round so lineage stays one round deep.
    *
    * Words are restricted to `[a-z]+` after lower-casing (length
    * `2..maxWordLen`): tokenizer training normalizes its alphabet
    * anyway, and the restriction keeps the per-word pair fan-out
    * bounded.
    *
    * Output: one row per learned merge —
    * `(rnd, pair, merged, cnt)`, `rnd` 1-based in learning order.
    * May hold FEWER than `merges` rows: training stops early once the
    * vocabulary is exhausted (every word a single symbol, no pair
    * left to merge) instead of burning the remaining rounds as
    * silent no-ops; a corpus with no mergeable pair at all yields
    * the empty frame.
    */
  def bpeTrain(docs: DataFrame, merges: Int = 8,
      maxWordLen: Int = 20): DataFrame = {
    require(merges >= 1, "at least one merge round")
    val words = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") &&
        length(col("w")).between(2, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // initial symbols: one character each, space-separated
    var vocab = words
      .select(col("freq"),
        trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sym"))
      .localCheckpoint(eager = false)
    var out: DataFrame = null
    var r = 1
    var exhausted = false
    // EARLY STOP: when every word has collapsed to a single symbol
    // the pair table is empty and no further merge exists — the
    // output then has fewer than `merges` rows BY DESIGN (a tiny or
    // single-word corpus trains a short merge list; without the stop,
    // the empty argmax's crossJoin would silently empty the
    // vocabulary and burn the remaining rounds as no-ops)
    while (r <= merges && !exhausted) {
      val toks = split(col("sym"), " ")
      val pairs = vocab
        .select(col("freq"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .select(lit(r).as("rnd"), col("pair"),
          replace(col("pair"), lit(" "), lit("")).as("merged"), col("cnt"))
        .localCheckpoint(eager = false) // output union + vocab rewrite
      exhausted = best.isEmpty
      // an alphabet-free corpus exhausts on round 1: the result is
      // the empty (rnd, pair, merged, cnt) frame, not an error
      if (out == null) out = best.limit(if (exhausted) 0 else 1)
      else if (!exhausted) out = out.union(best)
      if (!exhausted) {
      // double-space expansion → bounded substring replace → collapse
      val expanded = concat(lit(" "),
        replace(col("sym"), lit(" "), lit("  ")), lit(" "))
      val target = concat(lit(" "),
        replace(col("_p"), lit(" "), lit("  ")), lit(" "))
      vocab = vocab
        .crossJoin(broadcast(best.select(
          col("pair").as("_p"), col("merged").as("_m"))))
        .select(col("freq"),
          trim(regexp_replace(
            replace(expanded, target, concat(lit(" "), col("_m"), lit(" "))),
            " +", " ")).as("sym"))
        .localCheckpoint(eager = false)
      }
      r += 1
    }
    out.orderBy("rnd")
  }

  /** Apply learned BPE merges to the corpus (t23) — the INFERENCE
    * half of [[bpeTrain]], and the step that turns "BPE-ish token
    * count" estimates ([[TextAnalysis.bpeTokenCount]]) into REAL
    * tokenizer-true counts for packing/budgeting: each whitespace
    * token char-splits into symbols ([a-z]+ words only — anything
    * else passes through as ONE opaque symbol, the unknown-token
    * convention), then every merge applies IN TRAINING ORDER with
    * the trainer's own greedy left-to-right non-overlapping rewrite
    * (the same double-space expansion, so both engines' `replace`
    * walk the same string).
    *
    * The merge list is the MODEL: a few-hundred-row driver-side
    * artifact baked into a tight per-partition JVM loop — tokens come
    * from the same Spark `tokens` column as every text operator, then
    * each word's symbol ARRAY folds through the merges with the
    * greedy left-to-right non-overlapping scan (BY CONSTRUCTION equal
    * to the trainer's double-space string rewrite — that trick exists
    * precisely to mimic this array scan in pure SQL, so the DuckDB
    * twin keeps replaying the string form while the engine runs the
    * array form; the oracle gate pins the equality). One pure map
    * over the corpus — no join, no shuffle; at 100 TB the encode is
    * scan-bandwidth-bound. Rows report the per-doc rollup
    * (`n_words`, true `n_tokens`, and the polynomial fingerprint of
    * the full encoded symbol stream — any divergence in any symbol
    * of any word moves the hash).
    *
    * Output: `(doc_id, n_words, n_tokens, enc_fp)`. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules: Array[(String, String, String)] = merges.map {
      case (pair, merged) =>
        val i = pair.indexOf(' ')
        require(i > 0, s"merge pair '$pair' is not two symbols")
        (pair.substring(0, i), pair.substring(i + 1), merged)
    }.toArray
    // `tok.matches("^[a-z]+$")` would compile the pattern once PER
    // TOKEN; the check is a plain char scan — nonempty and all [a-z]
    def isLowerAlpha(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < 'a' || c > 'z') return false
        i += 1
      }
      s.length > 0
    }
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        var nTokens = 0L
        val sb = new StringBuilder
        toks.foreach { tok =>
          var cur: Array[String] =
            if (isLowerAlpha(tok)) tok.toCharArray.map(_.toString)
            else Array(tok)
          var r = 0
          while (r < rules.length) {
            val (a, b, m) = rules(r)
            if (cur.length >= 2) {
              val out = new scala.collection.mutable.ArrayBuffer[String](
                cur.length)
              var i = 0
              while (i < cur.length) {
                if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) {
                  out += m
                  i += 2
                } else {
                  out += cur(i)
                  i += 1
                }
              }
              cur = out.toArray
            }
            r += 1
          }
          nTokens += cur.length
          var j = 0
          while (j < cur.length) {
            if (sb.nonEmpty) sb.append(' ')
            sb.append(cur(j))
            j += 1
          }
        }
        (id, toks.length.toLong, nTokens,
          graft.functions.HashOps.polyHash(
            org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)))
      }
      .toDF("doc_id", "n_words", "n_tokens", "enc_fp")
  }
}
