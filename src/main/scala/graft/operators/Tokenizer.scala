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
    * bounded. `scriptTier = true` lifts that Latin-only gate (which
    * trained an EMPTY vocabulary on Cyrillic/Greek/Arabic/Hebrew/
    * Devanagari corpora): words then come from
    * [[TextAnalysis.tokensScript]] and the gate is
    * [[TextAnalysis.ScriptWordGate]] — any single-script letter run
    * trains; the merge machinery downstream is script-agnostic
    * (char splits and pair rewrites operate per codepoint in BOTH
    * engines). Gated by the t42 oracle over a transliterated
    * multi-script fixture.
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
      maxWordLen: Int = 20, scriptTier: Boolean = false): DataFrame = {
    require(merges >= 1, "at least one merge round")
    val (tokCol, gate) =
      if (scriptTier)
        (TextAnalysis.tokensScript(col("text")),
          TextAnalysis.ScriptWordGate)
      else
        (filter(split(trim(lower(col("text"))), "\\s+"), t => t =!= ""),
          "^[a-z]+$")
    val words = docs
      .select(explode(tokCol).as("w"))
      .filter(col("w").rlike(gate) &&
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
    * Output: `(doc_id, n_words, n_tokens, enc_fp)`.
    *
    * `scriptTier = true` mirrors [[bpeTrain]]'s multilingual mode:
    * tokens come from [[TextAnalysis.tokensScript]] and any
    * single-script letter run ([[TextAnalysis.ScriptWordGate]],
    * compiled ONCE per executor task) char-splits — so merges trained
    * on a Cyrillic/Arabic/… corpus actually apply to it instead of
    * passing every non-Latin word through as one opaque symbol. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      scriptTier: Boolean = false): DataFrame = {
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
    // script tier: the gate regex is compiled once here and the
    // Pattern (Serializable) ships in the task closure — still no
    // per-token compilation
    val scriptGate: java.util.regex.Pattern =
      if (scriptTier)
        java.util.regex.Pattern.compile(TextAnalysis.ScriptWordGate)
      else null
    val tokCol =
      if (scriptTier) TextAnalysis.tokensScript(col("text"))
      else TextAnalysis.tokens(col("text"))
    docs
      .select(col("doc_id"), tokCol.as("t"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        var nTokens = 0L
        val sb = new StringBuilder
        toks.foreach { tok =>
          val splittable =
            if (scriptGate ne null) scriptGate.matcher(tok).matches()
            else isLowerAlpha(tok)
          var cur: Array[String] =
            if (splittable) tok.toCharArray.map(_.toString)
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

  /** Unigram-LM (SentencePiece-style) tokenizer trainer (t33) —
    * Viterbi-EM ("hard EM", the Kudo 2018 trainer's E-step collapsed
    * to the best segmentation) over a substring candidate vocabulary,
    * under a LOG-FREE integer objective so the whole trajectory
    * replays bit-for-bit in the SQL oracle (the t14/t30 discipline:
    * real unigram likelihoods are products of floats — not
    * cross-engine exact; this surrogate is):
    *
    *  - candidate vocabulary: every substring (length ≤ `maxPiece`)
    *    of every distinct word, counted over ALL positions weighted
    *    by word frequency; candidates below `minCount` prune upfront,
    *    single characters always survive (coverage guarantee);
    *  - E-step (per round): each distinct word takes its optimal
    *    segmentation under the TOTAL ORDER (fewest pieces, then
    *    highest summed piece count, then segmentation string
    *    ascending) — a per-word linear DP; the order has optimal
    *    substructure (piece count and score are additive; candidates
    *    sharing a first piece compare by their suffixes), so the DP
    *    argmin equals the argmin over ALL segmentations, which is
    *    exactly what the oracle's recursive enumeration computes;
    *  - M-step: piece counts re-estimate from the best segmentations
    *    (weighted by word frequency); pieces below `minCount` prune,
    *    characters absent from any segmentation stay at count 0.
    *
    * Scale shape (the bpeTrain contract): the corpus contributes ONE
    * tokenize scan into the word-frequency table; every round after
    * that touches only vocabulary-sized frames — the span candidates
    * are Σ |w|·maxPiece rows over DISTINCT words, the piece join is
    * equi on the piece text, the DP runs per word inside a typed map
    * (state = |w|+1 entries), and counts partial-aggregate map-side.
    * Vocabulary state is checkpointed per round (the t18 discipline).
    *
    * Output: the trained vocabulary — `(piece, cnt)`, cnt = the final
    * round's usage count (0 for coverage-only characters). */
  def unigramTrain(docs: DataFrame, rounds: Int = 2, maxPiece: Int = 4,
      minCount: Long = 2, maxWordLen: Int = 12,
      scriptTier: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordFreq(docs, maxWordLen, scriptTier)
      .localCheckpoint(eager = false) // candidates + every E-step
    val subs = words.as[(String, Long)]
      .flatMap { case (w, f) =>
        for {
          st <- 0 until w.length
          l <- 1 to math.min(maxPiece, w.length - st)
        } yield (w.substring(st, st + l), f)
      }
      .toDF("piece", "f")
      .groupBy("piece").agg(sum("f").as("cnt"))
      .localCheckpoint(eager = false) // v0 filter + char coverage set
    val chars = subs.filter(length(col("piece")) === 1).select("piece")
    var vocab = subs
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)
      .localCheckpoint(eager = false)
    var r = 0
    while (r < rounds) {
      val counts = bestSegs(words, vocab, maxPiece)
        .select(col("freq"), explode(split(col("seg"), " ")).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
      val kept = counts.filter(col("cnt") >= minCount ||
        length(col("piece")) === 1)
        .localCheckpoint(eager = false) // coverage anti-join + union
      vocab = chars.join(kept, Seq("piece"), "left_anti")
        .withColumn("cnt", lit(0L))
        .unionByName(kept)
        .localCheckpoint(eager = false) // next round / output
      r += 1
    }
    vocab.select("piece", "cnt")
  }

  /** Soft-count unigram-LM trainer (t38) — the "real EM" upgrade of
    * [[unigramTrain]]'s Viterbi-EM: instead of crediting only the
    * single best segmentation, every segmentation of a word
    * contributes to each of its pieces' counts in proportion to its
    * POSTERIOR weight. True unigram EM is float (piece probabilities
    * multiply and normalize — not cross-engine exact), so the weights
    * here are a FIXED-POINT ppm surrogate with every rounding pinned:
    *
    *   - piece score `p = (max(cnt,1) · 1e6) // maxCnt` ∈ [0, 1e6]
    *     (max-normalized, not sum-normalized: posteriors divide by
    *     the per-word total anyway, and max-normalizing keeps typical
    *     weights large so fewer segmentations floor to zero; a piece
    *     rarer than maxCnt/1e6 floors to score 0),
    *   - segmentation weight: left-to-right fold `wt ← (wt·p) // 1e6`
    *     from `wt₀ = 1e6` — the fixed fold order pins every floor,
    *   - per-word posterior credit for a piece occurring in a
    *     segmentation: `(Σ_seg wt·occurrences · 1e6) // Z_w`, with
    *     `Z_w = Σ_seg wt`,
    *   - corpus count: `cnt(p) = Σ_w (freq_w · credit) // 1e6`.
    *
    * Deep low-probability segmentations floor to weight 0 — the
    * surrogate's documented truncation (they carry ~0 posterior mass
    * in real EM too). A word whose EVERY segmentation floors to zero
    * (Z_w = 0) falls back to its full Viterbi-order credit — the t33
    * rule, so the soft trainer degrades to the hard one exactly where
    * fixed-point precision runs out. Keep/coverage rules are
    * [[unigramTrain]]'s verbatim.
    *
    * Scale shape: identical to [[unigramTrain]] — one corpus tokenize
    * into the word table, then vocabulary-sized rounds (span-piece
    * equi join, per-word enumeration inside a typed map — ≤ 1,490
    * compositions at maxWordLen 12 / maxPiece 4, arithmetic on ≤ 48
    * span entries), counts partial-aggregated map-side; plus one
    * 1-row max-count action per round (the pqEncode len contract).
    * The oracle replays every round: the same recursive segmentation
    * enumeration as t33's, extended with the running fixed-point
    * weight column. */
  def unigramTrainSoft(docs: DataFrame, rounds: Int = 2,
      maxPiece: Int = 4, minCount: Long = 2,
      maxWordLen: Int = 12, scriptTier: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordFreq(docs, maxWordLen, scriptTier)
      .localCheckpoint(eager = false) // candidates + every E-step
    val subs = words.as[(String, Long)]
      .flatMap { case (w, f) =>
        for {
          st <- 0 until w.length
          l <- 1 to math.min(maxPiece, w.length - st)
        } yield (w.substring(st, st + l), f)
      }
      .toDF("piece", "f")
      .groupBy("piece").agg(sum("f").as("cnt"))
      .localCheckpoint(eager = false) // v0 filter + char coverage set
    val chars = subs.filter(length(col("piece")) === 1).select("piece")
    var vocab = subs
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)
      .localCheckpoint(eager = false)
    var r = 0
    while (r < rounds) {
      // max over an EMPTY vocab (a corpus with no trainable words) is
      // null — degrade to the hard trainer's empty result instead of
      // an NPE; 1 keeps the piece-score division well-defined
      val mxRow = vocab.agg(max(greatest(col("cnt"), lit(1L)))).head()
      val mx = if (mxRow.isNullAt(0)) 1L else mxRow.getLong(0)
      val counts = words.as[(String, Long)]
        .flatMap { case (w, f) =>
          for {
            st <- 0 until w.length
            l <- 1 to math.min(maxPiece, w.length - st)
          } yield (w, f, st, w.substring(st, st + l))
        }
        .toDF("w", "freq", "st", "piece")
        .join(vocab.select(col("piece"), col("cnt")), "piece")
        .groupBy("w", "freq")
        .agg(collect_list(struct(col("st"), col("piece"), col("cnt")))
          .as("sp"))
        .as[(String, Long, Seq[(Int, String, Long)])]
        .flatMap { case (w, f, sp) => softCredits(w, f, sp, mx) }
        .toDF("piece", "c")
        .groupBy("piece").agg(sum("c").as("cnt"))
      val kept = counts.filter(col("cnt") >= minCount ||
        length(col("piece")) === 1)
        .localCheckpoint(eager = false) // coverage anti-join + union
      vocab = chars.join(kept, Seq("piece"), "left_anti")
        .withColumn("cnt", lit(0L))
        .unionByName(kept)
        .localCheckpoint(eager = false) // next round / output
      r += 1
    }
    vocab.select("piece", "cnt")
  }

  /** One word's soft E-step: enumerate EVERY segmentation of `w` into
    * vocab pieces, weight each by the fixed-point left-to-right fold,
    * and emit `(piece, (freq · posterior-credit) // 1e6)` rows — the
    * [[unigramTrainSoft]] arithmetic, one definition for the typed
    * map. Falls back to Viterbi-order hard credit when every weight
    * floors to zero. */
  private[graft] def softCredits(w: String, freq: Long,
      spans: Seq[(Int, String, Long)], maxCnt: Long)
    : Seq[(String, Long)] = {
    val S = 1000000L
    val n = w.length
    val byStart = Array.fill(n)(List.empty[(String, Long)])
    spans.foreach { case (st, p, c) =>
      byStart(st) = (p, (math.max(c, 1L) * S) / maxCnt) :: byStart(st)
    }
    // (segString, wt, nPieces, summedRawCnt) per completed path
    val segs = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Int, Long)]
    val rawCnt = spans.map { case (st, p, c) => (st, p) -> c }.toMap
    def rec(pos: Int, acc: List[String], wt: Long, np: Int,
        s: Long): Unit =
      if (pos == n) segs += ((acc.reverse.mkString(" "), wt, np, s))
      else byStart(pos).foreach { case (p, pfix) =>
        rec(pos + p.length, p :: acc, wt * pfix / S, np + 1,
          s + rawCnt((pos, p)))
      }
    rec(0, Nil, S, 0, 0L)
    if (segs.isEmpty) return Seq.empty // uncoverable (encode-only case)
    val z = segs.iterator.map(_._2).sum
    if (z > 0) {
      val credit = scala.collection.mutable.HashMap.empty[String, Long]
      segs.foreach { case (seg, wt, _, _) =>
        if (wt > 0) seg.split(" ").foreach { p =>
          credit(p) = credit.getOrElse(p, 0L) + wt
        }
      }
      credit.iterator
        .map { case (p, c) => (p, freq * ((c * S) / z) / S) }
        .filter(_._2 > 0).toSeq
    } else {
      // every segmentation floored to zero: the t33 hard credit
      val best = segs.minBy { case (seg, _, np, s) => (np, -s, seg) }
      best._1.split(" ").groupBy(identity).iterator
        .map { case (p, occ) => (p, freq * occ.length) }.toSeq
    }
  }

  /** Encode the corpus under a trained [[unigramTrain]] vocabulary
    * (t34) — the inference half, [[bpeEncode]]'s output contract:
    * alpha words in the trainable range segment by the SAME
    * (fewest pieces, highest count, seg string) DP; everything else —
    * non-alpha, overlong, single-char words, and the (corpus-mismatch
    * only) uncoverable word — passes through as ONE opaque token.
    *
    * Execution is [[bpeEncode]]'s rolling-fingerprint-in-one-map: the
    * trained vocabulary is BOUNDED driver state (the BPE-rules / PQ-
    * books contract — production vocabularies are ≤ a few hundred
    * thousand pieces) broadcast to executors, each document's word
    * stream is already in-row, and the encoded fingerprint folds left
    * to right inside one typed map — ZERO exchanges, no per-group
    * aggregation state (the previous explode→join→`collect_list`
    * rollup materialized the whole encoded document as one
    * aggregation buffer — the heaviest per-group state in the repo).
    * Distinct words still segment once per PARTITION (a size-capped
    * memo stands in for the old word-keyed join's global dedup).
    * Output rows (and the hash gate) are unchanged:
    * `(doc_id, n_words, n_tokens, enc_fp)` — the fingerprint moves if
    * any piece of any word changes; token-less documents are absent
    * (the old explode's contract). */
  def unigramEncode(docs: DataFrame, vocab: DataFrame,
      maxPiece: Int = 4, maxWordLen: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vmap: Map[String, Long] = vocab.select("piece", "cnt")
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(vmap)
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val vm = bc.value
        val memo = new java.util.HashMap[String, (String, Long)]()
        def isLowerAlpha(s: String): Boolean = {
          var i = 0
          while (i < s.length) {
            val c = s.charAt(i)
            if (c < 'a' || c > 'z') return false
            i += 1
          }
          s.length > 0
        }
        def segOf(w: String): (String, Long) =
          if (w.length < 2 || w.length > maxWordLen || !isLowerAlpha(w))
            (w, 1L) // outside the trainable range: one opaque token
          else {
            var r = memo.get(w)
            if (r == null) {
              val spans = for {
                st <- 0 until w.length
                l <- 1 to math.min(maxPiece, w.length - st)
                p = w.substring(st, st + l)
                c <- vm.get(p)
              } yield (st, p, c)
              val s = viterbiSeg(w, spans).getOrElse(w)
              r = (s, (s.count(_ == ' ') + 1).toLong)
              if (memo.size < (1 << 20)) memo.put(w, r)
            }
            r
          }
        it.map { case (id, toks) =>
          var nTokens = 0L
          val sb = new StringBuilder
          toks.foreach { w =>
            val (s, np) = segOf(w)
            nTokens += np
            if (sb.nonEmpty) sb.append(' ')
            sb.append(s)
          }
          (id, toks.length.toLong, nTokens,
            graft.functions.HashOps.polyHash(
              org.apache.spark.unsafe.types.UTF8String.fromString(
                sb.toString)))
        }
      }
      .toDF("doc_id", "n_words", "n_tokens", "enc_fp")
  }

  /** Tokenizer coverage census (t36) — the "evaluate your tokenizer
    * before you ship it" report every production stack runs after
    * [[unigramTrain]] (or any vocab): per SOURCE, the corpus-level
    * fertility (tokens per word), the whole-word rate (words the
    * vocab encodes as ONE piece — the single best proxy for
    * vocabulary fit), and the compression (characters per token), in
    * exact ppm integers. A source whose fertility is far above the
    * corpus mean is under-served by the vocabulary — the signal that
    * schedules a retrain with more of that source in the training
    * mix (the ss26/ss15 census-drives-retraining discipline).
    *
    * Tokens follow [[unigramEncode]]'s convention exactly: alpha
    * words in the trainable range segment by the shared DP,
    * everything else passes through as ONE opaque token (and counts
    * as a whole word). EVERY source emits a row — `n_docs` is the
    * per-source document census (one extra map-side agg over the same
    * scan), so a source whose docs produce zero words reports
    * `(n_docs, 0, 0, 0, 0, 0)` instead of vanishing at the explode:
    * the most under-served source is exactly the one the census
    * exists to flag. Scale shape: distinct words segment once
    * (vocabulary-sized); the corpus pays one tokenize scan, a
    * word-keyed join of the tiny mapping, and per-source map-side
    * aggregations — output is |sources| rows.
    *
    * Output: `(source, n_docs, n_words, n_tokens, fertility_ppm,
    * whole_word_ppm, chars_per_token_ppm)`. */
  def tokenizerCoverage(docs: DataFrame, vocab: DataFrame,
      maxPiece: Int = 4, maxWordLen: Int = 12,
      scriptTier: Boolean = false): DataFrame = {
    val segs = bestSegs(
      wordFreq(docs, maxWordLen, scriptTier)
        .select(col("w"), lit(1L).as("freq")),
      vocab, maxPiece)
      .select(col("w"),
        size(split(col("seg"), " ")).cast("long").as("np"))
    val census = docs.groupBy("source")
      .agg(count_distinct(col("doc_id")).as("n_docs"))
    val tokCol =
      if (scriptTier) TextAnalysis.tokensScript(col("text"))
      else TextAnalysis.tokens(col("text"))
    val agg = docs.select(col("doc_id"), col("source"),
        explode(tokCol).as("w"))
      .join(segs, Seq("w"), "left")
      .select(col("source"),
        coalesce(col("np"), lit(1L)).as("np"),
        length(col("w")).cast("long").as("nc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum("np").as("n_tokens"),
        sum(when(col("np") === 1L, 1L).otherwise(0L)).as("n_whole"),
        sum("nc").as("n_chars"))
    census.join(agg, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_whole"), lit(0L)).as("n_whole"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_tokens"),
        expr("CASE WHEN n_words = 0 THEN 0 ELSE " +
          "n_tokens * 1000000 div n_words END").as("fertility_ppm"),
        expr("CASE WHEN n_words = 0 THEN 0 ELSE " +
          "n_whole * 1000000 div n_words END").as("whole_word_ppm"),
        expr("CASE WHEN n_tokens = 0 THEN 0 ELSE " +
          "n_chars * 1000000 div n_tokens END")
          .as("chars_per_token_ppm"))
  }

  /** The distinct-word frequency table both unigram halves share —
    * [[bpeTrain]]'s normalization: lower-cased whitespace tokens,
    * `[a-z]+` only, length 2..maxWordLen. `scriptTier = true`
    * switches to the [[TextAnalysis.tokensScript]] stream gated by
    * [[TextAnalysis.ScriptWordGate]] (any single-script letter run —
    * the multilingual trainers' word source). */
  private def wordFreq(docs: DataFrame, maxWordLen: Int,
      scriptTier: Boolean = false): DataFrame = {
    val (tokCol, gate) =
      if (scriptTier)
        (TextAnalysis.tokensScript(col("text")),
          TextAnalysis.ScriptWordGate)
      else (TextAnalysis.tokens(col("text")), "^[a-z]+$")
    docs
      .select(explode(tokCol).as("w"))
      .filter(col("w").rlike(gate) &&
        length(col("w")).between(2, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("freq"))
  }

  /** E-step: the optimal segmentation per distinct word under the
    * current vocabulary — span candidates join the vocabulary equi on
    * the piece text (never all-pairs), then a per-word linear DP in a
    * typed map. Words with an uncoverable position (possible only
    * when encoding a corpus the vocab was not trained on) fall back
    * to the identity segmentation. */
  private def bestSegs(words: DataFrame, vocab: DataFrame,
      maxPiece: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.as[(String, Long)]
      .flatMap { case (w, f) =>
        for {
          st <- 0 until w.length
          l <- 1 to math.min(maxPiece, w.length - st)
        } yield (w, f, st, w.substring(st, st + l))
      }
      .toDF("w", "freq", "st", "piece")
      .join(vocab.select(col("piece"), col("cnt")), "piece")
      .groupBy("w", "freq")
      .agg(collect_list(struct(col("st"), col("piece"), col("cnt")))
        .as("sp"))
      .as[(String, Long, Seq[(Int, String, Long)])]
      .map { case (w, f, sp) => (w, f, viterbiSeg(w, sp).getOrElse(w)) }
      .toDF("w", "freq", "seg")
  }

  /** The per-word DP: argmin over all segmentations of `w` into vocab
    * pieces by (piece count asc, summed count desc, segmentation
    * string asc) — right-to-left, one best state per position (the
    * total order is suffix-decomposable; see [[unigramTrain]]).
    * None when some position is uncoverable. */
  private[graft] def viterbiSeg(w: String,
      spans: Seq[(Int, String, Long)]): Option[String] = {
    val n = w.length
    val byStart = Array.fill(n)(List.empty[(String, Long)])
    spans.foreach { case (st, p, c) => byStart(st) = (p, c) :: byStart(st) }
    val INF = Int.MaxValue / 2
    val bn = Array.fill(n + 1)(INF)
    val bs = new Array[Long](n + 1)
    val bstr = new Array[String](n + 1)
    bn(n) = 0; bs(n) = 0L; bstr(n) = ""
    var pos = n - 1
    while (pos >= 0) {
      byStart(pos).foreach { case (p, c) =>
        val e = pos + p.length
        if (e <= n && bn(e) < INF) {
          val cn = bn(e) + 1
          val cs = bs(e) + c
          val cstr = if (bstr(e).isEmpty) p else p + " " + bstr(e)
          if (cn < bn(pos) || (cn == bn(pos) && (cs > bs(pos) ||
              (cs == bs(pos) && cstr < bstr(pos)))))
            { bn(pos) = cn; bs(pos) = cs; bstr(pos) = cstr }
        }
      }
      pos -= 1
    }
    if (bn(0) >= INF) None else Some(bstr(0))
  }
}
