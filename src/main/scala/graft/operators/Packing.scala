package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: the last step of a training-data pipeline —
  * curated documents are concatenated and split into fixed-length
  * token sequences (the GPT-style "concat then chop every seq_len"
  * packing), and the trainer needs a MANIFEST of where each document
  * landed: which sequence, at which offset.
  *
  * Scale shape: a single global concatenation order would be one
  * totally-ordered window — a one-reducer sort at 100 TB. Instead
  * documents hash into `buckets` independent streams (a real run
  * makes each bucket one output shard/file), packing runs per bucket:
  * ONE hash shuffle on the bucket key, then a per-bucket ordered
  * cumulative sum — `buckets`-way parallel, each window sized
  * corpus/buckets. All arithmetic is integer (token counts, floor
  * division), so the manifest is bit-reproducible and SQL-checkable.
  */
object Packing {

  /** Packing manifest: for every document, its bucket, the sequence
    * (`pack_id`, numbered within the bucket) where its first token
    * lands, and the token offset inside that sequence. A document
    * with `off + n_tokens > seqLen` straddles into the following
    * sequence(s) — `n_packs` reports how many sequences it touches,
    * the standard cross-boundary accounting of concat-packing. */
  def packManifest(docs: DataFrame, seqLen: Int = 2048,
      buckets: Int = 32): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("bucket",
        pmod(TextAnalysis.fingerprint(col("doc_id").cast("string")),
          lit(buckets.toLong)))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        expr(s"(cum - n_tokens) div $seqLen").as("pack_id"),
        expr(s"(cum - n_tokens) % $seqLen").as("tok_off"),
        // sequences touched = last token's pack - first token's pack + 1;
        // a zero-token doc touches none
        expr(s"CASE WHEN n_tokens = 0 THEN 0 ELSE " +
          s"(cum - 1) div $seqLen - (cum - n_tokens) div $seqLen + 1 END")
          .as("n_packs"))
  }

  /** Shard audit of [[packManifest]] — the inverse view: per OUTPUT
    * sequence, how many documents contribute and how many tokens land
    * in it. Proves the manifest is a true partition of the token
    * stream: every sequence must hold exactly `seqLen` tokens except
    * the last of each bucket (the ragged tail). The trainer-side
    * loader runs exactly this arithmetic to slice documents into
    * sequences, so a green audit means manifest and loader agree.
    *
    * A document spanning packs `p..p+k` contributes
    * `min(cum, (p+1)·L) − max(cum − n, p·L)` tokens to pack `p` —
    * pure integer interval intersection. Scale shape: the manifest's
    * per-bucket window (from packManifest) plus one explode of each
    * doc's touched-pack range (≤ n_tokens/L + 1 rows per doc) and one
    * (bucket, pack) hash aggregation — map-side combinable, no new
    * global sort. */
  def packShardAudit(docs: DataFrame, seqLen: Int = 2048,
      buckets: Int = 32): DataFrame = {
    val m = packManifest(docs, seqLen, buckets)
      .withColumn("cum",
        expr(s"pack_id * $seqLen + tok_off + n_tokens"))
      .filter(col("n_tokens") > 0)
    m.select(col("bucket"), col("n_tokens"), col("cum"),
        explode(sequence(col("pack_id"),
          col("pack_id") + col("n_packs") - 1)).as("pack"))
      .withColumn("contrib",
        least(col("cum"), (col("pack") + 1) * seqLen) -
          greatest(col("cum") - col("n_tokens"), col("pack") * lit(seqLen.toLong)))
      .groupBy("bucket", "pack")
      .agg(count(lit(1)).as("n_docs"), sum("contrib").as("n_toks"))
      .withColumn("is_full", col("n_toks") === seqLen)
  }

  /** Token-budget selection: rank the corpus by quality (best first,
    * doc_id tie-break) and keep the longest prefix whose cumulative
    * token count fits `budget` — the "fill the training run with the
    * best N billion tokens" curation step. Output is the selection
    * manifest `(doc_id, quality, n_tokens, pick_rank, cum_tokens)`.
    *
    * Scale shape — the naive formulation is ONE global window
    * (`sum over (ORDER BY quality DESC)`), a single-reducer sort of
    * the corpus. Instead the cumulative sum is computed in two
    * histogram-refined phases, both bounded:
    *
    *  1. quality quantizes to an integer micro-key (`floor(q·2^20)` —
    *     exact power-of-two scaling, order-preserving); ONE hash
    *     aggregation builds the per-key token/doc histogram, whose
    *     size is bounded by the key space (~few thousand distinct
    *     values in practice), independent of corpus size;
    *  2. the histogram's own running totals (a window over the TINY
    *     histogram frame) broadcast back as each key's `base_*`
    *     offsets, and the per-document window runs PARTITIONED BY the
    *     micro-key — parallel across keys, each partition only the
    *     docs sharing one quality value.
    *
    * The quantized key only GROUPS the order (intra-key order is
    * refined by the exact quality then doc_id inside the partitioned
    * window), so the selection equals the global-window answer
    * exactly; token counts are non-negative, making the cumsum
    * monotone and `cum ≤ budget` a true prefix. */
  def tokenBudgetSelect(docs: DataFrame, budget: Long): DataFrame = {
    // 2^20: exact in double, and fine enough that a micro-key bucket
    // holds only docs whose qualities differ below any meaningful
    // curation signal (they still order exactly within the bucket)
    val QScale = 1048576.0d
    val scored = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("qk", floor(col("quality") * lit(QScale)).cast("long"))
      .localCheckpoint(eager = false) // scanned by histogram + final window
    val histW = Window.orderBy(col("qk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = scored.groupBy("qk")
      .agg(sum("n_tokens").as("key_toks"), count(lit(1)).as("key_docs"))
      .withColumn("base_toks", sum("key_toks").over(histW) - col("key_toks"))
      .withColumn("base_rank", sum("key_docs").over(histW) - col("key_docs"))
      // keys whose budget window is already spent contribute nothing —
      // prune them before the join so the final window never sees docs
      // that cannot be selected
      .filter(col("base_toks") < budget)
      .select("qk", "base_toks", "base_rank")
    val w = Window.partitionBy("qk")
      .orderBy(col("quality").desc, col("doc_id"))
    scored.join(broadcast(hist), "qk")
      .withColumn("cum_tokens",
        col("base_toks") + sum("n_tokens")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pick_rank", col("base_rank") + row_number().over(w))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "quality", "n_tokens", "pick_rank", "cum_tokens")
  }

  /** Overlapping-chunk manifest — the pre-embedding / RAG-indexing
    * split: each document becomes `ceil(max(n-overlap,1) / stride)`
    * chunks of up to `chunkTokens` tokens with `overlap` tokens shared
    * between neighbours (stride = chunkTokens − overlap). Emits
    * `(doc_id, chunk_id, start_tok, n_tok, chunk_fp)` where `chunk_fp`
    * is the polynomial fingerprint of the chunk's joined tokens —
    * join-ready for chunk-level dedup or embedding-table keys.
    *
    * Entirely per-row (tokenize once, explode a chunk-index sequence,
    * slice per chunk): zero shuffles, stays in one corpus scan. An
    * empty document yields one empty chunk (fp 0), matching the
    * one-gram convention of [[graft.functions.HashOps.gramFps]]. */
  def chunkManifest(docs: DataFrame, chunkTokens: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks",
        greatest(lit(1),
          expr(s"(n - $overlap + $stride - 1) div $stride")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_tok",
        least(lit(chunkTokens), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_tok"),
        TextAnalysis.fingerprint(
          array_join(slice(col("toks"), col("start_tok") + 1,
            col("n_tok")), " ")).as("chunk_fp"))
  }

  /** Deterministic seeded GLOBAL SHUFFLE: every row gets a shard and
    * a 0-based position within it, both pure functions of
    * (`seed`, id) — the data-order randomization a training run needs
    * to be REPRODUCIBLE: re-running the pipeline (or re-materializing
    * one lost shard) yields byte-identical order, and changing `seed`
    * reshuffles everything. A `orderBy(rand())` gives neither.
    *
    * Scale shape: the shard key is per-row arithmetic; one hash
    * exchange on `shard` and a per-shard window sort on the hash —
    * `nShards`-way parallel, each sort sized corpus/nShards, never a
    * global single-reducer order. The hash ties break on the id, so
    * the order is total and engine-exact.
    *
    * Output: `(id, h, shard, pos)`. */
  def globalShuffle(df: DataFrame, idCol: String, nShards: Int,
      seed: Long): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("h", idCol)
    df.select(col(idCol),
        TextAnalysis.fingerprint(
          concat_ws(":", lit(seed), col(idCol))).as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
  }

  /** EXECUTE the packing plan (tp8): materialize each output
    * sequence's identity — contributing doc count, landed token
    * count, and a rolling fingerprint over the sequence's token
    * stream IN ORDER — from [[packManifest]]'s placements. The
    * fingerprint is what makes this the execution proof rather than
    * another audit: it equals the polynomial hash of exactly the
    * token-fp stream a trainer loader slicing the same manifest
    * would emit, so any off-by-one in offsets, straddling, or
    * ordering changes the value ([[packShardAudit]] checks the
    * COUNTS; this checks the BYTES). Emitting the hash instead of
    * the 2048-token arrays keeps the result frame tiny; the real
    * materializer writes the arrays with the identical placement
    * arithmetic.
    *
    * Scale shape: manifest join on doc_id (key-equi), one explode to
    * (bucket, global_pos, token_fp) longs, ONE (bucket, pack) hash
    * aggregation whose per-key state is bounded by `seqLen` structs
    * — sorted and folded inside the aggregate, never a global sort.
    * Token text never shuffles; the stream is fingerprints. */
  def packExecute(docs: DataFrame, seqLen: Int = 2048,
      buckets: Int = 32): DataFrame = {
    import graft.functions.hashFunctions.gram_fps
    val manifest = packManifest(docs, seqLen, buckets)
      .filter(col("n_tokens") > 0)
      .select("doc_id", "n_tokens", "bucket", "pack_id", "tok_off")
    val toks = docs.select(col("doc_id"), gram_fps(col("text"), 1).as("fps"))
    val placed = manifest.join(toks, "doc_id")
      .select(col("doc_id"), col("bucket"),
        (col("pack_id") * seqLen + col("tok_off")).as("start"),
        posexplode(slice(col("fps"), lit(1), col("n_tokens").cast("int"))))
      .select(col("doc_id"), col("bucket"),
        (col("start") + col("pos")).as("gpos"), col("col").as("fp"))
    placed
      .groupBy(col("bucket"), expr(s"gpos div $seqLen").as("pack_id"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        aggregate(
          array_sort(collect_list(struct(
            (col("gpos") % seqLen).as("p_off"), col("fp")))),
          lit(0L),
          (acc, x) => (acc * 31L + x.getField("fp")) % 1000000007L)
          .as("seq_fp"))
  }

  /** Deterministic SOURCE-INTERLEAVED epoch order (tp7): round-robin
    * the corpus's sources into one training stream — each document
    * gets a seeded-hash rank within its source and the global slot
    * `src_rank · n_sources + src_idx`, so consecutive stream slots
    * cycle through the sources (until a source exhausts and its slots
    * go unused — the reader skips holes). This is the "don't feed the
    * model a year of one crawl before the next" ordering, reproducible
    * the same way [[globalShuffle]] is: a pure function of
    * (`seed`, source, id).
    *
    * Scale shape: a per-source GLOBAL rank would funnel the corpus
    * through one reducer per source (sources are few — the exact skew
    * q54 exists to catch), so the rank is computed with the
    * [[tokenBudgetSelect]] two-phase pattern: the hash space is cut
    * into `buckets` contiguous RANGES, per-(source, range) counts
    * (one bounded partial agg) turn into running offsets over the
    * tiny histogram — broadcast back — and the exact rank window runs
    * PARTITIONED BY (source, range), parallel across
    * sources × buckets. Identical answer to the naive per-source
    * window, never its single-reducer sort. Source indices come from
    * a distinct-sources frame (vocabulary-sized) joined back as a
    * broadcast.
    *
    * Output: `(doc_id, source, src_rank, slot)`. */
  def interleaveSources(docs: DataFrame, seed: Long,
      buckets: Int = 32): DataFrame = {
    val ranked = seededRankByKey(docs, "source", "doc_id", seed, buckets)
      .withColumnRenamed("key_rank", "src_rank")
    val srcW = Window.orderBy("source")
    val srcs = docs.select("source").distinct()
      .withColumn("src_idx", row_number().over(srcW).cast("long") - 1L)
    val nSrc = srcs.agg(count(lit(1)).as("n_src"))
    ranked
      .join(broadcast(srcs), "source")
      .crossJoin(broadcast(nSrc))
      .select(col("doc_id"), col("source"), col("src_rank"),
        (col("src_rank") * col("n_src") + col("src_idx")).as("slot"))
  }

  /** Per-`keyCol` dense 0-based rank of every row under the seeded
    * total order (fingerprint(seed:id), id) — computed with the
    * [[tokenBudgetSelect]] two-phase range-bucket pattern, so no key
    * ever funnels through one reducer: the hash space is cut into
    * `buckets` contiguous ranges, per-(key, range) counts become
    * running offsets over the bounded histogram (broadcast back), and
    * the exact rank window runs partitioned by (key, range). Equals
    * the naive per-key window rank exactly.
    *
    * Output: the id/key columns plus `h` and `key_rank`. Shared by
    * [[interleaveSources]] (tp7) and
    * [[Mixture.exactStratifiedSplit]] (mx6). */
  /** Quality-annealed curriculum order (tp9): every document gets a
    * global training position such that stage 0 (the highest-quality
    * band) trains first and each later stage admits progressively
    * noisier data — the curriculum-learning schedule, as a
    * deterministic manifest instead of a loader-side heuristic.
    * Stages are FIXED bands of the calibrated quality score
    * (`stage = ⌊(2 − q)·stages/3⌋` clamped — q spans [−1, 2], so the
    * binning is data-independent and append-stable: a new document
    * never moves an old one's stage); within a stage the order is the
    * seeded shuffle of [[seededRankByKey]] (no curriculum should
    * present documents in storage order).
    *
    * Scale shape: quality is per-row; the within-stage rank is the
    * two-phase range-bucket cumsum (histogram broadcast, windows
    * partitioned by (stage, range) — no global sort, no single
    * reducer); stage offsets are a ≤-stages-row window riding a
    * broadcast.
    *
    * Output: `(doc_id, quality, stage, stage_rank, curriculum_pos)`
    * with `curriculum_pos` a total 0-based order. */
  def curriculumOrder(docs: DataFrame, stages: Int = 4,
      seed: Long = 42L): DataFrame = {
    val staged = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("stage",
        least(lit(stages - 1), greatest(lit(0),
          floor((lit(2.0) - col("quality")) * stages / lit(3.0))
            .cast("int"))))
    val ranked = seededRankByKey(staged, "stage", "doc_id", seed,
        keep = Seq("quality"))
      .withColumnRenamed("key_rank", "stage_rank")
    val offW = Window.orderBy("stage")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ≤ `stages` rows: the unpartitioned window is bounded
    val offsets = staged.groupBy("stage").agg(count(lit(1)).as("n"))
      .withColumn("base", sum("n").over(offW) - col("n"))
      .select("stage", "base")
    ranked.join(broadcast(offsets), Seq("stage"))
      .select(col("doc_id"), col("quality"), col("stage"),
        col("stage_rank"),
        (col("base") + col("stage_rank")).as("curriculum_pos"))
  }

  /** Pack attention-mask manifest (tp10): the loader-facing view of
    * [[packManifest]] — one row per (sequence, document span) with
    * the IN-SEQUENCE offset and length of each document's token
    * slice, i.e. exactly the boundaries a trainer needs to build the
    * block-diagonal attention mask (and loss mask) that stops packed
    * documents from attending across their joins. `slot` numbers the
    * spans within a sequence in token order; spans tile each
    * sequence exactly ([[packShardAudit]] proves the totals).
    *
    * Scale shape: the manifest's per-bucket window, one explode of
    * each doc's touched-pack range (≤ n_tokens/seqLen + 1 rows), and
    * a window partitioned by (bucket, pack) — bounded by
    * docs-per-sequence, never corpus-sized. Pure integer interval
    * arithmetic; text never moves past the token count.
    *
    * Output: `(bucket, pack, slot, doc_id, start, len)`. */
  def packMasks(docs: DataFrame, seqLen: Int = 2048,
      buckets: Int = 32): DataFrame = {
    val m = packManifest(docs, seqLen, buckets)
      .withColumn("cum",
        expr(s"pack_id * $seqLen + tok_off + n_tokens"))
      .filter(col("n_tokens") > 0)
    val spans = m.select(col("doc_id"), col("bucket"), col("n_tokens"),
        col("cum"),
        explode(sequence(col("pack_id"),
          col("pack_id") + col("n_packs") - 1)).as("pack"))
      .withColumn("p0", col("pack") * lit(seqLen.toLong))
      .withColumn("a", greatest(col("cum") - col("n_tokens"), col("p0")))
      .withColumn("start", col("a") - col("p0"))
      .withColumn("len",
        least(col("cum"), (col("pack") + 1) * seqLen) - col("a"))
    val slotW = Window.partitionBy("bucket", "pack")
      .orderBy("start", "doc_id")
    spans
      .withColumn("slot", row_number().over(slotW).cast("long") - 1L)
      .select("bucket", "pack", "slot", "doc_id", "start", "len")
  }

  /** Length-bucketed batching manifest (tp11): the OTHER packing
    * strategy — instead of concatenating documents into fixed
    * sequences ([[packManifest]], pretraining), group documents of
    * similar length into fixed-token-budget batches and pad each to
    * its band's ceiling (finetuning/inference, where documents must
    * stay whole and cross-document packing is wrong). Bands are
    * fixed `bandWidth`-token strips; a batch holds
    * `max(1, batchTokens div bandCeil)` documents of ONE band, so
    * padding waste is bounded by the band width and REPORTED per row
    * (`pad_tokens` — the number the curriculum/efficiency dashboards
    * aggregate).
    *
    * Scale shape: band assignment is per-row; within-band order is
    * the seeded two-phase range-bucket rank of [[seededRankByKey]]
    * (histogram broadcast — a dominant band never sorts on one
    * reducer); batch/slot/pad are integer arithmetic on the rank.
    *
    * Output: `(doc_id, n_tokens, band, band_rank, batch_no, slot,
    * pad_tokens)`. */
  def lengthBatches(docs: DataFrame, batchTokens: Int = 2048,
      bandWidth: Int = 64, seed: Long = 42L): DataFrame = {
    val sized = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("band", expr(s"n_tokens div $bandWidth"))
    val ranked = seededRankByKey(sized, "band", "doc_id", seed,
        keep = Seq("n_tokens"))
      .withColumnRenamed("key_rank", "band_rank")
    ranked
      .withColumn("band_ceil", (col("band") + 1) * bandWidth)
      .withColumn("per_batch",
        greatest(lit(1L), expr(s"${batchTokens}L div band_ceil")))
      .select(col("doc_id"), col("n_tokens"), col("band"),
        col("band_rank"),
        expr("band_rank div per_batch").as("batch_no"),
        (col("band_rank") % col("per_batch")).as("slot"),
        (col("band_ceil") - col("n_tokens")).as("pad_tokens"))
  }

  /** Span-corruption manifest (tp12) — the T5/UL2 denoising plan as a
    * deterministic manifest: each document masks `rateMil`/1000 of its
    * tokens in spans of mean length `meanSpan`, and the loader reads
    * the manifest instead of rolling its own RNG (so the same
    * document always corrupts the same way — resumable training,
    * reproducible ablations).
    *
    * Deterministic construction, exact integers throughout:
    * `masked = n·rateMil div 1000` tokens in
    * `spans = max(1, masked div meanSpan)` spans; span i has length
    * `masked div spans (+1 for the first masked mod spans)` — lengths
    * tile `masked` exactly — and lives inside its own document
    * SEGMENT `[i·n div spans, (i+1)·n div spans)` at a seeded-hash
    * offset, so spans can never overlap or touch out of order. At
    * `rateMil ≤ 400` every segment is provably longer than its span;
    * beyond that a `least` clamp keeps the plan legal (and the tiling
    * identity becomes ≤). Documents too short to mask a single token
    * (`n·rateMil < 1000`) emit no rows.
    *
    * Scale shape: pure per-row — token count, arithmetic, and an
    * explode bounded by the doc's own span count; zero shuffles, one
    * corpus scan, streaming-legal by construction.
    *
    * Output: `(doc_id, n_tokens, span_no, start_tok, mask_len)`. */
  def spanCorruptionPlan(docs: DataFrame, rateMil: Int = 150,
      meanSpan: Int = 3, seed: Long = 42L): DataFrame = {
    require(rateMil > 0 && rateMil <= 1000, "rateMil in (0, 1000]")
    require(meanSpan > 0, "meanSpan must be positive")
    docs
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .withColumn("masked", expr(s"n * $rateMil div 1000"))
      .filter(col("masked") >= 1)
      .withColumn("spans",
        greatest(lit(1L), expr(s"masked div $meanSpan")))
      .select(col("doc_id"), col("n"), col("masked"), col("spans"),
        explode(sequence(lit(0L), col("spans") - 1)).as("span_no"))
      .withColumn("seg_start", expr("span_no * n div spans"))
      .withColumn("seg_len",
        expr("(span_no + 1) * n div spans - span_no * n div spans"))
      .withColumn("mask_len",
        least(expr("masked div spans + if(span_no < masked % spans, 1, 0)"),
          col("seg_len")))
      .withColumn("start_tok", col("seg_start") +
        TextAnalysis.fingerprint(concat_ws(":", lit(seed),
          col("doc_id"), col("span_no")))
          % (col("seg_len") - col("mask_len") + 1))
      .select(col("doc_id"), col("n").as("n_tokens"), col("span_no"),
        col("start_tok"), col("mask_len"))
  }

  /** Fill-in-the-middle split manifest (tp13) — the FIM transform
    * (Bavarian et al. 2022) as a deterministic manifest: a `fimMil`/
    * 1000 hash-coin of documents is split at two seeded cut points
    * into (prefix, middle, suffix) and tagged PSM or SPM (the
    * prefix-suffix-middle / suffix-prefix-middle orders the loader
    * assembles with its sentinel tokens); the rest pass through as
    * `none`. The same document always splits the same way —
    * resumable training, reproducible ablations (the tp12 contract).
    *
    * Cut points are `fp(seed:id:1|2) mod (n+1)` ordered, so empty
    * prefixes/middles/suffixes are legal exactly as in the paper; the
    * manifest carries each part's rolling fingerprint over the
    * normalized token stream, so a loader (or the oracle) can verify
    * the actual split CONTENT, not just indexes.
    *
    * Scale shape: pure per-row — tokenize, integer arithmetic, three
    * slice fingerprints; zero shuffles, one corpus scan,
    * streaming-legal by construction. Output: `(doc_id, n_tokens,
    * cut1, cut2, mode, prefix_fp, middle_fp, suffix_fp)`. */
  def fimSplit(docs: DataFrame, fimMil: Long = 500L,
      seed: Long = 42L): DataFrame = {
    require(fimMil >= 0 && fimMil <= 1000, "fimMil in [0, 1000]")
    def fp(parts: Column*): Column =
      TextAnalysis.fingerprint(concat_ws(":", parts: _*))
    def sliceFp(from: Column, len: Column): Column =
      TextAnalysis.fingerprint(
        concat_ws(" ", slice(col("toks"), from, len)))
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("fim",
        fp(lit(seed), col("doc_id"), lit(0)) % 1000L < fimMil)
      .withColumn("c1",
        when(col("fim"), fp(lit(seed), col("doc_id"), lit(1))
          % (col("n") + 1L)).otherwise(col("n")))
      .withColumn("c2",
        when(col("fim"), fp(lit(seed), col("doc_id"), lit(2))
          % (col("n") + 1L)).otherwise(col("n")))
      .withColumn("cut1", least(col("c1"), col("c2")))
      .withColumn("cut2", greatest(col("c1"), col("c2")))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("cut1"), col("cut2"),
        when(!col("fim"), lit("none"))
          .when(fp(lit(seed), col("doc_id"), lit(3)) % 2L === 0L,
            lit("psm")).otherwise(lit("spm")).as("mode"),
        sliceFp(lit(1), col("cut1")).as("prefix_fp"),
        sliceFp(col("cut1") + 1L, col("cut2") - col("cut1"))
          .as("middle_fp"),
        sliceFp(col("cut2") + 1L, col("n") - col("cut2"))
          .as("suffix_fp"))
  }

  private[operators] def seededRankByKey(df: DataFrame, keyCol: String,
      idCol: String, seed: Long, buckets: Int = 32,
      keep: Seq[String] = Nil): DataFrame = {
    val Mod = 1000000007L
    val rangeWidth = Mod / buckets + 1
    val hashed = df.select(col(idCol) +: col(keyCol) +: keep.map(col) :+
        TextAnalysis.fingerprint(
          concat_ws(":", lit(seed), col(idCol))).as("h"): _*)
      .withColumn("rb", expr(s"h div $rangeWidth"))
      .localCheckpoint(eager = false) // histogram + rank window
    val histW = Window.partitionBy(keyCol).orderBy("rb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = hashed.groupBy(keyCol, "rb")
      .agg(count(lit(1)).as("n"))
      .withColumn("base", sum("n").over(histW) - col("n"))
      .select(keyCol, "rb", "base")
    val w = Window.partitionBy(keyCol, "rb").orderBy("h", idCol)
    hashed.join(broadcast(hist), Seq(keyCol, "rb"))
      .withColumn("key_rank",
        col("base") + row_number().over(w).cast("long") - 1L)
      .drop("rb", "base")
  }
}
