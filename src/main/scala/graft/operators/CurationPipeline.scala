package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation — the composition the individual
  * operators exist for:
  *
  *  1. annotate each document (tokens, quality, language);
  *  2. drop low-quality docs (cheap per-row filter FIRST, so
  *     everything downstream sees less data);
  *  3. exact-dedup on the normalized text (one hash shuffle, keep the
  *     lowest doc_id);
  *  4. near-dup removal: Jaccard pairs over word-shingles among the
  *     survivors; a document is dropped when it is the higher id of
  *     any qualifying pair — deterministic, order-free, single-pass.
  *     On chains a–b–c this drops both b and c; when exactly one
  *     representative per transitive group is required, resolve the
  *     same pair stream with [[Dedup.resolveClusters]] (checkpointed
  *     min-label propagation, dd8) and keep `cluster_id` instead.
  *
  * The whole pipeline is one lazy Catalyst plan: filters fuse with
  * the scan, the dedup shuffle sees only quality survivors, and the
  * pair join only distinct shingles of exact-dedup survivors. At
  * 100 TB, swap step 4's candidate generation for
  * [[Dedup.minhashPairs]] (same verify stage) — the API is the same.
  */
object CurationPipeline {

  /** Preparation end-to-end: quality floor → exact dedup →
    * eval-set decontamination → overlapping-chunk manifest. The
    * composition that takes a raw crawl to training-ready chunks:
    * every stage is the already-audited operator (filter-first, md5
    * content-key dedup, broadcast eval-gram semi probe, per-row
    * chunking), fused into one lazy plan — Catalyst pushes the
    * quality filter to the scan and the corpus never shuffles outside
    * the one dedup key exchange. Emits [[Packing.chunkManifest]] rows
    * for the clean survivors. */
  def curateToChunks(docs: DataFrame, isEval: Column,
      minQuality: Double = 0.2, minTokens: Int = 5, evalK: Int = 5,
      chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    // annotate+filter feeds two consumers (the dedup keys and the
    // survivor join) — checkpoint once, like curate()
    val quality = docs.filter(!isEval)
      .select(col("doc_id"), col("text"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .filter(col("quality") >= minQuality && col("n_tokens") >= minTokens)
      .localCheckpoint(eager = false)
    val keepIds = quality
      .groupBy(Dedup.contentKey(col("text")).as("k"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val kept = quality.join(keepIds, "doc_id")
      .localCheckpoint(eager = false)
    // contamination flags are per-document (only the eval set
    // matters), so decontaminate just the SURVIVORS ∪ eval set — not
    // the full corpus, whose dropped docs' flags would be discarded
    // by the semi join anyway (a full extra corpus shingle+probe at
    // 100 TB)
    val deconInput = kept
      .select(col("doc_id"), col("text"), lit(false).as("is_eval"))
      .unionByName(docs.filter(isEval)
        .select(col("doc_id"), col("text"), lit(true).as("is_eval")))
    val clean = kept.join(
      Decontaminate.ngramOverlap(deconInput, col("is_eval"), evalK)
        .filter(!col("contaminated")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    Packing.chunkManifest(clean.select("doc_id", "text"),
      chunkTokens, overlap)
  }

  /** Per-source frequency caps (cr1) — the C4/RefinedWeb-style
    * curation rule: no source (domain, crawl host, feed) may
    * contribute more than `cap` documents, and when a source is over
    * its cap the HIGHEST-QUALITY `cap` documents survive — keeping a
    * hot domain from dominating the mixture while preserving its best
    * content. Emits the keeper manifest
    * `(doc_id, source, quality, src_rank)` with `src_rank` the 1-based
    * quality rank within the source (ties by doc_id).
    *
    * Scale shape: the within-source rank is the two-phase range-bucket
    * cumsum ([[Packing.tokenBudgetSelect]]'s discipline) — quality is
    * per-row, docs bucket by `⌊quality·2²⁰⌋`, a per-(source, bucket)
    * histogram cumsums into per-bucket rank bases, and the final
    * window partitions by (source, bucket): a source with a billion
    * documents never funnels through one reducer, which is exactly
    * how a naive `row_number() OVER (PARTITION BY source)` dies on
    * the hottest crawl domain. Buckets whose rank window starts at or
    * past the cap are pruned BEFORE the join, so the per-source
    * histogram side carries at most the cap-window buckets and the
    * final window only ever sees potentially-keepable rows. The
    * histogram join is left unhinted: its pruned size is
    * Σ_source min(buckets, cap+1) rows — usually broadcastable, but
    * the optimizer (AQE) should make that call when the source
    * universe is huge.
    *
    * Tie caveat (shared with [[qualityFloor]]): quality-bucketing
    * cannot split EXACT ties — a source with millions of
    * identical-quality docs re-concentrates its tied bucket on one
    * reducer. Mass exact ties mean byte-identical content in
    * practice; run exact dedup (dd1) upstream, which is where the
    * curation pipeline already puts it. */
  def sourceCaps(docs: DataFrame, cap: Long,
      groupCol: String = "source"): DataFrame = {
    require(cap > 0, "cap must be positive")
    // 2^20 micro-buckets: exact in double, fine enough that a bucket
    // only holds docs whose qualities differ below any curation signal
    val QScale = 1048576.0d
    val scored = docs.select(col("doc_id"), col(groupCol),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("qk", floor(col("quality") * lit(QScale)).cast("long"))
      .localCheckpoint(eager = false) // feeds histogram AND final rank
    val histW = Window.partitionBy(groupCol).orderBy(col("qk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = scored.groupBy(groupCol, "qk")
      .agg(count(lit(1)).as("n"))
      .withColumn("base", sum("n").over(histW) - col("n"))
      .filter(col("base") < cap) // bucket starts inside the cap window
      .select(groupCol, "qk", "base")
    val w = Window.partitionBy(groupCol, "qk")
      .orderBy(col("quality").desc, col("doc_id"))
    scored.join(hist, Seq(groupCol, "qk"))
      .withColumn("src_rank",
        col("base") + row_number().over(w).cast("long"))
      .filter(col("src_rank") <= cap)
      .select(col("doc_id"), col(groupCol), col("quality"),
        col("src_rank"))
  }

  /** Per-source EXACT quality floor (cr2) — adaptive thresholds
    * instead of one global cutoff: each source drops its own bottom
    * `pctPpm`/10⁶ quality quantile, so a uniformly-mediocre source
    * is trimmed as aggressively as a mostly-great one (a global
    * floor would wipe out the former and never touch the latter).
    * The threshold is the EXACT per-source quantile, not a sketch.
    *
    * Scale shape: grouped exact quantiles without any per-source
    * sort — the q69 histogram discipline applied per group: docs
    * bucket by `⌊quality·2²⁰⌋`, the per-(source, bucket) histogram
    * cumsums to locate the ONE bucket per source containing the
    * target rank (q69's overflow-safe split rank arithmetic), only
    * that bucket's rows enter a window, and the ≤1-row-per-source
    * threshold frame broadcasts back onto the corpus for the keep
    * filter. The corpus never sorts, never shuffles beyond the
    * histogram aggregation; a billion-doc source costs the same
    * window work as a thousand-doc one. (Exact-tie caveat: see
    * [[sourceCaps]] — dedup upstream.)
    *
    * Output: kept documents `(doc_id, source, quality, thr)` with
    * `thr` the source's floor (kept ⇔ quality ≥ thr). */
  def qualityFloor(docs: DataFrame, pctPpm: Long = 250000L,
      groupCol: String = "source"): DataFrame = {
    require(pctPpm >= 0 && pctPpm < 1000000L, "pctPpm in [0, 1e6)")
    val QScale = 1048576.0d
    val scored = docs.select(col("doc_id"), col(groupCol),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("qk", floor(col("quality") * lit(QScale)).cast("long"))
      .localCheckpoint(eager = false) // histogram + pick + keep filter
    val histW = Window.partitionBy(groupCol).orderBy("qk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = scored.groupBy(groupCol, "qk").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(histW))
      .withColumn("base", col("cum") - col("n"))
    // q69's overflow-safe split: r = (n−1)·pct div 10⁶ without the
    // intermediate product ever exceeding ~10¹² per term
    val targets = scored.groupBy(groupCol).agg(count(lit(1)).as("n_grp"))
      .withColumn("r", expr(s"(n_grp - 1) div 1000000 * $pctPpm" +
        s" + ((n_grp - 1) % 1000000) * $pctPpm div 1000000"))
    val picked = hist.join(broadcast(targets), groupCol.toString)
      .filter(col("base") <= col("r") && col("r") < col("cum"))
      .select(col(groupCol), col("qk"), col("base"), col("r"))
    val wB = Window.partitionBy(groupCol, "qk")
      .orderBy(col("quality").asc, col("doc_id"))
    val thr = scored.join(broadcast(picked), Seq(groupCol, "qk"))
      .withColumn("rn",
        col("base") + row_number().over(wB).cast("long") - 1L)
      .filter(col("rn") === col("r"))
      .select(col(groupCol), col("quality").as("thr"))
    scored.join(broadcast(thr), Seq(groupCol))
      .filter(col("quality") >= col("thr"))
      .select(col("doc_id"), col(groupCol), col("quality"), col("thr"))
  }

  def curate(docs: DataFrame, minQuality: Double = 0.0, minTokens: Int = 5,
      jaccardPct: Int = 90): DataFrame = {
    val annotated = docs.select(col("doc_id"), col("text"), col("lang"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.langId(col("text")).as("lang_pred"))
    val quality = annotated
      .filter(col("quality") >= minQuality && col("n_tokens") >= minTokens)
    // exact dedup: keep the smallest doc_id per normalized text; the
    // shuffle key is the 32-byte md5 digest, not the document body
    val keepIds = quality
      .groupBy(Dedup.contentKey(col("text")).as("k"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // the survivor set feeds BOTH the near-dup pair stage (which scans
    // it repeatedly — see Dedup.docShingles) and the final anti-join;
    // a lazy localCheckpoint materializes the annotate→filter→dedup
    // chain once instead of once per consumer
    val exactKept = quality.join(keepIds, "doc_id")
      .localCheckpoint(eager = false)
    // near-dup removal among survivors
    val pairs = Dedup.jaccardPairs(
      exactKept.select("doc_id", "text"), k = 3, pct = jaccardPct)
    val dropped = pairs.select(col("b_id").as("doc_id")).distinct()
    exactKept.join(dropped, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "lang_pred", "n_tokens", "quality")
  }
}
