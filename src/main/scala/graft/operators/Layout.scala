package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: z-order (Morton) clustering keys.
  *
  * Sorting a table by the bit-interleaving of two columns before
  * writing makes every output file cover a NARROW RANGE OF BOTH
  * dimensions, so parquet/Delta min-max file statistics prune scans
  * filtered on either column — the standard multi-dimensional
  * clustering trick for 100 TB tables where you can only sort once
  * but filter on several keys.
  *
  * The key is a statically-unrolled integer expression (16 shifts,
  * masks, adds per column — all inside whole-stage codegen, no UDF)
  * and integer-exact, so the DuckDB oracle reproduces it term for
  * term.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of `a` (even positions)
    * and `b` (odd positions).
    *
    * DOMAIN BOUND: only the low `bits` bits of each column
    * participate — a key outside `[0, 2^bits)` aliases onto the key
    * of its low bits and lands in an unrelated bucket, silently
    * destroying the narrow-range property the layout exists for.
    * Callers must size `bits` to the column's domain (e.g. 21+21 bits
    * still fit a long key for 2-million-value dimensions);
    * [[zorderStats]] surfaces out-of-domain rows as `n_clipped` so a
    * scale-up that outgrows `bits` is visible in the stats rather
    * than silent. */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The file-level statistics a z-ordered layout would produce:
    * bucket rows by `z div 2^bucketShift` (≈ one bucket per output
    * file) and report each bucket's row count and min/max of both
    * dimensions — narrow per-bucket ranges in BOTH columns are what
    * make the layout prunable. One scan, one hash aggregation.
    *
    * `n_clipped` counts rows whose key falls outside `[0, 2^bits)` in
    * either dimension (see the [[zorderKey]] domain bound): a non-zero
    * value means the interleave is aliasing and `bits` must grow —
    * the per-bucket ranges stop being trustworthy exactly then, so
    * the failure mode is reported in-band instead of silently
    * widening a_min/a_max. */
  /** Compaction plan for the small-files problem: within each
    * `partCol` value, walk rows in `ordCol` order, accumulate
    * `sizeCol` bytes, and open a new output file every `targetBytes`
    * — the bin-packing that turns millions of tiny crawl shards into
    * target-sized files (the #1 operational fix on big tables: scan
    * cost is per-file overhead × file count until files reach
    * hundreds of MB). Emits the per-bin summary
    * `(part, bin, n_docs, bytes)` a rewrite job consumes as its
    * work-list (one task per bin → `write.option("maxRecordsPerFile")`
    * or per-bin repartition).
    *
    * Scale shape: ONE hash shuffle on the partition column, then a
    * per-partition ordered cumulative sum (windows parallel across
    * partitions) and a map-side-combinable (part, bin) rollup —
    * integer math, no global sort, no driver state. */
  def compactionBins(df: DataFrame, partCol: String, ordCol: String,
      sizeCol: String, targetBytes: Long): DataFrame =
    binAssignments(df, partCol, ordCol, sizeCol, targetBytes)
      .select(col(partCol).as("part"), col("bin"),
        col(sizeCol).cast("long").as("bytes"))
      .groupBy("part", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("bytes").as("bytes"))

  /** Per-row bin labels behind [[compactionBins]]: the input frame
    * with a `bin` column appended (same window cumsum). Exposed so
    * [[compact]] routes full rows into the exact bins the plan
    * reported — the plan and the rewrite can never disagree. */
  def binAssignments(df: DataFrame, partCol: String, ordCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCol).orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(sizeCol).cast("long")).over(w))
      .withColumn("bin",
        expr(s"(__cum - CAST($sizeCol AS BIGINT)) div ${targetBytes}L"))
      .drop("__cum")
  }

  /** EXECUTE a compaction plan: rewrite `df` under `outPath` as
    * parquet with exactly one file per (part, bin) of
    * [[compactionBins]] — `part`/`bin` become directory partitions,
    * rows inside each file stay in `ordCol` order (so per-file min/max
    * stats on the order column prune like a sorted table).
    *
    * Scale shape: the bin window's hash exchange on `partCol`, then
    * one repartition on (part, bin) so each output file is ONE task's
    * write — a million-bin rewrite is a million parallel tasks, no
    * driver-side file loop. Two bins hashing to the same task still
    * get separate files (dynamic partitioning splits by directory). */
  def compact(df: DataFrame, partCol: String, ordCol: String,
      sizeCol: String, targetBytes: Long, outPath: String): Unit =
    binAssignments(df, partCol, ordCol, sizeCol, targetBytes)
      .repartition(col(partCol), col("bin"))
      .sortWithinPartitions(col(partCol), col("bin"), col(ordCol))
      .write.partitionBy(partCol, "bin").mode("overwrite").parquet(outPath)

  /** Materialize the label-partitioned serving layout for FILTERED
    * vector search (the ss11 serving mode, q67): writes `df` under
    * `outPath` with `labelCol` as a DIRECTORY partition, so a
    * `label = v` predicate on the read side becomes partition
    * PRUNING — the scan lists and reads only the matching stripe,
    * and the query's cost is proportional to the stripe, not the
    * corpus (BucketingSpec proves the pruning; PlanCheck pins
    * `PartitionFilters` on the declared query).
    *
    * Scale shape: ONE hash exchange on (label, salt) — `filesPerLabel`
    * deterministic salts per label so a hot label fans out over
    * several writer tasks instead of serializing into one — then
    * dynamic `partitionBy` emits each label under its own directory.
    * No global sort, no driver-side file loop; a skewed label
    * distribution shows up as directory sizes, not stragglers.
    * Labels must be low-cardinality (directories = distinct labels ×
    * filesPerLabel); for high-cardinality predicates use
    * [[zorderKey]] + file stats instead of directories. */
  /** EXECUTE the z-order layout (q68): rewrite `df` clustered by the
    * Morton interleave of (aCol, bCol) — range-partition on the z
    * key (contiguous key ranges per output file, the property that
    * keeps per-file min/max tight in BOTH dimensions), sort within
    * each range, write `numFiles` parquet files. A box predicate on
    * (a, b) then prunes at the parquet file/row-group stats level:
    * the scan reads only files whose (a, b) ranges intersect the
    * box — the high-cardinality complement of [[partitionByLabel]]'s
    * directory pruning ([[zorderStats]] reports the range tightness
    * the rewrite would produce; BucketingSpec MEASURES files-read
    * against a linearly-laid-out twin).
    *
    * Scale shape: `repartitionByRange` samples the z key and
    * exchanges once into contiguous ranges — parallel, never a
    * single-reducer global sort; each task sorts only its own range
    * and writes one file. No driver-side file loop. */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String,
      outPath: String, bits: Int = 16, numFiles: Int = 16): Unit =
    df.withColumn("__z", zorderKey(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)

  def partitionByLabel(df: DataFrame, labelCol: String, outPath: String,
      filesPerLabel: Int = 1): Unit = {
    val nonLabel = df.columns.filter(_ != labelCol).map(col)
    df.withColumn("__salt", pmod(hash(nonLabel: _*), lit(filesPerLabel)))
      .repartition(col(labelCol), col("__salt"))
      .drop("__salt")
      .write.partitionBy(labelCol).mode("overwrite").parquet(outPath)
  }

  def zorderStats(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 16, bucketShift: Int = 14): DataFrame = {
    val bound = 1L << bits
    df.select(col(aCol).as("a"), col(bCol).as("b"),
        zorderKey(col(aCol), col(bCol), bits).as("z"))
      .withColumn("z_bucket", expr(s"z div ${1L << bucketShift}"))
      .groupBy("z_bucket").agg(count(lit(1)).as("n"),
        min("a").as("a_min"), max("a").as("a_max"),
        min("b").as("b_min"), max("b").as("b_max"),
        sum(when(col("a") < 0 || col("a") >= bound
          || col("b") < 0 || col("b") >= bound, 1L).otherwise(0L))
          .as("n_clipped"))
  }
}
