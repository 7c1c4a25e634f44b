package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The third scheduled OFFLINE maintenance event for the written
  * layouts, completing the executor trilogy — stats refresh
  * ([[Similarity.sq8StatsRefresh]], ss27), centroid retrain
  * ([[Similarity.knnCentroidRetrain]], ss28), and THIS: small-file
  * compaction. Streaming appends ([[Similarity.homeRowsAgainst]] /
  * `sq8RowsAgainst` / `pqRowsAgainst` foreachBatch,
  * [[Retrieval.bm25LayoutAppend]]) add one file per partition per
  * micro-batch by design; left alone, a long-lived layout's listing
  * and open-file cost grows with ingest batches, not data. Compaction
  * rewrites ONLY the fragmented partitions (file count above
  * `maxFiles`) back to one file each — the partition-grain rewrite
  * discipline of the CDF folds, applied to file geometry instead of
  * membership. Untouched partitions keep their files byte-for-byte;
  * rows are unchanged, so serving through the compacted layout is
  * bit-identical (both pinned in GuardrailsSpec).
  *
  * Scale shape: the driver holds one (partition value, file count)
  * pair per partition directory (≤ numCentroids / buckets+1 entries —
  * broadcastable by the same argument as the CDF folds' touched
  * sets); only the fragmented partitions' rows re-materialize (an
  * eager checkpoint severs them from the files being replaced), one
  * narrow repartition-by-key lands each partition in exactly one
  * task → one output file.
  */
object LayoutMaintenance {

  /** Per-partition file census of a partitioned layout directory:
    * `(partition value, parquet file count)` — the fragmentation
    * monitor that schedules [[compact]], driver-side because the
    * listing is ≤ one entry per partition directory. */
  def fileCensus(spark: SparkSession, path: String,
      partCol: String): Seq[(Long, Int)] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(partCol + "="))
      .map { d =>
        val v = d.getPath.getName.drop(partCol.length + 1).toLong
        val n = fs.listStatus(d.getPath)
          .count(f => f.getPath.getName.endsWith(".parquet"))
        (v, n)
      }
      .sortBy(_._1)
  }

  /** Compact every partition of `path` whose parquet-file count
    * exceeds `maxFiles` down to one file, leaving the rest untouched.
    * Rows are preserved exactly — this moves bytes between files,
    * never between partitions. */
  def compact(spark: SparkSession, path: String, partCol: String,
      maxFiles: Int = 1): Unit = {
    val frag = fileCensus(spark, path, partCol)
      .collect { case (v, n) if n > maxFiles => v }
    if (frag.nonEmpty) {
      val fragLit = frag.sorted.map(lit)
      // the fragmented partitions' rows ONLY, severed (eagerly) from
      // the files the dynamic overwrite is about to replace
      val rows = spark.read.parquet(path)
        .filter(col(partCol).isin(fragLit: _*))
        .localCheckpoint(eager = true)
      rows.repartition(col(partCol))
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).mode("overwrite").parquet(path)
    }
  }

  /** Compact a full [[Retrieval.bm25IndexWrite]] layout: the `bkt=`
    * postings, the `_fwd` doc-bucket copy, and the `_docs` census
    * each at their own partition grain. */
  def compactBm25(spark: SparkSession, layoutPath: String,
      maxFiles: Int = 1): Unit = {
    compact(spark, layoutPath, "bkt", maxFiles)
    compact(spark, layoutPath + "_fwd", "dbkt", maxFiles)
    compact(spark, layoutPath + "_docs", "dbkt", maxFiles)
  }
}
