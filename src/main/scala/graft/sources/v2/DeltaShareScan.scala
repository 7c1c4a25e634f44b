package graft.sources.v2

import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.paths.SparkPath
import org.apache.spark.util.SerializableConfiguration

import graft.sources._

/** ScanBuilder with the full pushdown surface the reference lacks or
  * implements unsoundly (SURVEY.md §2 O9-O13, §4):
  *
  *  - **Filters** (`SupportsPushDownFilters`): split typed — filters
  *    referencing only partition columns are evaluated exactly
  *    client-side against each `FileAction.partitionValues` (the
  *    reference trusts advisory server hints); data filters are
  *    translated to `jsonPredicateHints` for server file pruning AND
  *    handed to the parquet reader for row-group pruning, and are
  *    ALSO returned to Spark as residuals so correctness never
  *    depends on pushdown (the reference consumes all filters and
  *    silently drops untranslatable shapes,
  *    `duck_delta_share_extension.cpp:492`).
  *  - **Columns** (`SupportsPushDownRequiredColumns`): the reference
  *    always reads `SELECT *` (`:578`); here pruning reaches the
  *    parquet scan.
  *  - **Limit** (`SupportsPushDownLimit`): wired to the protocol's
  *    `limitHint` (a dead parameter in the reference,
  *    `delta_sharing_client.cpp:387-389`).
  */
class DeltaShareScanBuilder(
    spark: SparkSession,
    addr: TableAddress,
    meta: TableMetadata,
    tableSchema: StructType,
    hadoopConf: Configuration)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit {

  private val partitionCols = meta.partitionColumns.toSet
  private val partitionSchema = StructType(
    meta.partitionColumns.flatMap(c => tableSchema.fields.find(_.name == c)))
  private val dataSchema = StructType(
    tableSchema.fields.filterNot(f => partitionCols.contains(f.name)))

  private var requiredSchema: StructType = tableSchema
  private var partitionFilters: Array[Filter] = Array.empty
  private var dataFilters: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pf, df) = filters.partition(
      PartitionValues.isPartitionOnly(_, partitionCols))
    partitionFilters = pf
    dataFilters = df
    // Partition filters whose shape the client-side evaluator decides
    // for every possible value (PartitionValues.isExact) are fully
    // applied by file pruning; every other partition filter is
    // returned as a residual so Spark re-evaluates it above the scan —
    // claiming an undecidable shape as applied would return wrong
    // rows. Data filters reach parquet row-group stats but are inexact
    // there, so they are always residuals.
    val inexactPartitionFilters =
      pf.filterNot(PartitionValues.isExact(_, partitionSchema))
    df ++ inexactPartitionFilters
  }

  override def pushedFilters(): Array[Filter] =
    partitionFilters ++ dataFilters

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = new DeltaShareScan(
    spark, addr, meta, dataSchema, partitionSchema, requiredSchema,
    partitionFilters, dataFilters, limit, hadoopConf)
}

/** Batch scan: one `InputPartition` per shared file — Spark
  * parallelizes what the reference streams serially
  * (`duck_delta_share_extension.cpp:569-575`). The `/query` POST
  * happens once on the driver at planning time; executors then pull
  * presigned URLs directly. */
class DeltaShareScan(
    spark: SparkSession,
    addr: TableAddress,
    meta: TableMetadata,
    dataSchema: StructType,
    partitionSchema: StructType,
    requiredSchema: StructType,
    partitionFilters: Array[Filter],
    dataFilters: Array[Filter],
    limit: Option[Int],
    hadoopConf: Configuration) extends Scan with Batch
  with SupportsReportStatistics with SupportsRuntimeFiltering {

  private val partitionColNames = partitionSchema.fieldNames.toSet

  /** Runtime (DPP) filters pushed after planning starts — Spark sends
    * these for joins on partition columns; they prune the file list
    * exactly like static partition filters. */
  private var runtimeFilters: Array[Filter] = Array.empty
  private val requiredDataSchema = StructType(
    requiredSchema.fields.filterNot(f => partitionColNames.contains(f.name)))
  private val requiredPartitionSchema = StructType(
    requiredSchema.fields.filter(f => partitionColNames.contains(f.name)))

  /** Reader output order: required data columns then required
    * partition columns (what the parquet reader closure emits). */
  override def readSchema(): StructType =
    StructType(requiredDataSchema.fields ++ requiredPartitionSchema.fields)

  override def toBatch: Batch = this

  override def description(): String =
    s"DeltaShareScan ${addr.share}.${addr.schema}.${addr.table} " +
      s"[files pruned by ${partitionFilters.length} partition filter(s), " +
      s"hints from ${dataFilters.length} data filter(s), limit=$limit]"

  private lazy val jsonHints: Option[String] = PredicateHints.buildHints(
    (partitionFilters ++ dataFilters).toSeq,
    StructType(dataSchema.fields ++ partitionSchema.fields))._1

  /** Legacy SQL-string `predicateHints` — older servers prune on these
    * only (the reference always sends the field,
    * `delta_sharing_client.cpp:381-384`). */
  private lazy val legacyHints: Seq[String] = PredicateHints.legacyHints(
    partitionFilters.toSeq, partitionSchema)

  /** Everything an executor needs to re-issue this scan's `/query`
    * when a presigned URL expires mid-task. */
  private def refreshSpec = PresignedUrlCache.RefreshSpec(
    addr.profile, addr.share, addr.schema, addr.table,
    jsonHints, legacyHints, limit.map(_.toLong), addr.versionAsOf)

  /** One `/query` POST per scan, memoized — statistics estimation and
    * partition planning share it. */
  private lazy val queriedFiles: Seq[graft.sources.FileAction] = {
    val client = new DeltaSharingClient(addr.profile)
    val resp = client.queryTable(addr.share, addr.schema, addr.table,
      jsonPredicateHints = jsonHints, predicateHints = legacyHints,
      limitHint = limit.map(_.toLong), version = addr.versionAsOf)
    // Time travel: the plan's schema came from head-version metadata;
    // if the requested version's metaData line disagrees, reading its
    // files with the newer schema would silently mis-decode — fail
    // loudly instead (schema evolution across shared versions is out
    // of scope, as in the reference).
    if (addr.versionAsOf.isDefined && resp.metadata.schemaString.nonEmpty &&
        meta.schemaString.nonEmpty &&
        resp.metadata.schemaString != meta.schemaString)
      throw new DeltaSharingException(0,
        s"table ${addr.share}.${addr.schema}.${addr.table} at version " +
          s"${addr.versionAsOf.get} has a different schema than the " +
          "current version; reading across schema changes is not supported")
    resp.files
  }

  /** Exact client-side partition pruning (static + runtime filters) —
    * hints are advisory per the Delta Sharing spec, so never trust the
    * server's file list alone. */
  private def prunedFiles: Seq[graft.sources.FileAction] =
    queriedFiles.filter { f =>
      (partitionFilters ++ runtimeFilters).forall(
        PartitionValues.evalFilter(_, f.partitionValues, partitionSchema))
    }

  // ---- SupportsRuntimeFiltering (dynamic partition pruning) --------

  override def filterAttributes(): Array[NamedReference] =
    partitionSchema.fieldNames.map(Expressions.column)

  override def filter(filters: Array[Filter]): Unit =
    runtimeFilters = filters.filter(
      PartitionValues.isPartitionOnly(_, partitionColNames))

  // ---- SupportsReportStatistics ------------------------------------

  /** Post-pruning size/row estimates so Catalyst can pick broadcast
    * joins over shared tables. Row counts come from the per-file
    * `stats.numRecords` the server sends (when present on all kept
    * files). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val files = prunedFiles
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(_.size).sum)
    override def numRows(): OptionalLong = {
      val counts = files.map(_.stats.flatMap(parseNumRecords))
      if (counts.nonEmpty && counts.forall(_.isDefined))
        OptionalLong.of(counts.flatten.sum)
      else OptionalLong.empty()
    }
  }

  private def parseNumRecords(stats: String): Option[Long] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(stats)
      if (node.hasNonNull("numRecords")) Some(node.get("numRecords").asLong())
      else None
    } catch { case _: Exception => None }

  override def planInputPartitions(): Array[InputPartition] = {
    prunedFiles.map { f =>
      val presigned =
        f.url.startsWith("http://") || f.url.startsWith("https://")
      val path =
        if (presigned)
          PresignedUrlFileSystem.encode(PresignedUrlCache.fileId(f), f.size)
        else f.url
      DeltaShareInputPartition(path, f.size, f.partitionValues,
        fileId = if (presigned) PresignedUrlCache.fileId(f) else "",
        url = if (presigned) f.url else "")
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Build Spark's own parquet reader closure (vectorized decode,
    // row-group pruning from pushed data filters, partition-column
    // append) — it is designed to be serialized to executors. Only the
    // REQUIRED partition columns are appended: the reader's output
    // must line up ordinally with readSchema() (requiredDataSchema ++
    // requiredPartitionSchema), so passing the full partitionSchema
    // here would misalign any query projecting a subset of ≥2
    // partition columns.
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = dataSchema,
      partitionSchema = requiredPartitionSchema,
      requiredSchema = requiredDataSchema,
      filters = dataFilters.toSeq,
      options = Map(
        "returning_batch" -> "false",
        "mergeSchema" -> "false"),
      hadoopConf = hadoopConf)
    DeltaSharePartitionReaderFactory(readFunc, requiredPartitionSchema,
      new SerializableConfiguration(hadoopConf), refreshSpec)
  }
}

final case class DeltaShareInputPartition(
    path: String,
    size: Long,
    partitionValues: Map[String, String],
    fileId: String,
    url: String) extends InputPartition

final case class DeltaSharePartitionReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    partitionSchema: StructType,
    conf: SerializableConfiguration,
    refreshSpec: PresignedUrlCache.RefreshSpec) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DeltaShareInputPartition]
    // Executor-side id→URL registration: the graftds path carries only
    // an opaque file id (presigned URLs must not leak into paths/UI);
    // registerIfAbsent so a task retry never clobbers a URL an expiry
    // refresh already renewed.
    if (p.fileId.nonEmpty)
      PresignedUrlCache.register(p.fileId, p.url, refreshSpec)
    val pf = PartitionedFile(
      partitionValues =
        PartitionValues.toInternalRow(p.partitionValues, partitionSchema),
      filePath = SparkPath.fromUrlString(p.path),
      start = 0L,
      length = p.size,
      locations = Array.empty,
      modificationTime = 0L,
      fileSize = p.size,
      otherConstantMetadataColumnValues = Map.empty)
    // the parquet closure may emit ColumnarBatch disguised as
    // InternalRow (vectorized path); flatten to rows for DSv2
    import scala.jdk.CollectionConverters._
    val rows: Iterator[InternalRow] =
      readFunc(pf).asInstanceOf[Iterator[Any]].flatMap {
        case b: ColumnarBatch => b.rowIterator().asScala
        case row: InternalRow => Iterator.single(row)
      }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
