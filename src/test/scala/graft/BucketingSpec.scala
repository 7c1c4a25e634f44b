package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** Scale techniques that need their own session state: bucketed
  * co-located joins (no Exchange at all) and SQL functions injected
  * via SparkSessionExtensions.
  *
  * Needs an isolated SparkSession (different conf + extensions), so
  * it materializes the shared test session first, builds its own on
  * the same SparkContext, and restores the shared one as
  * default/active afterwards.
  */
class BucketingSpec extends AnyFunSuite
  with org.scalatest.BeforeAndAfterAll {

  private lazy val base = SparkTestSession.spark

  override def beforeAll(): Unit = { base; () }
  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
  }

  private lazy val spark: SparkSession = {
    base // ensure the shared session exists before we take over
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("label-partitioned layout serves filtered vector search via partition pruning") {
    // the ss11 scale path made concrete: the corpus written
    // partitionBy(label) turns the metadata predicate into DIRECTORY
    // pruning — the scan plans only the matching stripe — and the
    // filtered top-k over the pruned read equals the row-filter answer
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dirPath = java.nio.file.Files.createTempDirectory("graft-label-part")
    val dir = dirPath.toString
    try {
      graft.operators.Layout.partitionByLabel(embs, "label", dir,
        filesPerLabel = 2)
      val pruned = spark.read.parquet(dir).filter(col("label") === 3)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("label"),
        s"label not a partition filter:\n$plan")
      // the salt fans each label stripe over filesPerLabel writers
      val stripe = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("label=3")).head
      assert(stripe.listFiles().count(_.getName.endsWith(".parquet")) == 2)
      val queries = embs.filter(col("vec_id") < 3)
      val viaLayout = graft.operators.Similarity
        .bruteForceTopK(pruned, queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
      val viaRowFilter = graft.operators.Similarity
        .bruteForceTopK(embs.filter(col("label") === 3), queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(viaLayout == viaRowFilter && viaLayout.nonEmpty)
    } finally {
      // temp layouts must not accumulate across test runs
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("z-order layout keeps per-file boxes prunable where a linear layout cannot") {
    // the q68 scale claim MEASURED from the written files: cluster
    // lineitem by the Morton interleave of (l_partkey, l_suppkey) vs
    // a linear l_orderkey layout of the same rows, then compute each
    // FILE's (partkey, suppkey) min/max box — exactly the stats a
    // skipping layer (Delta data skipping, parquet row-group pruning)
    // consults. Under the z-order layout a tight box predicate must
    // intersect strictly fewer file boxes. (Spark itself prunes
    // parquet ROW GROUPS with these stats inside the reader; file
    // listing is stats-blind, so the property is asserted on the
    // stats themselves, not on a planner metric.)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity", "l_orderkey")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder")
    val linDir = java.nio.file.Files.createTempDirectory("graft-linear")
    try {
      graft.operators.Layout.zorderWrite(li, "l_partkey", "l_suppkey",
        zDir.toString, bits = 16, numFiles = 16)
      li.repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(linDir.toString)
      def intersectingFiles(dir: String): Int = {
        val boxes = spark.read.parquet(dir)
          .withColumn("__file", input_file_name())
          .groupBy("__file")
          .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
            min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
          .collect()
        assert(boxes.length == 16, s"expected 16 files in $dir")
        boxes.count { r =>
          r.getLong(1) <= 40 && r.getLong(2) >= 10 &&
            r.getLong(3) <= 12 && r.getLong(4) >= 2
        }
      }
      val (zHit, linHit) = (intersectingFiles(zDir.toString),
        intersectingFiles(linDir.toString))
      assert(zHit < linHit,
        s"box intersects $zHit z-order files vs $linHit linear — " +
          "clustering bought no pruning")
      // and the rewrite is lossless: both layouts answer identically
      def answer(dir: String) = spark.read.parquet(dir)
        .filter(col("l_partkey").between(10, 40) &&
          col("l_suppkey").between(2, 12))
        .groupBy("l_partkey", "l_suppkey").count()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(answer(zDir.toString) == answer(linDir.toString))
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(zDir, linDir).foreach { d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("bucketed tables join without any exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // a fresh in-memory catalog doesn't know about leftover warehouse
    // dirs from previous runs — remove them before CTAS
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: the join itself needs no shuffle — the only
    // allowed Exchange is the final tiny aggregation
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")

    // and it is correct
    val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = joined.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == bucketed)
  }

  test("extension-injected SQL functions resolve") {
    val r = spark.sql(
      "SELECT poly_hash('abc') AS h, simhash30('the fast key') AS s," +
        " vec_dot(array(cast(1.0 as float), cast(2.0 as float))," +
        "         array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .collect()(0)
    assert(r.getLong(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(r.getLong(1) != 0L)
    assert(r.getDouble(2) == 11.0)
  }

  test("parameterized SQL functions take k as a literal, reject columns") {
    val r = spark.sql(
      "SELECT size(shingle_fps('a b c d', 3)) AS n_sh," +
        " size(gram_fps('a b c d', 2)) AS n_g," +
        " size(minhash_sig(shingle_fps('a b c d', 3), 16)) AS n_sig," +
        " size(hashed_bow('a b a', 8)) AS n_bow").collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 3)
    assert(r.getInt(2) == 16 && r.getInt(3) == 8)
    // the size parameters shape generated code — a column there has no
    // plan-time value and must fail loudly, not silently misplan
    val e = intercept[Exception] {
      spark.sql("SELECT gram_fps(t, n) FROM (SELECT 'a b' AS t, 2 AS n)")
        .collect()
    }
    assert(e.getMessage.contains("INTEGER LITERAL"),
      s"unexpected: ${e.getMessage}")
  }
}
