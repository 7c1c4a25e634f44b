package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.testing.StubSharingServer

/** End-to-end DSv2 connector tests against the stub sharing server:
  * metadata-driven schema, partition-column materialization, pruning,
  * pushdown plumbing, and the ranged-HTTP presigned-URL read path. */
class DeltaShareConnectorSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  private var server: StubSharingServer = _
  private var tmpDir: java.nio.file.Path = _
  private var expectedCount: Long = 0
  private var flagACount: Long = 0

  override def beforeAll(): Unit = {
    server = new StubSharingServer(expectedToken = "tok").start()
    tmpDir = Files.createTempDirectory("graft-share")
    // write lineitem partitioned by l_returnflag: part files do NOT
    // contain the partition column — the connector must re-attach it
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    expectedCount = li.count()
    flagACount = li.filter(col("l_returnflag") === "A").count()
    li.write.partitionBy("l_returnflag").mode("overwrite")
      .parquet(tmpDir.toString)

    val fullSchema = li.schema.json
    val files = Seq.newBuilder[(String, Long, Map[String, String])]
    graft.sources.testing.DirWalk.eachChild(tmpDir) { d =>
      val name = d.getFileName.toString
      if (name.startsWith("l_returnflag=")) {
        val flag = name.stripPrefix("l_returnflag=")
        graft.sources.testing.DirWalk.eachChild(d) { f =>
          if (f.getFileName.toString.endsWith(".parquet"))
            files += ((f.toUri.toString, Files.size(f),
              Map("l_returnflag" -> flag)))
        }
      }
    }
    server.tables = Map(
      "lineitem" -> (fullSchema, Seq("l_returnflag"), files.result()),
      // the SAME table served in delta responseformat — reads must be
      // indistinguishable from the parquet-responseformat twin
      "lineitem_delta" -> (fullSchema, Seq("l_returnflag"), files.result()))
    server.deltaFormatTables = Set("lineitem_delta")
  }

  override def afterAll(): Unit = server.stop()

  private def read() =
    spark.read.format("deltashare")
      .option("endpoint", server.endpoint)
      .option("bearerToken", "tok")
      .option("share", "share1")
      .option("schema", "schema1")
      .option("table", "lineitem")
      .load()

  test("full scan matches direct parquet read, partition col attached") {
    val df = read()
    assert(df.count() == expectedCount)
    assert(df.schema.fieldNames.contains("l_returnflag"))
    val flags = df.select("l_returnflag").distinct().collect()
      .map(_.getString(0)).sorted
    assert(flags.sameElements(Array("A", "N", "R")))
  }

  test("delta responseformat table reads end-to-end like the parquet twin") {
    val delta = spark.read.format("deltashare")
      .option("endpoint", server.endpoint)
      .option("bearerToken", "tok")
      .option("share", "share1").option("schema", "schema1")
      .option("table", "lineitem_delta")
      .load()
    val parquetFmt = read()
    assert(delta.schema == parquetFmt.schema)
    assert(delta.count() == expectedCount)
    // identical row multiset through the other wire shape
    assert(delta.exceptAll(parquetFmt).isEmpty)
    assert(parquetFmt.exceptAll(delta).isEmpty)
    // partition pruning still works through the delta envelope
    assert(delta.filter(col("l_returnflag") === "A").count() == flagACount)
  }

  test("load(\"share.schema.table\") addressing works") {
    val df = spark.read.format("deltashare")
      .option("endpoint", server.endpoint)
      .option("bearerToken", "tok")
      .load("share1.schema1.lineitem")
    assert(df.count() == expectedCount)
  }

  test("values survive the round trip exactly") {
    val direct = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val shared = read()
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(direct == shared)
  }

  test("partition filter prunes files and sends hints") {
    val df = read().filter(col("l_returnflag") === "A")
    assert(df.count() == flagACount)
    assert(server.lastQueryBody.contains("jsonPredicateHints"))
    assert(server.lastQueryBody.contains("l_returnflag"))
    // physical plan should carry only the pruned partition count
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("BatchScan") || scanDesc.contains("DeltaShare"))
  }

  test("projection + data filter pushdown stay correct") {
    val df = read()
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val expected = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    assert(df.count() == expected.count())
    assert(df.schema.fieldNames.toSeq == Seq("l_orderkey", "l_quantity"))
  }

  test("limit pushes a limitHint to the server") {
    read().limit(5).collect()
    assert(server.lastQueryBody.contains(""""limitHint":5"""))
  }

  test("versionAsOf option reaches the /query POST body") {
    spark.read.format("deltashare")
      .option("endpoint", server.endpoint)
      .option("bearerToken", "tok")
      .option("versionAsOf", "3")
      .load("share1.schema1.lineitem")
      .count()
    assert(server.lastQueryBody.contains(""""version":3"""))
  }

  test("timestampAsOf option reaches the /query POST body") {
    spark.read.format("deltashare")
      .option("endpoint", server.endpoint)
      .option("bearerToken", "tok")
      .option("timestampAsOf", "2025-01-01T00:00:00Z")
      .load("share1.schema1.lineitem")
      .count()
    assert(server.lastQueryBody.contains(
      """"timestamp":"2025-01-01T00:00:00Z""""))
    assert(!server.lastQueryBody.contains(""""version""""))
  }

  test("versionAsOf and timestampAsOf together are rejected") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("deltashare")
        .option("endpoint", server.endpoint)
        .option("bearerToken", "tok")
        .option("versionAsOf", "3")
        .option("timestampAsOf", "2025-01-01T00:00:00Z")
        .load("share1.schema1.lineitem")
        .count()
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("expired presigned url surfaces a clear HTTP failure") {
    // stub has no file registered under this name → 404, standing in
    // for an expired/revoked presigned URL
    val ordersSchema = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet").schema.json
    server.tables = server.tables + ("gone" -> ((ordersSchema, Seq.empty,
      Seq((s"http://127.0.0.1:${server.port}/files/nope.parquet",
        1234L, Map.empty[String, String])))))
    val e = intercept[Exception] {
      spark.read.format("deltashare")
        .option("endpoint", server.endpoint).option("bearerToken", "tok")
        .load("share1.schema1.gone")
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("HTTP 404") ||
      m.contains("nope.parquet")), s"unhelpful error: ${messages(e)}")
  }

  test("two partition columns: projecting only the later one stays aligned") {
    // regression: building the reader with the FULL partition schema
    // while readSchema() declares only the required subset misaligns
    // ordinals when a query projects a strict subset of ≥2 partition
    // columns
    val dir = Files.createTempDirectory("graft-share-2pc")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus")
    li.write.partitionBy("l_returnflag", "l_linestatus").mode("overwrite")
      .parquet(dir.toString)
    val files = Seq.newBuilder[(String, Long, Map[String, String])]
    graft.sources.testing.DirWalk.eachChild(dir) { d1 =>
      val n1 = d1.getFileName.toString
      if (n1.startsWith("l_returnflag=")) graft.sources.testing.DirWalk.eachChild(d1) { d2 =>
        val n2 = d2.getFileName.toString
        if (n2.startsWith("l_linestatus=")) graft.sources.testing.DirWalk.eachChild(d2) { f =>
          if (f.getFileName.toString.endsWith(".parquet"))
            files += ((f.toUri.toString, Files.size(f), Map(
              "l_returnflag" -> n1.stripPrefix("l_returnflag="),
              "l_linestatus" -> n2.stripPrefix("l_linestatus="))))
        }
      }
    }
    server.tables = server.tables + ("li2pc" -> ((li.schema.json,
      Seq("l_returnflag", "l_linestatus"), files.result())))
    val shared = spark.read.format("deltashare")
      .option("endpoint", server.endpoint).option("bearerToken", "tok")
      .load("share1.schema1.li2pc")
      // project ONLY the second partition column (plus one data col)
      .groupBy("l_linestatus").agg(sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val direct = li.groupBy("l_linestatus").agg(sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(shared == direct)
    // and first-only projection too
    val sharedFlags = spark.read.format("deltashare")
      .option("endpoint", server.endpoint).option("bearerToken", "tok")
      .load("share1.schema1.li2pc")
      .select("l_returnflag").distinct().collect().map(_.getString(0)).sorted
    assert(sharedFlags.sameElements(Array("A", "N", "R")))
  }

  test("undecidable partition filter shapes return correct rows (residual)") {
    // <=> on a partition column: the client evaluator handles it
    // exactly now, but the residual contract is what guarantees
    // correctness for any shape — compare against the direct read
    val df = read().filter(col("l_returnflag") <=> "A")
    assert(df.count() == flagACount)
    val df2 = read().filter(not(col("l_returnflag").endsWith("A")))
    val direct2 = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(not(col("l_returnflag").endsWith("A"))).count()
    assert(df2.count() == direct2)
  }

  test("presigned url that expired between planning and read heals mid-scan") {
    val src = Paths.get("/root/testdata/sf0.001/customer.parquet")
    val expServer = new StubSharingServer(expectedToken = "tok").start()
    try {
      expServer.httpFiles = Map("customer.parquet" -> src)
      expServer.expireFirstQueryUrls = true // first /query signs stale URLs
      val schema = spark.read.parquet(src.toString).schema.json
      expServer.tables = Map("customer" -> ((schema, Seq.empty,
        Seq((s"http://127.0.0.1:${expServer.port}/files/customer.parquet",
          Files.size(src), Map.empty[String, String])))))
      // collect, not count(): a COUNT would first probe the aggregate
      // fast path (its own /query POST), consuming the stale-signed
      // response this test needs the ROW scan to receive
      val n = spark.read.format("deltashare")
        .option("endpoint", expServer.endpoint).option("bearerToken", "tok")
        .load("share1.schema1.customer")
        .select("c_custkey").collect().length
      assert(n == spark.read.parquet(src.toString).count())
    } finally expServer.stop()
  }

  test("presigned url that lapses mid-scan (after the footer reads) heals") {
    // SURVEY risk #4: a multi-hour scan outlives the URL TTL. The
    // stale signature serves the first 2 requests (the parquet footer
    // reads), then 403s — so the expiry fires in the MIDDLE of an
    // in-progress task, and the reader must re-POST /query and resume
    // without failing the task.
    val src = Paths.get("/root/testdata/sf0.001/orders.parquet")
    val expServer = new StubSharingServer(expectedToken = "tok").start()
    try {
      expServer.httpFiles = Map("orders.parquet" -> src)
      expServer.expireFirstQueryUrls = true
      expServer.staleRequestBudget.set(2)
      val schema = spark.read.parquet(src.toString).schema.json
      expServer.tables = Map("orders" -> ((schema, Seq.empty,
        Seq((s"http://127.0.0.1:${expServer.port}/files/orders.parquet",
          Files.size(src), Map.empty[String, String])))))
      val df = spark.read.format("deltashare")
        .option("endpoint", expServer.endpoint).option("bearerToken", "tok")
        .load("share1.schema1.orders")
      val total = df.agg(sum("o_totalprice")).collect()(0).getDouble(0)
      val direct = spark.read.parquet(src.toString)
        .agg(sum("o_totalprice")).collect()(0).getDouble(0)
      assert(math.abs(total - direct) < 1e-6)
      assert(expServer.staleRequestBudget.get() <= 0,
        "stale URL never served the early reads — expiry was not mid-scan")
      assert(expServer.queryPosts >= 2,
        "no /query re-POST — the reader did not refresh")
    } finally expServer.stop()
  }

  test("graftds paths and read errors never leak the signed query string") {
    val p = PresignedUrlFileSystem.encode("file-id-1", 123L)
    assert(!p.contains("sig=") && !p.contains("http"))
    assert(PresignedUrlFileSystem.decode(new org.apache.hadoop.fs.Path(p)) ==
      ("file-id-1", 123L))
    assert(PresignedUrlFileSystem.redact(
      "https://bucket/obj.parquet?X-Amz-Signature=secret") ==
      "https://bucket/obj.parquet")
  }

  /** A 2-file shared table (o_orderkey split at the median) with true
    * per-file stats, plus a third all-null-free file-less edge via the
    * same server — fixture for data skipping + stats-only aggregates. */
  private def statsFixture(): (StubSharingServer, Long, Long, Long) = {
    val src = Paths.get("/root/testdata/sf0.001/orders.parquet")
    val orders = spark.read.parquet(src.toString)
    val total = orders.count()
    val mid = 750L
    val st = new StubSharingServer(expectedToken = "tok").start()
    val tmp = Files.createTempDirectory("graft-stats-skip")
    val statsB = Map.newBuilder[String, String]
    val files = Seq(("lo", col("o_orderkey") < mid),
      ("hi", col("o_orderkey") >= mid)).map { case (name, pred) =>
      val part = orders.filter(pred)
      val pdir = tmp.resolve(name)
      part.coalesce(1).write.mode("overwrite").parquet(pdir.toString)
      var p: java.nio.file.Path = null
      graft.sources.testing.DirWalk.eachChild(pdir)(f =>
        if (f.getFileName.toString.endsWith(".parquet")) p = f)
      val r = part.agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"))
        .collect()(0)
      statsB += p.toUri.toString -> FileStats.statsJson("o_orderkey",
        r.getLong(0), r.getLong(1), r.getLong(2))
      (p.toUri.toString, Files.size(p), Map.empty[String, String])
    }
    st.tables = Map("orders2" -> ((orders.schema.json, Seq.empty, files)))
    st.fileStats = statsB.result()
    val loCount = orders.filter(col("o_orderkey") < mid).count()
    (st, total, mid, loCount)
  }

  private def readFrom(st: StubSharingServer, table: String) =
    spark.read.format("deltashare")
      .option("endpoint", st.endpoint).option("bearerToken", "tok")
      .load(s"share1.schema1.$table")

  test("min/max stats skip files a data filter cannot match") {
    val (st, total, mid, loCount) = statsFixture()
    try {
      val df = readFrom(st, "orders2")
      // both files planned without a filter
      assert(df.rdd.getNumPartitions == 2)
      // range predicate below the split point → only the lo file opens
      val lo = df.filter(col("o_orderkey") < mid)
      assert(lo.rdd.getNumPartitions == 1,
        s"expected 1 surviving file, got ${lo.rdd.getNumPartitions}")
      assert(lo.count() == loCount)
      // provably-empty range → zero files, zero rows, no error
      val none = df.filter(col("o_orderkey") < 0)
      assert(none.rdd.getNumPartitions == 0)
      assert(none.collect().isEmpty)
      // IN entirely above every max → zero files
      val in = df.filter(col("o_orderkey").isin(99999999L))
      assert(in.rdd.getNumPartitions == 0)
      // skipping is conservative: an unstated column prunes nothing
      val other = df.filter(col("o_custkey") === -1)
      assert(other.rdd.getNumPartitions == 2 && other.count() == 0)
    } finally st.stop()
  }

  test("TopN pushdown prunes files outside the top-k boundary, " +
      "rows stay exactly the true top-k") {
    val (st, total, mid, loCount) = statsFixture()
    try {
      val df = readFrom(st, "orders2")
      def scanFiles(d: org.apache.spark.sql.DataFrame): Int = {
        d.write.format("noop").mode("overwrite").save()
        d.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.partitions.flatten.size
        }.sum
      }
      // ASC top-5: the lo file's rows guarantee the hi file out
      val asc = df.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").limit(5)
      assert(scanFiles(asc) == 1, "ASC top-5 must open only the lo file")
      assert(asc.queryExecution.executedPlan.toString
        .contains("pushedTopN=o_orderkey ASC n=5"))
      val direct = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(5)
      assert(asc.collect().toSeq == direct.collect().toSeq)
      // DESC: only the hi file
      val desc = df.select("o_orderkey").orderBy(col("o_orderkey").desc)
        .limit(5)
      assert(scanFiles(desc) == 1, "DESC top-5 must open only the hi file")
      // n larger than the lo file's rows: both files must open
      val wide = df.select("o_orderkey").orderBy("o_orderkey")
        .limit(loCount.toInt + 5)
      assert(scanFiles(wide) == 2)
      assert(wide.count() == loCount + 5)
      // a residual data filter refuses the topN prune (both files):
      // the guarantee would count rows the filter removes
      val filtered = df.filter(col("o_totalprice") > 0)
        .select("o_orderkey").orderBy("o_orderkey").limit(5)
      assert(scanFiles(filtered) == 2,
        "topN prune must refuse under a residual data filter")
    } finally st.stop()
  }

  test("offset pushdown skips whole files at the file level, partial " +
      "skips are exact, and residual filters refuse the pushdown") {
    val (st, total, mid, loCount) = statsFixture()
    try {
      val df = readFrom(st, "orders2")
      def scanFiles(d: org.apache.spark.sql.DataFrame): Int = {
        d.write.format("noop").mode("overwrite").save()
        d.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.partitions.flatten.size
        }.sum
      }
      val direct = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
      // whole-file skip: offset = the lo file's exact row count — the
      // lo file is never planned, the Offset operator is gone, and
      // the rows are exactly the hi file's
      val whole = df.offset(loCount.toInt).select("o_orderkey")
      assert(scanFiles(whole) == 1,
        "offset equal to the lo file must plan only the hi file")
      val wplan = whole.queryExecution.executedPlan.toString
      assert(wplan.contains(s"pushedOffset=$loCount"),
        s"offset not pushed:\n$wplan")
      assert(!wplan.contains("GlobalLimitAndOffset") &&
        !wplan.contains("Offset ("), "Offset operator survived a " +
        s"complete pushdown:\n$wplan")
      assert(whole.collect().map(_.getLong(0)).sorted.toSeq ==
        direct.filter(col("o_orderkey") >= mid)
          .collect().map(_.getLong(0)).sorted.toSeq)
      // partial skip: the boundary file's reader drops its leading
      // rows IN FILE ORDER — result = lo file minus its first 3 rows,
      // plus all of hi
      val loUrl = st.tables("orders2")._3.head._1
      val loInOrder = spark.read.parquet(loUrl)
        .select("o_orderkey").collect().map(_.getLong(0)).toSeq
      val part = df.offset(3).select("o_orderkey")
      assert(scanFiles(part) == 2)
      assert(part.queryExecution.executedPlan.toString
        .contains("pushedOffset=3"))
      val expect = (loInOrder.drop(3) ++
        direct.filter(col("o_orderkey") >= mid)
          .collect().map(_.getLong(0)).toSeq).sorted
      assert(part.collect().map(_.getLong(0)).sorted.toSeq == expect)
      // offset past the table: zero planned files, zero rows
      val past = df.offset(total.toInt + 10).select("o_orderkey")
      assert(scanFiles(past) == 0)
      assert(past.collect().isEmpty)
      // a residual data filter refuses the pushdown (offset applies
      // AFTER filters): Spark keeps the Offset and rows stay right
      val filtered = df.filter(col("o_totalprice") > 0)
        .offset(5).select("o_orderkey")
      assert(!filtered.queryExecution.executedPlan.toString
        .contains("pushedOffset"),
        "offset must refuse under a residual data filter")
      assert(filtered.count() == total - 5)
      // offset composes with a limit pushed above it: the scan skips,
      // Spark re-applies the limit (limitHint covers offset+limit)
      val both = df.offset(loCount.toInt).limit(5).select("o_orderkey")
      assert(both.count() == 5)
      assert(both.collect().map(_.getLong(0)).forall(_ >= mid))
    } finally st.stop()
  }

  test("COUNT/MIN/MAX answer from stats as a LocalTableScan, zero reads") {
    val (st, total, mid, _) = statsFixture()
    try {
      val agg = readFrom(st, "orders2")
        .agg(count(lit(1)).as("n"), min("o_orderkey").as("mn"),
          max("o_orderkey").as("mx"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan"),
        s"aggregate was not answered from stats:\n$plan")
      assert(!plan.contains("BatchScan"), "files were planned for a " +
        "stats-answerable aggregate")
      val r = agg.collect()(0)
      val direct = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
        .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey")).collect()(0)
      assert(r.getLong(0) == direct.getLong(0))
      assert(r.getLong(1) == direct.getLong(1))
      assert(r.getLong(2) == direct.getLong(2))
    } finally st.stop()
  }

  test("GROUP BY partition column aggregates from stats, one row per group") {
    // orders partitioned by o_orderstatus, true per-file stats
    val src = Paths.get("/root/testdata/sf0.001/orders.parquet")
    val orders = spark.read.parquet(src.toString)
    val st = new StubSharingServer(expectedToken = "tok").start()
    val tmp = Files.createTempDirectory("graft-agg-group")
    try {
      // coalesce(1): one file per status dir, so the per-status stats
      // registered below are exactly that file's stats
      orders.coalesce(1).write.partitionBy("o_orderstatus").mode("overwrite")
        .parquet(tmp.toString)
      val statsB = Map.newBuilder[String, String]
      val files = Seq.newBuilder[(String, Long, Map[String, String])]
      graft.sources.testing.DirWalk.eachChild(tmp) { d =>
        val name = d.getFileName.toString
        if (name.startsWith("o_orderstatus=")) {
          val status = name.stripPrefix("o_orderstatus=")
          val part = orders.filter(col("o_orderstatus") === status)
          val r = part.agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"))
            .collect()(0)
          graft.sources.testing.DirWalk.eachChild(d) { f =>
            if (f.getFileName.toString.endsWith(".parquet")) {
              files += ((f.toUri.toString, Files.size(f),
                Map("o_orderstatus" -> status)))
              statsB += f.toUri.toString -> FileStats.statsJson(
                "o_orderkey", r.getLong(0), r.getLong(1), r.getLong(2))
            }
          }
        }
      }
      st.tables = Map("orders_p" -> ((orders.schema.json,
        Seq("o_orderstatus"), files.result())))
      st.fileStats = statsB.result()
      val agg = readFrom(st, "orders_p")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), min("o_orderkey").as("mn"),
          max("o_orderkey").as("mx"))
        .orderBy("o_orderstatus")
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan"),
        s"grouped aggregate was not answered from stats:\n$plan")
      assert(!plan.contains("BatchScan"))
      val got = agg.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val want = orders.groupBy("o_orderstatus")
        .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"))
        .orderBy("o_orderstatus").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == want.toSeq)
      // and a partition filter composes: only the matching group remains
      val one = readFrom(st, "orders_p")
        .filter(col("o_orderstatus") === want.head._1)
        .agg(count(lit(1)).as("n")).collect()(0).getLong(0)
      assert(one == want.head._2)
    } finally { st.stop() }
  }

  test("aggregate pushdown refuses and falls back without full stats") {
    // the main fixture's lineitem files carry NO stats → COUNT must
    // read rows (BatchScan) and still be exact
    val df = read()
    val agg = df.agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"),
      "pushdown must refuse when any file lacks numRecords")
    assert(agg.collect()(0).getLong(0) == expectedCount)
    // unsupported shapes (SUM, grouped) also fall back and stay exact
    val grouped = readFrom(server, "lineitem")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(grouped.collect().map(_.getLong(1)).sum == expectedCount)
  }

  test("presigned HTTP urls with Range requests read end-to-end") {
    val src = Paths.get("/root/testdata/sf0.001/orders.parquet")
    server.httpFiles = Map("orders.parquet" -> src)
    val ordersSchema = spark.read.parquet(src.toString).schema.json
    server.tables = server.tables + ("orders" -> ((ordersSchema, Seq.empty,
      Seq((s"http://127.0.0.1:${server.port}/files/orders.parquet",
        Files.size(src), Map.empty[String, String])))))
    val df = spark.read.format("deltashare")
      .option("endpoint", server.endpoint)
      .option("bearerToken", "tok")
      .load("share1.schema1.orders")
    val n = df.count()
    val direct = spark.read.parquet(src.toString).count()
    assert(n == direct)
    // and values, not just counts
    val total = df.agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val totalDirect = spark.read.parquet(src.toString)
      .agg(sum("o_totalprice")).collect()(0).getDouble(0)
    assert(math.abs(total - totalDirect) < 1e-6)
  }
}
