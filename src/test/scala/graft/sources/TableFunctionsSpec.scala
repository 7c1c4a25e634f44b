package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions
import graft.sources.testing.StubSharingServer

/** The reference's literal SQL table-function surface
  * (`duck_delta_share_extension.cpp:654-661`), registered through
  * `SparkSessionExtensions.injectTableFunction`: `delta_share_list`'s
  * arity selects shares/schemas/tables, `delta_share_read` scans a
  * shared table — with predicates written over the TVF still reaching
  * the connector as pushed filters. */
class TableFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tvf")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private var server: StubSharingServer = _

  override def beforeAll(): Unit = {
    server = new StubSharingServer(expectedToken = "tok").start()
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/region.parquet")
    server.httpFiles = Map("region.parquet" -> src)
    val schema = spark.read.parquet(src.toString).schema.json
    server.tables = Map("region" -> ((schema, Seq.empty,
      Seq((s"http://127.0.0.1:${server.port}/files/region.parquet",
        java.nio.file.Files.size(src), Map.empty[String, String])))))
    spark.conf.set("spark.deltaShare.endpoint", server.endpoint)
    spark.conf.set("spark.deltaShare.bearerToken", "tok")
    // suite order may hand us a session built WITHOUT the extensions
    // (getOrCreate returns whichever session came first); the runtime
    // registration path must work regardless — and is itself under
    // test here
    DeltaShare.registerSql(spark)
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.deltaShare.endpoint")
    spark.conf.unset("spark.deltaShare.bearerToken")
    server.stop()
  }

  test("delta_share_list arity selects shares / schemas / tables") {
    assert(spark.sql("SELECT name, id FROM delta_share_list() ORDER BY name")
      .collect().map(_.getString(0)).toSeq == Seq("share1", "share2", "share3"))
    val schemas = spark.sql(
      "SELECT name, share, id FROM delta_share_list('share1')").collect()
    assert(schemas.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("schema1", "share1")))
    val tables = spark.sql(
      "SELECT name, schema, share, id FROM delta_share_list('share1', 'schema1')")
      .collect()
    assert(tables.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq == Seq(("region", "schema1", "share1")))
  }

  test("delta_share_read scans the shared table; filters written over the TVF push down") {
    val n = spark.sql(
      "SELECT count(*) FROM delta_share_read('share1', 'schema1', 'region')")
      .collect()(0).getLong(0)
    assert(n == spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .count())
    val filtered = spark.sql("SELECT r_name " +
      "FROM delta_share_read('share1', 'schema1', 'region') " +
      "WHERE r_regionkey = 2")
    assert(filtered.collect().map(_.getString(0)).toSeq.nonEmpty)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("r_regionkey"),
      s"filter lost through the TVF:\n$plan")
  }

  test("non-literal or excess arguments are rejected with a usage error") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM delta_share_list('a', 'b', 'c')").collect()
    }
    assert(e1.getMessage.contains("0, 1, or 2"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM delta_share_read('only_share')").collect()
    }
    assert(e2.getMessage.contains("usage"))
  }
}
