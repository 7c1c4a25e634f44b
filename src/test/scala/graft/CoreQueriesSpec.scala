package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every declared query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only entries are allowed but should be a deliberate, small set
    assert(noOracle.forall(n => n.startsWith("m") || n.startsWith("ss") ||
      n.startsWith("dd") || n.startsWith("st")),
      s"queries without oracle: $noOracle")
  }

  test("all queries execute at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q16_topk returns exactly 20 ordered rows") {
    val rows = SparkEntry.queries("q16_topk")(spark, sf).collect()
    assert(rows.length == 20)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sameElements(prices.sortBy(-_.toDouble)))
  }

  test("q13_window_rank caps row_number at 5 per partition") {
    val df = SparkEntry.queries("q13_window_rank")(spark, sf)
    assert(df.collect().forall(_.getInt(4) <= 5))
  }

  test("q01 aggregates are stable across runs") {
    val a = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    val b = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(a.sameElements(b))
  }
}
