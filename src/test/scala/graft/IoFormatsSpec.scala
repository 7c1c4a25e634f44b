package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/format coverage (SURVEY.md §2.2 host-engine sources):
  * parquet is the native format; CSV, JSON, and ORC round-trip with
  * schema preservation. */
class IoFormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val base = spark.read
    .parquet("/root/testdata/sf0.001/nation.parquet")

  private def roundTrip(format: String,
      writerOpts: Map[String, String] = Map.empty,
      readerOpts: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft-io-$format").toString
    base.write.mode("overwrite").options(writerOpts).format(format).save(dir)
    val back = spark.read.options(readerOpts).schema(base.schema)
      .format(format).load(dir)
    val a = base.orderBy("n_nationkey").collect().toSeq
    val b = back.orderBy("n_nationkey").collect().toSeq
    assert(a == b, s"$format round trip mismatch")
  }

  test("csv round trip") {
    roundTrip("csv",
      writerOpts = Map("header" -> "true"),
      readerOpts = Map("header" -> "true"))
  }

  test("json round trip") { roundTrip("json") }

  test("orc round trip") { roundTrip("orc") }

  test("binaryFile source reads opaque payloads with metadata") {
    // the multimodal ingestion pattern: files as (path, length, content)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load("/root/testdata/sf0.001")
    assert(df.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val rows = df.select("path", "length").collect()
    assert(rows.length == 10) // one per table
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("csv schema inference reads typed columns") {
    val dir = Files.createTempDirectory("graft-io-infer").toString
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    assert(inferred.schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(inferred.count() == base.count())
  }
}
