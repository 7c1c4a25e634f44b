package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.testing.StubSharingServer

/** `.share` profile-file auth: parsing, validation (version /
  * expiry / malformed), and precedence file > inline options. */
class DeltaSharingProfileSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  private var server: StubSharingServer = _
  private var tmp: java.nio.file.Path = _

  private def writeProfile(name: String, json: String): String = {
    val p = tmp.resolve(name)
    Files.write(p, json.getBytes("UTF-8"))
    p.toString
  }

  override def beforeAll(): Unit = {
    server = new StubSharingServer(expectedToken = "profile-tok").start()
    tmp = Files.createTempDirectory("graft-profile")
    val region = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val dir = tmp.resolve("region")
    region.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    var p: java.nio.file.Path = null
    graft.sources.testing.DirWalk.eachChild(dir)(f =>
      if (f.getFileName.toString.endsWith(".parquet")) p = f)
    server.tables = Map("region" -> ((region.schema.json, Seq.empty[String],
      Seq((p.toUri.toString, Files.size(p), Map.empty[String, String])))))
  }

  override def afterAll(): Unit = server.stop()

  test("well-formed profile parses; trailing slash stripped") {
    val path = writeProfile("good.share",
      s"""{"shareCredentialsVersion": 1,
          "endpoint": "${server.endpoint}/",
          "bearerToken": "profile-tok",
          "expirationTime": "2099-01-01T00:00:00Z"}""")
    val prof = DeltaSharingProfile.fromFile(path)
    assert(prof.endpoint == server.endpoint)
    assert(prof.bearerToken == "profile-tok")
    assert(prof.credentialsVersion == 1)
    assert(prof.expirationTime.contains("2099-01-01T00:00:00Z"))
  }

  test("expirationTime is optional") {
    val path = writeProfile("noexp.share",
      s"""{"shareCredentialsVersion": 1, "endpoint": "e", "bearerToken": "t"}""")
    assert(DeltaSharingProfile.fromFile(path).expirationTime.isEmpty)
  }

  test("malformed, incomplete, future-versioned, and expired profiles refuse") {
    val bad = writeProfile("bad.share", "{not json")
    assert(intercept[IllegalArgumentException](
      DeltaSharingProfile.fromFile(bad)).getMessage.contains("not valid JSON"))

    val noToken = writeProfile("notoken.share",
      """{"shareCredentialsVersion": 1, "endpoint": "e"}""")
    assert(intercept[IllegalArgumentException](
      DeltaSharingProfile.fromFile(noToken)).getMessage.contains("bearerToken"))

    val noVersion = writeProfile("nover.share",
      """{"endpoint": "e", "bearerToken": "t"}""")
    assert(intercept[IllegalArgumentException](
      DeltaSharingProfile.fromFile(noVersion))
      .getMessage.contains("shareCredentialsVersion"))

    val v2 = writeProfile("v2.share",
      """{"shareCredentialsVersion": 2, "endpoint": "e", "bearerToken": "t"}""")
    assert(intercept[IllegalArgumentException](
      DeltaSharingProfile.fromFile(v2)).getMessage.contains("version 1"))

    val expired = writeProfile("expired.share",
      """{"shareCredentialsVersion": 1, "endpoint": "e",
         "bearerToken": "t", "expirationTime": "2020-01-01T00:00:00Z"}""")
    assert(intercept[IllegalArgumentException](
      DeltaSharingProfile.fromFile(expired)).getMessage.contains("expired"))

    assert(intercept[IllegalArgumentException](
      DeltaSharingProfile.fromFile("/nonexistent/x.share"))
      .getMessage.contains("cannot read"))
  }

  test("profile option authenticates an end-to-end read and beats inline options") {
    val path = writeProfile("e2e.share",
      s"""{"shareCredentialsVersion": 1,
          "endpoint": "${server.endpoint}",
          "bearerToken": "profile-tok"}""")
    val df = spark.read.format("deltashare")
      .option("profile", path)
      // wrong inline credentials: the profile FILE must win
      .option("endpoint", "http://127.0.0.1:1/nowhere")
      .option("bearerToken", "wrong")
      .load("share1.schema1.region")
    assert(df.count() == 5)
    assert(df.filter(col("r_regionkey") === 0).count() == 1)
  }
}
