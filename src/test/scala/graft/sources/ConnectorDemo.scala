package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.sources.testing.StubSharingServer

/** Manual end-to-end drive of the deltashare connector (run with
  * `sbt "Test/runMain graft.sources.ConnectorDemo"`): boots the stub
  * sharing server, reads through `spark.read.format("deltashare")`,
  * prints counts, pruning evidence, and the physical plan. */
object ConnectorDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val server = new StubSharingServer(expectedToken = "tok").start()
    try {
      val tmp = Files.createTempDirectory("graft-demo")
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      li.write.partitionBy("l_returnflag").mode("overwrite").parquet(tmp.toString)
      val files = Seq.newBuilder[(String, Long, Map[String, String])]
      graft.sources.testing.DirWalk.eachChild(tmp) { d =>
        val n = d.getFileName.toString
        if (n.startsWith("l_returnflag=")) graft.sources.testing.DirWalk.eachChild(d) { f =>
          if (f.getFileName.toString.endsWith(".parquet"))
            files += ((f.toUri.toString, Files.size(f),
              Map("l_returnflag" -> n.stripPrefix("l_returnflag="))))
        }
      }
      server.tables = Map("lineitem" -> (li.schema.json, Seq("l_returnflag"),
        files.result()))

      println(s"== listShares ==")
      spark.conf.set(DeltaSharingProfile.EndpointConf, server.endpoint)
      spark.conf.set(DeltaSharingProfile.TokenConf, "tok")
      DeltaShare.listShares(spark).show()
      DeltaShare.listTables(spark, "share1", "schema1").show()

      val df = spark.read.format("deltashare")
        .option("endpoint", server.endpoint).option("bearerToken", "tok")
        .load("share1.schema1.lineitem")
      println(s"== full scan count = ${df.count()} (direct = ${li.count()})")

      val pruned = df.filter(col("l_returnflag") === "A")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"), sum("l_quantity"))
      pruned.show()
      println("== POST body sent to server ==")
      println(server.lastQueryBody)
      println("== physical plan ==")
      pruned.explain("formatted")
    } finally { server.stop(); spark.stop() }
  }
}
