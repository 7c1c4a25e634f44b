package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.testing.StubSharingServer

/** Connector-through-the-oracle-gate: an embedded sharing server
  * serves the sf-dir's `lineitem.parquet` as a shared table; the
  * query reads it via `format("deltashare")` with filters/projection
  * pushed down, and the DuckDB oracle checks the result against the
  * SAME underlying file. This proves the whole connector path
  * (metadata → schema → /query → pruning → parquet read) end-to-end
  * inside the correctness gate, not just in unit tests.
  */
object ShareQueries {

  /** One embedded server per JVM; tables registered per sf-dir. */
  private lazy val server: StubSharingServer =
    new StubSharingServer(expectedToken = "graft-verify").start()
  private var registeredDir: Option[String] = None

  private def ensure(s: SparkSession, dir: String): String = synchronized {
    if (!registeredDir.contains(dir)) {
      val path = java.nio.file.Paths.get(s"$dir/lineitem.parquet")
      val schema = s.read.parquet(path.toString).schema.json
      // one file:// FileAction — the executor-side read path is the
      // same as for presigned URLs minus the HTTP hop
      server.tables = Map("lineitem" -> ((schema, Seq.empty,
        Seq((path.toUri.toString, java.nio.file.Files.size(path),
          Map.empty[String, String])))))
      registeredDir = Some(dir)
    }
    server.endpoint
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "share_scan_pushdown" -> { (s, d) =>
      val endpoint = ensure(s, d)
      s.read.format("deltashare")
        .option("endpoint", endpoint)
        .option("bearerToken", "graft-verify")
        .load("share1.schema1.lineitem")
        .filter(col("l_quantity") >= 48 && col("l_returnflag") =!= "N")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }
  )

  val oracle: Map[String, String] = Map(
    "share_scan_pushdown" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem
      WHERE l_quantity >= 48 AND l_returnflag <> 'N'
      ORDER BY l_orderkey, l_linenumber"""
  )
}
