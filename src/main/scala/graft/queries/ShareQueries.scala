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
      // one file:// FileAction each — the executor-side read path is
      // the same as for presigned URLs minus the HTTP hop
      def table(name: String) = {
        val path = java.nio.file.Paths.get(s"$dir/$name.parquet")
        val schema = s.read.parquet(path.toString).schema.json
        name -> ((schema, Seq.empty[String],
          Seq((path.toUri.toString, java.nio.file.Files.size(path),
            Map.empty[String, String]))))
      }
      server.tables = Map(table("lineitem"), table("documents"))
      registeredDir = Some(dir)
    }
    server.endpoint
  }

  private def sharedTable(s: SparkSession, d: String, name: String): DataFrame =
    s.read.format("deltashare")
      .option("endpoint", ensure(s, d))
      .option("bearerToken", "graft-verify")
      .load(s"share1.schema1.$name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "share_scan_pushdown" -> { (s, d) =>
      sharedTable(s, d, "lineitem")
        .filter(col("l_quantity") >= 48 && col("l_returnflag") =!= "N")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // a PIPELINE operator over a SHARED table: the dedup family runs
    // unchanged on the connector's DataFrame — operators and source
    // compose, end-to-end through the oracle gate
    "share_pipeline_dedup" -> { (s, d) =>
      graft.operators.Dedup.exact(sharedTable(s, d, "documents"))
        .orderBy("keep_id")
    },
    // the catalog walk (O1→O2→O3): listShares → listSchemas →
    // listTables over live HTTP against the embedded server. Catalog
    // listings are driver-side by design (the frames are built FROM
    // driver HTTP responses), so the intermediate collects here are
    // the listing results themselves, not distributed data.
    "share_list_tables" -> { (s, d) =>
      import graft.sources.{DeltaShare, DeltaSharingProfile}
      s.conf.set(DeltaSharingProfile.EndpointConf, ensure(s, d))
      s.conf.set(DeltaSharingProfile.TokenConf, "graft-verify")
      val frames = for {
        sh <- DeltaShare.listShares(s).select("name")
          .collect().map(_.getString(0)).toSeq
        sc <- DeltaShare.listSchemas(s, sh).select("name")
          .collect().map(_.getString(0)).toSeq
      } yield DeltaShare.listTables(s, sh, sc)
        .select(col("share").as("share_name"),
          col("schema").as("schema_name"), col("name").as("table_name"))
      frames.reduce(_ unionAll _)
        .orderBy("share_name", "schema_name", "table_name")
    }
  )

  val oracle: Map[String, String] = Map(
    "share_scan_pushdown" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem
      WHERE l_quantity >= 48 AND l_returnflag <> 'N'
      ORDER BY l_orderkey, l_linenumber""",
    // twin of dd1 but over the SHARED read — the oracle sees the same
    // underlying parquet, so connector fidelity is what's checked
    "share_pipeline_dedup" -> """
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents
      GROUP BY array_to_string(list_filter(
        string_split_regex(trim(lower(text)), '\s+'), t0 -> t0 <> ''), ' ')
      ORDER BY keep_id""",
    // the stub's catalog fixture is the truth: 3 shares × schema1 ×
    // the 2 registered tables — the Spark side must reproduce it via
    // the live listShares/listSchemas/listTables HTTP walk
    "share_list_tables" -> """
      SELECT s.share_name, c.schema_name, n.table_name
      FROM (VALUES ('share1'), ('share2'), ('share3')) AS s(share_name)
      CROSS JOIN (VALUES ('schema1')) AS c(schema_name)
      CROSS JOIN (VALUES ('documents'), ('lineitem')) AS n(table_name)
      ORDER BY share_name, schema_name, table_name"""
  )
}
