package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query packs. Each query is a
  * `(SparkSession, sfDir) => DataFrame` over the driver-generated
  * parquet tables; `oracleSql` holds the DuckDB-runnable ANSI
  * equivalent (omitted for ops that SQL can't express — those get a
  * rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The curation pipeline exercises the library end to end
    * (annotation → quality filter → exact dedup → near-dup removal)
    * and touches no nanosecond-timestamp columns, so it runs on any
    * session. */
  def entry(spark: SparkSession): DataFrame =
    queries("dd7_curation_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.ShareQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.ExtendedQueries.oracle ++
      graft.queries.ShareQueries.oracle
}
