package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming surface over the `events` table (north-star
  * scope + SURVEY.md §2.2 streaming row): tumbling/sliding/session
  * windows with watermarks, stateful dedup, and a
  * `flatMapGroupsWithState` sessionizer.
  *
  * Each operator has a batch-equivalent twin (same frame, same
  * aggregates) — the ScalaTest suite drives the streaming variant to
  * completion via the file source + memory sink and asserts it equals
  * the batch result, while the batch twin is what the DuckDB oracle
  * checks. Scale: watermarks bound state; aggregations are keyed by
  * (window, type) or (user, session) so state shards across
  * executors; `dropDuplicatesWithinWatermark` keeps the dedup state
  * window-bounded instead of unbounded.
  */
object EventStreams {

  /** File-source stream over `$dir/events.parquet` (`ts` normalized to
    * TimestampType as in [[graft.Tables.events]] — watermarks reject
    * TIMESTAMP_NTZ event-time columns). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Tables.normalizeTs(raw)
  }

  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Tumbling 1-hour windows per event type: count + exact sum. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DoubleType).as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("total"))

  /** Batch twin of [[tumblingCounts]] (oracle-checkable). */
  def tumblingCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DoubleType).as("total"))

  /** Sliding windows (1 hour, sliding 30 min) per event type. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"))

  /** Session windows (30-minute gap) per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("session_value"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Batch twin of [[sessionAgg]]: classic gaps-and-islands —
    * a session starts when the gap from the previous event of the
    * same user exceeds 30 minutes. */
  def sessionAggBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            lit(30L * 60 * 1000000), 1L).otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy("user_id", "session_id")
      .agg(
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("session_value"))
      .select("session_start", "user_id", "n_events", "session_value")
  }

  /** Watermark-bounded streaming dedup on event_id. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: purchases attributed to a click by the
    * same user within the following 30 minutes. Watermarks on both
    * sides + the time-range condition bound the join state (clicks
    * older than watermark+30min are evicted). */
  def clickToPurchase(events: DataFrame): DataFrame =
    joinClicksPurchases(events, "inner")

  /** Batch twin of [[clickToPurchase]]. */
  def clickToPurchaseBatch(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"""))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("value"))
  }

  /** Stream-stream LEFT OUTER interval join — the conversion-funnel
    * readout: every click emits, joined to its purchases as they
    * arrive, and NULL-extended once the watermark passes the click's
    * 30-minute window with no match (the state-eviction emission only
    * OUTER stream joins exercise — an unmatched click is provably
    * unmatched only when the watermark says no qualifying purchase
    * can still arrive). Same state bounds as [[clickToPurchase]]. */
  def clickToPurchaseOuter(events: DataFrame): DataFrame =
    joinClicksPurchases(events, "left_outer")

  /** Batch twin of [[clickToPurchaseOuter]]. */
  def clickToPurchaseOuterBatch(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"""),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("value"))
  }

  private def joinClicksPurchases(events: DataFrame,
      joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"""),
      joinType)
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("value"))
  }

  final case class SessionOut(user_id: Long, n_events: Long,
      total_value: Double, closed_by_timeout: Boolean)
  final case class Ev(user_id: Long, tsMicros: Long, value: Double)
  final case class SessionState(n: Long, total: Double, lastTs: Long)

  /** Custom stateful sessionizer via flatMapGroupsWithState —
    * the escape hatch for session logic `session_window` can't
    * express (per-user running totals emitted on session close). */
  def statefulSessionize(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"),
        col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val gap = gapMinutes.toLong * 60 * 1000000
          val sorted = evs.toSeq.sortBy(_.tsMicros)
          var st = state.getOption.getOrElse(SessionState(0, 0.0, Long.MinValue))
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            if (st.n > 0 && e.tsMicros - st.lastTs > gap) {
              out += SessionOut(userId, st.n, st.total, closed_by_timeout = false)
              st = SessionState(0, 0.0, Long.MinValue)
            }
            st = SessionState(st.n + 1, st.total + e.value, e.tsMicros)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
