package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState
}

/** Per-user running profile row emitted by the stream (and, in the
  * batch twin, computed directly): event count + exact money sum in
  * integer cents. */
case class ProfileRow(user_id: Long, n_events: Long, sum_cents: Long)

/** The typed state kept per user in the store. */
case class ProfileState(n: Long, cents: Long)

/** Arbitrary-state processor (Spark 4 `transformWithState` API): a
  * `ValueState[ProfileState]` per user, updated with every input row
  * and re-emitted once per micro-batch that touches the user — the
  * online form of a feature-store / abuse-counter over an event
  * firehose. Money arrives pre-quantized to integer cents (see
  * [[StatefulProfile.centsCol]]) so accumulation is exact and
  * order-independent: any interleaving of micro-batches converges to
  * the batch twin. State lives in the RocksDB-backed store, so the
  * per-executor working set is bounded by the store cache, not by
  * user cardinality — the shape that survives a 100 TB firehose.
  */
class ProfileProcessor
    extends StatefulProcessor[Long, (Long, Long), ProfileRow] {

  @transient private var state: ValueState[ProfileState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ProfileState](
      "profile", Encoders.product[ProfileState], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[ProfileRow] = {
    var s = if (state.exists()) state.get() else ProfileState(0L, 0L)
    rows.foreach { case (_, cents) =>
      s = ProfileState(s.n + 1L, s.cents + cents)
    }
    state.update(s)
    Iterator.single(ProfileRow(key, s.n, s.cents))
  }
}

object StatefulProfile {

  /** Per-row cents quantization applied BEFORE any summation, on both
    * the stream and the batch twin, so the two accumulate identical
    * integers (the q36 double-vs-decimal lesson): round the double to
    * DECIMAL(18,2) first, then scale to integer cents. */
  private def centsCol =
    (col("value").cast("decimal(18,2)") * 100).cast("long")

  /** The streaming form: per-user `ValueState` profile over
    * `transformWithState`, emitting the updated profile for every user
    * touched by each micro-batch (update mode). Input needs `user_id`
    * (long) and `value` (double) columns. */
  def statefulProfile(stream: DataFrame): Dataset[ProfileRow] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("user_id"), centsCol.as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new ProfileProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** The batch twin: the final state any run of the stream must
    * converge to. One keyed aggregation — partial map-side, one
    * exchange on user_id. */
  def statefulProfileBatch(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), centsCol.as("cents"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum("cents").as("sum_cents"))
}
