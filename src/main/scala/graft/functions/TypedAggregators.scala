package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` examples — the UDAF surface of SURVEY.md §2.2.
  * Buffers are exact (BigDecimal / longs), so results are
  * deterministic under any partial-aggregation order and the DuckDB
  * oracle can check them.
  */
object TypedAggregators {

  /** Exact decimal sum + count + min/max in one pass (the classic
    * "stats" UDAF), merge-safe for partial aggregation. */
  final case class MoneyStatsBuf(sum: BigDecimal, n: Long,
      min: Double, max: Double)
  final case class MoneyStats(total: Double, n: Long,
      min: Double, max: Double)

  val moneyStats: Aggregator[Double, MoneyStatsBuf, MoneyStats] =
    new Aggregator[Double, MoneyStatsBuf, MoneyStats] {
      override def zero: MoneyStatsBuf =
        MoneyStatsBuf(BigDecimal(0), 0L, Double.MaxValue, Double.MinValue)
      override def reduce(b: MoneyStatsBuf, v: Double): MoneyStatsBuf =
        MoneyStatsBuf(
          b.sum + BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP),
          b.n + 1, math.min(b.min, v), math.max(b.max, v))
      override def merge(a: MoneyStatsBuf, b: MoneyStatsBuf): MoneyStatsBuf =
        MoneyStatsBuf(a.sum + b.sum, a.n + b.n,
          math.min(a.min, b.min), math.max(a.max, b.max))
      override def finish(b: MoneyStatsBuf): MoneyStats =
        MoneyStats(b.sum.toDouble, b.n,
          if (b.n == 0) 0.0 else b.min,
          if (b.n == 0) 0.0 else b.max)
      override def bufferEncoder: Encoder[MoneyStatsBuf] =
        Encoders.product[MoneyStatsBuf]
      override def outputEncoder: Encoder[MoneyStats] =
        Encoders.product[MoneyStats]
    }
}
