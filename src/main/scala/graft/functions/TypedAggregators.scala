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

  /** Mutable per-partition buffer for [[covMoments]]: upper-triangle
    * second-moment cells in a two-tier exact accumulator — a fast
    * `Long` lane per cell plus a `BigInteger` spill lane that absorbs
    * the Long lane whenever it nears overflow, so the sum stays EXACT
    * at any corpus size without paying BigInteger arithmetic per
    * addend (the Long lane handles ≥2³⁰ unit-scale addends between
    * spills). Cell (i ≤ j) lives at index `j(j+1)/2 + i` — a mapping
    * independent of the dimensionality, so buffers grown to
    * different widths merge without remapping. Java-serialized as a
    * whole (the buffer crosses the wire once per partition, not per
    * row). */
  final class CovMomentBuf extends Serializable {
    var d: Int = 0
    var n: Array[Long] = Array.emptyLongArray         // per-cell row counts
    var lo: Array[Long] = Array.emptyLongArray        // fast integer lane
    var big: Array[java.math.BigInteger] = Array.empty // exact spill lane
    var sn: Array[Long] = Array.emptyLongArray        // finite addends seen
    var n1: Array[Long] = Array.emptyLongArray        // per-dim diag counts
    var lo1: Array[Long] = Array.emptyLongArray       // first-moment lanes
    var big1: Array[java.math.BigInteger] = Array.empty
    var sn1: Array[Long] = Array.emptyLongArray

    def grow(dim: Int): Unit = if (dim > d) {
      val cells = dim * (dim + 1) / 2
      n = java.util.Arrays.copyOf(n, cells)
      lo = java.util.Arrays.copyOf(lo, cells)
      big = java.util.Arrays.copyOf(big, cells)
      sn = java.util.Arrays.copyOf(sn, cells)
      n1 = java.util.Arrays.copyOf(n1, dim)
      lo1 = java.util.Arrays.copyOf(lo1, dim)
      big1 = java.util.Arrays.copyOf(big1, dim)
      sn1 = java.util.Arrays.copyOf(sn1, dim)
      d = dim
    }
  }

  final case class CovCell(i: Int, j: Int, n: Long, s: String, s1: String)
  final case class CovCells(cells: Seq[CovCell])

  // |lo| stays ≤ SAFE between adds and each |addend| ≤ ADDEND_MAX, so
  // lo never wraps (SAFE + ADDEND_MAX < Long.MaxValue); anything
  // larger goes straight to the BigInteger lane
  private val SAFE = Long.MaxValue / 2
  private val ADDEND_MAX = 4.0e18

  /** Bounded-heap per-key top-k over EXACT integer scores — the
    * [[graft.operators.Similarity.TopKAggregator]] discipline
    * (sorted ≤ k buffer, one ordered insertion per row, partial-agg
    * merge-safe) for score domains that must stay in the Long lane
    * (BM25/TF-IDF ppm surrogates lose exactness above 2⁵³ in a
    * Double). Input is `(id, score, payload)`; the buffer keeps
    * `(score, id, payload)` sorted by (score desc, id asc) — the
    * same total order the window it replaces used — and never
    * exceeds `k` entries, so a corpus-sized candidate set reaches
    * the per-key reducer as ≤ partitions·k buffered rows instead of
    * every row (the round-13 BM25-tail weak). */
  final class LongTopKAggregator(k: Int)
    extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)],
      Seq[(Long, Long, Long)]] {
    private def before(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(b: Seq[(Long, Long, Long)],
        e: (Long, Long, Long)): Seq[(Long, Long, Long)] = {
      if (b.length >= k && !before(e, b.last)) b
      else {
        val idx = b.indexWhere(x => before(e, x)) match {
          case -1 => b.length
          case i => i
        }
        val grown = (b.take(idx) :+ e) ++ b.drop(idx)
        if (grown.length > k) grown.take(k) else grown
      }
    }
    override def zero: Seq[(Long, Long, Long)] = Seq.empty
    override def reduce(b: Seq[(Long, Long, Long)],
        a: (Long, Long, Long)): Seq[(Long, Long, Long)] =
      insert(b, (a._2, a._1, a._3))
    override def merge(x: Seq[(Long, Long, Long)],
        y: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      if (x.length >= y.length) y.foldLeft(x)(insert)
      else x.foldLeft(y)(insert)
    override def finish(r: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
      bufferEncoder
  }

  /** One-pass upper-triangle second+first moments of a vector column
    * (the [[graft.operators.VectorStats]] `moments` contract as a
    * typed `Aggregator`): per input row, fold all d(d+1)/2 products
    * `floor(x_i·x_j·2⁴⁰)` (and on the diagonal the plain
    * `floor(x_i·2⁴⁰)`) into the partition-local buffer — NO exploded
    * rows exist anywhere; at d=1024 this removes ~525k generated
    * rows per vector from the explode→filter→hash-agg pipeline while
    * carrying the identical O(d²) cells across the exchange.
    *
    * Exactness contract (bit-compatible with the Column twin it
    * replaces and the DuckDB oracle): each addend is the IEEE double
    * `floor(x_i·x_j·2⁴⁰)` — non-finite products are skipped exactly
    * like `CAST(inf/NaN AS DECIMAL)`'s null vanishes from a SUM —
    * and integer summation is order-free, so any partitioning gives
    * the same cell totals. The cross-ENGINE guarantee holds for
    * addends below 2⁵³, where the floored double is an exact integer
    * and every engine's double→decimal conversion agrees; above that
    * the engines themselves disagree (Spark's cast string-rounds via
    * `Double.toString`, this fold keeps the exact binary value), a
    * regime the unit-scale embedding domain never enters. Cell sums surface as decimal STRINGS
    * (cast to DECIMAL(38,0) by the caller); `s1` is null off the
    * diagonal, mirroring the `when(i === j, …)` column. Rows shorter
    * than the widest vector simply contribute to fewer cells (per-
    * cell `n` counts rows that reached that cell). */
  val covMoments: Aggregator[Array[Double], CovMomentBuf, CovCells] =
    new Aggregator[Array[Double], CovMomentBuf, CovCells] {
      private val Scale = 1099511627776.0d // 2^40, VectorStats.FixedScale

      private def spillInto(bigs: Array[java.math.BigInteger], idx: Int,
          v: java.math.BigInteger): Unit =
        bigs(idx) = if (bigs(idx) == null) v else bigs(idx).add(v)

      private def add(los: Array[Long], bigs: Array[java.math.BigInteger],
          sns: Array[Long], idx: Int, a: Double): Unit =
        if (java.lang.Double.isFinite(a)) {
          sns(idx) += 1L
          if (math.abs(a) >= ADDEND_MAX) {
            spillInto(bigs, idx, new java.math.BigDecimal(a).toBigInteger)
          } else {
            los(idx) += a.toLong
            if (los(idx) > SAFE || los(idx) < -SAFE) {
              spillInto(bigs, idx, java.math.BigInteger.valueOf(los(idx)))
              los(idx) = 0L
            }
          }
        }

      override def zero: CovMomentBuf = new CovMomentBuf
      override def reduce(b: CovMomentBuf, x: Array[Double]): CovMomentBuf = {
        if (x == null) return b
        val len = x.length
        b.grow(len)
        var j = 0
        while (j < len) {
          val xj = x(j)
          val base = j * (j + 1) / 2
          var i = 0
          while (i <= j) {
            b.n(base + i) += 1L
            add(b.lo, b.big, b.sn, base + i, math.floor(x(i) * xj * Scale))
            i += 1
          }
          b.n1(j) += 1L
          add(b.lo1, b.big1, b.sn1, j, math.floor(xj * Scale))
          j += 1
        }
        b
      }
      override def merge(a: CovMomentBuf, b: CovMomentBuf): CovMomentBuf = {
        a.grow(b.d); b.grow(a.d)
        var c = 0
        while (c < a.n.length) {
          a.n(c) += b.n(c)
          a.sn(c) += b.sn(c)
          a.lo(c) += b.lo(c)       // both ≤ SAFE, cannot wrap
          if (a.lo(c) > SAFE || a.lo(c) < -SAFE) {
            spillInto(a.big, c, java.math.BigInteger.valueOf(a.lo(c)))
            a.lo(c) = 0L
          }
          if (b.big(c) != null) spillInto(a.big, c, b.big(c))
          c += 1
        }
        var k = 0
        while (k < a.n1.length) {
          a.n1(k) += b.n1(k)
          a.sn1(k) += b.sn1(k)
          a.lo1(k) += b.lo1(k)
          if (a.lo1(k) > SAFE || a.lo1(k) < -SAFE) {
            spillInto(a.big1, k, java.math.BigInteger.valueOf(a.lo1(k)))
            a.lo1(k) = 0L
          }
          if (b.big1(k) != null) spillInto(a.big1, k, b.big1(k))
          k += 1
        }
        a
      }
      override def finish(b: CovMomentBuf): CovCells = {
        def total(los: Array[Long], bigs: Array[java.math.BigInteger],
            idx: Int): String = {
          val base = java.math.BigInteger.valueOf(los(idx))
          (if (bigs(idx) == null) base else base.add(bigs(idx))).toString
        }
        val out = Seq.newBuilder[CovCell]
        var j = 0
        while (j < b.d) {
          val base = j * (j + 1) / 2
          var i = 0
          while (i <= j) {
            val idx = base + i
            if (b.n(idx) > 0)
              // a cell whose every addend was non-finite sums to SQL
              // NULL, exactly like CAST(inf AS DECIMAL) vanishing
              // from a SUM of nothing else
              out += CovCell(i, j, b.n(idx),
                if (b.sn(idx) > 0) total(b.lo, b.big, idx) else null,
                if (i == j && b.sn1(j) > 0) total(b.lo1, b.big1, j)
                else null)
            i += 1
          }
          j += 1
        }
        CovCells(out.result())
      }
      override def bufferEncoder: Encoder[CovMomentBuf] =
        Encoders.javaSerialization[CovMomentBuf]
      override def outputEncoder: Encoder[CovCells] =
        Encoders.product[CovCells]
    }
}
