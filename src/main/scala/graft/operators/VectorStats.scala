package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed analytics over an embedding column: per-class
  * centroids and int8 quantization — the vector-side counterparts of
  * the [[Similarity]] search operators (centroids seed IVF; int8 is
  * the standard storage/bandwidth compression for ANN serving).
  *
  * Cross-engine exactness: a float sum's value depends on fold order,
  * and a grouped aggregation has no deterministic order at scale — so
  * each addend is fixed-pointed FIRST (`floor(v * 2^40)`: multiplying
  * by a power of two is exact in IEEE double, floor is exact) and the
  * sum runs over those integers in DECIMAL (order-independent,
  * overflow-free). Engine-specific float→decimal casts are never used
  * — they round differently (measured: Spark's exact-BigDecimal
  * HALF_UP vs DuckDB's double-multiply path disagree in the last
  * decimal) — while integer→decimal and decimal→double conversions
  * are correctly rounded everywhere.
  */
object VectorStats {
  /** Fixed-point scale for centroid sums: 2^40 (exactly representable
    * in double; beyond float's relative precision for |v| > ~1e-5). */
  private val FixedScale = 1099511627776.0d

  /** Dimension-wise mean embedding per label (the centroid step of
    * IVF / k-means / class prototypes).
    *
    * Scale shape: `posexplode` fans each vector into (label, dim, v)
    * rows — dims× the row count but a few bytes each — then ONE
    * hash aggregation on (label, dim) with map-side partial sums;
    * the shuffle carries (label, dim, decimal sum, count) per
    * partition, i.e. O(labels × dims), independent of corpus size.
    * DECIMAL(38,0) holds ~1e25 scaled unit-norm addends. */
  def labelCentroids(embs: DataFrame): DataFrame =
    embs.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v").cast("double") * lit(FixedScale))
          .cast(DecimalType(38, 0))).as("s"))
      .select(col("label"), col("dim"), col("n"),
        (col("s").cast("double") / lit(FixedScale) / col("n").cast("double"))
          .as("centroid"))

  /** Symmetric per-vector int8 quantization: `scale = max |v_i|`,
    * `q_i = floor(v_i * 127 / scale + 0.5)` (round-half-up — spelled
    * as an explicit floor so every engine rounds identically; builtin
    * `round` is half-even in some engines and half-away in others).
    * All-zero vectors quantize to zeros. Per-row, shuffle-free, stays
    * inside whole-stage codegen. */
  def quantizeInt8(embs: DataFrame): DataFrame = {
    def vd(c: Column): Column = transform(c, v => v.cast("double"))
    val scl = array_max(transform(col("embedding"), v => abs(v.cast("double"))))
    embs.select(col("vec_id"), scl.as("scale"),
      when(scl > 0,
        transform(vd(col("embedding")),
          v => floor(v * lit(127.0) / scl + lit(0.5)).cast("int")))
        .otherwise(transform(vd(col("embedding")), _ => lit(0)))
        .as("q"))
  }
}
