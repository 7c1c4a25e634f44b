package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: z-order (Morton) clustering keys.
  *
  * Sorting a table by the bit-interleaving of two columns before
  * writing makes every output file cover a NARROW RANGE OF BOTH
  * dimensions, so parquet/Delta min-max file statistics prune scans
  * filtered on either column — the standard multi-dimensional
  * clustering trick for 100 TB tables where you can only sort once
  * but filter on several keys.
  *
  * The key is a statically-unrolled integer expression (16 shifts,
  * masks, adds per column — all inside whole-stage codegen, no UDF)
  * and integer-exact, so the DuckDB oracle reproduces it term for
  * term.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The file-level statistics a z-ordered layout would produce:
    * bucket rows by `z div 2^bucketShift` (≈ one bucket per output
    * file) and report each bucket's row count and min/max of both
    * dimensions — narrow per-bucket ranges in BOTH columns are what
    * make the layout prunable. One scan, one hash aggregation. */
  def zorderStats(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 16, bucketShift: Int = 14): DataFrame =
    df.select(col(aCol).as("a"), col(bCol).as("b"),
        zorderKey(col(aCol), col(bCol), bits).as("z"))
      .withColumn("z_bucket", expr(s"z div ${1L << bucketShift}"))
      .groupBy("z_bucket").agg(count(lit(1)).as("n"),
        min("a").as("a_min"), max("a").as("a_max"),
        min("b").as("b_min"), max("b").as("b_max"))
}
