package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. When one join key carries a
  * disproportionate share of left rows, a plain shuffle join puts that
  * whole key in one task. Salting splits it: the left side gets a
  * deterministic salt in [0, n) derived from its full row hash, the
  * (smaller) right side is replicated across all n salts, and the join
  * key becomes (key, salt) — the hot key now spreads over n tasks.
  *
  * Result is row-for-row identical to the plain join (the oracle
  * checks exactly that). Prefer AQE's skew-join handling when the
  * skew is detectable at runtime; explicit salting is for keys you
  * KNOW are pathological (the `null`/default-value key of a 100 TB
  * fact table) or for deterministic test plans.
  */
object SkewJoin {

  /** Inner equi-join `left(key) = right(key)` with `n`-way salting. */
  def salted(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, n: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(n)))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
