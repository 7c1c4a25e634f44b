package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PredicateHintsSpec extends AnyFunSuite {
  private val schema = StructType(Seq(
    StructField("s", StringType), StructField("i", IntegerType),
    StructField("l", LongType), StructField("d", DoubleType),
    StructField("b", BooleanType), StructField("dt", DateType),
    StructField("ts", TimestampType),
    StructField("arr", ArrayType(IntegerType))))

  private def json(f: Filter): String =
    PredicateHints.translate(f, schema).map(_.toString).getOrElse("∅")

  test("comparison ops map to the reference grammar") {
    assert(json(EqualTo("i", 5)).contains(""""op":"equal""""))
    assert(json(LessThan("i", 5)).contains(""""op":"lessThan""""))
    assert(json(GreaterThan("i", 5)).contains(""""op":"greaterThan""""))
    assert(json(LessThanOrEqual("i", 5)).contains(""""op":"lessThanOrEqual""""))
    assert(json(GreaterThanOrEqual("i", 5)).contains(""""op":"greaterThanOrEqual""""))
  }

  test("valueTypes are faithful, not collapsed to {int,string}") {
    // the reference maps BOOLEAN/…/DOUBLE → "int" (lossy,
    // duck_delta_share_extension.cpp:271-283); we keep real types.
    // NB the jsonPredicateHints grammar spells boolean "bool".
    assert(json(EqualTo("b", true)).contains(""""valueType":"bool""""))
    assert(json(EqualTo("l", 5L)).contains(""""valueType":"long""""))
    assert(json(EqualTo("d", 1.5)).contains(""""valueType":"double""""))
    assert(json(EqualTo("dt", java.sql.Date.valueOf("2024-01-02")))
      .contains(""""valueType":"date""""))
    assert(json(EqualTo("dt", java.sql.Date.valueOf("2024-01-02")))
      .contains(""""value":"2024-01-02""""))
    assert(json(EqualTo("ts", java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
      .contains(""""valueType":"timestamp""""))
  }

  test("null tests and negation") {
    assert(json(IsNull("s")).contains(""""op":"isNull""""))
    val notNull = json(IsNotNull("s"))
    assert(notNull.contains(""""op":"not"""") && notNull.contains(""""op":"isNull""""))
    val ne = json(Not(EqualTo("s", "x")))
    assert(ne.contains(""""op":"not"""") && ne.contains(""""op":"equal""""))
  }

  test("IN explodes to or(equal…), null elements skipped") {
    val in = json(In("s", Array("a", null, "b")))
    assert(in.contains(""""op":"or""""))
    assert(in.split("\"op\":\"equal\"").length == 3) // two equal nodes
  }

  test("and/or compose; partially-translatable AND keeps sound side") {
    assert(json(And(EqualTo("i", 1), EqualTo("s", "x"))).contains(""""op":"and""""))
    assert(json(Or(EqualTo("i", 1), EqualTo("s", "x"))).contains(""""op":"or""""))
    // arr is unhintable → And degrades to the i side (still sound)
    val partial = json(And(EqualTo("i", 1), EqualTo("arr", Seq(1))))
    assert(partial.contains(""""op":"equal"""") && !partial.contains("and"))
    // OR with an unhintable side must NOT translate
    assert(json(Or(EqualTo("i", 1), EqualTo("arr", Seq(1)))) == "∅")
  }

  test("untranslatable filters come back as residuals") {
    val (hint, residual) = PredicateHints.buildHints(
      Seq(EqualTo("i", 1), StringContains("s", "x")), schema)
    assert(hint.isDefined && hint.get.contains(""""op":"equal""""))
    assert(residual == Seq(StringContains("s", "x")))
  }

  test("multiple filters combine under and") {
    val (hint, _) = PredicateHints.buildHints(
      Seq(EqualTo("i", 1), LessThan("l", 9L)), schema)
    assert(hint.get.startsWith("""{"op":"and""""))
  }

  test("legacy SQL-string hints render simple shapes") {
    val hints = PredicateHints.legacyHints(Seq(
      EqualTo("s", "a'b"), GreaterThanOrEqual("i", 5),
      In("l", Array(1L, 2L)), IsNotNull("d"),
      And(EqualTo("i", 1), LessThan("l", 9L)),
      StringContains("s", "x") // not renderable → skipped
    ), schema)
    assert(hints == Seq("s = 'a''b'", "i >= 5", "l IN (1, 2)",
      "d IS NOT NULL", "(i = 1) AND (l < 9)"))
  }
}

class PartitionValuesSpec extends AnyFunSuite {
  private val pschema = StructType(Seq(
    StructField("flag", StringType), StructField("n", IntegerType),
    StructField("day", DateType),
    StructField("price", DecimalType(10, 2))))

  private def keep(f: Filter, vs: Map[String, String]): Boolean =
    PartitionValues.evalFilter(f, vs, pschema)

  test("typed equality and comparison on partition values") {
    assert(keep(EqualTo("flag", "A"), Map("flag" -> "A")))
    assert(!keep(EqualTo("flag", "A"), Map("flag" -> "B")))
    assert(keep(GreaterThan("n", 5), Map("n" -> "7")))
    assert(!keep(GreaterThan("n", 5), Map("n" -> "3")))
    assert(keep(LessThanOrEqual("day", java.sql.Date.valueOf("2024-06-01")),
      Map("day" -> "2024-05-31")))
  }

  test("null partition values only match IsNull") {
    assert(keep(IsNull("flag"), Map("flag" -> null)))
    assert(!keep(IsNotNull("flag"), Map("flag" -> null)))
    assert(!keep(EqualTo("flag", "A"), Map("flag" -> null)))
  }

  test("and/or/in/not compose") {
    val vs = Map("flag" -> "A", "n" -> "10")
    assert(keep(And(EqualTo("flag", "A"), GreaterThan("n", 5)), vs))
    assert(!keep(And(EqualTo("flag", "B"), GreaterThan("n", 5)), vs))
    assert(keep(Or(EqualTo("flag", "B"), GreaterThan("n", 5)), vs))
    assert(keep(In("flag", Array("A", "B")), vs))
    assert(!keep(Not(EqualTo("flag", "A")), vs))
  }

  test("string match filters evaluate exactly") {
    assert(!keep(StringEndsWith("flag", "zzz"), Map("flag" -> "A")))
    assert(keep(StringEndsWith("flag", "A"), Map("flag" -> "BA")))
    assert(keep(StringContains("flag", "B"), Map("flag" -> "ABC")))
    assert(!keep(StringContains("flag", "z"), Map("flag" -> "ABC")))
  }

  test("null-safe equality is exact (was silently unfiltered)") {
    assert(keep(EqualNullSafe("flag", "A"), Map("flag" -> "A")))
    assert(!keep(EqualNullSafe("flag", "A"), Map("flag" -> null)))
    assert(keep(EqualNullSafe("flag", null), Map("flag" -> null)))
    assert(!keep(EqualNullSafe("flag", null), Map("flag" -> "A")))
    assert(PartitionValues.isExact(EqualNullSafe("flag", "A"), pschema))
  }

  test("decimal partition values compare numerically, not as strings") {
    // "10.00" vs literal 10 — a string compare would wrongly prune
    assert(keep(EqualTo("price", new java.math.BigDecimal("10")),
      Map("price" -> "10.00")))
    assert(keep(GreaterThan("price", new java.math.BigDecimal("9.99")),
      Map("price" -> "10.00")))
    assert(!keep(EqualTo("price", new java.math.BigDecimal("10.01")),
      Map("price" -> "10.00")))
    assert(PartitionValues.isExact(
      EqualTo("price", new java.math.BigDecimal("10")), pschema))
  }

  test("undecidable shapes keep the file and are not exact") {
    // unsupported filter shape: unknown column reference
    assert(keep(EqualTo("nope", "A"), Map("flag" -> "A")))
    assert(!PartitionValues.isExact(EqualTo("nope", "A"), pschema))
    // NOT over a null comparison follows SQL three-valued logic:
    // NULL != 'A' is unknown → rows not selected → file prunable
    assert(!keep(Not(EqualTo("flag", "A")), Map("flag" -> null)))
    // but NOT over a definite false keeps
    assert(keep(Not(EqualTo("flag", "B")), Map("flag" -> "A")))
  }

  test("SQL NULL at top level prunes; IN handles null members") {
    // pushed conjunct evaluating to NULL selects no rows
    assert(!keep(GreaterThan("n", 5), Map("n" -> null)))
    assert(keep(In("flag", Array("A", null)), Map("flag" -> "A")))
    assert(!keep(In("flag", Array("B", null)), Map("flag" -> "A")))
    assert(!PartitionValues.isExact(In("flag", Array("B", null)), pschema))
  }

  test("partition-only classification is case-insensitive") {
    assert(PartitionValues.isPartitionOnly(
      EqualTo("FLAG", "A"), Set("flag")))
    assert(!PartitionValues.isPartitionOnly(
      And(EqualTo("flag", "A"), EqualTo("other", 1)), Set("flag")))
  }

  test("toInternalRow casts to declared types") {
    val row = PartitionValues.toInternalRow(
      Map("flag" -> "A", "n" -> "42", "day" -> "2024-06-01"), pschema)
    assert(row.getUTF8String(0).toString == "A")
    assert(row.getInt(1) == 42)
    assert(row.getInt(2) == java.time.LocalDate.of(2024, 6, 1).toEpochDay.toInt)
  }
}
