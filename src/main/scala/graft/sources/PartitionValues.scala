package graft.sources

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Typed handling of Delta Sharing `partitionValues` (string → column
  * type), plus exact client-side evaluation of partition predicates
  * against each file.
  *
  * The reference parses `partitionValues` but never re-materializes
  * them as output columns, and relies on the server honoring
  * advisory `jsonPredicateHints` for pruning
  * (`/root/reference/src/duck_delta_share_extension.cpp:584-592`,
  * SURVEY.md §1.2). Here both gaps are closed: values are cast to the
  * declared partition schema and attached as constant columns per
  * input partition, and partition predicates are re-checked
  * client-side so pruning is exact regardless of server behavior.
  *
  * Evaluation is SQL three-valued ([[evalSql]]) with an explicit
  * "not decidable client-side" outer state, so the scan can tell
  * Spark precisely which pushed filters are fully applied
  * ([[isExact]]) and which must be re-evaluated as residuals —
  * a filter shape this evaluator can't decide is never silently
  * treated as applied.
  */
object PartitionValues {

  /** Cast one partition-value string to the Spark internal value for
    * `dt` (Catalyst `Cast` gives Delta/Spark-consistent semantics). */
  def castInternal(raw: String, dt: DataType): Any =
    if (raw == null) null
    else Cast(Literal(UTF8String.fromString(raw), StringType), dt,
      Some("UTC")).eval(InternalRow.empty)

  /** InternalRow of the file's partition values in `partitionSchema`
    * field order — consumed by the parquet reader closure to append
    * partition columns. */
  def toInternalRow(values: Map[String, String],
      partitionSchema: StructType): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
      castInternal(values.getOrElse(f.name, null), f.dataType)
    })

  /** External (driver-side) typed value for predicate evaluation.
    * Numeric → Long/Double, decimal → BigDecimal, date → epoch day,
    * timestamp → epoch MICROS (milli precision would let two distinct
    * literals collide and break exactness claims). */
  private def castExternal(raw: String, dt: DataType): Any =
    if (raw == null) null
    else dt match {
      case BooleanType => raw.trim.toBoolean
      case ByteType | ShortType | IntegerType | LongType => raw.trim.toLong
      case FloatType | DoubleType => raw.trim.toDouble
      case _: DecimalType => new java.math.BigDecimal(raw.trim)
      case DateType => LocalDate.parse(raw).toEpochDay
      case _: TimestampType =>
        // Delta partition values render timestamps as
        // "yyyy-MM-dd HH:mm:ss[.S…]" or ISO-8601
        val iso = if (raw.contains("T")) raw else raw.replace(' ', 'T')
        val withZone = if (iso.endsWith("Z") || iso.contains("+")) iso else iso + "Z"
        toMicros(Instant.parse(withZone))
      case _ => raw
    }

  private def toMicros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** Normalize a Spark Filter literal to the same comparable domain
    * as [[castExternal]]. */
  private def normalizeLiteral(v: Any, dt: DataType): Any = v match {
    case null => null
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: LocalDate => d.toEpochDay
    case t: java.sql.Timestamp => toMicros(t.toInstant)
    case i: Instant => toMicros(i)
    case b: java.math.BigDecimal => b
    case b: BigDecimal => b.underlying
    case n: java.lang.Number => dt match {
      case _: DecimalType => new java.math.BigDecimal(n.toString)
      case FloatType | DoubleType => n.doubleValue()
      case _ => n.longValue()
    }
    case b: Boolean => b
    case s => s.toString
  }

  /** Typed comparison; None when the operand domains don't line up
    * (never falls back to lexicographic toString comparison — a
    * "10.00" vs 10 string compare would wrongly prune files). */
  private def compare(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: Long, y: Double) => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Long) => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
      Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None
  }

  /** SQL three-valued evaluation of a partition predicate against one
    * file's partition values.
    *
    *  - outer `None`: the shape/type is not decidable client-side —
    *    the file must be kept AND the filter must stay a residual;
    *  - `Some(None)`: the predicate is SQL NULL for this file (every
    *    row shares the partition value, so as a pushed top-level
    *    conjunct the file's rows are not selected);
    *  - `Some(Some(b))`: definite boolean.
    */
  def evalSql(f: Filter, values: Map[String, String],
      partitionSchema: StructType): Option[Option[Boolean]] = {
    def typed(col: String): Option[(Any, DataType)] =
      partitionSchema.fields.find(_.name.equalsIgnoreCase(col)).map { fld =>
        (castExternal(values.getOrElse(fld.name, null), fld.dataType),
          fld.dataType)
      }
    def cmp(col: String, v: Any)(test: Int => Boolean)
        : Option[Option[Boolean]] =
      typed(col) match {
        case None => None // unknown column: not decidable
        case Some((pv, dt)) =>
          val lit = normalizeLiteral(v, dt)
          if (pv == null || lit == null) Some(None) // SQL NULL
          else compare(pv, lit) match {
            case Some(c) => Some(Some(test(c)))
            case None => None // incomparable domains: not decidable
          }
      }
    def strOp(col: String)(test: String => Boolean): Option[Option[Boolean]] =
      typed(col) match {
        case None => None
        case Some((pv, _)) =>
          if (pv == null) Some(None)
          else Some(Some(test(pv.toString)))
      }
    f match {
      case AlwaysTrue() => Some(Some(true))
      case AlwaysFalse() => Some(Some(false))
      case EqualTo(c, v) => cmp(c, v)(_ == 0)
      case EqualNullSafe(c, v) =>
        typed(c) match {
          case None => None
          case Some((pv, dt)) =>
            val lit = normalizeLiteral(v, dt)
            if (pv == null && lit == null) Some(Some(true))
            else if (pv == null || lit == null) Some(Some(false))
            else compare(pv, lit).map(r => Some(r == 0))
        }
      case LessThan(c, v) => cmp(c, v)(_ < 0)
      case GreaterThan(c, v) => cmp(c, v)(_ > 0)
      case LessThanOrEqual(c, v) => cmp(c, v)(_ <= 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v)(_ >= 0)
      case In(c, vs) =>
        // SQL IN: TRUE on any match; NULL if no match but some
        // comparison was NULL; FALSE only when all definite non-matches
        val results = vs.toSeq.map(v => cmp(c, v)(_ == 0))
        if (results.contains(Some(Some(true)))) Some(Some(true))
        else if (results.contains(None)) None
        else if (results.contains(Some(None))) Some(None)
        else Some(Some(false))
      case IsNull(c) =>
        typed(c).map { case (pv, _) => Some(pv == null) }
      case IsNotNull(c) =>
        typed(c).map { case (pv, _) => Some(pv != null) }
      case And(l, r) =>
        (evalSql(l, values, partitionSchema),
          evalSql(r, values, partitionSchema)) match {
          // a definite FALSE dominates even an undecidable other side
          case (Some(Some(false)), _) | (_, Some(Some(false))) =>
            Some(Some(false))
          case (Some(a), Some(b)) => Some(kleeneAnd(a, b))
          case _ => None
        }
      case Or(l, r) =>
        (evalSql(l, values, partitionSchema),
          evalSql(r, values, partitionSchema)) match {
          case (Some(Some(true)), _) | (_, Some(Some(true))) =>
            Some(Some(true))
          case (Some(a), Some(b)) => Some(kleeneOr(a, b))
          case _ => None
        }
      case Not(inner) =>
        evalSql(inner, values, partitionSchema).map(_.map(!_))
      case StringStartsWith(c, p) => strOp(c)(_.startsWith(p))
      case StringEndsWith(c, p) => strOp(c)(_.endsWith(p))
      case StringContains(c, p) => strOp(c)(_.contains(p))
      case _ => None
    }
  }

  private def kleeneAnd(a: Option[Boolean], b: Option[Boolean]) =
    (a, b) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }

  private def kleeneOr(a: Option[Boolean], b: Option[Boolean]) =
    (a, b) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }

  /** Keep-file decision for pruning. Sound for any filter Spark pushed
    * as a top-level conjunct: definite FALSE and SQL NULL both mean no
    * row in the file is selected; an undecidable shape keeps the file. */
  def evalFilter(f: Filter, values: Map[String, String],
      partitionSchema: StructType): Boolean =
    evalSql(f, values, partitionSchema) match {
      case Some(Some(keep)) => keep
      case Some(None) => false // SQL NULL: conjunct selects no rows
      case None => true // not decidable: pruning must stay sound
    }

  /** Is `f` a shape [[evalSql]] decides for every possible partition
    * value (never outer-None)? Only such filters may be reported to
    * Spark as fully applied by file pruning. */
  def isExact(f: Filter, partitionSchema: StructType): Boolean = {
    def field(c: String): Option[DataType] =
      partitionSchema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
    def comparableField(c: String): Boolean = field(c).exists {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | DateType | StringType => true
      case _: DecimalType | _: TimestampType => true
      case _ => false
    }
    def stringField(c: String): Boolean = field(c).contains(StringType)
    f match {
      case AlwaysTrue() | AlwaysFalse() => true
      case EqualTo(c, v) => v != null && comparableField(c)
      case EqualNullSafe(c, _) => comparableField(c)
      case LessThan(c, v) => v != null && comparableField(c)
      case GreaterThan(c, v) => v != null && comparableField(c)
      case LessThanOrEqual(c, v) => v != null && comparableField(c)
      case GreaterThanOrEqual(c, v) => v != null && comparableField(c)
      case In(c, vs) => vs.forall(_ != null) && comparableField(c)
      case IsNull(c) => field(c).isDefined
      case IsNotNull(c) => field(c).isDefined
      case StringStartsWith(c, _) => stringField(c)
      case StringEndsWith(c, _) => stringField(c)
      case StringContains(c, _) => stringField(c)
      case And(l, r) =>
        isExact(l, partitionSchema) && isExact(r, partitionSchema)
      case Or(l, r) =>
        isExact(l, partitionSchema) && isExact(r, partitionSchema)
      case Not(inner) => isExact(inner, partitionSchema)
      case _ => false
    }
  }

  /** Does `f` reference only partition columns? (Partition/data filter
    * separation — reference O12 done with typed references instead of
    * textual extraction, `duck_delta_share_extension.cpp:118-124`.) */
  def isPartitionOnly(f: Filter, partitionCols: Set[String]): Boolean =
    f.references.forall(r => partitionCols.exists(_.equalsIgnoreCase(r)))
}
