package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Spark data-source `Filter` → Delta Sharing `jsonPredicateHints`.
  *
  * Grammar mirrors what the reference emits
  * (`/root/reference/src/duck_delta_share_extension.cpp:264-425`):
  * ops `equal, lessThan, greaterThan, lessThanOrEqual,
  * greaterThanOrEqual, isNull, not, and, or`; operand leaves
  * `{"op":"column","name":…,"valueType":…}` and
  * `{"op":"literal","value":…,"valueType":…}`.
  *
  * Two deliberate fidelity fixes over the reference:
  *  - valueType carries the real Delta type (`bool/int/long/float/
  *    double/string/date/timestamp`) instead of collapsing everything
  *    to {int,string} (`duck_delta_share_extension.cpp:271-283` is
  *    lossy and breaks server pruning on dates);
  *  - untranslatable filters are *reported back* to Spark as residuals
  *    rather than silently dropped (the reference consumes every
  *    filter at `duck_delta_share_extension.cpp:492`, returning wrong
  *    results for shapes its walker doesn't handle — README admits
  *    "Filters might not work as expected").
  */
object PredicateHints {
  private val mapper = new ObjectMapper()

  /** Delta predicate valueType for a column's Spark type; None when
    * the type can't be hinted (the filter is then untranslatable). */
  private def valueType(dt: DataType): Option[String] = dt match {
    case BooleanType => Some("bool")
    case ByteType | ShortType | IntegerType => Some("int")
    case LongType => Some("long")
    case FloatType => Some("float")
    case DoubleType => Some("double")
    case StringType => Some("string")
    case DateType => Some("date")
    case _: TimestampType => Some("timestamp")
    case _ => None
  }

  private def literalText(v: Any): String = v match {
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toInstant.toString
    case i: java.time.LocalDate => i.toString
    case i: java.time.Instant => i.toString
    case other => String.valueOf(other)
  }

  private def column(name: String, vt: String): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("op", "column"); n.put("name", name); n.put("valueType", vt)
    n
  }

  private def literal(v: Any, vt: String): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("op", "literal"); n.put("value", literalText(v)); n.put("valueType", vt)
    n
  }

  private def op(name: String, children: Seq[ObjectNode]): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("op", name)
    val arr = n.putArray("children")
    children.foreach(arr.add)
    n
  }

  private def unaryColOp(opName: String, col: String, schema: StructType,
      wrapNot: Boolean): Option[ObjectNode] =
    fieldType(schema, col).flatMap(valueType).map { vt =>
      val inner = op(opName, Seq(column(col, vt)))
      if (wrapNot) op("not", Seq(inner)) else inner
    }

  private def fieldType(schema: StructType, name: String): Option[DataType] =
    schema.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)

  private def binary(opName: String, col: String, value: Any,
      schema: StructType): Option[ObjectNode] =
    fieldType(schema, col).flatMap(valueType).map { vt =>
      op(opName, Seq(column(col, vt), literal(value, vt)))
    }

  /** Translate one Spark filter; None = not expressible in the hint
    * grammar (caller keeps it as a residual). */
  def translate(f: Filter, schema: StructType): Option[ObjectNode] = f match {
    case EqualTo(c, v) => binary("equal", c, v, schema)
    case LessThan(c, v) => binary("lessThan", c, v, schema)
    case GreaterThan(c, v) => binary("greaterThan", c, v, schema)
    case LessThanOrEqual(c, v) => binary("lessThanOrEqual", c, v, schema)
    case GreaterThanOrEqual(c, v) => binary("greaterThanOrEqual", c, v, schema)
    case Not(EqualTo(c, v)) =>
      binary("equal", c, v, schema).map(e => op("not", Seq(e)))
    case IsNull(c) => unaryColOp("isNull", c, schema, wrapNot = false)
    case IsNotNull(c) => unaryColOp("isNull", c, schema, wrapNot = true)
    case In(c, vs) if vs.nonEmpty =>
      // IN → or(equal…), as the reference renders element-wise
      // (`duck_delta_share_extension.cpp:197-229`)
      val eqs = vs.toSeq.filter(_ != null).map(v => binary("equal", c, v, schema))
      if (eqs.exists(_.isEmpty) || eqs.isEmpty) None
      else if (eqs.size == 1) eqs.head
      else Some(op("or", eqs.flatten))
    case And(l, r) =>
      (translate(l, schema), translate(r, schema)) match {
        case (Some(a), Some(b)) => Some(op("and", Seq(a, b)))
        // one conjunct still prunes soundly on its own
        case (Some(a), None) => Some(a)
        case (None, Some(b)) => Some(b)
        case _ => None
      }
    case Or(l, r) =>
      // OR is only sound if BOTH sides translate
      for {a <- translate(l, schema); b <- translate(r, schema)}
        yield op("or", Seq(a, b))
    case _ => None
  }

  /** Legacy SQL-string `predicateHints` entries for partition filters.
    * Older servers prune on this field only; the reference always
    * sends it (as a literal placeholder,
    * `delta_sharing_client.cpp:381-384`). Advisory, so only simple
    * shapes are rendered; everything else is simply not hinted —
    * client-side pruning stays the exact gate either way. */
  def legacyHints(filters: Seq[Filter], schema: StructType): Seq[String] =
    filters.flatMap(legacySql(_, schema))

  private def legacySql(f: Filter, schema: StructType): Option[String] = {
    def lit(v: Any): String = v match {
      case null => "NULL"
      case _: java.lang.Number | _: java.lang.Boolean => String.valueOf(v)
      case other =>
        "'" + literalText(other).replace("'", "''") + "'"
    }
    def known(c: String): Boolean = fieldType(schema, c).isDefined
    f match {
      case EqualTo(c, v) if known(c) => Some(s"$c = ${lit(v)}")
      case LessThan(c, v) if known(c) => Some(s"$c < ${lit(v)}")
      case GreaterThan(c, v) if known(c) => Some(s"$c > ${lit(v)}")
      case LessThanOrEqual(c, v) if known(c) => Some(s"$c <= ${lit(v)}")
      case GreaterThanOrEqual(c, v) if known(c) => Some(s"$c >= ${lit(v)}")
      case IsNull(c) if known(c) => Some(s"$c IS NULL")
      case IsNotNull(c) if known(c) => Some(s"$c IS NOT NULL")
      case In(c, vs) if known(c) && vs.nonEmpty && vs.forall(_ != null) =>
        Some(s"$c IN (${vs.map(lit).mkString(", ")})")
      case And(l, r) =>
        (legacySql(l, schema), legacySql(r, schema)) match {
          case (Some(a), Some(b)) => Some(s"($a) AND ($b)")
          case (Some(a), None) => Some(a) // one conjunct still prunes
          case (None, Some(b)) => Some(b)
          case _ => None
        }
      case Or(l, r) =>
        for { a <- legacySql(l, schema); b <- legacySql(r, schema) }
          yield s"($a) OR ($b)"
      case _ => None
    }
  }

  /** Combine all translatable filters under a single `and` (the
    * reference's `GetPredicateHints`,
    * `duck_delta_share_extension.cpp:409-425`); returns the JSON text
    * plus the filters that did NOT translate (residuals). */
  def buildHints(filters: Seq[Filter], schema: StructType)
      : (Option[String], Seq[Filter]) = {
    val (translated, residual) = filters.map(f => f -> translate(f, schema))
      .partition(_._2.isDefined)
    val hint = translated.map(_._2.get) match {
      case Seq() => None
      case Seq(single) => Some(mapper.writeValueAsString(single))
      case many => Some(mapper.writeValueAsString(op("and", many)))
    }
    (hint, residual.map(_._1))
  }
}
