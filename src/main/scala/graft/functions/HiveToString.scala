package graft.functions

import java.time.ZoneId

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, DateFormatter, MapData, TimestampFormatter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive's complex-and-interval CAST-to-STRING rendering (ref
  * serde2/SerDeUtils.java:206 buildJSONString, the path every Hive
  * complex→string conversion takes — udf_to_string.q pins it):
  *
  *  - arrays `[e1,e2,...]`, maps `{k:v,...}`, structs
  *    `{"field":v,...}`, uniontype `{tag:v}` (our encoding is the
  *    SURVEY §1.2 struct<tag:tinyint,fieldN...> — detected by shape);
  *  - inner strings/char/varchar QUOTED with the reference's escape
  *    table (serde2/SerDeUtils.java escapeString: `"` `\` and the
  *    JSON control escapes), dates/timestamps quoted in Hive's
  *    display format, numbers/booleans bare (booleans LOWERCASE here
  *    — the scalar cast's TextConverter answers TRUE/FALSE uppercase,
  *    see [[graft.plans.HiveCastRendering]]), inner NULLs the literal
  *    `null`;
  *  - intervals render bare in HiveIntervalYearMonth /
  *    HiveIntervalDayTime.toString form (`1-2`,
  *    `17624 00:30:30.000000000`) at any nesting level, top level
  *    included.
  *
  * A driver-built rendering of the value tree — inherently string
  * concatenation over arbitrary nesting, so CodegenFallback rather
  * than a generated kernel; never on a scan/join hot path (it exists
  * only where a query spells such a cast).
  */
case class HiveToString(child: Expression, zoneIdStr: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  @transient private lazy val zoneId = ZoneId.of(zoneIdStr)
  @transient private lazy val tsFormatter =
    TimestampFormatter.getFractionFormatter(zoneId)
  @transient private lazy val dateFormatter = DateFormatter()

  override def nullSafeEval(v: Any): Any = {
    val sb = new java.lang.StringBuilder
    render(sb, v, child.dataType)
    UTF8String.fromString(sb.toString)
  }

  /** ref serde2/SerDeUtils.java escapeString */
  private def escape(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' | '\\' => sb.append('\\').append(c)
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < ' ' =>
          val hex = Integer.toHexString(c)
          sb.append("\\u")
          var j = hex.length; while (j < 4) { sb.append('0'); j += 1 }
          sb.append(hex)
        case _ => sb.append(c)
      }
      i += 1
    }
  }

  /** Is this struct our uniontype encoding (SURVEY §1.2)? */
  private def unionShape(st: StructType): Boolean =
    st.fields.length >= 2 && st.fields.head.name == "tag" &&
      st.fields.head.dataType == ByteType &&
      st.fields.tail.zipWithIndex.forall { case (f, i) =>
        f.name == s"field$i"
      }

  private def render(sb: java.lang.StringBuilder, v: Any,
      dt: DataType): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case BooleanType =>
        sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case ByteType | ShortType | IntegerType | LongType | FloatType |
          DoubleType =>
        sb.append(v.toString)
      case _: DecimalType =>
        // HiveDecimal normalizes away trailing zeros
        sb.append(v.asInstanceOf[Decimal].toJavaBigDecimal
          .stripTrailingZeros.toPlainString)
      case _: StringType =>
        sb.append('"'); escape(sb, v.toString); sb.append('"')
      case DateType =>
        sb.append('"')
        sb.append(dateFormatter.format(v.asInstanceOf[Int]))
        sb.append('"')
      case TimestampType | TimestampNTZType =>
        sb.append('"')
        sb.append(tsFormatter.format(v.asInstanceOf[Long]))
        sb.append('"')
      case BinaryType =>
        sb.append(new String(v.asInstanceOf[Array[Byte]], "UTF-8"))
      case _: YearMonthIntervalType =>
        val months = v.asInstanceOf[Int]
        val a = math.abs(months.toLong)
        if (months < 0) sb.append('-')
        sb.append(a / 12).append('-').append(a % 12)
      case _: DayTimeIntervalType =>
        val micros = v.asInstanceOf[Long]
        val a = math.abs(micros) // micros, so no Long.MinValue concern in practice
        if (micros < 0) sb.append('-')
        val secs = a / 1000000L
        val nanos = (a % 1000000L) * 1000L
        sb.append(secs / 86400).append(' ')
        sb.append(f"${secs / 3600 % 24}%02d:${secs / 60 % 60}%02d:" +
          f"${secs % 60}%02d.$nanos%09d")
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(',')
          render(sb, if (arr.isNullAt(i)) null else arr.get(i, et), et)
          i += 1
        }
        sb.append(']')
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val (ks, vs) = (m.keyArray(), m.valueArray())
        sb.append('{')
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(',')
          render(sb, if (ks.isNullAt(i)) null else ks.get(i, kt), kt)
          sb.append(':')
          render(sb, if (vs.isNullAt(i)) null else vs.get(i, vt), vt)
          i += 1
        }
        sb.append('}')
      case st: StructType if unionShape(st) =>
        val row = v.asInstanceOf[InternalRow]
        if (row.isNullAt(0)) { sb.append("null"); return }
        val tag = row.getByte(0)
        sb.append('{').append(tag.toInt).append(':')
        val f = st.fields(tag + 1)
        render(sb, if (row.isNullAt(tag + 1)) null
          else row.get(tag + 1, f.dataType), f.dataType)
        sb.append('}')
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        sb.append('{')
        var i = 0
        while (i < st.fields.length) {
          if (i > 0) sb.append(',')
          sb.append('"').append(st.fields(i).name).append("\":")
          render(sb, if (row.isNullAt(i)) null
            else row.get(i, st.fields(i).dataType), st.fields(i).dataType)
          i += 1
        }
        sb.append('}')
      case other =>
        sb.append(String.valueOf(v))
    }
  }
}
