package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** SQL:2016 `CAST(<value> AS <type> FORMAT '<pattern>')` — the
  * reference's `cast_format` (ref FunctionRegistry.java:650,
  * ql/udf/generic/GenericUDFCastFormat.java, token table in
  * common/format/datetime/HiveSqlDateTimeFormatter.java:422).
  *
  * Surface here: `cast_format(value, '<type>', '<pattern>')` where type
  * is `string`, `char(n)`, `varchar(n)`, `date` or `timestamp` — the
  * five output types the reference permits — plus the
  * `CAST(x AS t FORMAT 'p')` spelling via the Engine front door.
  *
  * SQL:2016 tokens are CASE-INSENSITIVE and collide with Java's pattern
  * letters in the worst way (`MM` is month in both, but SQL's `MI` is
  * minute where Java's `mm` is; SQL's `mm` is MONTH), so translation is
  * table-driven off a longest-match tokenizer, never string surgery on
  * the raw pattern.
  *
  * Datetime→string builds a `concat` of per-token `date_format` pieces:
  * that keeps everything codegen'd AND preserves the reference's output
  * case rule for text tokens (`MON`→`JUL`, `Mon`→`Jul`, `mon`→`jul` —
  * a single Java pattern can't express that). String→datetime builds
  * one Spark datetime pattern and parses through `to_timestamp`/
  * `to_date` semantics (NULL on unparseable input, Hive's behavior).
  *
  * Scope (documented, fail-loud): the exotic fill-rule tokens (`yyy`/
  * `y` on the PARSE side — `rr`'s pivot IS implemented, see
  * [[rrAdjust]]) raise an error rather than silently mis-translating.
  * r17 closed the previously-refused tails: ISO week dates parse when
  * the pattern's field tokens are exactly `iyyy`/`iw`/`id` (the
  * reference's own requiredness rule — see [[isoWeekParse]]), and a
  * TRAILING `tzh`/`tzm` run parses-and-discards the offset exactly as
  * the reference does ([[tzStripped]]); tz tokens elsewhere, and on
  * the FORMAT side (where the reference refuses them for zone-agnostic
  * types too), still fail loud.
  */
object CastFormat {

  private case class Tok(sql: String, isText: Boolean)

  /** Longest-match-first SQL:2016 token table (subset; see scaladoc). */
  private val Tokens: Seq[String] = Seq(
    "sssss", "month", "a.m.", "p.m.", "yyyy", "rrrr", "iyyy", "ff1", "ff2",
    "ff3", "ff4", "ff5", "ff6", "ff7", "ff8", "ff9", "ddd", "mon", "day",
    "tzh", "tzm", "hh24", "hh12", "yyy", "iyy", "yy", "rr", "iy", "mm",
    "dd", "hh", "mi", "ss", "ff", "am", "pm", "dy", "ww", "iw", "id",
    "q", "w", "d", "y", "i")
    .sortBy(-_.length)

  private val TextTokens = Set("mon", "month", "day", "dy", "am", "pm",
    "a.m.", "p.m.")

  /** Pattern → (token-or-literal) stream. Literals are separators
    * (punctuation/space) and double-quoted runs; unknown letters are an
    * error, as in the reference's formatter.
    */
  private def tokenize(pattern: String): Seq[scala.util.Either[String, String]] = {
    val out = scala.collection.mutable.ArrayBuffer[scala.util.Either[String, String]]()
    var i = 0
    val lower = pattern.toLowerCase(Locale.ROOT)
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '"') { // "quoted literal text" passes through verbatim
        val end = pattern.indexOf('"', i + 1)
        require(end >= 0, s"unterminated quoted literal in format: $pattern")
        out += scala.util.Right(pattern.substring(i + 1, end))
        i = end + 1
      } else if (!c.isLetter) {
        out += scala.util.Right(c.toString)
        i += 1
      } else {
        Tokens.find(t => lower.startsWith(t, i)) match {
          case Some(t) =>
            out += scala.util.Left(pattern.substring(i, i + t.length))
            i += t.length
          case None => throw new IllegalArgumentException(
            s"cast_format: unknown SQL:2016 token at '${pattern.substring(i)}'")
        }
      }
    }
    out.toSeq
  }

  /** Case rule for text tokens: output follows the PATTERN's case. */
  private def cased(tok: String, e: Expression): Expression =
    if (tok.forall(c => !c.isLetter || c.isUpper)) Upper(e)
    else if (tok.charAt(0).isUpper) e // Java's MMM/EEE emit capitalized
    else Lower(e)

  private def fmt(x: Expression, p: String): Expression =
    DateFormatClass(Cast(x, TimestampType), Literal(p))

  private def pad2(e: Expression): Expression =
    StringLPad(Cast(e, StringType), Literal(2), Literal("0"))

  /** One token → one string-typed piece of the formatted output. */
  private def piece(tokRaw: String, x: Expression): Expression = {
    val tok = tokRaw.toLowerCase(Locale.ROOT)
    tok match {
      case "yyyy" | "rrrr" => fmt(x, "yyyy")
      case "yyy" => Substring(fmt(x, "yyyy"), Literal(2), Literal(3))
      case "yy" | "rr" => Substring(fmt(x, "yyyy"), Literal(3), Literal(2))
      case "y" => Substring(fmt(x, "yyyy"), Literal(4), Literal(1))
      case "mm" => fmt(x, "MM")
      case "dd" => fmt(x, "dd")
      case "ddd" => fmt(x, "DDD")
      case "hh" | "hh12" => fmt(x, "hh")
      case "hh24" => fmt(x, "HH")
      case "mi" => fmt(x, "mm")
      case "ss" => fmt(x, "ss")
      case "sssss" => // second of day, 5 digits (Hive zero-pads)
        val t = Cast(x, TimestampType)
        StringLPad(Cast(
          Add(Add(Multiply(Hour(t), Literal(3600)),
            Multiply(Minute(t), Literal(60))), Second(t)),
          StringType), Literal(5), Literal("0"))
      case f if f.startsWith("ff") =>
        val digits = if (f == "ff") 6 else f.substring(2).toInt
        // Spark timestamps are micros: truncate/pad to the asked width
        fmt(x, "S" * math.min(digits, 6)) match {
          case s if digits > 6 =>
            Concat(Seq(s, Literal("0" * (digits - 6))))
          case s => s
        }
      case "am" | "pm" => cased(tokRaw, fmt(x, "a"))
      case "a.m." | "p.m." =>
        val a = fmt(x, "a")
        cased(tokRaw, Concat(Seq(
          Substring(a, Literal(1), Literal(1)), Literal("."),
          Substring(a, Literal(2), Literal(1)), Literal("."))))
      case "mon" => cased(tokRaw, fmt(x, "MMM"))
      case "month" => cased(tokRaw, fmt(x, "MMMM"))
      case "dy" => cased(tokRaw, fmt(x, "EEE"))
      case "day" => cased(tokRaw, fmt(x, "EEEE"))
      case "q" => Cast(Quarter(Cast(x, DateType)), StringType)
      case "ww" => // aligned week of year: ((dayOfYear-1)/7)+1, 2 digits
        pad2(Add(IntegralDivide(
          Subtract(DayOfYear(Cast(x, DateType)), Literal(1)),
          Literal(7), evalMode = EvalMode.LEGACY), Literal(1L)))
      case "w" => // aligned week of month
        Cast(Add(IntegralDivide(
          Subtract(DayOfMonth(Cast(x, DateType)), Literal(1)),
          Literal(7), evalMode = EvalMode.LEGACY), Literal(1L)), StringType)
      case "iw" => pad2(WeekOfYear(Cast(x, DateType)))
      case "id" => // ISO day of week, Monday = 1
        Cast(Add(WeekDay(Cast(x, DateType)), Literal(1)), StringType)
      case "d" => // Sunday-start day of week 1..7
        Cast(DayOfWeek(Cast(x, DateType)), StringType)
      case "tzh" | "tzm" => throw new IllegalArgumentException(
        "cast_format: TZH/TZM need a zoned timestamp — the reference " +
          "refuses them on timestamp too (GenericUDFCastFormat TIMESTAMPLOCALTZ check)")
      case other => throw new IllegalArgumentException(
        s"cast_format: token '$other' is not supported for output formatting")
    }
  }

  /** String→datetime: one Spark datetime-pattern string. Width-faithful
    * for adjacent digit runs (`hh24miss`), single-token widths otherwise
    * match the reference's digit-greedy reads closely enough for the
    * delimited patterns its tests use.
    */
  private def parsePattern(pattern: String): String = {
    val sb = new StringBuilder
    tokenize(pattern).foreach {
      case scala.util.Right(lit) =>
        if (lit.exists(_.isLetter)) sb.append("'").append(lit).append("'")
        else sb.append(lit)
      case scala.util.Left(tokRaw) =>
        val tok = tokRaw.toLowerCase(Locale.ROOT)
        sb.append(tok match {
          case "yyyy" | "rrrr" => "yyyy"
          case "yy" | "rr" => "yy"
          case "mm" => "MM"
          case "dd" => "dd"
          case "ddd" => "DDD"
          case "hh" | "hh12" => "hh"
          case "hh24" => "HH"
          case "mi" => "mm"
          case "ss" => "ss"
          case f if f.startsWith("ff") => "S" * 6
          case "am" | "pm" => "a"
          case "mon" => "MMM"
          case "month" => "MMMM"
          case "dy" => "EEE"
          case "day" => "EEEE"
          case other => throw new IllegalArgumentException(
            s"cast_format: token '$other' is not supported for parsing " +
              "(the reference's year fill rules for yyy/y diverge " +
              "from positional parses — spell the full-width token)")
        })
    }
    sb.toString
  }

  /** Whether the parse pattern carries the two-digit `rr` token (not
    * `rrrr`), which needs the pivot-year adjustment below.
    */
  private def hasRr(pattern: String): Boolean =
    tokenize(pattern).exists {
      case scala.util.Left(t) => t.toLowerCase(Locale.ROOT) == "rr"
      case _ => false
    }

  /** The SQL:2016 `RR` two-digit-year pivot (ref common/format/datetime/
    * HiveSqlDateTimeFormatter.java:112-119): the output century depends
    * on BOTH the 2-digit input and the current year's last two digits —
    *   input 0-49,  current 00-49 → current century
    *   input 0-49,  current 50-99 → current century + 1
    *   input 50-99, current 00-49 → current century - 1
    *   input 50-99, current 50-99 → current century.
    * Spark's `yy` parse fixes 2000-2099, so the parsed result shifts by
    * whole years ((target - parsed) as a year-month interval; NULL
    * parses propagate). Pinned by TestHiveSqlDateTimeFormatter:
    * rr '00'→2000, '49'→2049, '50'→1950, '99'→1999 (current year 20xx).
    */
  private def rrAdjust(parsed: Expression, toDate: Boolean): Expression = {
    val v = Pmod(Year(parsed), Literal(100)) // the 2-digit input
    val cur = Year(CurrentDate())
    val c = Cast(IntegralDivide(cur, Literal(100L)), IntegerType)
    val l = Pmod(cur, Literal(100))
    val centuryOut = If(LessThanOrEqual(v, Literal(49)),
      If(LessThanOrEqual(l, Literal(49)), c, Add(c, Literal(1))),
      If(LessThanOrEqual(l, Literal(49)), Subtract(c, Literal(1)), c))
    val target = Add(Multiply(centuryOut, Literal(100)), v)
    val delta = MakeYMInterval(Subtract(target, Year(parsed)), Literal(0))
    if (toDate) DateAddYMInterval(parsed, delta)
    else TimestampAddYMInterval(parsed, delta)
  }

  /** Build the cast_format expression. `targetType` is a literal type
    * spelling: string | char(n) | varchar(n) | date | timestamp.
    */
  def build(args: Seq[Expression]): Expression = {
    require(args.size == 3,
      "cast_format(value, 'type', 'format') takes three arguments")
    val value = args.head
    def litStr(e: Expression, what: String): String = e match {
      case Literal(s, StringType) if s != null => s.toString
      case _ => throw new IllegalArgumentException(
        s"cast_format: $what must be a string literal")
    }
    val typeSpec = litStr(args(1), "the target type").trim
      .toLowerCase(Locale.ROOT)
    val pattern = litStr(args(2), "the format pattern")
    val CharRe = """char\s*\(\s*(\d+)\s*\)""".r
    val VarcharRe = """varchar\s*\(\s*(\d+)\s*\)""".r
    typeSpec match {
      case "string" => formatted(value, pattern)
      case VarcharRe(n) => // truncate to n
        Substring(formatted(value, pattern), Literal(1), Literal(n.toInt))
      case CharRe(n) => // truncate AND right-pad to n (CHAR semantics)
        StringRPad(Substring(formatted(value, pattern), Literal(1),
          Literal(n.toInt)), Literal(n.toInt), Literal(" "))
      case "timestamp" =>
        isoWeekParse(value, pattern, toDate = false).getOrElse {
          val parsed = new ParseToTimestamp(tzStripped(value, pattern),
            Literal(parsePattern(stripTzTail(pattern))))
          if (hasRr(pattern)) rrAdjust(parsed, toDate = false) else parsed
        }
      case "date" =>
        isoWeekParse(value, pattern, toDate = true).getOrElse {
          val parsed = new ParseToDate(tzStripped(value, pattern),
            Literal(parsePattern(stripTzTail(pattern))))
          if (hasRr(pattern)) rrAdjust(parsed, toDate = true) else parsed
        }
      case other => throw new IllegalArgumentException(
        s"cast_format: unsupported target type '$other' (string, " +
          "char(n), varchar(n), date, timestamp)")
    }
  }

  // ---- ISO week-date parse (iyyy/iw/id) and TZ-offset parse (r17) ----

  private val TzToks = Set("tzh", "tzm")
  private val IsoToks = Set("iyyy", "iw", "id")

  private def lower(t: String): String = t.toLowerCase(Locale.ROOT)

  /** The pattern's TRAILING run of tz tokens and separators (reversed
    * back to order), or Nil when the pattern carries no tz tokens. A tz
    * token anywhere ELSE keeps the documented fail-loud refusal (raised
    * by [[parsePattern]]'s unknown-token arm).
    */
  private def tzTail(pattern: String):
      Seq[scala.util.Either[String, String]] = {
    val toks = tokenize(pattern)
    if (!toks.exists { case scala.util.Left(t) => TzToks(lower(t));
        case _ => false }) return Nil
    val tail = toks.reverse.takeWhile {
      case scala.util.Left(t) => TzToks(lower(t))
      case scala.util.Right(_) => true
    }.reverse
    // drop leading separators that belong to the core pattern's end
    tail.dropWhile(_.isRight)
  }

  /** Pattern text with the trailing tz run removed (separators that only
    * preceded it go too). Identity when there is no trailing tz run.
    */
  private def stripTzTail(pattern: String): String = {
    val tail = tzTail(pattern)
    if (tail.isEmpty) return pattern
    // the tz run sits at the very end of the TEXT too (tokens are
    // longest-match over the raw text): cut at the first tz token's
    // text position by rebuilding the prefix from the token stream
    val toks = tokenize(pattern)
    val keep = toks.dropRight(tail.length)
    // also drop the separator run immediately before the tz fields
    val kept = keep.reverse.dropWhile(_.isRight).reverse
    kept.map {
      case scala.util.Left(t) => t
      case scala.util.Right(s) => s
    }.mkString
  }

  /** Strip the input's trailing zone offset when the pattern ends in
    * tzh/tzm (ref HiveSqlDateTimeFormatter: the offset is VALIDATED and
    * then DISCARDED — the parsed timestamp keeps the local fields;
    * TestHiveSqlDateTimeFormatter pins `'2019-1-1 14:00-1:30'` with
    * `'... TZH:TZM'` → `2019-01-01 14:00:00`). Built as a regex over
    * the tail's own separators: tzh = `[+-]?\d{1,2}`, tzm = `\d{1,2}`.
    */
  private def tzStripped(value: Expression, pattern: String): Expression = {
    val tail = tzTail(pattern)
    val base = Cast(value, StringType)
    if (tail.isEmpty) return base
    val rx = new StringBuilder("\\s*")
    tail.foreach {
      case scala.util.Left(t) if lower(t) == "tzh" =>
        rx.append("[+-]?\\d{1,2}")
      case scala.util.Left(_) => rx.append("\\d{1,2}")
      case scala.util.Right(sep) =>
        rx.append(java.util.regex.Pattern.quote(sep))
    }
    rx.append("\\s*$")
    RegExpReplace(base, Literal(rx.toString), Literal(""))
  }

  /** ISO week-date parse: when the pattern's FIELD tokens are exactly
    * {iyyy, iw, id} (any order, separators between), extract the three
    * numbers positionally and rebuild the date from the ISO week
    * calendar — week 1 is the week containing January 4th, Monday
    * first (ref HiveSqlDateTimeFormatter's IYYY/IW/ID contract:
    * requires all three for string→datetime). A week that does not
    * exist in the year (iw=53 in a 52-week year) answers NULL, the
    * engine's documented unparseable-input behavior.
    */
  private def isoWeekParse(value: Expression, pattern: String,
      toDate: Boolean): Option[Expression] = {
    val toks = tokenize(pattern)
    val fields = toks.collect { case scala.util.Left(t) => lower(t) }
    if (fields.isEmpty || !fields.forall(IsoToks)) return None
    require(fields.toSet == IsoToks && fields.size == 3,
      "cast_format: ISO week-date parsing requires exactly iyyy, iw " +
        "and id (ref HiveSqlDateTimeFormatter: IYYY requires IW and " +
        "ID|DAY|DY)")
    val rx = new StringBuilder("^\\s*")
    val order = scala.collection.mutable.ArrayBuffer[String]()
    toks.foreach {
      case scala.util.Left(t) =>
        order += lower(t)
        rx.append(lower(t) match {
          case "iyyy" => "(\\d{1,4})"
          case "iw" => "(\\d{1,2})"
          case _ => "(\\d)"
        })
      case scala.util.Right(sep) =>
        rx.append(java.util.regex.Pattern.quote(sep))
    }
    rx.append("\\s*$")
    val in = Cast(value, StringType)
    def grp(tok: String): Expression =
      Cast(RegExpExtract(in, Literal(rx.toString),
        Literal(order.indexOf(tok) + 1)), IntegerType)
    val (iyyy, iw, id) = (grp("iyyy"), grp("iw"), grp("id"))
    // Jan 4 is always in ISO week 1; WeekDay is Monday = 0
    val jan4 = MakeDate(iyyy, Literal(1), Literal(4))
    val monday1 = DateSub(jan4, WeekDay(jan4))
    val result = DateAdd(monday1,
      Add(Multiply(Subtract(iw, Literal(1)), Literal(7)),
        Subtract(id, Literal(1))))
    // validity: id in 1..7, iw lands in the requested week (a phantom
    // week 53 rolls into the next year's week 1 and fails this check)
    val valid = And(And(GreaterThanOrEqual(id, Literal(1)),
      LessThanOrEqual(id, Literal(7))),
      EqualTo(WeekOfYear(result), iw))
    val date = If(valid, result, Literal.create(null, DateType))
    Some(if (toDate) date else Cast(date, TimestampType))
  }

  private def formatted(value: Expression, pattern: String): Expression = {
    val pieces = tokenize(pattern).map {
      case scala.util.Right(lit) => Literal(lit): Expression
      case scala.util.Left(tok) => piece(tok, value)
    }
    if (pieces.size == 1) pieces.head else Concat(pieces)
  }
}
