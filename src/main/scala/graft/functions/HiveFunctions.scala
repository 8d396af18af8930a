package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._

/** Closes the Hive-vs-Spark function-name gap (SURVEY §2.5): Hive names that
  * Spark lacks verbatim are registered as compositions of built-in Catalyst
  * expressions, so everything stays codegen'd — no Scala UDFs in any hot path.
  *
  * Registration is idempotent per session. Function surface references:
  * ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:286-720.
  */
object HiveFunctions {

  // Weak keys (like Engine.registeredDir): identity hashes are not unique, so
  // a permanent Integer set could both leak and silently skip registration for
  // a new session colliding with a dead one's hash.
  private val registeredSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def registerAll(spark: SparkSession): Unit = {
    if (registeredSessions.put(spark, java.lang.Boolean.TRUE) != null) return
    val reg = spark.sessionState.functionRegistry

    def fn(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    def alias(name: String, target: String): Unit = {
      val b = reg.lookupFunctionBuilder(FunctionIdentifier(target))
      b.foreach(builder => reg.createOrReplaceTempFunction(name, builder, "built-in"))
    }

    // --- plain aliases (Hive name -> Spark builtin) ------------------------
    alias("lcase", "lower")
    alias("ucase", "upper")
    alias("mid", "substring")
    // Hive's std/stddev/variance are the POPULATION forms (ref
    // FunctionRegistry.java registers them on GenericUDAFStd /
    // GenericUDAFVariance, i.e. stddev_pop/var_pop semantics), where
    // Spark's bare stddev/variance are SAMPLE — a silent wrong-number
    // divergence surfaced by the qtest conformance sweep (groupby3.q).
    // The explicit *_samp/*_pop names keep their standard meanings.
    alias("std", "stddev_pop")
    alias("stddev", "stddev_pop")
    alias("variance", "var_pop")
    // Hive's GREATEST/LEAST return NULL when ANY argument is NULL (ref
    // udf/generic/GenericUDFGreatest.java, HIVE-12082 — pinned by
    // udf_greatest.q's expected output), where Spark's builtins SKIP
    // nulls — a silent wrong-value divergence surfaced by the qtest
    // conformance sweep. DataFrame-API functions.greatest is untouched.
    fn("greatest") { args =>
      CaseWhen(Seq((args.map(IsNull(_): Expression).reduce(Or(_, _)),
        Literal(null))), Some(Greatest(args)))
    }
    fn("least") { args =>
      CaseWhen(Seq((args.map(IsNull(_): Expression).reduce(Or(_, _)),
        Literal(null))), Some(Least(args)))
    }
    // Hive's pmod is ((a % b) + b) % b (ref udf/generic/
    // GenericUDFOPMod lineage, UDFPosMod): with a NEGATIVE divisor the
    // result carries the divisor's sign (pmod(7, -3) = -2), where
    // Spark's pmod clamps non-negative (= 1) — surfaced by the qtest
    // sweep (udf_pmod.q). DataFrame-API functions.pmod is untouched
    // (the engine's bucket layouts use it with positive counts only).
    fn("pmod") { args =>
      require(args.size == 2, "pmod(a, b) takes two arguments")
      Remainder(Add(Remainder(args.head, args(1)), args(1)), args(1))
    }

    // Hive's sqrt returns NULL for a NEGATIVE input (ref udf/UDFSqrt
    // .java:45) where Spark's Sqrt answers NaN — surfaced by the qtest
    // sweep (udf4.q). Scope (per RegistryOverrideGuardSpec): on Spark 4
    // DataFrame functions.sqrt routes through the registry (Column.fn),
    // so the override DOES reach the DataFrame API — the guard spec
    // pins sqrt(lit(-1.0)) as NULL. Engine-internal sites are still
    // safe: vector norms in operators/Similarity and Geo build Catalyst
    // Sqrt or math.sqrt directly (never by name) on always-non-negative
    // inputs.
    fn("sqrt") { args =>
      require(args.size == 1, "sqrt(x) takes one argument")
      val d = Cast(args.head, org.apache.spark.sql.types.DoubleType)
      If(LessThan(d, Literal(0d)),
        Literal.create(null, org.apache.spark.sql.types.DoubleType),
        Sqrt(d))
    }

    // Engine-internal (not a Hive name): SQL door into the allocation-free
    // double→DECIMAL(p,s) conversion the exact-money aggregates use
    // ([[graft.functions.MoneyDecimal]]; r17 measured CAST's per-row
    // BigDecimal.valueOf at 3.4× the aggregate arithmetic). Lets the
    // both-engine SQL query texts split per engine: Spark runs
    // money_decimal(x, p, s), the DuckDB oracle keeps CAST(x AS
    // DECIMAL(p,s)) — value-identical on s-decimal-quantized doubles by
    // MoneyDecimal's contract (pinned per testdata column by
    // OracleTypeParitySpec/MoneyDecimalSpec).
    fn("money_decimal") { args =>
      require(args.size == 3, "money_decimal(x, precision, scale)")
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"money_decimal $what must be an integer literal, got $other")
      }
      MoneyDecimal(args.head,
        intLit(args(1), "precision"), intLit(args(2), "scale"))
    }

    // Hive's acos/asin return NULL outside [-1, 1] (ref udf/UDFAcos
    // .java:48, udf/UDFAsin.java:48) where Spark's Acos/Asin answer
    // NaN — surfaced by the qtest sweep (decimal_udf2.q). Same
    // SQL-name-only scoping as sqrt.
    def domainGuarded(name: String,
        builder: Expression => Expression): Unit =
      fn(name) { args =>
        require(args.size == 1, s"$name(x) takes one argument")
        val d = Cast(args.head, org.apache.spark.sql.types.DoubleType)
        If(Or(LessThan(d, Literal(-1d)), GreaterThan(d, Literal(1d))),
          Literal.create(null, org.apache.spark.sql.types.DoubleType),
          builder(d))
      }
    domainGuarded("acos", Acos)
    domainGuarded("asin", Asin)

    // Hive's 2-arg log(base, x) returns NULL whenever base <= 1 (ref
    // udf/UDFLog.java:81: base <= 1.0 || x <= 0.0 -> null) where Spark
    // computes log_base for any positive base != 1 (log(0.5, 2) = -1.0)
    // — surfaced by the qtest sweep (udf7.q). The 1-arg natural-log
    // form already agrees (both NULL on x <= 0).
    fn("log") {
      case Seq(x) => Log(x)
      case Seq(b, x) =>
        val bd = Cast(b, org.apache.spark.sql.types.DoubleType)
        If(LessThanOrEqual(bd, Literal(1d)),
          Literal.create(null, org.apache.spark.sql.types.DoubleType),
          Logarithm(bd, Cast(x, org.apache.spark.sql.types.DoubleType)))
      case args => sys.error(
        s"log takes one or two arguments, got ${args.size}")
    }

    // Hive's datetime_legacy_hybrid_calendar (ref udf/generic/
    // GenericUDFDatetimeLegacyHybridCalendar.java; udf_datetime_legacy_
    // hybrid_calendar.q): re-renders a proleptic-Gregorian date/
    // timestamp with the legacy HYBRID (Julian+Gregorian) calendar's
    // fields — '0601-03-07' answers '0601-03-04' (the 7th-century
    // Julian offset is 3 days); at/after 1582-10-15 it is the
    // identity. Spark ships the exact field-preserving conversion as
    // RebaseDateTime.rebaseJulianToGregorianDays/Micros (r17).
    fn("datetime_legacy_hybrid_calendar") { args =>
      require(args.size == 1,
        "datetime_legacy_hybrid_calendar(date|timestamp) takes one argument")
      graft.functions.HybridCalendar(args.head)
    }

    // Hive's interval constructor functions (ref udf/generic/
    // GenericUDFIntervalYearMonth / GenericUDFIntervalDayTime;
    // vector_interval_1.q): interval_year_month('1-2') and
    // interval_day_time('1 2:3:4') build interval values from Hive's
    // interval string forms — exactly what Spark's CAST to the ANSI
    // interval types parses (r17, surfaced by qtest wave 17c).
    fn("interval_year_month") { args =>
      require(args.size == 1, "interval_year_month(str) takes one argument")
      Cast(args.head, org.apache.spark.sql.types.YearMonthIntervalType())
    }
    fn("interval_day_time") { args =>
      require(args.size == 1, "interval_day_time(str) takes one argument")
      Cast(args.head, org.apache.spark.sql.types.DayTimeIntervalType())
    }

    // Hive renders java.time 'u' (PROLEPTIC year) in from_unixtime
    // patterns — udf5.q pins `MM/dd/uu` -> `01/13/10` — where Spark
    // rejects any 'u' as a reserved legacy pattern. Literal patterns
    // translate u->y outside quoted sections: identical rendering for
    // AD years, the reachable domain of rendering a unix timestamp
    // (BC needs seconds < -62e9). Non-literal patterns pass through to
    // Spark's canonical refusal.
    def uToY(p: String): String = {
      val sb = new StringBuilder
      var quoted = false
      p.foreach { ch =>
        if (ch == '\'') { quoted = !quoted; sb += ch }
        else if (ch == 'u' && !quoted) sb += 'y'
        else sb += ch
      }
      sb.toString
    }
    fn("from_unixtime") {
      case Seq(t) => FromUnixTime(t, Literal("yyyy-MM-dd HH:mm:ss"))
      case Seq(t, Literal(p: org.apache.spark.unsafe.types.UTF8String,
          org.apache.spark.sql.types.StringType))
          if p != null && p.toString.contains("u") =>
        FromUnixTime(t, Literal(uToY(p.toString)))
      case Seq(t, f) => FromUnixTime(t, f)
      case args => sys.error(
        s"from_unixtime takes one or two arguments, got ${args.size}")
    }

    // Hive's rlike/regexp answer FALSE for an EMPTY pattern (ref
    // udf/generic/GenericUDFRegExp.java:126) where Spark's RLike
    // answers TRUE — surfaced by the qtest sweep (udf1.q). These
    // registrations cover the FUNCTION-CALL spellings; the operator
    // spellings parse straight to RLike and are guarded by the
    // front-door plan rewrite (plans/HiveRegex).
    fn("rlike") { args =>
      require(args.size == 2, "rlike(str, regexp) takes two arguments")
      graft.plans.HiveRegex.guarded(args.head, args(1))
    }
    fn("regexp") { args =>
      require(args.size == 2, "regexp(str, regexp) takes two arguments")
      graft.plans.HiveRegex.guarded(args.head, args(1))
    }

    // Hive's trunc accepts the 'Q' quarter abbreviation (ref udf/generic/
    // GenericUDFTrunc.java: QUARTER|Q, MONTH|MON|MM, YEAR|YYYY|YY) —
    // Spark's TruncDate knows QUARTER but answers NULL for bare 'Q'.
    // Surfaced by the qtest sweep (udf_trunc.q). Literal formats only;
    // a non-literal format passes through to Spark's behavior.
    // ... and Hive's trunc is DUAL-PURPOSE (ref GenericUDFTrunc.java
    // initialize: numeric+numeric or 1-arg numeric -> NUMERIC truncation
    // toward zero at the given scale; otherwise the date path). Surfaced
    // by the qtest sweep (udf_trunc_number.q): trunc(1234567891.1235, -4)
    // = 1234560000, trunc(12.1238) = 12. Numeric trunc replays Hive's
    // BigDecimal multiply->longValue->divide mechanics in double
    // arithmetic (longValue truncates toward zero = Cast to LongType);
    // a NULL scale behaves as 0 (the reference's converter default).
    fn("trunc") { args =>
      import org.apache.spark.sql.types._
      require(args.size == 1 || args.size == 2,
        "trunc takes one or two arguments; got " + args.size)
      def numeric(e: Expression) =
        e.resolved && e.dataType.isInstanceOf[NumericType]
      val isNumericTrunc =
        (args.size == 1 && numeric(args.head)) ||
          (args.size == 2 && numeric(args.head) && numeric(args(1)))
      if (isNumericTrunc) {
        val x = Cast(args.head, DoubleType)
        val sc = if (args.size == 1) Literal(0)
          else Coalesce(Seq(Cast(args(1), IntegerType), Literal(0)))
        val p = Pow(Literal(10.0), Cast(sc, DoubleType))
        val q = Pow(Literal(10.0), Cast(UnaryMinus(sc), DoubleType))
        If(GreaterThan(Coalesce(Seq(sc, Literal(0))), Literal(0)),
          Divide(Cast(Multiply(x, p), LongType), p),
          If(LessThan(Coalesce(Seq(sc, Literal(0))), Literal(0)),
            Multiply(Cast(Divide(x, q), LongType), q),
            Cast(Cast(x, LongType), DoubleType)))
      } else {
        require(args.size == 2,
          "trunc(date, fmt) takes two arguments; got " + args.size)
        val fixed = args match {
          case Seq(d, Literal(f, StringType))
              if f != null && f.toString.equalsIgnoreCase("q") =>
            Seq(d, Literal("QUARTER"))
          case other => other
        }
        new TruncDate(fixed.head, fixed(1))
      }
    }

    // Hive's datetime-field functions are polymorphic two ways the Spark
    // builtins are not (both surfaced by the qtest sweep):
    //  - hour/minute/second parse TIME-ONLY strings (udf_hour.q:
    //    hour('13:14:15') = 13, ref UDFHour.java's HH:mm:ss fallback) —
    //    string inputs try the timestamp cast first, then re-parse
    //    prefixed with the epoch date;
    //  - year/month and day/hour/minute/second accept INTERVAL arguments
    //    (interval_udf.q: year(interval '1-2' year to month) = 1,
    //    second(interval '3 4:5:6.789' day to second) = 6 — integral,
    //    fraction truncated).
    {
      import org.apache.spark.sql.types._
      def ymField(extract: Expression => Expression,
          mk: Expression => Expression)(a: Expression): Expression =
        if (a.resolved && a.dataType.isInstanceOf[YearMonthIntervalType])
          extract(a)
        else mk(a)
      def dtField(extract: Expression => Expression,
          mk: Expression => Expression, timeString: Boolean)(
          a: Expression): Expression =
        if (a.resolved && a.dataType.isInstanceOf[DayTimeIntervalType])
          extract(a)
        else if (timeString && a.resolved && a.dataType == StringType)
          Coalesce(Seq(mk(Cast(a, TimestampType)),
            mk(Cast(Concat(Seq(Literal("1970-01-01 "), a)), TimestampType))))
        else mk(a)
      val builders: Seq[(String, Expression => Expression)] = Seq(
        "year" -> ymField(ExtractANSIIntervalYears, Year(_)),
        "month" -> ymField(ExtractANSIIntervalMonths, Month(_)),
        "day" -> dtField(ExtractANSIIntervalDays, DayOfMonth(_),
          timeString = false),
        "dayofmonth" -> dtField(ExtractANSIIntervalDays, DayOfMonth(_),
          timeString = false),
        "hour" -> dtField(ExtractANSIIntervalHours, Hour(_),
          timeString = true),
        "minute" -> dtField(ExtractANSIIntervalMinutes, Minute(_),
          timeString = true),
        "second" -> dtField(
          e => Cast(ExtractANSIIntervalSeconds(e), IntegerType),
          Second(_), timeString = true))
      builders.foreach { case (name, build) =>
        fn(name) { args =>
          require(args.size == 1, s"$name(x) takes one argument")
          build(args.head)
        }
      }
    }

    // Hive's INPUT__FILE__NAME virtual column (ref ql/.../VirtualColumn.java)
    // as a function — Spark's input_file_name under the Hive spelling.
    // (BLOCK__OFFSET__INSIDE__FILE / ROW__ID are storage-format-specific and
    // have no faithful Spark analog; deliberately not faked.)
    alias("input__file__name", "input_file_name")

    // index(x, i) — Hive's element-access spelled as a function: arrays
    // take a 0-BASED ordinal, maps a key (ref udf/generic/
    // GenericUDFIndex.java; udf_index.q) — exactly Spark's `x[i]`
    // extraction, so it lowers to the same node.
    fn("index") { args =>
      require(args.size == 2, "index(container, key) takes 2 arguments")
      org.apache.spark.sql.catalyst.analysis
        .UnresolvedExtractValue(args.head, args(1))
    }
    // logged_in_user() — the session user (ref udf/generic/
    // GenericUDFLoggedInUser.java; udf_logged_in_user.q). Same value as
    // current_user in a non-proxied session.
    alias("logged_in_user", "current_user")

    // field(x, a, b, ...) -> 1-based index of x in the list, 0 if absent
    // (ref udf/generic/GenericUDFField.java).
    fn("field") { args =>
      // Hive requires at least two arguments (ref udf/generic/
      // GenericUDFField.java; clientnegative udf_field_wrong_args_len.q)
      require(args.size >= 2,
        "field(needle, v1, ...) requires at least 2 arguments")
      val x = args.head
      val branches = args.tail.zipWithIndex.map { case (a, i) =>
        (EqualTo(x, a): Expression, Literal(i + 1): Expression)
      }
      CaseWhen(branches, Some(Literal(0)))
    }

    // quote(s) -> 'escaped' (ref udf/generic/GenericUDFQuote.java).
    fn("quote") { args =>
      Concat(Seq(Literal("'"),
        StringReplace(args.head, Literal("'"), Literal("\\'")), Literal("'")))
    }

    // array_slice(arr, start, length) with a 0-BASED start (ref udf/
    // generic/GenericUDFArraySlice.java; udf_array_slice.q.out pins
    // slice(array(1,2,3,null,3,4),2,2) = [3,null]) — Spark's slice is
    // 1-based and doesn't register this name.
    fn("array_slice") { args =>
      require(args.size == 3, "array_slice(array, start, length)")
      Slice(args(0), Add(args(1), Literal(1)), args(2))
    }

    // Hive's array_join diverges from Spark's builtin two ways (ref udf/
    // generic/GenericUDFArrayJoin.java; udf_array_join.q.out): an EMPTY
    // array answers NULL (Spark: ''), and any element type is accepted
    // (inner values render via their string cast; Spark demands
    // array<string>).
    fn("array_join") { args =>
      require(args.size == 2 || args.size == 3,
        "array_join(array, delimiter[, nullReplacement])")
      val arr = args.head
      val asStrings = Cast(arr,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))
      CaseWhen(Seq((EqualTo(Size(arr), Literal(0)),
        Literal(null, org.apache.spark.sql.types.StringType))),
        Some(ArrayJoin(asStrings, args(1),
          if (args.size == 3) Some(args(2)) else None)))
    }

    // istrue/isnottrue/isfalse/isnotfalse (FunctionRegistry.java:485-488).
    fn("istrue")(args => EqualNullSafe(args.head, Literal(true)))
    fn("isnottrue")(args => Not(EqualNullSafe(args.head, Literal(true))))
    fn("isfalse")(args => EqualNullSafe(args.head, Literal(false)))
    fn("isnotfalse")(args => Not(EqualNullSafe(args.head, Literal(false))))

    // likeany/likeall (FunctionRegistry.java:375-376).
    fn("likeany")(args =>
      args.tail.map(p => Like(args.head, p, '\\'): Expression).reduce(Or))
    fn("likeall")(args =>
      args.tail.map(p => Like(args.head, p, '\\'): Expression).reduce(And))

    // Hive's add_months snaps END-OF-MONTH: when the start date is its
    // month's last day, the result is the RESULT month's last day (ref
    // udf/generic/GenericUDFAddMonths.java via DateTimeMath — pinned by
    // udf_add_months.q.out: add_months('2015-02-28', 12) = 2016-02-29,
    // add_months('2016-02-29', -1) = 2016-01-31). Spark only clamps
    // day-overflow, so Feb 28 + 12 months answers Feb 28.
    fn("add_months") { args =>
      require(args.size == 2, "add_months(start_date, num_months)")
      val d = Cast(args.head, org.apache.spark.sql.types.DateType)
      val moved = AddMonths(d, args(1))
      CaseWhen(Seq((EqualTo(d, LastDay(d)), LastDay(moved))), Some(moved))
    }
    alias("sha", "sha1") // FunctionRegistry.java: sha == sha1

    // Hive's aes_encrypt/aes_decrypt are DETERMINISTIC AES/ECB/PKCS5 with
    // 16/24/32-byte keys, answering NULL for a bad key or input (ref udf/
    // generic/GenericUDFAesEncrypt.java, udf_aes_encrypt.q.out) — Spark's
    // default is random-IV GCM (non-deterministic, never Hive-comparable)
    // and raises on a bad key. The 2-arg Hive spelling pins ECB/PKCS and
    // wraps in TryEval for the NULL contract; 3+-arg calls keep Spark's
    // own modes.
    def hiveAes(name: String,
        make: (Expression, Expression) => Expression): Unit =
      fn(name) { args =>
        if (args.size != 2) throw new IllegalArgumentException(
          s"$name(input, key) — Hive's 2-argument form (ECB); use Spark's " +
            "native modes via explicit mode/padding arguments")
        TryEval(make(args.head, args(1)))
      }
    hiveAes("aes_encrypt", (in, key) => new AesEncrypt(in, key,
      Literal("ECB"), Literal("PKCS")))
    hiveAes("aes_decrypt", (in, key) => new AesDecrypt(in, key,
      Literal("ECB"), Literal("PKCS")))

    // SQL:2016 CAST ... FORMAT (FunctionRegistry.java:650, ref ql/udf/
    // generic/GenericUDFCastFormat.java) — see [[CastFormat]]; the
    // `CAST(x AS t FORMAT 'p')` spelling rewrites here via Engine.sql.
    fn("cast_format")(args => CastFormat.build(args))

    // to_epoch_milli (FunctionRegistry.java:650) = unix millis of a timestamp.
    fn("to_epoch_milli")(args => UnixMillis(Cast(args.head, org.apache.spark.sql.types.TimestampType)))

    // floor_year .. floor_second (FunctionRegistry.java:415-424) -> date_trunc.
    Seq("year", "quarter", "month", "week", "day", "hour", "minute", "second")
      .foreach { unit =>
        fn(s"floor_$unit")(args => TruncTimestamp(Literal(unit), args.head))
      }

    // tumbling_window(ts, interval) -> window start
    // (ref udf/generic/GenericUDFTumbledWindow.java): floor the epoch to the
    // interval, via Spark's native TimeWindow (codegen'd). TimeWindow only
    // accepts int/long/string duration literals, so interval literals are
    // converted to microseconds here.
    fn("tumbling_window") { args =>
      import org.apache.spark.sql.types._
      val ts = Cast(args.head, TimestampType)
      val micros: Expression = args(1) match {
        case Literal(us: Long, _: DayTimeIntervalType) => Literal(us)
        case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval, CalendarIntervalType)
            if ci.months == 0 =>
          Literal(ci.days * 86400000000L + ci.microseconds)
        case other => other // int/long/string literal handled by TimeWindow
      }
      GetStructField(new TimeWindow(ts, micros, micros, Literal(0L)), 0, Some("start"))
    }

    // nvl2(a, b, c) = if a is not null then b else c.
    fn("nvl2")(args => If(IsNotNull(args.head), args(1), args(2)))

    // Hive's locate coerces any argument to string and maps a NULL or
    // unparseable start position to 0 — which answers 0, not NULL (ref
    // udf/generic/GenericUDFLocate.java, pinned by udf_locate.q:
    // locate('abc','abcd',null) = 0, locate('abc','abcd','junk') = 0).
    // Spark's builtin nulls out on a NULL position. Surfaced by the
    // qtest sweep.
    fn("locate") { args =>
      import org.apache.spark.sql.types._
      require(args.size == 2 || args.size == 3,
        "locate(substr, str[, pos]) takes two or three arguments")
      val pos = if (args.size == 3)
        Coalesce(Seq(Cast(args(2), IntegerType), Literal(0)))
      else Literal(1)
      new StringLocate(Cast(args(0), StringType),
        Cast(args(1), StringType), pos)
    }

    // reflect/java_method (ref FunctionRegistry.java:584-586) are a REAL
    // public Hive surface, but arbitrary-JVM-reflection-from-SQL is an
    // injection hazard this engine refuses BY POLICY — and Spark ships its
    // own live `reflect` builtin, so the refusal must be an explicit
    // override (silent absence would leave Spark's reflection reachable).
    // The names resolve; USING them yields this documented error.
    Seq("reflect", "java_method").foreach { name =>
      fn(name)(_ => throw new UnsupportedOperationException(
        s"$name is disabled in this engine: arbitrary JVM reflection from " +
          "SQL is an injection hazard (the reference exposes it via " +
          "GenericUDFReflect; here the policy is refusal — register a " +
          "function or use a Catalyst expression instead)"))
    }

    // --- mask family (ref GenericUDFMaskFirstN.java etc). The charCount
    // default of 4 applies only when the argument is ABSENT; an explicit
    // negative count clamps to 0 (GenericUDFMaskFirstN: `if (charCount < 0)
    // charCount = 0`), and a non-literal count is an error (Hive requires a
    // constant).
    def intArg(args: Seq[Expression], i: Int, default: Int): Int =
      if (args.length <= i) default
      else if (args(i).foldable)
        Option(args(i).eval(null)).map(_.asInstanceOf[Number].intValue).getOrElse(default)
      else throw new IllegalArgumentException(
        s"mask_* char count must be a literal, got: ${args(i).sql}")
    // optional custom mask chars at positions 2..5 (upper, lower, digit,
    // other — ref BaseMaskUDF.java getCharArg: a string literal's first
    // char; int -1 keeps the default; 'other' defaults to UNMASKED).
    // Pinned by udf_mask_first_n.q ('X','x','0',':' over TestString-123).
    def maskCustom(a: Seq[Expression], fromStart: Boolean,
        show: Boolean): Expression = {
      def ch(i: Int, dflt: Char): Char = if (a.size <= i) dflt else a(i) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String,
            org.apache.spark.sql.types.StringType)
            if s != null && s.numChars() > 0 => s.toString.charAt(0)
        case _ => dflt
      }
      def chOpt(i: Int): Option[Char] = if (a.size <= i) None else a(i) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String,
            org.apache.spark.sql.types.StringType)
            if s != null && s.numChars() > 0 => Some(s.toString.charAt(0))
        case _ => None
      }
      MaskRange(a.head, intArg(a, 1, 4), fromStart, show,
        upper = ch(2, 'X'), lower = ch(3, 'x'), digit = ch(4, 'n'),
        other = chOpt(5))
    }
    fn("mask_first_n")(a => maskCustom(a, fromStart = true, show = false))
    fn("mask_last_n")(a => maskCustom(a, fromStart = false, show = false))
    fn("mask_show_first_n")(a => maskCustom(a, fromStart = true, show = true))
    fn("mask_show_last_n")(a => maskCustom(a, fromStart = false, show = true))
    // mask_hash = sha256 hex of STRING-family values; every other type
    // answers NULL (ref GenericUDFMaskHash.java's type guard —
    // udf_mask_hash.q pins tinyint..date → NULL)
    fn("mask_hash")(a => MaskHash(a.head))

    // json_read(json, 'type') parses a JSON document into the declared
    // type (ref ql/udf/generic/GenericUDFJsonRead.java; udf_json_read.q)
    // — Spark's from_json with the Hive type string, which the shared
    // DDL grammar parses directly. The type argument must be a literal,
    // as in the reference (it shapes the return type).
    fn("json_read") { args =>
      val tpe = args(1) match {
        case Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"json_read: the type argument must be a string literal, got $other")
      }
      val dt = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(tpe)
      org.apache.spark.sql.catalyst.expressions.JsonToStructs(
        dt, Map.empty, args.head)
    }
    // in_file(str, filename) — membership of str among the file's lines
    // (ref ql/udf/generic/GenericUDFInFile.java). The file loads once on
    // the driver at plan time, exactly like the reference's initialize().
    fn("in_file") { args =>
      val path = args(1) match {
        case Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"in_file: the file name must be a string literal, got $other")
      }
      import scala.jdk.CollectionConverters._
      val lines = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(path)).asScala.toSeq
      In(args.head, lines.map(l => Literal(l): Expression))
    }

    // --- uniontype encoding (SURVEY §1.2): struct<tag:tinyint, fieldN...> ---
    fn("create_union") { args =>
      val tag = Cast(args.head, org.apache.spark.sql.types.ByteType)
      val fields = args.tail.zipWithIndex.flatMap { case (v, i) =>
        Seq(Literal(s"field$i"),
          If(EqualTo(tag, Literal(i.toByte)), v, Literal.create(null, v.dataType)))
      }
      CreateNamedStruct(Literal("tag") +: tag +: fields)
    }
    fn("extract_union") { args =>
      if (args.length == 1) args.head // struct form already carries all fields
      else args(1) match {
        case lit if lit.foldable =>
          val i = lit.eval(null).asInstanceOf[Number].intValue
          UnresolvedExtractValue(args.head, Literal(s"field$i"))
        case _ => throw new IllegalArgumentException("extract_union tag must be a literal")
      }
    }

    // --- sort_array_by(arr, field [, 'ASC'|'DESC']) (GenericUDFSortArrayByField)
    // sort_array_by(arr, f1[, f2...][, 'ASC'|'DESC']) — MULTIPLE sort
    // fields; the trailing argument is a direction only when it spells
    // asc/desc (ref GenericUDFSortArrayByField.java, pinned by
    // udf_sort_array_by.q's ('name','salary') multi-key rows — r16 fix:
    // the old builder read the second FIELD as a direction).
    fn("sort_array_by") { args =>
      require(args.size >= 2, "sort_array_by(arr, field...) needs a field")
      def lit(e: Expression): String = e match {
        case l if l.foldable => String.valueOf(l.eval(null))
        case _ => throw new IllegalArgumentException(
          "sort_array_by fields must be literals")
      }
      val tail = args.tail.map(lit)
      val (fields, asc) =
        if (tail.size > 1 && Set("asc", "desc")(tail.last.toLowerCase))
          (tail.init, tail.last.equalsIgnoreCase("ASC"))
        else (tail, true)
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val y = UnresolvedNamedLambdaVariable(Seq("y"))
      // lexicographic over the fields: first unequal key decides
      val cmp = fields.foldRight(Literal(0): Expression) { (f, next) =>
        val fx = UnresolvedExtractValue(x, Literal(f))
        val fy = UnresolvedExtractValue(y, Literal(f))
        CaseWhen(Seq(
          (LessThan(fx, fy), Literal(if (asc) -1 else 1)),
          (GreaterThan(fx, fy), Literal(if (asc) 1 else -1))), Some(next))
      }
      ArraySort(args.head, LambdaFunction(cmp, Seq(x, y)))
    }

    // --- UDTFs: parse_url_tuple, replicate_rows (SURVEY §2.6) --------------
    fn("parse_url_tuple")(args => ParseUrlTuple(args))
    fn("replicate_rows")(args => ReplicateRows(args))

    // --- bloom_filter / in_bloom_filter (GenericUDAFBloomFilter +
    // GenericUDFInBloomFilter) on Spark's native sketch --------------------
    fn("bloom_filter") { args =>
      val items = if (args.length > 1) Cast(args(1), org.apache.spark.sql.types.LongType)
        else Literal(1000000L)
      val bits = if (args.length > 2) Cast(args(2), org.apache.spark.sql.types.LongType)
        else Literal(8388608L)
      new aggregate.BloomFilterAggregate(new XxHash64(Seq(args.head)), items, bits)
    }
    fn("in_bloom_filter")(args =>
      BloomFilterMightContain(args(1), new XxHash64(Seq(args.head))))

    // --- misc --------------------------------------------------------------
    // --- graft vector/text-hash primitives, SQL-visible ------------------
    // (the engine's flagship codegen kernels, callable from plain SQL: e.g.
    //  SELECT vec_cosine(a.embedding, b.embedding) FROM ...)
    def intLit(a: Seq[Expression], i: Int, what: String): Int = a(i) match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    fn("vec_cosine")(a => CosineSimilarity(a(0), a(1)))
    fn("vec_dot")(a => DotProduct(a(0), a(1)))
    fn("vec_l2")(a => L2Norm(a.head))
    fn("int8_quantize")(a => Int8Quantize(a.head))
    fn("int8_cosine")(a => Int8CosineSim(a(0), a(1)))
    fn("minhash_signature")(a => MinHashSignature(a.head,
      intLit(a, 1, "shingleSize"), intLit(a, 2, "numHashes")))
    fn("simhash64")(a => SimHash64(a.head))
    fn("hamming_distance")(a =>
      BitwiseCount(BitwiseXor(a(0), a(1))))

    fn("surrogate_key")(_ => MonotonicallyIncreasingID())
    fn("version")(_ => Literal("graft-0.1.0 (spark " +
      org.apache.spark.SPARK_VERSION + ")"))
    alias("murmur_hash", "hash") // Hive's murmur_hash IS Murmur3 (captured
    // BEFORE the next line replaces the name). Hive's bare hash() is the
    // Java-style ObjectInspectorUtils.hashCode (ref serde2/objectinspector/
    // ObjectInspectorUtils.java:hashCode; udf/generic/GenericUDFHash.java) —
    // Spark ships that exact algorithm as HiveHash (bucketing compat), so
    // the SQL name gets Hive semantics while functions.hash stays Murmur3.
    // The auto_join qtest family's sum(hash(...)) transcripts pin it.
    fn("hash")(args => HiveHash(args))

    // ngrams / context_ngrams UDAFs + DataSketches family
    NGramAggregates.register(spark)
    SketchAggregates.register(spark)
  }
}
