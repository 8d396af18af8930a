package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/** Closes the Hive-vs-Spark function-name gap (SURVEY §2.5): Hive names that
  * Spark lacks verbatim are registered as compositions of built-in Catalyst
  * expressions, so everything stays codegen'd — no Scala UDFs in any hot path.
  *
  * Registration is idempotent per session. Function surface references:
  * ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:286-720.
  */
object HiveFunctions {

  private val registeredSessions =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Boolean]())

  def registerAll(spark: SparkSession): Unit = {
    if (!registeredSessions.add(System.identityHashCode(spark))) return
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

    // field(x, a, b, ...) -> 1-based index of x in the list, 0 if absent
    // (ref udf/generic/GenericUDFField.java).
    fn("field") { args =>
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
  }
}
