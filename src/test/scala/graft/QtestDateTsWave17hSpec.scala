package graft

/** Conformance wave 17h: the date_/timestamp_ corpus tail — date ±
  * integer arithmetic (date_int_operation_test.q), date literal
  * round-trips (date_4.q, date_3.q), the timestamp comparison matrix
  * (timestamp_comparison.q) and its TIMESTAMP-vs-NUMERIC spelling
  * (timestamp_comparison2.q — Hive compares in double epoch seconds,
  * the r17 TimestampComparisons addition, pinned against the .q.out
  * count), date-only string comparison (timestamp_date_only.q),
  * numeric→timestamp casts across the type family
  * (timestamp_ints_casts.q), epoch-double→timestamp round-trip casts
  * (timestamp_3.q), NULL timestamps (timestamp_null.q), and date
  * ordering/grouping (date_2.q).
  */
class QtestDateTsWave17hSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("date_int_operation_test.q", "w17h01",
      """select date('2001-01-28') + 3 AS a,
        |  date('2001-01-28') - 3 AS b""".stripMargin,
      duck = Some("select DATE '2001-01-28' + 3 AS a, " +
        "DATE '2001-01-28' - 3 AS b"),
      note = "the date() constructor function + date ± int arithmetic"),

    QCase("date_4.q", "w17h02",
      """select d, date '2011-01-01' AS lit
        |from (VALUES (CAST(date '2011-01-01' AS DATE))) date_4(d)"""
        .stripMargin),

    QCase("date_3.q", "w17h03",
      """select 1 AS c1,
        |  cast(cast('2011-01-01 00:00:00' as timestamp) as date) AS dd"""
        .stripMargin,
      note = "timestamp→date truncation"),

    QCase("timestamp_comparison.q", "w17h04",
      """select cast('2011-05-06 07:08:09' as timestamp) >
        |  cast('2011-05-06 07:08:09' as timestamp) AS gt,
        |  cast('2011-05-06 07:08:09' as timestamp) <
        |  cast('2011-05-06 07:08:09' as timestamp) AS lt,
        |  cast('2011-05-06 07:08:09' as timestamp) =
        |  cast('2011-05-06 07:08:09' as timestamp) AS eq,
        |  cast('2011-05-06 07:08:09' as timestamp) <>
        |  cast('2011-05-06 07:08:09' as timestamp) AS ne,
        |  cast('2011-05-06 07:08:09' as timestamp) >=
        |  cast('2011-05-06 07:08:09' as timestamp) AS ge""".stripMargin),

    QCase("timestamp_comparison2.q", "w17h05",
      """select count(*) AS c FROM qt_alltypesorc
        |WHERE ((ctinyint != 0)
        |  AND (((ctimestamp1 <= 0)
        |    OR ((ctinyint = cint) OR (cstring2 LIKE 'ss')))
        |  AND ((988888 < cdouble)
        |    OR ((ctimestamp2 > -29071) AND (3569 >= cdouble)))))"""
        .stripMargin,
      duck = Some("""select count(*) AS c FROM qt_alltypesorc
        |WHERE ((ctinyint != 0)
        |  AND (((CAST(epoch_us(ctimestamp1) AS DOUBLE) / 1000000 <= 0)
        |    OR ((ctinyint = cint) OR (cstring2 LIKE 'ss')))
        |  AND ((988888 < cdouble)
        |    OR ((CAST(epoch_us(ctimestamp2) AS DOUBLE) / 1000000 > -29071)
        |      AND (3569 >= cdouble)))))""".stripMargin),
      hive = Some(Seq("3872")),
      note = "TIMESTAMP-vs-NUMERIC comparison means double epoch " +
        "seconds (the r17 TimestampComparisons addition); .q.out " +
        "pins 3872"),

    QCase("timestamp_comparison2.q", "w17h06",
      """select count(*) AS c FROM qt_alltypesorc
        |WHERE ((ctinyint != 0)
        |  AND (((ctimestamp1 <= timestamp('1970-01-01 00:00:00'))
        |    OR ((ctinyint = cint) OR (cstring2 LIKE 'ss')))
        |  AND ((988888 < cdouble)
        |    OR ((ctimestamp2 > timestamp('1969-12-31 15:55:29'))
        |      AND (3569 >= cdouble)))))""".stripMargin,
      duck = Some("""select count(*) AS c FROM qt_alltypesorc
        |WHERE ((ctinyint != 0)
        |  AND (((ctimestamp1 <= timestamp '1970-01-01 00:00:00')
        |    OR ((ctinyint = cint) OR (cstring2 LIKE 'ss')))
        |  AND ((988888 < cdouble)
        |    OR ((ctimestamp2 > timestamp '1969-12-31 15:55:29')
        |      AND (3569 >= cdouble)))))""".stripMargin),
      note = "the equivalent timestamp() spelling; the alltypesorc " +
        "ctimestamp2 spread makes the two counts differ from each " +
        "other only through the seconds-vs-literal boundary"),

    QCase("timestamp_date_only.q", "w17h07",
      """select cast("2016-12-29 23:59:59" as timestamp) < "2016-12-30" AS a,
        |  cast("2016-12-30 00:00:00" as timestamp) = "2016-12-30" AS b,
        |  cast("2016-12-30 00:00:01" as timestamp) > "2016-12-30" AS c"""
        .stripMargin,
      duck = Some("""select TIMESTAMP '2016-12-29 23:59:59' <
        |  TIMESTAMP '2016-12-30 00:00:00' AS a,
        |  TIMESTAMP '2016-12-30 00:00:00' =
        |  TIMESTAMP '2016-12-30 00:00:00' AS b,
        |  TIMESTAMP '2016-12-30 00:00:01' >
        |  TIMESTAMP '2016-12-30 00:00:00' AS c""".stripMargin),
      note = "a date-only STRING comparand reads as midnight"),

    QCase("timestamp_ints_casts.q", "w17h08",
      """select cast(ctinyint as timestamp) AS t1,
        |  cast(csmallint as timestamp) AS t2,
        |  cast(cint as timestamp) AS t3,
        |  cast(cbigint * 0 as timestamp) AS t4,
        |  cast(cboolean1 as timestamp) AS t5
        |from qt_alltypesorc
        |where ctinyint is not null and csmallint is not null
        |  and cint is not null and cboolean1 is not null
        |order by cint, ctinyint limit 10""".stripMargin,
      duck = Some("""select
        |  make_timestamp(CAST(ctinyint AS BIGINT) * 1000) AS t1,
        |  make_timestamp(CAST(csmallint AS BIGINT) * 1000) AS t2,
        |  make_timestamp(CAST(cint AS BIGINT) * 1000) AS t3,
        |  make_timestamp(CASE WHEN cbigint IS NULL THEN NULL
        |    ELSE 0 END) AS t4,
        |  make_timestamp(CASE WHEN cboolean1 THEN 1000 ELSE 0 END) AS t5
        |from qt_alltypesorc
        |where ctinyint is not null and csmallint is not null
        |  and cint is not null and cboolean1 is not null
        |order by cint NULLS LAST, ctinyint NULLS LAST limit 10"""
        .stripMargin), ordered = true,
      note = "integral/boolean -> timestamp reads epoch MILLISECONDS " +
        "(timestamp_ints_casts.q.out: tinyint -36 is 23:59:59.964; " +
        "boolean true is 1 ms) - the r17 IntegralTimestampCasts " +
        "semantics; the .q's bare select gets a deterministic order"),

    QCase("timestamp_3.q", "w17h09",
      """select cast(t as boolean) AS b, cast(t as int) AS i,
        |  cast(t as bigint) AS bi, cast(t as double) AS d
        |from (VALUES (cast(cast('1.3041352164485E9' as double)
        |  as timestamp))) timestamp_3(t)""".stripMargin,
      duck = Some("""select true AS b, 1304135216 AS i,
        |  1304135216 AS bi, 1304135216.4485 AS d
        |from (VALUES (1)) t(x)""".stripMargin),
      note = "the epoch-double round trip: boolean via seconds != 0, " +
        "int/bigint truncate, double keeps the fraction (expected " +
        "constants from timestamp_3.q.out)"),

    QCase("timestamp_null.q", "w17h10",
      """SELECT t1, CAST(NULL AS TIMESTAMP) AS t2 FROM
        |(VALUES (CAST(NULL AS TIMESTAMP))) timestamp_null(t1) LIMIT 1"""
        .stripMargin),

    QCase("date_2.q", "w17h11",
      """select fl_date, fl_num from (VALUES
        |  (date '2010-10-20', 1064), (date '2010-10-21', 1142),
        |  (date '2010-10-22', 1599), (date '2010-10-20', 1531),
        |  (date '2010-10-21', 1610), (date '2010-10-22', 897))
        |  date_2(fl_date, fl_num)
        |order by fl_date asc, fl_num desc""".stripMargin,
      ordered = true),

    QCase("date_2.q", "w17h12",
      """select fl_date, count(*) AS c from (VALUES
        |  (date '2010-10-20', 1064), (date '2010-10-21', 1142),
        |  (date '2010-10-22', 1599), (date '2010-10-20', 1531),
        |  (date '2010-10-21', 1610), (date '2010-10-22', 897))
        |  date_2(fl_date, fl_num)
        |group by fl_date""".stripMargin))

  test("qtest conformance wave 17h: date_/timestamp_ corpus tail " +
      "(numeric comparisons, int casts, date arithmetic)") {
    run("date_int_operation_test", "date_4", "date_3",
      "timestamp_comparison", "timestamp_date_only",
      "timestamp_ints_casts", "timestamp_3", "timestamp_null", "date_2")
  }
}
