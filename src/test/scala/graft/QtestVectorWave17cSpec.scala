package graft

/** Conformance wave 17c: the vector_* date/interval/char/string corpus —
  * the date comparison matrices (vector_date_1.q), interval constructor
  * functions and literal arithmetic (vector_interval_1.q,
  * vector_interval_arithmetic.q), char/varchar casts
  * (vector_char_cast.q, vector_varchar_simple.q), nested CONCAT
  * (vector_string_concat.q), and the all-types row rendering sweep
  * (vector_data_types.q).
  *
  * Porting notes:
  *  - Interval VALUES don't render comparably across engines (Spark
  *    `INTERVAL '1-2' YEAR TO MONTH` vs DuckDB `1 year 2 months`), so
  *    every interval case applies the interval to a date/timestamp and
  *    compares the resulting datetime; the twins spell DuckDB interval
  *    forms (INTERVAL 26 MONTH, INTERVAL '99 days 11:22:33.123456').
  *  - interval_year_month()/interval_day_time() are the r17 engine
  *    addition (Hive's interval constructor UDFs → CAST to the ANSI
  *    interval types).
  *  - Hive truncates double→int casts; DuckDB rounds — the quarter
  *    formula twins through trunc().
  */
class QtestVectorWave17cSpec extends QtestHarness {

  private val dateTbl =
    """(VALUES (CAST(NULL AS DATE), CAST(NULL AS DATE)),
      |  (date '1999-12-31', date '2000-01-01'),
      |  (date '2001-01-01', date '2001-06-01')) vector_date_1(dt1, dt2)"""
      .stripMargin

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_date_1.q", "w17c01",
      s"""select dt1, dt2,
        |  dt1 = dt1 AS c1, dt1 != dt2 AS c2, dt1 <= dt1 AS c3,
        |  dt1 <= dt2 AS c4, dt1 < dt2 AS c5, dt2 >= dt2 AS c6,
        |  dt2 >= dt1 AS c7, dt2 > dt1 AS c8
        |from $dateTbl order by dt1""".stripMargin, ordered = true,
      note = "the all-true column-vs-column matrix; the NULL row " +
        "answers NULL through every comparison"),

    QCase("vector_date_1.q", "w17c02",
      s"""select dt1, dt2,
        |  dt1 != dt1 AS c1, dt1 = dt2 AS c2, dt1 < dt1 AS c3,
        |  dt1 >= dt2 AS c4, dt1 > dt2 AS c5, dt2 > dt2 AS c6,
        |  dt2 <= dt1 AS c7, dt2 < dt1 AS c8
        |from $dateTbl order by dt1""".stripMargin, ordered = true,
      note = "the all-false matrix"),

    QCase("vector_date_1.q", "w17c03",
      s"""select dt1,
        |  dt1 != date '1970-01-01' AS c1,
        |  dt1 >= date '1970-01-01' AS c2,
        |  dt1 > date '1970-01-01' AS c3,
        |  dt1 <= date '2100-01-01' AS c4,
        |  dt1 < date '2100-01-01' AS c5,
        |  date '1970-01-01' != dt1 AS c6,
        |  date '1970-01-01' <= dt1 AS c7,
        |  date '1970-01-01' < dt1 AS c8
        |from $dateTbl order by dt1""".stripMargin, ordered = true,
      note = "column-vs-literal in both operand orders"),

    QCase("vector_date_1.q", "w17c04",
      s"""select dt1, dt2 from $dateTbl
        |where dt1 = dt1 and dt1 != dt2 and dt1 < dt2 and dt1 <= dt2
        |  and dt2 > dt1 and dt2 >= dt1
        |order by dt1""".stripMargin, ordered = true,
      note = "as a conjunctive filter the NULL row drops"),

    QCase("vector_interval_1.q", "w17c05",
      """select
        |  dt + interval '1-2' year to month AS a,
        |  dt + interval_year_month(str1) AS b,
        |  ts + interval '1 2:3:4' day to second AS c,
        |  ts + interval_day_time(str2) AS d,
        |  dt + (interval '2-2' year to month +
        |        interval '3-3' year to month) AS e,
        |  dt + (interval '1-2' year to month -
        |        interval_year_month(str1)) AS f
        |from (VALUES (timestamp '2001-01-01 01:02:03',
        |  date '2001-01-01', '1-2', '1 2:3:4'),
        |  (CAST(NULL AS TIMESTAMP), CAST(NULL AS DATE),
        |   CAST(NULL AS STRING), CAST(NULL AS STRING)))
        |  vector_interval_1(ts, dt, str1, str2)
        |order by a""".stripMargin,
      duck = Some("""select
        |  CAST(dt + INTERVAL 14 MONTH AS DATE) AS a,
        |  CAST(dt + CASE WHEN str1 IS NULL THEN NULL
        |       ELSE INTERVAL 14 MONTH END AS DATE) AS b,
        |  ts + INTERVAL '1 day 2 hours 3 minutes 4 seconds' AS c,
        |  ts + CASE WHEN str2 IS NULL THEN NULL
        |       ELSE INTERVAL '1 day 2 hours 3 minutes 4 seconds' END AS d,
        |  CAST(dt + INTERVAL 65 MONTH AS DATE) AS e,
        |  CAST(dt + INTERVAL 0 MONTH AS DATE) AS f
        |from (VALUES (timestamp '2001-01-01 01:02:03',
        |  date '2001-01-01', '1-2', '1 2:3:4'),
        |  (CAST(NULL AS TIMESTAMP), CAST(NULL AS DATE),
        |   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)))
        |  vector_interval_1(ts, dt, str1, str2)
        |order by a NULLS LAST""".stripMargin), ordered = true,
      note = "interval literals, the interval_year_month/" +
        "interval_day_time constructor functions (r17 addition), and " +
        "interval+interval sums — all applied to a date/timestamp so " +
        "the outputs compare as datetimes; the twin folds the constant " +
        "string arguments"),

    QCase("vector_interval_arithmetic.q", "w17c06",
      """select cdate AS dateval,
        |  cdate - interval '2-2' year to month AS a,
        |  cdate - interval '-2-2' year to month AS b,
        |  cdate + interval '2-2' year to month AS c,
        |  cdate + interval '-2-2' year to month AS d,
        |  interval '2-2' year to month + cdate AS e
        |from qt_timestamps
        |order by cdate""".stripMargin,
      duck = Some("""select cdate AS dateval,
        |  CAST(cdate - INTERVAL 26 MONTH AS DATE) AS a,
        |  CAST(cdate + INTERVAL 26 MONTH AS DATE) AS b,
        |  CAST(cdate + INTERVAL 26 MONTH AS DATE) AS c,
        |  CAST(cdate - INTERVAL 26 MONTH AS DATE) AS d,
        |  CAST(cdate + INTERVAL 26 MONTH AS DATE) AS e
        |from qt_timestamps
        |order by cdate NULLS LAST""".stripMargin), ordered = true,
      note = "date ± year-month intervals across year-1800..9200 " +
        "values; a NEGATIVE interval literal '-2-2' negates both " +
        "fields"),

    QCase("vector_interval_arithmetic.q", "w17c07",
      """select ctimestamp1 AS tsval,
        |  ctimestamp1 - interval '2-2' year to month AS a,
        |  ctimestamp1 + interval '2-2' year to month AS b,
        |  ctimestamp1 + interval '-2-2' year to month AS c
        |from qt_timestamps
        |order by ctimestamp1""".stripMargin,
      duck = Some("""select ctimestamp1 AS tsval,
        |  ctimestamp1 - INTERVAL 26 MONTH AS a,
        |  ctimestamp1 + INTERVAL 26 MONTH AS b,
        |  ctimestamp1 - INTERVAL 26 MONTH AS c
        |from qt_timestamps
        |order by ctimestamp1 NULLS LAST""".stripMargin), ordered = true,
      note = "timestamp ± year-month keeps the time-of-day"),

    QCase("vector_interval_arithmetic.q", "w17c08",
      """select cdate AS dateval,
        |  cdate - interval '99 11:22:33.123456789' day to second AS a,
        |  cdate + interval '99 11:22:33.123456789' day to second AS b,
        |  cdate + interval '-99 11:22:33.123456789' day to second AS c
        |from qt_timestamps
        |order by cdate""".stripMargin,
      duck = Some("""select cdate AS dateval,
        |  cdate - INTERVAL '99 days 11:22:33.123456' AS a,
        |  cdate + INTERVAL '99 days 11:22:33.123456' AS b,
        |  cdate - INTERVAL '99 days 11:22:33.123456' AS c
        |from qt_timestamps
        |order by cdate NULLS LAST""".stripMargin), ordered = true,
      note = "date ± day-time interval answers a TIMESTAMP; the " +
        "9-digit fraction truncates to micros in both engines"),

    QCase("vector_char_cast.q", "w17c09",
      """select count(1) AS c
        |from (VALUES (1000), (1001), (1002), (1003), (1000)) s1(id)
        |where cast(id as char(4)) = '1000'""".stripMargin,
      duck = Some("""select count(1) AS c
        |from (VALUES (1000), (1001), (1002), (1003), (1000)) s1(id)
        |where cast(id as VARCHAR) = '1000'""".stripMargin),
      note = "smallint→char(4) equality finds both 1000 rows"),

    QCase("vector_varchar_simple.q", "w17c10",
      """select cast(value as varchar(5)) AS v
        |from qt_src order by value limit 5""".stripMargin,
      duck = Some("""select substr(value, 1, 5) AS v
        |from qt_src order by value limit 5""".stripMargin),
      ordered = true,
      note = "CAST to bounded varchar TRUNCATES ('val_0' from " +
        "'val_0...') — the front door lowers the cast to substr, " +
        "which is exactly the twin"),

    QCase("vector_string_concat.q", "w17c11",
      """SELECT s AS str,
        |  CONCAT(CONCAT('      ', s), '      ') AS padded,
        |  CONCAT(CONCAT('|', RTRIM(CONCAT(CONCAT('      ', s),
        |    '      '))), '|') AS rtrimmed
        |FROM qt_over10k ORDER BY s, t, si LIMIT 20""".stripMargin,
      ordered = true,
      note = "nested CONCAT + RTRIM over the over10k strings; the " +
        ".q's bare LIMIT gets a deterministic ORDER BY"),

    QCase("vector_string_concat.q", "w17c12",
      """SELECT CONCAT(CONCAT(CONCAT('Quarter ',
        |  CAST(CAST((MONTH(cdate) - 1) / 3 + 1 AS INT) AS STRING)),
        |  '-'), CAST(YEAR(cdate) AS STRING)) AS field
        |FROM qt_timestamps WHERE cdate IS NOT NULL
        |GROUP BY CONCAT(CONCAT(CONCAT('Quarter ',
        |  CAST(CAST((MONTH(cdate) - 1) / 3 + 1 AS INT) AS STRING)),
        |  '-'), CAST(YEAR(cdate) AS STRING))
        |ORDER BY field LIMIT 50""".stripMargin,
      duck = Some("""SELECT CONCAT(CONCAT(CONCAT('Quarter ',
        |  CAST(CAST(trunc((MONTH(cdate) - 1) / 3 + 1) AS INT)
        |    AS VARCHAR)), '-'), CAST(YEAR(cdate) AS VARCHAR)) AS field
        |FROM qt_timestamps WHERE cdate IS NOT NULL
        |GROUP BY 1
        |ORDER BY field LIMIT 50""".stripMargin), ordered = true,
      note = "the quarter-label concat: Hive's int division answers " +
        "DOUBLE and the int cast TRUNCATES (month 12 → Quarter 4, not " +
        "5) — the twin spells trunc before DuckDB's rounding cast"),

    QCase("vector_data_types.q", "w17c13",
      """SELECT t, si, i, b, f, d, bo, s, `dec`
        |FROM qt_over10k
        |ORDER BY t, si, i, b, f, s LIMIT 20""".stripMargin,
      duck = Some("""SELECT t, si, i, b, f, d, bo, s, dec
        |FROM qt_over10k
        |ORDER BY t NULLS LAST, si NULLS LAST, i NULLS LAST,
        |  b NULLS LAST, f NULLS LAST, s NULLS LAST LIMIT 20"""
        .stripMargin), ordered = true,
      note = "the all-primitive-types rendering sweep (tinyint " +
        "through decimal) under a fully-keyed deterministic order"))

  test("qtest conformance wave 17c: vector_* date/interval/char/string " +
      "(comparison matrices, interval constructors, concat, varchar)") {
    run("vector_date_1", "vector_interval_1", "vector_interval_arithmetic",
      "vector_char_cast", "vector_varchar_simple", "vector_string_concat",
      "vector_data_types")
  }
}
