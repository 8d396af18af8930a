package graft

/** Conformance wave 17m: timestamp_udf.q's function battery over a
  * sub-second timestamp — field extraction, date_add/sub over
  * timestamps, datediff against string comparands, and the UTC
  * conversion pair (session TZ is UTC, so
  * from_utc_timestamp/to_utc_timestamp shift by Chicago's offset).
  */
class QtestTsUdfWave17mSpec extends QtestHarness {

  private val t =
    "(VALUES (timestamp '2011-05-06 07:08:09.123456')) tu(t)"

  protected val qcases: Seq[QCase] = Seq(

    QCase("timestamp_udf.q", "w17m01",
      s"""select unix_timestamp(t) AS ut, year(t) AS y, month(t) AS m,
        |  day(t) AS d, dayofmonth(t) AS dm, weekofyear(t) AS w,
        |  hour(t) AS h, minute(t) AS mi, second(t) AS s,
        |  to_date(t) AS td
        |from $t""".stripMargin,
      duck = Some(s"""select epoch(t)::BIGINT AS ut, year(t) AS y,
        |  month(t) AS m, day(t) AS d, day(t) AS dm,
        |  weekofyear(t) AS w, hour(t) AS h, minute(t) AS mi,
        |  second(t) AS s, CAST(t AS DATE) AS td
        |from $t""".stripMargin),
      note = "the extraction battery; unix_timestamp truncates the " +
        "fraction; second() ignores it"),

    QCase("timestamp_udf.q", "w17m02",
      s"""select date_add(t, 5) AS a, date_sub(t, 10) AS b from $t"""
        .stripMargin,
      duck = Some(s"""select CAST(t AS DATE) + 5 AS a,
        |  CAST(t AS DATE) - 10 AS b from $t""".stripMargin),
      note = "date_add/sub over a TIMESTAMP answers a DATE"),

    QCase("timestamp_udf.q", "w17m03",
      s"""select datediff(t, t) AS a, datediff(t, '2002-03-21') AS b,
        |  datediff('2002-03-21', t) AS c from $t""".stripMargin,
      duck = Some(s"""select 0 AS a,
        |  (CAST(t AS DATE) - DATE '2002-03-21') AS b,
        |  (DATE '2002-03-21' - CAST(t AS DATE)) AS c from $t"""
        .stripMargin),
      note = "datediff against STRING comparands in both operand " +
        "orders"),

    QCase("timestamp_udf.q", "w17m04",
      s"""select from_utc_timestamp(t, 'America/Chicago') AS f,
        |  to_utc_timestamp(t, 'America/Chicago') AS g from $t"""
        .stripMargin,
      duck = Some("""select TIMESTAMP '2011-05-06 02:08:09.123456' AS f,
        |  TIMESTAMP '2011-05-06 12:08:09.123456' AS g""".stripMargin),
      note = "Chicago is UTC-5 in May (CDT): from_utc shifts back " +
        "five hours, to_utc forward — expected constants spelled " +
        "(DuckDB's tz functions need the ICU extension)"))

  test("qtest conformance wave 17m: timestamp_udf battery " +
      "(extractions, date arithmetic, UTC conversions)") {
    run("timestamp_udf")
  }
}
