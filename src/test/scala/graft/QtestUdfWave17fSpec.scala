package graft

/** Conformance wave 17f: the udf_* corpus tail — date_sub coercions,
  * add_months END-OF-MONTH snapping (pinned against udf_add_months
  * .q.out), chr's mod-256/empty-string edges, cbrt, degrees/PI/E,
  * Hive's always-fractional division and mod, named_struct field
  * access, the bitwise shift family's INT wrap/unsigned semantics,
  * bin()'s 64-bit two's complement rendering, and
  * datetime_legacy_hybrid_calendar (the r17 addition: proleptic
  * values re-rendered with the legacy hybrid calendar's fields —
  * identity at/after the 1582 cutover).
  */
class QtestUdfWave17fSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("udf_date_sub.q", "w17f01",
      """SELECT date_sub('1900-01-01', cast(10 as tinyint)) AS a,
        |  date_sub('1900-01-01', cast(10 as smallint)) AS b,
        |  date_sub('1900-01-01', cast(10 as int)) AS c""".stripMargin,
      duck = Some("SELECT DATE '1900-01-01' - 10 AS a, " +
        "DATE '1900-01-01' - 10 AS b, DATE '1900-01-01' - 10 AS c"),
      note = "tinyint/smallint day counts coerce"),

    QCase("udf_add_months.q", "w17f02",
      """select add_months('2014-01-14', 1) AS a,
        |  add_months('2014-01-31', 1) AS b,
        |  add_months('2014-02-28', -1) AS c,
        |  add_months('2014-02-28', 2) AS d,
        |  add_months('2014-04-30', -2) AS e,
        |  add_months('2015-02-28', 12) AS f,
        |  add_months('2016-02-29', -12) AS g,
        |  add_months('2016-01-29', 1) AS h,
        |  add_months('2016-02-29', -1) AS i,
        |  add_months(cast(null as string), 1) AS j,
        |  add_months('2014-01-14', cast(null as int)) AS k""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("2014-02-14", "2014-02-28", "2014-01-31",
        "2014-04-30", "2014-02-28", "2016-02-29", "2015-02-28",
        "2016-02-29", "2016-01-31", "NULL", "NULL")),
      note = "END-OF-MONTH snapping: a last-day input answers the " +
        "target month's last day (2014-02-28 minus one month is " +
        "2014-01-31, not -28) — .q.out transcribed"),

    QCase("udf_chr.q", "w17f03",
      """select chr(-1) AS a, chr(48Y) AS b, chr(65S) AS c,
        |  chr(321S) AS d, chr(65L) AS e""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("", "0", "A", "A", "A")),
      note = "negative answers the EMPTY string; n >= 256 wraps mod " +
        "256 (321 → 'A'); tinyint/smallint/bigint inputs coerce"),

    QCase("udf_cbrt.q", "w17f04",
      """select cbrt(0.0) AS a, cbrt(1.0) AS b, cbrt(-1) AS c,
        |  cbrt(27) AS d, cbrt(-27.0) AS e,
        |  cbrt(87860583272930481) AS f,
        |  cbrt(cast(null as double)) AS g""".stripMargin,
      duck = Some("""select cbrt(0.0) AS a, cbrt(1.0) AS b,
        |  cbrt(-1) AS c, cbrt(27) AS d, cbrt(-27.0) AS e,
        |  cbrt(87860583272930481) AS f,
        |  cbrt(cast(null as double)) AS g""".stripMargin),
      hive = Some(Seq("0", "1", "-1", "3", "-3", "444561", "NULL")),
      note = "cube roots of negatives are real (not NaN)"),

    QCase("udf_degrees.q", "w17f05",
      "select degrees(PI()) AS d, radians(180.0) AS r",
      duck = Some("select degrees(pi()) AS d, radians(180.0) AS r")),

    QCase("udf_PI.q", "w17f06",
      "select PI() AS p, E() AS e",
      duck = Some("select pi() AS p, exp(1) AS e")),

    QCase("udf_divide.q", "w17f07",
      "SELECT 3 / 2 AS d",
      note = "integer division answers 1.5 — Hive / is always " +
        "fractional"),

    QCase("udf_modulo.q", "w17f08",
      "SELECT mod(3, 2) AS a, 3 % 2 AS b, mod(-3, 2) AS c",
      duck = Some("SELECT mod(3, 2) AS a, 3 % 2 AS b, mod(-3, 2) AS c"),
      note = "mod keeps the DIVIDEND's sign (-3 mod 2 = -1)"),

    QCase("udf_named_struct.q", "w17f09",
      """SELECT named_struct("foo", 1, "bar", 2).foo AS f,
        |  named_struct("foo", 1, "bar", 2).bar AS b""".stripMargin,
      duck = Some("SELECT 1 AS f, 2 AS b")),

    QCase("udf_bitwise_shiftleft.q", "w17f10",
      """select shiftleft(4, 2) AS a, shiftleft(1, 30) AS b,
        |  shiftleft(1, 31) AS c,
        |  shiftleft(CAST(1 AS BIGINT), 62) AS d""".stripMargin,
      duck = Some("select 16 AS a, 1073741824 AS b, " +
        "-2147483648 AS c, 4611686018427387904 AS d"),
      note = "INT shifts wrap at 32 bits (1 << 31 is the negative " +
        "sentinel); BIGINT shifts wrap at 64"),

    QCase("udf_bitwise_shiftright.q", "w17f11",
      """select shiftright(-8, 1) AS a, shiftright(8, 1) AS b,
        |  shiftrightunsigned(-8, 1) AS c,
        |  shiftrightunsigned(8, 1) AS d""".stripMargin,
      duck = Some("select -4 AS a, 4 AS b, 2147483644 AS c, 4 AS d"),
      note = "arithmetic vs unsigned right shift on a negative INT"),

    QCase("udf_bin.q", "w17f12",
      "SELECT bin(-5) AS b, bin(5) AS p",
      duck = Some("SELECT '111111111111111111111111111111111111111111" +
        "1111111111111111111011' AS b, '101' AS p"),
      note = "bin() renders the 64-bit two's complement of negatives"),

    QCase("udf_datetime_legacy_hybrid_calendar.q", "w17f13",
      """SELECT CAST('0601-03-07' AS DATE) AS dt,
        |  datetime_legacy_hybrid_calendar(CAST('0601-03-07' AS DATE))
        |    AS dtp""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("0601-03-07", "0601-03-04")),
      note = "7th-century proleptic dates re-render 3 days earlier " +
        "under the hybrid calendar (.q.out transcribed)"),

    QCase("udf_datetime_legacy_hybrid_calendar.q", "w17f14",
      """SELECT datetime_legacy_hybrid_calendar(
        |    CAST('0501-03-07 17:03:00.4321' AS TIMESTAMP)) AS tsp,
        |  datetime_legacy_hybrid_calendar(
        |    CAST('1600-03-07 17:03:00.4321' AS TIMESTAMP)) AS id"""
        .stripMargin,
      duck = Some(""),
      hive = Some(Seq("0501-03-05 17:03:00.4321",
        "1600-03-07 17:03:00.4321")),
      note = "6th-century offset is 2 days; at/after the 1582 " +
        "cutover the function is the identity"))

  test("qtest conformance wave 17f: udf_* tail (add_months snapping, " +
      "chr, cbrt, shifts, bin, hybrid calendar)") {
    run("udf_date_sub", "udf_add_months", "udf_chr", "udf_cbrt",
      "udf_degrees", "udf_PI", "udf_divide", "udf_modulo",
      "udf_named_struct", "udf_bitwise_shiftleft",
      "udf_bitwise_shiftright", "udf_bin",
      "udf_datetime_legacy_hybrid_calendar")
  }
}
