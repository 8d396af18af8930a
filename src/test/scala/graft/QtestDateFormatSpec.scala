package graft

/** Qtest conformance, datetime formatting family: `udf_date_format.q`,
  * `udf_unix_timestamp.q` / `udf_to_unix_timestamp.q`, from_unixtime
  * round-trips. Hive formats through Java SimpleDateFormat; Spark's
  * DEFAULT formatter matches it on the whole everyday surface (pinned
  * here) but REFUSES the week-based patterns ('Y' week-year, 'w'
  * week-of-year, udf_date_format.q's first block) with an explicit
  * INCONSISTENT_BEHAVIOR error naming the remedy — a user needing those
  * sets `spark.sql.legacy.timeParserPolicy=LEGACY` (full
  * SimpleDateFormat). Documented divergence, not silent: the refusal
  * message carries the fix. Epoch values compare UTC-vs-UTC (the
  * reference's .q.outs pin LA time — timezone, not semantics).
  */
class QtestDateFormatSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("udf_date_format.q", "df1",
      """SELECT date_format('2015-04-08', 'E') AS a,
        |  date_format('2015-04-08', 'y') AS b,
        |  date_format('2015-04-08', 'MMM') AS c,
        |  date_format('2015-04-08', 'D') AS d,
        |  date_format('2015-04-08', 'd') AS e,
        |  date_format('2015-04-08', 'dd') AS f,
        |  date_format(CAST(NULL AS STRING), 'dd') AS g""".stripMargin,
      duck = Some("""SELECT strftime(DATE '2015-04-08', '%a') AS a,
        |  strftime(DATE '2015-04-08', '%Y') AS b,
        |  strftime(DATE '2015-04-08', '%b') AS c,
        |  strftime(DATE '2015-04-08', '%-j') AS d,
        |  strftime(DATE '2015-04-08', '%-d') AS e,
        |  strftime(DATE '2015-04-08', '%d') AS f,
        |  strftime(CAST(NULL AS DATE), '%d') AS g""".stripMargin),
      note = "the everyday pattern letters (day name, year, month name, " +
        "day-of-year, padded/unpadded day, NULL input); the week-based " +
        "'Y'/'w' letters are the documented legacy-policy edge"),
    QCase("udf_unix_timestamp.q", "ut1",
      "SELECT unix_timestamp('2009-03-20 11:30:01') AS a, " +
        "to_unix_timestamp('2009-03-20 11:30:01') AS b",
      duck = Some("SELECT epoch(TIMESTAMP '2009-03-20 11:30:01') AS a, " +
        "epoch(TIMESTAMP '2009-03-20 11:30:01') AS b")),
    QCase("udf_unix_timestamp.q", "ut2",
      "SELECT unix_timestamp('2009-03-20', 'yyyy-MM-dd') AS a, " +
        "unix_timestamp('2009 Mar 20 11:30:01 AM', " +
        "'yyyy MMM dd h:mm:ss a') AS b",
      duck = Some("SELECT epoch(strptime('2009-03-20', '%Y-%m-%d')) AS a, " +
        "epoch(strptime('2009 Mar 20 11:30:01 AM', " +
        "'%Y %b %d %I:%M:%S %p')) AS b"),
      note = "custom parse patterns incl. 12-hour AM/PM"),
    QCase("udf_unix_timestamp.q", "ut3",
      "SELECT unix_timestamp('2009-03-20x11:30:01') AS a",
      duck = Some(""),
      hive = Some(Seq("NULL")),
      note = "an unparseable input answers NULL, never an error (Hive's " +
        "contract; DuckDB's epoch/strptime would raise)"),
    QCase("udf_from_unixtime.q", "fu1",
      "SELECT from_unixtime(1237548601) AS a, " +
        "from_unixtime(1237548601, 'yyyy-MM-dd') AS b",
      duck = Some("SELECT strftime(to_timestamp(1237548601), " +
        "'%Y-%m-%d %H:%M:%S') AS a, " +
        "strftime(to_timestamp(1237548601), '%Y-%m-%d') AS b"),
      note = "the unix_timestamp round-trip, default and custom formats"))

  test("qtest conformance: datetime format/parse family (date_format, " +
      "unix_timestamp round-trips, unparseable-input NULL)") {
    run("udf_date_format", "udf_unix_timestamp", "udf_from_unixtime")
  }
}
