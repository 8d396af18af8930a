package graft

/** Qtest conformance, type-semantics families: `decimal_precision.q` /
  * `decimal_2.q` / `decimal_1_1.q` (precision/scale arithmetic, cast
  * matrix, overflow-to-NULL), `interval_arithmetic.q` (date ± year-month
  * / day-second intervals), `timestamp_*.q` cast corners. Decimal
  * arithmetic is the classic silent-divergence territory — Hive's
  * SQL:2011 precision/scale derivation is the contract Spark mirrors, and
  * the DuckDB twins spell the same type ascriptions so a drift in EITHER
  * engine's derivation rules surfaces as a value mismatch.
  *
  * Porting notes:
  *  - decimal_2.q's single-row scratch table is constant-only selects
  *    here (the table carried no data semantics);
  *  - epoch-valued casts avoid the .q.out third leg: the reference's
  *    qtests pin America/Los_Angeles while this engine pins UTC, so
  *    committed epoch numbers differ by timezone, not semantics — the
  *    UTC-on-both-engines DuckDB twin is the correct gate;
  *  - DuckDB has no timestamp→decimal cast: the twin derives it exactly
  *    as CAST(epoch_us(ts) AS DECIMAL(30,8)) / 1000000.
  */
class QtestTypesSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    // --------------------------------------------- decimal_precision.q
    QCase("decimal_precision.q", "dp1",
      "SELECT dval FROM qt_kv8 ORDER BY dval", ordered = true,
      duck = Some("SELECT dval FROM qt_kv8 ORDER BY dval NULLS LAST"),
      note = "the load itself: values overflowing decimal(20,10) are NULL"),
    QCase("decimal_precision.q", "dp2",
      "SELECT dval, dval + 1 AS p1, dval - 1 AS m1 FROM qt_kv8 " +
        "ORDER BY dval", ordered = true,
      duck = Some("SELECT dval, dval + 1 AS p1, dval - 1 AS m1 " +
        "FROM qt_kv8 ORDER BY dval NULLS LAST")),
    QCase("decimal_precision.q", "dp3",
      "SELECT dval, dval * 2 AS d2, dval / 3 AS d3 FROM qt_kv8 " +
        "ORDER BY dval", ordered = true,
      duck = Some("SELECT dval, dval * 2 AS d2, dval / 3 AS d3 " +
        "FROM qt_kv8 ORDER BY dval NULLS LAST")),
    QCase("decimal_precision.q", "dp4",
      "SELECT dval, dval / 9 AS d9, dval / 27 AS d27 FROM qt_kv8 " +
        "ORDER BY dval", ordered = true,
      duck = Some("SELECT dval, dval / 9 AS d9, dval / 27 AS d27 " +
        "FROM qt_kv8 ORDER BY dval NULLS LAST")),
    QCase("decimal_precision.q", "dp5",
      "SELECT dval, dval * dval AS sq FROM qt_kv8 " +
        "WHERE dval IS NULL OR abs(dval) < 100000 ORDER BY dval",
      ordered = true,
      duck = Some("SELECT dval, dval * dval AS sq FROM qt_kv8 " +
        "WHERE dval IS NULL OR abs(dval) < 100000 " +
        "ORDER BY dval NULLS LAST"),
      note = "decimal(20,10)^2 needs (40,20) -> clamps to 38 with scale " +
        "reduction; restricted to FITTING rows because DuckDB hard-errors " +
        "on decimal multiply overflow where Hive/Spark answer NULL (that " +
        "contract is dp7's); tolerance absorbs the engines' last-digit " +
        "scale-reduction choice (38,17) vs (38,20)"),
    QCase("decimal_precision.q", "dp6",
      "SELECT CAST(avg(dval) AS DECIMAL(24,14)) AS a, sum(dval) AS s " +
        "FROM qt_kv8",
      note = "avg ascribed to a shared type: Hive/Spark derive (24,14), " +
        "DuckDB derives its own avg type — the ascription pins the value"),
    QCase("decimal_precision.q", "dp7",
      "SELECT CAST('12345678901234567890.12345678' AS DECIMAL(38,18)) * " +
        "CAST('123456789012345678901234567890' AS DECIMAL(38,0)) AS x",
      duck = Some(""),
      hive = Some(Seq("NULL")),
      note = "decimal multiply whose result exceeds 38 digits answers " +
        "NULL — Hive's overflow contract (decimal_precision.q.out's NULL " +
        "rows); DuckDB hard-errors the same multiplication, so the " +
        "transcribed row is the gate"),
    QCase("decimal_precision.q", "dp8",
      "SELECT min(CAST('12345678901234567890.12345678' AS " +
        "DECIMAL(38,18))) AS mn, count(CAST('12345678901234567890" +
        ".12345678' AS DECIMAL(38,18))) AS c FROM qt_kv8"),

    // ----------------------------------------------------- decimal_2.q
    QCase("decimal_2.q", "dc1",
      """SELECT CAST(CAST('17.29' AS DECIMAL(4,2)) AS TINYINT) AS t,
        |  CAST(CAST('17.29' AS DECIMAL(4,2)) AS SMALLINT) AS si,
        |  CAST(CAST('17.29' AS DECIMAL(4,2)) AS INT) AS i,
        |  CAST(CAST('17.29' AS DECIMAL(4,2)) AS BIGINT) AS b,
        |  CAST(CAST('17.29' AS DECIMAL(4,2)) AS DOUBLE) AS d,
        |  CAST(CAST('17.29' AS DECIMAL(4,2)) AS STRING) AS s""".stripMargin,
      note = "decimal->integral TRUNCATES toward zero, ->string keeps " +
        "scale digits"),
    QCase("decimal_2.q", "dc2",
      """SELECT CAST(CAST('3404045.5044003' AS DECIMAL(18,9)) AS INT) AS i,
        |  CAST(CAST('3404045.5044003' AS DECIMAL(18,9)) AS BIGINT) AS b,
        |  CAST(CAST('3404045.5044003' AS DECIMAL(18,9)) AS DOUBLE) AS d,
        |  CAST(CAST('3404045.5044003' AS DECIMAL(18,9)) AS STRING) AS s"""
        .stripMargin),
    QCase("decimal_2.q", "dc3",
      """SELECT CAST(3.14 AS DECIMAL(4,2)) AS a,
        |  CAST(3.14 AS DECIMAL(5,4)) AS b,
        |  CAST(CAST(3.14 AS FLOAT) AS DECIMAL(4,2)) AS c""".stripMargin,
      note = "float 3.14 is 3.14000010... — the (4,2) rounding hides it " +
        "identically in both engines"),
    QCase("decimal_2.q", "dc4",
      "SELECT CAST(CAST('2012-12-19 11:12:19.1234567' AS TIMESTAMP) " +
        "AS DECIMAL(30,8)) AS x",
      duck = Some("SELECT CAST(epoch_us(CAST('2012-12-19 11:12:19.1234567'" +
        " AS TIMESTAMP)) AS DECIMAL(30,8)) / 1000000 AS x"),
      note = "timestamp->decimal = fractional epoch seconds (UTC on both " +
        "engines; the .q.out pins LA time, a timezone not a semantics)"),
    QCase("decimal_2.q", "dc5",
      """SELECT CAST(true AS DECIMAL) AS t,
        |  CAST(3Y AS DECIMAL) AS y, CAST(3S AS DECIMAL) AS s,
        |  CAST(CAST(3 AS INT) AS DECIMAL) AS i""".stripMargin,
      duck = Some("""SELECT CAST(CAST(true AS INT) AS DECIMAL) AS t,
        |  CAST(CAST(3 AS TINYINT) AS DECIMAL) AS y,
        |  CAST(CAST(3 AS SMALLINT) AS DECIMAL) AS s,
        |  CAST(CAST(3 AS INT) AS DECIMAL) AS i""".stripMargin),
      note = "bare DECIMAL = (10,0); Hive's nY/nS literal suffixes " +
        "respelled for the twin; boolean->decimal via int for DuckDB"),

    // ----------------------------------------------------- decimal_1_1.q
    QCase("decimal_1_1.q", "d11",
      """SELECT CAST('0.5' AS DECIMAL(1,1)) AS a,
        |  CAST('0.99' AS DECIMAL(1,1)) AS b,
        |  CAST('1.5' AS DECIMAL(1,1)) AS c,
        |  CAST('-0.5' AS DECIMAL(1,1)) AS d""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("0.5", "NULL", "NULL", "-0.5")),
      note = "decimal(1,1) holds (-1, 1) exclusive: 0.99 ROUNDS to 1.0 " +
        "which overflows -> NULL, 1.5 overflows -> NULL (decimal_1_1" +
        ".q.out rows 0.5/NULL; DuckDB instead errors the cast outright, " +
        "so the committed Hive rows are the gate)"),

    // ---------------------------------------------- interval_arithmetic.q
    QCase("interval_arithmetic.q", "ia1",
      """SELECT dateval,
        |  dateval - INTERVAL '2-2' YEAR TO MONTH AS m1,
        |  dateval + INTERVAL '2-2' YEAR TO MONTH AS p1,
        |  dateval + INTERVAL '-2-2' YEAR TO MONTH AS p2
        |FROM qt_dts ORDER BY dateval""".stripMargin, ordered = true,
      duck = Some("""SELECT dateval,
        |  CAST(dateval - INTERVAL 26 MONTH AS DATE) AS m1,
        |  CAST(dateval + INTERVAL 26 MONTH AS DATE) AS p1,
        |  CAST(dateval - INTERVAL 26 MONTH AS DATE) AS p2
        |FROM qt_dts ORDER BY dateval""".stripMargin),
      note = "year-month interval literal; '-2-2' = negative 26 months " +
        "(DuckDB date±interval promotes to timestamp — twin casts back)"),
    QCase("interval_arithmetic.q", "ia2",
      """SELECT dateval,
        |  dateval - INTERVAL '99 11:22:33.123456789' DAY TO SECOND AS m1,
        |  dateval + INTERVAL '99 11:22:33.123456789' DAY TO SECOND AS p1
        |FROM qt_dts ORDER BY dateval""".stripMargin, ordered = true,
      duck = Some("""SELECT dateval,
        |  CAST(dateval AS TIMESTAMP) - (INTERVAL 99 DAY + INTERVAL 11 HOUR
        |    + INTERVAL 22 MINUTE + INTERVAL '33.123456' SECOND) AS m1,
        |  CAST(dateval AS TIMESTAMP) + (INTERVAL 99 DAY + INTERVAL 11 HOUR
        |    + INTERVAL 22 MINUTE + INTERVAL '33.123456' SECOND) AS p1
        |FROM qt_dts ORDER BY dateval""".stripMargin),
      note = "date ± day-second interval PROMOTES to timestamp (the nanos " +
        "digit truncates to micros in both engines)"),
    QCase("interval_arithmetic.q", "ia3",
      """SELECT tsval,
        |  tsval - INTERVAL '2-2' YEAR TO MONTH AS m1,
        |  tsval + INTERVAL '2-2' YEAR TO MONTH AS p1
        |FROM qt_dts ORDER BY tsval""".stripMargin, ordered = true,
      duck = Some("""SELECT tsval,
        |  tsval - INTERVAL 26 MONTH AS m1,
        |  tsval + INTERVAL 26 MONTH AS p1
        |FROM qt_dts ORDER BY tsval""".stripMargin)),
    // the .q's `dateval - dateval` (interval-typed result) is excluded:
    // the interval's RENDERING differs per engine (Hive day-time string,
    // Spark INTERVAL 'n' DAY, DuckDB int days) — ia5 pins the VALUE
    // contract via datediff instead
    QCase("interval_arithmetic.q", "ia5",
      """SELECT datediff(dateval, DATE '1999-06-07') AS days1,
        |  datediff(DATE '1999-06-07', dateval) AS days2
        |FROM qt_dts ORDER BY dateval""".stripMargin, ordered = true,
      duck = Some("""SELECT datediff('day', DATE '1999-06-07', dateval)
        |  AS days1, datediff('day', dateval, DATE '1999-06-07') AS days2
        |FROM qt_dts ORDER BY dateval""".stripMargin),
      note = "the date-difference VALUE contract (Hive datediff arg order " +
        "is (end, start); DuckDB's is (part, start, end))"),

    // ------------------------------------------------------ timestamp_*.q
    QCase("timestamp_1.q", "ts1",
      """SELECT CAST(CAST('2011-01-01 01:01:01' AS TIMESTAMP) AS BOOLEAN)
        |  AS b,
        |  CAST(CAST('2011-01-01 01:01:01' AS TIMESTAMP) AS BIGINT) AS l,
        |  CAST(CAST('2011-01-01 01:01:01' AS TIMESTAMP) AS DOUBLE) AS d"""
        .stripMargin,
      duck = Some("""SELECT true AS b,
        |  epoch(CAST('2011-01-01 01:01:01' AS TIMESTAMP)) AS l,
        |  epoch(CAST('2011-01-01 01:01:01' AS TIMESTAMP)) * 1.0 AS d"""
        .stripMargin),
      note = "timestamp->bigint/double = UTC epoch seconds here (the " +
        ".q.out's LA-pinned number differs by timezone only); ->boolean " +
        "is Hive's nonzero=true"),
    QCase("timestamp_2.q", "ts2",
      """SELECT CAST(CAST('2011-01-01 01:01:01.123' AS TIMESTAMP)
        |  AS STRING) AS s,
        |  second(CAST('2011-01-01 01:01:01.123456' AS TIMESTAMP)) AS sec,
        |  minute(CAST('2011-01-01 01:01:01.123456' AS TIMESTAMP)) AS mn,
        |  hour(CAST('2011-01-01 01:01:01.123456' AS TIMESTAMP)) AS hr"""
        .stripMargin,
      duck = Some("""SELECT CAST(CAST('2011-01-01 01:01:01.123'
        |  AS TIMESTAMP) AS STRING) AS s,
        |  CAST(date_part('second', CAST('2011-01-01 01:01:01.123456'
        |    AS TIMESTAMP)) AS INT) AS sec,
        |  CAST(date_part('minute', CAST('2011-01-01 01:01:01.123456'
        |    AS TIMESTAMP)) AS INT) AS mn,
        |  CAST(date_part('hour', CAST('2011-01-01 01:01:01.123456'
        |    AS TIMESTAMP)) AS INT) AS hr""".stripMargin)))

  test("qtest conformance: decimal precision/scale derivation, the cast " +
      "matrix, overflow-to-NULL") {
    run("decimal")
  }
  test("qtest conformance: interval arithmetic and timestamp cast corners") {
    run("interval", "timestamp")
  }
}
