package graft

/** Qtest conformance, scalar-function wave 2: formatting (printf),
  * string surgery (substring_index, space, chr, replace, hex, soundex,
  * levenshtein), date navigation (months_between, next_day, last_day,
  * TRUNC), factorial's domain edges. DuckDB twins respell what it lacks
  * (printf's Java formatter, substring_index, soundex, next_day,
  * factorial's bigint overflow-to-NULL) — those gate on transcribed
  * semantics or derived spellings; everything else runs verbatim.
  */
class QtestUdfMiscSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("udf_printf.q", "pf1",
      """SELECT printf('Hello World %d %s', 100, 'days') AS a,
        |  printf('number2 %05d, hex %#x, float %5.2f', 89, 255,
        |    CAST(3.14159 AS DOUBLE)) AS b""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("Hello World 100 days",
        "number2 00089, hex 0xff, float  3.14")),
      note = "Java Formatter semantics (udf_printf.q.out); DuckDB's " +
        "printf is C-style (%#x/%05d agree, but NULL handling differs)"),
    QCase("udf_substring_index.q", "si1",
      """SELECT substring_index('www.apache.org', '.', 3) AS a,
        |  substring_index('www.apache.org', '.', 2) AS b,
        |  substring_index('www.apache.org', '.', 1) AS c,
        |  substring_index('www.apache.org', '.', 0) AS d,
        |  substring_index('www.apache.org', '.', -1) AS e,
        |  substring_index('www.apache.org', '.', -2) AS f""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("www.apache.org", "www.apache", "www", "",
        "org", "apache.org")),
      note = "MySQL-style delimiter-count substring, negative = from the " +
        "right (udf_substring_index.q.out)"),
    QCase("udf_months_between.q", "mb1",
      """SELECT months_between('1995-02-02', '1995-01-01') AS a,
        |  months_between('2003-07-17', '2005-07-06') AS b,
        |  months_between('2001-06-30', '2000-05-31') AS c,
        |  months_between('2002-02-28', '2002-03-01') AS d,
        |  months_between('2012-02-29', '2012-03-01') AS e""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("1.03225806", "-23.64516129", "13", "-0.12903226",
        "-0.09677419")),
      note = "Oracle's 31-day-month fraction rule incl. the last-day " +
        "special cases (values from udf_months_between.q.out)"),
    QCase("udf_next_day.q", "nd1",
      """SELECT next_day('2015-01-11', 'su') AS a,
        |  next_day('2015-01-11', 'MO') AS b,
        |  next_day('2015-01-11', 'Tu') AS c,
        |  next_day('2015-01-11', 'FR') AS d""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("2015-01-18", "2015-01-12", "2015-01-13",
        "2015-01-16")),
      note = "case-insensitive 2-letter day names; a Sunday input moves a " +
        "FULL week for 'su'"),
    QCase("udf_last_day.q", "ld1",
      """SELECT last_day('2014-01-01') AS a, last_day('2014-02-02') AS b,
        |  last_day('2016-02-03') AS c, last_day('2014-12-31') AS d"""
        .stripMargin,
      duck = Some("""SELECT CAST(last_day(DATE '2014-01-01') AS STRING)
        |  AS a, CAST(last_day(DATE '2014-02-02') AS STRING) AS b,
        |  CAST(last_day(DATE '2016-02-03') AS STRING) AS c,
        |  CAST(last_day(DATE '2014-12-31') AS STRING) AS d""".stripMargin),
      note = "incl. the 2016 leap February"),
    QCase("udf_trunc.q", "tr1",
      """SELECT trunc('2014-01-14', 'MM') AS a,
        |  trunc('2016-02-28', 'MM') AS b,
        |  trunc('2014-05-14', 'YEAR') AS c,
        |  trunc('2014-05-14', 'Q') AS d""".stripMargin,
      duck = Some("""SELECT CAST(date_trunc('month', DATE '2014-01-14')
        |  AS STRING) AS a,
        |  CAST(date_trunc('month', DATE '2016-02-28') AS STRING) AS b,
        |  CAST(date_trunc('year', DATE '2014-05-14') AS STRING) AS c,
        |  CAST(date_trunc('quarter', DATE '2014-05-14') AS STRING) AS d"""
        .stripMargin),
      note = "Hive's TRUNC format tokens (MM/YEAR/Q) vs date_trunc parts"),
    QCase("udf_hex.q", "hx1",
      """SELECT hex(17) AS a, hex('Facebook') AS b,
        |  CAST(unhex('4D7953514C') AS STRING) AS c,
        |  hex(unhex('1A2B')) AS d""".stripMargin,
      note = "int and string hex; unhex returns BYTES in both engines " +
        "(the cast makes the text observable — Hive renders binary as " +
        "text implicitly)"),
    QCase("udf_space.q", "sp1",
      """SELECT concat('[', space(3), ']') AS a,
        |  concat('[', space(0), ']') AS b,
        |  length(space(10)) AS c""".stripMargin,
      duck = Some("""SELECT concat('[', repeat(' ', 3), ']') AS a,
        |  concat('[', repeat(' ', 0), ']') AS b,
        |  length(repeat(' ', 10)) AS c""".stripMargin)),
    QCase("udf_chr.q", "ch1",
      "SELECT chr(65) AS a, chr(97) AS b, ascii('A') AS c",
      duck = Some("SELECT chr(65) AS a, chr(97) AS b, ascii('A') AS c")),
    QCase("udf_replace.q", "rp1",
      "SELECT replace('Hello World', 'o', '0') AS a, " +
        "replace('ababab', 'ab', 'c') AS b",
      note = "literal (non-regex) replacement"),
    QCase("udf_levenshtein.q", "lv1",
      "SELECT levenshtein('kitten', 'sitting') AS a, " +
        "levenshtein('', 'abc') AS b, levenshtein('abc', 'abc') AS c",
      duck = Some("SELECT levenshtein('kitten', 'sitting') AS a, " +
        "levenshtein('', 'abc') AS b, levenshtein('abc', 'abc') AS c")),
    QCase("udf_soundex.q", "sd1",
      """SELECT soundex('Miller') AS a, soundex('muller') AS b,
        |  soundex('m') AS c""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("M460", "M460", "M000")),
      note = "classic soundex incl. short-input zero padding " +
        "(udf_soundex.q.out)"),
    QCase("udf_factorial.q", "fa1",
      """SELECT factorial(5) AS a, factorial(0) AS b, factorial(20) AS c,
        |  factorial(-1) AS d, factorial(21) AS e""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("120", "1", "2432902008176640000", "NULL", "NULL")),
      note = "bigint domain: 21! overflows and negatives are NULL, not " +
        "errors (udf_factorial.q.out; DuckDB computes 21! in HUGEINT)"))

  test("qtest conformance: scalar wave 2 (printf, substring_index, " +
      "months_between, next/last_day, trunc, hex, soundex, factorial)") {
    run("udf_printf", "udf_substring_index", "udf_months_between",
      "udf_next_day", "udf_last_day", "udf_trunc", "udf_hex", "udf_space",
      "udf_chr", "udf_replace", "udf_levenshtein", "udf_soundex",
      "udf_factorial")
  }
}
