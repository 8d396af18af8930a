package graft

/** Conformance wave: a bulk sweep of simple scalar `udf_*.q` files —
  * ref ql/src/test/queries/clientpositive/udf_{ascii,bin,abs,cbrt,E,PI,
  * bitwise_shiftleft,factorial,sha1,quarter,nullif,position,add_months,
  * character_length}.q, expected cells transcribed from
  * results/clientpositive/llap. All literal-driven single-row selects,
  * .q.out-pinned (duck = Some("") — DuckDB's equivalents differ in
  * naming or NULL conventions and the transcript is the stronger leg).
  *
  * Findings fixed in HiveFunctions: `add_months` end-of-month snapping
  * (a last-day start answers the result month's last day), and the
  * `sha` == sha1 alias.
  */
class QtestUdfBulkSpec extends QtestHarness {

  private def h(file: String, name: String, sql: String,
      expected: Seq[String], note: String = "") =
    QCase(file, name, sql, duck = Some(""), hive = Some(expected),
      note = note)

  protected val qcases: Seq[QCase] = Seq(
    h("udf_ascii.q", "ascii1",
      "SELECT ascii('Facebook'), ascii(''), ascii('!')",
      Seq("70", "0", "33")),

    h("udf_bin.q", "bin1",
      "SELECT bin(1), bin(0), bin(99992421), bin(-5)",
      Seq("1", "0", "101111101011100001101100101",
        "1111111111111111111111111111111111111111111111111111111111111011"),
      note = "negatives render 64-bit two's complement"),

    h("udf_abs.q", "abs1",
      "SELECT abs(0), abs(-1), abs(123), abs(-9223372036854775807), " +
        "abs(9223372036854775807), abs(0.0), abs(-3.14159265), abs(3.14159265)",
      Seq("0", "1", "123", "9223372036854775807", "9223372036854775807",
        "0", "3.14159265", "3.14159265")),

    h("udf_cbrt.q", "cbrt1",
      "select cbrt(0.0), cbrt(1.0), cbrt(-1), cbrt(27), cbrt(-27.0), " +
        "cbrt(87860583272930481), cbrt(cast(null as double))",
      Seq("0.0", "1.0", "-1.0", "3.0", "-3.0", "444561.0", "NULL")),

    h("udf_E.q", "epi1",
      "select E(), PI()",
      Seq("2.718281828459045", "3.141592653589793")),

    h("udf_bitwise_shiftleft.q", "shl1",
      "select shiftleft(4, 33), shiftleft(4, 65), shiftleft(4, 4001), " +
        "shiftleft(16, -2), shiftleft(4, cast(null as int)), " +
        "shiftleft(cast(null as int), 4), " +
        "shiftleft(cast(null as int), cast(null as int))",
      Seq("8", "8", "8", "0", "NULL", "NULL", "NULL"),
      note = "shift count wraps mod the type width (Java semantics)"),

    h("udf_factorial.q", "fact1",
      "select factorial(5), factorial(0), factorial(20), factorial(-1), " +
        "factorial(21), factorial(cast(null as int))",
      Seq("120", "1", "2432902008176640000", "NULL", "NULL", "NULL")),

    h("udf_sha1.q", "sha1a",
      "select sha1('ABC'), sha(''), sha1(cast(null as string))",
      Seq("3c01bdbb26f358bab27f267924aa2c9a03fcfdb8",
        "da39a3ee5e6b4b0d3255bfef95601890afd80709", "NULL"),
      note = "sha is the sha1 alias"),

    h("udf_quarter.q", "qtr1",
      "select quarter('2014-01-10'), quarter('2014-03-31'), " +
        "quarter('2014-04-02'), quarter('2014-09-30'), " +
        "quarter('2014-10-01'), quarter('2014-12-31'), " +
        "quarter(cast(null as string)), " +
        "quarter(cast('2014-01-10 00:00:00' as timestamp)), " +
        "quarter(cast('2014-12-31' as date))",
      Seq("1", "1", "2", "3", "4", "4", "NULL", "1", "4")),

    h("udf_nullif.q", "nif1",
      "select nullif(1,1), nullif(2,1), nullif('','x'), nullif('x','x'), " +
        "nullif('x',''), nullif(1.0,2.0), " +
        "nullif(date('2011-11-11'),date('2011-11-11')), " +
        "nullif(date('2011-11-11'),date('2011-11-22')), " +
        "nullif(1,null), nullif(1.0,1)",
      Seq("NULL", "2", "", "NULL", "x", "1", "NULL", "2011-11-11", "1",
        "NULL"),
      note = "cross-type pairs compare under the ordinary coercions " +
        "(decimal 1.0 == int 1)"),

    h("udf_nullif.q", "nif2",
      "SELECT NULLIF(array(1,2,3),array(1,2,3)) is null, " +
        "NULLIF(array(1,2,3),array(3,2,1)) is not null, " +
        """NULLIF(named_struct("c", 1),named_struct("c", 1)) is null, """ +
        """NULLIF(named_struct("c", 1),named_struct("c", 2)) is not null""",
      Seq("true", "true", "true", "true"),
      note = "arrays/structs are NULLIF-comparable (the .q's map pair is " +
        "excluded: Spark has no map equality — a documented narrowing)"),

    h("udf_position.q", "pos1",
      """SELECT position('abc', 'abcd'),
        |       position('ccc', 'abcabc'),
        |       position('23', 123),
        |       position(23, 123),
        |       position('abc', 'abcabc', 2),
        |       position('abc', 'abcabc', '2'),
        |       position(CAST('2' AS TINYINT), '12345'),
        |       position('34', CAST('12345' AS SMALLINT)),
        |       position('456', CAST('123456789012' AS BIGINT)),
        |       position('.25', CAST(1.25 AS FLOAT)),
        |       position('.0', CAST(16.0 AS DOUBLE)),
        |       position(null, 'abc'),
        |       position('abc', null)""".stripMargin,
      Seq("1", "0", "2", "2", "4", "4", "2", "3", "4", "2", "3", "NULL",
        "NULL"),
      note = "position == locate; numeric haystacks stringify"),

    h("udf_add_months.q", "addm1",
      "select add_months('2014-01-14', 1), add_months('2014-01-31', 1), " +
        "add_months('2014-02-28', -1), add_months('2014-02-28', 2), " +
        "add_months('2014-04-30', -2), add_months('2015-02-28', 12), " +
        "add_months('2016-02-29', -12), add_months('2016-02-29', -1), " +
        "add_months('2016-01-29', 1), add_months(cast(null as string), 1), " +
        "add_months('2014-01-14', cast(null as int))",
      Seq("2014-02-14", "2014-02-28", "2014-01-31", "2014-04-30",
        "2014-02-28", "2016-02-29", "2015-02-28", "2016-01-31",
        "2016-02-29", "NULL", "NULL"),
      note = "END-OF-MONTH snapping (the wave's finding): a last-day " +
        "start answers the result month's last day"),

    h("udf_character_length.q", "clen1",
      "SELECT character_length(cast(null as string)), char_length('ab'), " +
        "character_length(''), char_length('abcd')",
      Seq("NULL", "2", "0", "4")))

  test("qtest conformance: bulk scalar udf sweep (ascii/bin/abs/cbrt/" +
      "E/PI/shiftleft/factorial/sha1/quarter/nullif/position/add_months/" +
      "character_length)") {
    run("udf_")
  }
}
