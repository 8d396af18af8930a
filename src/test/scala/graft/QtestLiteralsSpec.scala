package graft

/** Qtest conformance, lexical family: `literal_string.q` (quote-doubling
  * escapes and Hive's ADJACENT-literal concatenation — lexer rules Spark
  * inherited verbatim), `literal_ints.q` (Y/S/L typed suffixes),
  * `literal_double.q` (exponent spellings), `quote1.q` (backticked
  * RESERVED-word identifiers). DuckDB twins respell what standard SQL
  * lexes differently: double-quoted strings are identifiers there,
  * adjacent literals need explicit concat, backticks become quotes.
  */
class QtestLiteralsSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("literal_string.q", "ls1",
      """SELECT 'face''book' AS a, "face""book" AS b, 'face' 'book' AS c,
        |  'face' 'bo' 'ok' AS d, 'face'"book" AS e, 'facebook' AS f"""
        .stripMargin,
      duck = Some("""SELECT 'face''book' AS a, 'face"book' AS b,
        |  'facebook' AS c, 'facebook' AS d, 'facebook' AS e,
        |  'facebook' AS f""".stripMargin),
      note = "quote-doubling INSIDE a literal escapes; ADJACENT literals " +
        "concatenate (Hive lexer rules, inherited by Spark; the twin " +
        "spells the results since standard SQL lexes both differently)"),
    QCase("literal_ints.q", "li1",
      "SELECT 100 AS a, 100Y AS b, 100S AS c, 100L AS d",
      duck = Some("SELECT 100 AS a, CAST(100 AS TINYINT) AS b, " +
        "CAST(100 AS SMALLINT) AS c, CAST(100 AS BIGINT) AS d"),
      note = "Y/S/L typed integer suffixes"),
    QCase("literal_double.q", "ld1",
      """SELECT 3.14 AS a, -3.14 AS b, 3.14e8 AS c, 3.14e-8 AS d,
        |  -3.14e8 AS e, 3.14e+8 AS f, 3.14E8 AS g, 3.14E-8 AS h"""
        .stripMargin,
      note = "every exponent spelling; bare 3.14 is a DECIMAL literal in " +
        "both engines, exponent forms are DOUBLE"),
    QCase("quote1.q", "q1",
      """SELECT `int`.`location`, `int`.`type`, `int`.`table`
        |FROM (SELECT key AS `location`, value AS `type`,
        |        '2008-04-08' AS `table`
        |      FROM qt_src WHERE key = '238') `int`
        |WHERE `int`.`table` = '2008-04-08'""".stripMargin,
      duck = Some("""SELECT "int"."location", "int"."type", "int"."table"
        |FROM (SELECT key AS "location", value AS "type",
        |        '2008-04-08' AS "table"
        |      FROM qt_src WHERE key = '238') "int"
        |WHERE "int"."table" = '2008-04-08'""".stripMargin),
      note = "RESERVED words (int/table/location/type) as backticked " +
        "table alias and column names"))

  test("qtest conformance: string/number literal lexing and backticked " +
      "reserved-word identifiers") {
    run("literal_", "quote1")
  }
}
