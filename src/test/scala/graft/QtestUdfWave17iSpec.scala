package graft

/** Conformance wave 17i: the udf_* grab-bag tail — nested trims
  * (udf_10_trims.q), ascii edges (udf_ascii.q), abs at the Long
  * boundary (udf_abs.q), BETWEEN with arithmetic/string/coerced bounds
  * (udf_between.q), character_length/char_length aliases
  * (udf_character_length.q), and numeric aggregates OVER char/varchar
  * columns — Hive coerces the stripped text through double
  * (char_varchar_udf.q).
  */
class QtestUdfWave17iSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("udf_10_trims.q", "w17i01",
      """SELECT trim(trim(trim(trim(trim(trim(trim(trim(trim(trim(
        |  '  abc  ')))))))))) AS t
        |FROM qt_src WHERE qt_src.key = 86""".stripMargin),

    QCase("udf_ascii.q", "w17i02",
      """SELECT ascii('Facebook') AS a, ascii('') AS b,
        |  ascii('!') AS c""".stripMargin,
      duck = Some("SELECT 70 AS a, 0 AS b, 33 AS c"),
      note = "ascii('') answers 0, not NULL"),

    QCase("udf_abs.q", "w17i03",
      """SELECT abs(0) AS a, abs(-1) AS b, abs(123) AS c,
        |  abs(-9223372036854775807) AS d,
        |  abs(9223372036854775807) AS e,
        |  abs(0.0) AS f, abs(-3.14159265) AS g,
        |  abs(cast(null as int)) AS h""".stripMargin,
      duck = Some("""SELECT abs(0) AS a, abs(-1) AS b, abs(123) AS c,
        |  abs(-9223372036854775807) AS d,
        |  abs(9223372036854775807) AS e,
        |  abs(0.0) AS f, abs(-3.14159265) AS g,
        |  abs(cast(null as int)) AS h""".stripMargin),
      note = "abs at the Long boundary and over decimals"),

    QCase("udf_between.q", "w17i04",
      """SELECT key, value FROM qt_src
        |where key + 100 between (150 + -50) AND (150 + 50)
        |ORDER BY key, value LIMIT 20""".stripMargin,
      duck = Some("""SELECT key, value FROM qt_src
        |where CAST(key AS DOUBLE) + 100 between (150 + -50)
        |  AND (150 + 50)
        |ORDER BY key NULLS LAST, value NULLS LAST LIMIT 20"""
        .stripMargin), ordered = true,
      note = "arithmetic over the STRING key coerces to double; " +
        "computed BETWEEN bounds; the .q's bare LIMIT gets a " +
        "deterministic ORDER BY"),

    QCase("udf_between.q", "w17i05",
      """SELECT count(*) AS c FROM qt_src
        |where key + 100 not between (150 + -50) AND (150 + 50)"""
        .stripMargin,
      duck = Some("""SELECT count(*) AS c FROM qt_src
        |where CAST(key AS DOUBLE) + 100 not between (150 + -50)
        |  AND (150 + 50)""".stripMargin)),

    QCase("udf_between.q", "w17i06",
      """SELECT 'b' between 'a' AND 'c' AS s,
        |  2 between 2 AND '3' AS n""".stripMargin,
      duck = Some("SELECT 'b' between 'a' AND 'c' AS s, " +
        "2 between 2 AND CAST('3' AS INT) AS n"),
      note = "string BETWEEN compares lexicographically; a string " +
        "bound against numeric operands coerces numerically"),

    QCase("udf_character_length.q", "w17i07",
      """SELECT character_length(value) AS a, char_length(value) AS b,
        |  character_length(CAST(NULL AS STRING)) AS c
        |FROM qt_src WHERE key = 86""".stripMargin,
      duck = Some("""SELECT length(value) AS a, length(value) AS b,
        |  length(CAST(NULL AS VARCHAR)) AS c
        |FROM qt_src WHERE key = 86""".stripMargin),
      note = "both ANSI spellings alias length()"),

    QCase("char_varchar_udf.q", "w17i08",
      """SELECT ROUND(c, 2) AS rc, ROUND(vc, 3) AS rvc
        |FROM (VALUES ('123.4567', '98765.4321'))
        |  char_varchar_udf(c, vc)""".stripMargin,
      duck = Some("""SELECT ROUND(CAST(c AS DOUBLE), 2) AS rc,
        |  ROUND(CAST(vc AS DOUBLE), 3) AS rvc
        |FROM (VALUES ('123.4567', '98765.4321'))
        |  char_varchar_udf(c, vc)""".stripMargin),
      note = "numeric functions over text coerce through double"),

    QCase("char_varchar_udf.q", "w17i09",
      """SELECT AVG(c) AS ac, AVG(vc) AS avc,
        |  SUM(c) AS sc, SUM(vc) AS svc
        |FROM (VALUES ('123.4567', '98765.4321'))
        |  char_varchar_udf(c, vc)""".stripMargin,
      duck = Some("""SELECT AVG(CAST(c AS DOUBLE)) AS ac,
        |  AVG(CAST(vc AS DOUBLE)) AS avc,
        |  SUM(CAST(c AS DOUBLE)) AS sc,
        |  SUM(CAST(vc AS DOUBLE)) AS svc
        |FROM (VALUES ('123.4567', '98765.4321'))
        |  char_varchar_udf(c, vc)""".stripMargin),
      note = "aggregates over text coerce through double too"))

  test("qtest conformance wave 17i: udf_* grab-bag (trims, ascii, abs " +
      "boundaries, BETWEEN coercions, text-through-double aggregates)") {
    run("udf_10_trims", "udf_ascii", "udf_abs", "udf_between",
      "udf_character_length", "char_varchar_udf")
  }
}
