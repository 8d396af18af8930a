package graft

/** Qtest conformance, char/varchar family: `char_comparison.q`,
  * `varchar_comparison.q`, `char_cast.q`, `char_1.q`/`varchar_1.q` cores.
  * CHAR(n) semantics are pad-insensitive in Hive (comparisons ignore
  * trailing pad, UDFs see the stripped value) — the engine answers the
  * same, and DuckDB's CHAR (a VARCHAR alias, never padded) agrees on
  * every stripped-value observable, which is exactly the surface these
  * files pin.
  */
class QtestCharSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("char_comparison.q", "ch1",
      """SELECT CAST('abc' AS CHAR(10)) = CAST('abc' AS CHAR(10)) AS a,
        |  CAST('abc' AS CHAR(10)) <= CAST('abc' AS CHAR(10)) AS b,
        |  CAST('abc' AS CHAR(10)) >= CAST('abc' AS CHAR(10)) AS c,
        |  CAST('abc' AS CHAR(10)) < CAST('abd' AS CHAR(10)) AS d,
        |  CAST('abc' AS CHAR(10)) > CAST('abb' AS CHAR(10)) AS e,
        |  CAST('abc' AS CHAR(10)) <> CAST('abb' AS CHAR(10)) AS f"""
        .stripMargin),
    QCase("char_comparison.q", "ch2",
      """SELECT CAST('abc' AS CHAR(10)) = CAST('abc' AS CHAR(3)) AS a,
        |  CAST('abc' AS CHAR(10)) <= CAST('abc' AS CHAR(3)) AS b,
        |  CAST('abc' AS CHAR(10)) < CAST('abd' AS CHAR(3)) AS c,
        |  CAST('abc' AS CHAR(10)) > CAST('abb' AS CHAR(3)) AS d"""
        .stripMargin,
      note = "MIXED-length char comparison is pad-insensitive"),
    QCase("varchar_comparison.q", "vc1",
      """SELECT CAST('abc' AS VARCHAR(10)) = CAST('abc' AS VARCHAR(3)) AS a,
        |  CAST('abc' AS VARCHAR(10)) < CAST('abd' AS VARCHAR(3)) AS b,
        |  CAST('abc' AS VARCHAR(10)) > CAST('abb' AS VARCHAR(3)) AS c"""
        .stripMargin),
    QCase("char_cast.q", "cc1",
      """SELECT CAST(CAST('11' AS CHAR(10)) AS TINYINT) AS a,
        |  CAST(CAST('11' AS CHAR(10)) AS INT) AS b,
        |  CAST(CAST('11.00' AS CHAR(10)) AS DOUBLE) AS c,
        |  CAST(CAST('11.00' AS CHAR(10)) AS DECIMAL) AS d""".stripMargin,
      duck = Some("""SELECT CAST(CAST('11' AS CHAR(10)) AS TINYINT) AS a,
        |  CAST(CAST('11' AS CHAR(10)) AS INT) AS b,
        |  CAST(CAST('11.00' AS CHAR(10)) AS DOUBLE) AS c,
        |  CAST(TRIM(CAST('11.00' AS CHAR(10))) AS DECIMAL) AS d"""
        .stripMargin),
      note = "char->numeric casts see the STRIPPED value (the padding " +
        "never reaches the parse)"),
    QCase("char_cast.q", "cc2",
      """SELECT CAST(CAST('11' AS VARCHAR(10)) AS INT) AS a,
        |  CAST(CAST('11.00' AS VARCHAR(10)) AS DOUBLE) AS b""".stripMargin),
    QCase("char_1.q", "c1a",
      """SELECT CAST('abcdef' AS CHAR(3)) AS t3,
        |  length(CAST('abc' AS CHAR(10))) AS l,
        |  concat(CAST('abc' AS CHAR(5)), 'Z') AS cz""".stripMargin,
      note = "length()/concat() observe the STRIPPED value (Hive's " +
        "HiveCharWritable.getStrippedValue) — matched. DOCUMENTED " +
        "DIVERGENCE on t3: Hive silently TRUNCATES a cast to char(n) " +
        "('abc'); this engine and DuckDB keep the full string (Spark's " +
        "cast stringifies char types; its preserve-type flag would " +
        "ANSI-ERROR the overflow and break length/stripped semantics " +
        "Hive-wards elsewhere, a worse trade)"),
    QCase("varchar_1.q", "v1a",
      """SELECT length(CAST('abcdef' AS VARCHAR(3))) AS l""".stripMargin,
      duck = Some("SELECT length(substr('abcdef', 1, 3)) AS l"),
      note = "FIXED (r16, plans/VarcharCasts): CAST to bounded varchar " +
        "TRUNCATES like Hive (3) — Spark's parser used to discard the " +
        "length and both gate engines answered 6; the c1a CHAR-cast " +
        "divergence still stands (padding/stripped-length semantics)"),
    QCase("char_1.q", "c1b",
      "SELECT CAST(key AS CHAR(10)) AS k, CAST(value AS CHAR(15)) AS v " +
        "FROM qt_src ORDER BY k, v LIMIT 2",
      ordered = true,
      note = "the char1 table round-trip as a direct cast-projection"))

  test("qtest conformance: char/varchar padding, truncation, comparison " +
      "and cast semantics") {
    run("char_", "varchar_")
  }
}
