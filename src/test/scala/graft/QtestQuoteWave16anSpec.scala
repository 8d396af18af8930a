package graft

/** Conformance wave 16an: string-literal ESCAPE matrix and decimal
  * literal suffixes (ref ql/src/test/queries/clientpositive/quote2.q,
  * literal_decimal.q; expected cells from results/clientpositive/
  * llap). quote2's matrix pins the unescape rules both parsers must
  * share: quote and backslash pairs and backslash-t consume the
  * escape, while the LIKE-escape pair (backslash-percent,
  * backslash-underscore) KEEPS it — that retention is what makes the
  * udf_like patterns work.
  */
class QtestQuoteWave16anSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("quote2.q", "an01",
      "SELECT 'abc' AS c1, \"abc\" AS c2, 'abc\\'' AS c3, \"abc\\\"\" AS c4, 'abc\\\\' AS c5, \"abc\\\\\" AS c6, 'abc\\\\\\'' AS c7, \"abc\\\\\\\"\" AS c8, 'abc\\\\\\\\' AS c9, \"abc\\\\\\\\\" AS c10, 'abc\\\\\\\\\\'' AS c11, \"abc\\\\\\\\\\\"\" AS c12, 'abc\\\\\\\\\\\\' AS c13, \"abc\\\\\\\\\\\\\" AS c14, 'abc\"\"\"\"\\\\' AS c15, \"abc''''\\\\\" AS c16, 'mysql_%\\\\_\\%' AS c17, 'mysql\\\\\\_\\\\\\\\\\%' AS c18, \"awk '{print NR\\\"\\\\t\\\"$0}'\" AS c19, 'tab\\ttab' AS c20",
      duck = Some(""),
      hive = Some(Seq(
        "abc",
        "abc",
        "abc'",
        "abc\"",
        "abc\\",
        "abc\\",
        "abc\\'",
        "abc\\\"",
        "abc\\\\",
        "abc\\\\",
        "abc\\\\'",
        "abc\\\\\"",
        "abc\\\\\\",
        "abc\\\\\\",
        "abc\"\"\"\"\\",
        "abc''''\\",
        "mysql_%\\_\\%",
        "mysql\\\\_\\\\\\%",
        "awk '{print NR\"\\t\"$0}'",
        "tab\ttab")),
      note = "every escape pair from the corpus matrix"),
    QCase("literal_decimal.q", "an02",
      "SELECT -1BD AS c1, 0BD AS c2, 1BD AS c3, 3.14BD AS c4, " +
        "-3.14BD AS c5, 99999999999999999BD AS c6, " +
        "99999999999999999.9999999999999BD AS c7",
      duck = Some(""),
      hive = Some(Seq("-1", "0", "1", "3.14", "-3.14",
        "99999999999999999", "99999999999999999.9999999999999")),
      note = "the BD suffix makes exact DECIMAL literals at the " +
        "written precision (the 1E99BD overflow-to-NULL tail cell " +
        "stays a documented divergence: Spark rejects the " +
        "scientific BD spelling at parse)"))

  test("qtest conformance wave 16an: the string-escape matrix and " +
      "BD decimal literals") {
    run("quote2", "literal_decimal")
  }
}
