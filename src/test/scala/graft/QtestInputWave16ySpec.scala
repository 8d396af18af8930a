package graft

/** Conformance wave 16y: the inputNN corpus remainder — NULL-literal
  * arithmetic and predicates, blank-vs-NULL keys, alias case
  * insensitivity, empty-partition union legs, and cross-type IN
  * filters (ref ql/src/test/queries/clientpositive/input6.q, input7.q,
  * input8.q, input9.q, input22.q, input26.q, input41.q, input49.q).
  */
class QtestInputWave16ySpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("input6.q", "y31",
      "SELECT key, value FROM qt_src1 WHERE key is null",
      note = "src1's blank keys are EMPTY STRINGS, not NULL — the " +
        "filter keeps nothing"),
    QCase("input7.q", "y32",
      "SELECT cast(NULL as double) AS c1, cast(key as int) AS c2 " +
        "FROM qt_src1",
      duck = Some("SELECT CAST(NULL AS double) AS c1, TRY_CAST(key " +
        "AS int) AS c2 FROM qt_src1"),
      note = "a typed NULL column plus lenient string->int casts " +
        "(blank keys answer NULL; DuckDB needs TRY_CAST for the " +
        "same leniency)"),
    QCase("input8.q", "y33",
      "SELECT cast(4 + NULL as string) AS c1, cast(cast(key as int) " +
        "- NULL as int) AS c2, cast(NULL + NULL as double) AS c3 " +
        "FROM qt_src1",
      duck = Some("SELECT CAST(4 + NULL AS varchar) AS c1, " +
        "CAST(TRY_CAST(key AS int) - NULL AS int) AS c2, CAST(NULL " +
        "+ NULL AS double) AS c3 FROM qt_src1"),
      note = "arithmetic with a NULL literal is NULL in every " +
        "numeric type, then coerces to the destination type"),
    QCase("input9.q", "y34",
      "SELECT NULL AS value, key FROM qt_src1 WHERE NULL = NULL",
      note = "NULL = NULL is NULL, not TRUE — the filter keeps " +
        "nothing"),
    QCase("input22.q", "y35",
      "SELECT a.KEY2 FROM (SELECT qt_src.*, qt_src.key as KEY2 " +
        "FROM qt_src) a ORDER BY KEY2 LIMIT 10",
      ordered = true,
      note = "identifier case-insensitivity: KEY2 resolves the " +
        "lowercase alias; string sort order"),
    QCase("input26.q", "y36",
      "select * from (select * from (select * from qt_srcpart a " +
        "where a.ds = '2008-04-08' and a.hr = '11' order by a.key " +
        "limit 5) pa union all select * from (select * from " +
        "qt_srcpart b where b.ds = '2008-04-08' and b.hr = '14' " +
        "limit 5) pb) subq",
      note = "an ordered-limit leg unioned with a leg over a " +
        "NONEXISTENT partition (hr=14) — the empty side contributes " +
        "nothing"),
    QCase("input41.q", "y37",
      "select * from (select count(1) as cnt from qt_src union all " +
        "select count(1) as cnt from qt_srcpart where ds = " +
        "'2009-08-09') x order by x.cnt limit 2",
      ordered = true,
      note = "a count over an empty partition selection answers 0, " +
        "not an empty result"),
    QCase("input49.q", "y38",
      "select * from (select cast(0 as boolean) AS b, " +
        "cast(29098519.0 as double) AS d, cast(1410.0 as float) AS " +
        "f, 996 AS i, cast(40408519555 as bigint) AS l, " +
        "'test_string' AS s, cast(12 as tinyint) AS t) intable " +
        "where d in (29098519.0) and f in (1410.0) and i in (996) " +
        "and l in (40408519555) and s in ('test_string') and t in " +
        "(12)",
      note = "IN filters across float/double/bigint/tinyint literal " +
        "coercions all keep the row; cast(0 as boolean) is false"))

  test("qtest conformance wave 16y: inputNN remainder (NULL " +
      "arithmetic, blank keys, alias case, empty partitions, " +
      "cross-type IN)") {
    run("input6", "input7", "input8", "input9", "input22", "input26",
      "input41", "input49")
  }
}
