package graft

/** Conformance wave 16w: the plain joinNN corpus remainder — ON-clause
  * filter placement in outer-join chains, condition-less (cartesian)
  * joins, and non-equi-only outer ON conditions over NULL-bearing keys
  * (ref ql/src/test/queries/clientpositive/join0.q, join15.q, join20.q,
  * join21.q, join23.q, join40.q, join46.q). Every case gates
  * cell-by-cell against DuckDB running the identical standard-SQL text
  * over the same parquet.
  */
class QtestJoinWave16wSpec extends QtestHarness {

  private val j46t1 = "(VALUES (CAST(NULL AS INT), CAST(NULL AS INT), " +
    "'None'), (98, NULL, 'None'), (99, 0, 'Alice'), (99, 2, 'Mat'), " +
    "(100, 1, 'Bob'), (101, 2, 'Car')) AS t1(key, value, col_1)"
  private val j46t2 = "(VALUES (102, 2, 'Del'), (103, 2, 'Ema'), " +
    "(104, 3, 'Fli'), (105, CAST(NULL AS INT), 'None')) AS " +
    "t2(key2, value2, col_2)"

  protected val qcases: Seq[QCase] = Seq(
    QCase("join0.q", "w01",
      "SELECT src1.key as k1, src1.value as v1, src2.key as k2, " +
        "src2.value as v2 FROM (SELECT * FROM qt_src WHERE key < 10) " +
        "src1 JOIN (SELECT * FROM qt_src WHERE key < 10) src2",
      duck = Some("SELECT src1.key as k1, src1.value as v1, " +
        "src2.key as k2, src2.value as v2 FROM (SELECT * FROM qt_src " +
        "WHERE CAST(key AS int) < 10) src1 CROSS JOIN (SELECT * FROM " +
        "qt_src WHERE CAST(key AS int) < 10) src2"),
      note = "condition-less JOIN is a cartesian product of the " +
        "filtered sides (DuckDB spells it CROSS JOIN and needs the " +
        "string-key casts Hive does implicitly)"),
    QCase("join15.q", "w02",
      "SELECT * FROM qt_src src1 JOIN qt_src src2 ON " +
        "(src1.key = src2.key)"),
    QCase("join20.q", "w03",
      "SELECT * FROM qt_src src1 JOIN qt_src src2 ON (src1.key = " +
        "src2.key AND src1.key < 10) RIGHT OUTER JOIN qt_src src3 ON " +
        "(src1.key = src3.key AND src3.key < 20)",
      duck = Some("SELECT * FROM qt_src src1 JOIN qt_src src2 ON " +
        "(src1.key = src2.key AND CAST(src1.key AS int) < 10) RIGHT " +
        "OUTER JOIN qt_src src3 ON (src1.key = src3.key AND " +
        "CAST(src3.key AS int) < 20)"),
      note = "inner-join filters live in the ON clause; the RIGHT " +
        "OUTER preserves every src3 row, NULL-extending the inner pair"),
    QCase("join20.q", "w04",
      "SELECT * FROM qt_src src1 JOIN qt_src src2 ON (src1.key = " +
        "src2.key AND src1.key < 10 AND src2.key < 15) RIGHT OUTER " +
        "JOIN qt_src src3 ON (src1.key = src3.key AND src3.key < 20)",
      duck = Some("SELECT * FROM qt_src src1 JOIN qt_src src2 ON " +
        "(src1.key = src2.key AND CAST(src1.key AS int) < 10 AND " +
        "CAST(src2.key AS int) < 15) RIGHT OUTER JOIN qt_src src3 ON " +
        "(src1.key = src3.key AND CAST(src3.key AS int) < 20)")),
    QCase("join21.q", "w05",
      "SELECT * FROM qt_src src1 LEFT OUTER JOIN qt_src src2 ON " +
        "(src1.key = src2.key AND src1.key < 11 AND src2.key > 9) " +
        "RIGHT OUTER JOIN qt_src src3 ON (src2.key = src3.key AND " +
        "src3.key < 10)",
      duck = Some("SELECT * FROM qt_src src1 LEFT OUTER JOIN qt_src " +
        "src2 ON (src1.key = src2.key AND CAST(src1.key AS int) < 11 " +
        "AND CAST(src2.key AS int) > 9) RIGHT OUTER JOIN qt_src src3 " +
        "ON (src2.key = src3.key AND CAST(src3.key AS int) < 10)"),
      note = "chained LEFT then RIGHT outer: the second join keys on " +
        "the possibly-NULL src2 side"),
    QCase("join23.q", "w06",
      "SELECT * FROM qt_src src1 JOIN qt_src src2 WHERE src1.key < " +
        "10 and src2.key < 10",
      duck = Some("SELECT * FROM qt_src src1 CROSS JOIN qt_src src2 " +
        "WHERE CAST(src1.key AS int) < 10 and CAST(src2.key AS int) " +
        "< 10"),
      note = "cartesian with WHERE-clause filters on both sides"),
    QCase("join40.q", "w07",
      "SELECT x.key, x.value, y.key AS k2, y.value AS v2 FROM qt_src " +
        "x left outer JOIN (select * from qt_src where key <= 100) y " +
        "ON (x.key = y.key)",
      duck = Some("SELECT x.key, x.value, y.key AS k2, y.value AS v2 " +
        "FROM qt_src x left outer JOIN (select * from qt_src where " +
        "CAST(key AS int) <= 100) y ON (x.key = y.key)")),
    QCase("join46.q", "w08",
      s"SELECT * FROM $j46t1 LEFT OUTER JOIN $j46t2 ON " +
        "(t1.value=t2.value2)",
      note = "NULL keys never match; their left rows NULL-extend"),
    QCase("join46.q", "w09",
      s"SELECT * FROM $j46t1 LEFT OUTER JOIN $j46t2 ON " +
        "(t1.value=t2.value2 AND t1.key between 100 and 102 AND " +
        "t2.key2 between 100 and 102)",
      note = "range conditions on BOTH sides inside the outer ON: " +
        "non-matching left rows still survive"),
    QCase("join46.q", "w10",
      s"SELECT * FROM $j46t1 LEFT OUTER JOIN $j46t2 ON " +
        "(t1.key between 100 and 102 AND t2.key2 between 100 and 102)",
      note = "no equi-key at all: an outer nested-loop join"),
    QCase("join46.q", "w11",
      s"SELECT * FROM $j46t1 RIGHT OUTER JOIN $j46t2 ON " +
        "(t1.value=t2.value2 AND true)",
      note = "tautological conjunct does not change the match set"))

  test("qtest conformance wave 16w: joinNN remainder (ON-clause " +
      "placement, cartesians, non-equi outer joins over NULL keys)") {
    run("join0", "join15", "join20", "join21", "join23", "join40",
      "join46")
  }
}
