package graft

/** Conformance wave 16ag: mapjoin corpus RESULT shapes — hinted joins
  * must answer identically to unhinted ones, outer-join ON conditions
  * with tautologies and coerced arithmetic, and string-vs-numeric
  * BETWEEN inside a join condition (ref ql/src/test/queries/
  * clientpositive/mapjoin1.q, mapjoin47.q, mapjoin_test_outer.q).
  * The MAPJOIN hint spelling passes through both engines as a
  * comment/hint; results gate against DuckDB.
  */
class QtestMapjoinWave16agSpec extends QtestHarness {

  private val d1 = "(VALUES ('128', 'val_128'), ('146', 'val_146'), " +
    "('150', 'val_150'), ('333444', '555666')) AS d1(key, value)"

  protected val qcases: Seq[QCase] = Seq(
    QCase("mapjoin1.q", "ag01",
      "SELECT /*+ MAPJOIN(b) */ sum(a.key) as sum_a FROM qt_srcpart " +
        "a JOIN qt_src b ON a.key = b.key where a.ds is not null",
      duck = Some("SELECT sum(CAST(a.key AS double)) as sum_a FROM " +
        "qt_srcpart a JOIN qt_src b ON a.key = b.key where a.ds is " +
        "not null"),
      note = "the MAPJOIN hint changes the plan, never the sum; " +
        "string keys coerce to double for the aggregate"),
    QCase("mapjoin1.q", "ag02",
      "SELECT /*+ MAPJOIN(a) */ count(*) AS c1, count(a.key) AS c2 " +
        "FROM qt_src a RIGHT OUTER JOIN qt_src b on a.key=b.key AND " +
        "true",
      duck = Some("SELECT count(*) AS c1, count(a.key) AS c2 FROM " +
        "qt_src a RIGHT OUTER JOIN qt_src b on a.key=b.key AND true"),
      note = "a tautological conjunct in an outer ON changes nothing"),
    QCase("mapjoin1.q", "ag03",
      "SELECT /*+ MAPJOIN(a) */ count(*) AS c1, count(a.key) AS c2 " +
        "FROM qt_src a RIGHT OUTER JOIN qt_src b on a.key=b.key AND " +
        "b.key * 10 < '1000'",
      duck = Some("SELECT count(*) AS c1, count(a.key) AS c2 FROM " +
        "qt_src a RIGHT OUTER JOIN qt_src b on a.key=b.key AND " +
        "CAST(b.key AS int) * 10 < 1000"),
      note = "arithmetic-vs-string comparison inside the ON coerces " +
        "numerically (key*10 < '1000' is a double compare, not " +
        "lexicographic); unmatched b rows still survive the RIGHT " +
        "OUTER"),
    QCase("mapjoin47.q", "ag04",
      "SELECT count(*) AS c FROM qt_src1 s1 JOIN qt_src s ON " +
        "(s1.key=s.key AND s1.value between 100 and 102 AND s.value " +
        "between 100 and 102)",
      duck = Some("SELECT count(*) AS c FROM qt_src1 s1 JOIN qt_src " +
        "s ON (s1.key=s.key AND TRY_CAST(s1.value AS double) " +
        "between 100 and 102 AND TRY_CAST(s.value AS double) " +
        "between 100 and 102)",
      ),
      note = "'val_NNN' coerces to NULL double, so the BETWEEN " +
        "conjuncts eliminate every row — the count is 0, not an " +
        "error"),
    QCase("mapjoin_test_outer.q", "ag05",
      s"SELECT count(*) AS c1, count(src1.key) AS c2, " +
        s"count(src3.key) AS c3 FROM qt_src1 src1 RIGHT OUTER JOIN " +
        s"$d1 ON (src1.key = d1.key) JOIN (SELECT * FROM " +
        s"(VALUES ('128', 'x'), ('333444', 'y')) t(key, value)) " +
        s"src3 ON (d1.key = src3.key)",
      note = "a RIGHT OUTER feeding an inner join: the synthetic " +
        "unmatched key (333444) survives the outer but must match " +
        "src3 to reach the result"))

  test("qtest conformance wave 16ag: mapjoin-hinted outer joins, " +
      "coerced ON arithmetic, string BETWEEN join conditions") {
    run("mapjoin1", "mapjoin47", "mapjoin_test_outer")
  }
}
