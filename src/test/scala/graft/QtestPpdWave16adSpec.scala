package graft

/** Conformance wave 16ad: predicate-pushdown corpus remainder over
  * RESULTS — lexicographic string filters split across subquery/ON/
  * WHERE around a join-aggregate, and a three-valued CASE predicate
  * over a partition self-join (ref ql/src/test/queries/
  * clientpositive/ppd_gby_join.q, ppd_join.q, ppd_udf_case.q). All
  * comparisons are string-vs-string, so DuckDB runs the identical
  * text.
  */
class QtestPpdWave16adSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("ppd_gby_join.q", "ad01",
      "SELECT src1.c1, count(1) AS cnt FROM (SELECT key AS c1, " +
        "value AS c2 from qt_src where key > '1' ) src1 JOIN " +
        "(SELECT key AS c3, value AS c4 from qt_src where key > " +
        "'2' ) src2 ON src1.c1 = src2.c3 AND src1.c1 < '400' WHERE " +
        "src1.c1 > '20' AND (src1.c2 < 'val_50' OR src1.c1 > '2') " +
        "AND (src2.c3 > '50' OR src1.c1 < '50') AND (src2.c3 <> " +
        "'4') GROUP BY src1.c1",
      note = "filters at every level — subquery, ON, WHERE " +
        "disjunctions spanning both sides — compose over " +
        "LEXICOGRAPHIC string comparison before the aggregate"),
    QCase("ppd_join.q", "ad02",
      "SELECT src1.c1, src2.c4 FROM (SELECT key AS c1, value AS c2 " +
        "from qt_src where key > '1' ) src1 JOIN (SELECT key AS c3, " +
        "value AS c4 from qt_src where key > '2' ) src2 ON src1.c1 " +
        "= src2.c3 AND src1.c1 < '400' WHERE src1.c1 > '20' AND " +
        "(src1.c2 < 'val_50' OR src1.c1 > '2') AND (src2.c3 > '50' " +
        "OR src1.c1 < '50') AND (src2.c3 <> '4')",
      note = "the same filter lattice without the aggregate: raw " +
        "join multiplicity preserved"),
    QCase("ppd_udf_case.q", "ad03",
      "SELECT * FROM qt_srcpart a JOIN qt_srcpart b ON a.key = " +
        "b.key WHERE a.ds = '2008-04-08' AND b.ds = '2008-04-08' " +
        "AND CASE a.key WHEN '27' THEN TRUE WHEN '38' THEN FALSE " +
        "ELSE NULL END ORDER BY a.key, a.value, a.ds, a.hr, b.key, " +
        "b.value, b.ds, b.hr",
      ordered = true,
      note = "a CASE returning TRUE/FALSE/NULL as the join filter: " +
        "only the TRUE branch (key 27) survives — FALSE and NULL " +
        "both drop"))

  test("qtest conformance wave 16ad: predicate placement around " +
      "joins and three-valued CASE filters match DuckDB") {
    run("ppd_gby_join", "ppd_join.q", "ppd_udf_case")
  }
}
