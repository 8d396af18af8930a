package graft

/** Conformance wave 16ab: the correlationoptimizer corpus shapes —
  * join-then-aggregate trees sharing keys, the reference's
  * CorrelationOptimizer playground (ref ql/src/test/queries/
  * clientpositive/correlationoptimizer1.q, correlationoptimizer3.q,
  * correlationoptimizer6.q; ql/optimizer/correlation/
  * CorrelationOptimizer.java). The reference pins these under
  * optimization on AND off; Catalyst's exchange reuse plays the same
  * role here, and the cases gate the RESULTS cell-by-cell against
  * DuckDB (plus one SUM(HASH()) transcript pin through the HiveHash
  * registration).
  */
class QtestCorrelationWave16abSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("correlationoptimizer1.q", "ab01",
      "SELECT x.key AS key, count(1) AS cnt FROM qt_src1 x JOIN " +
        "qt_src y ON (x.key = y.key) GROUP BY x.key",
      note = "join-then-aggregate on the join key — the canonical " +
        "correlation shape (one shared shuffle in the reference's " +
        "optimized plan)"),
    QCase("correlationoptimizer1.q", "ab02",
      "SELECT SUM(HASH(tmp.key)) AS h1, SUM(HASH(tmp.cnt)) AS h2 " +
        "FROM (SELECT x.key AS key, count(1) AS cnt FROM qt_src1 x " +
        "JOIN qt_src y ON (x.key = y.key) GROUP BY x.key) tmp",
      duck = Some(""),
      hive = Some(Seq("652447", "37")),
      note = "the transcript's own HiveHash checksum of the same " +
        "tree, matched exactly"),
    QCase("correlationoptimizer3.q", "ab03",
      "SELECT b.key AS key, b.cnt AS cnt, d.value AS value FROM " +
        "(SELECT x.key, count(1) AS cnt FROM qt_src1 x JOIN qt_src y " +
        "ON (x.key = y.key) group by x.key) b JOIN (SELECT x.key, " +
        "x.value FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)) d " +
        "ON b.key = d.key",
      note = "two join-aggregate branches over the same key joined " +
        "again — the diamond the reference's optimizer collapses to " +
        "one shuffle"),
    QCase("correlationoptimizer6.q", "ab04",
      "SELECT xx.key, xx.cnt, yy.key AS key2, yy.cnt AS cnt2 FROM " +
        "(SELECT x.key as key, count(1) as cnt FROM qt_src1 x JOIN " +
        "qt_src1 y ON (x.key = y.key) group by x.key) xx JOIN " +
        "(SELECT x.key as key, count(1) as cnt FROM qt_src x JOIN " +
        "qt_src y ON (x.key = y.key) group by x.key) yy ON " +
        "xx.key=yy.key",
      note = "self-join counts on both sides joined on the shared key"))

  test("qtest conformance wave 16ab: correlation-optimizer shapes " +
      "(join-then-aggregate diamonds) match DuckDB and the " +
      "transcript checksum") {
    run("correlationoptimizer1", "correlationoptimizer3",
      "correlationoptimizer6")
  }
}
