package graft

/** Conformance wave: the reference's `ppd_*.q` predicate-pushdown family
  * — ref ql/src/test/queries/clientpositive/ppd_outer_join{1..4}.q,
  * ppd_gby.q, ppd_gby2.q, ppd_join_filter.q. These files exist to prove
  * pushdown never CHANGES results: post-join WHERE filters on an outer
  * join's null-extending side legally collapse it to inner (both
  * optimizers must agree on the rows, whatever they push), and filters
  * over aggregating subqueries must respect the aggregate boundary.
  * DuckDB twins spell the string→double casts its comparator demands.
  */
class QtestPpdSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("ppd_outer_join1.q", "ppd1",
      """SELECT a.key, a.value, b.key, b.value
        |FROM qt_src a LEFT OUTER JOIN qt_src b ON (a.key = b.key)
        |WHERE a.key > 10 AND a.key < 20 AND b.key > 15 AND b.key < 25""".stripMargin,
      duck = Some("""SELECT a.key, a.value, b.key, b.value
        |FROM qt_src a LEFT OUTER JOIN qt_src b ON (a.key = b.key)
        |WHERE CAST(a.key AS DOUBLE) > 10 AND CAST(a.key AS DOUBLE) < 20
        |  AND CAST(b.key AS DOUBLE) > 15 AND CAST(b.key AS DOUBLE) < 25""".stripMargin),
      note = "WHERE on the null side collapses LEFT OUTER to inner"),
    QCase("ppd_outer_join2.q", "ppd2",
      """SELECT a.key, a.value, b.key, b.value
        |FROM qt_src a RIGHT OUTER JOIN qt_src b ON (a.key = b.key)
        |WHERE a.key > '10' AND a.key < '20' AND b.key > '15' AND b.key < '25'""".stripMargin),
    QCase("ppd_outer_join3.q", "ppd3",
      """SELECT a.key, a.value, b.key, b.value
        |FROM qt_src a FULL OUTER JOIN qt_src b ON (a.key = b.key)
        |WHERE a.key > '10' AND a.key < '20' AND b.key > '15' AND b.key < '25'""".stripMargin),
    QCase("ppd_outer_join4.q", "ppd4",
      """SELECT a.key, a.value, b.key, b.value, c.key
        |FROM qt_src a
        |LEFT OUTER JOIN qt_src b ON (a.key = b.key)
        |RIGHT OUTER JOIN qt_src c ON (a.key = c.key)
        |WHERE a.key > '10' AND a.key < '20' AND b.key > '15' AND b.key < '25'
        |  AND sqrt(c.key) <> 13""".stripMargin,
      duck = Some("""SELECT a.key, a.value, b.key, b.value, c.key
        |FROM qt_src a
        |LEFT OUTER JOIN qt_src b ON (a.key = b.key)
        |RIGHT OUTER JOIN qt_src c ON (a.key = c.key)
        |WHERE a.key > '10' AND a.key < '20' AND b.key > '15' AND b.key < '25'
        |  AND sqrt(CAST(c.key AS DOUBLE)) <> 13""".stripMargin),
      note = "filters across a left-then-right outer chain + a non-" +
        "deterministic-looking scalar on the preserved side"),
    QCase("ppd_gby.q", "ppdg1",
      """SELECT src1.c1
        |FROM (SELECT src.value as c1, count(src.key) as c2 from qt_src src
        |      where src.value > 'val_10' group by src.value) src1
        |WHERE src1.c1 > 'val_200' and (src1.c2 > 30 or src1.c1 < 'val_400')""".stripMargin,
      note = "the c2 disjunct must NOT push below the aggregate"),
    QCase("ppd_gby2.q", "ppdg2",
      """SELECT max(src1.c1) AS m, src1.c2
        |FROM (SELECT src.value AS c1, count(src.key) AS c2 FROM qt_src src
        |      WHERE src.value > 'val_10' GROUP BY src.value) src1
        |WHERE src1.c1 > 'val_200' AND (src1.c2 > 30 OR src1.c1 < 'val_400')
        |GROUP BY src1.c2""".stripMargin),
    QCase("ppd_join_filter.q", "ppdj1",
      """select a.key, b.k2, b.k3
        |from qt_src a
        |join (
        |select key, min(key) as k, min(key)+1 as k1,
        |       min(key)+2 as k2, min(key)+3 as k3
        |from qt_src group by key
        |) b
        |on a.key=b.key and b.k1 < 5""".stripMargin,
      duck = Some("""select a.key, b.k2, b.k3
        |from qt_src a
        |join (
        |select key, min(CAST(key AS DOUBLE)) as k, min(CAST(key AS DOUBLE))+1 as k1,
        |       min(CAST(key AS DOUBLE))+2 as k2, min(CAST(key AS DOUBLE))+3 as k3
        |from qt_src group by key
        |) b
        |on a.key=b.key and b.k1 < 5""".stripMargin),
      note = "join condition referencing derived aggregate columns " +
        "(min of a string key coerces to double in Hive)"))

  test("qtest conformance: ppd family — pushdown never changes outer-" +
      "join or aggregate-boundary results") {
    run("ppd_")
  }
}
