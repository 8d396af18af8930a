package graft

/** Conformance wave: the reference's `join_reorder*.q` family — ref
  * ql/src/test/queries/clientpositive/join_reorder.q, join_reorder2.q
  * (T1/T2/T3 fixtures; T4 loads T1's file). Hive's STREAMTABLE hint
  * drives ITS reorderer; results must be hint-invariant, so each shape
  * runs with and without the hint and both compare against the DuckDB
  * twin. Arithmetic join keys (`c.key+1 = a.key`) coerce string+int to
  * double in Hive and Spark — the twins spell the cast DuckDB needs.
  */
class QtestJoinReorderSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("join_reorder.q", "jr1",
      """SELECT a.key, a.val, c.key
        |FROM qt_t1 a JOIN qt_src c ON c.key+1=a.key""".stripMargin,
      duck = Some("""SELECT a.key, a.val, c.key
        |FROM qt_t1 a JOIN qt_src c
        |ON CAST(c.key AS DOUBLE)+1 = CAST(a.key AS DOUBLE)""".stripMargin),
      note = "arithmetic join key: string+int coerces to double"),
    QCase("join_reorder.q", "jr1h",
      """SELECT /*+ STREAMTABLE(a) */ a.key, a.val, c.key
        |FROM qt_t1 a JOIN qt_src c ON c.key+1=a.key""".stripMargin,
      duck = Some("""SELECT a.key, a.val, c.key
        |FROM qt_t1 a JOIN qt_src c
        |ON CAST(c.key AS DOUBLE)+1 = CAST(a.key AS DOUBLE)""".stripMargin),
      note = "STREAMTABLE is a reorder hint, never a semantics change"),
    QCase("join_reorder.q", "jr2",
      """SELECT a.key, b.key, a.val, c.val
        |FROM qt_t1 a
        |  LEFT OUTER JOIN qt_t2 b ON (b.key=a.key)
        |  RIGHT OUTER JOIN qt_t3 c ON (c.val = a.val)""".stripMargin,
      note = "left-then-right outer chain: the right outer null-extends " +
        "the whole left span"),
    QCase("join_reorder.q", "jr2h",
      """SELECT /*+ STREAMTABLE(a) */ a.key, b.key, a.val, c.val
        |FROM qt_t1 a
        |  LEFT OUTER JOIN qt_t2 b ON (b.key=a.key)
        |  RIGHT OUTER JOIN qt_t3 c ON (c.val = a.val)""".stripMargin,
      duck = Some("""SELECT a.key, b.key, a.val, c.val
        |FROM qt_t1 a
        |  LEFT OUTER JOIN qt_t2 b ON (b.key=a.key)
        |  RIGHT OUTER JOIN qt_t3 c ON (c.val = a.val)""".stripMargin)),
    QCase("join_reorder2.q", "jr3",
      """SELECT /*+ STREAMTABLE(a) */ *
        |FROM qt_t1 a JOIN qt_t2 b ON a.key = b.key
        |          JOIN qt_t3 c ON b.key = c.key
        |          JOIN qt_t1 d ON c.key = d.key""".stripMargin,
      duck = Some("""SELECT *
        |FROM qt_t1 a JOIN qt_t2 b ON a.key = b.key
        |          JOIN qt_t3 c ON b.key = c.key
        |          JOIN qt_t1 d ON c.key = d.key""".stripMargin),
      note = "4-way chain on one key (T4 loads T1's rows in the .q)"),
    QCase("join_reorder2.q", "jr4",
      """SELECT /*+ STREAMTABLE(a) */ *
        |FROM qt_t1 a JOIN qt_t2 b ON a.key = b.key
        |          JOIN qt_t3 c ON a.val = c.val
        |          JOIN qt_t1 d ON a.key + 1 = d.key + 1""".stripMargin,
      duck = Some("""SELECT *
        |FROM qt_t1 a JOIN qt_t2 b ON a.key = b.key
        |          JOIN qt_t3 c ON a.val = c.val
        |          JOIN qt_t1 d ON CAST(a.key AS DOUBLE) + 1 = CAST(d.key AS DOUBLE) + 1"""
        .stripMargin),
      note = "mixed-key 4-way: equality, val-equality, and arithmetic"))

  test("qtest conformance: join_reorder family (STREAMTABLE hints are " +
      "result-invariant; arithmetic and mixed join keys)") {
    run("join_reorder")
  }
}
