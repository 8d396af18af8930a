package graft

/** Conformance wave 16o: the UNIQUEJOIN verb — ref
  * ql/src/test/queries/clientpositive/uniquejoin.q over the canonical
  * T1/T2/T3 fixtures (expected shapes cross-checked against
  * results/clientpositive/uniquejoin.q.out). The engine lowers the verb
  * to a key-set + null-safe left joins (plans/UniqueJoin); the DuckDB
  * twins express the same semantics INDEPENDENTLY as chained FULL OUTER
  * / INNER joins, so the lowering is validated against a different
  * formulation, not itself.
  */
class QtestUniqueJoinSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("uniquejoin.q", "uj1",
      "FROM UNIQUEJOIN PRESERVE qt_t1 a (a.key), PRESERVE qt_t2 b " +
        "(b.key), PRESERVE qt_t3 c (c.key) SELECT a.key AS ak, b.key " +
        "AS bk, c.key AS ck",
      duck = Some("SELECT a.key AS ak, b.key AS bk, c.key AS ck FROM " +
        "qt_t1 a FULL OUTER JOIN qt_t2 b ON a.key = b.key FULL OUTER " +
        "JOIN qt_t3 c ON coalesce(a.key, b.key) = c.key"),
      note = "all-PRESERVE = full multi-way co-group; key 8's 2x2 " +
        "rows cross-product (uniquejoin.q.out block 1)"),
    QCase("uniquejoin.q", "uj2",
      "FROM UNIQUEJOIN qt_t1 a (a.key), qt_t2 b (b.key), qt_t3 c " +
        "(c.key) SELECT a.key AS ak, b.key AS bk, c.key AS ck",
      duck = Some("SELECT a.key AS ak, b.key AS bk, c.key AS ck FROM " +
        "qt_t1 a JOIN qt_t2 b ON a.key = b.key JOIN qt_t3 c ON " +
        "a.key = c.key"),
      note = "no PRESERVE: the key must appear in EVERY table — only " +
        "key 2 survives"),
    QCase("uniquejoin.q", "uj3",
      "FROM UNIQUEJOIN qt_t1 a (a.key), qt_t2 b (b.key-1), qt_t3 c " +
        "(c.key) SELECT a.key AS ak, b.key AS bk, c.key AS ck",
      duck = Some("SELECT a.key AS ak, b.key AS bk, c.key AS ck FROM " +
        "qt_t1 a JOIN qt_t2 b ON try_cast(a.key AS double) = " +
        "try_cast(b.key AS double) - 1 JOIN qt_t3 c ON a.key = c.key"),
      note = "arithmetic key expressions: string keys coerce to " +
        "double for the b.key-1 leg (2,3,2 and 7,8,7 x2)"),
    QCase("uniquejoin.q", "uj4",
      "FROM UNIQUEJOIN PRESERVE qt_t1 a (a.key, a.val), PRESERVE " +
        "qt_t2 b (b.key, b.val), PRESERVE qt_t3 c (c.key, c.val) " +
        "SELECT a.key AS ak, a.val AS av, b.key AS bk, b.val AS bv, " +
        "c.key AS ck, c.val AS cv",
      duck = Some("SELECT a.key AS ak, a.val AS av, b.key AS bk, " +
        "b.val AS bv, c.key AS ck, c.val AS cv FROM qt_t1 a FULL " +
        "OUTER JOIN qt_t2 b ON a.key = b.key AND a.val = b.val FULL " +
        "OUTER JOIN qt_t3 c ON coalesce(a.key, b.key) = c.key AND " +
        "coalesce(a.val, b.val) = c.val"),
      note = "two-column key tuples: (8,18) matches twice in T2, " +
        "(8,28) matches nowhere"),
    QCase("uniquejoin.q", "uj5",
      "FROM UNIQUEJOIN PRESERVE qt_t1 a (a.key), qt_t2 b (b.key), " +
        "PRESERVE qt_t3 c (c.key) SELECT a.key AS ak, b.key AS bk, " +
        "c.key AS ck",
      duck = Some("SELECT * FROM (SELECT a.key AS ak, b.key AS bk, " +
        "c.key AS ck FROM qt_t1 a FULL OUTER JOIN qt_t2 b ON a.key = " +
        "b.key FULL OUTER JOIN qt_t3 c ON coalesce(a.key, b.key) = " +
        "c.key) t WHERE ak IS NOT NULL OR ck IS NOT NULL"),
      note = "mixed PRESERVE: keys present only in the unpreserved " +
        "table (5) drop; everything in a preserved table stays " +
        "(uniquejoin.q.out block 5)"),
    QCase("uniquejoin.q", "uj6",
      "FROM UNIQUEJOIN PRESERVE qt_t1 a (a.key), qt_t2 b (b.key) " +
        "SELECT a.key AS ak, b.key AS bk",
      duck = Some("SELECT a.key AS ak, b.key AS bk FROM qt_t1 a LEFT " +
        "JOIN qt_t2 b ON a.key = b.key"),
      note = "two tables, one PRESERVE: left-outer shape"))

  test("qtest conformance: UNIQUEJOIN verb (co-group lowering vs " +
      "independent outer-join formulations)") {
    run("uniquejoin")
  }

  test("UNIQUEJOIN rewrite: text surgery") {
    import graft.plans.UniqueJoin.rewrite
    val r = rewrite("FROM UNIQUEJOIN PRESERVE t1 a (a.k), t2 b (b.k) " +
      "SELECT a.k, b.k").get
    assert(r.startsWith("SELECT a.k, b.k FROM (SELECT DISTINCT __uk0"))
    assert(r.contains("LEFT JOIN t1 a ON __ujk.__uk0 <=> (a.k)"))
    assert(r.contains("LEFT JOIN t2 b ON __ujk.__uk0 <=> (b.k)"))
    // no-preserve: first table's keys EXISTS-probed against the rest
    assert(rewrite("FROM UNIQUEJOIN t1 a (a.k), t2 b (b.k) SELECT a.k")
      .get.contains("EXISTS (SELECT 1 FROM t2 b WHERE (b.k) <=> (a.k))"))
    // not a uniquejoin statement
    assert(rewrite("SELECT 1").isEmpty)
  }
}
