package graft

/** Conformance wave 16q: deterministic bucket sampling — ref
  * ql/src/test/queries/clientpositive/sample2.q..sample9.q over the
  * srcbucket fixture. Hive's `TABLESAMPLE (BUCKET n OUT OF m ON col)`
  * selects `(hash(col) & Integer.MAX_VALUE) % m == n-1`; for int keys
  * the Hive hash IS the value, so the DuckDB twins spell the filter
  * arithmetically — an independent check of the engine's
  * plans/BucketSample lowering.
  */
class QtestSampleSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("sample4.q", "sa1",
      "SELECT s.key AS k, s.value AS v FROM qt_srcbucket TABLESAMPLE " +
        "(BUCKET 1 OUT OF 2 ON key) s",
      duck = Some("SELECT key AS k, value AS v FROM qt_srcbucket " +
        "WHERE (key & 2147483647) % 2 = 0")),
    QCase("sample5.q", "sa2",
      "SELECT s.key AS k, count(*) AS c FROM qt_srcbucket TABLESAMPLE " +
        "(BUCKET 1 OUT OF 5 ON key) s GROUP BY s.key",
      duck = Some("SELECT key AS k, count(*) AS c FROM qt_srcbucket " +
        "WHERE (key & 2147483647) % 5 = 0 GROUP BY key"),
      note = "bucket 1 of 5: keys ≡ 0 (mod 5)"),
    QCase("sample7.q", "sa3",
      "SELECT s.key AS k, s.value AS v FROM qt_srcbucket TABLESAMPLE " +
        "(BUCKET 4 OUT OF 4 ON key) s WHERE s.key > 100",
      duck = Some("SELECT key AS k, value AS v FROM qt_srcbucket " +
        "WHERE (key & 2147483647) % 4 = 3 AND key > 100"),
      note = "sample filter composes with an ordinary WHERE"),
    QCase("sample9.q", "sa4",
      "SELECT count(*) AS c, sum(key) AS s FROM qt_srcbucket " +
        "TABLESAMPLE (BUCKET 2 OUT OF 3 ON key)",
      duck = Some("SELECT count(*) AS c, sum(key) AS s FROM " +
        "qt_srcbucket WHERE (key & 2147483647) % 3 = 1"),
      note = "alias-less form: the table's own name stands in"),
    QCase("sample6.q", "sa5",
      "SELECT s.key AS k FROM qt_srcbucket TABLESAMPLE (BUCKET 1 OUT " +
        "OF 3 ON key + 1) s ORDER BY k",
      duck = Some("SELECT key AS k FROM qt_srcbucket WHERE " +
        "((key + 1) & 2147483647) % 3 = 0 ORDER BY k"),
      note = "arbitrary sampling expression, not just a column",
      ordered = true))

  test("qtest conformance: deterministic bucket TABLESAMPLE (hash " +
      "filter parity vs arithmetic twins)") {
    run("sample")
  }

  test("BUCKET ... ON rand() maps to Spark's random single-bucket " +
      "fraction; rewrite text surgery") {
    import graft.plans.BucketSample.rewrite
    val r = rewrite("SELECT * FROM t TABLESAMPLE (BUCKET 3 OUT OF 7 " +
      "ON rand()) s").get
    assert(r === "SELECT * FROM t TABLESAMPLE (BUCKET 1 OUT OF 7) s")
    val d = rewrite("SELECT s.key FROM srcbucket TABLESAMPLE (BUCKET " +
      "2 OUT OF 4 ON key) s SORT BY key").get
    assert(d === "SELECT s.key FROM (SELECT * FROM srcbucket WHERE " +
      "pmod(hash(key) & 2147483647, 4) = 1) s SORT BY key")
    // Spark-legal sampling forms never reach the rewrite
    assert(rewrite("SELECT * FROM t TABLESAMPLE (BUCKET 1 OUT OF 2)")
      .isEmpty)
    assert(rewrite("SELECT * FROM t TABLESAMPLE (10 PERCENT)").isEmpty)
  }
}
