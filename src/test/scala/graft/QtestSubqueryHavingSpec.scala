package graft

/** Conformance wave 16m: subquery remainder — IN / NOT IN under HAVING
  * (subquery_in_having.q, subquery_notin_having.q), non-equality
  * correlation (subquery_corr.q), and multi-subquery conjunctions over
  * NULL-bearing data (subquery_multi.q). Ref
  * ql/src/test/queries/clientpositive/.
  */
class QtestSubqueryHavingSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("subquery_in_having.q", "hv1",
      "SELECT key, count(*) AS c FROM qt_src GROUP BY key HAVING " +
        "count(*) IN (SELECT count(*) FROM qt_src s1 WHERE s1.key = " +
        "'90' GROUP BY s1.key)",
      note = "aggregate IN aggregate-subquery under HAVING"),
    QCase("subquery_in_having.q", "hv2",
      "SELECT p_mfgr, avg(p_size) AS a FROM qt_part b GROUP BY " +
        "b.p_mfgr HAVING b.p_mfgr IN (SELECT p_mfgr FROM qt_part " +
        "GROUP BY p_mfgr HAVING max(p_size) - min(p_size) < 20)",
      note = "group key IN grouped-HAVING subquery"),
    QCase("subquery_notin_having.q", "hv3",
      "SELECT key, count(*) AS c FROM qt_src GROUP BY key HAVING key " +
        "NOT IN (SELECT key FROM qt_src s1 WHERE s1.key > '12')",
      note = "NOT IN under HAVING (null-aware anti join above the agg)"),
    QCase("subquery_notin_having.q", "hv4",
      "SELECT b.p_mfgr, min(p_retailprice) AS m FROM qt_part b GROUP " +
        "BY b.p_mfgr HAVING b.p_mfgr NOT IN (SELECT p_mfgr FROM " +
        "qt_part a GROUP BY p_mfgr HAVING max(p_retailprice) - " +
        "min(p_retailprice) > 600)",
      note = "NOT IN against a HAVING-filtered aggregate subquery"),
    QCase("subquery_corr.q", "co1",
      "SELECT key, value FROM qt_src b WHERE b.key IN (SELECT key " +
        "FROM qt_src a WHERE b.value > a.value)",
      note = "NON-EQUALITY correlation inside an IN subquery"),
    QCase("subquery_corr.q", "co2",
      "SELECT key, value FROM qt_src b WHERE b.key IN (SELECT key " +
        "FROM qt_src a WHERE b.value <= a.value)"),
    QCase("subquery_corr.q", "co3",
      "SELECT key, value FROM qt_src b WHERE b.key IN (SELECT key " +
        "FROM qt_src a WHERE b.value > a.value AND b.key < a.key)",
      note = "two correlated comparisons, both non-equi"),
    QCase("subquery_multi.q", "mu1",
      "SELECT p_partkey, p_name, p_brand FROM qt_pnull WHERE p_size " +
        "IN (SELECT p_size FROM qt_pnull) AND p_brand IN (SELECT " +
        "p_brand FROM qt_pnull)",
      note = "two positive IN conjuncts over the NULL-bearing part"),
    QCase("subquery_multi.q", "mu2",
      "SELECT p_partkey, p_name, p_brand FROM qt_pnull WHERE p_name " +
        "IN (SELECT p_name FROM qt_pnull) AND p_brand NOT IN (SELECT " +
        "p_name FROM qt_pnull)",
      note = "NOT IN against a column WITH a NULL row: the null " +
        "poisons every probe — zero rows"),
    QCase("subquery_multi.q", "mu3",
      "SELECT p_partkey, p_name, p_brand FROM qt_pnull WHERE p_brand " +
        "IN (SELECT p_brand FROM qt_pnull) AND p_brand NOT IN " +
        "(SELECT p_type FROM qt_pnull)",
      note = "IN + NOT IN mixed, disjoint domains"),
    QCase("subquery_multi.q", "mu4",
      "SELECT p_partkey, p_name FROM qt_pnull WHERE p_name NOT IN " +
        "(SELECT c FROM qt_tempty) AND p_brand IN (SELECT p_brand " +
        "FROM qt_pnull)",
      note = "NOT IN over an empty subquery is vacuously true"),
    QCase("subquery_multi.q", "mu5",
      "SELECT p_partkey, p_name FROM qt_pnull WHERE p_name IN " +
        "(SELECT p_name FROM qt_pnull) AND EXISTS (SELECT c FROM " +
        "qt_tnull)",
      note = "EXISTS over an all-NULL table is still TRUE (rows exist)"),
    QCase("subquery_multi.q", "mu6",
      "SELECT p_partkey, p_name FROM qt_pnull WHERE p_size IN " +
        "(SELECT p_size FROM qt_pnull) AND EXISTS (SELECT c FROM " +
        "qt_tempty)",
      note = "EXISTS over empty is FALSE — zero rows"),
    QCase("subquery_multi.q", "mu7",
      "SELECT p_partkey, p_name FROM qt_pnull WHERE p_name IN " +
        "(SELECT p_name FROM qt_pnull) AND NOT EXISTS (SELECT c FROM " +
        "qt_tempty)",
      note = "NOT EXISTS over empty keeps every matched row"))

  test("qtest conformance: subqueries under HAVING, non-equi " +
      "correlation, multi-subquery conjunctions") {
    run("subquery_in_having", "subquery_notin_having", "subquery_corr",
      "subquery_multi")
  }
}
