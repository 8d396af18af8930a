package graft

/** Conformance wave 16x: the unionNN corpus remainder — FROM-first
  * spellings, mixed-expression type unification under GROUP BY,
  * aggregate legs, positional column-name adoption, and literal columns
  * (ref ql/src/test/queries/clientpositive/union.q, union13.q,
  * union21.q, union24.q, union33.q, union35.q, union37.q). DuckDB runs
  * the standard-SQL twin over the same parquet.
  */
class QtestUnionWave16xSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("union.q", "x01",
      "FROM (FROM qt_src select qt_src.key, qt_src.value WHERE " +
        "qt_src.key < 100 UNION ALL FROM qt_src SELECT qt_src.* " +
        "WHERE qt_src.key > 100) unioninput SELECT unioninput.*",
      duck = Some("SELECT u.* FROM (SELECT key, value FROM qt_src " +
        "WHERE CAST(key AS int) < 100 UNION ALL SELECT * FROM qt_src " +
        "WHERE CAST(key AS int) > 100) u"),
      note = "Hive's FROM-first SELECT spelling inside both union legs"),
    QCase("union13.q", "x02",
      "select unionsrc.key, unionsrc.value FROM (select s1.key as " +
        "key, s1.value as value from qt_src s1 UNION ALL select " +
        "s2.key as key, s2.value as value from qt_src s2) unionsrc",
      note = "self-union doubles every row (ALL keeps duplicates)"),
    QCase("union21.q", "x03",
      "SELECT key, count(1) AS cnt FROM (SELECT '1' as key from " +
        "qt_src UNION ALL SELECT reverse(key) as key from qt_src " +
        "UNION ALL SELECT key as key from qt_src) union_output " +
        "GROUP BY key",
      note = "constant, computed, and raw keys unify to string before " +
        "the aggregate (src_thrift legs of the .q dropped: thrift " +
        "fixtures are not part of the harness corpus)"),
    QCase("union33.q", "x04",
      "SELECT key, value FROM (SELECT key, value FROM qt_src WHERE " +
        "key = 0 UNION ALL SELECT key, cast(COUNT(*) as string) AS " +
        "value FROM qt_src GROUP BY key) a",
      duck = Some("SELECT key, value FROM (SELECT key, value FROM " +
        "qt_src WHERE CAST(key AS int) = 0 UNION ALL SELECT key, " +
        "cast(COUNT(*) as varchar) AS value FROM qt_src GROUP BY " +
        "key) a"),
      note = "an aggregate leg under UNION ALL (HIVE-4837 shape)"),
    QCase("union33.q", "x05",
      "SELECT key, value FROM (SELECT key, cast(COUNT(*) as string) " +
        "AS value FROM qt_src GROUP BY key UNION ALL SELECT key, " +
        "value FROM qt_src WHERE key = 0) a",
      duck = Some("SELECT key, value FROM (SELECT key, cast(COUNT(*) " +
        "as varchar) AS value FROM qt_src GROUP BY key UNION ALL " +
        "SELECT key, value FROM qt_src WHERE CAST(key AS int) = 0) a"),
      note = "same with the aggregate leg FIRST"),
    QCase("union35.q", "x06",
      "select * from (select * from (select 1 as id, 'foo' as " +
        "str_1 from qt_src limit 5) f union all select * from " +
        "(select 2 as id, 'bar' as str_2 from qt_src limit 5) g) e",
      note = "UNION is positional: the result adopts the FIRST leg's " +
        "column names (str_1) even though the second leg names " +
        "differ (tablesample(5 rows) adapted to LIMIT 5 — same " +
        "5-constant-row semantics)"),
    QCase("union37.q", "x07",
      "select id, 'table_1' AS tag, trans_date from (VALUES " +
        "(CAST(1 AS BIGINT), 'table_1', '2016-08-11')) AS " +
        "l_test1(id, val, trans_date) union all select id, " +
        "'table_2' AS tag, trans_date from (VALUES (CAST(2 AS " +
        "BIGINT), 'table_2', '2016-08-11')) AS l_test2(id, val, " +
        "trans_date)",
      note = "literal columns inside union legs keep per-leg values"),
    QCase("union24.q", "x08",
      "select s.key, s.count from (select key, count(1) as count " +
        "from qt_src where key < 10 group by key union all select " +
        "key, count(1) as count from qt_src where key < 10 group by " +
        "key union all select key, count(1) as count from qt_src " +
        "where key < 10 group by key union all select key, count(1) " +
        "as count from qt_src where key < 10 group by key) s",
      duck = Some("select s.key, s.count from (select key, count(1) " +
        "as count from qt_src where CAST(key AS int) < 10 group by " +
        "key union all select key, count(1) as count from qt_src " +
        "where CAST(key AS int) < 10 group by key union all select " +
        "key, count(1) as count from qt_src where CAST(key AS int) < " +
        "10 group by key union all select key, count(1) as count " +
        "from qt_src where CAST(key AS int) < 10 group by key) s"),
      note = "four aggregate legs (the .q's CTAS copies collapse to " +
        "the same source aggregate)"))

  test("qtest conformance wave 16x: unionNN remainder (FROM-first " +
      "legs, type unification, aggregate legs, positional names)") {
    run("union.q", "union13", "union21", "union33", "union35",
      "union37", "union24")
  }
}
