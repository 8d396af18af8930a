package graft

/** Conformance wave 16ah: grouping-sets corpus remainder —
  * GROUPING__ID/grouping() over rollup and cube, reaggregation keyed
  * on GROUPING__ID, the ()-set-over-empty-input row, and explode of
  * NULL collections (ref ql/src/test/queries/clientpositive/
  * groupby_grouping_sets_grouping.q, groupby_grouping_id2.q,
  * groupby_rollup_empty.q, explode_null.q). The canonical
  * groupby_groupingid.txt fixture rows are inlined as VALUES; DuckDB
  * spells GROUPING__ID as grouping_id(...).
  */
class QtestGroupingWave16ahSpec extends QtestHarness {

  private val t1 = "(VALUES (1, CAST(NULL AS INT)), (1, 1), (2, 2), " +
    "(3, 3), (3, CAST(NULL AS INT)), (4, 5)) AS t1(key, value)"

  protected val qcases: Seq[QCase] = Seq(
    QCase("groupby_grouping_sets_grouping.q", "ah01",
      s"select key, value, `grouping__id` AS gid, grouping(key) AS " +
        s"gk, grouping(value) AS gv from $t1 group by rollup(key, " +
        s"value)",
      duck = Some("select key, value, grouping_id(key, value) AS " +
        "gid, grouping(key) AS gk, grouping(value) AS gv from " +
        "(VALUES (1, CAST(NULL AS INT)), (1, 1), (2, 2), (3, 3), " +
        "(3, CAST(NULL AS INT)), (4, 5)) t1(key, value) group by " +
        "rollup(key, value)"),
      note = "GROUPING__ID bit order: detail 0, key-subtotal 1, " +
        "grand total 3 — fixture NULLs distinguish real NULL groups " +
        "from subtotal NULLs via grouping()"),
    QCase("groupby_grouping_sets_grouping.q", "ah02",
      s"select key, value, `grouping__id` AS gid, grouping(key) AS " +
        s"gk, grouping(value) AS gv from $t1 group by cube(key, value)",
      duck = Some("select key, value, grouping_id(key, value) AS " +
        "gid, grouping(key) AS gk, grouping(value) AS gv from " +
        "(VALUES (1, CAST(NULL AS INT)), (1, 1), (2, 2), (3, 3), " +
        "(3, CAST(NULL AS INT)), (4, 5)) t1(key, value) group by " +
        "cube(key, value)")),
    QCase("groupby_grouping_id2.q", "ah03",
      s"SELECT gid, count(*) AS c FROM (SELECT key, value, " +
        s"`grouping__id` AS gid, count(*) from $t1 GROUP BY key, " +
        s"value WITH ROLLUP) t GROUP BY gid",
      duck = Some("SELECT gid, count(*) AS c FROM (SELECT key, " +
        "value, grouping_id(key, value) AS gid, count(*) from " +
        "(VALUES (1, CAST(NULL AS INT)), (1, 1), (2, 2), (3, 3), " +
        "(3, CAST(NULL AS INT)), (4, 5)) t1(key, value) GROUP BY " +
        "ROLLUP (key, value)) t GROUP BY gid"),
      note = "WITH ROLLUP spelling + reaggregation keyed on the " +
        "virtual column"),
    QCase("groupby_rollup_empty.q", "ah04",
      "select sum(c) AS s, grouping(b) AS g from (VALUES (1, 1, 1)) " +
        "AS tx1(a, b, c) where a < 0 group by a, b grouping sets " +
        "((), b, a)",
      duck = Some(""),
      hive = Some(Seq("NULL", "1")),
      note = "the () grouping set answers its global row even over " +
        "EMPTY input — sum NULL, grouping(b) = 1; the per-column " +
        "sets contribute nothing"),
    QCase("explode_null.q", "ah05",
      "SELECT explode(col) AS myCol FROM (select * from (SELECT " +
        "array(1,2,3) AS col) ea UNION ALL select * from (SELECT " +
        "NULLIF(array(1,2,3), array(1,2,3)) AS col) eb) a",
      duck = Some("SELECT * FROM (VALUES (1), (2), (3)) t(myCol)"),
      note = "exploding a NULL array contributes NO rows, not an " +
        "error and not a NULL row"),
    QCase("explode_null.q", "ah06",
      "SELECT explode(col) AS (myCol1, myCol2) FROM (select * from " +
        "(SELECT map(1,'one',2,'two',3,'three') AS col) ea UNION " +
        "ALL select * from (SELECT cast(null as map<int,string>) " +
        "AS col) eb) a",
      duck = Some("SELECT * FROM (VALUES (1, 'one'), (2, 'two'), " +
        "(3, 'three')) t(myCol1, myCol2)"),
      note = "same for a NULL map; the live map explodes to " +
        "key/value pairs. The .q spells the NULL via NULLIF(map, " +
        "map) — Hive's ObjectInspectorUtils.compare orders maps " +
        "where Spark's = does not; the NULL-map leg is spelled " +
        "directly (the explode semantics under test are unchanged)"))

  test("qtest conformance wave 16ah: GROUPING__ID over rollup/cube, " +
      "empty-input () sets, NULL-collection explode") {
    run("groupby_grouping_sets_grouping", "groupby_grouping_id2",
      "groupby_rollup_empty", "explode_null")
  }
}
