package graft

/** Conformance wave 17al: the cbo_rp_* return-path twins and the CBO
  * rule files (ref ql/src/test/queries/clientpositive/cbo_rp_*.q,
  * cbo_*Rule.q, cbo_join_transitive_pred_loop*.q). The rp_ files
  * re-run the cbo logic corpus under `hive.cbo.returnpath.hiveop` —
  * planner plumbing; each file's query shape gates results over the
  * same cbo_t1/t2/t3 fixtures. The rule files pin specific Calcite
  * rewrites (sort/limit transposition, aggregate function reduction,
  * transitive-predicate loops, groupby key removal, constant
  * folding) whose contract is result invariance.
  */
class QtestCboWave17alSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("cbo_rp_gby.q", "w17al01",
      """select key, (c_int+1)+2 as x, sum(c_int) AS s
        |from qt_cbot1 group by c_float, c_int, key""".stripMargin,
      note = "grouping on columns beyond the select list, return-path " +
        "twin of cbo_gby"),
    QCase("cbo_rp_gby2_map_multi_distinct.q", "w17al02",
      """select key, count(distinct c_int) AS c1,
        |  sum(distinct c_int) AS s1, count(c_float) AS c2
        |from qt_cbot1 group by key""".stripMargin,
      note = "multi-distinct under the return path"),
    QCase("cbo_rp_gby_empty.q", "w17al03",
      "select count(*) AS c from qt_cbot1 where c_int > 99999",
      note = "empty-selection aggregate answers 0"),
    QCase("cbo_rp_groupby3_noskew_multi_distinct.q", "w17al04",
      """select sum(c_int) AS c1, avg(c_int) AS c2,
        |  avg(distinct c_int) AS c3, max(c_int) AS c4,
        |  min(c_int) AS c5, sum(distinct c_int) AS c6,
        |  count(distinct c_int) AS c7
        |from qt_cbot1""".stripMargin,
      note = "the groupby3 battery over cbo_t1"),
    QCase("cbo_rp_join.q", "w17al05",
      """select cbo_t1.key AS k, cbo_t2.c_int AS i
        |from qt_cbot1 cbo_t1 join qt_cbot2 cbo_t2
        |  on cbo_t1.key = cbo_t2.key
        |where cbo_t1.c_int > 0""".stripMargin,
      note = "filtered equi-join under the return path"),
    QCase("cbo_rp_auto_join0.q", "w17al06",
      """select count(*) AS c from
        |  (select key from qt_cbot1 where c_int < 2) a
        |join
        |  (select key from qt_cbot1 where c_int < 2) b
        |on a.key = b.key""".stripMargin,
      note = "self-join of filtered scans (auto-join conversion twin)"),
    QCase("cbo_rp_auto_join1.q", "w17al07",
      """select sum(a.c_int) AS s from qt_cbot1 a
        |join qt_cbot2 b on a.key = b.key""".stripMargin,
      note = "aggregate over the converted join"),
    QCase("cbo_rp_auto_join17.q", "w17al08",
      """select count(*) AS c from qt_cbot1 a
        |join qt_cbot1 b on a.key = b.key and a.c_int = b.c_int"""
        .stripMargin,
      note = "composite-key self join"),
    QCase("cbo_rp_cross_product_check_2.q", "w17al09",
      """select count(*) AS c from
        |  (select key from qt_cbot1 limit 1) a,
        |  (select key from qt_cbot2 limit 1) b""".stripMargin,
      note = "deliberate 1x1 cross product passes the check"),
    QCase("cbo_rp_insert.q", "w17al10",
      "select key, c_int from qt_cbot1 where c_int = 1 " +
        "order by key limit 3",
      ordered = true,
      note = "the insert-shaped projection (sink dropped per the " +
        "distill convention)"),
    QCase("cbo_rp_limit.q", "w17al11",
      "select count(*) cs from qt_cbot1 where c_int > 1 LIMIT 100",
      note = "limit above a single-row aggregate is a no-op"),
    QCase("cbo_rp_semijoin.q", "w17al12",
      """select count(*) AS c from qt_cbot1 a
        |left semi join qt_cbot2 b on a.key = b.key""".stripMargin,
      duck = Some("""select count(*) AS c from qt_cbot1 a
        |where exists (select 1 from qt_cbot2 b
        |              where a.key = b.key)""".stripMargin),
      note = "LEFT SEMI under the return path (the twin spells " +
        "EXISTS — DuckDB has no SEMI keyword)"),
    QCase("cbo_rp_simple_select.q", "w17al13",
      "select key, value, c_int, c_float, c_boolean from qt_cbot1 " +
        "where c_boolean = true",
      note = "boolean-filtered base select"),
    QCase("cbo_rp_subq_in.q", "w17al14",
      """select count(*) AS c from qt_cbot1
        |where key in (select key from qt_cbot2 where c_int = 1)"""
        .stripMargin,
      note = "IN-subquery under the return path"),
    QCase("cbo_rp_subq_not_in.q", "w17al15",
      """select count(*) AS c from qt_cbot1
        |where key not in
        |  (select key from qt_cbot2 where key is not null
        |     and c_int > 90000)""".stripMargin,
      note = "NOT IN with a NULL-guarded empty subquery keeps " +
        "every row"),
    QCase("cbo_rp_udf_udaf.q", "w17al16",
      """select count(distinct c_int) AS a, sum(c_int) AS b,
        |  max(c_int) AS c, min(c_int) AS d, avg(c_int) AS e
        |from qt_cbot1""".stripMargin,
      note = "the udf_udaf battery"),
    QCase("cbo_rp_union.q", "w17al17",
      """select count(*) AS c from
        |  (select key from qt_cbot1 union all
        |   select key from qt_cbot2) u""".stripMargin,
      note = "union-all under the return path"),
    QCase("cbo_rp_views.q", "w17al18",
      """with v as (select key, c_int from qt_cbot1 where c_int = 1)
        |select v1.key AS k from v v1 join v v2 on v1.key = v2.key"""
        .stripMargin,
      note = "view self-join (CTE-shaped)"),
    QCase("cbo_rp_windowing.q", "w17al19",
      """select key, rank() over (partition by key order by c_int)
        |  AS r from qt_cbot1 where c_int = 1""".stripMargin,
      note = "rank under the return path"),
    QCase("cbo_rp_windowing_2.q", "w17al20",
      """select key, sum(c_int) over (partition by key) AS s
        |from qt_cbot1""".stripMargin,
      note = "orderless windowed sum"),

    QCase("cbo_AggregateSortLimitRule.q", "w17al21",
      "select key, count(*) AS c from qt_cbot1 group by key " +
        "order by key nulls last limit 5",
      ordered = true,
      note = "sort+limit transposed below the aggregate keeps the " +
        "same top rows"),
    QCase("cbo_SortUnionTransposeRule.q", "w17al22",
      """select key from (
        |  select key from qt_cbot1 union all
        |  select key from qt_cbot2) u
        |order by key nulls last limit 5""".stripMargin,
      ordered = true,
      note = "sort/limit pushed through the union's legs"),
    QCase("cbo_aggregate_reduce_functions_rule.q", "w17al23",
      """select sum(c_int) AS s, count(c_int) AS c, avg(c_int) AS a,
        |  stddev_pop(c_int) AS sp, stddev_samp(c_int) AS ss,
        |  var_pop(c_int) AS vp, var_samp(c_int) AS vs
        |from qt_cbot1""".stripMargin,
      note = "avg/stddev/var REDUCE to sum+count forms — results " +
        "must not drift"),
    QCase("cbo_constantfolding.q", "w17al24",
      """select key, 1 + 1 AS two, upper('ab') AS ab,
        |  coalesce(null, key) AS k2
        |from qt_cbot1 where 1 = 1 and c_int = 1""".stripMargin,
      note = "constant folding across the select and filter"),
    QCase("cbo_groupby_remove_key.q", "w17al25",
      """select key, c_int, count(*) AS c from qt_cbot1
        |where key = '1' group by key, c_int""".stripMargin,
      note = "the constant-bound group key can be removed from the " +
        "aggregation — results identical"),
    QCase("cbo_join_transitive_pred_loop.q", "w17al26",
      """select count(*) AS c from qt_cbot1 a join qt_cbot2 b
        |on a.key = b.key where a.key = '1'""".stripMargin,
      note = "the equality transits to b.key = '1' without looping " +
        "the rule"),
    QCase("cbo_join_transitive_pred_loop_1.q", "w17al27",
      """select count(*) AS c from qt_cbot1 a join qt_cbot2 b
        |on a.key = b.key and a.c_int = b.c_int
        |where a.key = '1' and b.c_int = 1""".stripMargin,
      note = "two transitive predicates, one from each side"),
    QCase("cbo_join_transitive_pred_loop_2.q", "w17al28",
      """select count(*) AS c from qt_cbot1 a join qt_cbot2 b
        |on a.key = b.key join qt_cbot3 c on b.key = c.key
        |where a.key = '1'""".stripMargin,
      note = "the predicate transits across THREE relations"),
    QCase("cbo_no_stats.q", "w17al29",
      """select key, count(*) AS c from qt_cbot1 group by key
        |order by key nulls last limit 3""".stripMargin,
      ordered = true,
      note = "planning without column stats answers identically"),
    QCase("cbo_ppd_non_deterministic.q", "w17al30",
      """select count(*) AS c from
        |  (select key, c_int from qt_cbot1 where c_int = 1) t
        |where key is not null""".stripMargin,
      note = "deterministic predicates push; the file guards that " +
        "rand()-bearing ones do not (plan-level; results gate)")
  )

  test("qtest conformance wave 17al: cbo return-path twins and CBO " +
      "rule files over the cbo_t fixtures") {
    run("cbo_")
  }
}
