package graft

/** Conformance wave 17r: grouping-sets remainder, the groupby_sort_*
  * bucketed-table family, and the multi-insert stragglers (ref
  * ql/src/test/queries/clientpositive/groupby_grouping_sets{2..6,
  * _limit,_pushdown1,_window}.q, groupby_sort_{2..11,2_23,test_1,
  * skew_1_23}.q, groupby_{multi_insert_common_distinct,
  * mutli_insert_common_distinct,multi_single_reducer2,3,
  * join_pushdown,map_ppr*,ppr_multi_distinct,rollup2,rollup_empty2,
  * groupingset_bug,grouping_sets_view}.q).
  *
  * The groupby_sort family's CLUSTERED/SORTED DDL drives Hive's
  * map-side-GBY-on-sorted-buckets rewrite — a physical-plan knob with
  * no semantic surface (Spark's hash aggregate needs no sort); each
  * file's gate is that the aggregate answers the same over the
  * bucketed layout, checked here over the same data. grouping-sets
  * files gate cube/rollup/GROUPING SETS algebra: subquery-wrapped
  * cubes, joins of cubes, duplicate sets, filters above sets, windows
  * above HAVING above sets.
  */
class QtestGroupbyWave17rSpec extends QtestHarness {

  // the grouping-sets fixture (grouping_sets.txt: a b c rows)
  private val GS = "qt_gsets"

  // groupby_sort family: every file aggregates T1-shaped (key,val)
  // data loaded into a CLUSTERED/SORTED table; qt_t1 carries the data
  private def sortCase(f: String, n: String, sql: String,
      note: String, dq: Option[String] = None) =
    QCase(f, n, sql, duck = dq, note = note)

  protected val qcases: Seq[QCase] = Seq(

    // ------------------------------------------------ grouping sets
    QCase("groupby_grouping_sets2.q", "w17r01",
      s"SELECT a, b, count(*) AS c from $GS group by a, b with cube",
      duck = Some(s"SELECT a, b, count(*) AS c from $GS " +
        "group by cube(a, b)"),
      note = "cube under map-side-aggregation conf (same algebra)"),
    QCase("groupby_grouping_sets2.q", "w17r02",
      s"SELECT a, b, sum(c) AS s from $GS group by a, b with cube",
      duck = Some(s"SELECT a, b, sum(CAST(c AS DOUBLE)) AS s from " +
        s"$GS group by cube(a, b)"),
      note = "sum over the string c column coerces to double"),
    QCase("groupby_grouping_sets2.q", "w17r03",
      """SELECT a, b, sum(c + d) AS s from
        |  (select a, b, cast(c as int) as c, cast(c as int) as d
        |     from qt_gsets) T2_n50
        |group by a, b with cube""".stripMargin,
      duck = Some("""SELECT a, b, sum(c + d) AS s from
        |  (select a, b, cast(c as int) as c, cast(c as int) as d
        |     from qt_gsets) T2_n50
        |group by cube(a, b)""".stripMargin),
      note = "arithmetic inside the aggregate over the derived table"),
    QCase("groupby_grouping_sets3.q", "w17r04",
      s"SELECT a, b, avg(CAST(c AS DOUBLE)) AS av, count(*) AS c " +
        s"from $GS group by a, b with cube",
      duck = Some("SELECT a, b, avg(CAST(c AS DOUBLE)) AS av, " +
        s"count(*) AS c from $GS group by cube(a, b)"),
      note = "avg + count per cube cell (the file flips " +
        "map-aggregation hash thresholds across reruns)"),
    QCase("groupby_grouping_sets4.q", "w17r05",
      s"""SELECT * FROM
         |(SELECT a, b, count(*) AS c from $GS where a < 3
         |   group by a, b with cube) subq1
         |join
         |(SELECT a, b, count(*) AS c from $GS where a < 3
         |   group by a, b with cube) subq2
         |on subq1.a = subq2.a""".stripMargin,
      duck = Some(s"""SELECT * FROM
         |(SELECT a, b, count(*) AS c from $GS
         |   where CAST(a AS INT) < 3 group by cube(a, b)) subq1
         |join
         |(SELECT a, b, count(*) AS c from $GS
         |   where CAST(a AS INT) < 3 group by cube(a, b)) subq2
         |on subq1.a = subq2.a""".stripMargin),
      note = "self-join of two cube subqueries on the (nullable) " +
        "grouping column — NULL subtotal keys never match"),
    QCase("groupby_grouping_sets5.q", "w17r06",
      s"""SELECT a, b, count(*) AS c FROM
         |(SELECT a, b, count(1) AS c from $GS group by a, b) subq1
         |group by a, b with cube""".stripMargin,
      duck = Some(s"""SELECT a, b, count(*) AS c FROM
         |(SELECT a, b, count(1) AS c from $GS group by a, b) subq1
         |group by cube(a, b)""".stripMargin),
      note = "cube over an already-grouped subquery"),
    QCase("groupby_grouping_sets6.q", "w17r07",
      s"""SELECT a, b FROM
         |(SELECT a, b from $GS group by a, b
         |   grouping sets ( (a,b), a )) res
         |WHERE res.a = 5""".stripMargin,
      duck = Some(s"""SELECT a, b FROM
         |(SELECT a, b from $GS group by
         |   grouping sets ( (a,b), (a) )) res
         |WHERE CAST(res.a AS INT) = 5""".stripMargin),
      note = "filter above grouping sets keeps both the detail and " +
        "the a-subtotal rows for a=5"),
    QCase("groupby_grouping_sets_limit.q", "w17r08",
      s"SELECT a, b, count(*) AS c FROM $GS GROUP BY a, b WITH CUBE " +
        "ORDER BY a, b, `GROUPING__ID` LIMIT 10",
      duck = Some(s"SELECT a, b, count(*) AS c FROM $GS GROUP BY " +
        "cube(a, b) ORDER BY a, b, grouping_id(a, b) LIMIT 10"),
      ordered = true,
      note = "ORDER BY the virtual GROUPING__ID under a LIMIT"),
    QCase("groupby_grouping_sets_limit.q", "w17r09",
      s"SELECT a, b, count(*) AS c FROM $GS GROUP BY a, b " +
        "GROUPING SETS (a, (a, b), b, ()) " +
        "ORDER BY a, b, `GROUPING__ID` LIMIT 10",
      duck = Some(s"SELECT a, b, count(*) AS c FROM $GS GROUP BY " +
        "GROUPING SETS ((a), (a, b), (b), ()) " +
        "ORDER BY a, b, grouping_id(a, b) LIMIT 10"),
      ordered = true,
      note = "explicit 4-set spelling with bare-column sets"),
    QCase("groupby_grouping_sets_limit.q", "w17r10",
      s"SELECT a FROM $GS GROUP BY a GROUPING SETS ((a), (a)) " +
        "ORDER BY a LIMIT 10",
      duck = Some(s"SELECT a FROM $GS GROUP BY a ORDER BY a LIMIT 10"),
      ordered = true,
      note = "duplicate grouping sets dedupe (Hive keeps ONE copy " +
        "per distinct set)"),
    QCase("groupby_grouping_sets_pushdown1.q", "w17r11",
      """SELECT * FROM (
        |SELECT a, b, sum(s) AS s
        |FROM (VALUES ('aaa', 'bbb', 123456)) T1(a, b, s)
        |GROUP BY a, b GROUPING SETS ((), (a), (b), (a, b))
        |) t WHERE a IS NOT NULL""".stripMargin,
      duck = Some("""SELECT * FROM (
        |SELECT a, b, sum(s) AS s
        |FROM (VALUES ('aaa', 'bbb', 123456)) T1(a, b, s)
        |GROUP BY GROUPING SETS ((), (a), (b), (a, b))
        |) t WHERE a IS NOT NULL""".stripMargin),
      note = "IS NOT NULL above the sets prunes the () and (b) " +
        "subtotal rows"),
    QCase("groupby_grouping_window.q", "w17r12",
      """select category, max(live) live, max(comments) comments,
        |  rank() OVER (PARTITION BY category
        |               ORDER BY max(comments)) rank1
        |FROM (VALUES (1, 0, 2), (2, 0, 2), (3, 0, 2))
        |  t_n33(category, live, comments)
        |GROUP BY category
        |GROUPING SETS ((), (category))
        |HAVING max(comments) > 0""".stripMargin,
      duck = Some("""select category, max(live) AS live,
        |  max(comments) AS comments,
        |  rank() OVER (PARTITION BY category
        |               ORDER BY max(comments)) AS rank1
        |FROM (VALUES (1, 0, 2), (2, 0, 2), (3, 0, 2))
        |  t_n33(category, live, comments)
        |GROUP BY GROUPING SETS ((), (category))
        |HAVING max(comments) > 0""".stripMargin),
      note = "window above HAVING above grouping sets (HIVE-9877 " +
        "ordering); the file's OVER(ORDER BY comments) resolves the " +
        "SELECT alias in Hive — spelled explicitly as max(comments) " +
        "here, which all three engines agree on"),
    QCase("groupby_rollup2.q", "w17r13",
      """select grouping(a) AS g, a, count(a) AS c
        |from (VALUES (1), (2), (CAST(NULL AS INT))) t(a)
        |group by a with rollup""".stripMargin,
      duck = Some("""select grouping(a) AS g, a, count(a) AS c
        |from (VALUES (1), (2), (CAST(NULL AS INT))) t(a)
        |group by rollup(a)""".stripMargin),
      note = "grouping() distinguishes the NULL data row from the " +
        "rollup total"),
    QCase("groupby_rollup2.q", "w17r14",
      """select grouping(a) AS g, count(distinct a) AS c
        |from (VALUES (1), (2), (CAST(NULL AS INT))) t(a)
        |group by a with rollup""".stripMargin,
      duck = Some("""select grouping(a) AS g, count(distinct a) AS c
        |from (VALUES (1), (2), (CAST(NULL AS INT))) t(a)
        |group by rollup(a)""".stripMargin),
      note = "count(DISTINCT) per rollup cell"),
    QCase("groupby_rollup2.q", "w17r15",
      """SELECT grouping(key) gk, grouping(value) gv, key, value,
        |  count(key) AS c FROM qt_src where key < '10'
        |GROUP BY key, value with rollup order by gk, gv, key"""
        .stripMargin,
      duck = Some("""SELECT grouping(key) gk, grouping(value) gv,
        |  key, value, count(key) AS c FROM qt_src where key < '10'
        |GROUP BY rollup(key, value) order by gk, gv, key"""
        .stripMargin),
      note = "string-filtered rollup ordered by the grouping flags"),
    QCase("groupby_rollup_empty2.q", "w17r16",
      """select grouping(s_state) AS g from
        |  (VALUES (1, 10, 'XX'), (2, 20, 'AA'), (3, 30, 'ZZ'))
        |    store_s0(s_item_sk, s_store_sk, s_state),
        |  (VALUES (1, 9), (2, 9), (3, 39))
        |    store_sales_s0(ss_item_sk, ss_store_sk)
        |where ss_store_sk = s_store_sk
        |  and s_state in ('SD','FL','MI','LA','MO','SC')
        |group by rollup(ss_item_sk, s_state)""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("1")),
      note = "ROLLUP's IMPLICIT total row survives an empty filtered " +
        "join — one row, grouping()=1 (.q.out-pinned; the r17 " +
        "EmptyGroupingSets extension; Spark answers zero rows)"),
    QCase("groupby_groupingset_bug.q", "w17r17",
      """select ss_item_sk, count(*) AS cnt from
        |  (VALUES (1, 1), (2, 1), (1, 2), (3, 2))
        |    x1_store_sales(ss_item_sk, ss_sold_date_sk)
        |group by ss_item_sk grouping sets ((ss_item_sk))
        |having count(*) > 1""".stripMargin,
      duck = Some("""select ss_item_sk, count(*) AS cnt from
        |  (VALUES (1, 1), (2, 1), (1, 2), (3, 2))
        |    x1_store_sales(ss_item_sk, ss_sold_date_sk)
        |group by grouping sets ((ss_item_sk))
        |having count(*) > 1""".stripMargin),
      note = "single-set GROUPING SETS + HAVING (the bug file's " +
        "minimal shape; its full repro joins partitioned dims)"),
    QCase("groupby_grouping_sets_view.q", "w17r18",
      """select
        |  case when `grouping__id` = 3 then c1 end as col_1,
        |  case when `grouping__id` = 3 then 3 end as col_2,
        |  count(*) as cnt
        |from (VALUES ('1','1'), ('2','1'), ('3','1'), ('1','4'),
        |  ('1','5')) case665558(c1, c2)
        |group by cube(c1, c2)""".stripMargin,
      duck = Some("""select
        |  case when grouping_id(c1, c2) = 3 then c1 end as col_1,
        |  case when grouping_id(c1, c2) = 3 then 3 end as col_2,
        |  count(*) as cnt
        |from (VALUES ('1','1'), ('2','1'), ('3','1'), ('1','4'),
        |  ('1','5')) case665558(c1, c2)
        |group by cube(c1, c2)""".stripMargin),
      note = "CASE over GROUPING__ID inside a view-shaped select " +
        "(gid=3 is the grand total under the 2-col cube)"),

    // ------------------------------------------------ sort family
    sortCase("groupby_sort_1_23.q", "w17r19",
      "SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key",
      "map-side GBY on the sorted bucket layout (results identical " +
        "to the unsorted plan)"),
    sortCase("groupby_sort_2.q", "w17r20",
      "SELECT val, count(1) AS cnt FROM qt_t1 GROUP BY val",
      "grouping on the SORTED-BY column that is not the CLUSTER key"),
    sortCase("groupby_sort_3.q", "w17r21",
      "SELECT key, val, count(1) AS cnt FROM qt_t1 GROUP BY key, val",
      "composite key matching the sort prefix"),
    sortCase("groupby_sort_3.q", "w17r22",
      "SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key",
      "prefix-only grouping"),
    sortCase("groupby_sort_4.q", "w17r23",
      "SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key",
      "clustered on (key,val) sorted by key only"),
    sortCase("groupby_sort_4.q", "w17r24",
      "SELECT key, val, count(1) AS cnt FROM qt_t1 GROUP BY key, val",
      "full composite grouping over the partial sort"),
    sortCase("groupby_sort_5.q", "w17r25",
      "SELECT key, val, count(1) AS cnt FROM qt_t1 GROUP BY key, val",
      "three cluster/sort layout permutations in the file — same " +
        "aggregate each time"),
    sortCase("groupby_sort_6.q", "w17r26",
      "SELECT key, count(1) AS cnt FROM qt_t1 WHERE 1 = 0 GROUP BY key",
      "aggregate over a missing partition answers zero rows"),
    sortCase("groupby_sort_7.q", "w17r27",
      "SELECT key, val, count(1) AS cnt FROM qt_t1 GROUP BY key, val",
      "partitioned + bucketed variant"),
    sortCase("groupby_sort_8.q", "w17r28",
      "select count(distinct key) AS c from qt_t1",
      "count(DISTINCT sort-key) without grouping"),
    sortCase("groupby_sort_9.q", "w17r29",
      """select key, count(1) AS cnt from
        |(select key from qt_t1 union all select key from qt_t1) t
        |group by key""".stripMargin,
      "two identical partitions double every count"),
    sortCase("groupby_sort_10.q", "w17r30",
      "select distinct key from (select key from qt_src " +
        "where key = '0' or key = '11') t",
      "DISTINCT over the sorted key column"),
    sortCase("groupby_sort_11.q", "w17r31",
      """select count(distinct key) AS c1, count(1) AS c2,
        |  count(key) AS c3, sum(distinct CAST(key AS DOUBLE)) AS c4
        |from (select key from qt_src where CAST(key AS INT) < 10) t"""
        .stripMargin,
      "mixed distinct + plain aggregates in one global group"),
    sortCase("groupby_sort_11.q", "w17r32",
      """select key, count(distinct key) AS c1, count(1) AS c2,
        |  count(key) AS c3, sum(distinct CAST(key AS DOUBLE)) AS c4
        |from (select key from qt_src where CAST(key AS INT) < 10) t
        |group by key""".stripMargin,
      "the same battery grouped by the key itself (distinct-of-key " +
        "per key group is 1)"),
    sortCase("groupby_sort_11.q", "w17r33",
      "select count(distinct CAST(key AS DOUBLE) + " +
        "CAST(key AS DOUBLE)) AS c from (select key from qt_src " +
        "where CAST(key AS INT) < 10) t",
      "distinct over an expression of the sort key"),
    sortCase("groupby_sort_11.q", "w17r34",
      "select count(distinct 1) AS c from (select key from qt_src " +
        "where CAST(key AS INT) < 10) t",
      "count(DISTINCT constant) = 1 over non-empty input"),
    sortCase("groupby_sort_2_23.q", "w17r35",
      """select age, name, count(*) AS c from
        |  (VALUES (1, 'user1', 'dept1'), (2, 'user2', 'dept2'),
        |          (1, 'user1', 'dept1'), (2, 'user2', 'dept2'))
        |  test_bucket(age, name, dept)
        |group by age, name having count(*) > 1""".stripMargin,
      "HAVING over the doubled bucketed inserts"),
    sortCase("groupby_sort_skew_1_23.q", "w17r36",
      "SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key",
      "the skew-conf twin of groupby_sort_1_23"),
    sortCase("groupby_sort_test_1.q", "w17r37",
      "SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key",
      "test-mode variant of the sorted-bucket aggregate"),

    // ------------------------------- multi-insert / ppr stragglers
    QCase("groupby_multi_insert_common_distinct.q", "w17r38",
      "select key, count(distinct value) AS cnt from qt_src " +
        "group by key",
      note = "leg 1 of the common-distinct fan-out"),
    QCase("groupby_multi_insert_common_distinct.q", "w17r39",
      "select CAST(key AS DOUBLE) + CAST(key AS DOUBLE) AS key2, " +
        "count(distinct value) AS cnt from qt_src " +
        "group by CAST(key AS DOUBLE) + CAST(key AS DOUBLE)",
      note = "leg 2 groups on key+key — shares the distinct scan in " +
        "Hive's plan"),
    QCase("groupby_mutli_insert_common_distinct.q", "w17r40",
      "select key, count(distinct value) AS cnt from qt_src " +
        "group by key",
      note = "the typo-named twin file runs the same fan-out"),
    QCase("groupby_multi_single_reducer2.q", "w17r41",
      """SELECT substr(src.key,1,1) AS k,
        |  count(DISTINCT src.key) AS c1
        |FROM qt_src src WHERE substr(src.key,1,1) >= 5
        |GROUP BY substr(src.key,1,1)""".stripMargin,
      duck = Some("""SELECT substr(src.key,1,1) AS k,
        |  count(DISTINCT src.key) AS c1
        |FROM qt_src src WHERE CAST(substr(src.key,1,1) AS INT) >= 5
        |GROUP BY substr(src.key,1,1)""".stripMargin),
      note = "filtered single-reducer leg (string >= int coerces " +
        "numerically in Hive)"),
    QCase("groupby_multi_single_reducer2.q", "w17r42",
      """SELECT substr(src.key,1,1) AS k,
        |  count(DISTINCT src.key) AS c1, count(src.value) AS c2
        |FROM qt_src src WHERE substr(src.key,1,1) < 5
        |GROUP BY substr(src.key,1,1)""".stripMargin,
      duck = Some("""SELECT substr(src.key,1,1) AS k,
        |  count(DISTINCT src.key) AS c1, count(src.value) AS c2
        |FROM qt_src src WHERE CAST(substr(src.key,1,1) AS INT) < 5
        |GROUP BY substr(src.key,1,1)""".stripMargin),
      note = "complement filter leg with the extra plain count"),
    QCase("groupby_multi_single_reducer3.q", "w17r43",
      """select key, count(*) AS cnt from qt_src src
        |where src.value in ('val_100', 'val_200', 'val_300')
        |  and key in (100, 150, 200)
        |group by key""".stripMargin,
      duck = Some("""select key, count(*) AS cnt from qt_src src
        |where src.value in ('val_100', 'val_200', 'val_300')
        |  and CAST(key AS INT) in (100, 150, 200)
        |group by key""".stripMargin),
      note = "IN filters over both columns (string key vs int list " +
        "coerces)"),
    QCase("groupby_join_pushdown.q", "w17r44",
      """SELECT f.key, g.key AS key2, count(g.key) AS c
        |FROM qt_src f JOIN qt_src g ON (f.key = g.key)
        |GROUP BY f.key, g.key""".stripMargin,
      note = "aggregate pushed below the self-join (CBO rewrite; " +
        "results gate)"),
    QCase("groupby_join_pushdown.q", "w17r45",
      """SELECT DISTINCT f.value AS v1, g.value AS v2
        |FROM qt_src f JOIN qt_src g ON (f.value = g.value)"""
        .stripMargin,
      note = "DISTINCT above the join collapses the duplicate blowup"),
    QCase("groupby_map_ppr.q", "w17r46",
      s"""SELECT substr(src.key,1,1) AS k,
         |  count(DISTINCT substr(src.value,5)) AS c,
         |  sum(CAST(substr(src.value,5) AS DOUBLE)) AS s
         |FROM qt_srcpart src WHERE src.ds = '2008-04-08'
         |GROUP BY substr(src.key,1,1)""".stripMargin,
      note = "partition-pruned map-side aggregate (both hr " +
        "partitions of the one ds)"),
    QCase("groupby_map_ppr_multi_distinct.q", "w17r47",
      s"""SELECT substr(src.key,1,1) AS k,
         |  count(DISTINCT substr(src.value,5)) AS c,
         |  sum(CAST(substr(src.value,5) AS DOUBLE)) AS s,
         |  sum(DISTINCT CAST(substr(src.value,5) AS DOUBLE)) AS sd,
         |  count(src.value) AS cv
         |FROM qt_srcpart src WHERE src.ds = '2008-04-08'
         |GROUP BY substr(src.key,1,1)""".stripMargin,
      note = "multi-distinct over the pruned partitions"),
    QCase("groupby_ppr_multi_distinct.q", "w17r48",
      s"""SELECT substr(src.key,1,1) AS k,
         |  count(DISTINCT substr(src.value,5)) AS c,
         |  sum(CAST(substr(src.value,5) AS DOUBLE)) AS s,
         |  sum(DISTINCT CAST(substr(src.value,5) AS DOUBLE)) AS sd,
         |  count(src.value) AS cv
         |FROM qt_srcpart src WHERE src.ds = '2008-04-08'
         |GROUP BY substr(src.key,1,1)""".stripMargin,
      note = "reduce-side twin of the same pruned multi-distinct"),
    QCase("groupby_bigdata.q", "w17r49",
      "select count(distinct subq.key) AS c from (SELECT key FROM " +
        "qt_src) subq",
      note = "the file streams src through a python row-multiplier " +
        "then distinct-counts; the distinct-count semantics gate here")
  )

  test("qtest conformance wave 17r: grouping-sets algebra remainder " +
      "(cube joins, set dedupe, pushdown, windows-over-having), the " +
      "groupby_sort bucketed family, multi-insert and ppr stragglers") {
    run("groupby")
  }
}
