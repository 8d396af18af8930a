package graft

/** Conformance wave 17o: the union corpus remainder (ref ql/src/test/
  * queries/clientpositive/union*.q). Multi-statement .q files distill to
  * their result-bearing SELECTs per the established porting rules:
  * CTAS/LOAD fixtures become CTEs or inline VALUES with the same data
  * shape, INSERT-to-table sinks drop to the SELECT they carry, and
  * nondeterministic bare LIMITs gain the ORDER BY the .q.out relies on.
  *
  * Headline semantics pinned here: Hive's left-associative mixed
  * UNION ALL / UNION DISTINCT stacking (union_paren.q,
  * unionDistinct_2.q), parenthesized union branches with trailing
  * ORDER BY/LIMIT attachment (union_paren.q), positional ORDER BY over
  * alias-swapped union legs (union_pos_alias.q), type unification
  * across legs (union36.q decimal windows, union_date.q), constant
  * folding legs under filters (union_all_filter_transpose.q,
  * unionall_unbalancedppd.q), TRANSFORM legs inside unions
  * (union23.q, union_script.q), lateral views over and under unions
  * (union26.q, union_lateralview.q, unionall_lateralview1.q), and the
  * quoted-identifiers=none REGEX column spec (union_regex.q, via
  * [[graft.plans.HiveConfs]]).
  */
class QtestUnionWave17oSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("union18.q", "w17o01",
      """select u.key, u.value from
        |  (select 'tst1' as key, cast(count(1) as string) as value
        |     from qt_src s1
        |   union all
        |   select s2.key as key, s2.value as value from qt_src s2) u"""
        .stripMargin,
      duck = Some("""select u.key, u.value from
        |  (select 'tst1' as key, cast(count(1) as varchar) as value
        |     from qt_src s1
        |   union all
        |   select s2.key as key, s2.value as value from qt_src s2) u"""
        .stripMargin),
      note = "aggregate leg unioned with a full-scan leg (the file " +
        "multi-inserts the union into two tables)"),

    QCase("union22.q", "w17o02",
      """select s.k1, s.k2, s.k3, s.k4 from (
        |  select key as k1, value as k2, key as k3, value as k4
        |    from qt_src where cast(key as int) <= 50
        |  union all
        |  select a.key as k1, a.value as k2, b.key as k3, b.value as k4
        |    from qt_src a left outer join
        |      (select * from qt_src where cast(key as int) > 50) b
        |      on a.key = b.key
        |    where cast(a.key as int) > 20
        |) s""".stripMargin,
      note = "filtered projection unioned with a left-outer-join leg " +
        "(the file targets a partitioned sink; semantics identical)"),

    QCase("union23.q", "w17o03",
      """select s.key2, s.value2 from (
        |  select transform(key, value) using 'cat' as (key2, value2)
        |    from qt_src
        |  union all
        |  select key as key2, value as value2 from qt_src) s
        |order by s.key2, s.value2""".stripMargin,
      duck = Some("""select s.key2, s.value2 from (
        |  select key as key2, value as value2 from qt_src
        |  union all
        |  select key as key2, value as value2 from qt_src) s
        |order by s.key2, s.value2""".stripMargin),
      ordered = true,
      note = "TRANSFORM leg inside a union ('cat' is the identity " +
        "script); DuckDB twin replaces the script with the identity " +
        "projection"),

    QCase("union26.q", "w17o04",
      """SELECT count(1) as counts, key, value FROM (
        |  SELECT a.key, a.value FROM qt_srcpart a JOIN qt_srcpart b
        |    ON a.ds='2008-04-08' and a.hr='11'
        |    and b.ds='2008-04-08' and b.hr='12' AND a.key = b.key
        |  UNION ALL
        |  select key, value FROM qt_srcpart
        |    LATERAL VIEW explode(array(1,2,3)) myTable AS myCol
        |    WHERE ds='2008-04-08' and hr='11'
        |) a group by key, value""".stripMargin,
      duck = Some("""SELECT count(1) as counts, key, value FROM (
        |  SELECT a.key, a.value FROM qt_srcpart a JOIN qt_srcpart b
        |    ON a.ds='2008-04-08' and a.hr='11'
        |    and b.ds='2008-04-08' and b.hr='12' AND a.key = b.key
        |  UNION ALL
        |  select key, value FROM qt_srcpart
        |    cross join (values (1),(2),(3)) t(c)
        |    WHERE ds='2008-04-08' and hr='11'
        |) a group by key, value""".stripMargin),
      note = "partition-filtered self-join unioned with a lateral-view " +
        "row-tripler, counted"),

    QCase("union29.q", "w17o05",
      """select * from (
        |  select key, value from qt_src
        |  union all
        |  select key, value from (
        |    select key, value from qt_src
        |    union all
        |    select key, value from qt_src
        |  ) subq
        |) a""".stripMargin,
      note = "union of a scan with a nested union subquery (3x src)"),

    QCase("union30.q", "w17o06",
      """select * from (
        |select * from (
        |  select key, value from qt_src
        |  union all
        |  select key, value from (
        |    select key, value, count(1) from qt_src group by key, value
        |    union all
        |    select key, value, count(1) from qt_src group by key, value
        |  ) subq
        |) a
        |union all
        |select key, value from qt_src
        |) aa""".stripMargin,
      note = "3-col aggregate legs projected to 2 cols inside a " +
        "nested union, then unioned with the raw scan"),

    QCase("union31.q", "w17o07",
      """select x.key, count(1) as cnt from (
        |  select * from (select key, value from qt_src
        |                   where cast(key as int) < 10) t1
        |  union all
        |  select * from (select key, value from qt_src
        |                   where cast(key as int) < 10) t2
        |) x group by x.key""".stripMargin,
      note = "aggregation over a union of two identical CTAS-derived " +
        "tables (key side of the file's multi-insert)"),

    QCase("union31.q", "w17o08",
      """select x.value, count(1) as cnt from (
        |  select * from (select key, value from qt_src
        |                   where cast(key as int) < 10) t1
        |  union all
        |  select * from (select key, value from qt_src
        |                   where cast(key as int) < 10) t2
        |) x group by x.value""".stripMargin,
      note = "value side of the same multi-insert"),

    QCase("union34.q", "w17o09",
      """with src10 as (select key, value from qt_src
        |                 order by key, value limit 10)
        |select * from (
        |  select * from src10
        |  union all
        |  select * from src10
        |  union all
        |  select * from src10
        |) u""".stripMargin,
      note = "union of three subqueries off the same 10-row sample " +
        "(file: tablesample(10 rows) + mapjoin subqueries; " +
        "order-by-limit makes the sample deterministic)"),

    QCase("union36.q", "w17o10",
      """select (x/sum(x) over()) as y from(
        |  select cast(1 as decimal(10,0)) as x
        |    from (select * from qt_src limit 2) s1
        |  union all
        |  select cast(1 as decimal(10,0)) x
        |    from (select * from qt_src limit 2) s2
        |  union all
        |  select cast('100000000' as decimal(10,0)) x
        |    from (select * from qt_src limit 2) s3)u""".stripMargin,
      note = "decimal division by an unpartitioned window sum over a " +
        "3-leg union"),

    QCase("union36.q", "w17o11",
      """select (x/sum(x) over()) as y from(
        |  select cast(1 as decimal(10,0)) as x
        |    from (select * from qt_src limit 2) s1
        |  union all
        |  select cast(1 as decimal(10,0)) x
        |    from (select * from qt_src limit 2) s2
        |  union all
        |  select cast(null as decimal(10,0)) x
        |    from (select * from qt_src limit 2) s3)u""".stripMargin,
      note = "NULL decimal leg: the window sum skips NULLs, the " +
        "NULL rows divide to NULL"),

    QCase("union38.q", "w17o12",
      """with v1 as (select 'Young' as name, 1 as id, 'Sydney' as address
        |            union all select 'Jin', 2, 'Mel'),
        |     v2 as (select 'Eun' as name, 3 as id, 'Bri' as address
        |            union all select 'Kim', 4, 'Ad')
        |select * from v1 union select * from v2""".stripMargin,
      note = "UNION DISTINCT across two view-shaped CTEs (the file " +
        "builds them as named views)"),

    QCase("union_date.q", "w17o13",
      """select * from (
        |  select fl_num, fl_date from (
        |    select 1 as fl_num, date '2000-11-20' as fl_date
        |    union all select 2, date '2000-11-21') union_date_1
        |  union all
        |  select fl_num, fl_date from (
        |    select 1 as fl_num, date '2000-11-20' as fl_date
        |    union all select 2, date '2000-11-21') union_date_2
        |) union_result""".stripMargin,
      note = "DATE-typed column unification across union legs"),

    QCase("union_date_trim.q", "w17o14",
      """select id, tm from (
        |  select id, dt as tm from (select 1 as id,
        |    date '2014-04-07' as dt) a where id = 1
        |  union all
        |  select id, dt as tm from (select 2 as id,
        |    date '2014-04-08' as dt) b where id = 2
        |  union all
        |  select id, cast(trim(cast(dt as string)) as date) as tm
        |    from (select 3 as id, date '2014-04-09' as dt) c
        |    where id = 3
        |) u""".stripMargin,
      duck = Some("""select id, tm from (
        |  select id, dt as tm from (select 1 as id,
        |    date '2014-04-07' as dt) a where id = 1
        |  union all
        |  select id, dt as tm from (select 2 as id,
        |    date '2014-04-08' as dt) b where id = 2
        |  union all
        |  select id, cast(trim(cast(dt as varchar)) as date) as tm
        |    from (select 3 as id, date '2014-04-09' as dt) c
        |    where id = 3
        |) u""".stripMargin),
      note = "date -> string -> trim -> date round-trip leg unioned " +
        "with plain date legs"),

    QCase("union_literals.q", "w17o15",
      """SELECT * FROM (
        |   VALUES(1, '1'),
        |         (2, 'orange'),
        |         (5, 'yellow'),
        |         (10, 'green'),
        |         (11, 'blue'),
        |         (12, 'indigo'),
        |         (20, 'violet'))
        |   AS Colors""".stripMargin,
      note = "inline VALUES table (Hive compiles it as a union of " +
        "literal rows)"),

    QCase("union_paren.q", "w17o16",
      """with t1 as (select 1 as c union all select 1 union all select 2),
        |     t2 as (select 2 as c union all select 1 union all select 2),
        |     t3 as (select 2 as c union all select 3 union all select 2)
        |(select * from t1) union all select * from t2
        |  union select * from t3 order by c""".stripMargin,
      ordered = true,
      note = "left-associative mixed stacking: (t1 UNION ALL t2) " +
        "UNION DISTINCT t3 — the distinct collapses everything"),

    QCase("union_paren.q", "w17o17",
      """with t1 as (select 1 as c union all select 1 union all select 2),
        |     t2 as (select 2 as c union all select 1 union all select 2),
        |     t3 as (select 2 as c union all select 3 union all select 2)
        |(select * from t1) union all
        |  (select * from t2 union select * from t3) order by c"""
        .stripMargin,
      ordered = true,
      note = "parenthesized right side: t1 UNION ALL distinct(t2, t3) " +
        "keeps t1's duplicates"),

    QCase("union_paren.q", "w17o18",
      "(select key from qt_src order by key limit 1)",
      ordered = true,
      note = "fully parenthesized standalone query with ORDER BY/LIMIT " +
        "inside the parens"),

    QCase("union_paren.q", "w17o19",
      """select key from qt_src union all
        |  ((select key from qt_src limit 1)) order by key limit 1"""
        .stripMargin,
      duck = Some("""select key from qt_src union all
        |  (select key from (select key from qt_src order by key) s
        |     limit 1) order by key limit 1""".stripMargin),
      ordered = true,
      note = "double-parenthesized limited branch; the trailing ORDER " +
        "BY/LIMIT binds to the whole union (twin pins the minimum " +
        "key '0' deterministically)"),

    QCase("union_pos_alias.q", "w17o20",
      """select 'tst1' as key, count(1) as value from qt_src s1
        |UNION ALL
        |select key, value from (
        |  select 'tst2' as key, count(1) as value from qt_src s2
        |  UNION ALL
        |  select 'tst3' as key, count(1) as value from qt_src s3) s4
        |order by 1""".stripMargin,
      ordered = true,
      note = "positional ORDER BY over a union whose right leg is " +
        "itself a union of aggregates"),

    QCase("union_pos_alias.q", "w17o21",
      """with src_10 as (select key, value from qt_src
        |                  order by key, value limit 10)
        |select key as value, value as key from src_10
        |UNION ALL
        |select 'test', value from src_10 s3
        |order by 2, 1 desc""".stripMargin,
      ordered = true,
      note = "alias-swapped legs ordered by position 2 then 1 DESC " +
        "(the positions address the SWAPPED output names)"),

    QCase("union_ppr.q", "w17o22",
      """SELECT * FROM (
        |  SELECT X.* FROM qt_srcpart X WHERE cast(X.key as int) < 100
        |  UNION ALL
        |  SELECT Y.* FROM qt_srcpart Y WHERE cast(Y.key as int) < 100
        |) A
        |WHERE A.ds = '2008-04-08'
        |ORDER BY A.key, A.value, A.ds, A.hr""".stripMargin,
      ordered = true,
      note = "outer partition predicate pushed into both union legs " +
        "(the file asserts the pruned plan; results gate here)"),

    QCase("union_script.q", "w17o23",
      """select * from (
        |  select transform(key) using 'cat' as cola from qt_src
        |  union all
        |  select transform(key) using 'cat' as cola from qt_src) s"""
        .stripMargin,
      duck = Some("""select * from (
        |  select key as cola from qt_src
        |  union all
        |  select key as cola from qt_src) s""".stripMargin),
      note = "both union legs are TRANSFORM scripts (identity 'cat')"),

    QCase("union_rowcounts.q", "w17o24",
      """with t1 as (select 1 as a)
        |select 2 as t, count(*) as c from (
        |  select * from t1 union all select * from t1) t2a"""
        .stripMargin,
      note = "row count doubles through a CTAS-shaped union"),

    QCase("union_rowcounts.q", "w17o25",
      """with t1 as (select 1 as a)
        |select 2 as t, count(*) as c from (
        |  select * from (select * from t1) sq1
        |  union all
        |  select * from (select * from t1) sq2) t2b""".stripMargin,
      note = "same through nested subquery wrappers"),

    QCase("union_lateralview.q", "w17o26",
      """select d.arr_ele, count(1) as cnt from (
        | SELECT c.arr_ele as arr_ele, a.key as key, a.value as value
        | FROM (
        |   SELECT key, value, array(1,2,3) as arr FROM qt_src
        |   UNION ALL
        |   SELECT key, value, array(1,2,3) as arr FROM qt_srcpart
        |   WHERE ds = '2008-04-08' and hr='12'
        | ) a LATERAL VIEW EXPLODE(arr) c AS arr_ele
        |) d group by d.arr_ele""".stripMargin,
      duck = Some("""select t.c as arr_ele, count(1) as cnt from (
        |   SELECT key FROM qt_src
        |   UNION ALL
        |   SELECT key FROM qt_srcpart
        |   WHERE ds = '2008-04-08' and hr='12'
        | ) a cross join (values (1),(2),(3)) t(c)
        |group by t.c""".stripMargin),
      note = "lateral view exploding an array column synthesized in " +
        "both union legs"),

    QCase("unionall_lateralview1.q", "w17o27",
      """select t.id, t.dt from (
        |  select id, dt from (select 2 as id, '2019-04-01' as dt) s1
        |  union all
        |  select id, dts as dt from (select 1 as id,
        |    array('2019-01-01','2019-01-02','2019-01-03') as dates) tt
        |    lateral view explode(tt.dates) dd as dts ) t""".stripMargin,
      duck = Some("""select id, dt from (
        |  select 2 as id, '2019-04-01' as dt
        |  union all select 1, '2019-01-01'
        |  union all select 1, '2019-01-02'
        |  union all select 1, '2019-01-03') t""".stripMargin),
      note = "plain leg unioned with a lateral-view-exploded leg (the " +
        "file dynamic-partitions the result on dt)"),

    QCase("unionall_join_nullconstant.q", "w17o28",
      """select v.autoname, v.col1, b.col1 as bcol from (
        |  select substring(k, 1, locate('|', k) - 1) as autoname,
        |         cast(null as string) as col1
        |    from (select 'x|1' as k) a1
        |  union all
        |  select substring(k, 1, locate('|', k) - 1) as autoname,
        |         cast(null as string) as col1
        |    from (select 'y|2' as k) a2
        |) v left outer join
        |  (select 'x' as composite_key, 'c1' as col1) b
        |  on v.autoname = b.composite_key""".stripMargin,
      duck = Some("""select v.autoname, v.col1, b.col1 as bcol from (
        |  select substring(k, 1, position('|' in k) - 1) as autoname,
        |         cast(null as varchar) as col1
        |    from (select 'x|1' as k) a1
        |  union all
        |  select substring(k, 1, position('|' in k) - 1) as autoname,
        |         cast(null as varchar) as col1
        |    from (select 'y|2' as k) a2
        |) v left outer join
        |  (select 'x' as composite_key, 'c1' as col1) b
        |  on v.autoname = b.composite_key""".stripMargin),
      note = "CAST(NULL AS STRING) constant column through a union " +
        "view joined on the substring key (HIVE-11841 shape)"),

    QCase("unionall_unbalancedppd.q", "w17o29",
      """SELECT f1 FROM (
        |  SELECT f1, if('helloworld' like '%hello%', f1, f2) as filter
        |    FROM (select 1 as f1, 0 as f2
        |          union all select 0, 1) union_all_bug_test_1
        |  union all
        |  SELECT f1, 0 as filter FROM (select 1 as f1)
        |    union_all_bug_test_2
        |) A WHERE filter = 1""".stripMargin,
      duck = Some("""SELECT f1 FROM (
        |  SELECT f1, case when 'helloworld' like '%hello%'
        |                  then f1 else f2 end as filter
        |    FROM (select 1 as f1, 0 as f2
        |          union all select 0, 1) union_all_bug_test_1
        |  union all
        |  SELECT f1, 0 as filter FROM (select 1 as f1)
        |    union_all_bug_test_2
        |) A WHERE filter = 1""".stripMargin),
      note = "predicate over an if() that only one union leg computes " +
        "(unbalanced PPD, HIVE-9919 shape)"),

    QCase("union_all_filter_transpose.q", "w17o30",
      """SELECT * FROM (
        |  SELECT a, b FROM (select '1000' as a, 'b1' as b
        |                    union all select '2000', 'b2') t
        |  UNION ALL
        |  SELECT a, CAST(NULL AS string)
        |    FROM (select '1000' as a, 'b1' as b
        |          union all select '2000', 'b2') t) AS t2
        |WHERE a = 1000""".stripMargin,
      duck = Some("""SELECT * FROM (
        |  SELECT a, b FROM (select '1000' as a, 'b1' as b
        |                    union all select '2000', 'b2') t
        |  UNION ALL
        |  SELECT a, CAST(NULL AS varchar)
        |    FROM (select '1000' as a, 'b1' as b
        |          union all select '2000', 'b2') t) AS t2
        |WHERE cast(a as int) = 1000""".stripMargin),
      note = "numeric-coerced filter transposed over a union with a " +
        "CAST(NULL) leg (must not simplify the cast away)"),

    QCase("union_all_filter_transpose_pruned_operands.q", "w17o31",
      """SELECT * FROM (
        |  SELECT a, b FROM (select '1000' as a, 'b1' as b union all
        |    select '1001', 'b1' union all select '1002', 'b1'
        |    union all select '2000', 'b2') t
        |  UNION ALL
        |  SELECT a, b FROM (select '1000' as a, 'b1' as b union all
        |    select '1001', 'b1' union all select '1002', 'b1'
        |    union all select '2000', 'b2') t WHERE a = '1001'
        |  UNION ALL
        |  SELECT a, b FROM (select '1000' as a, 'b1' as b union all
        |    select '1001', 'b1' union all select '1002', 'b1'
        |    union all select '2000', 'b2') t WHERE a = '1002'
        |) AS t2
        |WHERE a = '1000'""".stripMargin,
      note = "outer filter contradicts two pre-filtered legs — they " +
        "prune to empty, one row survives"),

    QCase("union_assertion_type.q", "w17o32",
      """SELECT column1, x.column2, x.column3 FROM (
        |  SELECT column1, column2, column3 FROM (
        |    select '1' as column1, '2' as column2, '3' as column3
        |    union all select '4', '5', '6'
        |    union all select '7', '8', '9'
        |    union all select '10', '11', '12') union_table_test_n0
        |  UNION ALL
        |  SELECT column1, column2, '5' as column3 FROM (
        |    select '1' as column1, '2' as column2, '3' as column3
        |    union all select '4', '5', '6'
        |    union all select '7', '8', '9'
        |    union all select '10', '11', '12') union_table_test_n1
        |) x WHERE x.column3 < '5'""".stripMargin,
      note = "string comparison filter over a union whose second leg " +
        "pins a constant column"),

    QCase("union_distinct_hive_28488.q", "w17o33",
      """select * from (
        |  select * from (
        |    select key, value from qt_src where 1 = 0
        |    union
        |    select key, value from qt_src where 1 = 0
        |    union
        |    select key, value from qt_src where 1 = 0
        |  ) d1
        |  union
        |  select * from (
        |    select key, value from qt_src where 1 = 0
        |    union
        |    select key, value from qt_src where 1 = 0
        |    union
        |    select key, value from qt_src where 1 = 0
        |  ) d2
        |) u""".stripMargin,
      note = "nested UNION DISTINCT towers over empty inputs answer " +
        "zero rows (HIVE-28488)"),

    QCase("unionDistinct_2.q", "w17o34",
      """with u1 as (select key, value from qt_src
        |              order by key, value limit 5),
        |     u2 as (select key, value from qt_src
        |              order by key, value limit 3),
        |     u3 as (select key, value from qt_src
        |              order by key desc, value limit 5)
        |select key, value from (
        |  select key, value from u1
        |  union
        |  select key, value from u2
        |  union all
        |  select key, value from u3
        |) tab""".stripMargin,
      note = "mixed stacking: distinct(u1, u2) then ALL-append u3 — " +
        "u3's rows keep duplicates"),

    QCase("unionDistinct_2.q", "w17o35",
      """with u1 as (select key, value from qt_src
        |              order by key, value limit 5),
        |     u2 as (select key, value from qt_src
        |              order by key, value limit 3),
        |     u3 as (select key, value from qt_src
        |              order by key desc, value limit 5)
        |select key, value from (
        |  select key, value from u1
        |  union distinct
        |  select key, value from u2
        |  union all
        |  select key as key, value from u3
        |) tab""".stripMargin,
      note = "explicit UNION DISTINCT spelling of the same stack"),

    QCase("unionDistinct_3.q", "w17o36",
      """select count(1) as c FROM (
        |  select s1.key as key, s1.value as value from qt_src s1
        |  UNION DISTINCT
        |  select s2.key as key, s2.value as value from qt_src s2
        |) unionsrc""".stripMargin,
      duck = Some("""select count(1) as c FROM (
        |  select s1.key as key, s1.value as value from qt_src s1
        |  UNION
        |  select s2.key as key, s2.value as value from qt_src s2
        |) unionsrc""".stripMargin),
      note = "self-union distinct collapses to the distinct row count " +
        "(309 for src)"),

    QCase("unionDistinct_3.q", "w17o37",
      """select unionsrc.key, unionsrc.value FROM (
        |  select 'tst1' as key, cast(count(1) as string) as value
        |    from qt_src s1
        |  UNION DISTINCT
        |  select s2.key as key, s2.value as value from qt_src1 s2
        |) unionsrc""".stripMargin,
      duck = Some("""select unionsrc.key, unionsrc.value FROM (
        |  select 'tst1' as key, cast(count(1) as varchar) as value
        |    from qt_src s1
        |  UNION
        |  select s2.key as key, s2.value as value from qt_src1 s2
        |) unionsrc""".stripMargin),
      note = "aggregate leg union-distinct a different table (kv3)"),

    QCase("unionDistinct_1.q", "w17o38",
      """select unionsrc.key, count(1) as c FROM (
        |  select 'tst1' as key, cast(count(1) as string) as value
        |    from qt_src s1
        |  UNION DISTINCT
        |  select 'tst2' as key, cast(count(1) as string) as value
        |    from qt_src s2
        |  UNION DISTINCT
        |  select 'tst3' as key, cast(count(1) as string) as value
        |    from qt_src s3
        |) unionsrc group by unionsrc.key""".stripMargin,
      duck = Some("""select unionsrc.key, count(1) as c FROM (
        |  select 'tst1' as key, cast(count(1) as varchar) as value
        |    from qt_src s1
        |  UNION
        |  select 'tst2' as key, cast(count(1) as varchar) as value
        |    from qt_src s2
        |  UNION
        |  select 'tst3' as key, cast(count(1) as varchar) as value
        |    from qt_src s3
        |) unionsrc group by unionsrc.key""".stripMargin),
      note = "stacked distinct over three constant-keyed aggregates, " +
        "re-aggregated (unionDistinct_1's headline shape)"),

    QCase("union_view.q", "w17o39",
      """select key, value, ds from (
        |  select key, value, ds from qt_srcpart where hr = '11'
        |  union all
        |  select key, value, ds from qt_srcpart where hr = '12'
        |) v where cast(key as int) = 86 and ds = '2008-04-08'"""
        .stripMargin,
      note = "partition predicate through a union view — both legs " +
        "prune to the one ds (the file pins the pruned plan)"),

    QCase("union_stats.q", "w17o40",
      """select count(1) as c from (
        |  select * from qt_src union all select * from qt_src) t"""
        .stripMargin,
      note = "CTAS-over-union row count (the file then checks basic " +
        "stats on the created table)"),

    QCase("union_fast_stats.q", "w17o41",
      """with s1 as (select * from qt_alltypesorc
        |  where cint is not null and ctinyint is not null limit 5),
        |     s2 as (select * from qt_alltypesorc
        |  where cint is null and ctinyint is not null limit 5),
        |     s3 as (select * from qt_alltypesorc
        |  where cint is not null and ctinyint is null limit 5),
        |     s4 as (select * from qt_alltypesorc
        |  where cint is null and ctinyint is null limit 5)
        |select count(*) as c from (
        |  select * from (select * from s1) sq1
        |  union all select * from (select * from s2) sq2
        |  union all select * from (select * from s3) sq3
        |  union all select * from (select * from s4) sq4) ut"""
        .stripMargin,
      note = "4-way union of 5-row null-partitioned slices counts 20 " +
        "(stats parity is the file's point; count gates here)"),

    QCase("union_all_empty_branch_no_tmp_dir.q", "w17o42",
      """select u.id, u.val from (
        |  select p.id, p.val
        |    from (select 1 as id, 'aaa' as val union all
        |          select 2, 'bbb' union all select 3, 'ccc') p
        |    left outer join (select 3 as id, 'ccc_new' as val
        |                     union all select 4, 'ddd') t
        |      on p.id = t.id
        |    where t.id is null
        |  union all
        |  select id, val from (select 3 as id, 'ccc_new' as val
        |                       union all select 4, 'ddd') today
        |) u""".stripMargin,
      note = "anti-join-shaped leg (possibly empty) unioned with the " +
        "delta — the file guards the empty-branch tmp-dir bug"),

    QCase("union_remove_plan.q", "w17o43",
      """select column1 from (select 'a' as column1, 1 as column2
        |    union all select 'b', 2) test_table group by column1
        |union all
        |select column1 from (select 'a' as column1, 1 as column2
        |    union all select 'b', 2) test_table group by column1"""
        .stripMargin,
      note = "group-by legs unioned ALL keep both copies (the " +
        "union-remove optimization must not dedupe)")
  )

  test("qtest conformance: union corpus remainder — core files " +
      "(union18-38, paren/pos_alias/ppr/script, date, literals, " +
      "filter transpose, lateral views, distinct stacks)") {
    run("union")
  }

  test("qtest conformance: union_regex.q — quoted.identifiers=none " +
      "turns backquoted SELECT-list names into REGEX column specs") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    QtestHarness.fixtures // force registration
    def rows(sql: String): Seq[Seq[String]] =
      sparkRows(sql).sortBy(_.mkString(","))
    sparkRows("create or replace temporary view qt_uregex as " +
      "select 1 as a1, 2 as a2, 10 as a1a, 20 as a2a")
    sparkRows("SET hive.support.quoted.identifiers=none")
    try {
      // `(a1)?+.+` possessively excludes exactly a1 -> (a2, a1a, a2a);
      // `(a2)?+.+` -> (a1, a1a, a2a)
      assert(rows("SELECT `(a1)?+.+` FROM qt_uregex UNION " +
        "SELECT `(a2)?+.+` FROM qt_uregex") ===
        Seq(Seq("1", "10", "20"), Seq("2", "10", "20")))
      assert(rows("SELECT `(a1)?+.+` FROM qt_uregex UNION DISTINCT " +
        "SELECT `(a2)?+.+` FROM qt_uregex") ===
        Seq(Seq("1", "10", "20"), Seq("2", "10", "20")))
      assert(rows("SELECT `(a1)?+.+` FROM qt_uregex UNION ALL " +
        "SELECT `(a2)?+.+` FROM qt_uregex") ===
        Seq(Seq("1", "10", "20"), Seq("2", "10", "20")))
    } finally {
      sparkRows("SET hive.support.quoted.identifiers=column")
      spark.catalog.dropTempView("qt_uregex")
    }
  }
}
