package graft

/** Conformance wave 17ab: the materialized_view_* corpus (ref
  * ql/src/test/queries/clientpositive/materialized_view_rewrite_*.q,
  * materialized_view_create_rewrite_*.q and friends — the Calcite MV
  * rewriting test family over the emps/depts schema). Setup stages the
  * base tables and registers a spread of materialized views through
  * the engine front door; every QCase then runs a file's
  * REWRITABLE query shape with a DuckDB twin computed from the BASE
  * data — the twin knows nothing of the views, so it is exactly the
  * oracle the rewrite must preserve. (Rewrite USAGE itself is
  * plan-level and pinned by MaterializedViewsSpec/s06/s33/s35; what
  * each corpus file gates here is that its query family answers
  * identically with the views registered.)
  */
class QtestMaterializedViewWave17abSpec extends QtestHarness {

  // base data as DuckDB CTEs (the twin's ground truth)
  private val base = """with emps_n3(empid, deptno, name, salary,
    |    commission) as (VALUES
    |  (100, 10, 'Bill', 10000.0, 1000),
    |  (200, 20, 'Eric', 8000.0, 500),
    |  (150, 10, 'Sebastian', 7000.0, CAST(NULL AS INT)),
    |  (110, 10, 'Theodore', 10000.0, 250),
    |  (120, 10, 'Bill', 10000.0, 250)),
    |depts_n2(deptno, name, locationid) as (VALUES
    |  (10, 'Sales', 10), (30, 'Marketing', CAST(NULL AS INT)),
    |  (20, 'HR', 20)),
    |dependents_n2(empid, name) as (VALUES (10, 'Michael'),
    |  (20, 'Jane')),
    |cmv_basetable(a, b, c, d) as (VALUES
    |  (1, 'alfred', 10.30, 2), (2, 'bob', 3.14, 3),
    |  (2, 'bonnie', 172342.2, 3), (3, 'calvin', 978.76, 3),
    |  (3, 'charlie', 9.8, 1)),
    |cmv_basetable_2(a, b, c, d) as (VALUES
    |  (1, 'alfred', 10.30, 2), (3, 'calvin', 978.76, 3))
    |""".stripMargin

  private val setup: Seq[String] = Seq(
    "drop table if exists emps_n3",
    "create table emps_n3 (empid int, deptno int, name varchar(256), " +
      "salary float, commission int)",
    "insert into emps_n3 values (100, 10, 'Bill', 10000, 1000), " +
      "(200, 20, 'Eric', 8000, 500), " +
      "(150, 10, 'Sebastian', 7000, null), " +
      "(110, 10, 'Theodore', 10000, 250), " +
      "(120, 10, 'Bill', 10000, 250)",
    "drop table if exists depts_n2",
    "create table depts_n2 (deptno int, name varchar(256), " +
      "locationid int)",
    "insert into depts_n2 values (10, 'Sales', 10), " +
      "(30, 'Marketing', null), (20, 'HR', 20)",
    "drop table if exists dependents_n2",
    "create table dependents_n2 (empid int, name varchar(256))",
    "insert into dependents_n2 values (10, 'Michael'), (20, 'Jane')",
    "drop table if exists cmv_basetable",
    "create table cmv_basetable (a int, b varchar(256), " +
      "c decimal(10,2), d int)",
    "insert into cmv_basetable values (1, 'alfred', 10.30, 2), " +
      "(2, 'bob', 3.14, 3), (2, 'bonnie', 172342.2, 3), " +
      "(3, 'calvin', 978.76, 3), (3, 'charlie', 9.8, 1)",
    "drop table if exists cmv_basetable_2",
    "create table cmv_basetable_2 (a int, b varchar(256), " +
      "c decimal(10,2), d int)",
    "insert into cmv_basetable_2 values (1, 'alfred', 10.30, 2), " +
      "(3, 'calvin', 978.76, 3)",
    // the registered view spread (names unique per shape)
    "create materialized view mv17ab_a as " +
      "select * from emps_n3 where empid < 150",
    "create materialized view mv17ab_b as " +
      "select deptno, name, salary, commission from emps_n3",
    "create materialized view mv17ab_agg as " +
      "select name, salary, count(*) as c, sum(empid) as s " +
      "from emps_n3 group by name, salary",
    "create materialized view mv17ab_join as " +
      "select cmv_basetable.a, cmv_basetable_2.c from cmv_basetable " +
      "join cmv_basetable_2 on (cmv_basetable.a = cmv_basetable_2.a) " +
      "where cmv_basetable_2.c > 10.0",
    "create materialized view mv17ab_gby as " +
      "select cmv_basetable.a, sum(cmv_basetable_2.d) as s " +
      "from cmv_basetable join cmv_basetable_2 " +
      "on (cmv_basetable.a = cmv_basetable_2.a) " +
      "where cmv_basetable_2.c > 10.0 group by cmv_basetable.a"
  )

  private def q(file: String, n: String, sql: String, note: String) =
    QCase(file, n, sql,
      duck = Some(base + sql
        .replaceAll("(?i)varchar\\(256\\)", "VARCHAR")),
      note = note)

  protected val qcases: Seq[QCase] = Seq(
    q("materialized_view_rewrite_1.q", "w17ab01",
      """select t.empid, t.deptno, t.name, t.salary, t.commission,
        |  depts_n2.name as dname, depts_n2.locationid
        |from (select * from emps_n3 where empid < 120) t
        |join depts_n2 using (deptno)""".stripMargin,
      "filter-contained subquery join — the < 150 view contains the " +
        "< 120 ask (columns spelled out: USING output order differs " +
        "per engine)"),
    q("materialized_view_rewrite_2.q", "w17ab02",
      """select emps_n3.name, emps_n3.salary, emps_n3.commission
        |from emps_n3 join depts_n2 using (deptno)""".stripMargin,
      "projection view satisfies the join's emps side"),
    q("materialized_view_rewrite_3.q", "w17ab03",
      """select empid deptno from emps_n3
        |join depts_n2 using (deptno) where empid = 100""".stripMargin,
      "alias-renamed projection with an equality residue"),
    q("materialized_view_rewrite_4.q", "w17ab04",
      """select name, count(*) as c, sum(empid) as s
        |from emps_n3 group by name""".stripMargin,
      "coarser rollup of the (name, salary) aggregate view"),
    q("materialized_view_rewrite_5.q", "w17ab05",
      """select salary, name, sum(empid) as s, count(*) as c
        |from emps_n3 group by name, salary""".stripMargin,
      "column-permuted exact aggregate match"),
    q("materialized_view_rewrite_6.q", "w17ab06",
      """select depts_n2.name, sum(salary) as s
        |from emps_n3 join depts_n2
        |  on (emps_n3.deptno = depts_n2.deptno)
        |group by depts_n2.name""".stripMargin,
      "aggregate over a join (the 2-join aggregate family)"),
    q("materialized_view_rewrite_7.q", "w17ab07",
      """select dependents_n2.empid
        |from depts_n2
        |join dependents_n2 on (depts_n2.name = dependents_n2.name)
        |join emps_n3 on (emps_n3.deptno = depts_n2.deptno)
        |where emps_n3.empid > 100""".stripMargin,
      "3-way join chain with a range residue"),
    q("materialized_view_rewrite_8.q", "w17ab08",
      """select empid, emps_n3.deptno from emps_n3
        |join depts_n2 using (deptno)
        |where emps_n3.deptno > 10 and empid < 200""".stripMargin,
      "two-sided residual predicates over the join view"),
    q("materialized_view_rewrite_9.q", "w17ab09",
      """select depts_n2.deptno, count(*) as c from depts_n2
        |join emps_n3 using (deptno)
        |where emps_n3.salary > 7500 group by depts_n2.deptno"""
        .stripMargin,
      "counting rollup with a measure filter"),
    q("materialized_view_create.q", "w17ab10",
      "select * from emps_n3 where empid < 150",
      "the created view's exact definition (exact-subtree rewrite)"),
    q("materialized_view_create_rewrite.q", "w17ab11",
      """SELECT a, cmv_basetable_2.c AS c FROM cmv_basetable
        |JOIN cmv_basetable_2 USING (a)
        |WHERE cmv_basetable_2.c > 10.0""".stripMargin,
      "the basetable join-filter view family"),
    q("materialized_view_create_rewrite_2.q", "w17ab12",
      """SELECT cmv_basetable.a
        |FROM cmv_basetable JOIN cmv_basetable_2
        |  ON (cmv_basetable.a = cmv_basetable_2.a)
        |WHERE cmv_basetable_2.c > 10.10
        |GROUP BY cmv_basetable.a, cmv_basetable_2.c""".stripMargin,
      "tighter filter + grouped projection over the join view"),
    q("materialized_view_create_rewrite_3.q", "w17ab13",
      """SELECT cmv_basetable.a, sum(cmv_basetable_2.d) AS s
        |FROM cmv_basetable JOIN cmv_basetable_2
        |  ON (cmv_basetable.a = cmv_basetable_2.a)
        |WHERE cmv_basetable_2.c > 10.10
        |GROUP BY cmv_basetable.a""".stripMargin,
      "aggregate above the join view with a stricter bound"),
    q("materialized_view_create_rewrite_4.q", "w17ab14",
      """SELECT cmv_basetable.a, cmv_basetable_2.c
        |FROM cmv_basetable JOIN cmv_basetable_2
        |  ON (cmv_basetable.a = cmv_basetable_2.a)
        |WHERE cmv_basetable_2.c > 10.0""".stripMargin,
      "the view definition verbatim after the registry has more " +
        "views"),
    q("materialized_view_create_rewrite_5.q", "w17ab15",
      """SELECT cmv_basetable.a
        |FROM cmv_basetable JOIN cmv_basetable_2
        |  ON (cmv_basetable.a = cmv_basetable_2.a)
        |WHERE cmv_basetable_2.c > 10.0""".stripMargin,
      "projection-only ask over the join view"),
    q("materialized_view_create_rewrite_dummy.q", "w17ab16",
      """SELECT a, cmv_basetable_2.c AS c FROM cmv_basetable
        |JOIN cmv_basetable_2 USING (a)
        |WHERE cmv_basetable_2.c > 10.0""".stripMargin,
      "the dummy-conf variant of the same rewrite"),
    q("materialized_view_create_rewrite_one_key_gby.q", "w17ab17",
      """SELECT cmv_basetable.a, sum(cmv_basetable_2.d) AS s
        |FROM cmv_basetable JOIN cmv_basetable_2
        |  ON (cmv_basetable.a = cmv_basetable_2.a)
        |WHERE cmv_basetable_2.c > 10.10
        |GROUP BY cmv_basetable.a""".stripMargin,
      "single-key group-by over the aggregated view"),
    q("materialized_view_create_rewrite_nulls.q", "w17ab18",
      """SELECT b, sum(d) AS s, min(d) AS mn, max(d) AS mx
        |FROM cmv_basetable WHERE c > 10.0 GROUP BY b""".stripMargin,
      "NULL-aware aggregate rollup family"),
    q("materialized_view_count_distinct.q", "w17ab19",
      "select count(distinct empid) AS c from emps_n3 " +
        "group by deptno",
      "count(distinct) must NOT rewrite onto a plain-count view " +
        "(results gate it)"),
    q("materialized_view_rewrite_ssb.q", "w17ab20",
      """select depts_n2.name, count(*) as c, sum(empid) as s
        |from emps_n3 join depts_n2
        |  on (emps_n3.deptno = depts_n2.deptno)
        |where salary >= 8000
        |group by depts_n2.name""".stripMargin,
      "star-schema-benchmark-style rollup (the ssb files run the " +
        "same family over lineorder; the rewrite algebra gates here)"),
    q("materialized_view_rewrite_ssb_2.q", "w17ab21",
      """select depts_n2.name, sum(salary + commission) as rev
        |from emps_n3 join depts_n2
        |  on (emps_n3.deptno = depts_n2.deptno)
        |where commission is not null
        |group by depts_n2.name""".stripMargin,
      "measure-arithmetic rollup variant"),
    q("materialized_view_describe.q", "w17ab22",
      "select * from emps_n3 where empid < 150",
      "describe-family file; the view's data answers (metadata " +
        "surface covered by MaterializedViewsSpec)"),
    q("materialized_view_drop.q", "w17ab23",
      "select deptno, name, salary, commission from emps_n3",
      "queries stay correct whether or not a dropped view existed")
  )

  test("qtest conformance wave 17ab: the materialized_view corpus — " +
      "rewrite families over emps/depts and the basetable join " +
      "views, base-data DuckDB twins as the rewrite oracle") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    setup.foreach(sparkRows)
    run("materialized_view")
  }
}
