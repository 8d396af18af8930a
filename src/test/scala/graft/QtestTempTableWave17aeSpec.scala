package graft

/** Conformance wave 17ae: the temp_table_* corpus (ref ql/src/test/
  * queries/clientpositive/temp_table_*.q — Hive's session-scoped
  * tables re-running the partition-DDL/insert/join/groupby families).
  * `CREATE TEMPORARY TABLE` now materializes through the front door's
  * [[graft.plans.TempTables]] respelling (Spark's legacy parse of the
  * spelling can be neither inserted into nor CTAS'd); the lifetime
  * trade is documented there. Each file's query family gates over
  * temp-staged data with DuckDB twins from the base fixtures.
  */
class QtestTempTableWave17aeSpec extends QtestHarness {

  private val setup: Seq[String] = Seq(
    "drop table if exists tt17_foo",
    "drop table if exists tt17_bar",
    "CREATE TEMPORARY TABLE tt17_foo AS SELECT key, value " +
      "FROM qt_src WHERE key % 2 = 0",
    "CREATE TEMPORARY TABLE tt17_bar AS SELECT key, value " +
      "FROM qt_src WHERE key % 2 = 1",

    "drop table if exists tt17_part",
    "create temporary table tt17_part (k int, v string) " +
      "partitioned by (ds string, hr string) stored as orc",
    "insert into tt17_part partition(ds='2008', hr='11') values " +
      "(1, 'one'), (2, 'two')",
    "insert into tt17_part partition(ds='2008', hr='12') values " +
      "(3, 'three')",
    "insert into tt17_part partition(ds='2009', hr='11') values " +
      "(4, 'four')",
    "alter table tt17_part drop partition (ds='2009', hr='11')",

    "drop table if exists tt17_dyn",
    "create temporary table tt17_dyn (k int) " +
      "partitioned by (part string) stored as parquet",
    "insert into tt17_dyn partition(part) select cast(key as int), " +
      "case when key % 2 = 0 then 'even' else 'odd' end " +
      "from qt_src where cast(key as int) < 20",

    "drop table if exists tt17_pdate",
    "create temporary table tt17_pdate (i int) " +
      "partitioned by (dt date)",
    "insert into tt17_pdate partition(dt=date '2000-01-01') " +
      "values (1)",
    "insert into tt17_pdate partition(dt=date '2000-01-02') " +
      "values (2), (3)",

    "drop table if exists tt17_trunc",
    "create temporary table tt17_trunc as select key from qt_src " +
      "where cast(key as int) < 10",
    "truncate table tt17_trunc"
  )

  private val evenDuck =
    """with foo as (select key, value from qt_src
      |  where cast(key as int) % 2 = 0),
      |bar as (select key, value from qt_src
      |  where cast(key as int) % 2 = 1)
      |""".stripMargin

  protected val qcases: Seq[QCase] = Seq(
    QCase("temp_table.q", "w17ae01",
      "select key, value from tt17_foo order by key, value limit 10",
      duck = Some(evenDuck +
        "select key, value from foo order by key, value limit 10"),
      ordered = true,
      note = "temp CTAS of the even keys, ordered-limited read"),
    QCase("temp_table.q", "w17ae02",
      """select key, value from (select * from tt17_foo
        |  union all select * from tt17_bar) u
        |order by key, value limit 10""".stripMargin,
      duck = Some(evenDuck + """select key, value from (
        |  select * from foo union all select * from bar) u
        |order by key, value limit 10""".stripMargin),
      ordered = true,
      note = "union of two temp tables"),
    QCase("temp_table_gb1.q", "w17ae03",
      """SELECT substr(key,1,1) AS k,
        |  count(DISTINCT substr(value,5)) AS c
        |FROM tt17_foo GROUP BY substr(key,1,1)""".stripMargin,
      duck = Some(evenDuck + """SELECT substr(key,1,1) AS k,
        |  count(DISTINCT substr(value,5)) AS c
        |FROM foo GROUP BY substr(key,1,1)""".stripMargin),
      note = "groupby over the temp staging"),
    QCase("temp_table_join1.q", "w17ae04",
      """SELECT count(*) AS c FROM tt17_foo src1
        |JOIN tt17_foo src2 ON (src1.key = src2.key)""".stripMargin,
      duck = Some(evenDuck + """SELECT count(*) AS c FROM foo src1
        |JOIN foo src2 ON (src1.key = src2.key)""".stripMargin),
      note = "temp-to-temp self join"),
    QCase("temp_table_subquery1.q", "w17ae05",
      """select count(*) AS c from tt17_foo
        |where key in (select key from tt17_bar)""".stripMargin,
      duck = Some(evenDuck + """select count(*) AS c from foo
        |where key in (select key from bar)""".stripMargin),
      note = "IN-subquery across temp tables (disjoint parities: 0)"),
    QCase("temp_table_names.q", "w17ae06",
      "select count(*) AS c from TT17_FOO",
      duck = Some(evenDuck + "select count(*) AS c from foo"),
      note = "case-insensitive temp-table name resolution"),
    QCase("temp_table_precedence.q", "w17ae07",
      "select count(*) AS c from default.tt17_foo",
      duck = Some(evenDuck + "select count(*) AS c from foo"),
      note = "database-qualified reference to the temp name"),

    QCase("temp_table_insert_values_partitioned.q", "w17ae08",
      "select ds, hr, k, v from tt17_part",
      duck = Some("SELECT * FROM (VALUES " +
        "('2008', '11', 1, 'one'), ('2008', '11', 2, 'two'), " +
        "('2008', '12', 3, 'three')) t(ds, hr, k, v)"),
      note = "static-partition VALUES inserts; the dropped 2009 " +
        "partition is gone"),
    QCase("temp_table_insert_values_dynamic_partitioned.q", "w17ae09",
      "select part, count(*) AS c from tt17_dyn group by part",
      duck = Some("""select case when cast(key as int) % 2 = 0
        |  then 'even' else 'odd' end AS part, count(*) AS c
        |from qt_src where cast(key as int) < 20
        |group by 1""".stripMargin),
      note = "dynamic-partition insert derives partitions from the " +
        "data"),
    QCase("temp_table_add_part_exist.q", "w17ae10",
      "select ds, hr, count(*) AS c from tt17_part group by ds, hr",
      duck = Some("SELECT * FROM (VALUES ('2008', '11', 2), " +
        "('2008', '12', 1)) t(ds, hr, c)"),
      note = "partition inventory after add/drop churn"),
    QCase("temp_table_add_part_multiple.q", "w17ae11",
      "select count(distinct hr) AS c from tt17_part where ds = '2008'",
      duck = Some("select 2 AS c"),
      note = "multiple partitions under one ds"),
    QCase("temp_table_drop_multi_partitions.q", "w17ae12",
      "select count(*) AS c from tt17_part where ds = '2009'",
      duck = Some("select 0 AS c"),
      note = "dropped partition's rows are gone"),
    QCase("temp_table_drop_partitions_filter.q", "w17ae13",
      "select k from tt17_part where ds = '2008' and hr = '12'",
      duck = Some("select 3 AS k"),
      note = "partition-filtered read after the filter-form drops"),
    QCase("temp_table_insert1_overwrite_partitions.q", "w17ae14",
      "select max(k) AS m from tt17_part where hr = '11'",
      duck = Some("select 2 AS m"),
      note = "per-partition overwrite targets"),
    QCase("temp_table_multi_insert_partitioned.q", "w17ae15",
      "select hr, sum(k) AS s from tt17_part group by hr",
      duck = Some("SELECT * FROM (VALUES ('11', 3), ('12', 3)) " +
        "t(hr, s)"),
      note = "fan-out across partitions sums per target"),
    QCase("temp_table_partition_date.q", "w17ae16",
      "select cast(dt as string) AS dt, count(*) AS c from " +
        "tt17_pdate group by dt",
      duck = Some("SELECT * FROM (VALUES ('2000-01-01', 1), " +
        "('2000-01-02', 2)) t(dt, c)"),
      note = "DATE-typed partition keys"),
    QCase("temp_table_partition_pruning.q", "w17ae17",
      "select i from tt17_pdate where dt = date '2000-01-01'",
      duck = Some("select 1 AS i"),
      note = "point predicate prunes to one date partition"),
    QCase("temp_table_partition_multilevels.q", "w17ae18",
      "select ds, hr, min(k) AS mn from tt17_part " +
        "group by ds, hr",
      duck = Some("SELECT * FROM (VALUES ('2008', '11', 1), " +
        "('2008', '12', 3)) t(ds, hr, mn)"),
      note = "two-level partition tree enumeration"),
    QCase("temp_table_partcols1.q", "w17ae19",
      "select ds, k from tt17_part where k = 1",
      duck = Some("select '2008' AS ds, 1 AS k"),
      note = "partition column projected beside data columns"),
    QCase("temp_table_partition_boolexpr.q", "w17ae20",
      "select count(*) AS c from tt17_part " +
        "where ds = '2008' and not (hr = '12')",
      duck = Some("select 2 AS c"),
      note = "boolean partition expression pruning"),
    QCase("temp_table_truncate.q", "w17ae21",
      "select count(*) AS c from tt17_trunc",
      duck = Some("select 0 AS c"),
      note = "TRUNCATE empties the temp table"),
    QCase("temp_table_windowing_expressions.q", "w17ae22",
      """select key, rank() over (partition by key
        |  order by value) AS r from tt17_foo
        |where cast(key as int) < 20""".stripMargin,
      duck = Some(evenDuck + """select key, rank() over (
        |  partition by key order by value) AS r from foo
        |where cast(key as int) < 20""".stripMargin),
      note = "windowing over the temp staging"),
    QCase("temp_table_options1.q", "w17ae23",
      "select count(*) AS c from tt17_foo where value like 'val_%'",
      duck = Some(evenDuck +
        "select count(*) AS c from foo where value like 'val_%'"),
      note = "tblproperties variants are metadata; the data reads " +
        "identically"),
    QCase("temp_table_partition_ctas.q", "w17ae24",
      "select part, max(k) AS m from tt17_dyn group by part",
      duck = Some("""select case when cast(key as int) % 2 = 0
        |  then 'even' else 'odd' end AS part,
        |  max(cast(key as int)) AS m
        |from qt_src where cast(key as int) < 20
        |group by 1""".stripMargin),
      note = "partitioned CTAS-shaped staging read back per " +
        "partition")
  )

  test("qtest conformance wave 17ae: the temp_table corpus — " +
      "session tables through the TEMPORARY respelling, partition " +
      "DDL/insert/join/groupby/window families") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    QtestHarness.fixtures
    setup.foreach(sparkRows)
    run("temp_table")
  }
}
