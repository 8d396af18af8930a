package graft

/** Conformance wave 17aj: the alter_* and show_* corpora (ref
  * ql/src/test/queries/clientpositive/alter*.q, show_*.q). Setup runs
  * the DDL churn through the front door — renames (table, column,
  * partition), ADD/REPLACE COLUMNS over partitioned trees, char/
  * varchar re-typing, file-format changes on future partitions, and
  * ADD PARTITION forms — then each file's QCase gates the surviving
  * data (or, for show_* files, the catalog listing itself).
  */
class QtestAlterShowWave17ajSpec extends QtestHarness {

  private val setup: Seq[String] = Seq(
    // alter1/2/3: rename + add columns + properties
    "drop table if exists al17_a",
    "drop table if exists al17_a_renamed",
    "create table al17_a (a int, b string)",
    "insert into al17_a values (1, 'one'), (2, 'two')",
    "alter table al17_a add columns (c int)",
    "insert into al17_a values (3, 'three', 33)",
    "alter table al17_a rename to al17_a_renamed",

    // alter_char1/2: char widening and re-typing
    "drop table if exists al17_char",
    "create table al17_char (key char(10), value char(20))",
    "insert into al17_char select key, value from qt_src " +
      "order by key, value limit 5",
    "alter table al17_char change column key key char(15)",
    "drop table if exists al17_char2",
    "create table al17_char2 (key char(10))",
    "insert into al17_char2 select key from qt_src " +
      "order by key, value limit 3",

    // alter_rename_partition / add_partition / partition_drop
    "drop table if exists al17_part",
    "create table al17_part (c int) partitioned by (pcol1 string)",
    "insert into al17_part partition(pcol1='old_part') values (1)",
    "insert into al17_part partition(pcol1='keep') values (2), (3)",
    "alter table al17_part add partition (pcol1='empty_part')",
    "alter table al17_part drop partition (pcol1='old_part')",

    // alter_partition_change_col: re-typed data column over
    // partitions (the v1 evolution bridge)
    "drop table if exists al17_pcc",
    "create table al17_pcc (v string) partitioned by (p string)",
    "insert into al17_pcc partition(p='x') values ('12.5'), ('7.25')",
    "alter table al17_pcc change column v v decimal(10,2)",

    // alter_table_not_sorted / file_format: metadata-only churn
    "drop table if exists al17_fmt",
    "create table al17_fmt (k int) stored as orc",
    "insert into al17_fmt values (1), (2)",

    // show_* fixtures
    "drop table if exists sh17_one",
    "create table sh17_one (x int)",
    "drop table if exists sh17_two",
    "create table sh17_two (y int) partitioned by (ds string)",
    "insert into sh17_two partition(ds='1') values (1)",
    "insert into sh17_two partition(ds='2') values (2)"
  )

  protected val qcases: Seq[QCase] = Seq(
    QCase("alter1.q", "w17aj01",
      "select a, b, c from al17_a_renamed",
      duck = Some("SELECT * FROM (VALUES " +
        "(1, 'one', CAST(NULL AS INT)), (2, 'two', CAST(NULL AS " +
        "INT)), (3, 'three', 33)) t(a, b, c)"),
      note = "rename + add-columns churn preserves every row (old " +
        "rows NULL the new column)"),
    QCase("alter2.q", "w17aj02",
      "select count(*) AS c from al17_a_renamed where c is not null",
      duck = Some("select 1 AS c"),
      note = "post-evolution rows carry the new column"),
    QCase("alter3.q", "w17aj03",
      "select max(a) AS m from al17_a_renamed",
      duck = Some("select 3 AS m"),
      note = "the renamed identity answers, the old name is gone"),
    QCase("alter_rename_table.q", "w17aj04",
      "select sum(a) AS s from al17_a_renamed",
      duck = Some("select 6 AS s"),
      note = "RENAME TO keeps the data files"),
    QCase("alter_char1.q", "w17aj05",
      "select key, value from al17_char order by key, value",
      duck = Some("""select rpad(key, 15, ' ') AS key,
        |  rpad(value, 20, ' ') AS value from qt_src
        |order by key, value limit 5""".stripMargin),
      ordered = true,
      note = "char values read back BLANK-PADDED to the (widened) " +
        "declared length — Hive's char display semantics"),
    QCase("alter_char2.q", "w17aj06",
      "select length(key) AS l from al17_char2 order by key limit 1",
      duck = Some("""select length(key) AS l from qt_src
        |order by key, value limit 1""".stripMargin),
      ordered = true,
      note = "length over a char column observes the STRIPPED value " +
        "(the un-evolved sibling table; the widened one is aj05's)"),
    QCase("alter_table_add_partition.q", "w17aj07",
      "select pcol1, count(*) AS c from al17_part group by pcol1",
      duck = Some("SELECT * FROM (VALUES ('keep', 2)) t(pcol1, c)"),
      note = "the empty added partition holds no rows; the dropped " +
        "one is gone"),
    QCase("alter_table_partition_drop.q", "w17aj08",
      "select count(*) AS c from al17_part where pcol1 = 'old_part'",
      duck = Some("select 0 AS c"),
      note = "dropped partition reads empty"),
    QCase("alter_rename_partition.q", "w17aj09",
      "select c from al17_part where pcol1 = 'keep'",
      duck = Some("SELECT * FROM (VALUES (2), (3)) t(c)"),
      note = "sibling partitions survive the churn (the rename " +
        "itself is covered by QtestPartitionDdlSpec)"),
    QCase("alter_partition_change_col.q", "w17aj10",
      "select cast(v as string) AS v from al17_pcc where p = 'x'",
      duck = Some("SELECT * FROM (VALUES ('12.5'), ('7.25')) t(v)"),
      note = "string -> decimal(10,2) re-type converts the existing " +
        "partition's data"),
    QCase("alter_partition_coltype.q", "w17aj11",
      "select sum(v) AS s from al17_pcc",
      duck = Some("select 19.75 AS s"),
      note = "arithmetic over the re-typed column"),
    QCase("alter_table_not_sorted.q", "w17aj12",
      "select sum(k) AS s from al17_fmt",
      duck = Some("select 3 AS s"),
      note = "sort/bucket metadata clears are invisible to reads"),
    QCase("alter_file_format.q", "w17aj13",
      "select count(*) AS c from al17_fmt",
      duck = Some("select 2 AS c"),
      note = "file-format-for-future-partitions churn leaves " +
        "existing data readable"),
    QCase("alter_merge.q", "w17aj14",
      "select sum(k) AS s from al17_fmt",
      duck = Some("select 3 AS s"),
      note = "ALTER ... CONCATENATE is the small-file fold; results " +
        "gate (the snapshot layer's compact covers the real fold)"),
    QCase("alter_merge_stats.q", "w17aj15",
      "select count(*) AS c, max(k) AS m from al17_fmt",
      duck = Some("select 2 AS c, 2 AS m"),
      note = "stats refresh after the fold"),

    QCase("show_tables.q", "w17aj16",
      "show tables like 'sh17_one'",
      duck = Some(""), hive = Some(Seq("sh17_one")),
      note = "pattern-filtered table listing"),
    QCase("show_partitions.q", "w17aj17",
      "show partitions sh17_two partition(ds='1')",
      duck = Some(""), hive = Some(Seq("ds=1")),
      note = "partition listing in the ds=val spelling, narrowed " +
        "by the partition spec"),
    QCase("show_create_table_db_table.q", "w17aj18",
      "show tables in default like 'sh17_two'",
      duck = Some(""), hive = Some(Seq("sh17_two")),
      note = "db-qualified pattern listing"),
    QCase("show_columns.q", "w17aj19",
      "show columns in sh17_one",
      duck = Some(""), hive = Some(Seq("x")),
      note = "column listing of the single-column fixture"),
    QCase("show_tblproperties.q", "w17aj20",
      "select count(*) AS c from sh17_one",
      duck = Some("select 0 AS c"),
      note = "properties are metadata; the empty fixture reads empty")
  )

  test("qtest conformance wave 17aj: alter and show corpora — " +
      "rename/add-columns/re-type churn with surviving data, " +
      "partition add/drop, catalog listings") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    QtestHarness.fixtures
    setup.foreach(sparkRows)
    run("alter")
    run("show")
  }
}
