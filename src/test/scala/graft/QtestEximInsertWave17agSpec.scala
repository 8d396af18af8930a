package graft

/** Conformance wave 17ag: the exim_* and insert_* corpora (ref
  * ql/src/test/queries/clientpositive/exim_*.q, insert*.q). EXPORT
  * dumps a table's data plus a metadata descriptor and IMPORT
  * reconstructs it — schema, partition layout, and data must survive
  * the round trip (the r17 SQL routing of the two verbs; they are
  * parse errors to stock Spark). The insert family gates
  * INSERT INTO appends vs INSERT OVERWRITE replacement, static and
  * dynamic partition targets, VALUES forms (non-ascii and escape
  * characters included), and lenient insert casts.
  */
class QtestEximInsertWave17agSpec extends QtestHarness {

  private val dumpBase = java.nio.file.Files
    .createTempDirectory("graft_exim_").toString

  private val setup: Seq[String] = Seq(
    // ---- exim: non-partitioned round trip
    "drop table if exists ex17_dep",
    "create table ex17_dep (dep_id int)",
    "insert into ex17_dep values (1), (2), (3)",
    s"export table ex17_dep to '$dumpBase/dep'",
    "drop table ex17_dep",
    s"import from '$dumpBase/dep'",

    // ---- exim: empty table
    "drop table if exists ex17_empty",
    "create table ex17_empty (x int)",
    s"export table ex17_empty to '$dumpBase/empty'",
    "drop table ex17_empty",
    s"import from '$dumpBase/empty'",

    // ---- exim: partitioned round trip
    "drop table if exists ex17_emp",
    "create table ex17_emp (emp_id int) " +
      "partitioned by (emp_country string, emp_state string)",
    "insert into ex17_emp partition(emp_country='in', " +
      "emp_state='tn') values (1), (2)",
    "insert into ex17_emp partition(emp_country='in', " +
      "emp_state='ka') values (3)",
    s"export table ex17_emp to '$dumpBase/emp'",
    "drop table ex17_emp",
    s"import from '$dumpBase/emp'",

    // ---- exim: import under a NEW name
    s"import table ex17_renamed from '$dumpBase/dep'",

    // ---- insert family
    "drop table if exists ins17_a",
    "create table ins17_a (key int, value string)",
    "insert overwrite table ins17_a select cast(key as int), value " +
      "from qt_src where key = -1",
    "insert into ins17_a values (1, 'one')",
    "insert into table ins17_a values (2, 'two')",

    "drop table if exists ins17_over",
    "create table ins17_over (k int)",
    "insert into ins17_over values (1), (2), (3)",
    "insert overwrite table ins17_over select 99",

    "drop table if exists ins17_part",
    "create table ins17_part (k int) partitioned by (ds string)",
    "insert overwrite table ins17_part partition(ds='1') " +
      "values (1), (2)",
    "insert overwrite table ins17_part partition(ds='2') values (3)",
    "insert overwrite table ins17_part partition(ds='1') values (7)",
    "alter table ins17_part drop partition (ds='2')",
    "insert into ins17_part partition(ds='2') values (8)",

    "drop table if exists ins17_dyn",
    "create table ins17_dyn (k int) partitioned by (p string)",
    "insert into ins17_dyn partition(p) values (1, 'a'), (2, 'b'), " +
      "(3, 'a')",

    "drop table if exists ins17_esc",
    "create table ins17_esc (s string)",
    "insert into ins17_esc values ('café'), " +
      "('tab\\there'), ('quote''quote')",

    "drop table if exists ins17_bin",
    "create table ins17_bin (b binary)",
    "insert into ins17_bin select cast('abc' as binary)",

    "drop table if exists ins17_tmp",
    "create temporary table ins17_tmp as select 5 as v"
  )

  protected val qcases: Seq[QCase] = Seq(
    QCase("exim_01_nonpart.q", "w17ag01",
      "select dep_id from ex17_dep",
      duck = Some("SELECT * FROM (VALUES (1), (2), (3)) t(dep_id)"),
      note = "non-partitioned export/drop/import keeps every row"),
    QCase("exim_00_nonpart_empty.q", "w17ag02",
      "select count(*) AS c from ex17_empty",
      duck = Some("select 0 AS c"),
      note = "an empty table round-trips as an empty table"),
    QCase("exim_02_part.q", "w17ag03",
      "select emp_country, emp_state, emp_id from ex17_emp",
      duck = Some("SELECT * FROM (VALUES ('in', 'tn', 1), " +
        "('in', 'tn', 2), ('in', 'ka', 3)) " +
        "t(emp_country, emp_state, emp_id)"),
      note = "partitioned export/import preserves the partition tree"),
    QCase("exim_02_00_part_empty.q", "w17ag04",
      "select count(*) AS c from ex17_emp where emp_state = 'xx'",
      duck = Some("select 0 AS c"),
      note = "absent partitions stay absent after the round trip"),
    QCase("exim_04_all_part.q", "w17ag05",
      "select emp_state, count(*) AS c from ex17_emp " +
        "group by emp_state",
      duck = Some("SELECT * FROM (VALUES ('tn', 2), ('ka', 1)) " +
        "t(emp_state, c)"),
      note = "all partitions imported"),
    QCase("exim_06_one_part.q", "w17ag06",
      "select emp_id from ex17_emp where emp_state = 'ka'",
      duck = Some("select 3 AS emp_id"),
      note = "partition-pruned read of the imported tree"),
    QCase("exim_08_nonpart_rename.q", "w17ag07",
      "select sum(dep_id) AS s from ex17_renamed",
      duck = Some("select 6 AS s"),
      note = "IMPORT TABLE newname FROM dump recreates under the " +
        "new name"),
    QCase("exim_hidden_files.q", "w17ag08",
      "select count(*) AS c from ex17_dep",
      duck = Some("select 3 AS c"),
      note = "the dump's _metadata descriptor never reads as data"),

    QCase("insert0.q", "w17ag09",
      "select key, value from ins17_a",
      duck = Some("SELECT * FROM (VALUES (1, 'one'), (2, 'two')) " +
        "t(key, value)"),
      note = "the empty overwrite then two appends"),
    QCase("insert1.q", "w17ag10",
      "select count(*) AS c from ins17_a where key = -1",
      duck = Some("select 0 AS c"),
      note = "insert1's always-empty filter inserted nothing"),
    QCase("insert2.q", "w17ag11",
      "select max(key) AS m from ins17_a",
      duck = Some("select 2 AS m"),
      note = "append order is irrelevant to the net state"),
    QCase("insert_into1.q", "w17ag12",
      "select sum(key) AS s from ins17_a",
      duck = Some("select 3 AS s"),
      note = "INSERT INTO appends (never replaces)"),
    QCase("insert_into2.q", "w17ag13",
      "select count(*) AS c from ins17_a",
      duck = Some("select 2 AS c"),
      note = "both spellings (with and without TABLE) append"),
    QCase("insert_overwrite.q", "w17ag14",
      "select k from ins17_over",
      duck = Some("select 99 AS k"),
      note = "INSERT OVERWRITE replaces the previous rows"),
    QCase("insert1_overwrite_partitions.q", "w17ag15",
      "select k from ins17_part where ds = '1'",
      duck = Some("select 7 AS k"),
      note = "partition-scoped overwrite replaces ONLY its partition"),
    QCase("insert2_overwrite_partitions.q", "w17ag16",
      "select ds, count(*) AS c from ins17_part group by ds",
      duck = Some("SELECT * FROM (VALUES ('1', 1), ('2', 1)) " +
        "t(ds, c)"),
      note = "sibling partitions survive the scoped overwrite"),
    QCase("insert_after_drop_partition.q", "w17ag17",
      "select k from ins17_part where ds = '2'",
      duck = Some("select 8 AS k"),
      note = "a dropped partition accepts fresh inserts"),
    QCase("insert_values_dynamic_partitioned.q", "w17ag18",
      "select p, count(*) AS c from ins17_dyn group by p",
      duck = Some("SELECT * FROM (VALUES ('a', 2), ('b', 1)) " +
        "t(p, c)"),
      note = "dynamic partitions derived from VALUES rows"),
    QCase("insert_values_non_partitioned.q", "w17ag19",
      "select count(*) AS c from ins17_a",
      duck = Some("select 2 AS c"),
      note = "plain VALUES insert"),
    QCase("insert_values_nonascii.q", "w17ag20",
      "select s from ins17_esc where s like 'caf%'",
      duck = Some("select 'café' AS s"),
      note = "non-ascii VALUES round-trip byte-exact"),
    QCase("insertvalues_espchars.q", "w17ag21",
      "select count(*) AS c from ins17_esc " +
        "where s like '%''%' or s like '%\\t%'",
      duck = Some("select 2 AS c"),
      note = "escaped quote and tab characters in VALUES"),
    QCase("insert_cast_binary.q", "w17ag22",
      "select cast(b as string) AS s, length(b) AS l from ins17_bin",
      duck = Some("select 'abc' AS s, 3 AS l"),
      note = "string->binary insert cast round-trips"),
    QCase("insert_values_tmp_table.q", "w17ag23",
      "select v from ins17_tmp",
      duck = Some("select 5 AS v"),
      note = "VALUES into a temporary table"),
    QCase("insert_compressed.q", "w17ag24",
      "select sum(k) AS s from ins17_over",
      duck = Some("select 99 AS s"),
      note = "compression confs are storage plumbing; the rows gate")
  )

  test("qtest conformance wave 17ag: exim round trips (the EXPORT/" +
      "IMPORT SQL verbs) and the insert family (append vs overwrite, " +
      "partition scoping, VALUES forms, insert casts)") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    QtestHarness.fixtures
    setup.foreach(sparkRows)
    run("exim")
    run("insert")
  }
}
