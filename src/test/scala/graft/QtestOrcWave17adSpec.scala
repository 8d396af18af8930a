package graft

/** Conformance wave 17ad: the orc_* corpus (ref ql/src/test/queries/
  * clientpositive/orc_*.q). Three groups:
  *
  *  1. STRIPE-STATS fixtures — orc_split_elim.orc's .q.out-pinned
  *     reads (split elimination is the scan's min/max pruning; the
  *     results must be identical either way),
  *  2. CALENDAR interop — the legacy (hybrid-Julian writer) and
  *     modern (proleptic writer) mixed-date/timestamp ORC files: the
  *     r17 hybrid-calendar pinning must reproduce the reference's
  *     wall-clock values for pre-Gregorian dates,
  *  3. ROUND TRIPS — the merge battery (orc_merge1-13/incompat:
  *     small-file concatenation is plumbing, the results over
  *     multi-insert partitions gate), complex creates, CTAS, empty
  *     edges, int-type promotion, and repeated map keys.
  */
class QtestOrcWave17adSpec extends QtestHarness {

  private def orc(file: String) =
    s"orc.`/root/reference/data/files/$file`"

  private val sample5 =
    "select cast(key as int) AS key, value from qt_src " +
      "order by cast(key as int), value limit 5"
  private val duckSample5 =
    """with s as (select cast(key as int) AS key, value from qt_src
      |  order by cast(key as int), value limit 5),
      |t as (select * from s union all select * from s
      |      union all select * from s)
      |""".stripMargin

  private val setup: Seq[String] = Seq(
    "drop table if exists orcm17",
    "create table orcm17 (key int, value string) " +
      "partitioned by (ds string) stored as orc",
    s"insert into orcm17 partition(ds='1') $sample5",
    s"insert into orcm17 partition(ds='1') $sample5",
    s"insert into orcm17 partition(ds='1') $sample5",

    "drop table if exists orc17_complex",
    "create table orc17_complex (str string, mp map<string,string>, " +
      "lst array<string>, strct struct<a:string,b:string>) " +
      "stored as orc",
    "insert into orc17_complex select 'line1', map('k1','v1'), " +
      "array('a','b'), named_struct('a','one','b','two')",

    "drop table if exists orc17_ctas",
    s"create table orc17_ctas stored as orc as $sample5",

    "drop table if exists orc17_empty",
    "create table orc17_empty (k int, v string) stored as orc",

    "drop table if exists orc17_estr",
    "create table orc17_estr (s string) stored as orc",
    "insert into orc17_estr values (''), (''), ('x'), (null)",

    "drop table if exists orc17_nulltail",
    "create table orc17_nulltail (a int, b string) stored as orc",
    "insert into orc17_nulltail values (1, 'x'), (2, null), " +
      "(3, null)",

    "drop table if exists orc17_promote",
    "create table orc17_promote (a int, b smallint) stored as orc",
    "insert into orc17_promote values (100, 20), (2000000000, 30)",
    "alter table orc17_promote change column a a bigint",
    "alter table orc17_promote change column b b int",

    "drop table if exists orc17_mapkey",
    "create table orc17_mapkey (m map<string,int>) stored as orc",
    "insert into orc17_mapkey select map('rep', 1)",
    "insert into orc17_mapkey select map('rep', 2)",

    "drop table if exists orc17_diffpart",
    "create table orc17_diffpart (k int, v string) " +
      "partitioned by (ds string) stored as orc",
    "insert into orc17_diffpart partition(ds='a') values (1, 'x')",
    "alter table orc17_diffpart add columns (extra int)",
    "insert into orc17_diffpart partition(ds='b') values " +
      "(2, 'y', 42)"
  )

  private def mergeCase(file: String, i: Int, sql: String,
      duckSql: String, note: String) =
    QCase(file, f"w17ad_m$i%02d", sql, duck = Some(duckSql), note = note)

  private val mergeFiles = Seq(
    "orc_merge1.q", "orc_merge2.q", "orc_merge3.q", "orc_merge4.q",
    "orc_merge5.q", "orc_merge6.q", "orc_merge7.q", "orc_merge8.q",
    "orc_merge9.q", "orc_merge10.q", "orc_merge11.q", "orc_merge12.q",
    "orc_merge13.q", "orc_merge_diff_fs.q", "orc_merge_incompat1.q",
    "orc_merge_incompat2.q", "orc_merge_incompat3.q")

  protected val qcases: Seq[QCase] =
    // merge battery: three small inserts, selects must answer the
    // tripled sample whatever the file-merge knobs did
    mergeFiles.zipWithIndex.map { case (f, i) =>
      val variant = i % 4 match {
        case 0 => ("select count(*) AS c, sum(key) AS s from orcm17",
          duckSample5 + "select count(*) AS c, sum(key) AS s from t")
        case 1 => ("select key, count(*) AS c from orcm17 " +
          "group by key",
          duckSample5 + "select key, count(*) AS c from t " +
            "group by key")
        case 2 => ("select count(distinct value) AS c from orcm17",
          duckSample5 + "select count(distinct value) AS c from t")
        case _ => ("select ds, count(*) AS c from orcm17 group by ds",
          duckSample5 + "select '1' AS ds, count(*) AS c from t")
      }
      mergeCase(f, i, variant._1, variant._2,
        "small-file merge variant: results identical over the " +
          "tripled 5-row partition")
    } ++ Seq(

    QCase("orc_split_elimination.q", "w17ad01",
      s"select count(*) AS c from ${orc("orc_split_elim.orc")} " +
        "where userid <= 0",
      duck = Some(""), hive = Some(Seq("0")),
      note = "below every stripe minimum: zero rows (and zero " +
        "stripes read)"),
    QCase("orc_split_elimination.q", "w17ad02",
      "select userid, string1, subtype, decimal1, " +
        "cast(ts as string) AS ts " +
        s"from ${orc("orc_split_elim.orc")} where userid <= 2",
      duck = Some(""),
      hive = Some(Seq("2", "foo", "0.8", "1", "1969-12-31 16:00:00")),
      note = "one stripe survives; ORC reproduces the writer's " +
        "wall-clock timestamp in any session zone"),
    QCase("orc_split_elimination.q", "w17ad03",
      "select count(*) AS c, min(string1) AS mn, max(string1) AS mx " +
        s"from ${orc("orc_split_elim.orc")} where userid <= 5",
      duck = Some(""), hive = Some(Seq("2", "eat", "foo")),
      note = "two stripes' minimum rows"),

    QCase("orc_legacy_mixed_date.q", "w17ad04",
      "select count(*) AS c, min(cast(d as string)) AS mn, " +
        "max(cast(d as string)) AS mx " +
        s"from ${orc("orc_legacy_mixed_dates.orc")} t(d)",
      duck = Some(""),
      hive = Some(Seq("8", "0200-02-11", "8200-02-11")),
      note = "HYBRID-calendar writer: pre-Gregorian dates read back " +
        "in Julian wall-clock (0200-02-11 stays 0200-02-11 — the " +
        "r17 hybrid pinning; a proleptic read would shift it)"),
    QCase("orc_legacy_mixed_timestamp.q", "w17ad05",
      "select count(*) AS c, min(cast(ts as string)) AS mn, " +
        "max(cast(ts as string)) AS mx " +
        s"from ${orc("orc_legacy_mixed_timestamps.orc")} t(ts)",
      duck = Some(""),
      hive = Some(Seq("8", "0200-02-11 07:08:09.123",
        "8200-02-11 07:08:09.123")),
      note = "legacy timestamps keep the writer's wall clock across " +
        "the calendar boundary"),

    QCase("orc_create.q", "w17ad06",
      "select str, cast(mp as string) AS m, cast(lst as string) " +
        "AS l, cast(strct as string) AS s from orc17_complex",
      duck = Some("""SELECT 'line1' AS str, '{"k1":"v1"}' AS m,
        |  '["a","b"]' AS l, '{"a":"one","b":"two"}' AS s"""
        .stripMargin),
      note = "complex types through ORC storage"),
    QCase("orc_createas1.q", "w17ad07",
      "select key, value from orc17_ctas",
      duck = Some("""select cast(key as int) AS key, value from qt_src
        |order by cast(key as int), value limit 5""".stripMargin),
      note = "CTAS INTO orc preserves the sample"),
    QCase("orc_empty_table.q", "w17ad08",
      "select count(*) AS c, max(k) AS m from orc17_empty",
      duck = Some("select 0 AS c, CAST(NULL AS INT) AS m"),
      note = "aggregates over a zero-file ORC table"),
    QCase("orc_empty_files.q", "w17ad09",
      "select count(*) AS c from orc17_empty where k > 0",
      duck = Some("select 0 AS c"),
      note = "filtered scan of the empty table"),
    QCase("orc_empty_strings.q", "w17ad10",
      "select s, count(*) AS c from orc17_estr group by s",
      duck = Some("SELECT * FROM (VALUES ('', 2), ('x', 1), " +
        "(CAST(NULL AS VARCHAR), 1)) t(s, c)"),
      note = "empty string is NOT null through ORC (dictionary edge)"),
    QCase("orc_ends_with_nulls.q", "w17ad11",
      "select a, b from orc17_nulltail",
      duck = Some("SELECT * FROM (VALUES (1, 'x'), " +
        "(2, CAST(NULL AS VARCHAR)), (3, CAST(NULL AS VARCHAR))) " +
        "t(a, b)"),
      note = "trailing null run in the stripe"),
    QCase("orc_int_type_promotion.q", "w17ad12",
      "select a, b from orc17_promote",
      duck = Some("SELECT * FROM (VALUES (100, 20), " +
        "(2000000000, 30)) t(a, b)"),
      note = "int->bigint and smallint->int promotion reads the old " +
        "stripes through the widened schema"),
    QCase("orc_map_key_repeating.q", "w17ad13",
      "select cast(m as string) AS m from orc17_mapkey",
      duck = Some("SELECT * FROM (VALUES ('{\"rep\":1}'), " +
        "('{\"rep\":2}')) t(m)"),
      note = "the same map key repeated across rows (dictionary " +
        "repetition edge)"),
    QCase("orc_diff_part_cols.q", "w17ad14",
      "select k, v, extra, ds from orc17_diffpart",
      duck = Some("SELECT * FROM (VALUES " +
        "(1, 'x', CAST(NULL AS INT), 'a'), (2, 'y', 42, 'b')) " +
        "t(k, v, extra, ds)"),
      note = "partitions written under DIFFERENT schema versions " +
        "read under the latest"),
    QCase("orc_diff_part_cols2.q", "w17ad15",
      "select ds, count(extra) AS c from orc17_diffpart group by ds",
      duck = Some("SELECT * FROM (VALUES ('a', 0), ('b', 1)) " +
        "t(ds, c)"),
      note = "aggregating the column absent from the old partition"),
    QCase("orc_dictionary_threshold.q", "w17ad16",
      "select count(distinct value) AS c from orcm17",
      duck = Some(duckSample5 +
        "select count(distinct value) AS c from t"),
      note = "dictionary-vs-direct encoding threshold is storage " +
        "plumbing; the distinct set gates")
  )

  test("qtest conformance wave 17ad: the orc corpus — split-stats " +
      "fixtures, hybrid-calendar interop, the merge battery, and " +
      "storage round trips") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    QtestHarness.fixtures
    setup.foreach(sparkRows)
    run("orc")
  }
}
