package graft

/** Conformance wave 17am: the smb_mapjoin_* and auto_sortmerge_join_*
  * corpora (ref ql/src/test/queries/clientpositive/smb_*.q,
  * auto_sortmerge_join_*.q). The files pin Hive's sort-merge-bucket
  * join — joins over CLUSTERED/SORTED bucketed tables under every
  * hint/size/conversion knob. The physical contract (zero-Exchange
  * SPJ on co-bucketed keys) is plan-pinned by SnapshotBucketSpec and
  * the s32 oracle; what each corpus file gates HERE is the join
  * matrix's RESULTS over bucketed storage: inner/left/right/full
  * combinations, NULL keys, tables of different bucket counts,
  * 3-table chains, unions above, and partitioned+bucketed layouts.
  */
class QtestSmbWave17amSpec extends QtestHarness {

  private val setup: Seq[String] = Seq(
    "drop table if exists smb17_1",
    "create table smb17_1 (key int, value string) " +
      "CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS " +
      "STORED AS PARQUET",
    "insert into smb17_1 values (1, 'v1a'), (3, 'v3'), (4, 'v4a'), " +
      "(5, 'v5'), (10, 'v10'), (null, 'vnull1')",
    "drop table if exists smb17_2",
    "create table smb17_2 (key int, value string) " +
      "CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS " +
      "STORED AS PARQUET",
    "insert into smb17_2 values (1, 'w1'), (2, 'w2'), (4, 'w4'), " +
      "(20, 'w20'), (null, 'wnull')",
    "drop table if exists smb17_3",
    "create table smb17_3 (key int, value string) " +
      "CLUSTERED BY (key) SORTED BY (key) INTO 4 BUCKETS " +
      "STORED AS PARQUET",
    "insert into smb17_3 values (1, 'x1'), (4, 'x4'), (7, 'x7')",
    "drop table if exists smb17_p",
    "create table smb17_p (key int, value string) " +
      "partitioned by (ds string) " +
      "CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS " +
      "STORED AS PARQUET",
    "insert into smb17_p partition(ds='1') values (1, 'p1'), " +
      "(4, 'p4')",
    "insert into smb17_p partition(ds='2') values (1, 'q1')"
  )

  private val duckBase = """with smb17_1(key, value) as (VALUES
    |  (1, 'v1a'), (3, 'v3'), (4, 'v4a'), (5, 'v5'), (10, 'v10'),
    |  (CAST(NULL AS INT), 'vnull1')),
    |smb17_2(key, value) as (VALUES (1, 'w1'), (2, 'w2'), (4, 'w4'),
    |  (20, 'w20'), (CAST(NULL AS INT), 'wnull')),
    |smb17_3(key, value) as (VALUES (1, 'x1'), (4, 'x4'), (7, 'x7')),
    |smb17_p(key, value, ds) as (VALUES (1, 'p1', '1'), (4, 'p4', '1'),
    |  (1, 'q1', '2'))
    |""".stripMargin

  private def j(file: String, n: String, sql: String, note: String) =
    QCase(file, n, sql, duck = Some(duckBase + sql
      .replace("/*+mapjoin(a)*/ ", "").replace("/*+mapjoin(b)*/ ", "")),
      note = note)

  protected val qcases: Seq[QCase] = Seq(
    j("smb_mapjoin_1.q", "w17am01",
      "select /*+mapjoin(a)*/ a.key AS k1, a.value AS v1, " +
        "b.key AS k2, b.value AS v2 from smb17_1 a " +
        "join smb17_2 b on a.key = b.key",
      "inner SMB join; NULL keys never match"),
    j("smb_mapjoin_1.q", "w17am02",
      "select /*+mapjoin(a)*/ a.key AS k1, b.value AS v2 " +
        "from smb17_1 a left outer join smb17_2 b on a.key = b.key",
      "left outer keeps unmatched + NULL-keyed left rows"),
    j("smb_mapjoin_2.q", "w17am03",
      "select /*+mapjoin(b)*/ a.key AS k1, b.value AS v2 " +
        "from smb17_1 a right outer join smb17_2 b on a.key = b.key",
      "right outer under the other-side hint"),
    j("smb_mapjoin_2.q", "w17am04",
      "select a.key AS k1, a.value AS v1, b.key AS k2, " +
        "b.value AS v2 from smb17_1 a full outer join smb17_2 b " +
        "on a.key = b.key",
      "full outer: both NULL-keyed rows appear unmatched"),
    j("smb_mapjoin_3.q", "w17am05",
      "select count(*) AS c from smb17_2 a join smb17_3 b " +
        "on a.key = b.key",
      "2-bucket joined to 4-bucket (divisible counts coalesce in " +
        "the SPJ planner)"),
    j("smb_mapjoin_4.q", "w17am06",
      "select a.key AS k, b.value AS v2, c.value AS v3 " +
        "from smb17_1 a join smb17_2 b on a.key = b.key " +
        "join smb17_3 c on a.key = c.key",
      "3-table SMB chain on one key"),
    j("smb_mapjoin_5.q", "w17am07",
      "select a.key AS k, b.value AS v2, c.value AS v3 " +
        "from smb17_1 a join smb17_2 b on a.key = b.key " +
        "left outer join smb17_3 c on a.key = c.key",
      "chain with a trailing left outer"),
    j("smb_mapjoin_6.q", "w17am08",
      "select count(*) AS c, sum(a.key) AS s from smb17_1 a " +
        "join smb17_2 b on a.key = b.key",
      "aggregate above the SMB join"),
    j("smb_mapjoin_7.q", "w17am09",
      "select a.key AS k1, b.key AS k2 from smb17_1 a " +
        "full outer join smb17_2 b on a.key = b.key " +
        "where a.key is null or b.key is null",
      "full outer filtered to the unmatched fringe"),
    j("smb_mapjoin_8.q", "w17am10",
      "select count(*) AS c from smb17_1 a join smb17_3 b " +
        "on a.key = b.key where a.key > 1",
      "filtered SMB join"),
    j("smb_mapjoin9.q", "w17am11",
      "select b.key AS k, count(*) AS c from smb17_1 a " +
        "join smb17_2 b on a.key = b.key group by b.key",
      "grouped on the probe side's key"),
    QCase("smb_mapjoin_10.q", "w17am12",
      "select a.key AS k from smb17_1 a left semi join smb17_2 b " +
        "on a.key = b.key",
      duck = Some(duckBase +
        "select a.key AS k from smb17_1 a where exists " +
        "(select 1 from smb17_2 b where a.key = b.key)"),
      note = "LEFT SEMI over bucketed tables (EXISTS twin)"),
    j("smb_mapjoin_11.q", "w17am13",
      "select count(distinct a.value) AS c from smb17_1 a " +
        "join smb17_2 b on a.key = b.key",
      "distinct aggregate above the join"),
    j("smb_mapjoin_12.q", "w17am14",
      "select a.key AS k, a.value AS v from smb17_1 a " +
        "where a.key in (select key from smb17_2)",
      "IN-subquery against the bucketed dim"),
    j("smb_mapjoin_13.q", "w17am15",
      "select a.key AS k1, b.key AS k2 from smb17_1 a " +
        "join smb17_2 b on a.key = b.key and a.key < 5",
      "range residue inside the ON"),
    j("smb_mapjoin_14.q", "w17am16",
      "select count(*) AS c from (select key from smb17_1 " +
        "union all select key from smb17_2) u join smb17_3 c " +
        "on u.key = c.key",
      "union above, bucketed probe below"),
    j("smb_mapjoin_15.q", "w17am17",
      "select a.key AS k, a.value AS v1, b.value AS v2 " +
        "from smb17_1 a join smb17_2 b on a.key = b.key " +
        "order by a.key, b.value",
      "ordered read of the join (sorted buckets feed the sort)"),
    j("smb_mapjoin_16.q", "w17am18",
      "select max(a.key) AS m from smb17_1 a join smb17_2 b " +
        "on a.key = b.key",
      "single-aggregate probe"),
    j("smb_mapjoin_17.q", "w17am19",
      "select count(*) AS c from smb17_1 a " +
        "join smb17_2 b on a.key = b.key " +
        "join smb17_2 c on a.key = c.key " +
        "join smb17_2 d on a.key = d.key",
      "the many-way self-chain (the file stacks 8 joins)"),
    j("smb_mapjoin_18.q", "w17am20",
      "select key, count(*) AS c from smb17_1 group by key",
      "bucketed-table scan + group (the file's insert-churn " +
        "staging distilled)"),
    j("smb_mapjoin_19.q", "w17am21",
      "select count(*) AS c from smb17_p where ds = '1'",
      "partitioned + bucketed partition read"),
    j("smb_mapjoin_20.q", "w17am22",
      "select a.key AS k, a.ds AS ds, b.value AS v " +
        "from smb17_p a join smb17_2 b on a.key = b.key",
      "partitioned-bucketed joined to flat-bucketed"),
    j("smb_mapjoin_21.q", "w17am23",
      "select count(*) AS c from smb17_1 a join smb17_1 b " +
        "on a.key = b.key",
      "bucketed self-join"),
    j("smb_mapjoin_22.q", "w17am24",
      "select a.key AS k from smb17_1 a join smb17_3 b " +
        "on a.key = b.key where b.value = 'x4'",
      "dim-filtered SMB join"),
    j("smb_join_after_union.q", "w17am25",
      "select u.key AS k, count(*) AS c from " +
        "(select key from smb17_1 union all " +
        " select key from smb17_2) u " +
        "join smb17_3 t on u.key = t.key group by u.key",
      "join after the union of two bucketed scans"),
    j("smb_join_partition_key.q", "w17am26",
      "select ds, count(*) AS c from smb17_p a " +
        "join smb17_1 b on a.key = b.key group by ds",
      "grouping on the partition key above the bucketed join"),
    j("smb_join_with_different_bucket_size.q", "w17am27",
      "select count(*) AS c from smb17_1 a join smb17_3 b " +
        "on a.key = b.key",
      "2 vs 4 buckets join correctly (coalesce or shuffle, same " +
        "rows)"),
    j("smb_cache.q", "w17am28",
      "select count(*) AS c1 from smb17_1 a join smb17_2 b " +
        "on a.key = b.key",
      "repeated SMB probes share hashtables in Hive; results gate"),

    j("auto_sortmerge_join_1.q", "w17am29",
      "select count(*) AS c from smb17_1 a join smb17_2 b " +
        "on a.key = b.key",
      "auto-conversion twin of the inner matrix"),
    j("auto_sortmerge_join_2.q", "w17am30",
      "select count(*) AS c from smb17_1 a left outer join " +
        "smb17_2 b on a.key = b.key",
      "auto-converted left outer"),
    j("auto_sortmerge_join_3.q", "w17am31",
      "select count(*) AS c from smb17_1 a right outer join " +
        "smb17_2 b on a.key = b.key",
      "auto-converted right outer"),
    j("auto_sortmerge_join_4.q", "w17am32",
      "select count(*) AS c from smb17_2 a join smb17_3 b " +
        "on a.key = b.key",
      "small-big bucket-count pair"),
    j("auto_sortmerge_join_5.q", "w17am33",
      "select count(*) AS c from smb17_3 a join smb17_p b " +
        "on a.key = b.key",
      "bucketed against partitioned-bucketed"),
    j("auto_sortmerge_join_6.q", "w17am34",
      "select count(*) AS c from smb17_1 a join smb17_2 b " +
        "on a.key = b.key join smb17_3 c on a.key = c.key",
      "3-way auto conversion"),
    j("auto_sortmerge_join_7.q", "w17am35",
      "select count(*) AS c from smb17_p a join smb17_2 b " +
        "on a.key = b.key where a.ds = '1'",
      "partition-pruned bucketed side"),
    j("auto_sortmerge_join_8.q", "w17am36",
      "select count(*) AS c from smb17_p a join smb17_2 b " +
        "on a.key = b.key",
      "both partitions of the bucketed fact"),
    j("auto_sortmerge_join_9.q", "w17am37",
      "select a.key AS k, count(*) AS c from smb17_1 a " +
        "join smb17_2 b on a.key = b.key group by a.key",
      "the subquery/aggregate battery's core shape"),
    j("auto_sortmerge_join_10.q", "w17am38",
      "select count(*) AS c from (select key from smb17_1 " +
        "where key < 6) a join (select key from smb17_2 " +
        "where key < 6) b on a.key = b.key",
      "filtered subqueries above bucketed scans"),
    j("auto_sortmerge_join_11.q", "w17am39",
      "select count(*) AS c from smb17_1 a join smb17_3 b " +
        "on a.key = b.key join smb17_2 c on a.key = c.key",
      "mixed bucket counts across the chain"),
    j("auto_sortmerge_join_12.q", "w17am40",
      "select count(*) AS c from smb17_1 a join smb17_2 b " +
        "on a.key = b.key join smb17_3 c on b.key = c.key",
      "the middle table carries the second key"),
    j("auto_sortmerge_join_13.q", "w17am41",
      "select a.key AS k1, b.key AS k2 from smb17_1 a " +
        "join smb17_2 b on a.key = b.key order by k1",
      "projected both keys, ordered"),
    j("auto_sortmerge_join_14.q", "w17am42",
      "select count(*) AS c from smb17_1 a left outer join " +
        "smb17_3 b on a.key = b.key where b.key is null",
      "anti-shaped outer over buckets"),
    j("auto_sortmerge_join_15.q", "w17am43",
      "select count(*) AS c from smb17_1 a right outer join " +
        "smb17_3 b on a.key = b.key where a.key is null",
      "reverse anti shape"),
    j("auto_sortmerge_join_16.q", "w17am44",
      "select a.key AS k, b.value AS v from smb17_1 a " +
        "join smb17_2 b on a.key = b.key where a.value > 'v1'",
      "probe-side residual filter"),
    j("auto_sortmerge_join_17.q", "w17am45",
      "select count(*) AS c from smb17_1 a join smb17_2 b " +
        "on a.key = b.key join smb17_2 c on a.key = c.key " +
        "join smb17_2 d on a.key = d.key join smb17_2 e " +
        "on a.key = e.key",
      "the 16-way-join file's shape at depth 5"),
    j("auto_sortmerge_join_18.q", "w17am46",
      "select count(*) AS c from (select key, count(*) cnt from " +
        "smb17_1 group by key) a join smb17_2 b on a.key = b.key",
      "aggregate below the bucketed join")
  )

  test("qtest conformance wave 17am: the SMB and auto-sortmerge join " +
      "corpora — the join matrix over CLUSTERED/SORTED bucketed " +
      "tables (results; the zero-Exchange physical contract is " +
      "SnapshotBucketSpec's)") {
    assume(QtestHarness.haveRef,
      "/root/reference fixture data not present")
    QtestHarness.fixtures
    setup.foreach(sparkRows)
    run("smb_")
    run("auto_sortmerge_join")
  }
}
