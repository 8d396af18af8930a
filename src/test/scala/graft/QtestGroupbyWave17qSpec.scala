package graft

/** Conformance wave 17q: the groupby1–13 conf-variant battery plus the
  * quick semantic files (ref ql/src/test/queries/clientpositive/
  * groupby*.q). The `_map`/`_map_skew`/`_noskew`/`_map_nomap`/
  * `_multi_single_reducer` variants run the SAME query under Hive's
  * `hive.map.aggr` / `hive.groupby.skewindata` /
  * `hive.multigroupby.singlereducer` execution knobs — pure engine
  * plumbing (Spark's partial/final hash aggregate subsumes all of
  * them); what each file gates is that the variant answers identically,
  * which is exactly the distilled result check here. Multi-insert files
  * (7/8/9/10/11) drop to the SELECTs they fan out.
  *
  * Semantic files in the wave: duplicate group keys (groupby13.q,
  * groupby_duplicate_key.q), alias shadowing a grouping column
  * (groupby_multialias.q), constant keys (groupby_neg_float.q,
  * groupby_constcolval.q), GROUP BY () over non-empty input
  * (groupby_empty.q), DISTINCT-agg over the group key itself
  * (groupby_distinct_samekey.q), HAVING on a distinct count
  * (groupby_having_distinct.q), qualified-vs-output-name resolution in
  * HAVING/window (groupby_resolution.q), and WITH CUBE GROUPING__ID
  * over string keys (groupby_grouping_id1.q).
  */
class QtestGroupbyWave17qSpec extends QtestHarness {

  private val V5 = "CAST(substr(value, 5) AS DOUBLE)"

  // groupby1's shape (files differ only in exec confs)
  private def g1(f: String, n: String, note: String) = QCase(f, n,
    s"SELECT key, sum($V5) AS s FROM qt_src GROUP BY key", note = note)

  // groupby2's shape
  private def g2(f: String, n: String, note: String) = QCase(f, n,
    s"""SELECT substr(key, 1, 1) AS k1,
       |  count(DISTINCT substr(value, 5)) AS c1, sum($V5) AS s1,
       |  concat(substr(key, 1, 1), CAST(sum($V5) AS STRING)) AS cc
       |FROM qt_src GROUP BY substr(key, 1, 1)""".stripMargin,
    duck = Some(s"""SELECT substr(key, 1, 1) AS k1,
       |  count(DISTINCT substr(value, 5)) AS c1, sum($V5) AS s1,
       |  concat(substr(key, 1, 1), CAST(sum($V5) AS VARCHAR)) AS cc
       |FROM qt_src GROUP BY substr(key, 1, 1)""".stripMargin),
    note = note)

  // groupby2's multi-distinct extension
  private def g2md(f: String, n: String, note: String) = QCase(f, n,
    s"""SELECT substr(key, 1, 1) AS k1,
       |  count(DISTINCT substr(value, 5)) AS c1, sum($V5) AS s1,
       |  sum(DISTINCT $V5) AS sd, count(value) AS cv
       |FROM qt_src GROUP BY substr(key, 1, 1)""".stripMargin, note = note)

  // groupby3's aggregate battery (+ the multi_distinct columns)
  private def g3(f: String, n: String, md: Boolean, note: String) = {
    val extra = if (md) s", sum(DISTINCT $V5) AS c10, " +
      s"count(DISTINCT substr(value, 5)) AS c11" else ""
    QCase(f, n,
      s"""SELECT sum($V5) AS c1, avg($V5) AS c2, avg(DISTINCT $V5) AS c3,
         |  max($V5) AS c4, min($V5) AS c5, std($V5) AS c6,
         |  stddev_samp($V5) AS c7, variance($V5) AS c8,
         |  var_samp($V5) AS c9$extra
         |FROM qt_src""".stripMargin,
      duck = Some(
        s"""SELECT sum($V5) AS c1, avg($V5) AS c2, avg(DISTINCT $V5) AS c3,
           |  max($V5) AS c4, min($V5) AS c5, stddev_pop($V5) AS c6,
           |  stddev_samp($V5) AS c7, var_pop($V5) AS c8,
           |  var_samp($V5) AS c9$extra
           |FROM qt_src""".stripMargin),
      note = note)
  }

  private def g4(f: String, n: String) = QCase(f, n,
    "SELECT substr(key, 1, 1) AS c1 FROM qt_src " +
      "GROUP BY substr(key, 1, 1)",
    note = "groupby4's shape under exec-conf variants")

  private def g6(f: String, n: String) = QCase(f, n,
    "SELECT DISTINCT substr(value, 5, 1) AS c1 FROM qt_src",
    note = "groupby6's shape under exec-conf variants")

  // groupby7/8's multi-insert fan-out legs (both identical selects)
  private def g7(f: String, n: String, note: String) = QCase(f, n,
    s"SELECT key, sum($V5) AS s FROM qt_src GROUP BY key", note = note)

  // groupby9/nocolumnalign: count(DISTINCT) under composite keys
  private def g9a(f: String, n: String) = QCase(f, n,
    "SELECT key, count(DISTINCT substr(value, 5)) AS c FROM qt_src " +
      "GROUP BY key",
    note = "multi-insert leg 1: distinct count per key")
  private def g9b(f: String, n: String, swapped: Boolean) = QCase(f, n,
    "SELECT key, value, count(DISTINCT substr(value, 5)) AS c " +
      "FROM qt_src GROUP BY " +
      (if (swapped) "value, key" else "key, value"),
    note = "multi-insert leg 2: composite key" +
      (if (swapped) " in swapped GROUP BY order" else ""))

  protected val qcases: Seq[QCase] = Seq(
    g1("groupby1_map.q", "w17q01", "map-side aggregation on"),
    g1("groupby1_map_nomap.q", "w17q02", "map.aggr on, mapred off"),
    g1("groupby1_map_skew.q", "w17q03", "skewindata two-stage plan"),
    g1("groupby1_noskew.q", "w17q04", "reduce-side only"),
    g1("groupby5_map.q", "w17q05", "groupby5 = groupby1's query"),
    g1("groupby5_map_skew.q", "w17q06", "skew variant"),
    g1("groupby5_noskew.q", "w17q07", "noskew variant"),

    QCase("groupby1_limit.q", "w17q08",
      s"SELECT key, sum($V5) AS s FROM qt_src GROUP BY key " +
        "ORDER BY key LIMIT 5",
      ordered = true,
      note = "limit over the aggregate (the file's second, " +
        "deterministic ORDER BY form)"),
    QCase("groupby2_limit.q", "w17q09",
      s"SELECT key, sum($V5) AS s FROM qt_src GROUP BY key " +
        "ORDER BY key LIMIT 5",
      ordered = true,
      note = "identical deterministic limit form"),

    g2("groupby2_map.q", "w17q10", "map-side agg with the concat " +
      "column (double renders '.0'-suffixed in both engines)"),
    g2("groupby2_map_skew.q", "w17q11", "skew two-stage"),
    g2("groupby2_noskew.q", "w17q12", "reduce-side only"),
    g2md("groupby2_map_multi_distinct.q", "w17q13",
      "two DISTINCT aggregates + a plain count in one GROUP BY"),
    g2md("groupby2_noskew_multi_distinct.q", "w17q14",
      "multi-distinct without skew handling"),

    g3("groupby3_map.q", "w17q15", md = false,
      "the 9-aggregate battery, map-side"),
    g3("groupby3_map_skew.q", "w17q16", md = false, "skew variant"),
    g3("groupby3_noskew.q", "w17q17", md = false, "noskew variant"),
    g3("groupby3_map_multi_distinct.q", "w17q18", md = true,
      "battery + sum(DISTINCT)/count(DISTINCT) columns"),
    g3("groupby3_noskew_multi_distinct.q", "w17q19", md = true,
      "multi-distinct, reduce-side"),

    g4("groupby4_map.q", "w17q20"),
    g4("groupby4_map_skew.q", "w17q21"),
    g4("groupby4_noskew.q", "w17q22"),
    g6("groupby6_map.q", "w17q23"),
    g6("groupby6_map_skew.q", "w17q24"),
    g6("groupby6_noskew.q", "w17q25"),

    g7("groupby7.q", "w17q26",
      "multi-insert of the same aggregate into two sinks"),
    g7("groupby7_map.q", "w17q27", "map-side variant"),
    g7("groupby7_map_multi_single_reducer.q", "w17q28",
      "single-reducer multi-GBY plan"),
    g7("groupby7_map_skew.q", "w17q29", "skew variant"),
    g7("groupby7_noskew.q", "w17q30", "noskew variant"),
    g7("groupby7_noskew_multi_single_reducer.q", "w17q31",
      "noskew single-reducer"),
    g7("groupby8_map.q", "w17q32",
      "groupby8: key-leg and value-leg fan-out (key leg here)"),
    g7("groupby8_map_skew.q", "w17q33", "skew variant"),
    g7("groupby8_noskew.q", "w17q34", "noskew variant"),

    g9a("groupby9.q", "w17q35"),
    g9b("groupby9.q", "w17q36", swapped = false),
    g9b("groupby9.q", "w17q37", swapped = true),
    g9b("groupby_nocolumnalign.q", "w17q38", swapped = false),

    QCase("groupby10.q", "w17q39",
      "SELECT key, count(substr(value, 5)) AS v1, " +
        "count(DISTINCT substr(value, 5)) AS v2 FROM qt_src " +
        "GROUP BY key",
      note = "count + count-distinct leg of the kv5 multi-insert " +
        "(same shape over src)"),
    QCase("groupby10.q", "w17q40",
      s"SELECT key, sum($V5) AS v1, sum(DISTINCT $V5) AS v2 " +
        "FROM qt_src GROUP BY key",
      note = "sum + sum-distinct leg"),
    QCase("groupby11.q", "w17q41",
      "SELECT value, count(key) AS v1, count(DISTINCT key) AS v2 " +
        "FROM qt_src GROUP BY value",
      note = "group on value counting keys (partitioned-sink file)"),

    QCase("groupby12.q", "w17q42",
      "SELECT COUNT(key) AS c1, COUNT(DISTINCT value) AS c2 " +
        "FROM qt_src GROUP BY key",
      note = "group key NOT in the select list — only the counts " +
        "survive"),

    QCase("groupby13.q", "w17q43",
      """SELECT int_col_7,
        |  MAX(LEAST(COALESCE(int_col_5, -279),
        |    COALESCE(int_col_7, 476))) AS int_col
        |FROM (VALUES (1, 10), (2, 476), (CAST(NULL AS INT), 7))
        |  AS grpby_test(int_col_5, int_col_7)
        |GROUP BY int_col_7, int_col_7,
        |  LEAST(COALESCE(int_col_5, -279), COALESCE(int_col_7, 476))"""
        .stripMargin,
      note = "duplicate grouping column plus an expression key that " +
        "is not projected (HIVE-12230 shape)"),

    QCase("groupby_multialias.q", "w17q44",
      "select a as a1, min(a) as a from (VALUES (1), (2), (2)) " +
        "t1_n150(a) group by t1_n150.a",
      note = "output alias `a` shadows the grouping column's name — " +
        "the qualified GROUP BY t1.a still resolves to the column"),

    QCase("groupby_neg_float.q", "w17q45",
      "SELECT cast('-30.33' as DOUBLE) AS c FROM qt_src " +
        "GROUP BY cast('-30.33' as DOUBLE) LIMIT 1",
      note = "negative float constant as the only group key"),
    QCase("groupby_neg_float.q", "w17q46",
      "SELECT '-30.33' AS c FROM qt_src GROUP BY '-30.33' LIMIT 1",
      note = "string-literal constant key"),

    QCase("groupby_constcolval.q", "w17q47",
      """select key, key1, key2 from (
        |  select a.key, 0 as key1, 0 as key2
        |  from (select cast(null as int) as key
        |        from qt_src where 1 = 0) a
        |  inner join qt_src b on a.key = b.key) a
        |group by key, key1, key2""".stripMargin,
      note = "constant grouping columns over an empty join (the " +
        "file's tlbtest is never loaded) — zero rows, no fold error"),

    QCase("groupby_empty.q", "w17q48",
      "select count(*) as c from (VALUES (1), (1), (2)) t_n34(a) " +
        "group by ()",
      duck = Some("select count(*) as c from (VALUES (1), (1), (2)) " +
        "t_n34(a)"),
      note = "GROUP BY () over non-empty input = one global row"),

    QCase("groupby_distinct_samekey.q", "w17q49",
      """select Q1.int1 AS int1, sum(distinct Q1.int1) AS s from
        |  (select * from (select cast(key as int) as int1
        |     from qt_src where cast(key as int) < 6) t
        |   order by int1) Q1
        |group by Q1.int1""".stripMargin,
      note = "sum(DISTINCT) of the grouping key itself through an " +
        "ordered subquery (HIVE-2416 shape)"),

    QCase("groupby_duplicate_key.q", "w17q50",
      """select distinct key, '' as dummy1, '' as dummy2 from
        |  (select key from qt_src order by key limit 10) t
        |order by key""".stripMargin,
      ordered = true,
      note = "duplicate empty-string constants under DISTINCT " +
        "(deterministic order-by-limit sample)"),
    QCase("groupby_duplicate_key.q", "w17q51",
      "select max('pants') as p1, max('pANTS') as p2 from qt_src " +
        "group by key order by key limit 1",
      ordered = true,
      note = "two case-differing constant aggregates per group"),

    QCase("groupby_having_distinct.q", "w17q52",
      """select npp, count(distinct nsoc) as c from (
        |  select '1-1000CG61' as npp, '7273111' as nsoc
        |  union all select '1-1000CG61', '7273112'
        |  union all select '1-1000EL62', '7273221'
        |  union all select '1-1000EL62', '7273221'
        |) tmp_src1
        |group by npp having count(distinct nsoc) > 1""".stripMargin,
      note = "HAVING over a DISTINCT aggregate (duplicate nsoc " +
        "collapses the second group below the threshold)"),

    QCase("groupby_resolution.q", "w17q53",
      """select key, count(*) as c, rank() over(order by count(*)) as r
        |from qt_src b where key < '12' group by b.key
        |order by b.key""".stripMargin,
      ordered = true,
      note = "window over the aggregate; GROUP BY resolves the " +
        "table-qualified b.key"),
    QCase("groupby_resolution.q", "w17q54",
      """select key, count(*) as c from qt_src b group by b.key
        |having key < '12' order by b.key""".stripMargin,
      ordered = true,
      note = "HAVING references the unqualified output name over a " +
        "qualified group key"),

    QCase("groupby_grouping_id1.q", "w17q55",
      "SELECT key, val, `grouping__id` AS gid from qt_t1 " +
        "group by key, val with cube",
      duck = Some("SELECT key, val, grouping_id(key, val) AS gid " +
        "from qt_t1 group by cube(key, val)"),
      note = "WITH CUBE spelling + the GROUPING__ID virtual column " +
        "over string keys"),
    QCase("groupby_grouping_id1.q", "w17q56",
      """SELECT key, val, `grouping__id` AS gid,
        |  CASE WHEN `grouping__id` == 0 THEN "0"
        |       WHEN `grouping__id` == 1 THEN "1"
        |       WHEN `grouping__id` == 2 THEN "2"
        |       WHEN `grouping__id` == 3 THEN "3"
        |       ELSE "nothing" END AS cs
        |from qt_t1 group by cube(key, val)""".stripMargin,
      duck = Some("""SELECT key, val, grouping_id(key, val) AS gid,
        |  CASE WHEN grouping_id(key, val) = 0 THEN '0'
        |       WHEN grouping_id(key, val) = 1 THEN '1'
        |       WHEN grouping_id(key, val) = 2 THEN '2'
        |       WHEN grouping_id(key, val) = 3 THEN '3'
        |       ELSE 'nothing' END AS cs
        |from qt_t1 group by cube(key, val)""".stripMargin),
      note = "CASE dispatch on GROUPING__ID (== spelling, " +
        "double-quoted string literals)")
  )

  test("qtest conformance wave 17q: groupby1-13 exec-conf battery " +
      "(map/skew/noskew/multi-distinct variants answer identically) " +
      "+ semantic stragglers") {
    run("groupby")
  }
}
