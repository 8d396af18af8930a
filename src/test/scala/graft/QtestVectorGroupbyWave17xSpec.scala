package graft

/** Conformance wave 17x: the vector_groupby_* / vector_join_* twins
  * (ref ql/src/test/queries/clientpositive/vector_groupby{4,6}.q,
  * vector_groupby_cube1.q, vector_groupby_rollup1.q,
  * vector_groupby_grouping_id2.q, vector_groupby_grouping_id3.q,
  * vector_groupby_grouping_sets{2,3,3_dec,4,5,6}.q,
  * vector_groupby_grouping_sets_grouping.q,
  * vector_groupby_grouping_sets_limit.q,
  * vector_groupby_grouping_sets_switchmode.q,
  * vector_groupby_sort_8.q, vector_groupby_sort_11.q,
  * vector_grouping_sets.q, vector_groupby_reduce.q,
  * vector_join_filters.q, vector_join_nulls.q). Each file stages its
  * non-vector sibling's data into ORC and re-runs the same query
  * under the vectorized path — the semantics are the sibling's, and
  * each file's exact query shape gates here over the same fixtures.
  */
class QtestVectorGroupbyWave17xSpec extends QtestHarness {

  private val GS = "qt_gsets"
  // groupby_groupingid.txt rows (same inline as wave 16ah)
  private val gid = "(VALUES (1, CAST(NULL AS INT)), (1, 1), (2, 2), " +
    "(3, 3), (3, CAST(NULL AS INT)), (4, 5)) t1(key, value)"
  // in3.txt / in1.txt rows (same inline as wave 16al)
  private val m8 = "(VALUES (12, 35), (CAST(NULL AS INT), 40), " +
    "(48, CAST(NULL AS INT)), (100, 100))"
  private val m3 = "(VALUES (CAST(NULL AS INT), 35), (48, CAST(NULL " +
    "AS INT)), (100, 100))"
  private val joinFilters = "a.key > 40 AND a.value > 50 AND a.key = " +
    "a.value AND b.key > 40 AND b.value > 50 AND b.key = b.value"

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_groupby4.q", "w17x01",
      "SELECT substr(key, 1, 1) AS c1 FROM qt_src " +
        "GROUP BY substr(key, 1, 1)",
      note = "groupby4's shape over the ORC-staged copy"),

    QCase("vector_groupby6.q", "w17x02",
      "SELECT DISTINCT substr(value, 5, 1) AS c1 FROM qt_src",
      note = "groupby6's DISTINCT shape, vectorized file"),

    QCase("vector_groupby_cube1.q", "w17x03",
      "SELECT key, val, count(1) AS c FROM qt_t1 " +
        "GROUP BY key, val with cube",
      duck = Some("SELECT key, val, count(1) AS c FROM qt_t1 " +
        "GROUP BY cube(key, val)"),
      note = "WITH CUBE count over T1"),

    QCase("vector_groupby_cube1.q", "w17x04",
      "SELECT key, val, `GROUPING__ID` AS gid, count(1) AS c " +
        "FROM qt_t1 GROUP BY key, val with cube",
      duck = Some("SELECT key, val, grouping_id(key, val) AS gid, " +
        "count(1) AS c FROM qt_t1 GROUP BY cube(key, val)"),
      note = "cube + the virtual GROUPING__ID column"),

    QCase("vector_groupby_cube1.q", "w17x05",
      "SELECT key, count(distinct val) AS c FROM qt_t1 " +
        "GROUP BY key with cube",
      duck = Some("SELECT key, count(distinct val) AS c FROM qt_t1 " +
        "GROUP BY cube(key)"),
      note = "DISTINCT aggregate under cube"),

    QCase("vector_groupby_rollup1.q", "w17x06",
      "SELECT key, val, count(1) AS c FROM qt_t1 " +
        "GROUP BY key, val with rollup",
      duck = Some("SELECT key, val, count(1) AS c FROM qt_t1 " +
        "GROUP BY rollup(key, val)"),
      note = "WITH ROLLUP count"),

    QCase("vector_groupby_rollup1.q", "w17x07",
      "SELECT key, count(distinct val) AS c FROM qt_t1 " +
        "GROUP BY key with rollup",
      duck = Some("SELECT key, count(distinct val) AS c FROM qt_t1 " +
        "GROUP BY rollup(key)"),
      note = "DISTINCT aggregate under rollup"),

    QCase("vector_groupby_grouping_id2.q", "w17x08",
      s"SELECT gid, count(*) AS c FROM (SELECT key, value, " +
        s"`grouping__id` AS gid, count(*) from $gid GROUP BY key, " +
        s"value WITH ROLLUP) t GROUP BY gid",
      duck = Some("SELECT gid, count(*) AS c FROM (SELECT key, " +
        "value, grouping_id(key, value) AS gid, count(*) from " +
        "(VALUES (1, CAST(NULL AS INT)), (1, 1), (2, 2), (3, 3), " +
        "(3, CAST(NULL AS INT)), (4, 5)) t1(key, value) GROUP BY " +
        "ROLLUP(key, value)) t GROUP BY gid"),
      note = "reaggregation keyed on GROUPING__ID (16ah's shape, the " +
        "vectorized file)"),

    QCase("vector_groupby_grouping_id3.q", "w17x09",
      s"""SELECT key, value, `GROUPING__ID` AS gid, count(*) AS c
         |FROM $gid
         |GROUP BY key, value
         |GROUPING SETS ((), (key))
         |HAVING `GROUPING__ID` = 1""".stripMargin,
      duck = Some("""SELECT key, CAST(NULL AS INT) AS value,
        |  1 AS gid, count(*) AS c
        |FROM (VALUES (1, CAST(NULL AS INT)), (1, 1), (2, 2), (3, 3),
        |  (3, CAST(NULL AS INT)), (4, 5)) t1(key, value)
        |GROUP BY GROUPING SETS ((), (key))
        |HAVING grouping(key) = 0""".stripMargin),
      note = "HAVING on GROUPING__ID above an explicit ()-bearing " +
        "set list (defers the empty-set split to post-analysis; the " +
        "gid=1 filter keeps only key-subtotal rows)"),

    QCase("vector_groupby_grouping_sets2.q", "w17x10",
      s"SELECT a, b, count(*) AS c from $GS group by a, b with cube",
      duck = Some(s"SELECT a, b, count(*) AS c from $GS " +
        "group by cube(a, b)"),
      note = "grouping_sets2's cube count over the ORC copy"),

    QCase("vector_groupby_grouping_sets3.q", "w17x11",
      s"SELECT a, b, avg(CAST(c AS DOUBLE)) AS av, count(*) AS c " +
        s"from $GS group by a, b with cube",
      duck = Some("SELECT a, b, avg(CAST(c AS DOUBLE)) AS av, " +
        s"count(*) AS c from $GS group by cube(a, b)"),
      note = "avg+count per cube cell (the file also flips " +
        "hash-to-streaming aggregation modes)"),

    QCase("vector_groupby_grouping_sets3_dec.q", "w17x12",
      s"SELECT a, b, avg(CAST(c AS DECIMAL(10,2))) AS av, " +
        s"count(*) AS c from $GS group by a, b with cube",
      duck = Some("SELECT a, b, avg(CAST(c AS DECIMAL(10,2))) AS av, " +
        s"count(*) AS c from $GS group by cube(a, b)"),
      note = "the DECIMAL-typed avg variant"),

    QCase("vector_groupby_grouping_sets4.q", "w17x13",
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
      note = "self-join of cubes on the nullable grouping column"),

    QCase("vector_groupby_grouping_sets5.q", "w17x14",
      s"""SELECT a, b, count(*) AS c FROM
         |(SELECT a, b, count(1) AS c from $GS group by a, b) subq1
         |group by a, b with cube""".stripMargin,
      duck = Some(s"""SELECT a, b, count(*) AS c FROM
         |(SELECT a, b, count(1) AS c from $GS group by a, b) subq1
         |group by cube(a, b)""".stripMargin),
      note = "cube over a grouped subquery"),

    QCase("vector_groupby_grouping_sets6.q", "w17x15",
      s"""SELECT a, b FROM
         |(SELECT a, b from $GS group by a, b
         |   grouping sets ( (a,b), a )) res
         |WHERE res.a = 5""".stripMargin,
      duck = Some(s"""SELECT a, b FROM
         |(SELECT a, b from $GS group by
         |   grouping sets ( (a,b), (a) )) res
         |WHERE CAST(res.a AS INT) = 5""".stripMargin),
      note = "filter above the sets keeps detail + a-subtotal rows"),

    QCase("vector_groupby_grouping_sets_grouping.q", "w17x16",
      s"""select key, value, `grouping__id` AS gid,
         |  grouping(key) AS gk, grouping(value) AS gv
         |from $gid group by rollup(key, value)""".stripMargin,
      duck = Some("""select key, value, grouping_id(key, value) AS gid,
        |  grouping(key) AS gk, grouping(value) AS gv
        |from (VALUES (1, CAST(NULL AS INT)), (1, 1), (2, 2), (3, 3),
        |  (3, CAST(NULL AS INT)), (4, 5)) t1(key, value)
        |group by rollup(key, value)""".stripMargin),
      note = "grouping() flags beside GROUPING__ID (16ah's shape, " +
        "the vectorized file)"),

    QCase("vector_groupby_grouping_sets_limit.q", "w17x17",
      s"""SELECT a, b, count(*) AS c from $GS group by a, b with cube
         |order by a, b LIMIT 10""".stripMargin,
      duck = Some(s"""SELECT a, b, count(*) AS c from $GS
         |group by cube(a, b) order by a, b LIMIT 10""".stripMargin),
      ordered = true,
      note = "cube under ORDER+LIMIT (this file's order omits " +
        "GROUPING__ID — ties between a (a)-subtotal and a detail " +
        "row with NULL b cannot arise in this data)"),

    QCase("vector_groupby_grouping_sets_switchmode.q", "w17x18",
      s"""select a, b, count(c) AS c from
         |  (select * from $GS order by a, b, c limit 40) as tt
         |group by a, b
         |GROUPING SETS((a, b), (a), (b), ())""".stripMargin,
      duck = Some(s"""select a, b, count(c) AS c from
         |  (select * from $GS order by a, b, c limit 40) as tt
         |group by GROUPING SETS((a, b), (a), (b), ())""".stripMargin),
      note = "4-set list over a limited scan (the file switches " +
        "hash/streaming aggregation mid-query; deterministic " +
        "order-by-limit here)"),

    QCase("vector_groupby_sort_8.q", "w17x19",
      "select count(distinct key) AS c from qt_t1",
      note = "sorted-bucket distinct count, vectorized twin"),

    QCase("vector_groupby_sort_11.q", "w17x20",
      """select count(distinct key) AS c1, count(1) AS c2,
        |  count(key) AS c3, sum(distinct CAST(key AS DOUBLE)) AS c4
        |from (select key from qt_src where CAST(key AS INT) < 10) t"""
        .stripMargin,
      note = "the mixed distinct battery, vectorized twin"),

    QCase("vector_grouping_sets.q", "w17x21",
      """SELECT s_store_id AS id, sum(s_floor_space) AS s,
        |  `grouping__id` AS gid
        |FROM (VALUES ('AAAA', 1000, 'ok'), ('BBBB', 2000, 'ok'),
        |  ('AAAA', 3000, 'ok')) store(s_store_id, s_floor_space,
        |  s_state)
        |GROUP BY s_store_id GROUPING SETS (s_store_id, ())"""
        .stripMargin,
      duck = Some("""SELECT s_store_id AS id, sum(s_floor_space) AS s,
        |  grouping_id(s_store_id) AS gid
        |FROM (VALUES ('AAAA', 1000, 'ok'), ('BBBB', 2000, 'ok'),
        |  ('AAAA', 3000, 'ok')) store(s_store_id, s_floor_space,
        |  s_state)
        |GROUP BY GROUPING SETS ((s_store_id), ())""".stripMargin),
      note = "the TPC-DS-style store rollup (the file stages the " +
        "full store table; the set algebra gates here)"),

    QCase("vector_groupby_reduce.q", "w17x22",
      """select ss_ticket_number, min(ss_item_sk) AS mn, count(*) AS c
        |from (VALUES (1, 10), (1, 20), (2, 5), (2, 5), (3, 7))
        |  store_sales(ss_ticket_number, ss_item_sk)
        |group by ss_ticket_number""".stripMargin,
      note = "group-then-reduce shape (the file pipes the grouped " +
        "output through a second aggregate stage)"),

    QCase("vector_join_filters.q", "w17x23",
      s"SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value AS " +
        s"v2 FROM $m8 a(key, value) JOIN $m8 b(key, value) ON " +
        s"a.key = b.value AND $joinFilters",
      note = "inner join + the full per-side filter battery (the " +
        "file verifies via sum(hash); row-level compare here)"),

    QCase("vector_join_filters.q", "w17x24",
      s"SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value AS " +
        s"v2 FROM $m8 a(key, value) LEFT OUTER JOIN $m8 b(key, " +
        s"value) ON a.key = b.value AND $joinFilters",
      note = "left outer: filtered-away matches NULL-extend"),

    QCase("vector_join_filters.q", "w17x25",
      s"SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value AS " +
        s"v2 FROM $m8 a(key, value) FULL OUTER JOIN $m8 b(key, " +
        s"value) ON a.key = b.value AND $joinFilters",
      note = "full outer keeps both unmatched sides"),

    QCase("vector_join_nulls.q", "w17x26",
      s"SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value AS " +
        s"v2 FROM $m3 a(key, value) JOIN $m3 b(key, value) " +
        "ON a.key = b.value",
      note = "NULL keys never match across the equi join"),

    QCase("vector_join_nulls.q", "w17x27",
      s"SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value AS " +
        s"v2 FROM $m3 a(key, value) LEFT OUTER JOIN $m3 b(key, " +
        "value) ON a.key = b.key",
      note = "NULL-keyed left rows survive NULL-extended")
  )

  test("qtest conformance wave 17x: vector_groupby/join twins — " +
      "cube/rollup/sets over ORC-staged fixtures, GROUPING__ID " +
      "having, join filter/null batteries") {
    run("vector_")
  }
}
