package graft

/** Conformance wave 17d: the vector_* aggregate/grouping corpus —
  * multi-argument COUNT(DISTINCT) matrices (vector_count.q,
  * vector_count_distinct.q), group-less aggregates
  * (vector_aggregate_without_gby.q), min/max/sum/avg across types
  * including TIMESTAMP (vector_aggregate_9.q — sum/avg over a
  * timestamp aggregates double epoch seconds, the r17 engine
  * addition), DISTINCT projection (vector_distinct_2.q), and the
  * cube/rollup/GROUPING__ID ladders (vector_groupby_grouping_id1.q,
  * vector_groupby_grouping_sets1.q) over the canonical fixtures.
  *
  * Porting notes:
  *  - multi-argument COUNT(DISTINCT a, b) twins as a NULL-guarded
  *    string tuple (a row with any NULL argument does not count —
  *    both engines' semantics).
  *  - GROUPING__ID twins as DuckDB grouping_id(...) with the same
  *    key order (bit order verified by wave 16ah).
  *  - sum(ts) twins as sum(epoch_us/1e6) — the identical µs→seconds
  *    division.
  */
class QtestVectorWave17dSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_count.q", "w17d01",
      """select a, count(distinct b) AS cb, count(distinct c) AS cc,
        |  sum(d) AS sd
        |from qt_abcd group by a""".stripMargin,
      note = "per-group distinct counts over the NULL-bearing in4 " +
        "corpus"),

    QCase("vector_count.q", "w17d02",
      """select count(1) AS c1, count(*) AS cs, count(a) AS ca,
        |  count(b) AS cb, count(c) AS cc, count(d) AS cd,
        |  count(distinct a) AS da, count(distinct b) AS db,
        |  count(distinct c) AS dc2, count(distinct d) AS dd,
        |  count(distinct a, b) AS dab,
        |  count(distinct b, c) AS dbc,
        |  count(distinct a, b, c) AS dabc,
        |  count(distinct a, b, c, d) AS dabcd
        |from qt_abcd""".stripMargin,
      duck = Some("""select count(1) AS c1, count(*) AS cs,
        |  count(a) AS ca, count(b) AS cb, count(c) AS cc,
        |  count(d) AS cd, count(distinct a) AS da,
        |  count(distinct b) AS db, count(distinct c) AS dc2,
        |  count(distinct d) AS dd,
        |  count(distinct CASE WHEN a IS NULL OR b IS NULL THEN NULL
        |    ELSE a::VARCHAR || ',' || b::VARCHAR END) AS dab,
        |  count(distinct CASE WHEN b IS NULL OR c IS NULL THEN NULL
        |    ELSE b::VARCHAR || ',' || c::VARCHAR END) AS dbc,
        |  count(distinct CASE WHEN a IS NULL OR b IS NULL OR c IS NULL
        |    THEN NULL ELSE a::VARCHAR || ',' || b::VARCHAR || ',' ||
        |    c::VARCHAR END) AS dabc,
        |  count(distinct CASE WHEN a IS NULL OR b IS NULL OR c IS NULL
        |    OR d IS NULL THEN NULL ELSE a::VARCHAR || ',' ||
        |    b::VARCHAR || ',' || c::VARCHAR || ',' || d::VARCHAR
        |    END) AS dabcd
        |from qt_abcd""".stripMargin),
      note = "the count matrix: multi-argument DISTINCT tuples skip " +
        "rows with ANY null argument"),

    QCase("vector_aggregate_without_gby.q", "w17d03",
      """select max(dt) AS m1, max(greg_dt) AS m2
        |from (VALUES (1, 20150330, '2015-03-30'),
        |  (2, 20150301, '2015-03-01'), (3, 20150502, '2015-05-02'),
        |  (4, 20150401, '2015-04-01'), (5, 20150313, '2015-03-13'),
        |  (6, 20150314, '2015-03-14'), (7, 20150404, '2015-04-04'))
        |  testvec(id, dt, greg_dt)
        |where id = 5""".stripMargin,
      note = "group-less aggregate over a single selected row"),

    QCase("vector_aggregate_9.q", "w17d04",
      """select min(dc) AS mn, max(dc) AS mx,
        |  CAST(sum(dc) AS DECIMAL(38,18)) AS sm,
        |  CAST(avg(dc) AS DECIMAL(38,18)) AS av
        |from qt_vt2k""".stripMargin,
      note = "decimal(38,18) aggregate family over the 2k corpus"),

    QCase("vector_aggregate_9.q", "w17d05",
      """select min(d) AS mn, max(d) AS mx, sum(d) AS sm, avg(d) AS av
        |from qt_vt2k""".stripMargin,
      note = "double aggregate family"),

    QCase("vector_aggregate_9.q", "w17d06",
      """select min(ts) AS mn, max(ts) AS mx,
        |  sum(ts) AS sm, avg(ts) AS av
        |from qt_vt2k""".stripMargin,
      duck = Some("""select min(ts) AS mn, max(ts) AS mx,
        |  sum(CAST(epoch_us(ts) AS DOUBLE) / 1000000) AS sm,
        |  avg(CAST(epoch_us(ts) AS DOUBLE) / 1000000) AS av
        |from qt_vt2k""".stripMargin),
      note = "Hive sums/averages TIMESTAMPS as double epoch seconds " +
        "(the r17 TimestampAggregates addition); min/max stay " +
        "timestamps"),

    QCase("vector_distinct_2.q", "w17d07",
      "select distinct s, t from qt_vt2k",
      note = "DISTINCT pair projection over the 2k corpus"),

    QCase("vector_count_distinct.q", "w17d08",
      "select count(distinct i) AS c from qt_vt2k",
      note = "the single wide count-distinct"),

    QCase("vector_groupby_grouping_id1.q", "w17d09",
      """SELECT key, val, GROUPING__ID AS gid
        |from qt_t1 group by key, val with cube""".stripMargin,
      duck = Some("""SELECT key, val, grouping_id(key, val) AS gid
        |from qt_t1 group by cube(key, val)""".stripMargin),
      note = "WITH CUBE spelling + the virtual column"),

    QCase("vector_groupby_grouping_id1.q", "w17d10",
      """SELECT GROUPING__ID AS gid, key, val
        |from qt_t1 group by rollup (key, val)""".stripMargin,
      duck = Some("""SELECT grouping_id(key, val) AS gid, key, val
        |from qt_t1 group by rollup(key, val)""".stripMargin),
      note = "rollup() spelling, virtual column first in the list"),

    QCase("vector_groupby_grouping_id1.q", "w17d11",
      """SELECT key, val, GROUPING__ID AS gid,
        |  CASE WHEN GROUPING__ID == 0 THEN "0"
        |       WHEN GROUPING__ID == 1 THEN "1"
        |       WHEN GROUPING__ID == 2 THEN "2"
        |       WHEN GROUPING__ID == 3 THEN "3"
        |       ELSE "nothing" END AS cse
        |from qt_t1 group by cube(key, val)""".stripMargin,
      duck = Some("""SELECT key, val, grouping_id(key, val) AS gid,
        |  CASE WHEN grouping_id(key, val) = 0 THEN '0'
        |       WHEN grouping_id(key, val) = 1 THEN '1'
        |       WHEN grouping_id(key, val) = 2 THEN '2'
        |       WHEN grouping_id(key, val) = 3 THEN '3'
        |       ELSE 'nothing' END AS cse
        |from qt_t1 group by cube(key, val)""".stripMargin),
      note = "GROUPING__ID consumed by a CASE (the Hive == operator " +
        "spelling)"),

    QCase("vector_groupby_grouping_sets1.q", "w17d12",
      """SELECT a, b, count(*) AS c from qt_gsets
        |group by a, b with cube""".stripMargin,
      duck = Some("""SELECT a, b, count(*) AS c from qt_gsets
        |group by cube(a, b)""".stripMargin)),

    QCase("vector_groupby_grouping_sets1.q", "w17d13",
      """SELECT a, b, count(*) AS c FROM qt_gsets
        |GROUP BY a, b GROUPING SETS (a, (a, b), b, ())""".stripMargin,
      duck = Some("""SELECT a, b, count(*) AS c FROM qt_gsets
        |GROUP BY GROUPING SETS ((a), (a, b), (b), ())""".stripMargin),
      note = "the four-set list including the explicit global row " +
        "(DuckDB spells GROUP BY GROUPING SETS without the key list)"),

    QCase("vector_groupby_grouping_sets1.q", "w17d14",
      """SELECT a FROM qt_gsets
        |GROUP BY a, b, c GROUPING SETS (a, b, c)""".stripMargin,
      duck = Some("""SELECT a FROM qt_gsets
        |GROUP BY GROUPING SETS ((a), (b), (c))""".stripMargin),
      note = "per-column singleton sets project NULL for the other " +
        "keys"),

    QCase("vector_groupby_grouping_sets1.q", "w17d15",
      """SELECT a FROM qt_gsets
        |GROUP BY a GROUPING SETS ((a), (a))""".stripMargin,
      duck = Some("""SELECT a FROM qt_gsets GROUP BY a"""),
      note = "DUPLICATE grouping sets collapse to one (Hive dedups; " +
        "Spark's stock lowering would double every row — " +
        "plans/GroupingSetsDedup)"),

    QCase("vector_groupby_grouping_sets1.q", "w17d16",
      """SELECT a + b AS ab, count(*) AS c FROM qt_gsets
        |GROUP BY a + b GROUPING SETS (a+b)""".stripMargin,
      duck = Some("""SELECT CAST(a AS DOUBLE) + CAST(b AS DOUBLE) AS ab,
        |  count(*) AS c FROM qt_gsets
        |GROUP BY GROUPING SETS ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE)))"""
        .stripMargin),
      note = "an EXPRESSION grouping set over STRING columns — Hive " +
        "arithmetic coerces the strings to double, spelled in the twin"))

  test("qtest conformance wave 17d: vector_* aggregates and grouping " +
      "sets (count-distinct matrices, timestamp sums, GROUPING__ID)") {
    run("vector_count", "vector_aggregate_without_gby",
      "vector_aggregate_9", "vector_distinct_2", "vector_count_distinct",
      "vector_groupby_grouping_id1", "vector_groupby_grouping_sets1")
  }
}
