package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Conformance sweep over the reference's OWN qtest corpus (ref
  * ql/src/test/queries/clientpositive — SURVEY §5 called the .q files
  * "the backbone" of the reference's verification): curated files whose core
  * SELECTs exercise shipped surface, run through the engine's SQL front
  * door (`Engine.sql`) over the reference's own canonical datasets
  * (kv1.txt `src`, kv3.txt `src1`, `srcpart` = src × 4 partitions,
  * T1.txt, grouping_sets.txt, the tiny TPC-H `part` table, sales/things)
  * and gated cell-by-cell against DuckDB running the same — or a
  * DuckDB-dialect twin of the same — statement over the same data.
  *
  * Porting rules, applied uniformly (per-case notes where they matter):
  *  - `FROM t INSERT OVERWRITE TABLE d SELECT ...; SELECT * FROM d`
  *    scaffolding ports to the bare SELECT (INSERT has its own gates:
  *    q32/q33/s12/s18), and Hive's inverted `FROM x SELECT ...` subquery
  *    form ports to standard subqueries.
  *  - Hive's implicit string→numeric coercions are spelled as explicit
  *    CASTs so the same text runs on the DuckDB oracle.
  *  - result sets compare SORTED (the corpus' own SORT_QUERY_RESULTS).
  *  - the `duck` twin respells Hive-only syntax (LATERAL VIEW → UNNEST,
  *    WITH ROLLUP/CUBE → ROLLUP()/CUBE(), DISTRIBUTE/SORT BY window
  *    specs → PARTITION/ORDER BY, std/variance → *_pop).
  *
  * The included/excluded-file inventory with reasons lives in
  * COVERAGE.md (qtest conformance row). First finding of the sweep:
  * Hive's std/stddev/variance are POPULATION forms — now registered so
  * (HiveFunctions), where bare Spark silently answers the SAMPLE form.
  */
class QtestConformanceSpec extends QtestHarness {

  // ------------------------------------------------------- curated cases

  private val V5 = "CAST(substr(value, 5) AS DOUBLE)"
  protected val qcases: Seq[QCase] = Seq(
    QCase("groupby1.q", "g1",
      s"SELECT key, sum($V5) AS s FROM qt_src GROUP BY key"),
    QCase("groupby2.q", "g2",
      s"""SELECT substr(key, 1, 1) AS k1,
         |  count(DISTINCT substr(value, 5)) AS c1, sum($V5) AS s1
         |FROM qt_src GROUP BY substr(key, 1, 1)""".stripMargin,
      note = "concat(key, sum) column dropped: double→string RENDERING " +
        "is engine formatting, not query semantics"),
    QCase("groupby3.q", "g3",
      s"""SELECT sum($V5) AS c1, avg($V5) AS c2, avg(DISTINCT $V5) AS c3,
         |  max($V5) AS c4, min($V5) AS c5, std($V5) AS c6,
         |  stddev_samp($V5) AS c7, variance($V5) AS c8, var_samp($V5) AS c9
         |FROM qt_src""".stripMargin,
      duck = Some(
        s"""SELECT sum($V5) AS c1, avg($V5) AS c2, avg(DISTINCT $V5) AS c3,
           |  max($V5) AS c4, min($V5) AS c5, stddev_pop($V5) AS c6,
           |  stddev_samp($V5) AS c7, var_pop($V5) AS c8, var_samp($V5) AS c9
           |FROM qt_src""".stripMargin),
      note = "Hive std/variance = POPULATION forms (the sweep's first " +
        "finding; now registered so)"),
    QCase("groupby4.q", "g4",
      "SELECT substr(key, 1, 1) AS c1 FROM qt_src GROUP BY substr(key, 1, 1)"),
    QCase("groupby6.q", "g6",
      "SELECT DISTINCT substr(value, 5, 1) AS c1 FROM qt_src"),
    QCase("having.q", "h1",
      "SELECT count(value) AS c FROM qt_src GROUP BY key HAVING c > 3"),
    QCase("having.q", "h2",
      "SELECT key, max(value) AS m FROM qt_src GROUP BY key " +
        "HAVING CAST(key AS INT) <> 302"),
    QCase("having.q", "h3",
      "SELECT key FROM qt_src GROUP BY key HAVING max(value) > 'val_255'"),
    QCase("having.q", "h4",
      "SELECT key FROM qt_src WHERE CAST(key AS INT) > 300 GROUP BY key " +
        "HAVING max(value) > 'val_255'"),
    QCase("having.q", "h5",
      "SELECT count(value) AS c, max(CAST(key AS INT)) AS m FROM qt_src " +
        "GROUP BY key HAVING c > 3 AND m > 400"),
    QCase("groupby_ppr.q", "g8",
      "SELECT substr(key, 1, 1) AS k1, " +
        "count(DISTINCT substr(value, 5)) AS c1, count(*) AS n " +
        "FROM qt_srcpart WHERE ds = '2008-04-08' " +
        "GROUP BY substr(key, 1, 1)",
      note = "partition-pruned groupby over srcpart"),

    QCase("groupby_rollup1.q", "r1",
      "SELECT key, val, count(1) AS c FROM qt_t1 GROUP BY key, val " +
        "WITH ROLLUP",
      duck = Some("SELECT key, val, count(1) AS c FROM qt_t1 " +
        "GROUP BY ROLLUP(key, val)")),
    QCase("groupby_rollup1.q", "r2",
      "SELECT key, count(DISTINCT val) AS c FROM qt_t1 GROUP BY key " +
        "WITH ROLLUP",
      duck = Some("SELECT key, count(DISTINCT val) AS c FROM qt_t1 " +
        "GROUP BY ROLLUP(key)")),
    QCase("groupby_cube1.q", "c1",
      "SELECT key, val, count(1) AS c FROM qt_t1 GROUP BY key, val " +
        "WITH CUBE",
      duck = Some("SELECT key, val, count(1) AS c FROM qt_t1 " +
        "GROUP BY CUBE(key, val)")),
    QCase("groupby_cube1.q", "c2",
      "SELECT key, val, GROUPING__ID AS gid, count(1) AS c FROM qt_t1 " +
        "GROUP BY key, val WITH CUBE",
      duck = Some("SELECT key, val, (CASE WHEN key IS NULL THEN 2 ELSE 0 " +
        "END + CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS gid, " +
        "count(1) AS c FROM qt_t1 GROUP BY CUBE(key, val)"),
      note = "GROUPING__ID virtual column; T1 has no NULL data values, " +
        "so the twin computes the bitmask from NULL-ness"),
    QCase("groupby_cube1.q", "c2b",
      "SELECT key, val, GROUPING__ID, count(1) AS c FROM qt_t1 " +
        "GROUP BY key, val WITH CUBE",
      duck = Some("SELECT key, val, (CASE WHEN key IS NULL THEN 2 ELSE 0 " +
        "END + CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS gid, " +
        "count(1) AS c FROM qt_t1 GROUP BY CUBE(key, val)"),
      note = "UNALIASED GROUPING__ID as a bare select item — regression " +
        "pin for the named-slot substitution (a raw function swap CCE'd)"),
    QCase("groupby_cube1.q", "c3",
      "SELECT key, count(DISTINCT val) AS c FROM qt_t1 GROUP BY key " +
        "WITH CUBE",
      duck = Some("SELECT key, count(DISTINCT val) AS c FROM qt_t1 " +
        "GROUP BY CUBE(key)")),
    QCase("groupby_grouping_sets1.q", "gs1",
      "SELECT a, b, count(*) AS c FROM qt_gsets GROUP BY a, b " +
        "GROUPING SETS (a, (a, b), b, ())",
      duck = Some("SELECT a, b, count(*) AS c FROM qt_gsets " +
        "GROUP BY GROUPING SETS ((a), (a, b), (b), ())")),
    QCase("groupby_grouping_sets1.q", "gs2",
      "SELECT a, b, count(*) AS c FROM qt_gsets GROUP BY a, b " +
        "GROUPING SETS (a, (a, b))",
      duck = Some("SELECT a, b, count(*) AS c FROM qt_gsets " +
        "GROUP BY GROUPING SETS ((a), (a, b))")),
    QCase("groupby_grouping_sets1.q", "gs3",
      "SELECT a FROM qt_gsets GROUP BY a, b, c GROUPING SETS (a, b, c)",
      duck = Some("SELECT a FROM qt_gsets " +
        "GROUP BY GROUPING SETS ((a), (b), (c))")),
    QCase("groupby_grouping_sets1.q", "gs4",
      "SELECT a FROM qt_gsets GROUP BY a GROUPING SETS ((a), (a))",
      duck = Some("SELECT a FROM qt_gsets GROUP BY GROUPING SETS ((a))"),
      note = "Hive DEDUPS identical grouping sets (q.out emits each a " +
        "once); the twin is pre-deduped"),
    QCase("groupby_grouping_sets1.q", "gs5",
      "SELECT CAST(a AS INT) + CAST(b AS INT) AS ab, count(*) AS c " +
        "FROM qt_gsets GROUP BY CAST(a AS INT) + CAST(b AS INT) " +
        "GROUPING SETS (CAST(a AS INT) + CAST(b AS INT))",
      duck = Some("SELECT CAST(a AS INT) + CAST(b AS INT) AS ab, " +
        "count(*) AS c FROM qt_gsets " +
        "GROUP BY GROUPING SETS ((CAST(a AS INT) + CAST(b AS INT)))")),

    QCase("join1.q", "j1",
      "SELECT src1.key, src2.value FROM qt_src src1 JOIN qt_src src2 " +
        "ON (src1.key = src2.key)",
      note = "innerjoin.q's INNER JOIN spelling is the same core"),
    QCase("join2.q", "j2",
      "SELECT src1.key, src3.value FROM qt_src src1 JOIN qt_src src2 " +
        "ON (src1.key = src2.key) JOIN qt_src src3 " +
        "ON (CAST(src1.key AS INT) + CAST(src2.key AS INT) = " +
        "CAST(src3.key AS INT))"),
    QCase("join3.q", "j3",
      "SELECT src1.key, src3.value FROM qt_src src1 JOIN qt_src src2 " +
        "ON (src1.key = src2.key) JOIN qt_src src3 " +
        "ON (src1.key = src3.key)"),
    QCase("join4.q", "j4",
      "SELECT a.c1, a.c2, b.c3, b.c4 FROM (SELECT key AS c1, value AS c2 " +
        "FROM qt_src WHERE CAST(key AS INT) > 10 AND CAST(key AS INT) < 20" +
        ") a LEFT OUTER JOIN (SELECT key AS c3, value AS c4 FROM qt_src " +
        "WHERE CAST(key AS INT) > 15 AND CAST(key AS INT) < 25) b " +
        "ON (a.c1 = b.c3)"),
    QCase("join5.q", "j5",
      "SELECT a.c1, a.c2, b.c3, b.c4 FROM (SELECT key AS c1, value AS c2 " +
        "FROM qt_src WHERE CAST(key AS INT) > 10 AND CAST(key AS INT) < 20" +
        ") a RIGHT OUTER JOIN (SELECT key AS c3, value AS c4 FROM qt_src " +
        "WHERE CAST(key AS INT) > 15 AND CAST(key AS INT) < 25) b " +
        "ON (a.c1 = b.c3)"),
    QCase("join6.q", "j6",
      "SELECT a.c1, a.c2, b.c3, b.c4 FROM (SELECT key AS c1, value AS c2 " +
        "FROM qt_src WHERE CAST(key AS INT) > 10 AND CAST(key AS INT) < 20" +
        ") a FULL OUTER JOIN (SELECT key AS c3, value AS c4 FROM qt_src " +
        "WHERE CAST(key AS INT) > 15 AND CAST(key AS INT) < 25) b " +
        "ON (a.c1 = b.c3)"),
    QCase("join8.q", "j8",
      "SELECT * FROM (SELECT a.c1 AS c1, a.c2 AS c2, b.c3 AS c3, " +
        "b.c4 AS c4 FROM (SELECT key AS c1, value AS c2 FROM qt_src " +
        "WHERE CAST(key AS INT) > 10 AND CAST(key AS INT) < 20) a " +
        "LEFT OUTER JOIN (SELECT key AS c3, value AS c4 FROM qt_src " +
        "WHERE CAST(key AS INT) > 15 AND CAST(key AS INT) < 25) b " +
        "ON (a.c1 = b.c3)) c WHERE c.c3 IS NULL AND c.c1 IS NOT NULL"),
    QCase("join9.q", "j9",
      "SELECT src1.key, src2.value FROM qt_srcpart src1 JOIN qt_src src2 " +
        "ON (src1.key = src2.key) WHERE src1.ds = '2008-04-08' AND " +
        "src1.hr = '12'"),

    QCase("join10.q", "j10",
      "SELECT Y.* FROM (SELECT * FROM qt_src) x JOIN " +
        "(SELECT * FROM qt_src) Y ON (x.key = Y.key)"),
    QCase("join11.q", "j11",
      "SELECT src1.c1, src2.c4 FROM (SELECT key AS c1, value AS c2 FROM " +
        "qt_src) src1 JOIN (SELECT key AS c3, value AS c4 FROM qt_src) " +
        "src2 ON src1.c1 = src2.c3 AND CAST(src1.c1 AS INT) < 100"),
    QCase("join12.q", "j12",
      "SELECT src1.c1, src2.c4 FROM (SELECT key AS c1, value AS c2 FROM " +
        "qt_src) src1 JOIN (SELECT key AS c3, value AS c4 FROM qt_src) " +
        "src2 ON src1.c1 = src2.c3 AND CAST(src1.c1 AS INT) < 100 JOIN " +
        "(SELECT key AS c5, value AS c6 FROM qt_src) src3 ON " +
        "src1.c1 = src3.c5 AND CAST(src3.c5 AS INT) < 80"),
    QCase("join13.q", "j13",
      "SELECT src1.c1, src2.c4 FROM (SELECT key AS c1, value AS c2 FROM " +
        "qt_src) src1 JOIN (SELECT key AS c3, value AS c4 FROM qt_src) " +
        "src2 ON src1.c1 = src2.c3 AND CAST(src1.c1 AS INT) < 100 JOIN " +
        "(SELECT key AS c5, value AS c6 FROM qt_src) src3 ON " +
        "CAST(src1.c1 AS INT) + CAST(src2.c3 AS INT) = " +
        "CAST(src3.c5 AS INT) AND CAST(src3.c5 AS INT) < 200",
      note = "sum-of-keys join condition across two earlier relations"),
    QCase("join_filters_overlap.q", "jf1",
      "SELECT * FROM qt_a4 a LEFT OUTER JOIN qt_a4 b ON (a.key = b.key " +
        "AND a.value = 50 AND b.value = 50) LEFT OUTER JOIN qt_a4 c ON " +
        "(a.key = c.key AND a.value = 60 AND c.value = 60)",
      note = "non-equi predicates INSIDE outer-join ON clauses must stay " +
        "join conditions, never WHERE filters"),
    QCase("join_filters_overlap.q", "jf2",
      "SELECT * FROM qt_a4 a RIGHT OUTER JOIN qt_a4 b ON (a.key = b.key " +
        "AND a.value = 50 AND b.value = 50) LEFT OUTER JOIN qt_a4 c ON " +
        "(b.key = c.key AND b.value = 60 AND c.value = 60)"),
    QCase("join_filters_overlap.q", "jf3",
      "SELECT * FROM qt_a4 a FULL OUTER JOIN qt_a4 b ON (a.key = b.key " +
        "AND a.value = 50 AND b.value = 50) LEFT OUTER JOIN qt_a4 c ON " +
        "(b.key = c.key AND b.value = 60 AND c.value = 60) LEFT OUTER " +
        "JOIN qt_a4 d ON (a.key = d.key AND a.value = 40 AND d.value = 40)"),

    QCase("semijoin.q", "sj1",
      "SELECT * FROM qt_t1sj a LEFT SEMI JOIN qt_t2sj b ON a.key = b.key",
      duck = Some("SELECT * FROM qt_t1sj a SEMI JOIN qt_t2sj b " +
        "ON a.key = b.key")),
    QCase("semijoin.q", "sj2",
      "SELECT * FROM qt_t2sj a LEFT SEMI JOIN qt_t1sj b ON b.key = a.key",
      duck = Some("SELECT * FROM qt_t2sj a SEMI JOIN qt_t1sj b " +
        "ON b.key = a.key")),
    QCase("semijoin.q", "sj3",
      "SELECT * FROM qt_t1sj a LEFT SEMI JOIN qt_t4sj b ON b.key = a.key",
      duck = Some("SELECT * FROM qt_t1sj a SEMI JOIN qt_t4sj b " +
        "ON b.key = a.key")),
    QCase("semijoin.q", "sj4",
      "SELECT a.value FROM qt_t1sj a LEFT SEMI JOIN qt_t3sj b " +
        "ON (b.key = a.key AND b.key < 15)",
      duck = Some("SELECT a.value FROM qt_t1sj a SEMI JOIN qt_t3sj b " +
        "ON (b.key = a.key AND b.key < 15)")),
    QCase("leftsemijoin.q", "sj5",
      "SELECT name, id FROM qt_sales LEFT SEMI JOIN qt_things " +
        "ON (qt_sales.id = qt_things.id)",
      duck = Some("SELECT name, id FROM qt_sales SEMI JOIN qt_things " +
        "ON (qt_sales.id = qt_things.id)")),

    QCase("lateral_view.q", "lv1",
      "SELECT * FROM qt_src LATERAL VIEW explode(array(1, 2, 3)) " +
        "myTable AS myCol ORDER BY key, myCol LIMIT 1",
      duck = Some("SELECT key, value, c AS myCol FROM qt_src, " +
        "(SELECT UNNEST([1, 2, 3]) AS c) t ORDER BY key, c LIMIT 1"),
      note = "SORT BY → ORDER BY for a deterministic LIMIT 1"),
    QCase("lateral_view.q", "lv2",
      "SELECT DISTINCT myCol, myCol2 FROM qt_src LATERAL VIEW " +
        "explode(array(1, 2, 3)) t1 AS myCol LATERAL VIEW " +
        "explode(array('a', 'b', 'c')) t2 AS myCol2",
      duck = Some("SELECT DISTINCT t1.c1 AS myCol, t2.c2 AS myCol2 FROM " +
        "qt_src, (SELECT UNNEST([1, 2, 3]) AS c1) t1, " +
        "(SELECT UNNEST(['a', 'b', 'c']) AS c2) t2"),
      note = "LIMIT 9 over the cartesian → DISTINCT (the 9 combos), " +
        "order-independent"),
    QCase("lateral_view.q", "lv3",
      "SELECT DISTINCT myCol2 FROM qt_src LATERAL VIEW " +
        "explode(array(array(1, 2, 3))) t1 AS myCol LATERAL VIEW " +
        "explode(myCol) t2 AS myCol2",
      duck = Some("SELECT DISTINCT c2 AS myCol2 FROM " +
        "(SELECT UNNEST([1, 2, 3]) AS c2)"),
      note = "nested explode of [[1,2,3]] = the inner list per row; " +
        "DISTINCT collapses src multiplicity, twin hand-equivalent"),
    QCase("lateral_view.q", "lv4",
      "SELECT key, myCol FROM qt_lvarr LATERAL VIEW explode(vals) t " +
        "AS myCol",
      duck = Some("SELECT key, UNNEST(vals) AS myCol FROM qt_lvarr")),
    QCase("lateral_view_outer.q", "lv5",
      "SELECT key, a FROM qt_src LATERAL VIEW OUTER explode(array()) " +
        "C AS a",
      duck = Some("SELECT key, NULL AS a FROM qt_src"),
      note = "OUTER of an empty array keeps every row with NULL — twin " +
        "hand-equivalent"),
    QCase("lateral_view_outer.q", "lv6",
      "SELECT key, a FROM qt_src LATERAL VIEW OUTER " +
        "explode(array(4, 5)) C AS a",
      duck = Some("SELECT key, c AS a FROM qt_src, " +
        "(SELECT UNNEST([4, 5]) AS c) t")),
    QCase("lateral_view_outer.q", "lv7",
      "SELECT key, a FROM qt_avalued LATERAL VIEW OUTER explode(vals) " +
        "C AS a",
      duck = Some("SELECT t.key, u.a FROM qt_avalued t LEFT JOIN LATERAL " +
        "(SELECT UNNEST(t.vals) AS a) u ON true"),
      note = "NULL-valued arrays keep their row (OUTER); twin is a " +
        "LATERAL left join"),

    QCase("windowing.q", "w1",
      "SELECT p_mfgr, p_name, p_size, rank() OVER (DISTRIBUTE BY p_mfgr " +
        "SORT BY p_name) AS r, dense_rank() OVER (DISTRIBUTE BY p_mfgr " +
        "SORT BY p_name) AS dr, round(sum(p_retailprice) OVER " +
        "(DISTRIBUTE BY p_mfgr SORT BY p_name ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW), 2) AS s1 FROM qt_part",
      duck = Some("SELECT p_mfgr, p_name, p_size, rank() OVER " +
        "(PARTITION BY p_mfgr ORDER BY p_name) AS r, dense_rank() OVER " +
        "(PARTITION BY p_mfgr ORDER BY p_name) AS dr, " +
        "round(sum(p_retailprice) OVER (PARTITION BY p_mfgr ORDER BY " +
        "p_name ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) " +
        "AS s1 FROM qt_part"),
      note = "Hive's DISTRIBUTE/SORT BY window-spec spelling kept on the " +
        "engine side; p_name ties in part_tiny are identical full rows, " +
        "so the ROWS running sum is order-invariant"),
    QCase("windowing.q", "w2",
      "SELECT p_mfgr, p_name, p_size, min(p_retailprice) AS mn, rank() " +
        "OVER (DISTRIBUTE BY p_mfgr SORT BY p_name) AS r, dense_rank() " +
        "OVER (DISTRIBUTE BY p_mfgr SORT BY p_name) AS dr, p_size - " +
        "lag(p_size, 1, p_size) OVER (DISTRIBUTE BY p_mfgr SORT BY " +
        "p_name) AS deltaSz FROM qt_part GROUP BY p_mfgr, p_name, p_size",
      duck = Some("SELECT p_mfgr, p_name, p_size, min(p_retailprice) AS " +
        "mn, rank() OVER (PARTITION BY p_mfgr ORDER BY p_name) AS r, " +
        "dense_rank() OVER (PARTITION BY p_mfgr ORDER BY p_name) AS dr, " +
        "p_size - lag(p_size, 1, p_size) OVER (PARTITION BY p_mfgr " +
        "ORDER BY p_name) AS deltaSz FROM qt_part " +
        "GROUP BY p_mfgr, p_name, p_size")),
    QCase("windowing.q", "w3",
      "SELECT p_mfgr, p_name, count(p_size) OVER (DISTRIBUTE BY p_mfgr " +
        "SORT BY p_name) AS cd FROM qt_part",
      duck = Some("SELECT p_mfgr, p_name, count(p_size) OVER " +
        "(PARTITION BY p_mfgr ORDER BY p_name) AS cd FROM qt_part"),
      note = "default RANGE frame: tie groups count together in both"),
    QCase("windowing.q", "w4",
      "SELECT p_mfgr, p_name, p_size, sum(p_size) OVER (DISTRIBUTE BY " +
        "p_mfgr SORT BY p_name RANGE BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS s1, sum(p_size) OVER (DISTRIBUTE BY p_mfgr " +
        "SORT BY p_size RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS s2 " +
        "FROM qt_part",
      duck = Some("SELECT p_mfgr, p_name, p_size, sum(p_size) OVER " +
        "(PARTITION BY p_mfgr ORDER BY p_name RANGE BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS s1, sum(p_size) OVER (PARTITION " +
        "BY p_mfgr ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND " +
        "CURRENT ROW) AS s2 FROM qt_part")),

    QCase("subquery_in.q", "sq1",
      "SELECT * FROM qt_src WHERE key IN (SELECT key FROM qt_src s1 " +
        "WHERE s1.key > '9')"),
    QCase("subquery_in.q", "sq2",
      "SELECT * FROM qt_src b WHERE b.key IN (SELECT a.key FROM qt_src " +
        "a WHERE b.value = a.value AND a.key > '9')",
      note = "correlated IN"),
    QCase("subquery_in.q", "sq3",
      "SELECT p_name, p_size FROM qt_part WHERE p_size IN (SELECT " +
        "avg(p_size) FROM (SELECT p_size, rank() OVER (PARTITION BY " +
        "p_mfgr ORDER BY p_size) AS r FROM qt_part) a WHERE r <= 2)",
      note = "int IN double-subquery coercion"),
    QCase("subquery_in.q", "sq4",
      "SELECT p_mfgr, p_name, p_size FROM qt_part b WHERE b.p_size IN " +
        "(SELECT min(p_size) FROM (SELECT p_mfgr, p_size, rank() OVER " +
        "(PARTITION BY p_mfgr ORDER BY p_size) AS r FROM qt_part) a " +
        "WHERE r <= 2 AND b.p_mfgr = a.p_mfgr)",
      note = "correlated agg-of-window subquery"),
    QCase("subquery_exists.q", "se1",
      "SELECT * FROM qt_src b WHERE EXISTS (SELECT a.key FROM qt_src a " +
        "WHERE b.value = a.value AND a.key = b.key AND a.value > 'val_9')"),
    QCase("subquery_exists.q", "se2",
      "SELECT * FROM (SELECT * FROM qt_src b WHERE EXISTS (SELECT a.key " +
        "FROM qt_src a WHERE b.value = a.value AND a.key = b.key AND " +
        "a.value > 'val_9')) a"),
    QCase("subquery_notin.q", "sn1",
      "SELECT * FROM qt_src WHERE key NOT IN (SELECT key FROM qt_src " +
        "s1 WHERE s1.key > '2')"),
    QCase("subquery_notin.q", "sn2",
      "SELECT p_mfgr, b.p_name, p_size FROM qt_part b WHERE b.p_name " +
        "NOT IN (SELECT p_name FROM (SELECT p_mfgr, p_name, p_size, " +
        "rank() OVER (PARTITION BY p_mfgr ORDER BY p_size) AS r FROM " +
        "qt_part) a WHERE r <= 2 AND b.p_mfgr = a.p_mfgr)",
      note = "correlated NOT IN over a windowed subquery"),

    QCase("join_nullsafe.q", "nsj1",
      "SELECT * FROM qt_null8 a JOIN qt_null8 b ON a.key <=> b.value",
      duck = Some("SELECT * FROM qt_null8 a JOIN qt_null8 b ON a.key " +
        "IS NOT DISTINCT FROM b.value"),
      note = "null-safe equality joins NULL keys to NULL values"),
    QCase("join_nullsafe.q", "nsj2",
      "SELECT * FROM qt_null8 a JOIN qt_null8 b ON a.key <=> b.value " +
        "JOIN qt_null8 c ON a.key = c.key",
      duck = Some("SELECT * FROM qt_null8 a JOIN qt_null8 b ON a.key " +
        "IS NOT DISTINCT FROM b.value JOIN qt_null8 c ON a.key = c.key"),
      note = "null-safe and plain equality mixed across a 3-way join"),
    QCase("join_nullsafe.q", "nsj3",
      "SELECT * FROM qt_null8 a LEFT OUTER JOIN qt_null8 b ON a.key " +
        "<=> b.value",
      duck = Some("SELECT * FROM qt_null8 a LEFT OUTER JOIN qt_null8 b " +
        "ON a.key IS NOT DISTINCT FROM b.value")),
    QCase("join_nullsafe.q", "nsj4",
      "SELECT * FROM qt_null8 a RIGHT OUTER JOIN qt_null8 b ON a.key " +
        "<=> b.value",
      duck = Some("SELECT * FROM qt_null8 a RIGHT OUTER JOIN qt_null8 " +
        "b ON a.key IS NOT DISTINCT FROM b.value")),
    QCase("join_nullsafe.q", "nsj5",
      "SELECT * FROM qt_null8 a FULL OUTER JOIN qt_null8 b ON a.key " +
        "<=> b.value",
      duck = Some("SELECT * FROM qt_null8 a FULL OUTER JOIN qt_null8 b " +
        "ON a.key IS NOT DISTINCT FROM b.value")),

    QCase("order_null.q", "n1",
      "SELECT a, b FROM qt_srcnull ORDER BY a ASC, b ASC",
      duck = Some("SELECT a, b FROM qt_srcnull ORDER BY a ASC NULLS " +
        "LAST, b ASC NULLS LAST"),
      note = "Hive default sorts NULL as LARGEST (hive.default.nulls." +
        "last=true, ref ql/util/NullOrdering.java): bare ASC is NULLS " +
        "LAST — order_null.q.out block 1 ends with the NULL row; " +
        "compared IN ORDER",
      ordered = true),
    QCase("order_null.q", "n2",
      "SELECT a, b FROM qt_srcnull ORDER BY a DESC, b DESC",
      duck = Some("SELECT a, b FROM qt_srcnull ORDER BY a DESC NULLS " +
        "FIRST, b DESC NULLS FIRST"),
      note = "bare DESC defaults NULLS FIRST (NULL = MAXVALUE) — " +
        "order_null.q.out block 2 starts with the NULL row",
      ordered = true),
    QCase("order_null.q", "n3",
      "SELECT a, b FROM qt_srcnull ORDER BY b ASC NULLS LAST, a ASC",
      duck = Some("SELECT a, b FROM qt_srcnull ORDER BY b ASC NULLS " +
        "LAST, a ASC NULLS LAST"),
      ordered = true),
    QCase("order_null.q", "n4",
      "SELECT a, b FROM qt_srcnull ORDER BY a DESC NULLS FIRST, " +
        "b DESC NULLS FIRST",
      ordered = true),
    QCase("order_null.q", "n5",
      "SELECT a, b, first_value(a) OVER (ORDER BY a) AS f FROM " +
        "qt_srcnull",
      duck = Some("SELECT a, b, first_value(a) OVER (ORDER BY a NULLS " +
        "LAST) AS f FROM qt_srcnull"),
      note = "the NULL-as-largest default reaches window-spec ORDER BY " +
        "too (ref ql/util/NullOrdering use in PTF translation): " +
        "first_value over a bare ASC ordering sees the non-NULL minimum"),
    QCase("cte_1.q", "ct1",
      "WITH q1 AS (SELECT key FROM qt_src WHERE key = '5') SELECT * " +
        "FROM q1"),
    QCase("cte_1.q", "ct2",
      "WITH q1 AS (SELECT key FROM qt_src WHERE key = '5') SELECT * " +
        "FROM (SELECT key FROM q1) a"),
    QCase("cte_1.q", "ct3",
      "WITH q1 AS (SELECT key FROM qt_src WHERE key = '5'), q2 AS " +
        "(SELECT key FROM q1) SELECT * FROM q2",
      note = "chained CTEs, backward reference"),
    QCase("cte_1.q", "ct4",
      "WITH q1 AS (SELECT key FROM q2 WHERE key = '5'), q2 AS (SELECT " +
        "key FROM qt_src WHERE key = '5') SELECT * FROM (SELECT key " +
        "FROM q1) a",
      duck = Some("WITH q2 AS (SELECT key FROM qt_src WHERE key = '5')" +
        ", q1 AS (SELECT key FROM q2 WHERE key = '5') SELECT * FROM " +
        "(SELECT key FROM q1) a"),
      note = "FORWARD CTE reference — Hive resolves WITH names " +
        "non-positionally (CteForwardRefs reorders at the front door); " +
        "the twin is pre-ordered"),
    QCase("nullgroup.q", "ng1",
      "SELECT count(1) AS n FROM qt_src x WHERE CAST(x.key AS INT) > 9999",
      note = "empty input, ungrouped count → one row of 0"),
    QCase("nullgroup.q", "ng2",
      "SELECT count(1) AS n FROM qt_src x WHERE CAST(x.key AS INT) > " +
        "9999 GROUP BY x.key",
      note = "empty input, grouped count → zero rows"),
    QCase("count.q", "cnt1",
      "SELECT a, count(DISTINCT b) AS db, count(DISTINCT c) AS dc, " +
        "sum(d) AS sd FROM qt_abcd GROUP BY a"),
    QCase("count.q", "cnt2",
      "SELECT count(1) AS c1, count(*) AS c2, count(a) AS c3, " +
        "count(DISTINCT a) AS c4, count(DISTINCT b) AS c5, " +
        "count(DISTINCT a, b) AS c6, count(DISTINCT a, b, c, d) AS c7 " +
        "FROM qt_abcd",
      duck = Some("SELECT count(1) AS c1, count(*) AS c2, count(a) AS " +
        "c3, count(DISTINCT a) AS c4, count(DISTINCT b) AS c5, (SELECT " +
        "count(*) FROM (SELECT DISTINCT a, b FROM qt_abcd WHERE a IS " +
        "NOT NULL AND b IS NOT NULL) t) AS c6, (SELECT count(*) FROM " +
        "(SELECT DISTINCT a, b, c, d FROM qt_abcd WHERE a IS NOT NULL " +
        "AND b IS NOT NULL AND c IS NOT NULL AND d IS NOT NULL) t) AS " +
        "c7 FROM qt_abcd"),
      note = "multi-column count(DISTINCT ...) skips any-null tuples; " +
        "DuckDB has no multi-arg form — the twin spells the definition"),

    QCase("subquery_scalar.q", "sc1",
      "SELECT p_partkey, p_size FROM qt_part WHERE p_size > (SELECT " +
        "avg(p_size) FROM qt_pnull)"),
    QCase("subquery_scalar.q", "sc2",
      "SELECT p_partkey FROM qt_part WHERE p_size > (SELECT * FROM " +
        "qt_tempty)",
      duck = Some("SELECT p_partkey FROM qt_part WHERE p_size > CAST(" +
        "(SELECT * FROM qt_tempty) AS INT)"),
      note = "scalar subquery over an EMPTY table is NULL → zero rows; " +
        "the int>string coercion is Hive's, the twin casts"),
    QCase("subquery_scalar.q", "sc3",
      "SELECT p_partkey FROM qt_part WHERE p_name = (SELECT p_name " +
        "FROM qt_pnull WHERE p_name IS NULL)",
      note = "= NULL-valued scalar → zero rows"),
    QCase("subquery_scalar.q", "sc4",
      "SELECT p_partkey FROM qt_part WHERE (SELECT i FROM qt_tnull " +
        "LIMIT 1) IS NULL",
      note = "NULL scalar under IS NULL keeps every row"),
    QCase("subquery_scalar.q", "sc5",
      "SELECT count(*) AS n FROM qt_part WHERE (SELECT max(p_name) " +
        "FROM qt_pnull) IS NOT NULL"),
    QCase("subquery_scalar.q", "sc6",
      "SELECT p_partkey, p_size FROM qt_part WHERE p_size BETWEEN " +
        "(SELECT min(p_size) FROM qt_part) AND (SELECT avg(p_size) " +
        "FROM qt_part)"),
    QCase("subquery_scalar.q", "sc7",
      "SELECT count(*) AS c FROM qt_part e WHERE p_size + 100 < " +
        "(SELECT max(p_partkey) FROM qt_part WHERE p_name = e.p_name)",
      note = "correlated scalar in a comparison"),
    QCase("subquery_scalar.q", "sc8",
      "SELECT p_partkey, p_size FROM qt_part WHERE p_size > (SELECT " +
        "avg(p_size) FROM qt_pnull WHERE qt_pnull.p_type = qt_part.p_type)",
      note = "empty correlated group → NULL → row dropped"),
    QCase("subquery_scalar.q", "sc9",
      "SELECT CAST(sum(p_retailprice) AS DECIMAL(20, 2)) AS s FROM " +
        "qt_part GROUP BY p_type HAVING sum(p_retailprice) > (SELECT " +
        "max(pp.p_retailprice) FROM qt_part pp)",
      note = "scalar subquery in HAVING"),
    QCase("subquery_scalar.q", "sc10",
      "SELECT key, count(*) AS c FROM qt_src WHERE value <> (SELECT " +
        "max(value) FROM qt_src) GROUP BY key HAVING count(*) > " +
        "(SELECT count(*) FROM qt_src s1 WHERE s1.key = '90' GROUP BY " +
        "s1.key)"),

    QCase("udf_case.q", "uf1",
      "SELECT CASE 1 WHEN 1 THEN 2 WHEN 3 THEN 4 ELSE 5 END AS c1, " +
        "CASE 2 WHEN 1 THEN 2 ELSE 5 END AS c2, " +
        "CASE 14 WHEN 12 THEN 13 WHEN 14 THEN 15 END AS c3, " +
        "CASE 16 WHEN 12 THEN 13 WHEN 14 THEN 15 END AS c4, " +
        "CASE 17 WHEN 18 THEN NULL WHEN 17 THEN 20 END AS c5, " +
        "CASE 21 WHEN 22 THEN 23 WHEN 21 THEN 24 END AS c6",
      hive = Some(Seq("2", "5", "15", "NULL", "20", "24"))),
    QCase("udf_when.q", "uf2",
      "SELECT CASE WHEN 1=1 THEN 2 WHEN 1=3 THEN 4 ELSE 5 END AS c1, " +
        "CASE WHEN 6=7 THEN 8 ELSE 9 END AS c2, " +
        "CASE WHEN 10=11 THEN 12 WHEN 13=13 THEN 14 END AS c3, " +
        "CASE WHEN 15=16 THEN 17 WHEN 18=19 THEN 20 END AS c4"),
    QCase("udf_coalesce.q", "uf3",
      "SELECT COALESCE(1) AS c1, COALESCE(1, 2) AS c2, " +
        "COALESCE(NULL, 2) AS c3, COALESCE(1, NULL) AS c4, " +
        "COALESCE(NULL, NULL, 3) AS c5, COALESCE(4, NULL, NULL, NULL) " +
        "AS c6, COALESCE('1', NULL) AS c7, COALESCE(NULL, NULL, '3') " +
        "AS c8, COALESCE(NULL, 2.0, 3.0) AS c9, COALESCE(2.0, NULL, " +
        "3.0) AS c10"),
    QCase("udf_if.q", "uf4",
      "SELECT IF(TRUE, 1, 2) AS c1, IF(FALSE, 1, 2) AS c2, " +
        "IF(NULL, 1, 2) AS c3, IF(TRUE, 'a', 'b') AS c4",
      duck = Some("SELECT CASE WHEN TRUE THEN 1 ELSE 2 END AS c1, " +
        "CASE WHEN FALSE THEN 1 ELSE 2 END AS c2, " +
        "CASE WHEN NULL THEN 1 ELSE 2 END AS c3, " +
        "CASE WHEN TRUE THEN 'a' ELSE 'b' END AS c4")),
    QCase("udf_nvl.q", "uf5",
      "SELECT NVL(1, 2) AS c1, NVL(NULL, 5) AS c2, NVL('x', 'y') AS c3, " +
        "NVL(NULL, 'z') AS c4",
      duck = Some("SELECT COALESCE(1, 2) AS c1, COALESCE(NULL, 5) AS " +
        "c2, COALESCE('x', 'y') AS c3, COALESCE(NULL, 'z') AS c4")),
    QCase("udf_instr.q", "uf6",
      "SELECT instr('abcd', 'abc') AS c1, instr('abcabc', 'ccc') AS c2, " +
        "instr(NULL, 'abc') AS c3, instr('abcd', NULL) AS c4, " +
        "instr('abcabc', 'bc') AS c5",
      note = "2-arg core; the numeric/boolean implicit-coercion columns " +
        "are Hive-coercion cases covered by TypeSystemSpec"),
    QCase("udf_concat.q", "uf7",
      "SELECT concat('a', 'b') AS c1, concat('a', 'b', 'c') AS c2, " +
        "concat('a', NULL) AS c3, concat('', '') AS c4",
      duck = Some("SELECT 'a' || 'b' AS c1, 'a' || 'b' || 'c' AS c2, " +
        "'a' || NULL AS c3, '' || '' AS c4"),
      note = "Hive concat is NULL-propagating, like || (DuckDB's " +
        "concat() is NULL-skipping — the twin uses ||)"),
    QCase("udf_lpad.q", "uf8",
      "SELECT lpad('hi', 5, '??') AS c1, lpad('hi', 1, '??') AS c2, " +
        "rpad('hi', 5, '??') AS c3, rpad('hi', 1, '??') AS c4",
      note = "udf_rpad.q folded in"),
    QCase("udf_trim.q", "uf9",
      "SELECT trim('   tech   ') AS c1, ltrim('   tech   ') AS c2, " +
        "rtrim('   tech   ') AS c3",
      note = "udf_ltrim.q/udf_rtrim.q folded in"),
    QCase("udf_substr.q", "uf10",
      "SELECT substr('ABCDEFG', 3, 4) AS c1, substr('ABCDEFG', 3) AS " +
        "c2, substr('ABC', 1, 2) AS c3, substr('ABC', 14) AS c4, " +
        "substr('ABC', 1, 100) AS c5, substr(NULL, 1) AS c6",
      note = "positive-position core; negative positions are " +
        "Hive-specific from-the-end semantics covered by f01"),
    QCase("udf_round.q", "uf11",
      "SELECT round(55555) AS c1, round(55555, 1) AS c2, " +
        "round(55555, -1) AS c3, round(55555, -2) AS c4, " +
        "round(55555, -6) AS c5, round(NULL) AS c6",
      hive = Some(Seq("55555", "55555", "55560", "55600", "0", "NULL"))),
    QCase("udf_round.q", "uf12",
      "SELECT round(125.315) AS c1, round(125.315, 1) AS c2, " +
        "round(125.315, 2) AS c3, round(125.315, -1) AS c4, " +
        "round(-125.315, 2) AS c5, round(3.141592653589793, 4) AS c6",
      hive = Some(Seq("125", "125.3", "125.32", "130", "-125.32",
        "3.1416"))),
    QCase("udf_greatest.q", "uf13",
      "SELECT GREATEST('a', 'b', 'c') AS c1, GREATEST('C', 'a', 'B') " +
        "AS c2, GREATEST('11', '2', '12') AS c3, GREATEST(NULL, 'b', " +
        "'c') AS c4, GREATEST('a', NULL, 'c') AS c5, " +
        "GREATEST(CAST(NULL AS STRING), NULL, NULL) AS c6",
      duck = Some("SELECT greatest('a', 'b', 'c') AS c1, greatest('C', " +
        "'a', 'B') AS c2, greatest('11', '2', '12') AS c3, CASE WHEN " +
        "NULL IS NULL THEN NULL ELSE greatest(NULL, 'b', 'c') END AS " +
        "c4, CASE WHEN NULL IS NULL THEN NULL ELSE greatest('a', NULL, " +
        "'c') END AS c5, CAST(NULL AS VARCHAR) AS c6"),
      note = "Hive GREATEST is NULL when ANY argument is NULL " +
        "(HIVE-12082) — Spark's builtin skips nulls; re-registered. " +
        "Third leg = the .q.out row",
      hive = Some(Seq("c", "a", "2", "NULL", "NULL", "NULL"))),
    QCase("udf_greatest.q", "uf14",
      "SELECT GREATEST(11, 13, 12) AS c1, GREATEST(1, -13, 2) AS c2, " +
        "GREATEST(NULL, 1, 2) AS c3, GREATEST(1, NULL, 2) AS c4",
      duck = Some("SELECT greatest(11, 13, 12) AS c1, greatest(1, -13, " +
        "2) AS c2, CAST(NULL AS INT) AS c3, CAST(NULL AS INT) AS c4"),
      hive = Some(Seq("13", "2", "NULL", "NULL"))),
    QCase("udf_least.q", "uf15",
      "SELECT LEAST('a', 'b', 'c') AS c1, LEAST('C', 'a', 'B') AS c2, " +
        "LEAST('11', '2', '12') AS c3, LEAST(NULL, 'b', 'c') AS c4, " +
        "LEAST('a', 'b', NULL) AS c5",
      duck = Some("SELECT least('a', 'b', 'c') AS c1, least('C', 'a', " +
        "'B') AS c2, least('11', '2', '12') AS c3, CAST(NULL AS " +
        "VARCHAR) AS c4, CAST(NULL AS VARCHAR) AS c5"),
      hive = Some(Seq("a", "B", "11", "NULL", "NULL"))),
    QCase("udf_least.q", "uf16",
      "SELECT LEAST(11, 13, 12) AS c1, LEAST(1, -13, 2) AS c2, " +
        "LEAST(NULL, 1, 2) AS c3",
      duck = Some("SELECT least(11, 13, 12) AS c1, least(1, -13, 2) AS " +
        "c2, CAST(NULL AS INT) AS c3"),
      hive = Some(Seq("11", "-13", "NULL"))),
    QCase("udf_elt.q", "uf17",
      "SELECT elt(2, 'abc', 'defg') AS c1, elt(3, 'aa', 'bb', 'cc', " +
        "'dd', 'ee', 'ff', 'gg') AS c2, elt('1', 'abc', 'defg') AS c3, " +
        "elt(NULL, 'abc', 'defg') AS c4, elt(0, 'abc', 'defg') AS c5, " +
        "elt(3, 'abc', 'defg') AS c6",
      duck = Some(""),
      note = "string-index coercion, NULL/out-of-range → NULL",
      hive = Some(Seq("defg", "cc", "abc", "NULL", "NULL", "NULL"))),
    QCase("udf_field.q", "uf18",
      "SELECT field('x', 'a', 'b', 'c', 'd') AS c1, field(NULL, 'a', " +
        "'b', 'c', 'd') AS c2, field(0, 1, 2, 3, 4) AS c3, field('a', " +
        "'a', 'b', 'c', 'd') AS c4, field('d', 'a', 'b', NULL, 'd') AS c5",
      duck = Some(""),
      hive = Some(Seq("0", "0", "0", "1", "4"))),
    QCase("udf_find_in_set.q", "uf19",
      "SELECT find_in_set('ab', 'ab,abc,abcde') AS c1, find_in_set(" +
        "'ab', 'abc,ab,bbb') AS c2, find_in_set('ab', 'def,abc,ab') AS " +
        "c3, find_in_set('ab', 'abc,abd,abf') AS c4, find_in_set(NULL, " +
        "'a,b,c') AS c5, find_in_set('a', NULL) AS c6, find_in_set('', " +
        "',') AS c7, find_in_set('', 'a,,b') AS c8, find_in_set('a', " +
        "'') AS c9",
      duck = Some(""),
      hive = Some(Seq("1", "2", "3", "0", "NULL", "NULL", "1", "2", "0"))),
    QCase("udf_format_number.q", "uf20",
      "SELECT format_number(12332.123456, 4) AS c1, " +
        "format_number(12332.1, 4) AS c2, format_number(12332.2, 0) AS c3",
      duck = Some(""),
      note = "grouped-thousands rendering per the reference's .q.out",
      hive = Some(Seq("12,332.1235", "12,332.1000", "12,332"))),
    QCase("udf_translate.q", "uf21",
      "SELECT translate('abcd', 'ab', '12') AS c1, translate('abcd', " +
        "'abc', '12') AS c2, translate(NULL, 'ab', '12') AS c3, " +
        "translate('abcd', NULL, '12') AS c4, translate('abcd', 'ab', " +
        "NULL) AS c5, translate('abcd', 'aba', '123') AS c6",
      duck = Some(""),
      note = "unmatched from-chars delete; FIRST mapping wins on " +
        "duplicate from-chars",
      hive = Some(Seq("12cd", "12d", "NULL", "NULL", "NULL", "12cd"))),
    QCase("udf_date_add.q", "uf22",
      "SELECT date_add('1900-01-01', 10) AS c1, date_sub('1900-01-01', " +
        "10) AS c2, datediff('2009-07-30', '2009-07-28') AS c3",
      duck = Some("SELECT DATE '1900-01-01' + 10 AS c1, DATE " +
        "'1900-01-01' - 10 AS c2, datediff('day', DATE '2009-07-28', " +
        "DATE '2009-07-30') AS c3"),
      note = "udf_date_sub.q/udf_datediff.q folded in",
      hive = Some(Seq("1900-01-11", "1899-12-22", "2"))),
    QCase("udf_pmod.q", "uf23",
      "SELECT pmod(3, 2) AS c1, pmod(-7, 3) AS c2, pmod(7, -3) AS c3",
      duck = Some("SELECT ((3 % 2) + 2) % 2 AS c1, ((-7 % 3) + 3) % 3 " +
        "AS c2, ((7 % -3) + -3) % -3 AS c3"),
      note = "the twin is pmod's definition"),
    QCase("udf_regexp_extract.q", "uf24",
      "SELECT regexp_extract('100-200', '([0-9]+)-([0-9]+)', 1) AS c1, " +
        "regexp_extract('100-200', '([0-9]+)-([0-9]+)', 2) AS c2, " +
        "regexp_extract('foo', '([0-9]+)', 1) AS c3",
      note = "no-match → empty string in both engines"),
    QCase("udf_regexp_replace.q", "uf25",
      "SELECT regexp_replace('100-200', '([0-9]+)', 'z') AS c1, " +
        "regexp_replace('abc', 'b', '') AS c2",
      duck = Some("SELECT regexp_replace('100-200', '([0-9]+)', 'z', " +
        "'g') AS c1, regexp_replace('abc', 'b', '', 'g') AS c2"),
      note = "Hive/Spark replace ALL matches; DuckDB needs the g flag"),
    QCase("udf_get_json_object.q", "gj1",
      "SELECT get_json_object(json, '$.store.book[0].category') AS c1, " +
        "get_json_object(json, '$.store.book[*].category') AS c2, " +
        "get_json_object(json, '$.store.book[*].isbn') AS c3, " +
        "get_json_object(json, '$.store.book[*].reader') AS c4 " +
        "FROM qt_json",
      duck = Some(""),
      note = "[*] wildcard paths — Hive JSON-path dialect, gated purely " +
        "on the committed .q.out",
      hive = Some(Seq("reference", "[\"reference\",\"fiction\",\"fiction\"]",
        "[\"0-553-21311-3\",\"0-395-19395-8\"]",
        "[{\"age\":25,\"name\":\"bob\"},{\"age\":26,\"name\":\"jack\"}]"))),
    QCase("udf_get_json_object.q", "gj2",
      "SELECT get_json_object(json, '$.store.book[*].reader[0].age') AS " +
        "c1, get_json_object(json, '$.store.book[*].reader[*].age') AS " +
        "c2 FROM qt_json",
      duck = Some(""),
      hive = Some(Seq("25", "[25,26]"))),
    QCase("udf_get_json_object.q", "gj3",
      "SELECT get_json_object(json, '$.store.basket[0][1]') AS c1, " +
        "get_json_object(json, '$.store.basket[*][0]') AS c2, " +
        "get_json_object(json, '$.store.basket[0][*]') AS c3, " +
        "get_json_object(json, '$.store.basket[0][2].b') AS c4, " +
        "get_json_object(json, '$.store.basket[0][*].b') AS c5 " +
        "FROM qt_json",
      duck = Some(""),
      note = "nested-array indexing and wildcards",
      hive = Some(Seq("2", "[1,3,5]",
        "[1,2,{\"b\":\"y\",\"a\":\"x\"}]", "y", "[\"y\"]"))),
    QCase("udf_get_json_object.q", "gj4",
      "SELECT get_json_object(json, '$.non_exist_key') AS c1, " +
        "get_json_object(json, '$.store.book[10]') AS c2, " +
        "get_json_object(json, '$.store.book[0].non_exist_key') AS c3, " +
        "get_json_object(json, '$.zip code') AS c4, " +
        "get_json_object(json, '$.fb:testid') AS c5 FROM qt_json",
      duck = Some(""),
      note = "missing keys/indexes → NULL; keys with spaces and colons",
      hive = Some(Seq("NULL", "NULL", "NULL", "94025", "1234"))),

    QCase("udf_repeat.q", "uf26",
      "SELECT repeat('abc', 2) AS c1, repeat('abc', 0) AS c2, " +
        "reverse('abc') AS c3, ascii('0') AS c4, ascii('A') AS c5",
      note = "udf_reverse.q/udf_ascii.q folded in"),

    QCase("groupby_position.q", "gp1",
      "SELECT key, count(DISTINCT substr(value, 5)) AS c FROM qt_src " +
        "WHERE CAST(key AS INT) < 20 GROUP BY 1",
      note = "ordinal GROUP BY"),
    QCase("groupby_position.q", "gp2",
      "SELECT key, value, count(DISTINCT substr(value, 5)) AS c FROM " +
        "qt_src WHERE CAST(key AS INT) < 20 GROUP BY 2, 1",
      note = "ordinals out of select order"),
    QCase("order.q", "o1",
      "SELECT x.* FROM qt_src x ORDER BY key LIMIT 10",
      note = "string-ordered keys; tied keys carry identical rows, so " +
        "the LIMIT multiset is deterministic"),
    QCase("order.q", "o2",
      "SELECT x.* FROM qt_src x ORDER BY key DESC LIMIT 10"),
    QCase("order2.q", "o3",
      "SELECT subq.key, subq.value FROM (SELECT x.* FROM qt_src x ORDER " +
        "BY key LIMIT 10) subq WHERE CAST(subq.key AS INT) < 10",
      note = "LIMIT-then-filter subquery: the outer filter must apply " +
        "AFTER the inner top-10"),
    QCase("union5.q", "u4",
      "SELECT unionsrc.key AS key, count(1) AS c FROM (SELECT 'tst1' AS " +
        "key, count(1) AS value FROM qt_src s1 UNION ALL SELECT 'tst2' " +
        "AS key, count(1) AS value FROM qt_src s2) unionsrc " +
        "GROUP BY unionsrc.key"),

    QCase("union2.q", "u1",
      "SELECT count(1) AS c FROM (SELECT s1.key AS key, s1.value AS " +
        "value FROM qt_src s1 UNION ALL SELECT s2.key AS key, s2.value " +
        "AS value FROM qt_src s2) unionsrc"),
    QCase("union3.q", "u2",
      "SELECT * FROM (SELECT 1 AS id FROM (SELECT * FROM qt_src LIMIT 1)" +
        " s1 UNION ALL SELECT 2 AS id FROM (SELECT * FROM qt_src LIMIT 1" +
        ") s2 UNION ALL SELECT 3 AS id FROM (SELECT * FROM qt_src LIMIT " +
        "1) s3 UNION ALL SELECT 4 AS id FROM (SELECT * FROM qt_src " +
        "LIMIT 1) s4 CLUSTER BY id) a",
      duck = Some("SELECT * FROM (SELECT 1 AS id FROM (SELECT * FROM " +
        "qt_src LIMIT 1) s1 UNION ALL SELECT 2 AS id FROM (SELECT * " +
        "FROM qt_src LIMIT 1) s2 UNION ALL SELECT 3 AS id FROM (SELECT " +
        "* FROM qt_src LIMIT 1) s3 UNION ALL SELECT 4 AS id FROM " +
        "(SELECT * FROM qt_src LIMIT 1) s4) a"),
      note = "CLUSTER BY kept on the engine side; results compare sorted"),
    QCase("union7.q", "u3",
      "SELECT unionsrc.key AS key, count(1) AS c FROM (SELECT 'tst1' AS " +
        "key, CAST(count(1) AS STRING) AS value FROM qt_src s1 UNION ALL " +
        "SELECT s2.key AS key, s2.value AS value FROM qt_src1 s2) " +
        "unionsrc GROUP BY unionsrc.key",
      duck = Some("SELECT unionsrc.key AS key, count(1) AS c FROM " +
        "(SELECT 'tst1' AS key, CAST(count(1) AS VARCHAR) AS value FROM " +
        "qt_src s1 UNION ALL SELECT s2.key AS key, s2.value AS value " +
        "FROM qt_src1 s2) unionsrc GROUP BY unionsrc.key")))


  test("qtest conformance: groupby family (incl. having, srcpart ppr, " +
      "ordinal GROUP BY)") {
    run("groupby1", "groupby2", "groupby3", "groupby4", "groupby6",
      "having", "groupby_ppr", "groupby_position")
  }
  test("qtest conformance: order-by family (incl. NULL ordering)") {
    run("order")
  }
  test("qtest conformance: CTEs, empty-group counts, multi-distinct " +
      "counts") {
    run("cte_", "nullgroup", "count.q")
  }
  test("qtest conformance: rollup / cube / grouping sets (GROUPING__ID)") {
    run("groupby_rollup", "groupby_cube", "groupby_grouping_sets")
  }
  test("qtest conformance: join family (inner, 3-way, outer, srcpart)") {
    run("join")
  }
  test("qtest conformance: semijoin family") {
    run("semijoin", "leftsemijoin")
  }
  test("qtest conformance: lateral view family (incl. OUTER)") {
    run("lateral_view")
  }
  test("qtest conformance: windowing family") {
    run("windowing")
  }
  test("qtest conformance: union family") {
    run("union")
  }
  test("qtest conformance: subquery family (IN/EXISTS/NOT IN, correlated)") {
    run("subquery")
  }
  test("qtest conformance: scalar function family (udf_*.q, with .q.out " +
      "third leg where Spark+DuckDB could jointly diverge)") {
    run("udf_")
  }
}

