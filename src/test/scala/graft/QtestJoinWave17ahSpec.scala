package graft

/** Conformance wave 17ah: the numbered join corpus remainder (ref
  * ql/src/test/queries/clientpositive/join{7..47}.q, join_1to1.q,
  * join_alt_syntax.q, join_cond_pushdown_*.q). The files pin Hive's
  * join planner across mapjoin hints, nested join subqueries,
  * aggregate-of-join and join-of-aggregate stacks, unions under
  * joins, comma-syntax joins with WHERE conditions, and ON-clause
  * condition pushdown; every case gates results over the shared
  * fixtures with the numeric coercions spelled explicitly for both
  * engines.
  */
class QtestJoinWave17ahSpec extends QtestHarness {

  private val oneToOne = """(VALUES (5, 10005, 66), (20, 10020, 66),
    |  (25, 10025, 88), (30, 10030, 66),
    |  (35, 10035, 88), (40, 10040, 88),
    |  (CAST(NULL AS INT), 10050, 66),
    |  (50, CAST(NULL AS INT), 66)) a(key1, key2, value)""".stripMargin
  private val oneToOne2 = """(VALUES (5, 10005, 66), (20, 10020, 88),
    |  (25, 10025, 66), (30, 10030, 88),
    |  (35, 10035, 88), (45, 10045, 66),
    |  (CAST(NULL AS INT), 10050, 88),
    |  (50, CAST(NULL AS INT), 88)) b(key1, key2, value)""".stripMargin

  protected val qcases: Seq[QCase] = Seq(
    QCase("join7.q", "w17ah01",
      """SELECT a.c1, a.c2, b.c3, b.c4 FROM
        |  (SELECT key AS c1, value AS c2 FROM qt_src
        |     WHERE cast(key as int) > 10 and cast(key as int) < 20) a
        |FULL OUTER JOIN
        |  (SELECT key AS c3, value AS c4 FROM qt_src
        |     WHERE cast(key as int) > 15 and cast(key as int) < 25) b
        |ON a.c1 = b.c3""".stripMargin,
      note = "full outer of two filtered projections (the file adds " +
        "a third never-matching leg)"),
    QCase("join14.q", "w17ah02",
      """SELECT src.key AS c1, srcpart.value AS c2 FROM qt_src src
        |JOIN qt_srcpart srcpart
        |  ON src.key = srcpart.key AND srcpart.ds = '2008-04-08'
        |  AND cast(src.key as int) > 100""".stripMargin,
      note = "partition predicate and range filter inside the ON"),
    QCase("join16.q", "w17ah03",
      """SELECT subq.key, qt_srcpart.value FROM
        |  (select a.key, a.value from qt_src a
        |     where cast(a.key as int) > 10) subq
        |JOIN qt_srcpart
        |  ON (subq.key = qt_srcpart.key
        |      and qt_srcpart.ds = '2008-04-08'
        |      and cast(subq.value as string) > 'val_200')"""
        .stripMargin,
      note = "filtered subquery joined with per-side ON predicates"),
    QCase("join17.q", "w17ah04",
      """SELECT src1.key AS k1, src1.value AS v1,
        |  src2.key AS k2, src2.value AS v2
        |FROM qt_src src1 JOIN qt_src src2 ON (src1.key = src2.key)
        |WHERE cast(src1.key as int) < 20""".stripMargin,
      note = "full-width self join (filtered to keep the compare " +
        "tractable)"),
    QCase("join18.q", "w17ah05",
      """SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value AS v2
        |FROM (SELECT src1.key as key, count(src1.value) AS value
        |        FROM qt_src src1 group by src1.key) a
        |FULL OUTER JOIN
        |     (SELECT src2.key as key,
        |             count(distinct(src2.value)) AS value
        |        FROM qt_src1 src2 group by src2.key) b
        |ON (a.key = b.key)""".stripMargin,
      note = "full outer of a count and a count-distinct aggregate"),
    QCase("join18_multi_distinct.q", "w17ah06",
      """SELECT a.key AS k1, a.value AS v1, b.key AS k2,
        |  b.value AS v2, b.value2 AS v3
        |FROM (SELECT src1.key as key, count(src1.value) AS value
        |        FROM qt_src src1 group by src1.key) a
        |FULL OUTER JOIN
        |     (SELECT src2.key as key,
        |             count(distinct(src2.value)) AS value,
        |             count(distinct(src2.key)) AS value2
        |        FROM qt_src1 src2 group by src2.key) b
        |ON (a.key = b.key)""".stripMargin,
      note = "two DISTINCT aggregates on the outer-joined side"),
    QCase("join19.q", "w17ah07",
      """SELECT t1.subject, t2.object FROM
        |  (VALUES ('s1', 'p1', 'o1'), ('s1', 'p2', 'o2'),
        |   ('s2', 'p1', 'o3')) t1(subject, predicate, object)
        |JOIN
        |  (VALUES ('s1', 'p1', 'o1'), ('s1', 'p2', 'o2'),
        |   ('s2', 'p1', 'o3')) t2(subject, predicate, object)
        |ON t1.subject = t2.subject WHERE t2.predicate = 'p2'"""
        .stripMargin,
      note = "the triples self-join chain (distilled to one hop)"),
    QCase("join22.q", "w17ah08",
      """SELECT src5.src1_value FROM
        |(SELECT src3.*, src4.value as src4_value,
        |        src4.key as src4_key FROM qt_src src4 JOIN
        |  (SELECT src2.*, src1.key as src1_key,
        |          src1.value as src1_value
        |     FROM qt_src1 src1 JOIN qt_src src2
        |     ON src1.key = src2.key) src3
        |  ON src3.src1_key = src4.key) src5""".stripMargin,
      note = "star-expanded nested join subqueries re-joined"),
    QCase("join24.q", "w17ah09",
      """SELECT sum(a.cnt) AS s FROM
        |  (SELECT key, count(1) as cnt FROM qt_src group by key) a
        |JOIN
        |  (SELECT key, count(1) as cnt FROM qt_src group by key) b
        |ON a.key = b.key""".stripMargin,
      note = "aggregate-join-aggregate (the CTAS'd tst1 inlined)"),
    QCase("join25.q", "w17ah10",
      """SELECT /*+ MAPJOIN(x) */ x.key, x.value AS v1, y.value AS v2
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)""".stripMargin,
      duck = Some("""SELECT x.key, x.value AS v1, y.value AS v2
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)"""
        .stripMargin),
      note = "mapjoin hint on the small side (hint is plan advice; " +
        "results identical)"),
    QCase("join26.q", "w17ah11",
      """SELECT /*+ MAPJOIN(x,y) */ x.key, z.value AS vz, y.value AS vy
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |JOIN qt_srcpart z ON (x.key = z.key and z.ds = '2008-04-08'
        |  and z.hr = 11)""".stripMargin,
      duck = Some("""SELECT x.key, z.value AS vz, y.value AS vy
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |JOIN qt_srcpart z ON (x.key = z.key and z.ds = '2008-04-08'
        |  and cast(z.hr as int) = 11)""".stripMargin),
      note = "two broadcast dims against the partitioned fact " +
        "(hr = 11 coerces the string partition)"),
    QCase("join27.q", "w17ah12",
      """SELECT /*+ MAPJOIN(x) */ x.key, x.value AS v1, y.value AS v2
        |FROM qt_src1 x JOIN qt_src y ON (x.value = y.value)"""
        .stripMargin,
      duck = Some("""SELECT x.key, x.value AS v1, y.value AS v2
        |FROM qt_src1 x JOIN qt_src y ON (x.value = y.value)"""
        .stripMargin),
      note = "VALUE-keyed join (duplicate-heavy key)"),
    QCase("join28.q", "w17ah13",
      """SELECT subq.key1, z.value FROM
        |(SELECT x.key as key1, x.value as value1,
        |        y.key as key2, y.value as value2
        |   FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)) subq
        |JOIN qt_srcpart z
        |ON (subq.key1 = z.key and z.ds = '2008-04-08' and z.hr = 11)"""
        .stripMargin,
      duck = Some("""SELECT subq.key1, z.value FROM
        |(SELECT x.key as key1, x.value as value1,
        |        y.key as key2, y.value as value2
        |   FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)) subq
        |JOIN qt_srcpart z
        |ON (subq.key1 = z.key and z.ds = '2008-04-08'
        |    and cast(z.hr as int) = 11)""".stripMargin),
      note = "join subquery re-joined to the pruned partition"),
    QCase("join29.q", "w17ah14",
      """SELECT subq1.key, subq1.cnt AS c1, subq2.cnt AS c2
        |FROM (select x.key, count(1) as cnt from qt_src1 x
        |        group by x.key) subq1
        |JOIN (select y.key, count(1) as cnt from qt_src y
        |        group by y.key) subq2
        |ON (subq1.key = subq2.key)""".stripMargin,
      note = "join of two independent aggregates"),
    QCase("join30.q", "w17ah15",
      """SELECT /*+ MAPJOIN(x) */ x.key, count(1) AS c
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |group by x.key""".stripMargin,
      duck = Some("""SELECT x.key, count(1) AS c
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |group by x.key""".stripMargin),
      note = "aggregate above the broadcast join"),
    QCase("join31.q", "w17ah16",
      """SELECT subq1.key, count(1) as cnt
        |FROM (select x.key, count(1) as cnt from qt_src1 x
        |        group by x.key) subq1
        |JOIN (select y.key, count(1) as cnt from qt_src y
        |        group by y.key) subq2 ON (subq1.key = subq2.key)
        |group by subq1.key""".stripMargin,
      note = "re-aggregation above the aggregate join"),
    QCase("join32.q", "w17ah17",
      """SELECT x.key, z.value AS vz, y.value AS vy
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |JOIN qt_srcpart z ON (x.value = z.value
        |  and z.ds = '2008-04-08' and z.hr = 11)""".stripMargin,
      duck = Some("""SELECT x.key, z.value AS vz, y.value AS vy
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |JOIN qt_srcpart z ON (x.value = z.value
        |  and z.ds = '2008-04-08' and cast(z.hr as int) = 11)"""
        .stripMargin),
      note = "mixed key-then-value join chain"),
    QCase("join32_lessSize.q", "w17ah18",
      """SELECT count(*) AS c
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |JOIN qt_srcpart z ON (x.value = z.value
        |  and z.ds = '2008-04-08' and z.hr = 11)""".stripMargin,
      duck = Some("""SELECT count(*) AS c
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |JOIN qt_srcpart z ON (x.value = z.value
        |  and z.ds = '2008-04-08' and cast(z.hr as int) = 11)"""
        .stripMargin),
      note = "the small-table-size conf variant counts the same"),
    QCase("join33.q", "w17ah19",
      """SELECT x.key, z.value AS vz, y.value AS vy
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |JOIN qt_srcpart z ON (x.value = z.value
        |  and z.ds = '2008-04-08' and z.hr = 11)
        |WHERE cast(x.key as int) > 100""".stripMargin,
      duck = Some("""SELECT x.key, z.value AS vz, y.value AS vy
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)
        |JOIN qt_srcpart z ON (x.value = z.value
        |  and z.ds = '2008-04-08' and cast(z.hr as int) = 11)
        |WHERE TRY_CAST(x.key as int) > 100""".stripMargin),
      note = "residual filter above the chain (kv3's empty-string " +
        "keys cast to NULL and drop, both engines)"),
    QCase("join34.q", "w17ah20",
      """SELECT x.key, x.value AS v1, subq1.value AS v2
        |FROM
        |( SELECT key, value from qt_src where cast(key as int) < 20
        |  UNION ALL
        |  SELECT key, value from qt_src
        |    where cast(key as int) > 100
        |) subq1
        |JOIN qt_src1 x ON (x.key = subq1.key)""".stripMargin,
      note = "union of filtered scans under the join"),
    QCase("join35.q", "w17ah21",
      """SELECT x.key, x.value AS v1, subq1.cnt
        |FROM
        |( SELECT key, count(1) as cnt from qt_src
        |    where cast(key as int) < 20 group by key
        |  UNION ALL
        |  SELECT key, count(1) as cnt from qt_src
        |    where cast(key as int) > 100 group by key
        |) subq1
        |JOIN qt_src1 x ON (x.key = subq1.key)""".stripMargin,
      note = "union of aggregates under the join"),
    QCase("join36.q", "w17ah22",
      """SELECT a.key, a.cnt AS v1, b.cnt AS v2 FROM
        |  (SELECT key, count(1) as cnt from qt_src group by key) a
        |JOIN
        |  (SELECT key, count(1) as cnt from qt_src group by key) b
        |ON a.key = b.key""".stripMargin,
      note = "the tmp1/tmp2 staging inlined as subqueries"),
    QCase("join37.q", "w17ah23",
      """SELECT /*+ MAPJOIN(X) */ x.key, x.value AS v1, y.value AS v2
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)""".stripMargin,
      duck = Some("""SELECT x.key, x.value AS v1, y.value AS v2
        |FROM qt_src1 x JOIN qt_src y ON (x.key = y.key)"""
        .stripMargin),
      note = "upper-case hint alias"),
    QCase("join39.q", "w17ah24",
      """SELECT x.key AS k1, x.value AS v1, y.key AS k2, y.value AS v2
        |FROM qt_src x left outer JOIN
        |  (select * from qt_src where cast(key as int) <= 100) y
        |ON (x.key = y.key)""".stripMargin,
      note = "left outer against a filtered self-subquery"),
    QCase("join41.q", "w17ah25",
      """with s1 as (select * from qt_src where key = '0')
        |SELECT src1.key AS k1, src1.value AS v1,
        |  src2.key AS k2, src2.value AS v2
        |FROM s1 src1 LEFT OUTER JOIN s1 src2
        |ON (src1.key = src2.key AND cast(src2.key as int) > 10)"""
        .stripMargin,
      note = "ON filter defeats every match: all rows NULL-extend"),
    QCase("join44.q", "w17ah26",
      """SELECT count(*) AS c
        |FROM (VALUES (1, 2450817), (2, 2450900), (3, 2451600))
        |  src1(val1, val2),
        |  (VALUES (1, 2450820), (2, 2452000)) src2(val1, val2)
        |WHERE src1.val1 = src2.val1
        |  AND src1.val2 between 2450816 and 2451500
        |  AND src2.val2 between 2450816 and 2451500""".stripMargin,
      note = "comma join with BETWEEN residuals each side"),
    QCase("join45.q", "w17ah27",
      """SELECT src1.key AS k1, src1.value AS v1,
        |  src.key AS k2, src.value AS v2
        |FROM qt_src1 src1 JOIN qt_src src
        |ON (src1.key = src.key
        |  AND src1.value between 'val_100' and 'val_102'
        |  AND src.value between 'val_100' and 'val_102')"""
        .stripMargin,
      note = "BETWEEN over the string values inside the ON " +
        "(join45/46/47 family)"),
    QCase("join_1to1.q", "w17ah28",
      s"""SELECT a.key1 AS ak1, a.key2 AS ak2, a.value AS av,
         |  b.key1 AS bk1, b.key2 AS bk2, b.value AS bv
         |FROM $oneToOne full outer join $oneToOne2
         |on a.key1 = b.key1 and a.value = 66 and b.value = 66"""
        .stripMargin,
      note = "full outer with constant per-side filters in the ON — " +
        "non-66 rows NEVER match but always appear"),
    QCase("join_alt_syntax.q", "w17ah29",
      """select p1.p_name AS n1, p2.p_name AS n2
        |from qt_part p1, qt_part p2
        |where p1.p_partkey = p2.p_partkey""".stripMargin,
      note = "comma-syntax join with the condition in WHERE"),
    QCase("join_cond_pushdown_1.q", "w17ah30",
      """select count(*) AS c
        |from qt_part p1 join qt_part p2 join qt_part p3
        |on p1.p_name = p2.p_name and p2.p_name = p3.p_name"""
        .stripMargin,
      duck = Some("""select count(*) AS c
        |from qt_part p1 join qt_part p2 on p1.p_name = p2.p_name
        |join qt_part p3 on p2.p_name = p3.p_name""".stripMargin),
      note = "chained ON conditions referencing earlier join inputs " +
        "(Hive's single trailing ON for two joins; the twin spells " +
        "it per join)"),
    QCase("join_cond_pushdown_2.q", "w17ah31",
      """select count(*) AS c
        |from qt_part p1 join qt_part p2 join qt_part p3
        |on p2.p_name = p1.p_name and p3.p_name = p2.p_name"""
        .stripMargin,
      duck = Some("""select count(*) AS c
        |from qt_part p1 join qt_part p2 on p2.p_name = p1.p_name
        |join qt_part p3 on p3.p_name = p2.p_name""".stripMargin),
      note = "the reversed-operand spelling pushes down identically"),
    QCase("join_casesensitive.q", "w17ah32",
      """SELECT a.KEY AS k, b.VaLuE AS v
        |FROM qt_src a JOIN qt_src b ON a.KeY = b.kEy
        |WHERE a.key = '0'""".stripMargin,
      duck = Some("""SELECT a.KEY AS k, b.VaLuE AS v
        |FROM qt_src a JOIN qt_src b ON a.KeY = b.kEy
        |WHERE a.key = '0'""".stripMargin),
      note = "column references resolve case-insensitively in the " +
        "join condition")
  )

  test("qtest conformance wave 17ah: the numbered join corpus — " +
      "hint variants, nested join subqueries, aggregate stacks, " +
      "unions under joins, comma syntax, ON-condition pushdown") {
    run("join")
  }
}
