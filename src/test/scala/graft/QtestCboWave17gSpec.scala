package graft

/** Conformance wave 17g: the cbo_* logic corpus over its canonical
  * whitespace-variant 20-row tables (cbo_t1/t2/t3 — ' 1 ', '1 ' and
  * '1' are DISTINCT string join keys but numerically equal once
  * coerced) — simple selects with mixed-type predicates
  * (cbo_simple_select.q), aggregation over re-grouped derived tables
  * (cbo_gby.q), constant-key aggregates and union legs
  * (cbo_gby_empty.q), the join matrix with derived subqueries
  * (cbo_join.q), semi joins chained into outer joins
  * (cbo_semijoin.q), ordered-limit nests (cbo_limit.q), union trees
  * (cbo_union.q), the UDAF block with DISTINCT forms
  * (cbo_udf_udaf.q), interval constructors under CBO folding
  * (cbo_const.q), and CASE string comparison (cbo_case_when_type_
  * conversion.q).
  *
  * Porting notes: Hive's `==` spells `=` in the twins; string-vs-int
  * predicates coerce numerically in both engines (Hive via double,
  * DuckDB via int — same outcomes on these values); interval VALUES
  * compare through application to a timestamp, as in wave 17c.
  */
class QtestCboWave17gSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("cbo_simple_select.q", "w17g01",
      "select key, value, c_int, c_float, c_boolean, dt from qt_cbot1",
      note = "bare star (spelled) keeps whitespace-variant keys and " +
        "the NULL rows distinct"),

    QCase("cbo_simple_select.q", "w17g02",
      """select cbo_t1.key as x, c_int as c_int,
        |  (((c_int+c_float)*10)+5) as y from qt_cbot1 cbo_t1"""
        .stripMargin),

    QCase("cbo_simple_select.q", "w17g03",
      """select key, c_int from qt_cbot1 as cbo_t2
        |where cbo_t2.c_int >= 0 and c_float+c_int >= 0
        |   or c_float <= 100""".stripMargin,
      note = "re-aliasing a table to another fixture's name resolves " +
        "to the alias"),

    QCase("cbo_gby.q", "w17g04",
      """select key, (c_int+1)+2 as x, sum(c_int) AS s
        |from qt_cbot1 group by c_float, qt_cbot1.c_int, key"""
        .stripMargin,
      note = "select items reference a SUBSET of the grouping keys"),

    QCase("cbo_gby.q", "w17g05",
      """select x, y, count(*) AS c from (select key,
        |  (c_int+c_float+1+2) as x, sum(c_int) as y from qt_cbot1
        |  group by c_float, qt_cbot1.c_int, key) R
        |group by y, x""".stripMargin,
      note = "re-grouping a grouped derived table"),

    QCase("cbo_gby_empty.q", "w17g06",
      """select unionsrc.key AS k, unionsrc.value AS v FROM
        |(select 'tst1' as key, count(1) as value from qt_src) unionsrc"""
        .stripMargin,
      note = "constant key over a group-less aggregate"),

    QCase("cbo_gby_empty.q", "w17g07",
      """select unionsrc.key AS k FROM (
        |  select 'max' as key, max(c_int) as value from qt_cbot3 s1
        |  UNION ALL
        |  select 'min' as key, min(c_int) as value from qt_cbot3 s2
        |  UNION ALL
        |  select 'avg' as key, avg(c_int) as value from qt_cbot3 s3)
        |  unionsrc order by unionsrc.key""".stripMargin, ordered = true,
      note = "three group-less aggregate legs unioned (int legs widen " +
        "against the avg leg)"),

    QCase("cbo_join.q", "w17g08",
      """select cbo_t1.c_int AS a, cbo_t2.c_int AS b
        |from qt_cbot1 cbo_t1 join qt_cbot2 cbo_t2
        |on cbo_t1.key = cbo_t2.key""".stripMargin,
      note = "string-key equi join: whitespace variants only meet " +
        "themselves"),

    QCase("cbo_join.q", "w17g09",
      """select cbo_t1.key AS k from qt_cbot1 cbo_t1
        |join qt_cbot3 cbo_t3
        |where cbo_t1.key = cbo_t3.key and cbo_t1.key >= 1"""
        .stripMargin,
      duck = Some("""select cbo_t1.key AS k from qt_cbot1 cbo_t1
        |cross join qt_cbot3 cbo_t3
        |where cbo_t1.key = cbo_t3.key
        |  and CAST(cbo_t1.key AS DOUBLE) >= 1""".stripMargin),
      note = "comma-free cross join narrowed by a WHERE equi " +
        "predicate + the numeric coercion filter (key >= 1 admits " +
        "the whitespace variants)"),

    QCase("cbo_join.q", "w17g10",
      """select cbo_t1.c_int AS a, cbo_t2.c_int AS b
        |from qt_cbot1 cbo_t1 full outer join qt_cbot2 cbo_t2
        |on cbo_t1.key = cbo_t2.key""".stripMargin,
      note = "full outer over the NULL-bearing keys"),

    QCase("cbo_join.q", "w17g11",
      """select b, cbo_t1.c, cbo_t2.p, q, cbo_t3.c_int AS ci
        |from (select key as a, c_int as b, cbo_t1.c_float as c
        |      from qt_cbot1 cbo_t1) cbo_t1
        |join (select cbo_t2.key as p, cbo_t2.c_int as q, c_float as r
        |      from qt_cbot2 cbo_t2) cbo_t2 on cbo_t1.a = p
        |join qt_cbot3 cbo_t3 on cbo_t1.a = key""".stripMargin,
      note = "three-way join through derived-table aliases"),

    QCase("cbo_semijoin.q", "w17g12",
      """select cbo_t1.c_int AS a from qt_cbot1 cbo_t1
        |left semi join qt_cbot2 cbo_t2 on cbo_t1.key = cbo_t2.key"""
        .stripMargin,
      duck = Some("""select cbo_t1.c_int AS a from qt_cbot1 cbo_t1
        |where exists (select 1 from qt_cbot2 cbo_t2
        |  where cbo_t1.key = cbo_t2.key)""".stripMargin)),

    QCase("cbo_semijoin.q", "w17g13",
      """select cbo_t1.c_int AS a from qt_cbot1 cbo_t1
        |left semi join qt_cbot2 cbo_t2 on cbo_t1.key = cbo_t2.key
        |where (cbo_t1.c_int + 1 == 2)
        |  and (cbo_t1.c_int > 0 or cbo_t1.c_float >= 0)""".stripMargin,
      duck = Some("""select cbo_t1.c_int AS a from qt_cbot1 cbo_t1
        |where exists (select 1 from qt_cbot2 cbo_t2
        |  where cbo_t1.key = cbo_t2.key)
        |  and (cbo_t1.c_int + 1 = 2)
        |  and (cbo_t1.c_int > 0 or cbo_t1.c_float >= 0)""".stripMargin),
      note = "the Hive == spelling in the residual filter"),

    QCase("cbo_limit.q", "w17g14",
      """SELECT key, (c_int+1)+2 AS x, sum(c_int) AS s
        |FROM qt_cbot1 GROUP BY c_float, qt_cbot1.c_int, key
        |ORDER BY x, key LIMIT 1""".stripMargin,
      duck = Some("""SELECT key, (c_int+1)+2 AS x, sum(c_int) AS s
        |FROM qt_cbot1 GROUP BY c_float, qt_cbot1.c_int, key
        |ORDER BY x NULLS LAST, key NULLS LAST LIMIT 1""".stripMargin),
      ordered = true,
      note = "ordered limit over the grouped frame (Hive's bare ASC " +
        "is NULLS LAST, spelled in the twin)"),

    QCase("cbo_union.q", "w17g15",
      """select key AS k from (select key, c_int from (select key,
        |  c_int from qt_cbot1 union all select key, c_int from
        |  qt_cbot2 where qt_cbot2.key >= 0) r1
        |union all select key, c_int from qt_cbot3) r2
        |where key >= 0 order by key""".stripMargin,
      duck = Some("""select key AS k from (select key, c_int from
        |  (select key, c_int from qt_cbot1 union all select key, c_int
        |   from qt_cbot2 where CAST(qt_cbot2.key AS DOUBLE) >= 0) r1
        |union all select key, c_int from qt_cbot3) r2
        |where CAST(key AS DOUBLE) >= 0
        |order by key NULLS LAST""".stripMargin), ordered = true,
      note = "nested union tree with numeric-coerced key filters " +
        "(Hive coerces the string key to DOUBLE - spelled in the twin)"),

    QCase("cbo_udf_udaf.q", "w17g16",
      """select count(*) AS a, count(c_int) AS b,
        |  CAST(sum(c_int) AS BIGINT) AS c, avg(c_int) AS d,
        |  max(c_int) AS e, min(c_int) AS f from qt_cbot1"""
        .stripMargin),

    QCase("cbo_udf_udaf.q", "w17g17",
      """select f, a, e, b from (select count(*) as a,
        |  count(distinct c_int) as b,
        |  CAST(sum(distinct c_int) AS BIGINT) as c,
        |  avg(distinct c_int) as d, max(distinct c_int) as e,
        |  min(distinct c_int) as f from qt_cbot1) cbo_t1"""
        .stripMargin,
      note = "the DISTINCT aggregate family"),

    QCase("cbo_const.q", "w17g18",
      """select
        |  timestamp '2001-01-01 00:00:00' + interval_day_time('2 1:2:3') AS a,
        |  timestamp '2001-01-01 00:00:00' +
        |    interval_day_time(cast('2 1:2:3' as string)) AS b,
        |  interval_day_time('2 1:2:3') = interval '2 1:2:3' day to second AS eq"""
        .stripMargin,
      duck = Some("""select
        |  timestamp '2001-01-01 00:00:00' +
        |    INTERVAL '2 days 1 hour 2 minutes 3 seconds' AS a,
        |  timestamp '2001-01-01 00:00:00' +
        |    INTERVAL '2 days 1 hour 2 minutes 3 seconds' AS b,
        |  true AS eq""".stripMargin),
      note = "interval constructors fold under constant evaluation; " +
        "equality against the literal spelling holds"),

    QCase("cbo_case_when_type_conversion.q", "w17g19",
      """select col1, case upper(col1) when 'A' then 'OK'
        |  else 'N/A' end as col2
        |from (VALUES ('A'), ('b'), ('c'), (CAST(NULL AS STRING)))
        |  t1(col1)""".stripMargin,
      duck = Some("""select col1, case upper(col1) when 'A' then 'OK'
        |  else 'N/A' end as col2
        |from (VALUES ('A'), ('b'), ('c'), (CAST(NULL AS VARCHAR)))
        |  t1(col1)""".stripMargin),
      note = "simple-CASE over upper(); the NULL input routes to the " +
        "else branch"))

  test("qtest conformance wave 17g: cbo_* logic corpus (derived-table " +
      "joins, regrouping, unions, DISTINCT aggregates, const folding)") {
    run("cbo_simple_select", "cbo_gby", "cbo_join", "cbo_semijoin",
      "cbo_limit", "cbo_union", "cbo_udf_udaf", "cbo_const",
      "cbo_case_when_type_conversion")
  }
}
