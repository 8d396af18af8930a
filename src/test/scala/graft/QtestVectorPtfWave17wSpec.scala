package graft

/** Conformance wave 17w: the vector_ptf_* family (ref ql/src/test/
  * queries/clientpositive/vector_ptf_1.q, _bounded_start.q,
  * _count_distinct.q, _lead_lag.q, _part_simple.q,
  * _windowing_over_const.q, _nested_input_expr.q,
  * _classcast_exception.q, _last_value_streaming.q,
  * _spill_partition_order_overlap.q). The files pin Hive's vectorized
  * PTF operator; the semantics gated here: windows over grouped
  * aggregates, DISTINCT window aggregates on the partition column,
  * the full lag/lead offset/default battery, orderless ranking
  * (constant ORDER BY NULL / INTERVAL), nested arithmetic inside the
  * windowed aggregate, nested SUM-of-SUM, bounded-start frames, and
  * order keys overlapping the partition spec.
  */
class QtestVectorPtfWave17wSpec extends QtestHarness {

  // vector_ptf_lead_lag's fixture rows (NULL-bearing duplicate values)
  private val leadLag = """(VALUES
    |  ('first', 1, 1), ('first', 2, 2), ('first', 3, 2),
    |  ('first', 4, CAST(NULL AS INT)), ('first', 5, 3),
    |  ('first', 6, 3), ('first', 7, 4),
    |  ('first', 8, CAST(NULL AS INT)),
    |  ('second', 1, 1), ('second', 2, 2),
    |  ('second', 3, CAST(NULL AS INT)),
    |  ('second', 4, 4)) vector_ptf_lead_lag_int(name, rowindex,
    |  mynumber)""".stripMargin

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_ptf_1.q", "w17w01",
      """select age, name, avg(gpa) AS ag,
        |  sum(age) over (partition by name) AS sa
        |from (VALUES (35, 'yuri xylophone', 2.1),
        |  (35, 'yuri xylophone', 3.3),
        |  (CAST(NULL AS INT), 'fred falkland', 1.5),
        |  (28, 'fred falkland', CAST(NULL AS DOUBLE)),
        |  (28, 'fred falkland', 2.4),
        |  (41, CAST(NULL AS STRING), 3.9)) studentnull100(age, name,
        |  gpa)
        |group by age, name""".stripMargin,
      duck = Some("""select age, name, avg(gpa) AS ag,
        |  sum(age) over (partition by name) AS sa
        |from (VALUES (35, 'yuri xylophone', 2.1),
        |  (35, 'yuri xylophone', 3.3),
        |  (CAST(NULL AS INT), 'fred falkland', 1.5),
        |  (28, 'fred falkland', CAST(NULL AS DOUBLE)),
        |  (28, 'fred falkland', 2.4),
        |  (41, CAST(NULL AS VARCHAR), 3.9)) studentnull100(age, name,
        |  gpa)
        |group by age, name""".stripMargin),
      note = "window over the GROUPED rows with NULL keys both ways " +
        "(the file's studentnull100 fixture, distilled with NULLs in " +
        "every role)"),

    QCase("vector_ptf_count_distinct.q", "w17w02",
      """SELECT txt1, txt2,
        |  count(distinct txt1) over(partition by txt1) as n,
        |  count(distinct txt2) over(partition by txt2) as m
        |FROM (VALUES (1, '2010005759', '7164335675012038'),
        |  (2, '2010005759', '7164335675012038'))
        |  ptf_count_distinct(id, txt1, txt2)""".stripMargin,
      duck = Some("""SELECT txt1, txt2, 1 as n, 1 as m
        |FROM (VALUES (1, '2010005759', '7164335675012038'),
        |  (2, '2010005759', '7164335675012038'))
        |  ptf_count_distinct(id, txt1, txt2)""".stripMargin),
      note = "COUNT(DISTINCT partition-column) OVER that partition is " +
        "always 1 — the file's own assertion (DuckDB lacks DISTINCT " +
        "window aggregates; the twin states the invariant)"),

    QCase("vector_ptf_lead_lag.q", "w17w03",
      s"""select name, mynumber,
         |lag(mynumber) over (partition by name
         |  order by mynumber) as lag1,
         |lag(mynumber, 2) over (partition by name
         |  order by mynumber) as lag2,
         |lag(mynumber, 3, 100) over (partition by name
         |  order by mynumber) as lag3_default100,
         |lag(mynumber, 4, mynumber) over (partition by name
         |  order by mynumber) as lag4_default_col,
         |lead(mynumber) over (partition by name
         |  order by mynumber) as lead1,
         |lead(mynumber, 2) over (partition by name
         |  order by mynumber) as lead2,
         |lead(mynumber, 3, 100) over (partition by name
         |  order by mynumber) as lead3_default100,
         |lead(mynumber, 4, mynumber) over (partition by name
         |  order by mynumber) as lead4_default_col
         |from $leadLag""".stripMargin,
      duck = Some(s"""select name, mynumber,
         |lag(mynumber) over (partition by name
         |  order by mynumber NULLS LAST) as lag1,
         |lag(mynumber, 2) over (partition by name
         |  order by mynumber NULLS LAST) as lag2,
         |lag(mynumber, 3, 100) over (partition by name
         |  order by mynumber NULLS LAST) as lag3_default100,
         |lag(mynumber, 4, mynumber) over (partition by name
         |  order by mynumber NULLS LAST) as lag4_default_col,
         |lead(mynumber) over (partition by name
         |  order by mynumber NULLS LAST) as lead1,
         |lead(mynumber, 2) over (partition by name
         |  order by mynumber NULLS LAST) as lead2,
         |lead(mynumber, 3, 100) over (partition by name
         |  order by mynumber NULLS LAST) as lead3_default100,
         |lead(mynumber, 4, mynumber) over (partition by name
         |  order by mynumber NULLS LAST) as lead4_default_col
         |from $leadLag""".stripMargin),
      note = "the full lag/lead battery: bare, offset, constant " +
        "default, COLUMN default; rowindex dropped so tied values " +
        "compare as a deterministic multiset; Hive window NULLS LAST " +
        "spelled explicitly in the twin"),

    QCase("vector_ptf_part_simple.q", "w17w04",
      """with src as (select * from (VALUES
        |  ('Manufacturer#2', 'rose maroon', 900.66),
        |  ('Manufacturer#1', 'burnished black', 1414.42),
        |  ('Manufacturer#2', 'antique grey', 1698.66),
        |  ('Manufacturer#1', 'pink moccasin', CAST(NULL AS DOUBLE)),
        |  ('Manufacturer#1', 'chartreuse lavender', 1753.76))
        |  t(p_mfgr, p_name, p_retailprice))
        |select p_mfgr,
        |  max(r) AS r, max(dr) AS dr, sum(rn) AS srn,
        |  max(c) AS c, max(cs) AS cs
        |from (select p_mfgr,
        |  row_number() over(partition by p_mfgr) as rn,
        |  rank() over(partition by p_mfgr) as r,
        |  dense_rank() over(partition by p_mfgr) as dr,
        |  count(p_retailprice) over(partition by p_mfgr) as c,
        |  count(*) over(partition by p_mfgr) as cs
        |from src) w
        |group by p_mfgr""".stripMargin,
      duck = Some("""with src as (select * from (VALUES
        |  ('Manufacturer#2', 'rose maroon', 900.66),
        |  ('Manufacturer#1', 'burnished black', 1414.42),
        |  ('Manufacturer#2', 'antique grey', 1698.66),
        |  ('Manufacturer#1', 'pink moccasin', CAST(NULL AS DOUBLE)),
        |  ('Manufacturer#1', 'chartreuse lavender', 1753.76))
        |  t(p_mfgr, p_name, p_retailprice))
        |select p_mfgr, 1 AS r, 1 AS dr,
        |  CAST(count(*) * (count(*) + 1) / 2 AS BIGINT) AS srn,
        |  count(p_retailprice) AS c, count(*) AS cs
        |from src group by p_mfgr""".stripMargin),
      note = "ORDERLESS ranking: rank/dense_rank answer 1 for every " +
        "row (all peers), row_number sums to n(n+1)/2, counts skip " +
        "the NULL price"),

    QCase("vector_ptf_windowing_over_const.q", "w17w05",
      """select cast(rank() over(order by INTERVAL '1' DAY) as STRING)
        |  AS r, age, name
        |from (VALUES (20, 'PQR'), (10, 'ABC'), (30, 'XYZ'))
        |  vectptf(age, name)""".stripMargin,
      duck = Some("""select '1' AS r, age, name
        |from (VALUES (20, 'PQR'), (10, 'ABC'), (30, 'XYZ'))
        |  vectptf(age, name)""".stripMargin),
      note = "rank over a CONSTANT interval order: every row is a " +
        "peer, rank 1 (the twin states the invariant)"),

    QCase("vector_ptf_windowing_over_const.q", "w17w06",
      """select sum(rn) AS s, count(*) AS c from (
        |  select cast(row_number() over(order by NULL) as STRING)
        |    as rn
        |  from (VALUES (20, 'PQR'), (10, 'ABC'), (30, 'XYZ'))
        |    vectptf(age, name)) t""".stripMargin,
      duck = Some("select 6 AS s, 3 AS c"),
      note = "row_number over ORDER BY NULL sequences 1..3 in some " +
        "arrival order — the sum is pinned"),

    QCase("vector_ptf_nested_input_expr.q", "w17w07",
      """SELECT id, val1, val2, val3,
        |  SUM(val1 * 2 + val2 - val3)
        |    OVER (ORDER BY val1 DESC, id ASC) AS final_total
        |FROM (VALUES ('req1', CAST(5.0 AS DECIMAL(20,2)), 2, 1),
        |  ('req1', CAST(10.0 AS DECIMAL(20,2)), 4, 2),
        |  ('req2', CAST(10.0 AS DECIMAL(20,2)), 5, 2))
        |  repro_ptf_decimal(id, val1, val2, val3)""".stripMargin,
      note = "nested decimal/bigint/smallint arithmetic INSIDE the " +
        "windowed sum (the file's vectorized-input-expression repro)"),

    QCase("vector_ptf_classcast_exception.q", "w17w08",
      """select i_class,
        |  sum(ss_ext_sales_price) * 100
        |    / sum(sum(ss_ext_sales_price)) over (partition by i_class)
        |    as revenueratio
        |from (VALUES (CAST(4721.57 AS DECIMAL(7,2)), 1),
        |  (CAST(4721.58 AS DECIMAL(7,2)), 1))
        |  store_sales_repro(ss_ext_sales_price, ss_item_sk),
        |  (VALUES ('shirts', 1)) item_repro(i_class, i_item_sk)
        |where ss_item_sk = i_item_sk
        |group by i_class, ss_ext_sales_price""".stripMargin,
      note = "SUM of SUM in the window over the grouped aggregate " +
        "(TPC-DS q98's ratio shape; the file's char(50) class repro)"),

    QCase("vector_ptf_last_value_streaming.q", "w17w09",
      """SELECT name, event_dt,
        |  last_value(event_dt) over (PARTITION BY name
        |    ORDER BY event_dt desc
        |    ROWS BETWEEN unbounded preceding and unbounded following)
        |    last_event_dt
        |FROM (VALUES ('100', 'A', date '2019-08-15'),
        |  ('100', 'A', date '2019-10-12')) test2(id, name, event_dt)"""
        .stripMargin,
      note = "whole-partition last_value under a DESC order (streams " +
        "in Hive's PTF; the min date wins)"),

    QCase("vector_ptf_last_value_streaming.q", "w17w10",
      """SELECT name, event_dt,
        |  last_value(event_dt) over (PARTITION BY name
        |    ORDER BY event_dt desc
        |    ROWS BETWEEN unbounded preceding and current row)
        |    last_event_dt
        |FROM (VALUES ('100', 'A', date '2019-08-15'),
        |  ('100', 'A', date '2019-10-12')) test2(id, name, event_dt)"""
        .stripMargin,
      note = "running last_value = the current row itself"),

    QCase("vector_ptf_spill_partition_order_overlap.q", "w17w11",
      """SELECT dept, region, emp_id,
        |  SUM(salary) OVER (
        |    PARTITION BY dept, region
        |    ORDER BY dept
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |  ) AS total
        |FROM (VALUES
        |  ('engineering', 10, 1, 50000.0),
        |  ('engineering', 10, 2, 55000.0),
        |  ('engineering', 10, 3, 60000.0),
        |  ('engineering', 10, 4, 45000.0),
        |  ('engineering', 10, 5, 70000.0))
        |  t1(dept, region, emp_id, salary)""".stripMargin,
      note = "ORDER key inside the PARTITION spec with a " +
        "whole-partition frame (the PTF spill-overlap repro; every " +
        "row answers the partition total)"),

    QCase("vector_ptf_bounded_start.q", "w17w12",
      """select p_mfgr, p_name, p_retailprice,
        |  sum(p_retailprice) over (partition by p_mfgr
        |    order by p_name
        |    rows between 2 preceding and current row) AS s,
        |  count(*) over (partition by p_mfgr order by p_name
        |    rows between 2 preceding and 1 preceding) AS c
        |from (VALUES
        |  ('Manufacturer#1', 'a', 10.0), ('Manufacturer#1', 'b', 20.0),
        |  ('Manufacturer#1', 'c', 30.0), ('Manufacturer#1', 'd', 40.0),
        |  ('Manufacturer#2', 'e', 50.0), ('Manufacturer#2', 'f', 60.0))
        |  t(p_mfgr, p_name, p_retailprice)""".stripMargin,
      note = "BOUNDED-START frames: 2-preceding running sum and a " +
        "frame that EXCLUDES the current row (empty at each " +
        "partition head)")
  )

  test("qtest conformance wave 17w: the vector_ptf family — " +
      "windows over grouped rows, distinct window aggregates, " +
      "lag/lead battery, constant orders, nested input expressions, " +
      "sum-of-sum ratios, bounded frames") {
    run("vector_ptf")
  }
}
