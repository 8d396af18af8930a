package graft

/** Conformance wave 17y: the vector_decimal_* remainder (ref
  * ql/src/test/queries/clientpositive/vector_decimal_{3,4,6}.q,
  * vector_decimal_aggregate.q, vector_decimal_col_scalar_division.q,
  * vector_decimal_join.q, vector_decimal_mapjoin2.q,
  * vector_decimal_math_funcs.q, vector_decimal_udf2.q,
  * vector_decimal64_mul_intcolumn.q, vector_bround.q,
  * vector_cast_constant.q). The decimal text fixtures ride the
  * qt_kv7/kv9 views (LazySimpleSerDe-parity casts from r16);
  * math-function twins guard DuckDB's throwing ln/sqrt domains with
  * CASE (Hive answers NULL — the r16 domain semantics).
  */
class QtestVectorDecimalWave17ySpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_decimal_3.q", "w17y01",
      "SELECT key, value FROM qt_kv7 ORDER BY key, value",
      ordered = true,
      note = "decimal(38,18) ordering over the kv7 text load " +
        "(vectorized twin of decimal_3.q)"),

    QCase("vector_decimal_3.q", "w17y02",
      "SELECT key, sum(value) AS s FROM qt_kv7 GROUP BY key " +
        "ORDER BY key",
      ordered = true,
      note = "group on the wide-decimal key"),

    QCase("vector_decimal_4.q", "w17y03",
      "SELECT key, key * 3 AS v FROM qt_kv7 ORDER BY key",
      ordered = true,
      note = "decimal * int literal widening (the file stores the " +
        "pair at (35,25))"),

    QCase("vector_decimal_6.q", "w17y04",
      "SELECT key, value FROM qt_kv9a ORDER BY key, value",
      ordered = true,
      note = "the (10,5) schema narrows kv9: int-digit overflow " +
        "NULLs, excess scale rounds HALF_UP"),

    QCase("vector_decimal_6.q", "w17y05",
      "SELECT key, value FROM qt_kv9b ORDER BY key, value",
      ordered = true,
      note = "the (17,4) schema keeps more digits of the same file"),

    QCase("vector_decimal_6.q", "w17y06",
      """SELECT T.key AS key from (
        |  SELECT key, value from qt_kv9a
        |  union all
        |  SELECT key, value from qt_kv9b) T
        |order by T.key""".stripMargin,
      ordered = true,
      note = "union unifies (10,5) and (17,4) to the wider type"),

    QCase("vector_decimal_aggregate.q", "w17y07",
      """with decimal_vgby as (
        |  SELECT cdouble,
        |    CAST(((cdouble * 22.1) / 37) AS DECIMAL(20,10))
        |      AS cdecimal1,
        |    CAST(((cdouble * 9.3) / 13) AS DECIMAL(23,14))
        |      AS cdecimal2,
        |    cint
        |  FROM qt_alltypesorc
        |  union all
        |  select CAST(NULL AS DOUBLE), CAST(NULL AS DECIMAL(20,10)),
        |    CAST(NULL AS DECIMAL(23,14)), CAST(NULL AS INT))
        |SELECT cint,
        |  COUNT(cdecimal1) AS c1, MAX(cdecimal1) AS mx1,
        |  MIN(cdecimal1) AS mn1, SUM(cdecimal1) AS s1,
        |  COUNT(cdecimal2) AS c2, MAX(cdecimal2) AS mx2,
        |  MIN(cdecimal2) AS mn2, SUM(cdecimal2) AS s2
        |FROM decimal_vgby
        |GROUP BY cint
        |HAVING COUNT(*) > 1""".stripMargin,
      note = "the decimal aggregate battery per cint group with an " +
        "all-NULL row in the mix"),

    QCase("vector_decimal_col_scalar_division.q", "w17y08",
      """select cs_wholesale_cost / 2 AS h,
        |  cs_wholesale_cost / 0.5 AS d,
        |  cs_list_price / 3 AS t
        |from (VALUES (CAST(10.50 AS DECIMAL(7,2)),
        |    CAST(99.99 AS DECIMAL(7,2))),
        |  (CAST(0.01 AS DECIMAL(7,2)), CAST(33.33 AS DECIMAL(7,2))))
        |  catalog_sales(cs_wholesale_cost, cs_list_price)"""
        .stripMargin,
      note = "decimal column / scalar division precision (the " +
        "file's decimal64 fast path)"),

    QCase("vector_decimal_join.q", "w17y09",
      """select foo.x, foo.y, bar.y AS y2 from
        |  (VALUES (1, CAST(10.20 AS DECIMAL(7,2))),
        |   (2, CAST(20.40 AS DECIMAL(7,2)))) foo(x, y)
        |join
        |  (VALUES (1, CAST(99.99 AS DECIMAL(7,2))),
        |   (3, CAST(11.11 AS DECIMAL(7,2)))) bar(x, y)
        |on foo.x = bar.x""".stripMargin,
      duck = Some("""select foo.x, foo.y, bar.y AS y2 from
        |  (VALUES (1, CAST(10.20 AS DECIMAL(7,2))),
        |   (2, CAST(20.40 AS DECIMAL(7,2)))) foo(x, y)
        |join
        |  (VALUES (1, CAST(99.99 AS DECIMAL(7,2))),
        |   (3, CAST(11.11 AS DECIMAL(7,2)))) bar(x, y)
        |on foo.x = bar.x""".stripMargin),
      note = "decimal payloads across an int-keyed join"),

    QCase("vector_decimal_mapjoin2.q", "w17y10",
      """select sum(salary.salary_paid) AS s from
        |  (VALUES (1, CAST(1234.5678 AS DECIMAL(10,4))),
        |   (2, CAST(2345.6789 AS DECIMAL(10,4))),
        |   (3, CAST(10.0001 AS DECIMAL(10,4))))
        |    salary(employee_id, salary_paid),
        |  (VALUES (1, 1), (1, 2), (2, 1))
        |    employee_closure(employee_id, supervisor_id)
        |where salary.employee_id = employee_closure.employee_id"""
        .stripMargin,
      note = "duplicate-keyed dim fan-out doubles one decimal in the " +
        "sum (the file's salary fixture shape)"),

    QCase("vector_decimal_math_funcs.q", "w17y11",
      """with decimal_test as (
        |  select CAST(((cdouble * 22.1) / 37) AS DECIMAL(20,10))
        |    AS cdecimal1
        |  from qt_alltypesorc where cbigint % 500 = 0)
        |select cdecimal1,
        |  Round(cdecimal1, 2) AS r2, Round(cdecimal1) AS r0,
        |  Floor(cdecimal1) AS fl, Ceil(cdecimal1) AS ce,
        |  Abs(cdecimal1) AS ab, Sign(cdecimal1) AS sg,
        |  Sqrt(cdecimal1) AS sq, Ln(cdecimal1) AS ln_,
        |  Power(cdecimal1, 2) AS pw
        |from decimal_test""".stripMargin,
      duck = Some("""with decimal_test as (
        |  select CAST(((cdouble * 22.1) / 37) AS DECIMAL(20,10))
        |    AS cdecimal1
        |  from qt_alltypesorc where cbigint % 500 = 0)
        |select cdecimal1,
        |  Round(cdecimal1, 2) AS r2, Round(cdecimal1) AS r0,
        |  Floor(cdecimal1) AS fl, Ceil(cdecimal1) AS ce,
        |  Abs(cdecimal1) AS ab,
        |  CAST(Sign(cdecimal1) AS DOUBLE) AS sg,
        |  CASE WHEN cdecimal1 >= 0
        |       THEN Sqrt(CAST(cdecimal1 AS DOUBLE)) END AS sq,
        |  CASE WHEN cdecimal1 > 0
        |       THEN Ln(CAST(cdecimal1 AS DOUBLE)) END AS ln_,
        |  Power(CAST(cdecimal1 AS DOUBLE), 2) AS pw
        |from decimal_test""".stripMargin),
      note = "the decimal math battery: sqrt/ln answer NULL outside " +
        "their domains in Hive (DuckDB throws — the twin guards); " +
        "round keeps decimal typing, floor/ceil go integral"),

    QCase("vector_decimal_udf2.q", "w17y12",
      """SELECT acos(key) AS ac, asin(key) AS as_, atan(key) AS at,
        |  cos(key) AS co, sin(key) AS si, tan(key) AS ta,
        |  radians(key) AS ra
        |FROM (VALUES (CAST(-1.0 AS DECIMAL(14,5))),
        |  (CAST(-0.3 AS DECIMAL(14,5))), (CAST(0 AS DECIMAL(14,5))),
        |  (CAST(0.3 AS DECIMAL(14,5))), (CAST(10 AS DECIMAL(14,5))))
        |  DECIMAL_UDF2(key)""".stripMargin,
      duck = Some("""SELECT
        |  CASE WHEN key BETWEEN -1 AND 1
        |    THEN acos(CAST(key AS DOUBLE)) END AS ac,
        |  CASE WHEN key BETWEEN -1 AND 1
        |    THEN asin(CAST(key AS DOUBLE)) END AS as_,
        |  atan(CAST(key AS DOUBLE)) AS at,
        |  cos(CAST(key AS DOUBLE)) AS co,
        |  sin(CAST(key AS DOUBLE)) AS si,
        |  tan(CAST(key AS DOUBLE)) AS ta,
        |  radians(CAST(key AS DOUBLE)) AS ra
        |FROM (VALUES (CAST(-1.0 AS DECIMAL(14,5))),
        |  (CAST(-0.3 AS DECIMAL(14,5))), (CAST(0 AS DECIMAL(14,5))),
        |  (CAST(0.3 AS DECIMAL(14,5))), (CAST(10 AS DECIMAL(14,5))))
        |  DECIMAL_UDF2(key)""".stripMargin),
      note = "trig over decimal keys; acos/asin outside [-1,1] " +
        "answer NULL in Hive (key=10 row)"),

    QCase("vector_decimal64_mul_intcolumn.q", "w17y13",
      """select sum(ss_ext_list_price * ss_ext_discount_amt) AS s1,
        |  sum(ss_ext_wholesale_cost * ss_ext_discount_amt) AS s2
        |from (VALUES
        |  (CAST(145.32 AS DECIMAL(7,2)),
        |   CAST(9856.3 AS DECIMAL(19,1)), 44),
        |  (CAST(33.99 AS DECIMAL(7,2)),
        |   CAST(100.5 AS DECIMAL(19,1)), 7),
        |  (CAST(0.01 AS DECIMAL(7,2)),
        |   CAST(0.1 AS DECIMAL(19,1)), 0))
        |  t(ss_ext_list_price, ss_ext_wholesale_cost,
        |    ss_ext_discount_amt)""".stripMargin,
      note = "decimal64-eligible and -ineligible precisions times an " +
        "INT column (the file's repro: the 19,1 column falls off the " +
        "64-bit fast path)"),

    QCase("vector_bround.q", "w17y14",
      """select v0, v1, bround(v0) AS b0, bround(v1, 1) AS b1
        |from (VALUES (2.5, 1.25), (3.5, 1.35), (-2.5, -1.25),
        |  (-3.5, -1.35), (2.49, 1.249), (3.49, 1.349), (2.51, 1.251),
        |  (3.51, 1.351),
        |  (CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)))
        |  test_vector_bround(v0, v1)""".stripMargin,
      duck = Some("""select * from (VALUES
        |  (2.5, 1.25, 2.0, 1.2), (3.5, 1.35, 4.0, 1.4),
        |  (-2.5, -1.25, -2.0, -1.2), (-3.5, -1.35, -4.0, -1.4),
        |  (2.49, 1.249, 2.0, 1.2), (3.49, 1.349, 3.0, 1.3),
        |  (2.51, 1.251, 3.0, 1.3), (3.51, 1.351, 4.0, 1.4),
        |  (CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)))
        |  t(v0, v1, b0, b1)""".stripMargin),
      note = "banker's rounding: half-to-EVEN at unit and tenth " +
        "scale (expected values stated literally — DuckDB's round " +
        "is half-away)"),

    QCase("vector_cast_constant.q", "w17y15",
      """SELECT i,
        |  AVG(CAST(50 AS INT)) AS avg_int_ok,
        |  AVG(CAST(50 AS DOUBLE)) AS avg_double_ok,
        |  AVG(CAST(50 AS DECIMAL)) AS avg_decimal_ok
        |FROM qt_over10k GROUP BY i ORDER BY i LIMIT 10""".stripMargin,
      ordered = true,
      note = "averaging a constant under three type spellings — all " +
        "50, typed int/double/decimal")
  )

  test("qtest conformance wave 17y: the vector_decimal remainder — " +
      "wide-decimal ordering/grouping, aggregate batteries, math and " +
      "trig domains, decimal64 fast-path shapes, banker's rounding") {
    run("vector_")
  }
}
