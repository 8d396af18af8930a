package graft

/** Conformance wave 17j: misc corpus remainder — STRUCT-valued IN lists
  * (structin.q), uppercase-identifier ordered-group-limit shapes with a
  * constant grouping key (order3.q), and three-valued IS [NOT]
  * TRUE/FALSE/NULL dualities (udf_isops_simplify.q — the reference
  * pins the SIMPLIFICATIONS in EXPLAIN; here the VALUE matrix is
  * gated, which subsumes the plan identity).
  */
class QtestMiscWave17jSpec extends QtestHarness {

  private val t15 = """(VALUES (1, 1, 'val111'), (1, 2, 'val121'),
    |  (1, 3, 'val131'), (2, 1, 'val211'), (2, 2, 'val221'),
    |  (2, 2, 'val222'), (2, 3, 'val231'), (2, 4, 'val241'),
    |  (3, 1, 'val311'), (3, 2, 'val321'), (3, 2, 'val322'),
    |  (3, 3, 'val331'), (3, 3, 'val332'), (3, 3, 'val333'),
    |  (4, 1, 'val411')) T1(key, value1, value2)""".stripMargin

  protected val qcases: Seq[QCase] = Seq(

    QCase("structin.q", "w17j01",
      """select * from (VALUES ('1234-1111-0074578664', '3'),
        |  ('1234-1111-9999999999', '9')) t11(id, lineid)
        |where struct(id, lineid) IN (
        |  struct('1234-1111-0074578664', '3'),
        |  struct('1234-1111-0074578695', '1'),
        |  struct('1234-1111-0074019112', '1'))""".stripMargin,
      duck = Some("""select * from (VALUES ('1234-1111-0074578664', '3'),
        |  ('1234-1111-9999999999', '9')) t11(id, lineid)
        |where (id, lineid) IN (
        |  ('1234-1111-0074578664', '3'),
        |  ('1234-1111-0074578695', '1'),
        |  ('1234-1111-0074019112', '1'))""".stripMargin),
      note = "STRUCT-valued IN list matches by field-wise equality"),

    QCase("order3.q", "w17j02",
      s"""SELECT T1.KEY AS MYKEY FROM $t15
        |GROUP BY T1.KEY ORDER BY T1.KEY LIMIT 3""".stripMargin,
      ordered = true,
      note = "UPPERCASE identifiers resolve case-insensitively"),

    QCase("order3.q", "w17j03",
      s"""SELECT T1.KEY AS MYKEY, MAX(T1.VALUE1) AS MYVALUE1
        |FROM $t15 GROUP BY T1.KEY ORDER BY T1.KEY LIMIT 3"""
        .stripMargin, ordered = true),

    QCase("order3.q", "w17j04",
      s"""SELECT T1.KEY AS MYKEY, COUNT(T1.VALUE1) AS MYVALUE1,
        |  'AAA' AS C FROM $t15
        |GROUP BY T1.KEY, 'AAA' ORDER BY T1.KEY, 'AAA' LIMIT 3"""
        .stripMargin,
      duck = Some(s"""SELECT T1.KEY AS MYKEY, COUNT(T1.VALUE1)
        |  AS MYVALUE1, 'AAA' AS C FROM $t15
        |GROUP BY T1.KEY ORDER BY T1.KEY LIMIT 3""".stripMargin),
      ordered = true,
      note = "a constant LITERAL as an extra grouping/ordering key " +
        "(DuckDB refuses constant keys — pre-simplified in the twin)"),

    QCase("udf_isops_simplify.q", "w17j05",
      """select a,
        |  not ((a > 0) is not true) AS c1,
        |  not ((a > 0) is not false) AS c2,
        |  not ((a > 0) is not null) AS c3,
        |  not ((a > 0) is true) AS c4,
        |  not ((a > 0) is false) AS c5,
        |  not ((a > 0) is null) AS c6
        |from (VALUES (1), (-1), (CAST(NULL AS INT))) t(a)
        |order by a""".stripMargin,
      duck = Some("""select a,
        |  not ((a > 0) is not true) AS c1,
        |  not ((a > 0) is not false) AS c2,
        |  not ((a > 0) is not null) AS c3,
        |  not ((a > 0) is true) AS c4,
        |  not ((a > 0) is false) AS c5,
        |  not ((a > 0) is null) AS c6
        |from (VALUES (1), (-1), (CAST(NULL AS INT))) t(a)
        |order by a NULLS LAST""".stripMargin), ordered = true,
      note = "the IS-ops duality matrix over true/false/NULL " +
        "predicates — always two-valued, never NULL"))

  test("qtest conformance wave 17j: struct IN lists, constant grouping " +
      "keys, IS-ops dualities") {
    run("structin", "order3", "udf_isops_simplify")
  }
}
