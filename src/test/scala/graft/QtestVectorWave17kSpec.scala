package graft

/** Conformance wave 17k: vector_* remainder quick hits — ordered
  * aggregates over the vectortab2k corpus (vector_orderby_5.q),
  * string-keyed decimal IN filters (vector_string_decimal.q),
  * STRUCT-valued IN under vectorization (vector_struct_in.q),
  * COUNT over a nullable CASE (vector_when_case_null.q), and the
  * LIKE matrix (vector_udf2.q).
  */
class QtestVectorWave17kSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_orderby_5.q", "w17k01",
      """select bo, max(b) AS mb from qt_vt2k
        |group by bo order by bo desc""".stripMargin,
      duck = Some("""select bo, max(b) AS mb from qt_vt2k
        |group by bo order by bo desc NULLS FIRST""".stripMargin),
      ordered = true,
      note = "ordered grouped max over the 2k corpus; Hive's bare " +
        "DESC places NULLS FIRST (largest-value rule)"),

    QCase("vector_string_decimal.q", "w17k02",
      """select id from (SELECT CAST(dec AS DECIMAL(10,0)) AS id
        |  FROM (VALUES ('100000000'), ('200000000'), ('300000000'))
        |  t(dec)) orc_decimal
        |where id in ('100000000', '200000000')""".stripMargin,
      duck = Some("""select id from (SELECT CAST(dec AS DECIMAL(10,0))
        |  AS id FROM (VALUES ('100000000'), ('200000000'),
        |  ('300000000')) t(dec)) orc_decimal
        |where id in (100000000, 200000000)""".stripMargin),
      note = "a DECIMAL column probed with STRING literals coerces " +
        "numerically"),

    QCase("vector_struct_in.q", "w17k03",
      """select * from (VALUES ('one', '1'), ('seven', '1'))
        |  test_1(id, lineid)
        |where struct(id, lineid)
        |IN (struct('two','3'), struct('three','1'),
        |    struct('one','1'), struct('five','2'),
        |    struct('six','1'), struct('eight','1'),
        |    struct('four','1'), struct('nine','1'),
        |    struct('ten','1'))""".stripMargin,
      duck = Some("""select * from (VALUES ('one', '1'), ('seven', '1'))
        |  test_1(id, lineid)
        |where (id, lineid)
        |IN (('two','3'), ('three','1'), ('one','1'), ('five','2'),
        |    ('six','1'), ('eight','1'), ('four','1'), ('nine','1'),
        |    ('ten','1'))""".stripMargin),
      note = "the vectorized struct-IN shape"),

    QCase("vector_when_case_null.q", "w17k04",
      """SELECT key, COUNT(CASE WHEN bool THEN 1
        |  WHEN NOT bool THEN 0 ELSE NULL END) AS cnt_bool0_ok
        |FROM (VALUES ('key1', true), ('key2', false),
        |  ('key3', CAST(NULL AS BOOLEAN)), ('key1', true),
        |  ('key2', CAST(NULL AS BOOLEAN)))
        |  count_case_groupby(key, bool)
        |GROUP BY key""".stripMargin,
      note = "COUNT skips the NULL-branch CASE results; NOT NULL is " +
        "NULL so neither branch fires"),

    QCase("vector_udf2.q", "w17k05",
      """select c1 LIKE '%38%' AS a, c2 LIKE 'val_%' AS b,
        |  c3 LIKE '%38' AS c, c1 LIKE '%3x8%' AS d,
        |  c2 LIKE 'xval_%' AS e, c3 LIKE '%x38' AS f
        |from (select key as c1, value as c2, key as c3
        |      from qt_src where key = '238') t""".stripMargin,
      note = "the positive/negative LIKE matrix over one row"))

  test("qtest conformance wave 17k: vector_* remainder (ordered " +
      "aggregates, string-decimal IN, struct IN, CASE counts, LIKE)") {
    run("vector_orderby_5", "vector_string_decimal", "vector_struct_in",
      "vector_when_case_null", "vector_udf2")
  }
}
