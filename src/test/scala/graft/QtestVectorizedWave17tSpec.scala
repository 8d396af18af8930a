package graft

/** Conformance wave 17t: the vectorized_* / vectorization_* remainder —
  * CASE batteries, the wide cast battery, NOT-filter aggregates,
  * sum-of-IF shapes, limit/offset forms (comma spelling included),
  * distinct-aggregate groups, self-join aggregates, and the string
  * battery (ref ql/src/test/queries/clientpositive/vectorized_case.q,
  * vectorized_casts.q, vector_case_when_3.q, vectorization_not.q,
  * vectorization_sum_if_when.q, vectorization_limit.q,
  * vectorization_offset_limit.q, vector_offset_limit.q,
  * vectorization_nested_udf.q, vectorization_multi_value.q,
  * vectorization_pushdown.q, vectorization_decimal_date.q,
  * vectorized_distinct_gby.q, vectorized_shufflejoin.q,
  * vectorized_mapjoin.q, vectorized_mapjoin2.q,
  * vectorized_nested_mapjoin.q, vectorized_string_funcs.q,
  * vectorization_nvl.q).
  */
class QtestVectorizedWave17tSpec extends QtestHarness {

  private val T = "qt_alltypesorc"

  protected val qcases: Seq[QCase] = Seq(

    QCase("vectorized_case.q", "w17t01",
      s"""select csmallint,
         |  case when csmallint = 418 then 'a'
         |       when csmallint = 12205 then 'b' else 'c' end AS c1,
         |  case csmallint when 418 then 'a'
         |       when 12205 then 'b' else 'c' end AS c2
         |from $T
         |where csmallint = 418 or csmallint = 12205
         |   or csmallint = 10583""".stripMargin,
      note = "searched and simple CASE over the same dispatch values"),

    QCase("vectorized_case.q", "w17t02",
      s"""select sum(case when cint % 2 = 0 then 1 else 0 end) AS evens,
         |  sum(case when cint % 2 = 1 then 1 else 0 end) AS odds
         |from $T where cint is not null""".stripMargin,
      note = "summed CASE flags; % keeps the dividend's sign in " +
        "both engines so negative values count as neither branch=1"),

    QCase("vector_case_when_3.q", "w17t03",
      """select sum(case when rattag = 'a' then newclt_all * 0.3
        |               else newclt_all end) AS s
        |from (select 'a' as rattag,
        |        cast('10.20' as decimal(15,2)) as newclt_all)
        |  test_decimal""".stripMargin,
      note = "decimal CASE branch with a multiply: 10.20*0.3 = 3.060"),

    QCase("vector_case_when_3.q", "w17t04",
      """select sum(case when rattag = 'Y' then newclt_all * 0.3
        |               else newclt_all end) AS s
        |from (select 'a' as rattag,
        |        cast('10.20' as decimal(15,2)) as newclt_all)
        |  test_decimal""".stripMargin,
      note = "the untaken branch still widens the result type"),

    QCase("vectorized_casts.q", "w17t05",
      s"""select
         |  cast(ctinyint as boolean) AS b1,
         |  cast(cbigint as boolean) AS b2,
         |  cast(cfloat as boolean) AS b3,
         |  cast(cbigint * 0 as boolean) AS b4,
         |  cast(cstring1 as int) AS i1,
         |  cast(substr(cstring1, 1, 1) as int) AS i2,
         |  cast(cfloat as tinyint) AS t1,
         |  cast(cfloat as bigint) AS l1,
         |  cast(cint as float) AS f1,
         |  cast(cboolean1 as string) AS s1,
         |  cast(cfloat as string) AS s2
         |from $T where cbigint % 250 = 0""".stripMargin,
      duck = Some(s"""select
         |  (ctinyint <> 0) AS b1,
         |  (cbigint <> 0) AS b2,
         |  (cfloat <> 0) AS b3,
         |  (cbigint * 0 <> 0) AS b4,
         |  TRY_CAST(cstring1 AS INT) AS i1,
         |  TRY_CAST(substr(cstring1, 1, 1) AS INT) AS i2,
         |  CAST(trunc(cfloat) AS TINYINT) AS t1,
         |  CAST(trunc(cfloat) AS BIGINT) AS l1,
         |  CAST(cint AS REAL) AS f1,
         |  CASE WHEN cboolean1 THEN 'TRUE'
         |       WHEN NOT cboolean1 THEN 'FALSE' END AS s1,
         |  CAST(cfloat AS VARCHAR) AS s2
         |from $T where cbigint % 250 = 0""".stripMargin),
      note = "the cast battery: numeric->boolean is x != 0, " +
        "string->int NULLs on garbage, float->integral TRUNCATES, " +
        "boolean->string renders TRUE/FALSE"),

    QCase("vectorization_not.q", "w17t06",
      s"""SELECT AVG(cbigint) AS c1, (-(AVG(cbigint))) AS c2,
         |  (-6432 + AVG(cbigint)) AS c3, STDDEV_POP(cbigint) AS c4,
         |  VAR_SAMP(cbigint) AS c5, COUNT(*) AS c6, SUM(cfloat) AS c7,
         |  (VAR_SAMP(cbigint) % STDDEV_POP(cbigint)) AS c8,
         |  (-(VAR_SAMP(cbigint))) AS c9, MIN(ctinyint) AS c10,
         |  (-(MIN(ctinyint))) AS c11
         |FROM $T
         |WHERE (((cstring2 LIKE '%b%')
         |  OR ((79.553 != cint) OR (NOT(cbigint >= cdouble))))
         |  OR ((ctinyint >= csmallint)
         |    AND (NOT ((cboolean2 != 1) OR (3569 != ctinyint)))))"""
        .stripMargin,
      duck = Some(s"""SELECT AVG(cbigint) AS c1, (-(AVG(cbigint))) AS c2,
         |  (-6432 + AVG(cbigint)) AS c3, STDDEV_POP(cbigint) AS c4,
         |  VAR_SAMP(cbigint) AS c5, COUNT(*) AS c6, SUM(cfloat) AS c7,
         |  (VAR_SAMP(cbigint) % STDDEV_POP(cbigint)) AS c8,
         |  (-(VAR_SAMP(cbigint))) AS c9, MIN(ctinyint) AS c10,
         |  (-(MIN(ctinyint))) AS c11
         |FROM $T
         |WHERE (((cstring2 LIKE '%b%')
         |  OR ((79.553 != cint) OR (NOT(cbigint >= cdouble))))
         |  OR ((ctinyint >= csmallint)
         |    AND (NOT ((CAST(cboolean2 AS INT) != 1)
         |      OR (3569 != ctinyint)))))""".stripMargin),
      note = "NOT over boolean-double comparison (cboolean2 != 1) " +
        "inside the filter tree"),

    QCase("vectorization_sum_if_when.q", "w17t07",
      """with a as (select x from (VALUES (0), (1), (0),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT))) t(x)),
        |  b as (select least(t1.x + t2.x + t3.x + t4.x, 1) as x
        |        from a t1, a t2, a t3, a t4)
        |select sum(IF(x is null, 1, 0)) AS s, count(1) AS c from b"""
        .stripMargin,
      duck = Some("""with a as (select x from (VALUES (0), (1), (0),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT))) t(x)),
        |  b as (select CASE WHEN (t1.x + t2.x + t3.x + t4.x) IS NULL
        |          THEN NULL
        |          ELSE least(t1.x + t2.x + t3.x + t4.x, 1) END as x
        |        from a t1, a t2, a t3, a t4)
        |select sum(CASE WHEN x is null THEN 1 ELSE 0 END) AS s,
        |  count(1) AS c from b""".stripMargin),
      note = "sum(IF(x is null)) over the 10^4 cross-join (HIVE-20873 " +
        "shape); Hive's least() NULL-PROPAGATES where DuckDB's skips " +
        "NULLs, so the twin guards explicitly — 9919 of 10000 NULL"),

    QCase("vectorization_sum_if_when.q", "w17t08",
      """with a as (select x from (VALUES (0), (1), (0),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT))) t(x)),
        |  b as (select least(t1.x + t2.x + t3.x + t4.x, 1) as x
        |        from a t1, a t2, a t3, a t4)
        |select sum(case WHEN x = 1 THEN 1 else 0 end) AS s1,
        |  sum(case WHEN x = 1 THEN 1 when x is null then 0
        |           else 0 end) AS s2 from b""".stripMargin,
      duck = Some("""with a as (select x from (VALUES (0), (1), (0),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT)), (CAST(NULL AS INT)),
        |    (CAST(NULL AS INT))) t(x)),
        |  b as (select CASE WHEN (t1.x + t2.x + t3.x + t4.x) IS NULL
        |          THEN NULL
        |          ELSE least(t1.x + t2.x + t3.x + t4.x, 1) END as x
        |        from a t1, a t2, a t3, a t4)
        |select sum(case WHEN x = 1 THEN 1 else 0 end) AS s1,
        |  sum(case WHEN x = 1 THEN 1 when x is null then 0
        |           else 0 end) AS s2 from b""".stripMargin),
      note = "both CASE spellings agree on the NULL rows (same " +
        "least() NULL-propagation guard in the twin)"),

    QCase("vectorization_limit.q", "w17t09",
      s"""SELECT cbigint, cdouble FROM $T
         |WHERE cbigint < cdouble and cint > 0
         |order by cbigint, cdouble limit 7""".stripMargin,
      ordered = true,
      note = "filtered order-by-limit (the file's TopN vectorization)"),

    QCase("vectorization_limit.q", "w17t10",
      s"""select ctinyint, avg(cdouble + 1) as cavg from $T
         |group by ctinyint order by ctinyint, cavg limit 20"""
        .stripMargin,
      ordered = true,
      note = "aggregate under TopN"),

    QCase("vectorization_limit.q", "w17t11",
      s"select distinct(ctinyint) as cdistinct from $T " +
        "order by cdistinct limit 20",
      duck = Some(s"select distinct ctinyint as cdistinct from $T " +
        "order by cdistinct NULLS LAST limit 20"),
      ordered = true,
      note = "DISTINCT under TopN; Hive sorts the NULL group LAST"),

    QCase("vectorization_limit.q", "w17t12",
      s"select ctinyint, cdouble from $T " +
        "order by ctinyint, cdouble limit 0",
      note = "LIMIT 0 answers the empty set"),

    QCase("vectorization_limit.q", "w17t13",
      s"""select cdouble, sum(ctinyint) as csum from $T
         |where ctinyint is not null group by cdouble
         |order by csum, cdouble limit 20""".stripMargin,
      ordered = true,
      note = "order by the aggregate then the key"),

    QCase("vectorization_offset_limit.q", "w17t14",
      s"""select ctinyint, cdouble, csmallint from $T
         |where ctinyint is not null
         |order by ctinyint, cdouble, csmallint limit 10,3"""
        .stripMargin,
      duck = Some(s"""select ctinyint, cdouble, csmallint from $T
         |where ctinyint is not null
         |order by ctinyint, cdouble, csmallint limit 3 offset 10"""
        .stripMargin),
      ordered = true,
      note = "Hive's comma LIMIT offset,count spelling (full-width " +
        "ORDER BY pins the window)"),

    QCase("vector_offset_limit.q", "w17t15",
      """SELECT name, id FROM (VALUES ('testname', 1), ('testname', 2),
        |  ('testname', 3), ('testname', 4), ('testname', 5),
        |  ('testname', 6), ('testname', 7), ('testname', 8),
        |  ('testname', 9), ('testname', 10), ('testname', 11),
        |  ('testname', 12), ('other', 99)) TLIMITOFFSET(name, id)
        |where name = 'testname' ORDER BY id LIMIT 20 OFFSET 10"""
        .stripMargin,
      ordered = true,
      note = "OFFSET past most of the filtered set leaves the tail"),

    QCase("vectorization_nested_udf.q", "w17t16",
      s"SELECT SUM(abs(ctinyint)) AS s from $T",
      note = "scalar UDF nested inside the aggregate"),

    QCase("vectorization_multi_value.q", "w17t17",
      """SELECT cast(IF(1=1, MAP('a', a), NULL) as string) AS m,
        |  cast(IF(1=1, ARRAY('a', a), NULL) as string) AS arr
        |FROM (VALUES ('a/b')) cond_vector(a)""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("""{"a":"a/b"}""", """["a","a/b"]""")),
      note = "IF with complex-typed branches carrying a column, " +
        "pinned in the buildJSONString rendering"),

    QCase("vectorization_pushdown.q", "w17t18",
      s"SELECT AVG(cbigint) AS a FROM $T WHERE cbigint < cdouble",
      note = "predicate pushdown into the ORC scan (results gate)"),

    QCase("vectorization_decimal_date.q", "w17t19",
      s"""SELECT CAST(CAST(cint AS TIMESTAMP) AS DATE) AS cdate, cint,
         |  CAST(((cdouble * 22.1) / 37) AS DECIMAL(20,10)) AS cdecimal
         |FROM $T
         |where cint IS NOT NULL AND cdouble IS NOT NULL
         |ORDER BY cint, cdecimal LIMIT 10""".stripMargin,
      duck = Some(s"""SELECT CAST(epoch_ms(CAST(cint AS BIGINT))
         |    AS DATE) AS cdate, cint,
         |  CAST(((cdouble * 22.1) / 37) AS DECIMAL(20,10)) AS cdecimal
         |FROM $T
         |where cint IS NOT NULL AND cdouble IS NOT NULL
         |ORDER BY cint, cdecimal LIMIT 10""".stripMargin),
      ordered = true,
      note = "int->timestamp reads epoch MILLISECONDS, then dates in " +
        "UTC; decimal(20,10) division"),

    QCase("vectorized_distinct_gby.q", "w17t20",
      s"""select sum(distinct cint) AS s, count(distinct cint) AS c,
         |  avg(distinct cint) AS a, std(distinct cint) AS sd
         |from $T""".stripMargin,
      duck = Some(s"""select sum(distinct cint) AS s,
         |  count(distinct cint) AS c, avg(distinct cint) AS a,
         |  stddev_pop(distinct cint) AS sd from $T""".stripMargin),
      note = "four DISTINCT aggregates in one global group (std = " +
        "population)"),

    QCase("vectorized_distinct_gby.q", "w17t21",
      s"""select ctinyint, count(distinct cint) AS cd,
         |  sum(CASE WHEN cstring1 LIKE 'test%1'
         |        OR cstring1 LIKE 'test%2' THEN 1 ELSE 0 END) AS s,
         |  max(CASE WHEN cstring1 LIKE 'test%3'
         |        OR cstring1 LIKE '%test%5' THEN cstring1
         |      ELSE 'XXXXX' END) AS maxVal
         |from $T group by ctinyint""".stripMargin,
      note = "distinct + CASE-flag aggregates per tinyint group"),

    QCase("vectorized_shufflejoin.q", "w17t22",
      s"""SELECT COUNT(t1.cint) AS c1, MAX(t2.cint) AS CNT,
         |  MIN(t1.cint) AS c3, AVG(t1.cint + t2.cint) AS c4
         |FROM $T t1 JOIN $T t2 ON t1.cint = t2.cint""".stripMargin,
      note = "self equi-join aggregate (the file orders by the single " +
        "output row's CNT)"),

    QCase("vectorized_mapjoin.q", "w17t23",
      s"""SELECT COUNT(t1.cint) AS c1, MAX(t2.cint) AS c2,
         |  MIN(t1.cint) AS c3, AVG(t1.cint + t2.cint) AS c4
         |FROM $T t1 JOIN $T t2 ON t1.cint = t2.cint""".stripMargin,
      note = "identical semantics under the mapjoin conf"),

    QCase("vectorized_mapjoin2.q", "w17t24",
      """select count(1) AS c from (select 1 as a) x, (select 1 as b) y
        |where a = b""".stripMargin,
      note = "single-row broadcast join"),

    QCase("vectorized_nested_mapjoin.q", "w17t25",
      s"""select sum(t1.td) AS s from
         |  (select v1.csmallint as tsi, v1.cdouble as td
         |     from $T v1, $T v2
         |     where v1.ctinyint = v2.ctinyint) t1
         |join $T v3 on t1.tsi = v3.csmallint""".stripMargin,
      note = "nested self-joins on dense keys feeding one sum"),

    QCase("vectorized_string_funcs.q", "w17t26",
      s"""select substr(cstring1, 1, 2) AS c1, substr(cstring1, 2) AS c2,
         |  lower(cstring1) AS c3, upper(cstring1) AS c4,
         |  ucase(cstring1) AS c5, length(cstring1) AS c6,
         |  trim(cstring1) AS c7, ltrim(cstring1) AS c8,
         |  rtrim(cstring1) AS c9, concat(cstring1, cstring2) AS c10,
         |  concat('>', cstring1) AS c11, concat(cstring1, '<') AS c12,
         |  concat(substr(cstring1, 1, 2), substr(cstring2, 1, 2)) AS c13
         |from $T
         |where cbigint % 237 = 0
         |  and length(substr(cstring1, 1, 2)) <= 2
         |  and cstring1 like '%'""".stripMargin,
      duck = Some(s"""select substr(cstring1, 1, 2) AS c1,
         |  substr(cstring1, 2) AS c2,
         |  lower(cstring1) AS c3, upper(cstring1) AS c4,
         |  upper(cstring1) AS c5, length(cstring1) AS c6,
         |  trim(cstring1) AS c7, ltrim(cstring1) AS c8,
         |  rtrim(cstring1) AS c9, (cstring1 || cstring2) AS c10,
         |  ('>' || cstring1) AS c11, (cstring1 || '<') AS c12,
         |  (substr(cstring1, 1, 2) || substr(cstring2, 1, 2)) AS c13
         |from $T
         |where cbigint % 237 = 0
         |  and length(substr(cstring1, 1, 2)) <= 2
         |  and cstring1 like '%'""".stripMargin),
      note = "the string battery with string functions in the WHERE " +
        "too (ucase = upper; Hive concat NULL-propagates, so the " +
        "twin spells || which does the same in DuckDB)"),

    QCase("vectorization_nvl.q", "w17t27",
      s"""select nvl(cint, 1) AS a, nvl(cstring1, 'x') AS b,
         |  nvl(cdouble, cint) AS c, nvl(NULL, cint) AS d
         |from $T where cbigint % 250 = 0""".stripMargin,
      duck = Some(s"""select coalesce(cint, 1) AS a,
         |  coalesce(cstring1, 'x') AS b,
         |  coalesce(cdouble, cint) AS c, coalesce(NULL, cint) AS d
         |from $T where cbigint % 250 = 0""".stripMargin),
      note = "nvl battery (the file's esource/etarget join reduces to " +
        "nvl semantics over nullable columns)")
  )

  test("qtest conformance wave 17t: vectorized CASE/cast/limit/" +
      "string batteries, NOT filters, sum-of-IF, distinct groups, " +
      "self-join aggregates") {
    run("vector")
  }
}
