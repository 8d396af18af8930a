package graft

/** Conformance wave 17a: the vector_* conditional-expression corpus —
  * CASE/IF ladders with implicit-cast branches over the full TPC-H tiny
  * lineitem (vector_case_when_1.q), timestamp CASE ladders at far-future
  * years (vector_case_when_2.q), IF over nullable branches
  * (vector_if_expr.q, vector_if_expr_2.q), COALESCE type unification
  * (vector_coalesce.q, vector_coalesce_2/3/4.q), elt() (vector_elt.q),
  * nvl() (vector_nvl.q), and column-vs-column BETWEEN
  * (vector_between_columns.q) + literal IN/BETWEEN on decimal/date
  * (vector_between_in.q). These .q files pin RESULTS of Hive's
  * vectorized path — the engine's Tungsten output gates against DuckDB
  * over the shared parquet fixtures.
  *
  * Porting notes:
  *  - Hive's IF spells CASE WHEN in the DuckDB twin; DATE_ADD(d, n) is
  *    `d + n`; DATEDIFF(a, b) is `(a - b)` (DuckDB date difference is
  *    integer days); 0BD is CAST(0 AS DECIMAL).
  *  - LIMIT-without-ORDER statements get a deterministic ORDER BY added
  *    to BOTH legs (the .q relies on Hive's stable scan order, which no
  *    cross-engine compare can).
  *  - `cast(timestamp as double) % 500` (case_when_2 Field_5) twins as
  *    `(CAST(epoch_us(ts) AS DOUBLE) / 1000000) % 500` — exactly the
  *    µs→seconds division the engine performs, so the IEEE result bits
  *    agree.
  */
class QtestVectorWave17aSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_case_when_1.q", "w17a01",
      """SELECT
        |  L_QUANTITY as Quantity,
        |  CASE WHEN L_QUANTITY = 1 THEN "Single"
        |       WHEN L_QUANTITY = 2 THEN "Two"
        |       WHEN L_QUANTITY < 10 THEN "Some"
        |       WHEN L_QUANTITY < 100 THEN "Many"
        |       ELSE "Huge number" END AS Quantity_Description,
        |  CASE WHEN L_QUANTITY = 1 THEN "Single"
        |       WHEN L_QUANTITY = 2 THEN "Two"
        |       WHEN L_QUANTITY < 10 THEN "Some"
        |       WHEN L_QUANTITY < 100 THEN "Many"
        |       ELSE NULL END AS Quantity_Description_2,
        |  CASE WHEN L_QUANTITY = 1 THEN "Single"
        |       WHEN L_QUANTITY = 2 THEN "Two"
        |       WHEN L_QUANTITY < 10 THEN "Some"
        |       WHEN L_QUANTITY < 100 THEN NULL
        |       ELSE NULL END AS Quantity_Description_3,
        |  IF(L_SHIPMODE = "SHIP", DATE_ADD(l_shipdate, 10),
        |     DATE_ADD(l_shipdate, 5)) AS Expected_Date,
        |  CASE WHEN L_RETURNFLAG = "N"
        |       THEN l_extendedprice * (1 - l_discount)
        |       ELSE 0 END AS Field_1,
        |  IF(L_SHIPINSTRUCT = "DELIVER IN PERSON", NULL, L_TAX) AS Field_3,
        |  IF(L_SHIPINSTRUCT = "TAKE BACK RETURN", L_TAX, NULL) AS Field_4,
        |  IF(L_SHIPINSTRUCT = "DELIVER IN PERSON", 0, L_TAX) AS Field_5,
        |  IF(L_SHIPINSTRUCT = "TAKE BACK RETURN", L_TAX, 0BD) AS Field_8,
        |  IF(L_PARTKEY > 30, CAST(L_RECEIPTDATE AS TIMESTAMP),
        |     CAST(L_COMMITDATE AS TIMESTAMP)) AS Field_9,
        |  IF(L_SUPPKEY > 10000, DATEDIFF(L_RECEIPTDATE, L_COMMITDATE),
        |     NULL) AS Field_10,
        |  IF(L_SUPPKEY > 10000, NULL,
        |     DATEDIFF(L_RECEIPTDATE, L_COMMITDATE)) AS Field_11,
        |  IF(L_SUPPKEY % 500 > 100, DATE_ADD('2008-12-31', 1),
        |     DATE_ADD('2008-12-31', 365)) AS Field_12
        |FROM qt_litest""".stripMargin,
      duck = Some("""SELECT
        |  L_QUANTITY as Quantity,
        |  CASE WHEN L_QUANTITY = 1 THEN 'Single'
        |       WHEN L_QUANTITY = 2 THEN 'Two'
        |       WHEN L_QUANTITY < 10 THEN 'Some'
        |       WHEN L_QUANTITY < 100 THEN 'Many'
        |       ELSE 'Huge number' END AS Quantity_Description,
        |  CASE WHEN L_QUANTITY = 1 THEN 'Single'
        |       WHEN L_QUANTITY = 2 THEN 'Two'
        |       WHEN L_QUANTITY < 10 THEN 'Some'
        |       WHEN L_QUANTITY < 100 THEN 'Many'
        |       ELSE NULL END AS Quantity_Description_2,
        |  CASE WHEN L_QUANTITY = 1 THEN 'Single'
        |       WHEN L_QUANTITY = 2 THEN 'Two'
        |       WHEN L_QUANTITY < 10 THEN 'Some'
        |       WHEN L_QUANTITY < 100 THEN NULL
        |       ELSE NULL END AS Quantity_Description_3,
        |  CASE WHEN L_SHIPMODE = 'SHIP' THEN l_shipdate + 10
        |       ELSE l_shipdate + 5 END AS Expected_Date,
        |  CASE WHEN L_RETURNFLAG = 'N'
        |       THEN l_extendedprice * (1 - l_discount)
        |       ELSE 0 END AS Field_1,
        |  CASE WHEN L_SHIPINSTRUCT = 'DELIVER IN PERSON' THEN NULL
        |       ELSE L_TAX END AS Field_3,
        |  CASE WHEN L_SHIPINSTRUCT = 'TAKE BACK RETURN' THEN L_TAX
        |       ELSE NULL END AS Field_4,
        |  CASE WHEN L_SHIPINSTRUCT = 'DELIVER IN PERSON' THEN 0
        |       ELSE L_TAX END AS Field_5,
        |  CASE WHEN L_SHIPINSTRUCT = 'TAKE BACK RETURN' THEN L_TAX
        |       ELSE CAST(0 AS DECIMAL(10,2)) END AS Field_8,
        |  CASE WHEN L_PARTKEY > 30 THEN CAST(L_RECEIPTDATE AS TIMESTAMP)
        |       ELSE CAST(L_COMMITDATE AS TIMESTAMP) END AS Field_9,
        |  CASE WHEN L_SUPPKEY > 10000
        |       THEN (L_RECEIPTDATE - L_COMMITDATE)
        |       ELSE NULL END AS Field_10,
        |  CASE WHEN L_SUPPKEY > 10000 THEN NULL
        |       ELSE (L_RECEIPTDATE - L_COMMITDATE) END AS Field_11,
        |  CASE WHEN L_SUPPKEY % 500 > 100 THEN DATE '2008-12-31' + 1
        |       ELSE DATE '2008-12-31' + 365 END AS Field_12
        |FROM qt_litest""".stripMargin),
      note = "the canonical CASE/IF ladder: string ladders with and " +
        "without ELSE, int-vs-decimal branch coercion (Field_5), the " +
        "0BD decimal literal branch (Field_8), date/timestamp branches, " +
        "NULL-condition rows route to the else branch"),

    QCase("vector_case_when_2.q", "w17a02",
      """SELECT
        |  ctimestamp1, ctimestamp2,
        |  CASE WHEN ctimestamp2 <= date '1800-12-31' THEN "1800s or Earlier"
        |       WHEN ctimestamp2 < date '1900-01-01' THEN "1900s"
        |       WHEN ctimestamp2 between cast('2006-01-01 00:00:00.000' as timestamp) and cast('2010-12-31 23:59:59.999999999' as timestamp) THEN "Late 2000s"
        |       WHEN ctimestamp2 <= timestamp '2015-12-31 23:59:59.999999999' THEN "Early 2010s"
        |       ELSE "Unknown" END AS ctimestamp2_Description,
        |  CASE WHEN ctimestamp2 <= timestamp '2000-12-31 23:59:59.999999999' THEN "Old"
        |       WHEN ctimestamp2 < timestamp '2006-01-01 00:00:00.000' THEN "Early 2000s"
        |       WHEN ctimestamp2 between timestamp '2006-01-01 00:00:00.000' and timestamp '2010-12-31 23:59:59.999999999' THEN "Late 2000s"
        |       WHEN ctimestamp2 <= timestamp '2015-12-31 23:59:59.999999999' THEN NULL
        |       ELSE NULL END AS ctimestamp2_Description_3,
        |  IF(timestamp '1974-10-04 17:21:03.989' > ctimestamp1,
        |     year(ctimestamp1), year(ctimestamp2)) AS field1,
        |  IF(ctimestamp1 = timestamp '2021-09-24 03:18:32.413655165',
        |     NULL, minute(ctimestamp1)) AS Field_3,
        |  IF(ctimestamp2 >= timestamp '5344-10-04 18:40:08.165'
        |     and ctimestamp2 < timestamp '6631-11-13 16:31:29.702202248',
        |     minute(ctimestamp1), NULL) AS Field_4,
        |  IF(cast(ctimestamp1 as double) % 500 > 100,
        |     DATE_ADD(cdate, 1), DATE_ADD(cdate, 365)) AS Field_5
        |FROM qt_timestamps
        |ORDER BY ctimestamp1, stimestamp1, ctimestamp2""".stripMargin,
      duck = Some("""SELECT
        |  ctimestamp1, ctimestamp2,
        |  CASE WHEN ctimestamp2 <= date '1800-12-31' THEN '1800s or Earlier'
        |       WHEN ctimestamp2 < date '1900-01-01' THEN '1900s'
        |       WHEN ctimestamp2 between cast('2006-01-01 00:00:00.000' as timestamp) and cast('2010-12-31 23:59:59.999999999' as timestamp) THEN 'Late 2000s'
        |       WHEN ctimestamp2 <= timestamp '2015-12-31 23:59:59.999999999' THEN 'Early 2010s'
        |       ELSE 'Unknown' END AS ctimestamp2_Description,
        |  CASE WHEN ctimestamp2 <= timestamp '2000-12-31 23:59:59.999999999' THEN 'Old'
        |       WHEN ctimestamp2 < timestamp '2006-01-01 00:00:00.000' THEN 'Early 2000s'
        |       WHEN ctimestamp2 between timestamp '2006-01-01 00:00:00.000' and timestamp '2010-12-31 23:59:59.999999999' THEN 'Late 2000s'
        |       WHEN ctimestamp2 <= timestamp '2015-12-31 23:59:59.999999999' THEN NULL
        |       ELSE NULL END AS ctimestamp2_Description_3,
        |  CASE WHEN timestamp '1974-10-04 17:21:03.989' > ctimestamp1
        |       THEN year(ctimestamp1) ELSE year(ctimestamp2) END AS field1,
        |  CASE WHEN ctimestamp1 = timestamp '2021-09-24 03:18:32.413655165'
        |       THEN NULL ELSE minute(ctimestamp1) END AS Field_3,
        |  CASE WHEN ctimestamp2 >= timestamp '5344-10-04 18:40:08.165'
        |       and ctimestamp2 < timestamp '6631-11-13 16:31:29.702202248'
        |       THEN minute(ctimestamp1) ELSE NULL END AS Field_4,
        |  CASE WHEN (CAST(epoch_us(ctimestamp1) AS DOUBLE) / 1000000) % 500 > 100
        |       THEN cdate + 1 ELSE cdate + 365 END AS Field_5
        |FROM qt_timestamps
        |ORDER BY ctimestamp1 NULLS LAST, stimestamp1 NULLS LAST,
        |  ctimestamp2 NULLS LAST""".stripMargin,
      ), ordered = true,
      note = "timestamp CASE ladders across year-1800..6631 values; " +
        "9-digit fraction literals truncate to micros in both engines; " +
        "NULL rows route to the else branch; Hive's default ASC null " +
        "placement is NULLS LAST (hive.default.nulls.last=true), " +
        "spelled explicitly in the twin"),

    QCase("vector_if_expr.q", "w17a03",
      """SELECT cboolean1, IF (cboolean1, 'first', 'second') AS x
        |FROM qt_alltypesorc
        |WHERE cboolean1 IS NOT NULL AND cboolean1
        |ORDER BY cboolean1 LIMIT 5""".stripMargin,
      duck = Some("""SELECT cboolean1,
        |  CASE WHEN cboolean1 THEN 'first' ELSE 'second' END AS x
        |FROM qt_alltypesorc
        |WHERE cboolean1 IS NOT NULL AND cboolean1
        |ORDER BY cboolean1 LIMIT 5""".stripMargin), ordered = true,
      note = "IF over a bare boolean column predicate"),

    QCase("vector_if_expr_2.q", "w17a04",
      """SELECT x, IF(x > 0, y, 0) AS r FROM (VALUES (1, 1),
        |  (2, CAST(NULL AS INT)), (3, 1)) foo(x, y) ORDER BY x"""
        .stripMargin,
      duck = Some("""SELECT x, CASE WHEN x > 0 THEN y ELSE 0 END AS r
        |FROM (VALUES (1, 1), (2, CAST(NULL AS INT)), (3, 1)) foo(x, y)
        |ORDER BY x""".stripMargin), ordered = true,
      note = "the true branch answers NULL when y is NULL — IF must " +
        "not substitute the else value"),

    QCase("vector_coalesce.q", "w17a05",
      """SELECT cdouble, cstring1, cint, cfloat, csmallint,
        |  coalesce(cdouble, cstring1, cint, cfloat, csmallint) as c
        |FROM qt_alltypesorc
        |WHERE cdouble IS NULL AND cstring1 IS NULL
        |ORDER BY cint NULLS FIRST, cfloat NULLS FIRST,
        |  csmallint NULLS FIRST LIMIT 10""".stripMargin,
      duck = Some("""SELECT cdouble, cstring1, cint, cfloat, csmallint,
        |  coalesce(CAST(cdouble AS VARCHAR), cstring1,
        |    CAST(cint AS VARCHAR), CAST(cfloat AS VARCHAR),
        |    CAST(csmallint AS VARCHAR)) as c
        |FROM qt_alltypesorc
        |WHERE cdouble IS NULL AND cstring1 IS NULL
        |ORDER BY cint NULLS FIRST, cfloat NULLS FIRST,
        |  csmallint NULLS FIRST LIMIT 10""".stripMargin), ordered = true,
      note = "mixed-type COALESCE unifies to STRING in Hive — the twin " +
        "spells the casts; numeric renderings canon-normalize. The .q's " +
        "bare LIMIT gets a deterministic ORDER BY in both legs; the " +
        "extra cstring1 IS NULL filter keeps ties content-identical"),

    QCase("vector_coalesce.q", "w17a06",
      """SELECT ctinyint, cdouble, cint,
        |  coalesce(ctinyint + 10, (cdouble + log2(cint)), 0) as c
        |FROM qt_alltypesorc
        |WHERE ctinyint IS NULL AND cint > 0
        |ORDER BY cdouble NULLS FIRST, cint NULLS FIRST LIMIT 10"""
        .stripMargin,
      duck = Some("""SELECT ctinyint, cdouble, cint,
        |  coalesce(ctinyint + 10, (cdouble + log2(cint)), 0) as c
        |FROM qt_alltypesorc
        |WHERE ctinyint IS NULL AND cint > 0
        |ORDER BY cdouble NULLS FIRST, cint NULLS FIRST LIMIT 10"""
        .stripMargin), ordered = true,
      note = "arithmetic branches unify to DOUBLE; log2 restricted to " +
        "the positive domain (DuckDB hard-errors outside it; the NULL " +
        "contract is pinned by the math-funcs wave)"),

    QCase("vector_coalesce_2.q", "w17a07",
      """SELECT str2, ROUND(sum(cast(COALESCE(str1, 0) as int))/60, 2)
        |  as result
        |FROM (VALUES (CAST(NULL AS STRING), 'X'), ('0', 'X'), ('1', 'X'),
        |  (CAST(NULL AS STRING), 'y'), (CAST(NULL AS STRING),
        |   CAST(NULL AS STRING))) str_str(str1, str2)
        |GROUP BY str2""".stripMargin,
      duck = Some("""SELECT str2,
        |  ROUND(sum(cast(COALESCE(str1, '0') as int))/60, 2) as result
        |FROM (VALUES (CAST(NULL AS VARCHAR), 'X'), ('0', 'X'), ('1', 'X'),
        |  (CAST(NULL AS VARCHAR), 'y'), (CAST(NULL AS VARCHAR),
        |   CAST(NULL AS VARCHAR))) str_str(str1, str2)
        |GROUP BY str2""".stripMargin),
      note = "COALESCE(string, int) unifies to string in Hive, then " +
        "casts back to int; NULL group key survives"),

    QCase("vector_coalesce_2.q", "w17a08",
      """SELECT COALESCE(str1, 0) as result
        |FROM (VALUES (CAST(NULL AS STRING), 'X'), ('0', 'X'), ('1', 'X'),
        |  (CAST(NULL AS STRING), 'y'), (CAST(NULL AS STRING),
        |   CAST(NULL AS STRING))) str_str(str1, str2)""".stripMargin,
      duck = Some("""SELECT COALESCE(str1, '0') as result
        |FROM (VALUES (CAST(NULL AS VARCHAR), 'X'), ('0', 'X'), ('1', 'X'),
        |  (CAST(NULL AS VARCHAR), 'y'), (CAST(NULL AS VARCHAR),
        |   CAST(NULL AS VARCHAR))) str_str(str1, str2)""".stripMargin),
      note = "the bare COALESCE answers the string '0' fallback"),

    QCase("vector_coalesce_3.q", "w17a09",
      """SELECT m.member,
        |  (CASE WHEN COALESCE(n.attr, 5) > 1 THEN n.attr END) AS attr
        |FROM (VALUES (1), (2), (3), (4), (CAST(NULL AS BIGINT)))
        |  m(member)
        |LEFT JOIN (VALUES (3, 1), (2, 2), (CAST(NULL AS BIGINT),
        |  CAST(NULL AS BIGINT))) n(member, attr)
        |ON m.member = n.member""".stripMargin,
      note = "COALESCE over the outer join's NULL-extended side: " +
        "unmatched members coalesce to 5 > 1 and answer NULL attr " +
        "(not 5)"),

    QCase("vector_coalesce_4.q", "w17a10",
      """SELECT coalesce(a, b) AS c FROM (VALUES (1, 2),
        |  (CAST(NULL AS INT), CAST(NULL AS INT))) coalesce_test(a, b)
        |ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin,
      ordered = true,
      note = "all-NULL row coalesces to NULL"),

    QCase("vector_elt.q", "w17a11",
      """SELECT (ctinyint % 2) + 1 AS n, cstring1, cint,
        |  elt((ctinyint % 2) + 1, cstring1, cint) AS e
        |FROM qt_alltypesorc
        |WHERE ctinyint > 0 AND cstring1 IS NOT NULL AND cint IS NOT NULL
        |ORDER BY cstring1, cint, ctinyint LIMIT 10""".stripMargin,
      duck = Some("""SELECT (ctinyint % 2) + 1 AS n, cstring1, cint,
        |  ([cstring1, CAST(cint AS VARCHAR)])[(ctinyint % 2) + 1] AS e
        |FROM qt_alltypesorc
        |WHERE ctinyint > 0 AND cstring1 IS NOT NULL AND cint IS NOT NULL
        |ORDER BY cstring1, cint, ctinyint LIMIT 10""".stripMargin),
      ordered = true,
      note = "elt's index picks between mixed string/int args (all " +
        "stringified); the .q's bare LIMIT gets a deterministic ORDER " +
        "BY in both legs"),

    QCase("vector_elt.q", "w17a12",
      """SELECT elt(2, 'abc', 'defg') AS c1,
        |  elt(3, 'aa', 'bb', 'cc', 'dd', 'ee', 'ff', 'gg') AS c2,
        |  elt('1', 'abc', 'defg') AS c3,
        |  elt(2, 'aa', CAST('2' AS TINYINT)) AS c4,
        |  elt(2, 'aa', CAST('12345' AS SMALLINT)) AS c5,
        |  elt(2, 'aa', CAST('123456789012' AS BIGINT)) AS c6,
        |  elt(2, 'aa', CAST(1.25 AS FLOAT)) AS c7,
        |  elt(2, 'aa', CAST(16.0 AS DOUBLE)) AS c8,
        |  elt(0, 'abc', 'defg') AS c9,
        |  elt(3, 'abc', 'defg') AS c10""".stripMargin,
      duck = Some("""SELECT 'defg' AS c1, 'cc' AS c2, 'abc' AS c3,
        |  '2' AS c4, '12345' AS c5, '123456789012' AS c6,
        |  '1.25' AS c7, '16.0' AS c8,
        |  CAST(NULL AS VARCHAR) AS c9, CAST(NULL AS VARCHAR) AS c10"""
        .stripMargin),
      note = "elt over literals: string index coerces, numeric args " +
        "stringify, out-of-range (0, or past the arg count) answers " +
        "NULL — expected values transcribed from udf_elt.q.out"),

    QCase("vector_nvl.q", "w17a13",
      """SELECT cdouble, nvl(cdouble, 100) as n
        |FROM qt_alltypesorc
        |WHERE (cdouble IS NULL) LIMIT 10""".stripMargin,
      duck = Some("""SELECT cdouble, coalesce(cdouble, 100) as n
        |FROM qt_alltypesorc
        |WHERE (cdouble IS NULL) LIMIT 10""".stripMargin),
      note = "nvl = 2-arg coalesce; all selected rows take the " +
        "fallback so the bare LIMIT is content-deterministic"),

    QCase("vector_nvl.q", "w17a14",
      """SELECT nvl(null, 10) as n1, nvl(null, null) as n2
        |FROM qt_alltypesorc LIMIT 1""".stripMargin,
      duck = Some("""SELECT coalesce(null, 10) as n1,
        |  coalesce(null, null) as n2
        |FROM qt_alltypesorc LIMIT 1""".stripMargin),
      note = "literal NULLs: nvl(null, 10) = 10; nvl(null, null) " +
        "stays NULL"),

    QCase("vector_between_columns.q", "w17a15",
      """select tint.rnum, tsint.rnum AS rnum2, tint.cint, tsint.csint,
        |  (case when (tint.cint between tsint.csint and tsint.csint)
        |   then "Ok" else "NoOk" end) as between_col
        |from qt_tint tint , qt_tsint tsint""".stripMargin,
      duck = Some("""select tint.rnum, tsint.rnum AS rnum2, tint.cint,
        |  tsint.csint,
        |  (case when (tint.cint between tsint.csint and tsint.csint)
        |   then 'Ok' else 'NoOk' end) as between_col
        |from qt_tint tint cross join qt_tsint tsint""".stripMargin),
      note = "column-vs-column BETWEEN over the int/smallint cross " +
        "product; a NULL bound makes the predicate NULL which routes " +
        "to the else branch"),

    QCase("vector_between_columns.q", "w17a16",
      """select tint.rnum, tsint.rnum AS rnum2, tint.cint, tsint.csint
        |from qt_tint tint , qt_tsint tsint
        |where tint.cint between tsint.csint and tsint.csint"""
        .stripMargin,
      duck = Some("""select tint.rnum, tsint.rnum AS rnum2, tint.cint,
        |  tsint.csint
        |from qt_tint tint cross join qt_tsint tsint
        |where tint.cint between tsint.csint and tsint.csint"""
        .stripMargin),
      note = "as a filter the NULL-bound rows drop"),

    QCase("vector_between_in.q", "w17a17",
      """WITH decimal_date_test AS (
        |  SELECT CAST(((cdouble*22.1)/37) AS DECIMAL(20,10)) AS cdecimal1,
        |    CAST(CAST((CAST(cint AS BIGINT) * ctinyint) AS TIMESTAMP)
        |      AS DATE) AS cdate
        |  FROM qt_alltypesorc)
        |SELECT cdate FROM decimal_date_test
        |WHERE cdate IN (CAST("1969-10-26" AS DATE),
        |  CAST("1969-07-14" AS DATE))
        |ORDER BY cdate""".stripMargin,
      duck = Some("""WITH decimal_date_test AS (
        |  SELECT CAST(((cdouble*22.1)/37) AS DECIMAL(20,10)) AS cdecimal1,
        |    CAST(make_timestamp((CAST(cint AS BIGINT) * ctinyint)
        |      * 1000) AS DATE) AS cdate
        |  FROM qt_alltypesorc)
        |SELECT cdate FROM decimal_date_test
        |WHERE cdate IN (CAST('1969-10-26' AS DATE),
        |  CAST('1969-07-14' AS DATE))
        |ORDER BY cdate""".stripMargin), ordered = true,
      note = "date IN list; Hive's bigint→timestamp cast reads epoch " +
        "MILLISECONDS (timestamp_ints_casts.q.out; the r17 " +
        "IntegralTimestampCasts semantics), twinned as DuckDB " +
        "make_timestamp(ms * 1000 µs); the pre-epoch products " +
        "exercise negative-timestamp date flooring in both engines"),

    QCase("vector_between_in.q", "w17a18",
      """WITH decimal_date_test AS (
        |  SELECT CAST(((cdouble*22.1)/37) AS DECIMAL(20,10)) AS cdecimal1
        |  FROM qt_alltypesorc)
        |SELECT cdecimal1 FROM decimal_date_test
        |WHERE cdecimal1 IN (2365.8945945946, 881.0135135135,
        |  -3367.6517567568)
        |ORDER BY cdecimal1""".stripMargin,
      duck = Some("""WITH decimal_date_test AS (
        |  SELECT CAST(((cdouble*22.1)/37) AS DECIMAL(20,10)) AS cdecimal1
        |  FROM qt_alltypesorc)
        |SELECT cdecimal1 FROM decimal_date_test
        |WHERE cdecimal1 IN (2365.8945945946, 881.0135135135,
        |  -3367.6517567568)
        |ORDER BY cdecimal1""".stripMargin), ordered = true,
      note = "decimal IN with higher-scale literals — the decimal " +
        "values never equal them except where the double product " +
        "rounds exactly; both engines agree cell-for-cell"),

    QCase("vector_between_in.q", "w17a19",
      """WITH decimal_date_test AS (
        |  SELECT CAST(((cdouble*22.1)/37) AS DECIMAL(20,10)) AS cdecimal1
        |  FROM qt_alltypesorc)
        |SELECT COUNT(*) AS c FROM decimal_date_test
        |WHERE cdecimal1 NOT BETWEEN -2000 AND 4390.1351351351"""
        .stripMargin,
      note = "NOT BETWEEN drops NULLs (NULL predicate is not true)"),

    QCase("vector_between_in.q", "w17a20",
      """WITH decimal_date_test AS (
        |  SELECT CAST(((cdouble*22.1)/37) AS DECIMAL(20,10)) AS cdecimal1
        |  FROM qt_alltypesorc)
        |SELECT c0, count(1) AS c FROM (SELECT cdecimal1 NOT BETWEEN
        |  -2000 AND 4390.1351351351 as c0 FROM decimal_date_test) tab
        |GROUP BY c0 ORDER BY c0 NULLS FIRST""".stripMargin,
      ordered = true,
      note = "the predicate AS A VALUE keeps its NULL group (12 " +
        "NULL-cdouble rows) — projection vs filter semantics"))

  test("qtest conformance wave 17a: vector_* conditional expressions " +
      "(CASE/IF ladders, COALESCE unification, elt, nvl, BETWEEN/IN)") {
    run("vector_case_when_1", "vector_case_when_2", "vector_if_expr",
      "vector_coalesce", "vector_elt", "vector_nvl",
      "vector_between_columns", "vector_between_in")
  }
}
