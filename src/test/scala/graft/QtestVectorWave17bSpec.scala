package graft

/** Conformance wave 17b: the vector_decimal* corpus — decimal casts to
  * every primitive type (vector_decimal_1/2.q), text-load rounding and
  * overflow (vector_decimal_5/10_0/trailing.q), round() at positive and
  * NEGATIVE digits on wide decimals (vector_decimal_round{,_2}.q),
  * precision-edge arithmetic over the kv8 corpus
  * (vector_decimal_precision.q), the decimal64 fast-path arithmetic
  * sums (vector_decimal64_*.q), mixed-type casts INTO decimal
  * (vector_decimal_cast.q), and the big arithmetic expression block
  * (vector_decimal_expressions.q).
  *
  * Porting notes:
  *  - Hive casts decimal→integer by TRUNCATION toward zero; DuckDB's
  *    cast ROUNDS — the twins spell CAST(trunc(x) AS ...). 3404045.5
  *    (vector_decimal_2) is the witness value.
  *  - decimal→boolean is (x <> 0) in the twin (DuckDB has no such cast).
  *  - decimal→timestamp reads the value as epoch SECONDS, twinned as
  *    make_timestamp(CAST(x * 1000000 AS BIGINT)) — exact because the
  *    source scales divide 1e6.
  *  - cast-to-smaller-decimal overflow answers NULL in Hive/Spark where
  *    DuckDB errors; the twins guard with CASE on the integer-digit
  *    bound.
  *  - division results compare under the harness's 1e-6 relative
  *    tolerance (the engines' decimal division scales differ by design).
  */
class QtestVectorWave17bSpec extends QtestHarness {

  // the vector_decimal_expressions.q derived table, as a WITH both
  // engines share (NULL row + alltypesorc derivation)
  private val decTest =
    """WITH decimal_test AS (
      |  SELECT cdouble, CAST(((cdouble*22.1)/37) AS DECIMAL(20,10)) AS
      |    cdecimal1, CAST(((cdouble*9.3)/13) AS DECIMAL(23,14)) AS
      |    cdecimal2
      |  FROM qt_alltypesorc)""".stripMargin

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_decimal_1.q", "w17b01",
      """SELECT cast(t as boolean) AS b, cast(t as tinyint) AS ti,
        |  cast(t as smallint) AS si, cast(t as int) AS i,
        |  cast(t as bigint) AS bi, cast(t as float) AS f,
        |  cast(t as double) AS d, cast(t as string) AS s,
        |  cast(t as timestamp) AS ts,
        |  cast(3.1415926BD as decimal(5)) AS u,
        |  cast(3115926.54321BD as decimal) AS v
        |FROM (VALUES (CAST('17.29' AS DECIMAL(4,2))),
        |  (CAST(NULL AS DECIMAL(4,2)))) decimal_1(t)
        |ORDER BY t""".stripMargin,
      duck = Some("""SELECT (t <> 0) AS b,
        |  CAST(trunc(t) AS TINYINT) AS ti,
        |  CAST(trunc(t) AS SMALLINT) AS si,
        |  CAST(trunc(t) AS INT) AS i, CAST(trunc(t) AS BIGINT) AS bi,
        |  CAST(t AS FLOAT) AS f, CAST(t AS DOUBLE) AS d,
        |  CAST(t AS VARCHAR) AS s,
        |  make_timestamp(CAST(t * 1000000 AS BIGINT)) AS ts,
        |  CAST(3.1415926 AS DECIMAL(5,0)) AS u,
        |  CAST(3115926.54321 AS DECIMAL(10,0)) AS v
        |FROM (VALUES (CAST('17.29' AS DECIMAL(4,2))),
        |  (CAST(NULL AS DECIMAL(4,2)))) decimal_1(t)
        |ORDER BY t NULLS LAST""".stripMargin), ordered = true,
      note = "decimal(4,2) to every primitive; bare DECIMAL defaults " +
        "to (10,0); the BD literal rounds HALF_UP on the narrowing cast"),

    QCase("vector_decimal_2.q", "w17b02",
      """SELECT cast(t as tinyint) AS ti, cast(t as smallint) AS si,
        |  cast(t as int) AS i, cast(t as bigint) AS bi,
        |  cast(t as float) AS f, cast(t as double) AS d,
        |  cast(t as string) AS s, cast(t as boolean) AS b
        |FROM (VALUES (CAST('17.29' AS DECIMAL(18,9))),
        |  (CAST('3404045.5044003' AS DECIMAL(18,9)))) decimal_2(t)
        |ORDER BY t""".stripMargin,
      duck = Some("""SELECT
        |  CASE WHEN trunc(t) BETWEEN -128 AND 127
        |    THEN CAST(trunc(t) AS TINYINT) END AS ti,
        |  CASE WHEN trunc(t) BETWEEN -32768 AND 32767
        |    THEN CAST(trunc(t) AS SMALLINT) END AS si,
        |  CAST(trunc(t) AS INT) AS i,
        |  CAST(trunc(t) AS BIGINT) AS bi, CAST(t AS FLOAT) AS f,
        |  CAST(t AS DOUBLE) AS d, CAST(t AS VARCHAR) AS s,
        |  (t <> 0) AS b
        |FROM (VALUES (CAST('17.29' AS DECIMAL(18,9))),
        |  (CAST('3404045.5044003' AS DECIMAL(18,9)))) decimal_2(t)
        |ORDER BY t""".stripMargin), ordered = true,
      note = "3404045.5044003 → int is 3404045 by TRUNCATION (a " +
        "rounding cast answers ...046); decimal→tinyint/smallint " +
        "OVERFLOW answers NULL (ref vector_decimal_2.q.out:1236 pins " +
        "NULL, not a wrapped value) — the twin guards the range"),

    QCase("vector_decimal_5.q", "w17b03",
      "SELECT key AS k FROM qt_kv7 ORDER BY key NULLS LAST",
      ordered = true,
      note = "the kv7 text-load corpus: 1E+99 overflowed to NULL at " +
        "load, 1E-99 rounded to zero"),

    QCase("vector_decimal_5.q", "w17b04",
      "SELECT DISTINCT key AS k FROM qt_kv7 ORDER BY k NULLS LAST",
      ordered = true),

    QCase("vector_decimal_5.q", "w17b05",
      "SELECT cast(key as decimal) AS k FROM qt_kv7",
      duck = Some("SELECT CASE WHEN abs(key) >= 9999999999.5 THEN NULL " +
        "ELSE CAST(key AS DECIMAL(10,0)) END AS k FROM qt_kv7"),
      note = "narrowing to the default (10,0) rounds HALF_UP; values " +
        "whose rounded integer part needs 11 digits answer NULL"),

    QCase("vector_decimal_5.q", "w17b06",
      "SELECT cast(key as decimal(6,3)) AS k FROM qt_kv7",
      duck = Some("SELECT CASE WHEN abs(key) >= 999.9995 THEN NULL " +
        "ELSE CAST(key AS DECIMAL(6,3)) END AS k FROM qt_kv7"),
      note = "cast-to-smaller-decimal overflow is NULL in Hive/Spark " +
        "(DuckDB errors — the twin guards the bound)"),

    QCase("vector_decimal_10_0.q", "w17b07",
      "SELECT `dec` AS d FROM qt_dec100 ORDER BY `dec` NULLS LAST",
      duck = Some("SELECT dec AS d FROM qt_dec100 ORDER BY dec NULLS LAST"),
      ordered = true,
      note = "999999999.999 rounds into decimal(10,0); " +
        "9999999999.999 overflows the type at LOAD and answers NULL"),

    QCase("vector_decimal_trailing.q", "w17b08",
      "SELECT id, a, b FROM qt_kv10 ORDER BY id",
      ordered = true,
      note = "trailing zeros survive the text→decimal load; the " +
        "canonical compare strips rendering-only zeros on both sides"),

    QCase("vector_decimal_round.q", "w17b09",
      """SELECT `dec` AS d, round(`dec`, -1) AS r
        |FROM (VALUES (CAST(101 AS DECIMAL(10,0)))) decimal_tbl(`dec`)
        |ORDER BY `dec`""".stripMargin,
      duck = Some("""SELECT dec AS d, round(dec, -1) AS r
        |FROM (VALUES (CAST(101 AS DECIMAL(10,0)))) decimal_tbl(dec)
        |ORDER BY dec""".stripMargin), ordered = true,
      note = "negative-digit round on an int-scale decimal: 101 → 100"),

    QCase("vector_decimal_round.q", "w17b10",
      """SELECT `dec` AS d, round(`dec`, -1) AS r
        |FROM (VALUES (CAST(101 AS DECIMAL(10,0)))) decimal_tbl(`dec`)
        |ORDER BY round(`dec`, -1)""".stripMargin,
      duck = Some("""SELECT dec AS d, round(dec, -1) AS r
        |FROM (VALUES (CAST(101 AS DECIMAL(10,0)))) decimal_tbl(dec)
        |ORDER BY round(dec, -1)""".stripMargin), ordered = true,
      note = "ordering by the rounded expression itself"),

    QCase("vector_decimal_round_2.q", "w17b11",
      """SELECT
        |  round(`dec`) as d, round(`dec`, 0) AS r0, round(`dec`, 1) AS r1,
        |  round(`dec`, 2) AS r2, round(`dec`, 3) AS r3,
        |  round(`dec`, -1) AS rm1, round(`dec`, -2) AS rm2,
        |  round(`dec`, -3) AS rm3, round(`dec`, -4) AS rm4,
        |  round(`dec`, -5) AS rm5, round(`dec`, -6) AS rm6,
        |  round(`dec`, -7) AS rm7, round(`dec`, -8) AS rm8
        |FROM (VALUES (CAST(55555 AS DECIMAL(38,18)))) t(`dec`)
        |ORDER BY d""".stripMargin,
      duck = Some("""SELECT
        |  round(dec) as d, round(dec, 0) AS r0, round(dec, 1) AS r1,
        |  round(dec, 2) AS r2, round(dec, 3) AS r3,
        |  round(dec, -1) AS rm1, round(dec, -2) AS rm2,
        |  round(dec, -3) AS rm3, round(dec, -4) AS rm4,
        |  round(dec, -5) AS rm5, round(dec, -6) AS rm6,
        |  round(dec, -7) AS rm7, round(dec, -8) AS rm8
        |FROM (VALUES (CAST(55555 AS DECIMAL(38,18)))) t(dec)
        |ORDER BY d""".stripMargin), ordered = true,
      note = "the full negative-digit ladder on a decimal(38,18): " +
        "-5 rounds 55555 → 100000, -8 → 0"),

    QCase("vector_decimal_round_2.q", "w17b12",
      """SELECT
        |  round(pos) as p, round(pos, 0) AS p0, round(pos, 1) AS p1,
        |  round(pos, 2) AS p2, round(pos, 3) AS p3, round(pos, 4) AS p4,
        |  round(pos, -1) AS pm1, round(pos, -2) AS pm2,
        |  round(neg) AS n, round(neg, 0) AS n0, round(neg, 1) AS n1,
        |  round(neg, 2) AS n2, round(neg, 3) AS n3, round(neg, 4) AS n4,
        |  round(neg, -1) AS nm1, round(neg, -2) AS nm2
        |FROM (VALUES (CAST(125.315 AS DECIMAL(38,18)),
        |  CAST(-125.315 AS DECIMAL(38,18)))) t(pos, neg)
        |ORDER BY p""".stripMargin,
      note = "HALF_UP at the .315 boundary: round(±125.315, 2) = " +
        "±125.32 (away from zero) in both engines"),

    QCase("vector_decimal64_add_decimal64column_diffscale.q", "w17b13",
      """SELECT CAST(sum(ss_ext_list_price + ss_ext_wholesale_cost)
        |  AS DECIMAL(18,2)) AS s
        |FROM qt_dec64b""".stripMargin,
      note = "decimal64 addition across DIFFERENT scales (scale 2 + " +
        "scale 1) over the 1000-row corpus"),

    QCase("vector_decimal64_mul_decimal64column.q", "w17b14",
      """SELECT CAST(sum(ss_ext_list_price * ss_ext_discount_amt)
        |  AS DECIMAL(22,4)) AS s
        |FROM qt_dec64""".stripMargin,
      note = "decimal64 column×column product sum"),

    QCase("vector_decimal64_mul_decimal64scalar.q", "w17b15",
      """SELECT CAST(sum(((ss_ext_list_price - ss_ext_wholesale_cost
        |  - ss_ext_discount_amt) + ss_ext_sales_price) * 2.2)
        |  AS DECIMAL(22,3)) AS s
        |FROM qt_dec64""".stripMargin,
      note = "decimal64 arithmetic chain times a scalar"),

    QCase("vector_decimal64_div_decimal64scalar.q", "w17b16",
      """SELECT CAST(sum(((ss_ext_list_price - ss_ext_wholesale_cost
        |  - ss_ext_discount_amt) + ss_ext_sales_price) / 2.268767)
        |  AS DECIMAL(22,6)) AS s
        |FROM qt_dec64""".stripMargin,
      note = "decimal division by a 6-scale scalar; the engines' " +
        "division scales differ — compared under tolerance after the " +
        "common final cast"),

    QCase("vector_decimal64_div_decimal64column.q", "w17b17",
      """SELECT CAST(sum(ss_ext_list_price / ss_ext_discount_amt)
        |  AS DECIMAL(22,6)) AS s
        |FROM qt_dec64
        |WHERE ss_ext_discount_amt <> 0""".stripMargin,
      note = "column/column division (zero divisors filtered in both " +
        "legs — Hive answers NULL, DuckDB errors)"),

    QCase("vector_decimal_precision.q", "w17b18",
      """SELECT dval AS d, dval + 1 AS p1, dval - 1 AS m1
        |FROM qt_kv8 WHERE dval IS NOT NULL ORDER BY dval"""
        .stripMargin,
      ordered = true,
      note = "kv8 precision corpus: ±1 at decimal(20,10)"),

    QCase("vector_decimal_precision.q", "w17b19",
      """SELECT dval AS d, dval * 2 AS t2,
        |  CAST(dval / 3 AS DECIMAL(30,12)) AS d3,
        |  CAST(dval / 9 AS DECIMAL(30,12)) AS d9,
        |  CAST(dval / 27 AS DECIMAL(30,12)) AS d27
        |FROM qt_kv8 WHERE dval IS NOT NULL ORDER BY dval""".stripMargin,
      ordered = true,
      note = "repeating-fraction divisions at a common final scale"),

    QCase("vector_decimal_precision.q", "w17b20",
      """SELECT CAST(avg(dval) AS DECIMAL(24,14)) AS a,
        |  CAST(sum(dval) AS DECIMAL(24,10)) AS s
        |FROM qt_kv8""".stripMargin,
      note = "avg keeps the widened scale, sum the source scale"),

    QCase("vector_decimal_precision.q", "w17b21",
      """SELECT MIN(cast('12345678901234567890.12345678' as
        |  decimal(38,18))) AS mn,
        |  COUNT(cast('12345678901234567890.12345678' as
        |  decimal(38,18))) AS c
        |FROM qt_kv8""".stripMargin,
      note = "a constant wide decimal under MIN/COUNT over the corpus"),

    QCase("vector_decimal_cast.q", "w17b22",
      """SELECT cdouble, cint, cboolean1,
        |  CAST(cdouble AS DECIMAL(20,10)) AS dd,
        |  CAST(cint AS DECIMAL(23,14)) AS di,
        |  CAST(cboolean1 AS DECIMAL(5,2)) AS db
        |FROM qt_alltypesorc
        |WHERE cdouble IS NOT NULL AND cint IS NOT NULL
        |  AND cboolean1 IS NOT NULL
        |ORDER BY cdouble, cint LIMIT 10""".stripMargin,
      duck = Some("""SELECT cdouble, cint, cboolean1,
        |  CAST(cdouble AS DECIMAL(20,10)) AS dd,
        |  CASE WHEN abs(cint) > 999999999 THEN NULL
        |    ELSE CAST(cint AS DECIMAL(23,14)) END AS di,
        |  CAST(CASE WHEN cboolean1 THEN 1 ELSE 0 END
        |    AS DECIMAL(5,2)) AS db
        |FROM qt_alltypesorc
        |WHERE cdouble IS NOT NULL AND cint IS NOT NULL
        |  AND cboolean1 IS NOT NULL
        |ORDER BY cdouble, cint LIMIT 10""".stripMargin), ordered = true,
      note = "double/int/boolean INTO decimal (boolean→decimal is " +
        "1/0); the .q's bare LIMIT gets a deterministic ORDER BY"),

    QCase("vector_decimal_cast.q", "w17b23",
      """SELECT CAST(ts AS DECIMAL(15,0)) AS s0,
        |  CAST(ts AS DECIMAL(18,3)) AS s3,
        |  CAST(ts2 AS DECIMAL(15,0)) AS n0,
        |  CAST(ts2 AS DECIMAL(18,3)) AS n3
        |FROM (VALUES (timestamp '1970-01-01 00:00:17.79',
        |  timestamp '1969-12-31 23:59:42.21')) t(ts, ts2)""".stripMargin,
      duck = Some("SELECT 18 AS s0, 17.790 AS s3, -18 AS n0, " +
        "-17.790 AS n3"),
      note = "timestamp→decimal reads epoch seconds and rounds " +
        "HALF_UP at the target scale, negative values away from zero " +
        "(expected constants transcribed from Hive's " +
        "TimestampWritableV2 semantics)"),

    QCase("vector_decimal_expressions.q", "w17b24",
      s"""$decTest
        |SELECT cdecimal1 + cdecimal2 as c1,
        |  cdecimal1 - (2*cdecimal2) as c2,
        |  CAST((cdecimal1+2.34)/cdecimal2 AS DECIMAL(30,12)) as c3,
        |  CAST(cdecimal1 * (cdecimal2/3.4) AS DECIMAL(30,10)) as c4,
        |  cdecimal1 % 10 as c5,
        |  CAST(cdecimal1 AS INT) as c6,
        |  CAST(cdecimal2 AS SMALLINT) as c7,
        |  CAST(cdecimal2 AS TINYINT) as c8,
        |  CAST(cdecimal1 AS BIGINT) as c9,
        |  CAST(cdecimal1 AS BOOLEAN) as c10,
        |  CAST(cdecimal2 AS DOUBLE) as c11,
        |  CAST(cdecimal1 AS FLOAT) as c12,
        |  CAST(cdecimal2 AS STRING) as c13,
        |  CAST(cdecimal1 AS TIMESTAMP) as c14
        |FROM decimal_test
        |WHERE cdecimal1 > 0 AND cdecimal1 < 12345.5678
        |  AND cdecimal2 != 0 AND cdecimal2 > 1000 AND cdouble IS NOT NULL
        |ORDER BY c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12,
        |  c13, c14
        |LIMIT 10""".stripMargin,
      duck = Some(s"""$decTest
        |SELECT cdecimal1 + cdecimal2 as c1,
        |  cdecimal1 - (2*cdecimal2) as c2,
        |  CAST((cdecimal1+2.34)/cdecimal2 AS DECIMAL(30,12)) as c3,
        |  CAST(cdecimal1 * (cdecimal2/3.4) AS DECIMAL(30,10)) as c4,
        |  cdecimal1 % 10 as c5,
        |  CAST(trunc(cdecimal1) AS INT) as c6,
        |  CASE WHEN trunc(cdecimal2) BETWEEN -32768 AND 32767
        |    THEN CAST(trunc(cdecimal2) AS SMALLINT) END as c7,
        |  CASE WHEN trunc(cdecimal2) BETWEEN -128 AND 127
        |    THEN CAST(trunc(cdecimal2) AS TINYINT) END as c8,
        |  CAST(trunc(cdecimal1) AS BIGINT) as c9,
        |  (cdecimal1 <> 0) as c10,
        |  CAST(cdecimal2 AS DOUBLE) as c11,
        |  CAST(cdecimal1 AS FLOAT) as c12,
        |  CAST(cdecimal2 AS VARCHAR) as c13,
        |  make_timestamp(CAST(trunc(cdecimal1 * 1000000) AS BIGINT)) as c14
        |FROM decimal_test
        |WHERE cdecimal1 > 0 AND cdecimal1 < 12345.5678
        |  AND cdecimal2 != 0 AND cdecimal2 > 1000 AND cdouble IS NOT NULL
        |ORDER BY c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12,
        |  c13, c14
        |LIMIT 10""".stripMargin), ordered = true,
      note = "the canonical decimal expression block: arithmetic, " +
        "mod, every narrowing cast (smallint/tinyint overflow answers " +
        "NULL — the twin guards the range), boolean, string, and " +
        "epoch-seconds timestamp"))

  test("qtest conformance wave 17b: vector_decimal* (casts, rounding, " +
      "precision edges, decimal64 arithmetic)") {
    run("vector_decimal_1", "vector_decimal_2", "vector_decimal_5",
      "vector_decimal_10_0", "vector_decimal_trailing",
      "vector_decimal_round", "vector_decimal_round_2",
      "vector_decimal64_add_decimal64column_diffscale",
      "vector_decimal64_mul", "vector_decimal64_div",
      "vector_decimal_precision", "vector_decimal_cast",
      "vector_decimal_expressions")
  }
}
