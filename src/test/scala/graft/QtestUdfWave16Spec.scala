package graft

/** Conformance wave 16b: udf_* bulk — ref ql/src/test/queries/
  * clientpositive/udf_round_2.q, udf_round_3.q, udf_trunc_number.q,
  * udf_conv.q, udf_div.q, udf_divide.q, udf_modulo.q, udf_sign.q,
  * udf_locate.q, udf_rpad.q, udf_10_trims.q, udf_space2.q,
  * udf_decode.q, udf_typeof.q, udf_isops.q, udf_between.q,
  * udf_initcap.q, udf_reverse.q (expected cells from
  * results/clientpositive/llap).
  *
  * Wave findings (fixed in HiveFunctions):
  *  - Hive's trunc is dual-purpose: numeric truncation toward zero with
  *    positive/negative/NULL scale (udf_trunc_number.q) alongside the
  *    date path — the engine's override was date-only and 2-arg-only;
  *  - Hive's locate maps NULL/unparseable positions to 0 (answers 0,
  *    not NULL) and coerces any argument to string (udf_locate.q).
  */
class QtestUdfWave16Spec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    // ---- rounding: NaN passthrough; division-by-zero literals are NULL
    QCase("udf_round_2.q", "w01",
      "select round(cast('NaN' as double), 1) AS a, " +
        "round(cast('NaN' as double)) AS b",
      duck = Some(""), hive = Some(Seq("NaN", "NaN"))),

    QCase("udf_round_2.q", "w02",
      "select round(1/0) AS a, round(1/0, 2) AS b, " +
        "round(1.0/0.0) AS c, round(1.0/0.0, 2) AS d",
      duck = Some(""), hive = Some(Seq("NULL", "NULL", "NULL", "NULL")),
      note = "both integer and decimal zero-division are NULL, and " +
        "round propagates it"),

    // ---- round is identity on integral types across the full ranges
    QCase("udf_round_3.q", "w03",
      "select round(-128) AS a, round(127) AS b, round(0) AS c, " +
        "round(-32768) AS d, round(32767) AS e",
      duck = None),

    QCase("udf_round_3.q", "w04",
      "select round(cast(negative(pow(2, 31)) as INT)) AS a, " +
        "round(cast((pow(2, 31) - 1) as INT)) AS b, " +
        "round(cast(negative(pow(2, 63)) as BIGINT)) AS c, " +
        "round(cast((pow(2, 63) - 1) as BIGINT)) AS d",
      duck = Some(""),
      hive = Some(Seq("-2147483648", "2147483647",
        "-9223372036854775808", "9223372036854775807"))),

    QCase("udf_round_3.q", "w05",
      "select round(126.1) AS a, round(126.7) AS b, " +
        "round(32766.1) AS c, round(32766.7) AS d",
      duck = None),

    // ---- numeric trunc: scale, negative scale, zero, 1-arg, NULL scale
    QCase("udf_trunc_number.q", "w06",
      "select trunc(1234567891.1234567891, 4) AS a, " +
        "trunc(1234567891.1234567891, -4) AS b, " +
        "trunc(1234567891.1234567891, 0) AS c, " +
        "trunc(1234567891.1234567891) AS d",
      duck = Some(""),
      hive = Some(Seq("1234567891.1234", "1234560000", "1234567891",
        "1234567891"))),

    QCase("udf_trunc_number.q", "w07",
      "select trunc(12.123891, 4) AS a, trunc(12, -4) AS b",
      duck = Some(""), hive = Some(Seq("12.1238", "0"))),

    QCase("udf_trunc_number.q", "w08",
      "select trunc(c, d) AS a from (select cast(12345.1234 as double) " +
        "AS c, cast(null as int) AS d) t",
      duck = Some(""), hive = Some(Seq("12345.0")),
      note = "non-literal NULL scale behaves as scale 0 " +
        "(udf_trunc_number.q.out sampletable row 4)"),

    QCase("udf_trunc_number.q", "w09",
      "select trunc(c, d) AS a from (select cast(12345.1234 as double) " +
        "AS c, cast(-4 as int) AS d) t",
      duck = Some(""), hive = Some(Seq("10000.0")),
      note = "column-valued (non-constant-folded) scale"),

    // ---- conv: bases, negatives as two's complement, overflow pins,
    // invalid bases NULL, longest-valid-prefix parse
    QCase("udf_conv.q", "w10",
      "select conv('4521', 10, 36) AS a, conv('22', 10, 10) AS b, " +
        "conv('110011', 2, 16) AS c, conv('facebook', 36, 16) AS d",
      duck = Some(""),
      hive = Some(Seq("3HL", "22", "33", "116ED2B2FB4"))),

    QCase("udf_conv.q", "w11",
      "select conv('-641', 10, -10) AS a, conv('1011', 2, -16) AS b, " +
        "conv('-1', 10, 16) AS c, conv('-15', 10, 16) AS d",
      duck = Some(""),
      hive = Some(Seq("-641", "B", "FFFFFFFFFFFFFFFF", "FFFFFFFFFFFFFFF1"))),

    QCase("udf_conv.q", "w12",
      "select conv('9223372036854775807', 36, 16) AS a, " +
        "conv('9223372036854775807', 36, -16) AS b, " +
        "conv('-9223372036854775807', 36, 16) AS c, " +
        "conv('-9223372036854775807', 36, -16) AS d",
      duck = Some(""),
      hive = Some(Seq("FFFFFFFFFFFFFFFF", "-1", "FFFFFFFFFFFFFFFF", "-1")),
      note = "overflow pins to unsigned max / signed -1"),

    QCase("udf_conv.q", "w13",
      "select conv('123455', 3, 10) AS a, conv('131', 1, 5) AS b, " +
        "conv('515', 5, 100) AS c, conv('10', -2, 2) AS d",
      duck = Some(""), hive = Some(Seq("5", "NULL", "NULL", "NULL")),
      note = "invalid bases NULL; invalid digit keeps the longest valid " +
        "prefix ('12' base 3 = 5)"),

    QCase("udf_conv.q", "w14",
      "select conv(4521, 10, 36) AS a, conv(-641, 10, -10) AS b, " +
        "conv(-15, 10, 16) AS c",
      duck = Some(""),
      hive = Some(Seq("3HL", "-641", "FFFFFFFFFFFFFFF1")),
      note = "integer (not string) first arguments"),

    // ---- div / divide / mod
    QCase("udf_div.q", "w15",
      "select 3 DIV 2 AS a, 3 / 2 AS b, mod(3, 2) AS c",
      duck = Some("select 3 // 2 AS a, 3 / 2 AS b, mod(3, 2) AS c"),
      note = "DIV is integral, / is fractional on integers"),

    // ---- sign returns DOUBLE in Hive
    QCase("udf_sign.q", "w16",
      "select sign(0) AS a, sign(-45) AS b, sign(46) AS c",
      duck = None),

    // ---- locate: coercions, NULL/invalid position -> 0
    QCase("udf_locate.q", "w17",
      "select locate('abc', 'abcd') AS c1, locate('ccc', 'abcabc') AS c2, " +
        "locate('23', 123) AS c3, locate(23, 123) AS c4, " +
        "locate('abc', 'abcabc', 2) AS c5, locate('abc', 'abcabc', '2') AS c6, " +
        "locate(1, TRUE) AS c7, locate(1, FALSE) AS c8, " +
        "locate(CAST('2' AS TINYINT), '12345') AS c9, " +
        "locate('34', CAST('12345' AS SMALLINT)) AS c10, " +
        "locate('456', CAST('123456789012' AS BIGINT)) AS c11, " +
        "locate('.25', CAST(1.25 AS FLOAT)) AS c12, " +
        "locate('.0', CAST(16.0 AS DOUBLE)) AS c13, " +
        "locate(null, 'abc') AS c14, locate('abc', null) AS c15, " +
        "locate('abc', 'abcd', null) AS c16, " +
        "locate('abc', 'abcd', 'invalid number') AS c17",
      duck = Some(""),
      hive = Some(Seq("1", "0", "2", "2", "4", "4", "0", "0", "2", "3",
        "4", "2", "3", "NULL", "NULL", "0", "0"))),

    // ---- rpad truncation and cyclic fill
    QCase("udf_rpad.q", "w18",
      "select rpad('hi', 1, '?') AS a, rpad('hi', 5, '.') AS b, " +
        "rpad('hi', 6, '123') AS c",
      duck = None),

    // ---- trim is idempotent through ten layers; initcap word-cases
    QCase("udf_10_trims.q", "w19",
      "select trim(trim(trim(trim(trim(trim(trim(trim(trim(trim( " +
        "'  abc  ')))))))))) AS a",
      duck = None),

    QCase("udf_initcap.q", "w20",
      "select initcap('tHe soap') AS a, initcap('eat PIE') AS b",
      duck = Some(""), hive = Some(Seq("The Soap", "Eat Pie"))),

    QCase("udf_reverse.q", "w21",
      "select reverse(value) AS r from qt_src where key = '86'",
      duck = None),

    // ---- space
    QCase("udf_space2.q", "w22",
      "select length(space(5)) AS a, length(space(0)) AS b, " +
        "space(3) AS c",
      duck = Some("select length(repeat(' ', 5)) AS a, " +
        "length(repeat(' ', 0)) AS b, repeat(' ', 3) AS c")),

    // ---- charset decode of binary
    QCase("udf_decode.q", "w23",
      "select decode(cast('TestDecode1' as binary), 'UTF-8') AS a, " +
        "decode(cast(null as binary), 'UTF-8') AS b",
      duck = Some(""), hive = Some(Seq("TestDecode1", "NULL"))),

    // ---- typeof renders Hive type names
    QCase("udf_typeof.q", "w24",
      "select typeof(1) AS a, typeof('string') AS b, " +
        "typeof(CAST(1 as DECIMAL(4,3))) AS c",
      duck = Some(""), hive = Some(Seq("int", "string", "decimal(4,3)"))),

    // ---- IS [NOT] TRUE/FALSE over NULL
    QCase("udf_isops.q", "w25",
      "select (NULL is true) AS a, (NULL is not true) AS b, " +
        "(NULL is false) AS c, (NULL is not false) AS d",
      duck = None),

    // ---- between with expression bounds and cross-type coercions
    QCase("udf_between.q", "w26",
      "select count(*) AS n from qt_src " +
        "where key + 100 between (150 + -50) AND (150 + 50)",
      duck = Some("select count(*) AS n from qt_src " +
        "where cast(key as int) + 100 between 100 and 200")),

    QCase("udf_between.q", "w27",
      "select count(*) AS n from qt_src " +
        "where key + 100 not between (150 + -50) AND (150 + 50)",
      duck = Some("select count(*) AS n from qt_src " +
        "where cast(key as int) + 100 not between 100 and 200")),

    QCase("udf_between.q", "w28",
      "select ('b' between 'a' and 'c') AS a, (2 between 2 and '3') AS b",
      duck = Some("select ('b' between 'a' and 'c') AS a, " +
        "(2 between 2 and 3) AS b")))

  test("qtest conformance: udf wave 16 (rounding edges, numeric trunc, " +
      "conv bases/overflow, locate coercions, trims, decode, typeof, " +
      "is-ops, between)") {
    run("udf_")
  }
}
