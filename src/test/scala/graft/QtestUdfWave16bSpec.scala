package graft

/** Conformance wave 16d: udf_* bulk continued — ref ql/src/test/queries/
  * clientpositive/udf_bitwise_shiftright.q,
  * udf_bitwise_shiftrightunsigned.q, udf_bitwise_{and,or,xor,not}.q,
  * udf_map.q, udf_struct.q, udf_named_struct.q, udf_array.q,
  * udf_map_values.q, udf_to_byte.q, udf_to_boolean.q, udf_regexp.q,
  * udf_crc32.q, udf_md5.q, udf_sha2.q, udf_unhex.q, udf_E.q,
  * udf_degrees.q, udf_percentile.q, udf_isnull_isnotnull.q (expected
  * cells from results/clientpositive/llap).
  */
class QtestUdfWave16bSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    // ---- shifts promote narrow ints to INT and mask the distance by
    // the JAVA width (>> 32 is identity on int, >> 31 saturates sign)
    QCase("udf_bitwise_shiftright.q", "x01",
      "select shiftright(a, 0) AS c1, shiftright(a, 1) AS c2, " +
        "shiftright(a, 31) AS c3, shiftright(a, 32) AS c4 " +
        "from (select cast(-128 as tinyint) AS a) t",
      duck = Some(""), hive = Some(Seq("-128", "-64", "-1", "-128"))),

    QCase("udf_bitwise_shiftright.q", "x02",
      "select shiftright(a, 0) AS c1, shiftright(a, 2) AS c2, " +
        "shiftright(a, 63) AS c3, shiftright(a, 64) AS c4 " +
        "from (select cast(-9223372036854775808 as bigint) AS a) t",
      duck = Some(""),
      hive = Some(Seq("-9223372036854775808", "-2305843009213693952",
        "-1", "-9223372036854775808"))),

    QCase("udf_bitwise_shiftright.q", "x03",
      "select shiftright(1024, 33) AS c1, shiftright(1024, -2) AS c2, " +
        "shiftright(1024, cast(null as int)) AS c3, " +
        "shiftright(cast(null as int), 4) AS c4",
      duck = Some(""), hive = Some(Seq("512", "0", "NULL", "NULL")),
      note = "negative distance wraps mod 32 (Java shift semantics)"),

    QCase("udf_bitwise_shiftrightunsigned.q", "x04",
      "select shiftrightunsigned(a, 1) AS c1, " +
        "shiftrightunsigned(a, 31) AS c2, shiftrightunsigned(a, 32) AS c3 " +
        "from (select cast(-128 as tinyint) AS a) t",
      duck = Some(""), hive = Some(Seq("2147483584", "1", "-128")),
      note = "tinyint promotes to INT before the unsigned shift"),

    QCase("udf_bitwise_and.q", "x05",
      "select (3 & 5) AS a, (3 | 5) AS b, (3 ^ 5) AS c, (~3) AS d",
      duck = Some("select (3 & 5) AS a, (3 | 5) AS b, " +
        "xor(3, 5) AS c, (~3) AS d")),

    // ---- collection constructors: key/element types coerce to the
    // common category; out-of-range index answers NULL
    QCase("udf_map.q", "x06",
      "select map(1, 'a', 2, 'b', 3, 'c')[2] AS a, " +
        "map(1, 2, 'a', 'b')['a'] AS b, map(1, array('a'))[1][0] AS c, " +
        "size(map()) AS d",
      duck = Some(""), hive = Some(Seq("b", "b", "a", "0"))),

    QCase("udf_struct.q", "x07",
      "select struct(1, 'b', 1.5).col1 AS a, " +
        "struct(1, struct('a', 1.5)).col2.col1 AS b, " +
        "named_struct('foo', 1, 'bar', 2).foo AS c",
      duck = Some(""), hive = Some(Seq("1", "a", "1"))),

    QCase("udf_array.q", "x08",
      "select array()[1] AS a, array(1, 2, 3)[2] AS b, " +
        "array(1, 'a', 2, 3)[2] AS c, " +
        "array(array(1), array(2), array(3))[1][0] AS d, " +
        "size(array()) AS e",
      duck = Some(""), hive = Some(Seq("NULL", "3", "2", "2", "0")),
      note = "mixed int/string elements coerce to string; [] past the " +
        "end is NULL"),

    QCase("udf_map_values.q", "x09",
      "select cast(map_values(map('a', 1, 'b', 2, 'c', 3)) as string) AS v, " +
        "cast(map_keys(map(1, 'a', 2, 'b')) as string) AS k",
      duck = Some(""), hive = Some(Seq("[1,2,3]", "[1,2]")),
      note = "buildJSONString array rendering: no spaces (r17 " +
        "HiveCastRendering; the earlier pin recorded Spark's spacing)"),

    // ---- numeric casts wrap two's-complement, never error (non-ANSI)
    QCase("udf_to_byte.q", "x10",
      "select cast(true as tinyint) AS a, " +
        "cast(cast(-18 as smallint) as tinyint) AS b, " +
        "cast(-129 as tinyint) AS c, " +
        "cast(cast(-1025 as bigint) as tinyint) AS d, " +
        "cast(cast(-3.14 as double) as tinyint) AS e",
      duck = Some(""), hive = Some(Seq("1", "-18", "127", "-1", "-3"))),

    QCase("udf_to_boolean.q", "x11",
      "select cast(cast(1 as tinyint) as boolean) AS a, " +
        "cast(cast(-4 as int) as boolean) AS b, " +
        "cast(cast(7.0 as float) as boolean) AS c, " +
        "cast(cast(0 as bigint) as boolean) AS d",
      duck = Some(""), hive = Some(Seq("true", "true", "true", "false"))),

    // ---- REGEXP operator (the rlike synonym)
    QCase("udf_regexp.q", "x12",
      "select ('fofo' REGEXP '^fo') AS a, ('Bn' REGEXP '^Ba*n') AS b, " +
        "('afofo' REGEXP 'fo') AS c, ('afofo' REGEXP '^fo') AS d, " +
        "('Baan' REGEXP '^Ba?n') AS e, ('axe' REGEXP 'pi|apa') AS f, " +
        "('pip' REGEXP '^(pi)*$') AS g",
      duck = Some(""),
      hive = Some(Seq("true", "true", "true", "false", "false", "false",
        "false"))),

    // ---- hash/crypto over strings AND binaries; invalid sha2 width NULL
    QCase("udf_crc32.q", "x13",
      "select crc32('ABC') AS a, crc32('') AS b, " +
        "crc32(cast('ABC' as binary)) AS c, crc32(cast(null as string)) AS d",
      duck = Some(""),
      hive = Some(Seq("2743272264", "0", "2743272264", "NULL"))),

    QCase("udf_md5.q", "x14",
      "select md5('ABC') AS a, md5('') AS b, md5(cast('ABC' as binary)) AS c",
      duck = Some(""),
      hive = Some(Seq("902fbdd2b1df0c4f70b4a5d23525e932",
        "d41d8cd98f00b204e9800998ecf8427e",
        "902fbdd2b1df0c4f70b4a5d23525e932"))),

    QCase("udf_sha2.q", "x15",
      "select sha2('ABC', 0) AS a, sha2('ABC', 256) AS b, " +
        "sha2('ABC', 200) AS c, sha2('ABC', cast(null as int)) AS d",
      duck = Some(""),
      hive = Some(Seq(
        "b5d4045c3f466fa91fe2cc6abe79232a1a57cdf104f7a26e716e0a1e2789df78",
        "b5d4045c3f466fa91fe2cc6abe79232a1a57cdf104f7a26e716e0a1e2789df78",
        "NULL", "NULL")),
      note = "bit length 0 means 256; invalid widths answer NULL"),

    QCase("udf_unhex.q", "x16",
      "select cast(unhex('4D7953514C') as string) AS a, " +
        "cast(unhex('61') as string) AS b, " +
        "cast(unhex('2D34') as string) AS c, " +
        "cast(unhex('') as string) AS d, unhex('MySQL') AS e, " +
        "unhex('G123') AS f",
      duck = Some(""),
      hive = Some(Seq("MySQL", "a", "-4", "", "NULL", "NULL")),
      note = "non-hex input is NULL; empty input is the empty binary"),

    // ---- math constants and trig identities
    QCase("udf_E.q", "x17",
      "select E() AS e, degrees(PI()) AS d, radians(180.0) AS r, " +
        "round(sin(PI() / 2), 10) AS s, round(cos(0), 10) AS c, " +
        "round(exp(ln(7.0)), 10) AS x, round(log10(1000.0), 10) AS l10, " +
        "round(log2(8.0), 10) AS l2, round(power(2, 10), 10) AS p, " +
        "round(sqrt(144.0), 10) AS q",
      duck = Some("select exp(1.0) AS e, degrees(PI()) AS d, " +
        "radians(180.0) AS r, round(sin(PI() / 2), 10) AS s, " +
        "round(cos(0), 10) AS c, round(exp(ln(7.0)), 10) AS x, " +
        "round(log10(1000.0), 10) AS l10, round(log2(8.0), 10) AS l2, " +
        "round(power(2, 10), 10) AS p, round(sqrt(144.0), 10) AS q")),

    // ---- exact percentile with scalar and array fractions (linear
    // interpolation), NULL column answers NULL
    QCase("udf_percentile.q", "x18",
      "select cast(key as int) DIV 10 AS g, " +
        "percentile(cast(substr(value, 5) as int), 0.5) AS p50, " +
        "percentile(cast(substr(value, 5) as int), 1.0) AS p100 " +
        "from qt_src group by cast(key as int) DIV 10",
      duck = Some("select cast(key as int) // 10 AS g, " +
        "quantile_cont(cast(substr(value, 5) as int), 0.5) AS p50, " +
        "quantile_cont(cast(substr(value, 5) as int), 1.0) AS p100 " +
        "from qt_src group by cast(key as int) // 10")),

    QCase("udf_percentile.q", "x19",
      "select cast(percentile(cast(substr(value, 5) as int), " +
        "array(0.0, 0.5, 0.99, 1.0)) as string) AS ps from qt_src " +
        "where cast(key as int) < 10",
      duck = Some(""), hive = Some(Seq("[0.0,4.5,8.91,9.0]")),
      note = "udf_percentile.q.out group 0: [0.0,4.5,8.91,9.0]"),

    QCase("udf_isnull_isnotnull.q", "x20",
      "select (NULL IS NULL) AS a, (1 IS NOT NULL) AS b, " +
        "('my string' IS NOT NULL) AS c",
      duck = None))

  test("qtest conformance: udf wave 16b (shift semantics, collection " +
      "constructors, wrap casts, REGEXP, crypto digests, unhex, math " +
      "constants, exact percentile)") {
    run("udf_")
  }
}
