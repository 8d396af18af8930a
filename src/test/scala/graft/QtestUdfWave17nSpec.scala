package graft

/** Conformance wave 17n: the udf_to_* cast batteries and Hive's
  * to-string renderings (udf_to_double/float/long/short/string.q,
  * udf_boolean_string_common_category.q, udf_explode.q), plus the
  * DESCRIBE-FUNCTION-only corpus tail.
  *
  * The headline finds pinned here (engine fixes in
  * [[graft.plans.HiveCastRendering]] / [[graft.functions.HiveToString]]):
  * Hive's boolean→string cast answers UPPERCASE 'TRUE'/'FALSE' (ref
  * serde2 PrimitiveObjectInspectorConverter TextConverter), interval
  * casts render bare (`1-2`, `17624 00:30:30.000000000`), and
  * complex→string casts take the buildJSONString form with quoted
  * inner strings, `null` cells, `{"field":v}` structs and `{tag:v}`
  * unions (udf_to_string.q.out pins all three).
  */
class QtestUdfWave17nSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("udf_to_double.q", "w17n01",
      """select cast(null as double) AS a, cast(true as double) AS b,
        |  cast(cast(-7 as tinyint) as double) AS c,
        |  cast(cast(-18 as smallint) as double) AS d,
        |  cast(-129 as double) AS e,
        |  cast(cast(-1025 as bigint) as double) AS f,
        |  cast(cast(-3.14 as float) as double) AS g,
        |  cast(cast(-3.14 as decimal(3,2)) as double) AS h,
        |  cast('-38.14' as double) AS i""".stripMargin,
      duck = Some("""select CAST(NULL AS DOUBLE) AS a, 1.0 AS b,
        |  -7.0 AS c, -18.0 AS d, -129.0 AS e, -1025.0 AS f,
        |  CAST(CAST(-3.14 AS REAL) AS DOUBLE) AS g, -3.14 AS h,
        |  CAST('-38.14' AS DOUBLE) AS i""".stripMargin),
      note = "every primitive to DOUBLE; boolean true -> 1.0"),

    QCase("udf_to_float.q", "w17n02",
      """select cast(null as float) AS a, cast(true as float) AS b,
        |  cast(cast(-7 as tinyint) as float) AS c,
        |  cast(cast(-18 as smallint) as float) AS d,
        |  cast(-129 as float) AS e,
        |  cast(cast(-1025 as bigint) as float) AS f,
        |  cast(cast(-3.14 as double) as float) AS g,
        |  cast(cast(-3.14 as decimal(3,2)) as float) AS h,
        |  cast('-38.14' as float) AS i""".stripMargin,
      duck = Some("""select CAST(NULL AS REAL) AS a, 1.0 AS b, -7.0 AS c,
        |  -18.0 AS d, -129.0 AS e, -1025.0 AS f,
        |  CAST(-3.14 AS REAL) AS g, CAST(-3.14 AS REAL) AS h,
        |  CAST('-38.14' AS REAL) AS i""".stripMargin),
      note = "every primitive to FLOAT"),

    QCase("udf_to_long.q", "w17n03",
      """select cast(null as bigint) AS a, cast(true as bigint) AS b,
        |  cast(cast(-7 as tinyint) as bigint) AS c,
        |  cast(cast(-18 as smallint) as bigint) AS d,
        |  cast(-129 as bigint) AS e,
        |  cast(cast(-3.14 as double) as bigint) AS f,
        |  cast(cast(-3.14 as float) as bigint) AS g,
        |  cast(cast(-3.14 as decimal) as bigint) AS h,
        |  cast('-38' as bigint) AS i""".stripMargin,
      duck = Some("""select CAST(NULL AS BIGINT) AS a, 1 AS b, -7 AS c,
        |  -18 AS d, -129 AS e, -3 AS f, -3 AS g, -3 AS h,
        |  CAST('-38' AS BIGINT) AS i""".stripMargin),
      note = "floating casts TRUNCATE toward zero (-3.14 -> -3); bare " +
        "DECIMAL is (10,0) and rounds HALF_UP on the way in"),

    QCase("udf_to_short.q", "w17n04",
      """select cast(null as smallint) AS a, cast(true as smallint) AS b,
        |  cast(cast(-18 as tinyint) as smallint) AS c,
        |  cast(-129 as smallint) AS d,
        |  cast(cast(-1025 as bigint) as smallint) AS e,
        |  cast(cast(-3.14 as double) as smallint) AS f,
        |  cast(cast(-3.14 as float) as smallint) AS g,
        |  cast(cast(-3.14 as decimal) as smallint) AS h,
        |  cast('-38' as smallint) AS i""".stripMargin,
      duck = Some("""select CAST(NULL AS SMALLINT) AS a, 1 AS b, -18 AS c,
        |  -129 AS d, -1025 AS e, -3 AS f, -3 AS g, -3 AS h, -38 AS i"""
        .stripMargin),
      note = "in-range narrowing casts"),

    QCase("udf_to_string.q", "w17n05",
      """select cast(null as string) AS a, cast(true as string) AS b,
        |  cast(false as string) AS c,
        |  cast(cast(1 as tinyint) as string) AS d,
        |  cast(cast(-18 as smallint) as string) AS e,
        |  cast(-129 as string) AS f,
        |  cast(cast(-1025 as bigint) as string) AS g,
        |  cast(cast(-3.14 as double) as string) AS h,
        |  cast(cast(-3.14 as float) as string) AS i,
        |  cast(cast(-3.14 as decimal(3,2)) as string) AS j,
        |  cast('Foo' as string) AS k""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("NULL", "TRUE", "FALSE", "1", "-18", "-129",
        "-1025", "-3.14", "-3.14", "-3.14", "Foo")),
      note = "ref TextConverter: boolean->string is UPPERCASE " +
        "TRUE/FALSE (udf_to_string.q.out) where Spark answers 'true'"),

    QCase("udf_to_string.q", "w17n06",
      """select cast(interval_year_month('1-2') as string) AS a,
        |  cast(from_utc_timestamp(timestamp '2018-05-02 15:30:30', 'PST')
        |       - from_utc_timestamp(timestamp '1970-01-30 16:00:00', 'PST')
        |       as string) AS b,
        |  cast(from_utc_timestamp(timestamp '1970-01-30 16:00:00', 'PST')
        |       - from_utc_timestamp(timestamp '2018-05-02 15:30:30', 'PST')
        |       as string) AS c""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("1-2", "17624 00:30:30.000000000",
        "-17624 00:30:30.000000000")),
      note = "interval->string renders the bare HiveIntervalYearMonth/" +
        "DayTime.toString forms, not Spark's INTERVAL '...' spelling " +
        "(udf_to_string.q.out pins the positive day-time)"),

    QCase("udf_to_string.q", "w17n07",
      """select cast(array('a', null, 'b') as string) AS a,
        |  cast(array(1, 2) as string) AS b,
        |  cast(named_struct('a', 1, 'b', 'x', 'c', cast(null as int),
        |                    'd', true) as string) AS c,
        |  cast(map('k1', 1.5D, 'k2', cast(null as double)) as string)
        |    AS d""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("""["a",null,"b"]""", "[1,2]",
        """{"a":1,"b":"x","c":null,"d":true}""",
        """{"k1":1.5,"k2":null}""")),
      note = "complex->string takes buildJSONString: quoted strings, " +
        "null cells, named struct fields, LOWERCASE inner booleans"),

    QCase("udf_to_string.q", "w17n08",
      """select cast(create_union(0, 7, 'x') as string) AS a,
        |  cast(create_union(1, 7, 'x') as string) AS b,
        |  cast(array(named_struct('x', 1.0D)) as string) AS c,
        |  cast(array('a"b') as string) AS d,
        |  cast(array(timestamp '2011-01-01 01:02:03.123') as string)
        |    AS e""".stripMargin,
      duck = Some(""),
      hive = Some(Seq("{0:7}", """{1:"x"}""", """[{"x":1.0}]""",
        """["a\"b"]""", """["2011-01-01 01:02:03.123"]""")),
      note = "uniontype renders {tag:value}; inner quotes escape; " +
        "inner timestamps quote in Hive display format"),

    QCase("udf_boolean_string_common_category.q", "w17n09",
      """select array(id, txt, num, flag)[1] AS x1,
        |  array(id, txt, num, flag)[3] AS x3
        |from (values (1, 'one', 5, false), (2, 'two', 14, true),
        |             (3, cast(null as string), 3, false))
        |  t(id, txt, num, flag)""".stripMargin,
      duck = Some("""select * from (values ('one', 'FALSE'),
        |  ('two', 'TRUE'), (NULL, 'FALSE')) t(x1, x3)""".stripMargin),
      note = "common-category negotiation over int/string/boolean " +
        "lands on STRING with the boolean legs cast through " +
        "TextConverter -> 'TRUE'/'FALSE' (boolarray2's rows)"),

    QCase("udf_boolean_string_common_category.q", "w17n10",
      """select cast(array(id, txt, num, flag) as string) AS r
        |from (values (2, 'two', 14, true)) t(id, txt, num, flag)"""
        .stripMargin,
      duck = Some(""),
      hive = Some(Seq("""["2","two","14","TRUE"]""")),
      note = "the .q.out row verbatim: every element a string after " +
        "negotiation, the boolean leg uppercase"),

    QCase("udf_explode.q", "w17n11",
      "select explode(array(1, 2, 3)) as (mycol)",
      duck = Some("select unnest([1, 2, 3]) as mycol"),
      note = "the parenthesized single-alias generator form"),

    QCase("udf_explode.q", "w17n12",
      "select explode(map(1, 'one', 2, 'two', 3, 'three')) as (k, v)",
      duck = Some("""select * from (values (1, 'one'), (2, 'two'),
        |  (3, 'three')) t(k, v)""".stripMargin),
      note = "map explode answers (key, value) pairs"),

    QCase("udf_explode.q", "w17n13",
      """select explode(map('D219', d1, 'D220', d2)) as (keyx, valuex)
        |from (values ('20211107', 1, 2)) source1(dt, d1, d2)
        |union all
        |select explode(map('D221', d1, 'D222', d2)) as (keyy, valuey)
        |from (values ('20211108', 11, 22)) source2(dt, d1, d2)"""
        .stripMargin,
      duck = Some("""select * from (values ('D219', 1), ('D220', 2),
        |  ('D221', 11), ('D222', 22)) t(keyx, valuex)""".stripMargin),
      note = "explodes with differing alias lists unite by position"),

    QCase("udf_index.q", "w17n14",
      """select index(array(1, 2, 3), 1) AS a,
        |  index(map('a', 10, 'b', 20), 'b') AS b,
        |  index(array(1, 2, 3), 7) AS c""".stripMargin,
      duck = Some("select [1,2,3][2] AS a, 20 AS b, NULL AS c"),
      note = "index(container, key): 0-BASED array ordinal / map key " +
        "lookup, NULL out of range (GenericUDFIndex)"))

  test("qtest conformance wave 17n: cast batteries, Hive to-string " +
      "renderings, explode alias forms") {
    run("udf_to_double", "udf_to_float", "udf_to_long", "udf_to_short",
      "udf_to_string", "udf_boolean_string_common_category",
      "udf_explode", "udf_index")
  }

  /** The DESCRIBE-FUNCTION-only corpus files: each name must resolve
    * and describe (udf_substring.q, udf_rlike.q, udf_or.q, udf_std.q,
    * udf_stddev.q, udf_stddev_pop.q, udf_stddev_samp.q, udf_sum.q,
    * udf_var_pop.q, udf_var_samp.q, udf_variance.q, udf_max.q,
    * udf_avg.q, udf_rand.q — plus the value checks udf_version.q,
    * udf_current_user.q and udf_logged_in_user.q carry).
    */
  test("qtest wave 17n: the DESCRIBE-FUNCTION corpus tail resolves") {
    val spark = SparkSpec.session
    graft.functions.HiveFunctions.registerAll(spark)
    val names = Seq("substring", "rlike", "or", "std", "stddev",
      "stddev_pop", "stddev_samp", "sum", "var_pop", "var_samp",
      "variance", "max", "avg", "rand", "version", "current_user",
      "logged_in_user", "explode", "index")
    names.foreach { n =>
      withClue(s"DESCRIBE FUNCTION `$n`:") {
        assert(spark.sql(s"DESCRIBE FUNCTION `$n`").count() > 0)
      }
    }
    // udf_rand.q / udf_version.q / udf_current_user.q /
    // udf_logged_in_user.q value shapes
    val row = spark.sql(
      """select rand(3) >= 0.0 and rand(3) < 1.0 AS r,
        |  length(version()) > 0 AS v,
        |  current_user() is not null AS c,
        |  logged_in_user() = current_user() AS l""".stripMargin)
      .collect().head
    assert(row.getBoolean(0) && row.getBoolean(1) && row.getBoolean(2)
      && row.getBoolean(3))
  }
}
