package graft

/** Conformance wave 17ai: the udf_* tail (ref ql/src/test/queries/
  * clientpositive/udf_*.q — constants, the array_* battery, aggregate
  * aliases, trim/position/string families, aes, rlike, nullif, and
  * the session-user functions).
  */
class QtestUdfWave17aiSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("udf_E.q", "w17ai01",
      "select E() AS e, E() + 1 AS e1",
      duck = Some("select exp(1) AS e, exp(1) + 1 AS e1"),
      note = "Euler's constant as a niladic function"),
    QCase("udf_PI.q", "w17ai02",
      "select PI() AS p, cos(PI()) AS c",
      duck = Some("select pi() AS p, cos(pi()) AS c"),
      note = "pi() and a trig identity"),
    QCase("udf_aes_encrypt.q", "w17ai03",
      "select cast(aes_decrypt(aes_encrypt('ABC', '1234567890123456')," +
        " '1234567890123456') as string) AS s",
      duck = Some(""), hive = Some(Seq("ABC")),
      note = "aes ECB round trip with a 128-bit key"),
    QCase("udf_aes_decrypt.q", "w17ai04",
      "select cast(aes_decrypt(unbase64('y6Ss+zCYObpCbgfWfyNWTw==')," +
        " '1234567890123456') as string) AS s",
      duck = Some(""), hive = Some(Seq("ABC")),
      note = "the documented reference vector decrypts to ABC"),
    QCase("udf_array_append.q", "w17ai05",
      "select cast(array_append(array(1, 2), 3) as string) AS a",
      duck = Some(""), hive = Some(Seq("[1,2,3]"))),
    QCase("udf_array_compact.q", "w17ai06",
      "select cast(array_compact(array(1, null, 2, null)) as string) " +
        "AS a",
      duck = Some(""), hive = Some(Seq("[1,2]")),
      note = "compact drops NULL elements"),
    QCase("udf_array_distinct.q", "w17ai07",
      "select cast(sort_array(array_distinct(array(1, 2, 2, 3, 1))) " +
        "as string) AS a",
      duck = Some(""), hive = Some(Seq("[1,2,3]"))),
    QCase("udf_array_except.q", "w17ai08",
      "select cast(sort_array(array_except(array(1, 2, 3), " +
        "array(2))) as string) AS a",
      duck = Some(""), hive = Some(Seq("[1,3]"))),
    QCase("udf_array_intersect.q", "w17ai09",
      "select cast(sort_array(array_intersect(array(1, 2, 3), " +
        "array(2, 3, 4))) as string) AS a",
      duck = Some(""), hive = Some(Seq("[2,3]"))),
    QCase("udf_array_union.q", "w17ai10",
      "select cast(sort_array(array_union(array(1, 2), " +
        "array(2, 3))) as string) AS a",
      duck = Some(""), hive = Some(Seq("[1,2,3]"))),
    QCase("udf_array_join.q", "w17ai11",
      "select array_join(array('a', null, 'b'), ',') AS j1, " +
        "array_join(array('a', null, 'b'), ',', 'NULL') AS j2",
      duck = Some(""), hive = Some(Seq("a,b", "a,NULL,b")),
      note = "null elements skipped, or spelled via the replacement"),
    QCase("udf_array_max.q", "w17ai12",
      "select array_max(array(1, 5, 3)) AS m, " +
        "array_max(array(cast(null as int), 2)) AS m2",
      duck = Some(""), hive = Some(Seq("5", "2")),
      note = "max skips NULL elements"),
    QCase("udf_array_min.q", "w17ai13",
      "select array_min(array(4, 1, 3)) AS m",
      duck = Some(""), hive = Some(Seq("1"))),
    QCase("udf_array_position.q", "w17ai14",
      "select array_position(array('a', 'b', 'c'), 'b') AS p, " +
        "array_position(array('a'), 'z') AS p0",
      duck = Some(""), hive = Some(Seq("2", "0")),
      note = "1-based position, 0 when absent"),
    QCase("udf_array_remove.q", "w17ai15",
      "select cast(array_remove(array(1, 2, 1, 3), 1) as string) AS a",
      duck = Some(""), hive = Some(Seq("[2,3]"))),
    QCase("udf_array_slice.q", "w17ai16",
      "select cast(array_slice(array(10, 20, 30, 40), 1, 2) " +
        "as string) AS a",
      duck = Some(""), hive = Some(Seq("[20,30]")),
      note = "Hive's array_slice is 0-BASED (start 1 = second " +
        "element; the r15 finding)"),
    QCase("udf_avg.q", "w17ai17",
      "select avg(cast(substr(value, 5) as int)) AS a from qt_src " +
        "where cast(key as int) < 10",
      note = "avg alias battery (DESCRIBE surface elsewhere)"),
    QCase("udf_max.q", "w17ai18",
      "select max(value) AS m from qt_src",
      note = "max over strings is lexicographic"),
    QCase("udf_min.q", "w17ai19",
      "select min(value) AS m from qt_src",
      note = "min over strings"),
    QCase("udf_std.q", "w17ai20",
      "select round(std(cast(key as int)), 4) AS s from qt_src",
      duck = Some("select round(stddev_pop(cast(key as int)), 4) " +
        "AS s from qt_src"),
      note = "std = POPULATION stddev in Hive"),
    QCase("udf_stddev.q", "w17ai21",
      "select round(stddev(cast(key as int)), 4) AS s from qt_src",
      duck = Some("select round(stddev_pop(cast(key as int)), 4) " +
        "AS s from qt_src"),
      note = "stddev = population too"),
    QCase("udf_stddev_pop.q", "w17ai22",
      "select round(stddev_pop(cast(key as int)), 4) AS s from qt_src",
      note = "the explicit population spelling"),
    QCase("udf_stddev_samp.q", "w17ai23",
      "select round(stddev_samp(cast(key as int)), 4) AS s " +
        "from qt_src",
      note = "the sample spelling divides by n-1"),
    QCase("udf_nullif.q", "w17ai24",
      "select nullif(1, 1) AS a, nullif(1, 2) AS b, " +
        "nullif('x', 'x') AS c, nullif(null, 3) AS d",
      duck = Some("select nullif(1, 1) AS a, nullif(1, 2) AS b, " +
        "nullif('x', 'x') AS c, nullif(NULL, 3) AS d")),
    QCase("udf_or.q", "w17ai25",
      "select (true or false) AS a, (false or false) AS b, " +
        "(null or true) AS c, (null or false) AS d",
      note = "three-valued OR table"),
    QCase("udf_in.q", "w17ai26",
      "select (1 in (1, 2)) AS a, (4 in (1, 2)) AS b, " +
        "(null in (1, 2)) AS c, (1 in (1, null)) AS d, " +
        "(4 in (1, null)) AS e",
      duck = Some("select (1 in (1, 2)) AS a, (4 in (1, 2)) AS b, " +
        "(NULL in (1, 2)) AS c, (1 in (1, NULL)) AS d, " +
        "(4 in (1, NULL)) AS e"),
      note = "IN's NULL algebra: unknown when the probe or an " +
        "unmatched list element is NULL"),
    QCase("udf_position.q", "w17ai27",
      "select position('b' in 'abc') AS p, position('z' in 'abc') " +
        "AS p0",
      duck = Some("select position('b' in 'abc') AS p, " +
        "position('z' in 'abc') AS p0"),
      note = "ANSI position spelling of locate"),
    QCase("udf_quarter.q", "w17ai28",
      "select quarter(date '2015-04-24') AS q2, " +
        "quarter('2015-12-31') AS q4, quarter('2015-01-01 12:00:00') " +
        "AS q1",
      duck = Some(""), hive = Some(Seq("2", "4", "1")),
      note = "quarter over date, date-string and timestamp-string"),
    QCase("udf_rlike.q", "w17ai29",
      "select ('fofo' rlike '^fo') AS a, ('fofo' rlike '^fofo$') " +
        "AS b, ('fobar' rlike 'far') AS c",
      duck = Some("select regexp_matches('fofo', '^fo') AS a, " +
        "regexp_matches('fofo', '^fofo$') AS b, " +
        "regexp_matches('fobar', 'far') AS c"),
      note = "rlike is an UNANCHORED java-regex search"),
    QCase("udf_ltrim.q", "w17ai30",
      "select ltrim('   abc   ') AS t, length(ltrim('   abc   ')) " +
        "AS l",
      duck = Some(""), hive = Some(Seq("abc   ", "6"))),
    QCase("udf_rtrim.q", "w17ai31",
      "select rtrim('   abc   ') AS t, length(rtrim('   abc   ')) " +
        "AS l",
      duck = Some(""), hive = Some(Seq("   abc", "6"))),
    QCase("udf_ltrim_vector.q", "w17ai32",
      "select ltrim(concat('  ', value)) AS t from qt_src " +
        "where key = '0'",
      duck = Some("select ltrim(concat('  ', value)) AS t " +
        "from qt_src where key = '0'"),
      note = "columnar ltrim over concatenated padding"),
    QCase("udf_rtrim_vector.q", "w17ai33",
      "select rtrim(concat(value, '  ')) AS t from qt_src " +
        "where key = '0'",
      duck = Some("select rtrim(concat(value, '  ')) AS t " +
        "from qt_src where key = '0'"),
      note = "columnar rtrim"),
    QCase("udf_substring.q", "w17ai34",
      "select substring('Facebook', 5) AS a, " +
        "substring('Facebook', -5) AS b, " +
        "substring('Facebook', 5, 1) AS c",
      duck = Some(""), hive = Some(Seq("book", "ebook", "b")),
      note = "negative start counts from the tail"),
    QCase("udf_sha1.q", "w17ai35",
      "select sha1('ABC') AS a, sha('') AS b",
      duck = Some(""),
      hive = Some(Seq("3c01bdbb26f358bab27f267924aa2c9a03fcfdb8",
        "da39a3ee5e6b4b0d3255bfef95601890afd80709")),
      note = "sha == sha1; the empty-string digest"),
    QCase("udf_datediff.q", "w17ai36",
      "select datediff('2009-07-30', '2009-07-28') AS a, " +
        "datediff('2009-07-28', '2009-07-30') AS b",
      duck = Some(""), hive = Some(Seq("2", "-2"))),
    QCase("udf_date_format_simple.q", "w17ai37",
      "select date_format(date '2015-04-08', 'yyyy-MM-dd') AS a, " +
        "date_format('2015-04-08 10:30:45', 'HH:mm') AS b",
      duck = Some(""), hive = Some(Seq("2015-04-08", "10:30"))),
    QCase("udf_dayofweek_with_tz.q", "w17ai38",
      "select dayofweek(date '2024-01-07') AS sun, " +
        "dayofweek(date '2024-01-08') AS mon",
      duck = Some(""), hive = Some(Seq("1", "2")),
      note = "1 = Sunday regardless of session zone"),
    QCase("udf_current_user.q", "w17ai39",
      "select (current_user() is not null) AS hasuser",
      duck = Some("select true AS hasuser"),
      note = "current_user answers the session principal"),
    QCase("udf_logged_in_user.q", "w17ai40",
      "select (logged_in_user() = current_user()) AS same",
      duck = Some("select true AS same"),
      note = "logged_in_user == current_user in a non-proxied " +
        "session (the r17 alias)"),
    QCase("udf_rand.q", "w17ai41",
      "select count(*) AS c from (select rand(5) as r from qt_src) t " +
        "where r >= 0 and r < 1",
      duck = Some("select count(*) AS c from qt_src"),
      note = "seeded rand stays in [0,1) for every row (the value " +
        "stream is engine-specific; the range is the contract)"),
    QCase("udf_compare_java_string.q", "w17ai42",
      "select ('a' = 'a') AS eq, ('a' < 'b') AS lt, " +
        "('b' > 'a') AS gt, ('a' <=> cast(null as string)) AS nsafe",
      duck = Some("select ('a' = 'a') AS eq, ('a' < 'b') AS lt, " +
        "('b' > 'a') AS gt, false AS nsafe"),
      note = "string comparison battery incl. null-safe equality"),
    QCase("udf_concat_insert1.q", "w17ai43",
      "select concat('1234', key) AS k, value AS v from qt_src " +
        "where key = '0' limit 1",
      duck = Some("select concat('1234', key) AS k, value AS v " +
        "from qt_src where key = '0' limit 1"),
      note = "concat feeding an insert target (distilled to the " +
        "projection)"),
    QCase("udf_concat_insert2.q", "w17ai44",
      "select concat('1234', 'abc', 'extra', key) AS k from qt_src " +
        "where key = '0' limit 1",
      duck = Some("select concat('1234', 'abc', 'extra', key) AS k " +
        "from qt_src where key = '0' limit 1"),
      note = "multi-argument concat"),
    QCase("udf_case_column_pruning.q", "w17ai45",
      """select case a.key when '1' then 2 when '3' then 4 else 5 end
        |  AS c from qt_src a join qt_src b on a.key = b.key
        |where a.key = '0' limit 1""".stripMargin,
      note = "CASE above a join prunes the unused columns (results " +
        "gate)"),
    QCase("udf_round_2_auto_stats.q", "w17ai46",
      "select round(3.256, 2) AS a, round(3.256, 0) AS b, " +
        "round(-3.256, 2) AS c",
      duck = Some(""), hive = Some(Seq("3.26", "3", "-3.26")),
      note = "HALF_UP rounding away from zero both signs")
  )

  test("qtest conformance wave 17ai: the udf tail — constants, the " +
      "array battery, aggregate aliases, trims, aes, rlike, IN/OR " +
      "null algebra, session users") {
    run("udf_")
  }
}
