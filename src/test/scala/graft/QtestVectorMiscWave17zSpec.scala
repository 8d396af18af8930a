package graft

/** Conformance wave 17z: the vector_* miscellany (ref ql/src/test/
  * queries/clientpositive/vector_char_simple.q, vector_char_2.q,
  * vector_varchar_4.q, vector_and_or_scalar_col.q,
  * vector_cast_filter.q, vector_const.q, vector_const_struct_equal.q,
  * vector_like_2.q, vector_map_order.q, vector_null_map.q,
  * vector_non_constant_in_expr.q, vector_number_compare_projection.q,
  * vector_order_null.q, vector_struct_in2.q,
  * vector_tablesample_rows.q, vector_topnkey.q, vector_union_null.q,
  * vector_unix_timestamp.q). Headline semantics: non-boolean operands
  * under NOT/AND/OR coerce Hive-style (vector_cast_filter's pinned
  * counts), CHAR values concatenate STRIPPED, NON-constant IN lists,
  * explicit null orders, struct equality/IN constants, and
  * timezone-token timestamp parsing.
  */
class QtestVectorMiscWave17zSpec extends QtestHarness {

  private val T = "qt_alltypesorc"

  private val srcNull = """(VALUES (1, 'A'),
    |  (CAST(NULL AS INT), CAST(NULL AS STRING)),
    |  (3, CAST(NULL AS STRING)), (2, CAST(NULL AS STRING)),
    |  (2, 'A'), (2, 'B')) x(a, b)""".stripMargin
  private val srcNullDuck = srcNull.replace("AS STRING", "AS VARCHAR")

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_char_simple.q", "w17z01",
      """select key, value from
        |  (select cast(key as char(10)) as key,
        |          cast(value as char(20)) as value from qt_src) t
        |order by key asc limit 20""".stripMargin,
      duck = Some("""select key, value from qt_src
        |order by key asc limit 20""".stripMargin),
      ordered = true,
      note = "char(10)/char(20) staging of src (no value needs " +
        "truncation; ties share values)"),

    QCase("vector_char_2.q", "w17z02",
      """select value, sum(cast(key as int)) AS s, count(*) numrows
        |from (select cast(key as char(10)) as key,
        |             cast(value as char(20)) as value from qt_src) t
        |group by value
        |order by value asc limit 5""".stripMargin,
      duck = Some("""select value, sum(cast(key as int)) AS s,
        |  count(*) numrows
        |from qt_src group by value order by value asc limit 5"""
        .stripMargin),
      ordered = true,
      note = "group on the char-typed value column"),

    QCase("vector_varchar_4.q", "w17z03",
      """select cast(s as varchar(10)) AS v, count(*) AS c
        |from qt_over10k group by cast(s as varchar(10))
        |order by v limit 10""".stripMargin,
      duck = Some("""select substr(s, 1, 10) AS v, count(*) AS c
        |from qt_over10k group by substr(s, 1, 10)
        |order by v limit 10""".stripMargin),
      ordered = true,
      note = "varchar(10) TRUNCATION as a group key (the file stages " +
        "vectortab2k into varchar columns)"),

    QCase("vector_and_or_scalar_col.q", "w17z04",
      """select (null or dt1 is not null) AS c1,
        |  (null and dt1 is null) AS c2,
        |  (dt1 is not null or dt2 is null) AS c3
        |from (VALUES
        |  (CAST(NULL AS DATE), CAST(NULL AS DATE)),
        |  (date '1999-12-31', date '2000-01-01'),
        |  (date '2001-01-01', date '2001-06-01'))
        |  vector_and_or(dt1, dt2)""".stripMargin,
      note = "scalar NULL against column predicates under OR/AND " +
        "(three-valued logic: null or true = true, null and false = " +
        "false)"),

    QCase("vector_cast_filter.q", "w17z05",
      s"select count(distinct cint) AS c from $T where !cstring1",
      duck = Some(""), hive = Some(Seq("0")),
      note = "NOT of a STRING column coerces Hive-style: no string " +
        "parses to boolean false with a non-null negation surviving " +
        "the filter (.q.out pins 0)"),

    QCase("vector_cast_filter.q", "w17z06",
      s"select count(distinct cint) AS c from $T " +
        "where cint and cstring1",
      duck = Some(""), hive = Some(Seq("6041")),
      note = "INT AND STRING operands coerce to boolean (.q.out " +
        "pins 6041)"),

    QCase("vector_cast_filter.q", "w17z07",
      s"select count(distinct cint) AS c from $T where cfloat or cint",
      duck = Some(""), hive = Some(Seq("6082")),
      note = "FLOAT OR INT operands coerce to boolean (.q.out pins " +
        "6082)"),

    QCase("vector_const.q", "w17z08",
      "SELECT CONCAT(CAST('F' AS CHAR(2)), CAST('F' AS VARCHAR(2))) " +
        "AS c FROM (VALUES (1)) VARCHAR_CONST_1(x)",
      duck = Some(""), hive = Some(Seq("FF")),
      note = "CHAR constants concatenate STRIPPED, not blank-padded " +
        "(.q.out pins FF)"),

    QCase("vector_const.q", "w17z09",
      "SELECT CONCAT(CAST('F' AS CHAR(200)), CAST('F' AS CHAR(200))) " +
        "AS c FROM (VALUES (1)) VARCHAR_CONST_1(x)",
      duck = Some(""), hive = Some(Seq("FF")),
      note = "even char(200) pads never reach concat"),

    QCase("vector_const_struct_equal.q", "w17z10",
      """select cnt1, cnt2, cnt3 from
        |(select count(*) cnt1 from (select 1 as dummy) t
        |   where (struct(2022) = struct(2022))) a,
        |(select count(*) cnt2 from (select 1 as dummy) t
        |   where (struct('2022') = struct('2023'))) b,
        |(select count(*) cnt3 from (select 1 as dummy) t
        |   where (struct(2022.0D) = struct(2022.0D))) c""".stripMargin,
      duck = Some("select 1 AS cnt1, 0 AS cnt2, 1 AS cnt3"),
      note = "constant struct equality folds per type (int, string, " +
        "double legs; the twin states the truth table)"),

    QCase("vector_like_2.q", "w17z11",
      """select a, a like '%bar' AS l from
        |  (VALUES ('some foo'), ('some bar'),
        |   (CAST(NULL AS STRING))) foo(a)
        |order by a""".stripMargin,
      duck = Some("""select a, a like '%bar' AS l from
        |  (VALUES ('some foo'), ('some bar'),
        |   (CAST(NULL AS VARCHAR))) foo(a)
        |order by a""".stripMargin),
      ordered = true,
      note = "suffix LIKE with a NULL row (HIVE-17804's vectorized " +
        "first-row-match bug shape); Hive orders the NULL row last"),

    QCase("vector_map_order.q", "w17z12",
      "select cast(map('a', 1, 'b', 2, 'c', 3) as string) AS m " +
        "from (VALUES (1)) t(x)",
      duck = Some(""),
      hive = Some(Seq("""{"a":1,"b":2,"c":3}""")),
      note = "map literal keeps INSERTION order through the " +
        "buildJSONString rendering"),

    QCase("vector_null_map.q", "w17z13",
      "select cast(map('x', 'y') as string) AS a, " +
        "cast(CAST(NULL AS MAP<STRING,STRING>) as string) AS b",
      duck = Some(""),
      hive = Some(Seq("""{"x":"y"}""", "NULL")),
      note = "NULL maps render NULL, populated ones as JSON"),

    QCase("vector_non_constant_in_expr.q", "w17z14",
      s"""SELECT count(*) AS c FROM $T
         |WHERE cint in (ctinyint, cbigint)""".stripMargin,
      duck = Some(s"""SELECT count(*) AS c FROM $T
         |WHERE cint in (ctinyint, cbigint)""".stripMargin),
      note = "NON-constant IN list — membership against other " +
        "columns of the same row"),

    QCase("vector_number_compare_projection.q", "w17z15",
      s"""select count(*) AS c1,
         |  sum(case when ctinyint < csmallint then 1 else 0 end) AS c2,
         |  sum(case when cint <= cbigint then 1 else 0 end) AS c3,
         |  sum(case when cfloat > cdouble then 1 else 0 end) AS c4
         |from $T""".stripMargin,
      note = "cross-width numeric comparisons PROJECTED (not " +
        "filtered) then counted"),

    QCase("vector_order_null.q", "w17z16",
      s"SELECT x.a, x.b FROM $srcNull ORDER BY a asc, b asc",
      duck = Some(s"SELECT x.a, x.b FROM $srcNullDuck " +
        "ORDER BY a asc NULLS LAST, b asc NULLS LAST"),
      ordered = true,
      note = "bare ASC sorts NULL LAST in Hive (both keys)"),

    QCase("vector_order_null.q", "w17z17",
      s"SELECT x.a, x.b FROM $srcNull ORDER BY a desc, b asc",
      duck = Some(s"SELECT x.a, x.b FROM $srcNullDuck " +
        "ORDER BY a desc NULLS FIRST, b asc NULLS LAST"),
      ordered = true,
      note = "bare DESC flips to NULLS FIRST"),

    QCase("vector_order_null.q", "w17z18",
      s"SELECT x.a, x.b FROM $srcNull ORDER BY b asc, " +
        "a asc nulls last",
      duck = Some(s"SELECT x.a, x.b FROM $srcNullDuck " +
        "ORDER BY b asc NULLS LAST, a asc nulls last"),
      ordered = true,
      note = "explicit NULLS LAST beside the defaulted key"),

    QCase("vector_struct_in2.q", "w17z19",
      """select y, m from (VALUES (2022, 9), (2022, 8), (2021, 9))
        |  test(y, m)
        |where (struct(cast(y as int), m)
        |       IN (struct(2022, 9), struct(2021, 9)))""".stripMargin,
      duck = Some("""select y, m from (VALUES (2022, 9), (2022, 8),
        |  (2021, 9)) test(y, m)
        |where (y = 2022 and m = 9) or (y = 2021 and m = 9)"""
        .stripMargin),
      note = "struct IN over composite keys (the twin spells the " +
        "disjunction)"),

    QCase("vector_tablesample_rows.q", "w17z20",
      s"select 'key1' AS k, 'value1' AS v from $T tablesample (1 rows)",
      duck = Some("select 'key1' AS k, 'value1' AS v"),
      note = "TABLESAMPLE (n ROWS) caps the scan at exactly n"),

    QCase("vector_tablesample_rows.q", "w17z21",
      "select count(1) AS c from (select * from (Select 1 a) x " +
        "order by x.a) y",
      note = "the file's ORDER-BY-over-constant single-row count"),

    QCase("vector_topnkey.q", "w17z22",
      """select si, max(i) AS mx from qt_over10k group by si
        |order by si limit 5""".stripMargin,
      ordered = true,
      note = "TopNKey pushdown shape: grouped aggregate under " +
        "ORDER+LIMIT"),

    QCase("vector_union_null.q", "w17z23",
      """SELECT MIN(table_name) as table_name, c1, c2, c3 from (
        |select 'a' as table_name, null as c1, null as c2, null as c3
        |  from (VALUES (1)) null_tab(x)
        |union all
        |select 'b' as table_name, null as c1, null as c2, null as c3
        |  from (VALUES (1)) dummy_tab(x)
        |) t_union
        |group by c1, c2, c3""".stripMargin,
      note = "grouping three all-NULL columns collapses both legs to " +
        "ONE group (NULLs equal for grouping)"),

    QCase("vector_unix_timestamp.q", "w17z24",
      """select '>' || d || '<' AS wrapped,
        |  unix_timestamp(d, 'yyyy-MM-dd HH:mm:ss z') AS ut,
        |  from_unixtime(unix_timestamp(d,
        |    'yyyy-MM-dd HH:mm:ss z')) AS fu,
        |  to_date(from_unixtime(unix_timestamp(d,
        |    'yyyy-MM-dd HH:mm:ss z'))) AS td
        |from (VALUES ('2020-03-01 10:00:00 UTC')) t(d)""".stripMargin,
      duck = Some(""),
      hive = Some(Seq(">2020-03-01 10:00:00 UTC<", "1583056800",
        "2020-03-01 10:00:00", "2020-03-01")),
      note = "the 'z' timezone TOKEN in the parse pattern (UTC " +
        "session renders the round-trip verbatim)")
  )

  test("qtest conformance wave 17z: vector_* miscellany — char/" +
      "varchar staging, boolean coercion under NOT/AND/OR, struct " +
      "constants, null orders, non-constant IN, row samples, " +
      "timezone parse tokens") {
    run("vector_")
  }
}
