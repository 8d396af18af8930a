package graft

/** Conformance wave 17e: the vector_* join/filter corpus — inner and
  * semi joins with projection reshuffles (vector_inner_join.q),
  * null-safe <=> join chains over the in8 corpus
  * (vector_nullsafe_join.q), NULL-literal projection and union
  * (vector_null_projection.q), the NOT IN self-subquery
  * (vector_groupby_mapjoin.q), and Hive's NON-BOOLEAN WHERE coercion
  * (vector_empty_where.q — the r17 HiveBooleanFilters addition, with
  * the reference .q.out counts as a third leg).
  */
class QtestVectorWave17eSpec extends QtestHarness {

  private val t1a = "(VALUES (1), (1), (2), (3)) t1(a)"
  private val t2a =
    "(VALUES (0), (2), (3), (CAST(NULL AS INT)), (4)) t2(c)"
  private val t1b = """(VALUES ('one', 1), ('one', 1), ('two', 2),
    |  ('three', 3)) t1(v1, a)""".stripMargin
  private val t2b = """(VALUES (0, 'ZERO'), (2, 'TWO'), (3, 'THREE'),
    |  (CAST(NULL AS INT), '<NULL>'), (4, 'FOUR')) t2(c, v2)"""
    .stripMargin

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_inner_join.q", "w17e01",
      s"select t1.a from $t2a join $t1a on t1.a = t2.c " +
        "where t1.a > 2",
      note = "inner join + residual filter; the NULL key never matches"),

    QCase("vector_inner_join.q", "w17e02",
      s"select t2.c from $t2a left semi join $t1a " +
        "on t1.a = t2.c where t2.c > 2",
      duck = Some(s"select t2.c from $t2a where t2.c > 2 and " +
        s"exists (select 1 from $t1a where t1.a = t2.c)"),
      note = "LEFT SEMI JOIN twins as EXISTS"),

    QCase("vector_inner_join.q", "w17e03",
      s"""select t1.v1, t1.a, t2.c, t2.v2
        |from $t2b join $t1b on t1.a = t2.c
        |where t1.a > 2""".stripMargin,
      note = "both sides' columns projected"),

    QCase("vector_inner_join.q", "w17e04",
      s"""select t1.v1, t1.a*2 AS a2, t2.c*5 AS c5, t2.v2
        |from $t2b join $t1b on t1.a = t2.c
        |where t1.a > 2""".stripMargin,
      note = "arithmetic over the join columns"),

    QCase("vector_nullsafe_join.q", "w17e05",
      "select * from qt_null8 a join qt_null8 b on a.key<=>b.value",
      duck = Some("select * from qt_null8 a join qt_null8 b on " +
        "a.key IS NOT DISTINCT FROM b.value"),
      note = "<=> matches the NULL pairs an equi-join drops"),

    QCase("vector_nullsafe_join.q", "w17e06",
      """select * from qt_null8 a join qt_null8 b on a.key<=>b.value
        |join qt_null8 c on a.key=c.key""".stripMargin,
      duck = Some("""select * from qt_null8 a
        |join qt_null8 b on a.key IS NOT DISTINCT FROM b.value
        |join qt_null8 c on a.key=c.key""".stripMargin),
      note = "a null-safe hop feeding an equi hop: the NULL keys " +
        "survive the first join but drop at the second"),

    QCase("vector_nullsafe_join.q", "w17e07",
      """select * from qt_null8 a join qt_null8 b on a.key<=>b.value
        |join qt_null8 c on a.key<=>c.key""".stripMargin,
      duck = Some("""select * from qt_null8 a
        |join qt_null8 b on a.key IS NOT DISTINCT FROM b.value
        |join qt_null8 c on a.key IS NOT DISTINCT FROM c.key"""
        .stripMargin),
      note = "both hops null-safe: the NULL-key cross block survives"),

    QCase("vector_nullsafe_join.q", "w17e08",
      """SELECT * FROM qt_null8 a FULL OUTER JOIN qt_null8 b
        |ON a.key<=>b.value""".stripMargin,
      duck = Some("""SELECT * FROM qt_null8 a FULL OUTER JOIN
        |qt_null8 b ON a.key IS NOT DISTINCT FROM b.value"""
        .stripMargin),
      note = "full-outer over <=>: nothing is unmatched on the NULL " +
        "side pairs, the rest null-extends"),

    QCase("vector_null_projection.q", "w17e09",
      """select NULL AS x from (VALUES ('aaa')) a(s)""".stripMargin,
      note = "bare NULL projection"),

    QCase("vector_null_projection.q", "w17e10",
      """select NULL as x from (VALUES ('aaa')) a(s)
        |union distinct
        |select NULL as x from (VALUES ('bbb')) b(s)""".stripMargin,
      note = "NULLs across UNION DISTINCT collapse to one row"),

    QCase("vector_groupby_mapjoin.q", "w17e11",
      """select * from qt_src
        |where not key in (select key from qt_src)
        |order by key""".stripMargin, ordered = true,
      note = "NOT IN against a self-subquery that contains every key " +
        "— zero rows"),

    QCase("vector_empty_where.q", "w17e12",
      "select count(distinct cint) AS c from qt_alltypesorc " +
        "where cstring1",
      duck = Some("select count(distinct cint) AS c from " +
        "qt_alltypesorc where not lower(cstring1) in " +
        "('false', 'off', 'no', '0', '')"),
      hive = Some(Seq("6041")),
      note = "WHERE <string>: false iff lower(s) is one of Hive's " +
        "FalseValues (the r17 HiveBooleanFilters coercion); " +
        ".q.out pins 6041"),

    QCase("vector_empty_where.q", "w17e13",
      "select count(distinct cint) AS c from qt_alltypesorc where cint",
      duck = Some("select count(distinct cint) AS c from " +
        "qt_alltypesorc where cint != 0"),
      hive = Some(Seq("6082")),
      note = "WHERE <int>: v != 0"),

    QCase("vector_empty_where.q", "w17e14",
      "select count(distinct cint) AS c from qt_alltypesorc " +
        "where cfloat",
      duck = Some("select count(distinct cint) AS c from " +
        "qt_alltypesorc where trunc(cfloat) <> 0"),
      hive = Some(Seq("3022")),
      note = "WHERE <float>: Hive truncates to INT first — " +
        "fractional values below 1 are FALSE (.q.out pins 3022, " +
        "half the non-null rows)"),

    QCase("vector_empty_where.q", "w17e15",
      "select count(distinct cint) AS c from qt_alltypesorc " +
        "where ctimestamp1",
      duck = Some("select count(distinct cint) AS c from " +
        "qt_alltypesorc where CAST(floor(CAST(epoch_us(ctimestamp1) " +
        "AS DOUBLE) / 1000000) AS BIGINT) <> 0"),
      hive = Some(Seq("3022")),
      note = "WHERE <timestamp>: epoch SECONDS != 0"))

  test("qtest conformance wave 17e: vector_* joins and non-boolean " +
      "filters (inner/semi/nullsafe joins, NULL projection, " +
      "getBoolean WHERE coercion)") {
    run("vector_inner_join", "vector_nullsafe_join",
      "vector_null_projection", "vector_groupby_mapjoin",
      "vector_empty_where")
  }
}
