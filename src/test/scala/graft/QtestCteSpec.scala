package graft

/** Conformance wave: the reference's `cte_*.q` family — ref ql/src/test/
  * queries/clientpositive/cte_{1,2,6,7,8}.q (values pinned by the
  * .q.out transcripts under results/clientpositive/llap).
  *
  * The cte_8 members pin Hive's PARTIAL column-alias list semantics
  * (`WITH cte1(a) AS (<2-col select>)` keeps the unaliased columns'
  * own names, colliding names degrade to `_col<i>`) — the wave's
  * finding, fixed front-door by [[graft.plans.CtePartialAliases]].
  * Small fixture tables (t1, t_n1) inline as VALUES derived tables so
  * both engines read identical rows.
  */
class QtestCteSpec extends QtestHarness {

  private val t1 =
    "(values (1, CAST(2 AS BIGINT)), (3, CAST(4 AS BIGINT))) AS t1(int_col, bigint_col)"
  private val tn1 =
    "(values (1, 'hello', 'world'), (2, 'bye', CAST(NULL AS STRING))) AS t_n1(i, a, b)"
  private val tn1Duck =
    "(values (1, 'hello', 'world'), (2, 'bye', NULL)) AS t_n1(i, a, b)"

  protected val qcases: Seq[QCase] = Seq(
    QCase("cte_1.q", "cte1a",
      "with q1 as ( select key from qt_src where key = '5') select * from q1"),
    QCase("cte_1.q", "cte1b",
      "with q1 as ( select key from qt_src where key = '5') " +
        "select * from (select key from q1) a"),
    QCase("cte_1.q", "cte1c",
      "with q1 as ( select key from q2 where key = '5'), " +
        "q2 as ( select key from qt_src where key = '5') " +
        "select * from (select key from q1) a",
      // Hive resolves WITH names non-positionally; the twin spells the
      // dependency order DuckDB's positional resolver needs
      duck = Some("with q2 as ( select key from qt_src where key = '5'), " +
        "q1 as ( select key from q2 where key = '5') " +
        "select * from (select key from q1) a"),
      note = "forward reference between definitions"),

    QCase("cte_2.q", "cte2a",
      "with q1 as (select * from qt_src where key= '5'), " +
        "q2 as (select * from qt_src s2_n0 where key = '4') " +
        "select * from q1 union all select * from q2"),

    QCase("cte_6.q", "cte6a",
      "with Q1 as ( select key from qt_sRc where key = '5') " +
        "select CPS.key from Q1 CPS",
      duck = Some("with Q1 as ( select key from qt_src where key = '5') " +
        "select CPS.key from Q1 CPS"),
      note = "definition and reference names match case-insensitively"),

    QCase("cte_7.q", "cte7a",
      s"with cte as (select t_n1.a as a,t_n1.a as b,t_n1.a as c " +
        s"from $tn1 where t_n1.b is null) select * from cte",
      duck = Some(s"with cte as (select t_n1.a as a,t_n1.a as b,t_n1.a as c " +
        s"from $tn1Duck where t_n1.b is null) select * from cte"),
      note = "one source column aliased three ways inside the definition"),

    QCase("cte_8.q", "cte8a",
      s"with cte1(a, b) as (select int_col x, bigint_col y from $t1) " +
        "select a, b from cte1"),
    QCase("cte_8.q", "cte8b",
      s"with cte1(a) as (select int_col x, bigint_col y from $t1) " +
        "select a, y from cte1",
      duck = Some(s"with cte1 as (select int_col a, bigint_col y from $t1) " +
        "select a, y from cte1"),
      note = "PARTIAL alias list: unaliased columns keep their own names " +
        "(Hive cte_8.q.out; Spark alone refuses the arity mismatch)"),
    QCase("cte_8.q", "cte8c",
      s"with cte(c1, c2) as (select int_col, bigint_col y from $t1) " +
        "select * from cte limit 1",
      ordered = true),
    QCase("cte_8.q", "cte8d",
      s"with cte1(c1, c2) as (select int_col x, sum(bigint_col) y " +
        s"from $t1 group by int_col) select * from cte1"),
    QCase("cte_8.q", "cte8e",
      s"with cte1(a) as (select int_col x, bigint_col a from $t1) " +
        "select * from cte1",
      duck = Some(s"select int_col, bigint_col from $t1"),
      note = "padding collision: the unaliased column's name is TAKEN by " +
        "the alias list -> _col1 (values compare; names asserted in the " +
        "companion test)"))

  test("qtest conformance: cte family (forward refs, case-insensitive " +
      "names, partial column-alias lists)") {
    run("cte_")
  }

  test("cte_8.q: partial-alias output NAMES follow Hive — kept own name, " +
      "collision degrades to _col<i>") {
    assume(QtestHarness.haveRef, "/root/reference fixture data not present")
    QtestHarness.fixtures
    val kept = Engine.sql(spark, sfDir,
      s"with cte1(a) as (select int_col x, bigint_col y from $t1) " +
        "select * from cte1")
    assert(kept.columns.toSeq === Seq("a", "y"))
    val collided = Engine.sql(spark, sfDir,
      s"with cte1(a) as (select int_col x, bigint_col a from $t1) " +
        "select * from cte1")
    assert(collided.columns.toSeq === Seq("a", "_col1"))
    // exact-arity lists stay canonical; over-length still errors
    val full = Engine.sql(spark, sfDir,
      s"with cte1(a, b) as (select int_col x, bigint_col y from $t1) " +
        "select a, b from cte1")
    assert(full.columns.toSeq === Seq("a", "b"))
    intercept[Exception] {
      Engine.sql(spark, sfDir,
        s"with cte1(a, b, c) as (select int_col x, bigint_col y from $t1) " +
          "select * from cte1").collect()
    }
  }
}
