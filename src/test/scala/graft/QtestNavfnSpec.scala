package graft

/** Qtest conformance, navigation-function family: `windowing_navfn.q`
  * over the over10k dataset plus `union_null.q`'s NULL-branch union.
  * This wave's finding: Hive permits ORDERLESS ranking/sequencing windows
  * (`row_number() OVER ()`, the .q's first statement) where Spark refuses
  * — fixed by the `plans.OrderlessWindows` front-door rewrite (constant
  * ORDER BY = every row a peer, Hive's semantics).
  *
  * Tie discipline (same as the ptf wave): sequencing outputs under tied
  * order keys are visit-order luck, so ports either add tiebreak columns
  * in BOTH texts or pick cases where tied rows share the projected value;
  * DuckDB windows default NULLS LAST, so twins spell NULLS FIRST.
  */
class QtestNavfnSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("windowing_navfn.q", "nf0",
      "SELECT row_number() OVER () AS rn FROM qt_src WHERE key = '238'",
      note = "the ORDERLESS window (plain parse-and-refuse before " +
        "OrderlessWindows): src holds key 238 twice -> {1, 2}"),
    QCase("windowing_navfn.q", "nf0b",
      "SELECT rank() OVER (PARTITION BY key) AS r, " +
        "dense_rank() OVER (PARTITION BY key) AS dr FROM qt_src " +
        "WHERE key = '238'",
      note = "orderless rank: every row is a peer, rank 1 (DuckDB agrees " +
        "natively; Spark needed the front-door rewrite)"),
    QCase("windowing_navfn.q", "nf1",
      """SELECT s, row_number() OVER (PARTITION BY d
        |  ORDER BY s, i, b, f) AS rn
        |FROM qt_over10k""".stripMargin,
      duck = Some("""SELECT s, row_number() OVER (PARTITION BY d
        |  ORDER BY s NULLS FIRST, i NULLS FIRST, b NULLS FIRST,
        |  f NULLS FIRST) AS rn
        |FROM qt_over10k""".stripMargin),
      note = "the .q orders by `dec` alone; full tiebreaks make the " +
        "numbering engine-independent (exact duplicates interchangeable)"),
    QCase("windowing_navfn.q", "nf2",
      """SELECT i, lead(s) OVER (PARTITION BY bo
        |  ORDER BY d, i DESC, s, b) AS x
        |FROM qt_over10k""".stripMargin,
      duck = Some("""SELECT i, lead(s) OVER (PARTITION BY bo
        |  ORDER BY d NULLS FIRST, i DESC NULLS LAST, s NULLS FIRST,
        |  b NULLS FIRST) AS x
        |FROM qt_over10k""".stripMargin),
      note = "lead over a DESC component (the .q partitions by the " +
        "dropped bin column; bo carries the same shape)"),
    QCase("windowing_navfn.q", "nf3",
      """SELECT i, lag(f) OVER (PARTITION BY i
        |  ORDER BY s, i, f) AS x FROM qt_over10k""".stripMargin,
      duck = Some("""SELECT i, lag(f) OVER (PARTITION BY i
        |  ORDER BY s NULLS FIRST, i NULLS FIRST, f NULLS FIRST) AS x
        |FROM qt_over10k""".stripMargin),
      note = "ties on (s, f) share the lagged value, so boundary order " +
        "is irrelevant"),
    QCase("windowing_navfn.q", "nf4",
      """SELECT s, last_value(t) OVER (PARTITION BY d
        |  ORDER BY f, t) AS x FROM qt_over10k""".stripMargin,
      duck = Some("""SELECT s, last_value(t) OVER (PARTITION BY d
        |  ORDER BY f NULLS FIRST, t NULLS FIRST) AS x
        |FROM qt_over10k""".stripMargin),
      note = "default RANGE frame: last PEER; t in the order key pins " +
        "which peer is last"),
    QCase("windowing_navfn.q", "nf5",
      """SELECT s, first_value(s) OVER (PARTITION BY bo
        |  ORDER BY s) AS x FROM qt_over10k""".stripMargin,
      duck = Some("""SELECT s, first_value(s) OVER (PARTITION BY bo
        |  ORDER BY s NULLS FIRST) AS x FROM qt_over10k""".stripMargin)),
    QCase("windowing_navfn.q", "nf6",
      """SELECT t, s, i, last_value(i) OVER (PARTITION BY t
        |  ORDER BY s, i) AS x
        |FROM qt_over10k
        |WHERE (s = 'oscar allen' OR s = 'oscar carson') AND t = 10"""
        .stripMargin,
      duck = Some("""SELECT t, s, i, last_value(i) OVER (PARTITION BY t
        |  ORDER BY s NULLS FIRST, i NULLS FIRST) AS x
        |FROM qt_over10k
        |WHERE (s = 'oscar allen' OR s = 'oscar carson') AND t = 10"""
        .stripMargin)),

    QCase("union_null.q", "un1",
      """SELECT x FROM (
        |  SELECT * FROM (SELECT value AS x FROM qt_src
        |                 ORDER BY x LIMIT 5) a
        |  UNION ALL
        |  SELECT * FROM (SELECT CAST(NULL AS STRING) AS x FROM qt_src
        |                 LIMIT 5) b) a""".stripMargin,
      note = "HIVE-2901: a NULL-typed branch unions with a string branch " +
        "(tied lowest values are duplicates, limit-cut interchangeable)"))

  test("qtest conformance: navigation functions incl. Hive's ORDERLESS " +
      "windows; NULL-branch unions") {
    run("windowing_navfn", "union_null")
  }
}
