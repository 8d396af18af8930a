package graft

/** Qtest conformance, PTF + window-spec families: `ptf.q` (the reference's
  * PTF driver file — `noop(on T partition by X order by Y)` is the
  * identity PTF, so each case ports to the same windowed SELECT over the
  * plain table, which is precisely the semantics the file verifies) and
  * `windowing_windowspec.q` / `windowing_windowspec2.q` (ROWS/RANGE frame
  * coverage over the 10k-row over10k dataset).
  *
  * Porting notes beyond the standard rules (QtestConformanceSpec doc):
  *  - part's duplicated p_name rows make running sums under ties
  *    visit-order-dependent; cumulative-frame cases append p_partkey as
  *    a tiebreak IN BOTH texts (rank/dense_rank keep the original keys —
  *    tie ranks are deterministic).
  *  - over10k's bare `limit 100` (no ORDER BY) is single-node scheduling
  *    luck, not semantics: ports compare the FULL result sorted.
  *  - ROWS-frame over10k cases order by keys that include the aggregated
  *    column, so tied rows contribute identical values — deterministic
  *    without a tiebreak; RANGE frames treat ties as peers by definition.
  */
class QtestPtfWindowSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    // ---------------------------------------------------------- ptf.q
    QCase("ptf.q", "ptf1",
      """SELECT p_mfgr, p_name, p_size,
        |  rank() OVER (PARTITION BY p_mfgr ORDER BY p_name) AS r,
        |  dense_rank() OVER (PARTITION BY p_mfgr ORDER BY p_name) AS dr,
        |  round(sum(p_retailprice) OVER (PARTITION BY p_mfgr
        |    ORDER BY p_name, p_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS s1
        |FROM qt_part""".stripMargin,
      note = "test1: noop(on part ...) = identity; p_partkey tiebreak on " +
        "the cumulative sum (duplicate p_name rows)"),
    QCase("ptf.q", "ptf2",
      """SELECT p_mfgr, p_name, p_size,
        |  p_size - lag(p_size, 1, p_size) OVER (PARTITION BY p_mfgr
        |    ORDER BY p_name, p_partkey) AS deltaSz
        |FROM (SELECT p1.* FROM qt_part p1 JOIN qt_part p2
        |      ON p1.p_partkey = p2.p_partkey) j""".stripMargin,
      note = "testJoinWithNoop: lag over the self-join, tiebroken"),
    QCase("ptf.q", "ptf3",
      "SELECT p_mfgr, p_name, p_size FROM qt_part",
      note = "testOnlyPTF: bare noop = the table"),
    QCase("ptf.q", "ptf4",
      """SELECT p_mfgr, p_name, p_size,
        |  rank() OVER (PARTITION BY p_mfgr ORDER BY p_name) AS r,
        |  dense_rank() OVER (PARTITION BY p_mfgr ORDER BY p_name) AS dr,
        |  p_size - lag(p_size, 1, p_size) OVER (PARTITION BY p_mfgr
        |    ORDER BY p_name, p_partkey) AS deltaSz
        |FROM qt_part""".stripMargin,
      note = "testPTFAndWhereWithWindowing"),
    QCase("ptf.q", "ptf5",
      """SELECT p_mfgr, p_name, p_size,
        |  rank() OVER (PARTITION BY p_mfgr ORDER BY p_name) AS r,
        |  dense_rank() OVER (PARTITION BY p_mfgr ORDER BY p_name) AS dr
        |FROM qt_part GROUP BY p_mfgr, p_name, p_size""".stripMargin,
      note = "testSWQAndPTFAndGBy: windowing AFTER group by (lag dropped: " +
        "grouped dedup makes its tie order engine luck)"),
    QCase("ptf.q", "ptf6",
      """SELECT abc.p_mfgr, abc.p_name, abc.p_size, abc.p_retailprice
        |FROM qt_part abc JOIN qt_part p1
        |  ON abc.p_partkey = p1.p_partkey""".stripMargin,
      note = "testJoin/testJoinRight: noop output joined to the table " +
        "(p_partkey/p_brand/... projected down to the compared columns)"),
    QCase("ptf.q", "ptf7",
      """SELECT p_mfgr, p_name, p_size,
        |  rank() OVER (PARTITION BY p_mfgr ORDER BY p_name, p_size DESC) AS r
        |FROM qt_part""".stripMargin,
      note = "testNoopWithMap: noopwithmap = identity too"),
    QCase("ptf.q", "ptf8",
      """SELECT p_mfgr, p_name, sub1.cd, sub1.s1
        |FROM (SELECT p_mfgr, p_name,
        |        count(p_size) OVER (PARTITION BY p_mfgr
        |          ORDER BY p_name) AS cd,
        |        p_retailprice,
        |        round(sum(p_retailprice) OVER w1, 2) AS s1
        |      FROM qt_part
        |      WINDOW w1 AS (PARTITION BY p_mfgr
        |        ORDER BY p_name, p_partkey
        |        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)) sub1"""
        .stripMargin,
      note = "WINDOW clause + windowing inside a subquery, tiebroken"),
    QCase("ptf.q", "ptf9",
      """SELECT abc.p_mfgr, abc.p_name,
        |  rank() OVER (PARTITION BY abc.p_mfgr ORDER BY abc.p_name) AS r,
        |  dense_rank() OVER (PARTITION BY abc.p_mfgr
        |    ORDER BY abc.p_name) AS dr,
        |  count(abc.p_name) OVER (PARTITION BY abc.p_mfgr
        |    ORDER BY abc.p_name) AS cd,
        |  abc.p_retailprice,
        |  round(sum(abc.p_retailprice) OVER (PARTITION BY abc.p_mfgr
        |    ORDER BY abc.p_name, abc.p_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS s1,
        |  abc.p_size,
        |  abc.p_size - lag(abc.p_size, 1, abc.p_size) OVER (
        |    PARTITION BY abc.p_mfgr
        |    ORDER BY abc.p_name, abc.p_partkey) AS deltaSz
        |FROM qt_part abc JOIN qt_part p1
        |  ON abc.p_partkey = p1.p_partkey""".stripMargin,
      note = "DISTRIBUTE BY/SORT BY window spelling over the joined PTF " +
        "(spelled PARTITION/ORDER for the shared twin), tiebroken"),
    QCase("ptf.q", "ptf10",
      "SELECT DISTINCT p_mfgr, p_name, p_size FROM qt_part",
      note = "testDistinctWithWindowing's distinct leg"),
    QCase("ptf.q", "ptf11",
      """SELECT p_mfgr, p_brand, s, round(sum(s) OVER w1, 2) AS s1
        |FROM (SELECT p_mfgr, p_brand, round(sum(p_retailprice), 2) AS s
        |      FROM qt_part GROUP BY p_mfgr, p_brand) mfgr_price_view
        |WINDOW w1 AS (PARTITION BY p_mfgr ORDER BY p_brand
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
      note = "mfgr_price_view: windowing over a grouped view; (p_mfgr, " +
        "p_brand) unique after grouping, no tiebreak needed"),
    QCase("ptf.q", "ptf12",
      """SELECT p_mfgr, p_name, p_size,
        |  round(sum(p_size) OVER (PARTITION BY p_mfgr
        |    ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
        |    1) AS s2,
        |  rank() OVER (PARTITION BY p_mfgr
        |    ORDER BY p_mfgr, p_name) AS r,
        |  dense_rank() OVER (PARTITION BY p_mfgr
        |    ORDER BY p_mfgr, p_name) AS dr,
        |  cume_dist() OVER (PARTITION BY p_mfgr
        |    ORDER BY p_mfgr, p_name) AS cud,
        |  first_value(p_size) OVER w1 AS fv1
        |FROM qt_part
        |WINDOW w1 AS (PARTITION BY p_mfgr ORDER BY p_mfgr, p_name, p_partkey
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""".stripMargin,
      note = "part_5 multi-insert leg: RANGE 5 PRECEDING + cume_dist + " +
        "first_value (ignore-nulls flag dropped: p_size has no NULLs)"),
    QCase("ptf.q", "ptf13",
      """SELECT p_mfgr, p_name,
        |  rank() OVER (PARTITION BY p_mfgr, p_name ORDER BY p_name) AS r,
        |  dense_rank() OVER (PARTITION BY p_mfgr, p_name
        |    ORDER BY p_name) AS dr,
        |  p_size,
        |  sum(p_size) OVER (PARTITION BY p_mfgr, p_name
        |    ORDER BY p_name, p_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
        |FROM qt_part""".stripMargin,
      note = "nested noop chain: rank over (p_mfgr, p_name) — Hive allows " +
        "an orderless rank (all ties = 1); spelled with the constant-tie " +
        "ORDER BY p_name for Spark, same ranks"),

    // --------------------------------- windowing_windowspec.q (over10k)
    QCase("windowing_windowspec.q", "ws1",
      """SELECT s, sum(b) OVER (PARTITION BY i ORDER BY s, b
        |  ROWS UNBOUNDED PRECEDING) AS x FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec.q", "ws2",
      """SELECT s, sum(f) OVER (PARTITION BY d ORDER BY s, f
        |  ROWS UNBOUNDED PRECEDING) AS x FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec.q", "ws3",
      """SELECT s, sum(f) OVER (PARTITION BY ts ORDER BY f
        |  RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec.q", "ws4",
      """SELECT s, avg(f) OVER (PARTITION BY ts ORDER BY s, f
        |  ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec.q", "ws5",
      """SELECT s, avg(d) OVER (PARTITION BY t ORDER BY s, d DESC
        |  ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec.q", "ws6",
      """SELECT s, sum(i) OVER (PARTITION BY ts ORDER BY s) AS x
        |FROM qt_over10k""".stripMargin,
      note = "default frame = RANGE UNBOUNDED..CURRENT: ties on s are " +
        "peers, deterministic"),
    QCase("windowing_windowspec.q", "ws7",
      """SELECT f, sum(f) OVER (PARTITION BY ts ORDER BY f
        |  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec.q", "ws8",
      """SELECT s, i, avg(d) OVER (PARTITION BY s ORDER BY i)
        |  / 10.0 AS x FROM qt_over10k""".stripMargin,
      note = "the .q's bare `limit 7` dropped (full result, sorted " +
        "compare) and its round(.,2) too: avg/10 lands exactly on " +
        "round-half boundaries where the engines' HALF_UP vs binary-FP " +
        "rounding split — the harness' 1e-6 tolerance is the honest gate"),
    QCase("windowing_windowspec.q", "ws9",
      """SELECT s, i, round((avg(d) OVER w1 + 10.0) -
        |  (avg(d) OVER w1 - 10.0), 2) AS x FROM qt_over10k
        |WINDOW w1 AS (PARTITION BY s ORDER BY i)""".stripMargin,
      note = "named WINDOW reused by two frames (HIVE-9228 shape)"),

    // -------------------------------- windowing_windowspec2.q (frames)
    QCase("windowing_windowspec2.q", "wf1",
      """SELECT CAST(ts AS STRING) AS tss, f, sum(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS x
        |FROM qt_over10k""".stripMargin,
      note = "empty frame at partition head -> NULL in both engines"),
    QCase("windowing_windowspec2.q", "wf2",
      """SELECT CAST(ts AS STRING) AS tss, f, sum(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec2.q", "wf3",
      """SELECT CAST(ts AS STRING) AS tss, f, sum(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec2.q", "wf4",
      """SELECT CAST(ts AS STRING) AS tss, f, sum(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec2.q", "wf5",
      """SELECT CAST(ts AS STRING) AS tss, f, avg(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec2.q", "wf6",
      """SELECT CAST(ts AS STRING) AS tss, f, avg(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec2.q", "wf7",
      """SELECT CAST(ts AS STRING) AS tss, f, first_value(f) OVER (
        |  PARTITION BY ts ORDER BY f
        |  ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS x
        |FROM qt_over10k""".stripMargin,
      note = "first_value over a frame that can be empty"),
    QCase("windowing_windowspec2.q", "wf8",
      """SELECT CAST(ts AS STRING) AS tss, f, last_value(f) OVER (
        |  PARTITION BY ts ORDER BY f
        |  ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec2.q", "wf9",
      """SELECT CAST(ts AS STRING) AS tss, f, count(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS x
        |FROM qt_over10k""".stripMargin,
      note = "count over an empty frame -> 0, not NULL"),
    QCase("windowing_windowspec2.q", "wf10",
      """SELECT CAST(ts AS STRING) AS tss, f, min(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin),
    QCase("windowing_windowspec2.q", "wf11",
      """SELECT CAST(ts AS STRING) AS tss, f, max(f) OVER (PARTITION BY ts
        |  ORDER BY f ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS x
        |FROM qt_over10k""".stripMargin))

  test("qtest conformance: ptf family (noop identity, WINDOW clauses, " +
      "PTF-join, cume_dist/first_value)") {
    run("ptf.q")
  }
  test("qtest conformance: window-spec family (ROWS/RANGE frames, " +
      "following-only and empty frames, over10k)") {
    run("windowing_windowspec")
  }
}
