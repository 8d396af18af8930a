package graft

/** Conformance wave 17l: the windowing corpus remainder — the WINDOW
  * clause spelled with Hive's DISTRIBUTE BY/SORT BY
  * (vector_windowing_expressions.q), lead with an offset and an
  * explicit default over the 10k corpus, and ptf_decimal.q's
  * lead/lag/first/last + full ranking family over decimal ordering.
  * (The sum(lag(x)) OVER w1 nesting in the .q stays a pinned REFUSAL —
  * QtestNegativeSpec's windowing_leadlag_in_udaf — so the ported
  * invariant is the max-min = last-first identity, which carries the
  * same frame semantics without the nesting.)
  */
class QtestWindowWave17lSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("vector_windowing_expressions.q", "w17l01",
      """select p_mfgr, p_retailprice, p_size,
        |  (max(p_retailprice) over w1 - min(p_retailprice) over w1
        |   = last_value(p_retailprice) over w1
        |   - first_value(p_retailprice) over w1) AS inv
        |from qt_part
        |window w1 as (distribute by p_mfgr sort by p_retailprice)"""
        .stripMargin,
      duck = Some("""select p_mfgr, p_retailprice, p_size,
        |  (max(p_retailprice) over w1 - min(p_retailprice) over w1
        |   = last_value(p_retailprice) over w1
        |   - first_value(p_retailprice) over w1) AS inv
        |from qt_part
        |window w1 as (partition by p_mfgr order by p_retailprice)"""
        .stripMargin),
      note = "a WINDOW clause spelled DISTRIBUTE BY/SORT BY; under the " +
        "default running frame max=last and min=first so the identity " +
        "holds on every row"),

    QCase("vector_windowing_expressions.q", "w17l02",
      """select s, i, i - lead(i, 3, 0) over
        |  (partition by si order by i, s) AS d
        |from qt_over10k where si = 256
        |order by i, s""".stripMargin,
      duck = Some("""select s, i, i - lead(i, 3, 0) over
        |  (partition by si order by i, s) AS d
        |from qt_over10k where si = 256
        |order by i NULLS LAST, s NULLS LAST""".stripMargin),
      ordered = true,
      note = "lead with an offset of 3 and an EXPLICIT 0 default — " +
        "tail rows subtract the default, not NULL"),

    QCase("ptf_decimal.q", "w17l03",
      """select p_mfgr, p_retailprice,
        |  lead(p_retailprice) over (partition by p_mfgr
        |    ORDER BY p_name) as c1,
        |  lag(p_retailprice) over (partition by p_mfgr
        |    ORDER BY p_name) as c2,
        |  first_value(p_retailprice) over (partition by p_mfgr
        |    ORDER BY p_name) as c3,
        |  last_value(p_retailprice) over (partition by p_mfgr
        |    ORDER BY p_name) as c4
        |from qt_part""".stripMargin,
      note = "the lead/lag/first/last family ordered by name; " +
        "defaults are NULL at partition edges"),

    QCase("ptf_decimal.q", "w17l04",
      """select p_mfgr, p_retailprice,
        |  row_number() over (PARTITION BY p_mfgr
        |    ORDER BY p_retailprice) as c1,
        |  rank() over (PARTITION BY p_mfgr
        |    ORDER BY p_retailprice) as c2,
        |  dense_rank() over (PARTITION BY p_mfgr
        |    ORDER BY p_retailprice) as c3,
        |  percent_rank() over (PARTITION BY p_mfgr
        |    ORDER BY p_retailprice) as c4,
        |  cume_dist() over (PARTITION BY p_mfgr
        |    ORDER BY p_retailprice) as c5,
        |  ntile(5) over (PARTITION BY p_mfgr
        |    ORDER BY p_retailprice) as c6
        |from qt_part""".stripMargin,
      note = "the six ranking functions over a DECIMAL-ordered window"))

  test("qtest conformance wave 17l: windowing remainder (DISTRIBUTE " +
      "BY window clause, lead defaults, ranking over decimals)") {
    run("vector_windowing_expressions", "ptf_decimal")
  }
}
