package graft

/** Conformance wave 16u: aggregates over EMPTY selections — ref
  * ql/src/test/queries/clientpositive/nullgroup.q, nullgroup2.q,
  * nullgroup4.q, nullgroup4_multi_distinct.q. The family pins the
  * global-aggregate-over-nothing contract (one row of zero counts /
  * NULL sums) versus grouped-aggregate-over-nothing (zero rows) —
  * identical under every map-side-aggregation and skew setting the .q
  * files cycle through, which is exactly why the results are the
  * conformance surface.
  */
class QtestNullGroupSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("nullgroup.q", "ng1",
      "select count(1) AS c from qt_src x where x.key > 9999",
      duck = Some("select count(1) AS c from qt_src x where " +
        "cast(x.key as int) > 9999"),
      note = "global count over an empty selection is ONE row of 0"),
    QCase("nullgroup2.q", "ng2",
      "select x.key AS k, count(1) AS c from qt_src x where " +
        "x.key > 9999 group by x.key",
      duck = Some("select x.key AS k, count(1) AS c from qt_src x " +
        "where cast(x.key as int) > 9999 group by x.key"),
      note = "grouped count over an empty selection is ZERO rows"),
    QCase("nullgroup4.q", "ng3",
      "select count(1) AS c, count(distinct x.value) AS d from " +
        "qt_src x where x.key = 9999",
      duck = Some("select count(1) AS c, count(distinct x.value) AS d " +
        "from qt_src x where cast(x.key as int) = 9999"),
      note = "count + count(distinct) over nothing: 0, 0 — one row"),
    QCase("nullgroup4_multi_distinct.q", "ng4",
      "select count(1) AS c, count(distinct x.value) AS d, " +
        "count(distinct substr(x.value, 5)) AS e from qt_src x " +
        "where x.key = 9999",
      duck = Some("select count(1) AS c, count(distinct x.value) AS " +
        "d, count(distinct substr(x.value, 5)) AS e from qt_src x " +
        "where cast(x.key as int) = 9999"),
      note = "multiple DISTINCT aggregates over nothing"),
    QCase("nullgroup.q", "ng5",
      "select sum(cast(key as int)) AS s, max(key) AS m, min(key) " +
        "AS mi, avg(cast(key as int)) AS a from qt_src where " +
        "key > '9999'",
      note = "value aggregates over nothing are NULL (count is the " +
        "only zero)"))

  test("qtest conformance: aggregates over empty selections " +
      "(nullgroup family)") {
    run("nullgroup")
  }
}
