package graft

/** Conformance wave 16al: the join_filters/join_nulls matrices — the
  * corpus' systematic sweep of ON-clause filter placement across all
  * four join types over NULL-bearing tiny tables (ref ql/src/test/
  * queries/clientpositive/join_filters.q — 112 selects whose 20-shape
  * core is generated here — and join_nulls.q). Everything is standard
  * SQL over ints, so DuckDB runs the identical text; the fixtures are
  * the corpus' in3.txt (12,35),(NULL,40),(48,NULL),(100,100) and
  * in1.txt (NULL,35),(48,NULL),(100,100) as VALUES.
  */
class QtestJoinFiltersWave16alSpec extends QtestHarness {

  private val m8 = "(VALUES (12, 35), (CAST(NULL AS INT), 40), " +
    "(48, CAST(NULL AS INT)), (100, 100))"
  private val m3 = "(VALUES (CAST(NULL AS INT), 35), (48, CAST(NULL " +
    "AS INT)), (100, 100))"

  private val filters = "a.key > 40 AND a.value > 50 AND a.key = " +
    "a.value AND b.key > 40 AND b.value > 50 AND b.key = b.value"

  private val joinTypes = Seq(
    "JOIN" -> "inner", "LEFT OUTER JOIN" -> "left",
    "RIGHT OUTER JOIN" -> "right", "FULL OUTER JOIN" -> "full")

  private val equis = Seq(
    "" -> "none", "a.key = b.value AND " -> "kv",
    "a.key = b.key AND " -> "kk", "a.value = b.value AND " -> "vv",
    "a.value = b.value and a.key = b.key AND " -> "kkvv")

  protected val qcases: Seq[QCase] =
    (for {
      (jt, jn) <- joinTypes
      (eq, en) <- equis
    } yield QCase("join_filters.q", s"al_${jn}_$en",
      s"SELECT * FROM $m8 a(key, value) $jt $m8 b(key, value) ON " +
        s"$eq$filters",
      note = s"$jt with ${if (en == "none") "NO equi key" else "equi " +
        en} + per-side filters in the ON: outer sides NULL-extend " +
        "filtered-away matches, inner drops them")) ++
    (for ((jt, jn) <- joinTypes)
      yield QCase("join_nulls.q", s"al_nulls_$jn",
        s"SELECT * FROM $m3 a(key, value) $jt $m3 b(key, value) ON " +
          "a.key = b.key",
        note = "NULL keys never equal anything, including each other"))

  test("qtest conformance wave 16al: the join_filters 20-shape " +
      "matrix + join_nulls across all four join types") {
    run("join_filters", "join_nulls")
  }
}
