package graft

/** Qtest conformance, groupby_sort family (`groupby_sort_1_23.q`,
  * `groupby_sort_2/6.q`): in the reference these verify that group-bys on
  * a CLUSTERED/SORTED-BY table skip the shuffle — the RESULT contract is
  * plain aggregation, which is what ports (the zero-Exchange plan
  * contract has its own gate: s32 + SnapshotBucketSpec). The corpus'
  * INSERT OVERWRITE scaffolding ports to bare SELECTs; Hive's implicit
  * string arithmetic is spelled with explicit CASTs per the porting
  * rules. `GROUP BY 1, key` stays as written — Hive reads the 1 as a
  * constant, Spark as ordinal #1 (the literal '1' select item), and the
  * two interpretations coincide on these shapes by construction.
  */
class QtestGroupbySortSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("groupby_sort_1_23.q", "gbs1",
      "SELECT key, count(1) AS c FROM qt_t1 GROUP BY key"),
    QCase("groupby_sort_1_23.q", "gbs2",
      "SELECT key, val, count(1) AS c FROM qt_t1 GROUP BY key, val"),
    QCase("groupby_sort_1_23.q", "gbs3",
      "SELECT key, count(1) AS c FROM (SELECT key, val FROM qt_t1) subq1 " +
        "GROUP BY key"),
    QCase("groupby_sort_1_23.q", "gbs4",
      "SELECT k, count(1) AS c FROM (SELECT key AS k, val AS v " +
        "FROM qt_t1) subq1 GROUP BY k"),
    QCase("groupby_sort_1_23.q", "gbs5",
      "SELECT 1 AS one, key, count(1) AS c FROM qt_t1 GROUP BY 1, key",
      note = "constant-vs-ordinal GROUP BY 1: both readings group by the " +
        "literal"),
    QCase("groupby_sort_1_23.q", "gbs6",
      "SELECT key, 1 AS one, val, count(1) AS c FROM qt_t1 " +
        "GROUP BY key, 1, val"),
    QCase("groupby_sort_1_23.q", "gbs7",
      "SELECT key, CAST(key AS INT) + 1 AS k1, count(1) AS c FROM qt_t1 " +
        "GROUP BY key, CAST(key AS INT) + 1",
      note = "expression alongside the sort key (implicit string+int " +
        "spelled per porting rules)"),
    QCase("groupby_sort_1_23.q", "gbs8",
      """SELECT CAST(key AS INT) + CAST(key AS INT) AS kk,
        |  CAST(sum(cnt) AS BIGINT) AS s FROM
        |  (SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key) subq1
        |GROUP BY CAST(key AS INT) + CAST(key AS INT)""".stripMargin,
      note = "aggregate OVER an aggregate on a derived key"),
    QCase("groupby_sort_1_23.q", "gbs9",
      """SELECT * FROM (
        |  SELECT key, count(1) AS c FROM qt_t1 GROUP BY key
        |  UNION ALL
        |  SELECT key, count(1) AS c FROM qt_t1 GROUP BY key) subq1"""
        .stripMargin),
    QCase("groupby_sort_1_23.q", "gbs10",
      """SELECT * FROM (
        |  SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key
        |  UNION ALL
        |  SELECT CAST(CAST(key AS INT) + CAST(key AS INT) AS STRING) AS key,
        |    count(1) AS cnt FROM qt_t1
        |  GROUP BY CAST(key AS INT) + CAST(key AS INT)) subq1"""
        .stripMargin,
      note = "mixed map-side-groupable and not branches"),
    QCase("groupby_sort_1_23.q", "gbs11",
      """SELECT subq1.key, subq1.cnt + subq2.cnt AS s FROM
        |  (SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key) subq1
        |JOIN
        |  (SELECT key, count(1) AS cnt FROM qt_t1 GROUP BY key) subq2
        |ON subq1.key = subq2.key""".stripMargin),
    QCase("groupby_sort_1_23.q", "gbs12",
      """SELECT subq1.key AS k1, subq1.c AS c1, subq2.key AS k2,
        |  subq2.val AS v2, subq2.c AS c2 FROM
        |  (SELECT key, count(1) AS c FROM qt_t1 GROUP BY key) subq1
        |JOIN
        |  (SELECT key, val, count(1) AS c FROM qt_t1
        |   GROUP BY key, val) subq2
        |ON subq1.key = subq2.key""".stripMargin),
    QCase("groupby_sort_1_23.q", "gbs13",
      """SELECT key, constant, val, count(1) AS c FROM
        |  (SELECT key, 1 AS constant, val FROM qt_t1) subq
        |GROUP BY key, constant, val""".stripMargin,
      note = "constant PROPAGATED through a subquery then grouped"),
    QCase("groupby_sort_1_23.q", "gbs14",
      """SELECT key, constant3, val, count(1) AS c FROM (
        |  SELECT key, constant AS constant2, val, 2 AS constant3 FROM
        |    (SELECT key, 1 AS constant, val FROM qt_t1) subq
        |) subq2 GROUP BY key, constant3, val""".stripMargin,
      note = "re-aliased constants through two subquery layers"))

  test("qtest conformance: groupby_sort family (constants in GROUP BY, " +
      "derived keys, unions/joins of aggregates)") {
    run("groupby_sort")
  }
}
