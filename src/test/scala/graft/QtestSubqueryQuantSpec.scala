package graft

/** Conformance wave 16k: quantified comparison subqueries — ref
  * ql/src/test/queries/clientpositive/subquery_ALL.q / subquery_ANY.q
  * over the `part` fixture (expected values from
  * results/clientpositive/llap). DuckDB executes the SAME quantified
  * text natively, so every case's three-valued semantics are checked
  * against an independent implementation, not just transcribed cells.
  */
class QtestSubqueryQuantSpec extends QtestHarness {

  // part ∪ one all-NULL key row — subquery_ALL.q's part_null_n0 shape
  private val partNull =
    "(SELECT p_partkey FROM qt_part UNION ALL SELECT cast(null as int))"

  protected val qcases: Seq[QCase] = Seq(
    QCase("subquery_ALL.q", "qa01",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey <> ALL " +
        "(SELECT p_partkey FROM qt_part)",
      note = "<> ALL is NOT IN: every key is present, so zero rows"),
    QCase("subquery_ALL.q", "qa02",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey > ALL " +
        "(SELECT p_partkey FROM qt_part)"),
    QCase("subquery_ALL.q", "qa03",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey >= ALL " +
        "(SELECT p_partkey FROM qt_part)",
      note = ">= ALL keeps exactly the max-key row"),
    QCase("subquery_ALL.q", "qa04",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey <= ALL " +
        "(SELECT p_partkey FROM qt_part)"),
    QCase("subquery_ALL.q", "qa05",
      "SELECT count(*) AS c FROM qt_part WHERE p_size < ALL " +
        "(SELECT max(p_size) FROM qt_part GROUP BY p_partkey)"),
    QCase("subquery_ALL.q", "qa06",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey <> ALL " +
        "(SELECT cast(c as int) FROM qt_tempty)",
      note = "empty subquery: ALL is vacuously TRUE — every row"),
    QCase("subquery_ALL.q", "qa07",
      "SELECT count(*) AS c FROM qt_part WHERE (p_partkey <> ALL " +
        s"(SELECT p_partkey FROM $partNull q WHERE p_partkey IS NULL)) " +
        "IS NULL",
      note = "all-NULL subquery: the quantified result is NULL for " +
        "every probe"),
    QCase("subquery_ALL.q", "qa08",
      "SELECT count(*) AS c FROM qt_part WHERE ((p_partkey <> ALL " +
        s"(SELECT p_partkey FROM $partNull q)) = false)",
      note = "false + NULL folds to false under ALL: the key IS " +
        "present, so the predicate is definitely false, not NULL"),
    QCase("subquery_ALL.q", "qa09",
      "SELECT count(*) AS c FROM qt_part HAVING count(*) > ALL " +
        "(SELECT count(*) FROM qt_part GROUP BY p_partkey)",
      note = "quantified comparison in HAVING over aggregates"),
    QCase("subquery_ALL.q", "qa10",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey = ALL " +
        "(SELECT min(p_partkey) FROM qt_part)",
      note = "= ALL against a single-row subquery keeps the min row"),
    QCase("subquery_ANY.q", "qa11",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey = ANY " +
        "(SELECT p_partkey FROM qt_part)"),
    QCase("subquery_ANY.q", "qa12",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey > ANY " +
        "(SELECT p_partkey FROM qt_part)",
      note = "> ANY: everything but the min row"),
    QCase("subquery_ANY.q", "qa13",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey < ANY " +
        "(SELECT p_partkey FROM qt_part)"),
    QCase("subquery_ANY.q", "qa14",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey >= ANY " +
        "(SELECT p_partkey FROM qt_part)"),
    QCase("subquery_ANY.q", "qa15",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey <= ANY " +
        "(SELECT p_partkey FROM qt_part)"),
    QCase("subquery_ANY.q", "qa16",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey = SOME " +
        "(SELECT min(p_partkey) FROM qt_part)",
      note = "SOME is a synonym for ANY"),
    QCase("subquery_ANY.q", "qa17",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey = ANY " +
        "(SELECT cast(c as int) FROM qt_tempty)",
      note = "empty subquery: ANY is vacuously FALSE"),
    QCase("subquery_ANY.q", "qa18",
      "SELECT count(*) AS c FROM qt_part WHERE (p_size = ANY " +
        s"(SELECT p_partkey FROM $partNull q)) IS NULL",
      note = "no match + NULL element: ANY answers NULL, not false"),
    QCase("subquery_ANY.q", "qa19",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey <> ANY " +
        "(SELECT p_partkey FROM qt_part)",
      note = "<> ANY: some element differs for every probe (keys are " +
        "distinct), so all rows qualify"),
    QCase("subquery_ANY.q", "qa20",
      "SELECT count(*) AS c FROM qt_part WHERE p_partkey >= ALL " +
        "(SELECT p_partkey FROM qt_part) AND p_partkey <= ANY " +
        "(SELECT p_partkey FROM qt_part)",
      note = "two quantified predicates in one statement"),

    // subquery_select.q: IN-subqueries in PROJECTED position — stock
    // Spark's ExistenceJoin answers false where SQL answers NULL; the
    // engine lowers null-observable occurrences exactly
    // (plans/ProjectedInSubqueries)
    QCase("subquery_select.q", "qs01",
      "SELECT p_size, p_size IN (SELECT max(p_size) FROM qt_part) AS b " +
        "FROM qt_part",
      note = "projected non-correlated IN"),
    QCase("subquery_select.q", "qs02",
      "SELECT p_size, p_size IN (SELECT max(p_size) FROM qt_part p " +
        "WHERE p.p_type = qt_part.p_type) AS b FROM qt_part",
      note = "projected CORRELATED IN (equality correlation under the " +
        "count/exists lowering)"),
    QCase("subquery_select.q", "qs03",
      "SELECT p_size, p_size NOT IN (SELECT max(p_size) FROM qt_part) " +
        "AS b FROM qt_part",
      note = "projected NOT IN"),
    QCase("subquery_select.q", "qs04",
      "SELECT (1 NOT IN (SELECT cast(null as int))) AS a, " +
        "((1 NOT IN (SELECT cast(null as int))) IS NULL) AS b, " +
        "(1 IN (SELECT cast(null as int))) AS c, " +
        "(1 NOT IN (SELECT cast(c as int) FROM qt_tempty)) AS d",
      duck = Some(""),
      hive = Some(Seq("NULL", "true", "NULL", "true")),
      note = "THE null-observability pin: x NOT IN {NULL} is NULL (not " +
        "false), empty-set NOT IN is true — stock Spark answers false " +
        "for the first"),
    QCase("subquery_select.q", "qs05",
      "SELECT count(*) AS n FROM qt_part WHERE (p_size NOT IN " +
        "(SELECT cast(null as int))) IS NULL",
      note = "IS NULL over NOT IN inside a filter — the nested " +
        "position Spark's null-aware anti join does not reach"),
    QCase("subquery_select.q", "qs06",
      "SELECT sum(CASE WHEN p_size IN (SELECT max(p_size) FROM " +
        "qt_part) THEN 1 ELSE 0 END) AS s FROM qt_part",
      note = "IN under CASE under an aggregate"))

  test("qtest conformance: quantified comparison subqueries " +
      "(ALL/ANY/SOME lowered to Hive's aggregate CASE form)") {
    run("subquery_ALL", "subquery_ANY")
  }

  test("qtest conformance: projected / null-observable IN-subqueries " +
      "(subquery_select.q + the NOT IN NULL pin)") {
    run("subquery_select")
  }

  test("quantified rewrite is pure text surgery: left operand, " +
      "operator and subquery extents") {
    import graft.plans.QuantifiedSubqueries.rewrite
    assert(rewrite("select 1 where x = ANY (select y from t)").get
      .contains("WHERE __gc = (x)"))
    assert(rewrite("select 1 where x <> ALL (select y from t)").get
      .startsWith("select 1 where (NOT (CASE WHEN"))
    assert(rewrite("select 1 where a + b > ALL (select y from t)").get
      .contains("(a + b)"))
    assert(rewrite("select count(*) from t having count(*) > ALL " +
      "(select count(*) from t group by k)").isDefined)
    // no quantified pattern → None (plain IN, EXISTS untouched)
    assert(rewrite("select 1 where x in (select y from t)").isEmpty)
    assert(rewrite("select 'ANY (select' AS s from t").isEmpty)
  }
}
