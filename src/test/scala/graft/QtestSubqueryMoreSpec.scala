package graft

/** Qtest conformance, subquery_in.q / subquery_notin.q remainder: the
  * corpus' deep IN/NOT IN shapes beyond the starter cases already in
  * QtestConformanceSpec — windowed subqueries, correlated aggregates,
  * expression keys, HAVING-IN, unions inside IN, NULL-list NOT IN.
  * `lineitem` has no reference fixture file, so the driver's sf0.001
  * lineitem parquet stands in (both engines read the identical file;
  * l_shipmode='AIR' respells as l_returnflag='R').
  */
class QtestSubqueryMoreSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    // ------------------------------------------------------ subquery_in.q
    QCase("subquery_in.q", "sqi1",
      """SELECT p_name, p_size FROM qt_part
        |WHERE qt_part.p_size IN (
        |  SELECT avg(p_size) FROM (
        |    SELECT p_size, rank() OVER (PARTITION BY p_mfgr
        |      ORDER BY p_size) AS r FROM qt_part) a
        |  WHERE r <= 2)""".stripMargin,
      note = "IN over a windowed-then-aggregated subquery (int IN double " +
        "coercion)"),
    QCase("subquery_in.q", "sqi2",
      """SELECT p_mfgr, p_name, p_size FROM qt_part b
        |WHERE b.p_size IN (
        |  SELECT min(p_size) FROM (
        |    SELECT p_mfgr, p_size, rank() OVER (PARTITION BY p_mfgr
        |      ORDER BY p_size) AS r FROM qt_part) a
        |  WHERE r <= 2 AND b.p_mfgr = a.p_mfgr)""".stripMargin,
      note = "correlated agg over a windowed subquery"),
    QCase("subquery_in.q", "sqi3",
      """SELECT * FROM qt_src b WHERE b.key IN (
        |  SELECT DISTINCT a.key FROM qt_src a
        |  WHERE b.value = a.value AND a.key > '9')""".stripMargin),
    QCase("subquery_in.q", "sqi4",
      """SELECT p_mfgr, p_name, p_size FROM qt_part
        |WHERE qt_part.p_size IN (
        |  SELECT first_value(p_size) OVER (PARTITION BY p_mfgr
        |    ORDER BY p_size) FROM qt_part)""".stripMargin),
    QCase("subquery_in.q", "sqi5",
      """SELECT p.p_partkey, li.l_suppkey
        |FROM (SELECT DISTINCT l_partkey AS p_partkey FROM qt_lineitem) p
        |JOIN qt_lineitem li ON p.p_partkey = li.l_partkey
        |WHERE li.l_linenumber = 1 AND li.l_orderkey IN (
        |  SELECT l_orderkey FROM qt_lineitem WHERE l_returnflag = 'R')"""
        .stripMargin),
    QCase("subquery_in.q", "sqi6",
      """SELECT CAST(sum(l_extendedprice) AS DOUBLE) AS s
        |FROM qt_lineitem, qt_part
        |WHERE p_partkey = l_partkey AND l_quantity IN (
        |  SELECT avg(l_quantity) FROM qt_lineitem
        |  WHERE l_partkey = p_partkey)""".stripMargin,
      note = "correlated avg against the OUTER join's column; the tiny " +
        "part and sf0.001 lineitem share no keys by value-range, so the " +
        "gate is the empty-sum NULL"),
    QCase("subquery_in.q", "sqi7",
      """SELECT * FROM qt_part
        |WHERE p_brand <> 'Brand#14' AND p_size IN (
        |  SELECT p_size FROM qt_part p WHERE p.p_type = qt_part.p_type
        |  GROUP BY p_size) AND p_size <> 340""".stripMargin),
    QCase("subquery_in.q", "sqi8",
      """SELECT * FROM qt_part WHERE (p_size - 1) IN (
        |  SELECT min(p_size) FROM qt_part GROUP BY p_type)""".stripMargin,
      note = "expression key IN grouped-agg list"),
    QCase("subquery_in.q", "sqi9",
      """SELECT * FROM qt_part WHERE (p_partkey * p_size) IN (
        |  SELECT min(p_partkey) FROM qt_part GROUP BY p_type)"""
        .stripMargin),
    QCase("subquery_in.q", "sqi10",
      """SELECT count(*) AS c FROM qt_part e
        |WHERE p_size + 100 IN (
        |  SELECT p_partkey FROM qt_part WHERE p_name = e.p_name)"""
        .stripMargin,
      note = "correlated by p_name with an expression probe key"),
    QCase("subquery_in.q", "sqi11",
      """SELECT * FROM qt_part WHERE floor(p_retailprice) IN (
        |  SELECT floor(min(p_retailprice)) FROM qt_part
        |  GROUP BY p_type)""".stripMargin),
    QCase("subquery_in.q", "sqi12",
      """SELECT p_name FROM (SELECT p_name, p_type, p_brand AS brand
        |  FROM qt_part) fpart
        |WHERE fpart.p_type IN (SELECT p_type FROM qt_part
        |  WHERE qt_part.p_brand = fpart.brand)""".stripMargin,
      note = "correlation through a renamed derived-table column"),
    QCase("subquery_in.q", "sqi13",
      """SELECT key, count(*) AS c FROM qt_src
        |WHERE value IN (SELECT value FROM qt_src)
        |GROUP BY key
        |HAVING count(*) IN (SELECT count(*) FROM qt_src s1
        |  WHERE s1.key = '90' GROUP BY s1.key)""".stripMargin,
      note = "IN inside HAVING over an IN-filtered aggregate"),
    QCase("subquery_in.q", "sqi14",
      """SELECT * FROM qt_src WHERE key IN (
        |  SELECT p_name FROM qt_part
        |  UNION ALL
        |  SELECT p_brand FROM qt_part)""".stripMargin,
      note = "UNION ALL as the IN list"),
    QCase("subquery_in.q", "sqi15",
      """SELECT p_partkey FROM qt_part WHERE p_name IN (
        |  SELECT p.p_name FROM qt_part p
        |  LEFT OUTER JOIN qt_part pp ON p.p_type = pp.p_type
        |  WHERE pp.p_size = qt_part.p_size)""".stripMargin,
      note = "correlation INTO a joined subquery's filter"),
    QCase("subquery_in.q", "sqi16",
      """SELECT * FROM qt_part WHERE p_size IN (
        |  SELECT count(*) FROM qt_part pp
        |  WHERE pp.p_type = qt_part.p_type)""".stripMargin,
      note = "correlated COUNT: implicit-group agg"),

    QCase("subquery_in.q", "sqi17",
      """SELECT count(*) AS c FROM qt_src
        |GROUP BY qt_src.key IN (SELECT key FROM qt_src s1
        |  WHERE s1.key > '9')""".stripMargin,
      note = "the reference REFUSES grouping by an IN subquery " +
        "(clientnegative subquery_in_groupby.q); this engine computes the " +
        "well-defined superset and DuckDB agrees — documented divergence"),

    // --------------------------------------------------- subquery_notin.q
    QCase("subquery_notin.q", "sqn1",
      """SELECT p_mfgr, b.p_name, p_size FROM qt_part b
        |WHERE b.p_name NOT IN (
        |  SELECT p_name FROM (
        |    SELECT p_mfgr, p_name, p_size, rank() OVER (
        |      PARTITION BY p_mfgr ORDER BY p_size) AS r FROM qt_part) a
        |  WHERE r <= 2 AND b.p_mfgr = a.p_mfgr)""".stripMargin,
      note = "correlated NOT IN over a windowed subquery"),
    QCase("subquery_notin.q", "sqn2",
      """SELECT p_name, p_size FROM qt_part
        |WHERE qt_part.p_size NOT IN (
        |  SELECT avg(p_size) FROM (
        |    SELECT p_size, rank() OVER (PARTITION BY p_mfgr
        |      ORDER BY p_size) AS r FROM qt_part) a
        |  WHERE r <= 2)""".stripMargin),
    QCase("subquery_notin.q", "sqn3",
      """SELECT p_mfgr, p_name, p_size FROM qt_part b
        |WHERE b.p_size NOT IN (
        |  SELECT min(p_size) FROM (
        |    SELECT p_mfgr, p_size, rank() OVER (PARTITION BY p_mfgr
        |      ORDER BY p_size) AS r FROM qt_part) a
        |  WHERE r <= 2 AND b.p_mfgr = a.p_mfgr)""".stripMargin),
    QCase("subquery_notin.q", "sqn4",
      """SELECT * FROM qt_part WHERE p_size NOT IN (
        |  SELECT count(*) FROM qt_part pp
        |  WHERE pp.p_type = qt_part.p_type)""".stripMargin),
    QCase("subquery_notin.q", "sqn5",
      "SELECT p_name FROM qt_pnull WHERE p_name NOT IN " +
        "(SELECT p_name FROM qt_pnull)",
      note = "a NULL in the NOT IN list empties the result — the " +
        "three-valued-logic pin"),
    QCase("subquery_notin.q", "sqn6",
      """SELECT * FROM qt_tnull WHERE i NOT IN
        |  (SELECT CAST(c AS INT) FROM qt_tempty)""".stripMargin,
      note = "NOT IN an EMPTY list keeps every row, NULL probes included " +
        "(the .q's tempty(i); qt_tempty's column is c, cast to the probe " +
        "type — an uncast bare `i` would resolve as a CORRELATED outer " +
        "ref instead, a different query)"),
    QCase("subquery_notin.q", "sqn7",
      """SELECT count(*) AS c FROM qt_part WHERE p_size NOT IN
        |  (SELECT i FROM qt_tnull)""".stripMargin,
      note = "NOT IN an all-NULL list is never true: count 0"))

  test("qtest conformance: subquery_in deep cases (windowed lists, " +
      "correlated aggregates, expression keys, HAVING-IN, union lists)") {
    run("subquery_in")
  }
  test("qtest conformance: subquery_notin deep cases (correlated NOT IN, " +
      "three-valued NULL semantics)") {
    run("subquery_notin")
  }
}
