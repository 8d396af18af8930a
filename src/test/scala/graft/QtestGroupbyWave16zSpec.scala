package graft

/** Conformance wave 16z: the groupby corpus remainder — COMPLEX-TYPED
  * grouping keys (array/map/struct; Spark 4 normalizes MAP keys
  * natively via InsertMapSortInGroupingExpressions — the r16
  * hand-rolled canonicalization was removed in r17 as redundant),
  * string-coerced aggregation, and
  * count(DISTINCT)-per-key shapes (ref ql/src/test/queries/
  * clientpositive/groupby_complex_types.q, groupby5.q, groupby8.q,
  * groupby11.q, groupby12.q). The complex-key cases project the key
  * back to scalars so both engines render comparably; grouping by a
  * one-entry map/array/struct of (key, value) is definitionally the
  * same partition as grouping by the pair, which is what the DuckDB
  * twin does.
  */
class QtestGroupbyWave16zSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("groupby_complex_types.q", "z01",
      "SELECT element_at(k, 1) AS kk, c FROM (SELECT ARRAY(key) AS " +
        "k, COUNT(1) AS c FROM qt_src GROUP BY ARRAY(key)) t",
      duck = Some("SELECT key AS kk, count(1) AS c FROM qt_src " +
        "GROUP BY key"),
      note = "grouping by a singleton array partitions like the " +
        "element"),
    QCase("groupby_complex_types.q", "z02",
      "SELECT element_at(map_keys(m), 1) AS kk, " +
        "element_at(map_values(m), 1) AS vv, c FROM (SELECT " +
        "MAP(key, value) AS m, COUNT(1) AS c FROM qt_src GROUP BY " +
        "MAP(key, value)) t",
      duck = Some("SELECT key AS kk, value AS vv, count(1) AS c " +
        "FROM qt_src GROUP BY key, value"),
      note = "GROUP BY a MAP key — Spark 4 normalizes the key " +
        "natively (InsertMapSortInGroupingExpressions)"),
    QCase("groupby_complex_types.q", "z03",
      "SELECT t.s.col1 AS kk, t.s.col2 AS vv, c FROM (SELECT " +
        "STRUCT(key AS col1, value AS col2) AS s, COUNT(1) AS c " +
        "FROM qt_src GROUP BY STRUCT(key AS col1, value AS col2)) t",
      duck = Some("SELECT key AS kk, value AS vv, count(1) AS c " +
        "FROM qt_src GROUP BY key, value"),
      note = "struct keys group by field-wise equality"),
    QCase("groupby5.q", "z04",
      "SELECT cast(key as int) AS k, sum(substr(value, 5)) AS s " +
        "FROM qt_src GROUP BY key",
      duck = Some("SELECT CAST(key AS int) AS k, sum(CAST(" +
        "substr(value, 5) AS double)) AS s FROM qt_src GROUP BY key"),
      note = "sum over the NUMERIC TAIL of 'val_NNN' coerces " +
        "string->double implicitly (DuckDB needs the cast spelled)"),
    QCase("groupby8.q", "z05",
      "SELECT cast(key as int) AS k, COUNT(DISTINCT substr(value, " +
        "5)) AS c FROM qt_src GROUP BY key",
      note = "per-key distinct count over a computed expression"),
    QCase("groupby11.q", "z06",
      "SELECT value, count(key) AS c1, count(distinct key) AS c2 " +
        "FROM qt_src GROUP BY value",
      note = "plain and distinct counts side by side, grouped on the " +
        "non-key column"),
    QCase("groupby12.q", "z07",
      "SELECT COUNT(key) AS c1, COUNT(DISTINCT value) AS c2 FROM " +
        "qt_src GROUP BY key",
      note = "grouping column ABSENT from the select list"))

  test("qtest conformance wave 16z: groupby remainder (complex-typed " +
      "keys incl. the map-grouping gap, string-coerced sums, distinct " +
      "counts)") {
    run("groupby_complex_types", "groupby5", "groupby8", "groupby11",
      "groupby12")
  }
}
