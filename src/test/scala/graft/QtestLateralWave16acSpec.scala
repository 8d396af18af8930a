package graft

/** Conformance wave 16ac: lateral-view remainder — filter pushdown
  * around LATERAL VIEW (above, below, and inside the subquery),
  * map-explode default column names with no alias list, and chained
  * explodes over nested arrays (ref ql/src/test/queries/
  * clientpositive/lateral_view_ppd.q, lateral_view_noalias.q,
  * lateral_view_explode2.q). DuckDB twins spell explode as unnest.
  */
class QtestLateralWave16acSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(
    QCase("lateral_view_ppd.q", "ac01",
      "SELECT value, myCol FROM (SELECT * FROM qt_src LATERAL VIEW " +
        "explode(array(1,2,3)) myTable AS myCol) a WHERE key='0'",
      duck = Some("SELECT value, unnest([1,2,3]) AS myCol FROM " +
        "qt_src WHERE key='0'"),
      note = "the key filter pushes below the lateral view (the .q's " +
        "PPD pin); three rows per matching source row"),
    QCase("lateral_view_ppd.q", "ac02",
      "SELECT value, myCol FROM (SELECT * FROM qt_src LATERAL VIEW " +
        "explode(array(1,2,3)) myTable AS myCol) a WHERE key='0' AND " +
        "myCol=1",
      duck = Some("SELECT value, myCol FROM (SELECT value, " +
        "unnest([1,2,3]) AS myCol FROM qt_src WHERE key='0') a " +
        "WHERE myCol=1"),
      note = "mixed filter: key pushes below the view, the generated " +
        "column's filter stays above"),
    QCase("lateral_view_ppd.q", "ac03",
      "SELECT value, myCol FROM (SELECT * FROM qt_src LATERAL VIEW " +
        "explode(array(1,2,3)) myTable AS myCol LATERAL VIEW " +
        "explode(array(1,2,3)) myTable2 AS myCol2) a WHERE key='0'",
      duck = Some("SELECT value, myCol FROM (SELECT value, " +
        "unnest([1,2,3]) AS myCol FROM qt_src WHERE key='0') b " +
        "CROSS JOIN (SELECT unnest([1,2,3]) AS myCol2) c"),
      note = "chained lateral views multiply: 3x3 rows per source " +
        "row (the DuckDB twin crosses two unnests explicitly)"),
    QCase("lateral_view_ppd.q", "ac04",
      "SELECT value, myCol FROM (SELECT * FROM qt_src LATERAL VIEW " +
        "explode(array(1,2,3)) myTable AS myCol WHERE myCol > 1) a " +
        "WHERE key='0'",
      duck = Some("SELECT value, myCol FROM (SELECT value, " +
        "unnest([1,2,3]) AS myCol FROM qt_src WHERE key='0') a " +
        "WHERE myCol > 1"),
      note = "a WHERE directly on the lateral-view clause filters " +
        "the generated column before the outer select"),
    QCase("lateral_view_noalias.q", "ac05",
      "SELECT myTab.* from (select * from qt_src limit 1) s LATERAL " +
        "VIEW explode(map('key1', 100, 'key2', 200)) myTab",
      duck = Some("SELECT * FROM (VALUES ('key1', 100), ('key2', " +
        "200)) t(key, value)"),
      note = "map explode with NO alias list: default columns are " +
        "key/value, the map's two entries in insertion order"),
    QCase("lateral_view_explode2.q", "ac06",
      "SELECT size(v1) AS n1, v2 FROM (select * from qt_src limit " +
        "1) s LATERAL VIEW explode(array(array(1,2),array(3,4))) t1 " +
        "AS v1 LATERAL VIEW explode(v1) t2 AS v2",
      duck = Some("SELECT * FROM (VALUES (2, 1), (2, 2), (2, 3), " +
        "(2, 4)) t(n1, v2)"),
      note = "the second explode consumes the first's generated " +
        "array column (projected through size() so both engines " +
        "render scalars)"))

  test("qtest conformance wave 16ac: lateral-view pushdown " +
      "placement, no-alias map explode, chained explodes") {
    run("lateral_view_ppd", "lateral_view_noalias",
      "lateral_view_explode2")
  }
}
