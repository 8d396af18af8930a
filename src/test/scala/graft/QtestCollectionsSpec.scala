package graft

/** Qtest conformance, collection-function family: `str_to_map.q`,
  * `udf_sort_array.q`, `udf_map_keys.q`, `udf_array_contains.q`,
  * `udf_size.q`, `udf_concat_ws.q`, `udf_split.q`. Array/map CELLS render
  * differently per engine, so ports project SCALAR extracts (an index, a
  * concat_ws join, a size) — the values, not the rendering, are the
  * contract. DuckDB respells: list_sort/array_to_string/list_contains/
  * map{[k],[v]} syntax; functions DuckDB lacks outright (str_to_map) or
  * disagrees on by design (size(NULL) = Hive's -1) gate on transcribed
  * .q.out rows.
  */
class QtestCollectionsSpec extends QtestHarness {

  protected val qcases: Seq[QCase] = Seq(

    QCase("str_to_map.q", "s2m1",
      "SELECT str_to_map('a=1,b=2,c=3', ',', '=')['a'] AS x",
      duck = Some(""),
      hive = Some(Seq("1")),
      note = "explicit pair/kv delimiters (str_to_map.q.out rows '1')"),
    QCase("str_to_map.q", "s2m2",
      "SELECT str_to_map('a:1,b:2,c:3')['b'] AS x",
      duck = Some(""),
      hive = Some(Seq("2")),
      note = "default delimiters are ',' and ':'"),
    QCase("str_to_map.q", "s2m3",
      "SELECT str_to_map('ABC=CC_333=444', '_', '=')['333'] AS x",
      duck = Some(""),
      hive = Some(Seq("444")),
      note = "the tbl_s2m case as a constant"),

    QCase("udf_sort_array.q", "sa1",
      "SELECT concat_ws(',', sort_array(array('b', 'd', 'c', 'a'))) AS x, " +
        "concat_ws(',', sort_array(array('f', 'a', 'g', 'c', 'b'))) AS y",
      duck = Some("SELECT array_to_string(list_sort(['b','d','c','a']), " +
        "',') AS x, array_to_string(list_sort(['f','a','g','c','b']), " +
        "',') AS y")),
    QCase("udf_sort_array.q", "sa2",
      "SELECT concat_ws(',', CAST(sort_array(array(2, 9, 7, 3, 5, 4, 1, " +
        "6, 8)) AS ARRAY<STRING>)) AS x",
      duck = Some("SELECT array_to_string(list_sort([2,9,7,3,5,4,1,6,8])" +
        ", ',') AS x"),
      note = "numeric sort; elements stringified for the joined render"),
    QCase("udf_sort_array.q", "sa3",
      "SELECT sort_array(array(2.333, 9.0, 1.325, 0.777, -3.445))[0] " +
        "AS lo, sort_array(array(2.333, 9.0, 1.325, 0.777, -3.445))[4] " +
        "AS hi",
      duck = Some("SELECT list_sort([2.333,9.0,1.325,0.777,-3.445])[1] " +
        "AS lo, list_sort([2.333,9.0,1.325,0.777,-3.445])[5] AS hi"),
      note = "Hive/Spark arrays index from 0, DuckDB lists from 1"),

    QCase("udf_map_keys.q", "mk1",
      "SELECT concat_ws(',', sort_array(map_keys(map('a', 1, 'b', 2, " +
        "'c', 3)))) AS ks, concat_ws(',', CAST(sort_array(map_values(" +
        "map('a', 1, 'b', 2, 'c', 3))) AS ARRAY<STRING>)) AS vs",
      duck = Some("SELECT array_to_string(list_sort(map_keys(" +
        "map(['a','b','c'], [1,2,3]))), ',') AS ks, array_to_string(" +
        "list_sort(map_values(map(['a','b','c'], [1,2,3]))), ',') AS vs")),

    QCase("udf_array_contains.q", "ac1",
      "SELECT array_contains(array(1, 2, 3), 1) AS a, " +
        "array_contains(array(1, 2, 3), 5) AS b, " +
        "array_contains(array(array(1, 2), array(2, 3)), array(1, 2)) AS c",
      duck = Some("SELECT list_contains([1,2,3], 1) AS a, " +
        "list_contains([1,2,3], 5) AS b, " +
        "list_contains([[1,2],[2,3]], [1,2]) AS c")),

    QCase("udf_size.q", "sz1",
      "SELECT size(array(1, 2, 3)) AS a, size(map('a', 1, 'b', 2)) AS b, " +
        "size(CAST(NULL AS ARRAY<INT>)) AS c",
      duck = Some(""),
      hive = Some(Seq("3", "2", "-1")),
      note = "size(NULL) = -1 is Hive's contract (udf_size.q.out's " +
        "trailing -1); DuckDB len(NULL) answers NULL by design"),

    QCase("udf_concat_ws.q", "cw1",
      "SELECT concat_ws(',', 'abc', 'xyz', '8675309') AS a, " +
        "concat_ws('**', 'abc', CAST(NULL AS STRING), '8675309') AS b",
      note = "NULL ARGUMENTS are skipped (both engines)"),
    QCase("udf_concat_ws.q", "cw2",
      "SELECT concat_ws(CAST(NULL AS STRING), 'abc', 'xyz') AS a",
      duck = Some(""),
      hive = Some(Seq("NULL")),
      note = "a NULL SEPARATOR nulls the result in Hive/Spark; DuckDB " +
        "treats it as a skipped argument"),
    QCase("udf_concat_ws.q", "cw3",
      "SELECT concat_ws('.', array('www', 'face', 'book', 'com'), " +
        "'1234') AS a, concat_ws('-', 'www', array('face', 'book'), " +
        "'1234') AS b",
      duck = Some("SELECT concat_ws('.', array_to_string(" +
        "['www','face','book','com'], '.'), '1234') AS a, " +
        "concat_ws('-', 'www', array_to_string(['face','book'], '-'), " +
        "'1234') AS b"),
      note = "array arguments FLATTEN into the separator join"),

    QCase("udf_split.q", "sp1",
      "SELECT concat_ws('|', split('a b c', ' ')) AS a, " +
        "concat_ws('|', split('oneAtwoBthreeC', '[ABC]')) AS b, " +
        "concat_ws('|', split(CAST(50401020 AS STRING), '0')) AS c",
      duck = Some("SELECT array_to_string(string_split_regex('a b c', " +
        "' '), '|') AS a, array_to_string(string_split_regex(" +
        "'oneAtwoBthreeC', '[ABC]'), '|') AS b, array_to_string(" +
        "string_split_regex('50401020', '0'), '|') AS c"),
      note = "regex split incl. the numeric-argument case spelled with " +
        "the explicit CAST"))

  test("qtest conformance: collection functions (str_to_map, sort_array, " +
      "map_keys/values, array_contains, size, concat_ws, split)") {
    run("str_to_map", "udf_sort_array", "udf_map_keys",
      "udf_array_contains", "udf_size", "udf_concat_ws", "udf_split")
  }
}
