package graft

/** Conformance wave: the reference's `udf_array_*.q` collection-function
  * files — ref ql/src/test/queries/clientpositive/udf_array_{append,
  * compact,distinct,except,intersect,join,max,min,position,remove,slice,
  * union}.q, expected cells transcribed from results/clientpositive/llap.
  *
  * Porting rules: arrays render through `to_json` (matches the
  * reference's bracket/quote rendering exactly); decimal-literal arrays
  * go through `transform(x -> CAST(x AS DOUBLE))` first — Hive prints
  * decimals with trailing zeros stripped where Spark's JSON keeps the
  * declared scale, and the VALUES are what these cases pin. DuckDB's
  * list functions differ in both naming and null semantics, so the
  * whole family is .q.out-pinned (duck = Some("")).
  *
  * Divergences this wave surfaced (fixed in HiveFunctions):
  * `array_slice` has a 0-BASED start (Spark's slice is 1-based, name
  * unregistered); `array_join` answers NULL for an EMPTY array (Spark:
  * '') and accepts non-string element types.
  */
class QtestArrayFnSpec extends QtestHarness {

  private def h(file: String, name: String, sql: String,
      expected: Seq[String], note: String = "") =
    QCase(file, name, sql, duck = Some(""), hive = Some(expected),
      note = note)

  private val ints = "array(1, 2, 3, null,3,4)"
  private val decs = "transform(array(1.12, 2.23, 3.34, null,1.11,1.12,2.9), x -> CAST(x AS DOUBLE))"
  private val bigs = "array(11234567890, 2234567890, 334567890, null, 11234567890, 2234567890, 334567890, null)"
  private val nested = """array(array("a","b","c","d"),array("a","b","c","d"),array("a","b","c","d","e"),null,array("e","a","b","c","d"))"""

  protected val qcases: Seq[QCase] = Seq(
    h("udf_array_append.q", "app1",
      s"SELECT to_json(array_append($ints, 3)), " +
        s"to_json(array_append(array(1, 2, 3), CAST(null AS int))), " +
        s"to_json(array_append($decs, CAST(1.12 AS DOUBLE)))",
      Seq("[1,2,3,null,3,4,3]", "[1,2,3,null]",
        "[1.12,2.23,3.34,null,1.11,1.12,2.9,1.12]")),
    h("udf_array_append.q", "app2",
      s"""SELECT to_json(array_append($nested, array("a","b","c","d"))), """ +
        """to_json(array_append(array("aa","bb","cc"),"cc"))""",
      Seq("""[["a","b","c","d"],["a","b","c","d"],["a","b","c","d","e"],null,["e","a","b","c","d"],["a","b","c","d"]]""",
        """["aa","bb","cc","cc"]""")),

    h("udf_array_compact.q", "cmp1",
      s"SELECT to_json(array_compact($ints)), to_json(array_compact(array())), " +
        s"to_json(array_compact(array(null))), to_json(array_compact($decs))",
      Seq("[1,2,3,3,4]", "[]", "[]", "[1.12,2.23,3.34,1.11,1.12,2.9]"),
      note = "compact drops nulls, keeps duplicates and order"),
    h("udf_array_compact.q", "cmp2",
      s"SELECT to_json(array_compact($nested))",
      Seq("""[["a","b","c","d"],["a","b","c","d"],["a","b","c","d","e"],["e","a","b","c","d"]]""")),

    h("udf_array_distinct.q", "dst1",
      s"SELECT to_json(array_distinct($ints)), " +
        s"to_json(array_distinct(array(null))), to_json(array_distinct($decs))",
      Seq("[1,2,3,null,4]", "[null]", "[1.12,2.23,3.34,null,1.11,2.9]"),
      note = "distinct keeps ONE null and first-occurrence order"),
    h("udf_array_distinct.q", "dst2",
      s"SELECT to_json(array_distinct($nested)), to_json(array_distinct($bigs))",
      Seq("""[["a","b","c","d"],["a","b","c","d","e"],null,["e","a","b","c","d"]]""",
        "[11234567890,2234567890,334567890,null]")),

    h("udf_array_except.q", "exc1",
      s"SELECT to_json(array_except($ints, array(1, 3, null))), " +
        s"to_json(array_except(array(), array())), " +
        s"to_json(array_except(array(null), array(null))), " +
        s"to_json(array_except($decs, transform(array(1.12,3.34,1.11,1.12), x -> CAST(x AS DOUBLE))))",
      Seq("[2,4]", "[]", "[]", "[2.23,null,2.9]"),
      note = "except dedups and treats null as a matchable value"),
    h("udf_array_except.q", "exc2",
      s"""SELECT to_json(array_except($nested, array(array("a","b","c","d"),array("a","b","c","d"),array("a","b","c","d","e"),null)))""",
      Seq("""[["e","a","b","c","d"]]""")),

    h("udf_array_intersect.q", "int1",
      s"SELECT to_json(array_intersect($ints, array(1, 3, null))), " +
        s"to_json(array_intersect(array(null), array(null))), " +
        s"to_json(array_intersect($decs, transform(array(1.12,3.34,1.11,1.12), x -> CAST(x AS DOUBLE))))",
      Seq("[1,3,null]", "[null]", "[1.12,3.34,1.11]")),
    h("udf_array_intersect.q", "int2",
      s"""SELECT to_json(array_intersect($nested, array(array("a","b","c","d"),array("a","b","c","d"),array("a","b","c","d","e"),null)))""",
      Seq("""[["a","b","c","d"],["a","b","c","d","e"],null]""")),

    h("udf_array_union.q", "uni1",
      s"SELECT to_json(array_union($ints, array(1, 3, null))), " +
        s"to_json(array_union(array(null), array(null))), " +
        s"to_json(array_union($decs, transform(array(1.12,3.34,1.11,1.12), x -> CAST(x AS DOUBLE))))",
      Seq("[1,2,3,null,4]", "[null]", "[1.12,2.23,3.34,null,1.11,2.9]")),
    h("udf_array_union.q", "uni2",
      s"""SELECT to_json(array_union($nested, array(array("a","b","c","d"),array("a","b","c","d"),array("a","b","c","d","e"),null)))""",
      Seq("""[["a","b","c","d"],["a","b","c","d","e"],null,["e","a","b","c","d"]]""")),

    h("udf_array_remove.q", "rem1",
      s"SELECT to_json(array_remove($ints, 3)), " +
        s"to_json(array_remove(array(1, 2, 3), 5)), " +
        s"to_json(array_remove($decs, CAST(1.12 AS DOUBLE)))",
      Seq("[1,2,null,4]", "[1,2,3]", "[2.23,3.34,null,1.11,2.9]"),
      note = "remove drops EVERY occurrence but keeps nulls"),
    h("udf_array_remove.q", "rem2",
      s"""SELECT to_json(array_remove($nested, array("a","b","c","d")))""",
      Seq("""[["a","b","c","d","e"],null,["e","a","b","c","d"]]""")),

    h("udf_array_position.q", "pos1",
      s"SELECT array_position($ints, 3), " +
        s"array_position(array(1, 2, 3), 5), " +
        s"array_position(array(1, 2, 3), CAST(null AS int)), " +
        s"array_position($decs, CAST(1.12 AS DOUBLE))",
      Seq("3", "0", "NULL", "1"),
      note = "1-based; 0 when absent; NULL element -> NULL"),

    h("udf_array_slice.q", "slc1",
      s"SELECT to_json(array_slice($ints,2,2)), " +
        s"to_json(array_slice(array(),1,1)), " +
        s"to_json(array_slice(array(null),1,1)), " +
        s"to_json(array_slice($decs,3,2)), " +
        s"to_json(array_slice($bigs,2,1))",
      Seq("[3,null]", "[]", "[]", "[null,1.11]", "[334567890]"),
      note = "Hive's start is 0-BASED (the wave's finding — Spark slice " +
        "is 1-based)"),
    h("udf_array_slice.q", "slc2",
      s"SELECT to_json(array_slice($nested,2,2))",
      Seq("""[["a","b","c","d","e"],null]""")),

    h("udf_array_max.q", "max1",
      "SELECT array_max(array(1, 2, 3, null)), array_max(array(null)), " +
        "array_max(array(1.12, 2.23, 3.34, null)), " +
        "array_max(array(1.1234567890, 2.234567890, 3.34567890, null)), " +
        "array_max(array(11234567890, 2234567890, 334567890, null))",
      Seq("3", "NULL", "3.34", "3.345678900", "11234567890")),
    h("udf_array_min.q", "min1",
      "SELECT array_min(array(1, 2, 3, null)), array_min(array(null)), " +
        "array_min(array(1.12, 2.23, 3.34, null)), " +
        "array_min(array(1.1234567890, 2.234567890, 3.34567890, null)), " +
        "array_min(array(11234567890, 2234567890, 334567890, null))",
      Seq("1", "NULL", "1.12", "1.123456789", "334567890")),

    h("udf_array_join.q", "joi1",
      s"SELECT array_join($ints,','), " +
        "array_join(array(),':'), " +
        "array_join(array(null),','), " +
        s"array_join($decs,',',':')",
      Seq("1,2,3,3,4", "NULL", "", "1.12,2.23,3.34,:,1.11,1.12,2.9"),
      note = "EMPTY array -> NULL (the wave's finding — Spark answers " +
        "''); bare nulls drop, replacement substitutes"),
    h("udf_array_join.q", "joi2",
      s"SELECT array_join($bigs,',',':'), array_join($nested,',',':')",
      Seq("11234567890,2234567890,334567890,:,11234567890,2234567890,334567890,:",
        "[a, b, c, d],[a, b, c, d],[a, b, c, d, e],:,[e, a, b, c, d]"),
      note = "non-string elements render via their string cast"))

  test("qtest conformance: udf_array_* collection functions (append/" +
      "compact/distinct/except/intersect/union/remove/position/slice/" +
      "max/min/join)") {
    run("udf_array_")
  }
}
