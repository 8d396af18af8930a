package graft.plans

import graft.{Engine, SparkSpec}

/** Pins the Hive default-null-placement front-door rewrite: NULL sorts
  * as the LARGEST value (ref HiveConf hive.default.nulls.last=true +
  * ql/util/NullOrdering.java — ASC defaults NULLS LAST, DESC defaults
  * NULLS FIRST), made explicit in the statement text before the parse.
  */
class DefaultNullOrderSpec extends SparkSpec {

  private def rw(s: String) = DefaultNullOrder.rewrite(s)

  test("bare ASC gets NULLS LAST, bare DESC gets NULLS FIRST") {
    assert(rw("select * from t order by a") ===
      "select * from t order by a NULLS LAST")
    assert(rw("select * from t order by a desc") ===
      "select * from t order by a desc NULLS FIRST")
    assert(rw("select * from t order by a asc, b desc, c") ===
      "select * from t order by a asc NULLS LAST, b desc NULLS FIRST, " +
        "c NULLS LAST")
  }

  test("explicit NULLS FIRST/LAST pass through untouched") {
    val s1 = "select * from t order by a nulls first"
    assert(rw(s1) === s1)
    val s2 = "select * from t order by a desc nulls last, b asc nulls first"
    assert(rw(s2) === s2)
  }

  test("list terminators: LIMIT / window frame / close paren") {
    assert(rw("select * from t order by a limit 5") ===
      "select * from t order by a NULLS LAST limit 5")
    assert(rw("select sum(x) over (partition by p order by y rows " +
        "between 1 preceding and current row) from t") ===
      "select sum(x) over (partition by p order by y NULLS LAST rows " +
        "between 1 preceding and current row) from t")
    assert(rw("(select x from t order by x) union all select y from u") ===
      "(select x from t order by x NULLS LAST) union all select y from u")
  }

  test("sort by, case expressions, and nested subquery items") {
    assert(rw("select * from t distribute by a sort by b desc") ===
      "select * from t distribute by a sort by b desc NULLS FIRST")
    assert(rw("select * from t order by case when a then 1 else 2 end desc") ===
      "select * from t order by case when a then 1 else 2 end desc " +
        "NULLS FIRST")
    assert(rw("select * from t order by (select max(x) from u), w") ===
      "select * from t order by (select max(x) from u) NULLS LAST, " +
        "w NULLS LAST")
  }

  test("string literals, comments and backticks are never rewritten") {
    val s = "select 'order by a' AS x from t"
    assert(rw(s) === s)
    assert(rw("select `order`, x from t order by x -- order by y\n") ===
      "select `order`, x from t order by x NULLS LAST -- order by y\n")
  }

  test("engine: bare ORDER BY places NULL rows last on ASC, first on " +
      "DESC; explicit spelling wins") {
    import spark.implicits._
    Seq(Option(2), None, Option(1)).toDF("v")
      .createOrReplaceTempView("dno_t")
    def firstCell(q: String): Option[Int] = {
      val r = Engine.sql(spark, sfDir, q).collect()
      if (r.head.isNullAt(0)) None else Some(r.head.getInt(0))
    }
    assert(firstCell("select v from dno_t order by v") === Some(1))
    assert(Engine.sql(spark, sfDir, "select v from dno_t order by v")
      .collect().last.isNullAt(0))
    assert(firstCell("select v from dno_t order by v desc") === None)
    assert(firstCell("select v from dno_t order by v nulls first") === None)
  }
}
