package graft

/** Conformance wave: the reference's `view*.q` family — ref ql/src/test/
  * queries/clientpositive/view.q, view_alias.q (expected column names
  * and rows from results/clientpositive/llap/view_alias.q.out).
  *
  * The wave's finding: Hive auto-names a view's unaliased expression
  * columns `_c<position>` where Spark stores the pretty-printed
  * expression text — fixed front-door by
  * [[graft.plans.ViewColumnNames]]. These run outside [[QtestHarness]]
  * (they exercise the catalog, not a SELECT's rows).
  */
class QtestViewSpec extends SparkSpec {

  import QtestHarness.haveRef

  private def withView(ddl: String)(body: => Unit): Unit = {
    Engine.sql(spark, sfDir, "DROP VIEW IF EXISTS v_n6")
    Engine.sql(spark, sfDir, ddl)
    try body
    finally Engine.sql(spark, sfDir, "DROP VIEW IF EXISTS v_n6")
  }

  test("view_alias.q: unaliased expression columns name _c<position>; " +
      "Hive queries addressing them resolve") {
    assume(haveRef); QtestHarness.fixtures
    withView("create temporary view v_n6 as select 10 - key, '12' from qt_src") {
      assert(spark.table("v_n6").columns.toSeq === Seq("_c0", "_c1"))
      val r = Engine.sql(spark, sfDir,
        "select * from v_n6 order by `_c0`, `_c1` limit 5").collect()
      assert(r.length === 5)
      assert(r.map(_.getDouble(0)).toSeq === Seq(-488.0, -488.0, -488.0,
        -487.0, -486.0)) // view_alias.q.out (kv1's key 498 appears thrice)
    }
  }

  test("view_alias.q: star plus trailing literal -> source names then _c2") {
    assume(haveRef); QtestHarness.fixtures
    withView("create temporary view v_n6 as select *, '12' from qt_src") {
      assert(spark.table("v_n6").columns.toSeq === Seq("key", "value", "_c2"))
      assert(Engine.sql(spark, sfDir,
        "select * from v_n6 order by key, value, `_c2` limit 5")
        .count() === 5)
    }
    // explicit aliases keep their spelling, even _-prefixed exotic ones
    withView("create temporary view v_n6 as select *, '12' as `_c121` from qt_src") {
      assert(spark.table("v_n6").columns.toSeq ===
        Seq("key", "value", "_c121"))
    }
  }

  test("view_alias.q: aggregate views name the unaliased count _c1; " +
      "internal-looking aliases regenerate from the source column") {
    assume(haveRef); QtestHarness.fixtures
    withView("create temporary view v_n6 as select key, count(*) from qt_src group by key") {
      assert(spark.table("v_n6").columns.toSeq === Seq("key", "_c1"))
      assert(Engine.sql(spark, sfDir,
        "select * from v_n6 order by key, `_c1` limit 5").count() === 5)
    }
    // `key as _c1` is an INTERNAL-pattern alias: Hive restores the source
    // column's own name and the literal takes _c1 (view_alias.q.out)
    withView("create temporary view v_n6 as select key as `_c1`, '12' from qt_src") {
      assert(spark.table("v_n6").columns.toSeq === Seq("key", "_c1"))
    }
  }

  test("view.q shapes: a view over a view, a union view, and an ORDER " +
      "BY-carrying view all read back") {
    assume(haveRef); QtestHarness.fixtures
    Engine.sql(spark, sfDir, "DROP VIEW IF EXISTS vv2")
    Engine.sql(spark, sfDir, "DROP VIEW IF EXISTS vv1")
    Engine.sql(spark, sfDir,
      "create temporary view vv1 as select key, value from qt_src where key = '5'")
    Engine.sql(spark, sfDir,
      "create temporary view vv2 as select value from vv1 union all select value from vv1")
    try {
      assert(spark.table("vv1").count() === 3)
      assert(spark.table("vv2").count() === 6)
      Engine.sql(spark, sfDir, "DROP VIEW IF EXISTS vv3")
      Engine.sql(spark, sfDir,
        "create temporary view vv3 as select key from qt_src order by key limit 4")
      assert(spark.table("vv3").count() === 4)
      Engine.sql(spark, sfDir, "DROP VIEW vv3")
    } finally {
      Engine.sql(spark, sfDir, "DROP VIEW IF EXISTS vv2")
      Engine.sql(spark, sfDir, "DROP VIEW IF EXISTS vv1")
    }
  }
}
