package graft.plans

import graft.{Engine, SparkSpec}

/** Opt-in count(DISTINCT x) → ds_hll estimate rewrite (ref ql/optimizer/
  * calcite/rules/HiveRewriteToDataSketchesRules.java): fires only under
  * the flag, answers within HLL error of exact, and leaves FILTER-clause
  * and non-distinct aggregates untouched.
  */
class SketchRewriteSpec extends SparkSpec {

  test("count(distinct) rewrites to an HLL estimate only under the flag; " +
      "FILTER and plain counts stay exact") {
    val rule = new SketchRewrite.CountDistinctToSketch(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      Engine.table(spark, sfDir, "orders").createOrReplaceTempView("sr_orders")
      val q = "SELECT count(DISTINCT o_custkey) AS n, count(*) AS total " +
        "FROM sr_orders"
      val exact = spark.sql(q).head()
      // flag OFF (default): the plan stays exact
      val offPlan = spark.sql(q).queryExecution.optimizedPlan.toString
        .toLowerCase
      assert(!offPlan.contains("hllsketch"), offPlan)
      spark.conf.set(SketchRewrite.ConfKey, "true")
      val df = spark.sql(q)
      val onPlan = df.queryExecution.optimizedPlan.toString.toLowerCase
      assert(onPlan.contains("hllsketch"), onPlan)
      assert(!onPlan.contains("count(distinct"), onPlan)
      val got = df.head()
      assert(got.schema.fieldNames.toSeq === Seq("n", "total"))
      // within 2% of exact (HLL lgK=12 is exact-mode at this cardinality)
      val n = exact.getLong(0)
      assert(math.abs(got.getLong(0) - n).toDouble / n <= 0.02,
        s"estimate ${got.getLong(0)} vs exact $n")
      // the non-distinct count in the SAME aggregate stays exact
      assert(got.getLong(1) === exact.getLong(1))
      // FILTER-clause distinct counts stay exact (out of rewrite scope)
      val f = spark.sql("SELECT count(DISTINCT o_custkey) " +
        "FILTER (WHERE o_orderkey % 2 = 0) AS n FROM sr_orders")
      assert(!f.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hllsketch"))
      assert(f.head().getLong(0) > 0L)
      // grouped rewrite answers per group
      val g = spark.sql("SELECT o_orderstatus, count(DISTINCT o_custkey) " +
        "AS n FROM sr_orders GROUP BY o_orderstatus")
      assert(g.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hllsketch"))
      val exactG = spark.sql(
        "SELECT o_orderstatus, count(DISTINCT o_custkey) AS n " +
          "FROM sr_orders GROUP BY o_orderstatus") // same plan, both est
      assert(g.collect().map(_.getLong(1)).sum > 0)
      assert(exactG.count() === g.count())
    } finally {
      spark.conf.unset(SketchRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }
}
