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

  test("percentile_disc rewrites to a KLL quantile under the same flag; " +
      "DESC collation and percentile_cont stay exact") {
    graft.functions.SketchAggregates.register(spark)
    val rule = new SketchRewrite.CountDistinctToSketch(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      Engine.table(spark, sfDir, "lineitem")
        .createOrReplaceTempView("sr_lineitem")
      val q = "SELECT percentile_disc(0.5) WITHIN GROUP " +
        "(ORDER BY l_quantity) AS med FROM sr_lineitem"
      val exact = spark.sql(q).head().getDouble(0)
      // flag OFF: exact plan
      assert(!spark.sql(q).queryExecution.optimizedPlan.toString
        .toLowerCase.contains("kll"))
      spark.conf.set(SketchRewrite.ConfKey, "true")
      val df = spark.sql(q)
      val onPlan = df.queryExecution.optimizedPlan.toString.toLowerCase
      assert(onPlan.contains("kll"), onPlan)
      assert(!onPlan.contains("percentile_disc"), onPlan)
      // KLL K=200 rank error ~1.65%; l_quantity is 1..50 uniform, so a
      // 2% rank slip moves the value by at most ~2
      val est = df.head().getDouble(0)
      assert(math.abs(est - exact) <= 2.0, s"est $est vs exact $exact")
      // grouped variant estimates per group, same bound
      val g = spark.sql("SELECT l_returnflag, percentile_disc(0.25) " +
        "WITHIN GROUP (ORDER BY l_quantity) AS q1 FROM sr_lineitem " +
        "GROUP BY l_returnflag")
      assert(g.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("kll"))
      val exactG = {
        spark.conf.set(SketchRewrite.ConfKey, "false")
        val rows = spark.sql("SELECT l_returnflag, percentile_disc(0.25) " +
          "WITHIN GROUP (ORDER BY l_quantity) AS q1 FROM sr_lineitem " +
          "GROUP BY l_returnflag").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        spark.conf.set(SketchRewrite.ConfKey, "true")
        rows
      }
      g.collect().foreach { r =>
        assert(math.abs(r.getDouble(1) - exactG(r.getString(0))) <= 2.0)
      }
      // DESC collation is out of the reference rule's scope: stays exact
      val desc = spark.sql("SELECT percentile_disc(0.5) WITHIN GROUP " +
        "(ORDER BY l_quantity DESC) AS med FROM sr_lineitem")
      assert(!desc.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("kll"))
      // percentile_cont is a different function: stays exact
      val cont = spark.sql("SELECT percentile_cont(0.5) WITHIN GROUP " +
        "(ORDER BY l_quantity) AS med FROM sr_lineitem")
      assert(!cont.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("kll"))
    } finally {
      spark.conf.unset(SketchRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("rank/ntile/cume_dist over an UNPARTITIONED order-by rewrite to " +
      "KLL estimates under the flag; partitioned windows stay exact") {
    graft.functions.SketchAggregates.register(spark)
    val rule = new SketchRewrite.CountDistinctToSketch(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      // the synthetic lineitem has duplicate (orderkey, linenumber) pairs;
      // a row_number id is stable across re-evaluations because rows tying
      // on the full order are exact duplicates (same l_quantity)
      Engine.table(spark, sfDir, "lineitem")
        .selectExpr("row_number() OVER (ORDER BY l_orderkey, " +
          "l_linenumber, l_quantity) AS id", "l_quantity")
        .createOrReplaceTempView("sr_li")
      val q = "SELECT id, rank() OVER (ORDER BY l_quantity) AS r, " +
        "ntile(4) OVER (ORDER BY l_quantity) AS nt, " +
        "cume_dist() OVER (ORDER BY l_quantity) AS cd FROM sr_li"
      val exact = spark.sql(q).collect()
        .map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2),
          r.getDouble(3)))).toMap
      val n = exact.size.toDouble
      spark.conf.set(SketchRewrite.ConfKey, "true")
      val df = spark.sql(q)
      val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("kll"), plan)
      // the fixture view's row_number window remains; the GLOBAL rank/
      // ntile/cume_dist window must be gone
      assert(!plan.contains("rank(") || plan.contains("ds_kll_rank"), plan)
      assert(!plan.contains("ntile(") && !plan.contains("cume_dist("),
        "the single-task window functions must be rewritten away")
      var ntAgree = 0
      df.collect().foreach { r =>
        val (er, ent, ecd) = exact(r.getInt(0))
        // KLL K=200 rank error ~1.65% of n; allow 3%
        assert(math.abs(r.getInt(1) - er) <= 0.03 * n,
          s"rank est ${r.getInt(1)} vs exact $er (n=$n)")
        assert(math.abs(r.getDouble(3) - ecd) <= 0.03,
          s"cume_dist est ${r.getDouble(3)} vs exact $ecd")
        if (r.getInt(2) == ent) ntAgree += 1
      }
      assert(ntAgree >= 0.9 * n, s"ntile agreement $ntAgree of $n")
      // exactness at tiny n (KLL stores everything): rank is EXACT, not
      // just within tolerance — this pins the inclusive-vs-exclusive
      // rank criterion (an off-by-one here is bias, not sketch error)
      val tiny = spark.sql("SELECT x, rank() OVER (ORDER BY x) AS r, " +
        "cume_dist() OVER (ORDER BY x) AS cd FROM VALUES " +
        "(10.0d), (20.0d), (20.0d), (30.0d) t(x)")
        .collect().map(r => (r.getDouble(0), r.getInt(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      assert(tiny.map(_._2).toSeq === Seq(1, 2, 2, 4), tiny.toSeq)
      assert(tiny.map(_._3).toSeq === Seq(0.25, 0.75, 0.75, 1.0))
      // NULL keys sort first (the exact window's ASC NULLS FIRST): every
      // null row ranks 1 and offsets the non-null ranks
      val withNulls = spark.sql("SELECT rank() OVER (ORDER BY x) AS r " +
        "FROM VALUES (CAST(NULL AS DOUBLE)), (1.0d), (2.0d) t(x)")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(withNulls === Seq(1, 2, 3), withNulls)
      // a PARTITIONED rank is out of the reference rule's scope
      val p = spark.sql("SELECT rank() OVER (PARTITION BY l_quantity " +
        "ORDER BY id) AS r FROM sr_li")
      assert(!p.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("kll"))
      // ... and a DESC global window too
      val d = spark.sql("SELECT rank() OVER (ORDER BY l_quantity DESC) " +
        "AS r FROM sr_li")
      assert(!d.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("kll"))
      // ... and ASC NULLS LAST: the estimate math pins nulls FIRST, so an
      // explicit nulls-last order must keep the exact window (and its
      // results — nulls rank LAST there)
      val nl = spark.sql("SELECT rank() OVER (ORDER BY x ASC NULLS LAST) " +
        "AS r FROM VALUES (CAST(NULL AS DOUBLE)), (1.0d), (2.0d) t(x)")
      assert(!nl.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("kll"))
      assert(nl.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
    } finally {
      spark.conf.unset(SketchRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }
}
