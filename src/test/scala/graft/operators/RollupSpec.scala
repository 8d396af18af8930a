package graft.operators

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class RollupSpec extends SparkSpec {

  test("pre-aggregated grouping sets match native GROUPING SETS") {
    import spark.implicits._
    val li = Engine.table(spark, sfDir, "lineitem")
    val got = Rollup.groupingSets(li,
      keys = Seq("l_returnflag", "l_linestatus"),
      sets = Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"), Seq.empty),
      aggs = Seq(
        Rollup.Agg("sq", $"l_quantity".cast(DecimalType(25, 2)), Rollup.SumAgg),
        Rollup.Agg("n", lit(1), Rollup.CountAgg),
        Rollup.Agg("mn", $"l_discount", Rollup.MinAgg),
        Rollup.Agg("mx", $"l_discount", Rollup.MaxAgg)))
      .select($"l_returnflag", $"l_linestatus",
        $"grouping_l_returnflag".as("g_rf"), $"grouping_l_linestatus".as("g_ls"),
        $"sq".cast("double").as("sq"), $"n", $"mn", $"mx")
      .orderBy($"g_rf", $"g_ls", $"l_returnflag".asc_nulls_first,
        $"l_linestatus".asc_nulls_first)
      .collect()

    li.createOrReplaceTempView("li_rollup_t")
    val want = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sq,
        |  count(*) AS n, min(l_discount) AS mn, max(l_discount) AS mx
        |FROM li_rollup_t
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      .collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("empty input: global set yields count 0, keyed sets yield no rows (native parity)") {
    import spark.implicits._
    val empty = Engine.table(spark, sfDir, "lineitem").filter(lit(false))
    val got = Rollup.groupingSets(empty,
      keys = Seq("l_returnflag"),
      sets = Seq(Seq("l_returnflag"), Seq.empty),
      aggs = Seq(Rollup.Agg("n", lit(1), Rollup.CountAgg),
        Rollup.Agg("sq", $"l_quantity", Rollup.SumAgg)))
      .collect()
    assert(got.length === 1) // only the () set emits a row
    val r = got.head
    assert(r.getAs[Long]("n") === 0L)
    assert(r.isNullAt(r.fieldIndex("sq"))) // sum over empty is NULL, like native
  }

  test("the rollup branches reuse one fine-grain aggregate exchange") {
    import spark.implicits._
    val li = Engine.table(spark, sfDir, "lineitem")
    val df = Rollup.groupingSets(li,
      keys = Seq("l_returnflag", "l_linestatus"),
      sets = Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"), Seq.empty),
      aggs = Seq(Rollup.Agg("n", lit(1), Rollup.CountAgg)))
    df.collect() // AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    // no Expand (the whole point), and the shared pre-aggregate is reused
    assert(!plan.contains("Expand"), s"unexpected Expand in:\n$plan")
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage")
      || plan.contains("ReusedQueryStage"),
      s"expected exchange reuse across rollup branches in:\n$plan")
  }
}
