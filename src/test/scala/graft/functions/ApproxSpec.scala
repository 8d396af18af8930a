package graft.functions

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

/** Approximate aggregates: engine-specific algorithms, so verified against
  * exact computations with tolerance rather than the DuckDB oracle.
  */
class ApproxSpec extends SparkSpec {

  private lazy val li = Engine.table(spark, sfDir, "lineitem")

  test("approx_count_distinct within 5% of exact") {
    import spark.implicits._
    val exact = li.select(countDistinct($"l_partkey")).head().getLong(0)
    val approx = li.select(approx_count_distinct($"l_partkey")).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("percentile_approx brackets the exact median") {
    import spark.implicits._
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).head().getDouble(0)
    val approx = li.select(percentile_approx($"l_quantity", lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) <= 1.0)
  }

  test("histogram_numeric produces ordered centroids covering the range") {
    import spark.implicits._
    val hist = li.select(expr("histogram_numeric(l_quantity, 5)").as("h"))
      .selectExpr("explode(h) AS b").selectExpr("b.x AS x", "b.y AS y")
      .orderBy($"x").collect()
    assert(hist.length === 5)
    val xs = hist.map(_.getDouble(0))
    assert(xs.zip(xs.tail).forall { case (a, b) => a < b })
    assert(xs.head >= 1.0 && xs.last <= 50.0)
    assert(hist.map(_.getDouble(1)).sum === li.count().toDouble)
  }

  test("kll_quantile sketch brackets the exact quantile") {
    HiveFunctions.registerAll(spark)
    Engine.register(spark, sfDir)
    val approx = spark.sql(
      "SELECT kll_quantile(l_extendedprice, 0.5) AS v FROM lineitem")
      .head().getDouble(0)
    val exact = spark.sql(
      "SELECT percentile(l_extendedprice, 0.5) AS v FROM lineitem")
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("theta_count_distinct estimates distinct keys") {
    HiveFunctions.registerAll(spark)
    Engine.register(spark, sfDir)
    val approx = spark.sql(
      "SELECT theta_count_distinct(CAST(l_partkey AS STRING)) AS v FROM lineitem")
      .head().getLong(0)
    val exact = spark.sql("SELECT count(DISTINCT l_partkey) FROM lineitem")
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("bloom_filter false-positive rate stays near design point") {
    HiveFunctions.registerAll(spark)
    Engine.register(spark, sfDir)
    val fpr = spark.sql(
      """SELECT CAST(avg(CASE WHEN in_bloom_filter(o_orderkey + 5000000,
        |  (SELECT bloom_filter(o_orderkey, 3000, 131072) FROM orders))
        |  THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS fpr FROM orders""".stripMargin)
      .head().getDouble(0)
    assert(fpr < 0.05)
  }
}
