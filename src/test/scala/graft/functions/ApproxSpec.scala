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

  // ds_* sketch families (ref DataSketchesFunctions.java:316-360): the
  // mergeability law — union of per-group sketches == sketch of the whole —
  // is what makes pre-aggregated distinct-count roll-ups valid at 100 TB.
  for (fam <- Seq("hll", "cpc", "theta")) {
    test(s"ds_${fam}_sketch: estimate accurate; union of partials == whole") {
      HiveFunctions.registerAll(spark)
      Engine.register(spark, sfDir)
      val est = spark.sql(
        s"""SELECT ds_${fam}_estimate(
           |  ds_${fam}_sketch(CAST(l_partkey AS STRING))) AS v
           |FROM lineitem""".stripMargin).head().getDouble(0)
      val exact = spark.sql("SELECT count(DISTINCT l_partkey) FROM lineitem")
        .head().getLong(0)
      assert(math.abs(est - exact) / exact < 0.05,
        s"$fam estimate $est vs exact $exact")
      // partials per l_returnflag, then sketch-to-sketch union: the
      // rolled-up estimate must equal the whole-data sketch's estimate
      val unioned = spark.sql(
        s"""SELECT ds_${fam}_estimate(ds_${fam}_union(sk)) AS v FROM (
           |  SELECT l_returnflag,
           |    ds_${fam}_sketch(CAST(l_partkey AS STRING)) AS sk
           |  FROM lineitem GROUP BY l_returnflag)""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(unioned - est) / math.max(est, 1.0) < 0.02,
        s"$fam union-of-partials $unioned drifted from whole-sketch $est")
    }
  }

  test("ds_kll sketch bytes: quantile/rank accuracy and union-of-partials") {
    HiveFunctions.registerAll(spark)
    Engine.register(spark, sfDir)
    val exact = spark.sql(
      "SELECT percentile(l_extendedprice, 0.9d) FROM lineitem")
      .head().getDouble(0)
    val est = spark.sql(
      """SELECT ds_kll_quantile(ds_kll_sketch(l_extendedprice), 0.9d)
        |FROM lineitem""".stripMargin).head().getDouble(0)
    assert(math.abs(est - exact) / exact < 0.05,
      s"kll p90 $est vs exact $exact")
    // rank is the quantile inverse: rank(quantile(p)) ≈ p
    val rank = spark.sql(
      s"""SELECT ds_kll_rank(ds_kll_sketch(l_extendedprice), $est)
         |FROM lineitem""".stripMargin).head().getDouble(0)
    assert(math.abs(rank - 0.9) < 0.05, s"rank($est) = $rank, expected ~0.9")
    // mergeability: union of per-group sketches tracks the whole
    val unioned = spark.sql(
      """SELECT ds_kll_quantile(ds_kll_union(sk), 0.9d) FROM (
        |  SELECT ds_kll_sketch(l_extendedprice) AS sk
        |  FROM lineitem GROUP BY l_returnflag)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(unioned - exact) / exact < 0.05,
      s"kll union-of-partials p90 $unioned vs exact $exact")
    // ds_kll_n is exact row accounting through the union
    val n = spark.sql(
      """SELECT ds_kll_n(ds_kll_union(sk)) FROM (
        |  SELECT ds_kll_sketch(l_extendedprice) AS sk
        |  FROM lineitem GROUP BY l_returnflag)""".stripMargin)
      .head().getLong(0)
    val total = spark.sql("SELECT count(*) FROM lineitem").head().getLong(0)
    assert(n === total)
  }

  test("ds_freq: exact estimates under map capacity; union; items listing") {
    HiveFunctions.registerAll(spark)
    Engine.register(spark, sfDir)
    // l_returnflag has 3 distinct values — far under the map size, so the
    // sketch never evicts and estimates are EXACT counts
    val exact = spark.sql(
      """SELECT l_returnflag, count(*) FROM lineitem
        |GROUP BY l_returnflag""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = spark.sql(
      """WITH sk AS (
        |  SELECT ds_freq_union(s) AS s FROM (
        |    SELECT ds_freq_sketch(l_returnflag) AS s
        |    FROM lineitem GROUP BY l_linestatus))
        |SELECT f.l_returnflag, ds_freq_estimate(sk.s, f.l_returnflag)
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem) f
        |CROSS JOIN sk""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === exact, "no-eviction estimates must be exact counts")
    // absent item estimates 0; items listing surfaces every flag
    val absent = spark.sql(
      """SELECT ds_freq_estimate(ds_freq_sketch(l_returnflag), 'ZZZ')
        |FROM lineitem""".stripMargin).head().getLong(0)
    assert(absent === 0L)
    val items = spark.sql(
      """SELECT ds_freq_items(ds_freq_sketch(l_returnflag))
        |FROM lineitem""".stripMargin).head().getSeq[String](0).toSet
    assert(items === exact.keySet)
  }

  test("ds_tuple: distinct-key estimate + summed summaries; union merges " +
      "same-key summaries") {
    HiveFunctions.registerAll(spark)
    Engine.register(spark, sfDir)
    // no sampling at this cardinality: estimate and sum are exact
    val exactKeys = spark.sql(
      "SELECT count(DISTINCT l_returnflag) FROM lineitem").head().getLong(0)
    val exactSum = spark.sql("SELECT sum(l_quantity) FROM lineitem")
      .head().getDouble(0)
    val r = spark.sql(
      """SELECT ds_tuple_estimate(s), ds_tuple_sum(s) FROM (
        |  SELECT ds_tuple_sketch(l_returnflag, l_quantity) AS s
        |  FROM lineitem)""".stripMargin).head()
    assert(r.getDouble(0) === exactKeys.toDouble)
    assert(r.getDouble(1) === exactSum)
    // union: the same key's summaries from different partials SUM
    val u = spark.sql(
      """SELECT ds_tuple_estimate(ds_tuple_union(s)),
        |  ds_tuple_sum(ds_tuple_union(s)) FROM (
        |  SELECT ds_tuple_sketch(l_returnflag, l_quantity) AS s
        |  FROM lineitem GROUP BY l_linestatus)""".stripMargin).head()
    assert(u.getDouble(0) === exactKeys.toDouble)
    assert(u.getDouble(1) === exactSum)
    // high-cardinality keys: estimate within sketch error of exact
    val manyExact = spark.sql(
      "SELECT count(DISTINCT l_orderkey) FROM lineitem").head().getLong(0)
    val manyEst = spark.sql(
      """SELECT ds_tuple_estimate(ds_tuple_sketch(CAST(l_orderkey AS STRING),
        |  1.0d)) FROM lineitem""".stripMargin).head().getDouble(0)
    assert(math.abs(manyEst - manyExact) / manyExact < 0.05,
      s"tuple estimate $manyEst vs exact $manyExact")
  }

  test("ds_theta set algebra: intersect and exclude against exact sets") {
    HiveFunctions.registerAll(spark)
    Engine.register(spark, sfDir)
    // partkeys seen in F-flagged rows vs O-flagged rows: the sketch
    // intersection/difference must track the exact set sizes
    val df = spark.sql(
      """SELECT
        |  ds_theta_estimate(ds_theta_intersect(sk)) AS inter,
        |  ds_theta_estimate(ds_theta_exclude(
        |    max(CASE WHEN flag = 'A' THEN sk END),
        |    max(CASE WHEN flag = 'B' THEN sk END))) AS excl
        |FROM (
        |  SELECT CASE WHEN l_returnflag = 'N' THEN 'A' ELSE 'B' END AS flag,
        |    ds_theta_sketch(CAST(l_partkey AS STRING)) AS sk
        |  FROM lineitem GROUP BY 1)""".stripMargin).head()
    val exactInter = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag <> 'N')"""
        .stripMargin).head().getLong(0)
    val exactExcl = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
        |  EXCEPT
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag <> 'N')"""
        .stripMargin).head().getLong(0)
    assert(math.abs(df.getDouble(0) - exactInter) / math.max(exactInter, 1L) < 0.1,
      s"intersect ${df.getDouble(0)} vs exact $exactInter")
    assert(math.abs(df.getDouble(1) - exactExcl) / math.max(exactExcl, 1L) < 0.1,
      s"exclude ${df.getDouble(1)} vs exact $exactExcl")
  }
}
