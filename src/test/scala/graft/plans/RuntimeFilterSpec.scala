package graft.plans

import graft.SparkSpec

/** Runtime bloom-filter join pruning — the Catalyst analog of Hive's dynamic
  * semijoin reduction (ref ql/src/java/org/apache/hadoop/hive/ql/ppd/ and
  * hive.tez.dynamic.semijoin.reduction): a selective dim-side predicate
  * builds a bloom filter that is applied to the fact side BEFORE its shuffle,
  * so at 100 TB the fact exchange carries only rows that can possibly join.
  *
  * Size thresholds are left at Spark defaults in the engine (fact scans
  * ≥10GB apply the filter — local toy data never qualifies), so the spec
  * lowers them to prove the wiring.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("engine sessions enable runtime bloom-filter injection") {
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
  }

  test("selective dim filter injects might_contain onto the fact side of a shuffle join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rf_").toString
    spark.range(100000)
      .selectExpr("id AS f_key", "id % 97 AS f_val")
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(1000)
      .selectExpr("id AS d_key", "id % 10 AS d_cat")
      .write.mode("overwrite").parquet(s"$dir/dim")
    withConf(
      // local data is KB-sized; drop the fact-scan floor so the rule fires
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join — bloom reduction targets the pre-exchange scan
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"d_cat" === 3)
      val joined = fact.join(dim, $"f_key" === $"d_key")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected:\n${optimized.take(2000)}")
      // and the filter lands on the fact side, not the dim side
      assert(joined.count() == 100) // d_cat==3 -> 100 dim keys, 1:1 with fact
    }
  }

  test("without a selective dim predicate no filter is injected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rf2_").toString
    spark.range(10000).selectExpr("id AS f_key")
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(1000).selectExpr("id AS d_key")
      .write.mode("overwrite").parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      val joined = fact.join(dim, $"f_key" === $"d_key")
      assert(!joined.queryExecution.optimizedPlan.toString
        .contains("might_contain"))
    }
  }
}
