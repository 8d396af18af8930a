package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

/** Query results cache: repeat = hit, input change = miss, nondeterminism =
  * never cached, LRU eviction.
  */
class ResultsCacheSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("repeated query hits; results identical") {
    val data = tmp("graft_rc_data_")
    val cache = tmp("graft_rc_")
    (0 until 100).map(i => (i.toLong, i % 7)).toDF("id", "k")
      .write.parquet(s"$data/t")
    def q = spark.read.parquet(s"$data/t").groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"id").as("s"))
    val (r1, hit1) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(!hit1)
    val (r2, hit2) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(hit2)
    assert(r1.orderBy($"k").collect().toSeq === r2.orderBy($"k").collect().toSeq)
    assert(r2.count() === 7)
  }

  test("appending to the input invalidates (key shifts, no stale serve)") {
    val data = tmp("graft_rc_data_")
    val cache = tmp("graft_rc_")
    (0 until 10).map(i => (i.toLong, "a")).toDF("id", "tag")
      .write.parquet(s"$data/t")
    def q = spark.read.parquet(s"$data/t").agg(count(lit(1)).as("n"))
    val (r1, _) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(r1.head.getLong(0) === 10)
    (10 until 15).map(i => (i.toLong, "b")).toDF("id", "tag")
      .write.mode("append").parquet(s"$data/t")
    val (r2, hit2) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(!hit2, "changed input must not hit")
    assert(r2.head.getLong(0) === 15)
  }

  test("snapshot-table version bump invalidates") {
    val cache = tmp("graft_rc_")
    val t = Snapshots.create(spark, tmp("graft_rc_snap_") + "/t",
      (0 until 20).map(i => (i.toLong, i * 2.0)).toDF("id", "v"))
    def q = t.read().agg(sum($"v").as("s"))
    val (r1, h1) = ResultsCache.cachedOrRun(spark, q, cache)
    val (_, h2) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(!h1 && h2)
    t.append(Seq((100L, 1000.0)).toDF("id", "v"))
    val (r3, h3) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(!h3, "new snapshot version must not hit")
    assert(r3.head.getDouble(0) === r1.head.getDouble(0) + 1000.0)
  }

  test("plans with non-file sources decline caching (no stale KV serve)") {
    val cache = tmp("graft_rc_")
    val data = tmp("graft_rc_data_")
    val kv = tmp("graft_rc_kv_") + "/t"
    (0 until 20).map(i => (i.toLong, (i % 3).toString)).toDF("id", "sk")
      .write.parquet(s"$data/t")
    Seq(("0", "zero"), ("1", "one"), ("2", "two")).toDF("key", "value")
      .write.format("graft-kv").option("path", kv).mode("overwrite").save()
    def q = spark.read.parquet(s"$data/t")
      .join(spark.read.format("graft-kv").option("path", kv).load(),
        col("sk") === col("key"))
      .groupBy("value").agg(count(lit(1)).as("n"))
    // a KV put can't shift a parquet-file key, so such plans never cache
    val (_, hit1) = ResultsCache.cachedOrRun(spark, q, cache)
    val (r2, hit2) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(!hit1 && !hit2)
    // and the result reflects KV writes immediately
    Seq(("1", "ONE")).toDF("key", "value")
      .write.format("graft-kv").option("path", kv).mode("append").save()
    val (r3, hit3) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(!hit3)
    assert(r3.collect().map(_.getString(0)).toSet === Set("zero", "ONE", "two"))
  }

  test("non-deterministic plans are never cached") {
    val data = tmp("graft_rc_data_")
    val cache = tmp("graft_rc_")
    (0 until 10).map(i => i.toLong).toDF("id").write.parquet(s"$data/t")
    val q = spark.read.parquet(s"$data/t").select($"id", rand().as("r"))
    assert(ResultsCache.fingerprint(q).isEmpty)
    val (_, hit) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(!hit)
    val (_, hit2) = ResultsCache.cachedOrRun(spark, q, cache)
    assert(!hit2)
  }

  test("a NullType column declines caching instead of crashing the query") {
    val data = tmp("graft_rc_data_")
    val cache = tmp("graft_rc_")
    (0 until 10).map(i => i.toLong).toDF("id").write.parquet(s"$data/t")
    val q = spark.read.parquet(s"$data/t").selectExpr("id", "NULL AS note")
    assert(ResultsCache.fingerprint(q).isEmpty)
    val (r, hit) = ResultsCache.cachedOrRun(spark, q, cache) // must not throw
    assert(!hit && r.count() === 10)
  }

  test("LRU eviction keeps the cache bounded") {
    val data = tmp("graft_rc_data_")
    val cache = tmp("graft_rc_")
    (0 until 50).map(i => i.toLong).toDF("id").write.parquet(s"$data/t")
    def q(n: Int) = spark.read.parquet(s"$data/t").filter($"id" < n)
      .agg(count(lit(1)).as("n"))
    (1 to 5).foreach(n => ResultsCache.cachedOrRun(spark, q(n), cache, maxEntries = 3))
    val kept = new java.io.File(cache).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("r_"))
    assert(kept === 3, s"expected 3 cached results, found $kept")
    // most recent still hits
    val (_, hit) = ResultsCache.cachedOrRun(spark, q(5), cache, maxEntries = 3)
    assert(hit)
    // evicted one re-materializes
    val (r, hit2) = ResultsCache.cachedOrRun(spark, q(1), cache, maxEntries = 3)
    assert(!hit2 && r.head.getLong(0) === 1)
  }

  test("Engine.sql consults the cache when the session opts in") {
    val cache = tmp("graft_rc_")
    spark.conf.set("spark.graft.resultsCache.dir", cache)
    try {
      ResultsCache.resetStats()
      val a = Engine.sql(spark, sfDir,
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1")
        .collect()
      val b = Engine.sql(spark, sfDir,
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1")
        .collect()
      assert(a.toSeq === b.toSeq)
      assert(ResultsCache.stats.hits >= 1)
      // commands never cache
      Engine.sql(spark, sfDir, "SHOW TABLES")
    } finally spark.conf.unset("spark.graft.resultsCache.dir")
  }
}
