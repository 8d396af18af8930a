package graft

import org.scalatest.matchers.should.Matchers
import graft.sources.KvStore

/** DSv2 KV storage handler (the HBase-handler-class extension contract). */
class KvHandlerSpec extends SparkSpec with Matchers {
  import org.apache.spark.sql.functions._

  private def newTable(): String =
    java.nio.file.Files.createTempDirectory("graft_kv_").toString + "/t"

  private def write(path: String, kvs: Seq[(String, String)],
      mode: String = "append"): Unit = {
    import spark.implicits._
    kvs.toDF("key", "value").write.format("graft-kv")
      .option("path", path).mode(mode).save()
  }

  private def read(path: String) =
    spark.read.format("graft-kv").option("path", path).load()

  test("write/read round trip with put (upsert) semantics") {
    val path = newTable()
    write(path, Seq("a" -> "1", "b" -> "2", "c" -> "3"))
    write(path, Seq("b" -> "20", "d" -> "4")) // second batch overwrites b
    val got = read(path).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    got shouldBe Map("a" -> "1", "b" -> "20", "c" -> "3", "d" -> "4")
  }

  test("point lookups push down and prune to the owning buckets") {
    val path = newTable()
    write(path, (1 to 200).map(i => s"k$i" -> s"v$i"))
    val q = read(path).where(col("key") === "k42")
    q.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe Seq(("k42", "v42"))
    val plan = q.queryExecution.executedPlan.toString
    plan should include("buckets=1/8") // pruned to the key's owning bucket
    plan should include("keys=1")
    // IN list prunes to <= |keys| buckets
    val q2 = read(path).where(col("key").isin("k1", "k2", "k3"))
    q2.collect().length shouldBe 3
    val m = "buckets=(\\d)/8".r.findFirstMatchIn(
      q2.queryExecution.executedPlan.toString).map(_.group(1).toInt)
    m.get should be <= 3
  }

  test("full scans read one partition per bucket (parallelism contract)") {
    val path = newTable()
    write(path, (1 to 100).map(i => s"k$i" -> s"v$i"))
    val df = read(path)
    df.rdd.getNumPartitions shouldBe 8
    df.count() shouldBe 100
  }

  test("overwrite truncates, null values round-trip, special chars survive") {
    val path = newTable()
    write(path, Seq("a" -> "1", "gone" -> "x"))
    import spark.implicits._
    Seq(("tab\tkey", "line\nvalue"), ("b", null.asInstanceOf[String]))
      .toDF("key", "value").write.format("graft-kv")
      .option("path", path).mode("overwrite").save()
    val got = read(path).collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    got shouldBe Map("tab\tkey" -> "line\nvalue", "b" -> null)
  }

  test("compact folds deltas into bucket bases; reads unchanged") {
    val path = newTable()
    write(path, (1 to 50).map(i => s"k$i" -> "v0"))
    write(path, (1 to 50 by 2).map(i => s"k$i" -> "v1"))
    val before = read(path).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    KvStore.compact(path, 8)
    // no delta files remain
    val deltas = java.nio.file.Paths.get(path, "deltas")
    val remaining =
      if (java.nio.file.Files.exists(deltas))
        java.nio.file.Files.list(deltas).count()
      else 0L
    remaining shouldBe 0
    val after = read(path).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    after shouldBe before
    after("k1") shouldBe "v1"
    after("k2") shouldBe "v0"
  }

  test("concurrent writers both land; no lost puts under the rename race") {
    val path = newTable()
    write(path, Seq("seed" -> "0"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val jobs = (0 until 4).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit =
            write(path, (1 to 25).map(i => s"w$w-k$i" -> s"v$w"))
        })
      }
      jobs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val got = read(path).collect().map(_.getString(0)).toSet
    got.size shouldBe 101 // seed + 4 x 25, nothing lost
    (0 until 4).foreach { w => got.count(_.startsWith(s"w$w-")) shouldBe 25 }
  }

  test("joins against engine tables federate through the handler") {
    val path = newTable()
    // status dimension stored in the KV system, facts in parquet
    write(path, Seq("O" -> "open", "F" -> "finished", "P" -> "pending"))
    Engine.register(spark, sfDir)
    val dim = read(path)
    val res = Engine.table(spark, sfDir, "orders")
      .join(dim, col("o_orderstatus") === col("key"))
      .groupBy("value").agg(count(lit(1)).as("n"))
      .orderBy("value").collect()
    res.map(_.getString(0)).toSeq shouldBe Seq("finished", "open", "pending")
    res.map(_.getLong(1)).sum shouldBe Engine.table(spark, sfDir, "orders").count()
  }
}
