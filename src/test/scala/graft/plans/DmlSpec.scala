package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class DmlSpec extends SparkSpec {

  /** A scratch copy of the orders table (testdata itself is read-only). */
  private def scratchOrders(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dml_").toString + "/orders"
    Engine.table(spark, sfDir, "orders").write.parquet(dir)
    dir
  }

  test("deleteWhere removes exactly the matching rows") {
    import spark.implicits._
    val t = scratchOrders()
    val before = spark.read.parquet(t).count()
    val toDelete = spark.read.parquet(t).filter($"o_orderstatus" === "F").count()
    Dml.deleteWhere(spark, t, col("o_orderstatus") === "F")
    val after = spark.read.parquet(t)
    assert(after.count() === before - toDelete)
    assert(after.filter($"o_orderstatus" === "F").count() === 0)
  }

  test("updateWhere rewrites only matching rows") {
    import spark.implicits._
    val t = scratchOrders()
    Dml.updateWhere(spark, t, col("o_totalprice") > 100000,
      Map("o_orderpriority" -> lit("0-REWRITTEN"),
        "o_totalprice" -> col("o_totalprice") * 2))
    val after = spark.read.parquet(t)
    assert(after.filter($"o_orderpriority" === "0-REWRITTEN").count() ===
      after.filter($"o_totalprice" > 200000).count())
    assert(after.filter($"o_totalprice" <= 200000 &&
      $"o_orderpriority" === "0-REWRITTEN").count() === 0)
  }

  test("merge updates matched and inserts unmatched") {
    import spark.implicits._
    val t = scratchOrders()
    val before = spark.read.parquet(t)
    // materialize pre-mutation facts (lazy re-scan after swap would be stale)
    val beforeCount = before.count()
    val matchedCount = before.filter($"o_orderkey" < 10).count()
    val newRow = before.limit(1).select(
      lit(9999999L).as("o_orderkey"), lit(8888888L).as("o_custkey"),
      lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
      to_timestamp(lit("2020-01-01 00:00:00")).as("o_orderdate"),
      lit("1-URGENT").as("o_orderpriority"))
    val src = before.filter($"o_orderkey" < 10)
      .withColumn("o_totalprice", lit(999.99))
      .unionByName(newRow)
    Dml.merge(spark, t, src, "o_orderkey", "o_orderkey",
      whenMatchedSet = Map("o_totalprice" -> col("s.o_totalprice")))
    val after = spark.read.parquet(t)
    assert(after.count() === beforeCount + 1)
    assert(after.filter($"o_orderkey" === 9999999L).count() === 1)
    assert(after.filter($"o_orderkey" < 10 && $"o_totalprice" === 999.99).count() ===
      matchedCount)
  }

  test("merge with whenMatchedDelete removes matched target rows") {
    import spark.implicits._
    val t = scratchOrders()
    val before = spark.read.parquet(t)
    val n = before.count()
    val nMatched = before.filter($"o_orderkey" % 100 === 0).count()
    val matchedKeys = spark.read.parquet(t).filter($"o_orderkey" % 100 === 0)
    Dml.merge(spark, t, matchedKeys, "o_orderkey", "o_orderkey",
      whenMatchedDelete = true)
    val after = spark.read.parquet(t)
    assert(after.count() === n - nMatched)
    assert(after.filter($"o_orderkey" % 100 === 0).count() === 0)
  }

  test("merge cardinality: duplicate matched keys throw, duplicate unmatched keys insert") {
    import spark.implicits._
    val t = scratchOrders()
    def srcRow(key: Long, price: Double) = spark.range(1).select(
      lit(key).as("o_orderkey"), lit(1L).as("o_custkey"),
      lit("N").as("o_orderstatus"), lit(price).as("o_totalprice"),
      to_timestamp(lit("2020-01-01 00:00:00")).as("o_orderdate"),
      lit("1-URGENT").as("o_orderpriority"))
    // two source rows for an UNMATCHED key: legal, both insert
    val n = spark.read.parquet(t).count()
    Dml.merge(spark, t, srcRow(7777771L, 1.0).union(srcRow(7777771L, 2.0)),
      "o_orderkey", "o_orderkey")
    assert(spark.read.parquet(t).count() === n + 2)
    // two source rows for a MATCHED key: cardinality violation
    val matched = spark.read.parquet(t).select($"o_orderkey").limit(1).head().getLong(0)
    val ex = intercept[IllegalStateException] {
      Dml.merge(spark, t, srcRow(matched, 1.0).union(srcRow(matched, 2.0)),
        "o_orderkey", "o_orderkey",
        whenMatchedSet = Map("o_totalprice" -> col("s.o_totalprice")))
    }
    assert(ex.getMessage.contains("cardinality"))
  }

  test("multiInsert fans one source scan into several sinks") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_mi_").toString
    val src = Engine.table(spark, sfDir, "orders")
    Dml.multiInsert(spark, src, Seq(
      ((d: org.apache.spark.sql.DataFrame) =>
        d.filter($"o_orderstatus" === "O").select($"o_orderkey", $"o_totalprice"),
        s"$base/open"),
      ((d: org.apache.spark.sql.DataFrame) =>
        d.groupBy($"o_orderpriority").agg(count(lit(1)).as("n")),
        s"$base/by_prio")))
    assert(spark.read.parquet(s"$base/open").count() ===
      src.filter($"o_orderstatus" === "O").count())
    assert(spark.read.parquet(s"$base/by_prio").count() === 5)
  }
}
