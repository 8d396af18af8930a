package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class DdlSpec extends SparkSpec {

  test("partitioned CTAS produces key=value layout and prunes partitions") {
    import spark.implicits._
    val orders = Engine.table(spark, sfDir, "orders")
      .withColumn("o_year", year($"o_orderdate"))
    Ddl.createPartitionedTable(orders, "orders_part", Seq("o_year"))
    val loc = spark.sql("DESCRIBE TABLE EXTENDED orders_part")
      .filter($"col_name" === "Location").head().getString(1)
    val dirs = new java.io.File(loc.stripPrefix("file:")).list().toSeq
    assert(dirs.exists(_.startsWith("o_year=")))
    // partition pruning visible in the scan
    val plan = spark.table("orders_part").filter($"o_year" === 1996)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"))
    assert(spark.table("orders_part").filter($"o_year" === 1996).count() ===
      Engine.table(spark, sfDir, "orders").filter(year($"o_orderdate") === 1996).count())
  }

  test("bucketed tables join without a shuffle") {
    import spark.implicits._
    val orders = Engine.table(spark, sfDir, "orders")
    val lineitem = Engine.table(spark, sfDir, "lineitem")
    Ddl.createBucketedTable(orders, "orders_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
    Ddl.createBucketedTable(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
    val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // co-bucketed scan-side join: no shuffle exchanges
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(joined.count() === lineitem.count())
    }
  }

  private def withSQLConf[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE feeds CBO statistics") {
    import spark.implicits._
    Ddl.ctas(Engine.table(spark, sfDir, "customer"), "customer_t")
    Ddl.analyze(spark, "customer_t", Seq("c_custkey", "c_nationkey"))
    val stats = spark.table("customer_t").queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong === 150L))
    val desc = spark.sql("DESCRIBE EXTENDED customer_t c_custkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("distinct_count").toLong > 100)
    // equi-height histograms ride along (histogram.enabled in configure) —
    // the CBO's skew-aware selectivity input, Hive column-histogram analog
    assert(desc.get("histogram").exists(_ != "NULL"),
      s"expected a histogram in column stats, got: $desc")
  }

  test("dynamic partition insert appends new partitions") {
    import spark.implicits._
    val orders = Engine.table(spark, sfDir, "orders")
      .withColumn("o_year", year($"o_orderdate"))
    Ddl.createPartitionedTable(orders.filter($"o_year" <= 1997), "orders_dyn", Seq("o_year"))
    val before = spark.table("orders_dyn").select($"o_year").distinct().count()
    Ddl.insertDynamicPartitions(orders.filter($"o_year" > 1997), "orders_dyn")
    spark.catalog.recoverPartitions("orders_dyn")
    val after = spark.table("orders_dyn").select($"o_year").distinct().count()
    assert(after > before)
    assert(spark.table("orders_dyn").count() === orders.count())
  }

  test("views, insert-overwrite-directory, load data, tablesample") {
    import spark.implicits._
    val region = Engine.table(spark, sfDir, "region")
    Ddl.createView(region.filter($"r_regionkey" < 3), "region_v")
    assert(spark.table("region_v").count() === 3)

    val dir = java.nio.file.Files.createTempDirectory("graft_iod_").toString + "/out"
    Ddl.insertOverwriteDirectory(region, dir)
    Ddl.loadData(spark, dir, "region_loaded")
    assert(spark.table("region_loaded").count() === 5)

    val sampled = Ddl.tablesample(Engine.table(spark, sfDir, "lineitem"), 0.1)
    val n = sampled.count()
    assert(n > 300 && n < 900) // ~600 of 6000 at sf0.001
    // deterministic under the fixed seed
    assert(Ddl.tablesample(Engine.table(spark, sfDir, "lineitem"), 0.1).count() === n)
  }

  test("compact merges small files atomically, preserving data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString + "/t"
    // 16 small files
    spark.range(1000).selectExpr("id", "id % 7 AS k").repartition(16)
      .write.parquet(dir)
    def files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 16)
    val before = spark.read.parquet(dir).orderBy($"id").collect()
    Ddl.compact(spark, dir, targetFiles = 2)
    assert(files === 2)
    assert(spark.read.parquet(dir).orderBy($"id").collect().toSeq === before.toSeq)
  }

  test("EXPORT/IMPORT round-trips a partitioned table") {
    import spark.implicits._
    val orders = Engine.table(spark, sfDir, "orders")
      .withColumn("o_year", year($"o_orderdate"))
    Ddl.createPartitionedTable(orders, "orders_exp", Seq("o_year"))
    val dump = java.nio.file.Files.createTempDirectory("graft_export_").toString + "/orders_dump"
    Ddl.exportTable(spark, "orders_exp", dump)
    assert(new java.io.File(dump + "/_metadata.json").exists())

    val imported = Ddl.importTable(spark, dump, "orders_imp")
    assert(imported === "orders_imp")
    // same rows, schema, and partition layout
    assert(spark.table("orders_imp").count() === orders.count())
    assert(spark.table("orders_imp").schema.fieldNames.sorted.toSeq ===
      spark.table("orders_exp").schema.fieldNames.sorted.toSeq)
    val partCols = spark.catalog.listColumns("orders_imp").collect()
      .filter(_.isPartition).map(_.name).toSeq
    assert(partCols === Seq("o_year"))
    // partition pruning works on the imported table
    val pruned = spark.table("orders_imp").filter($"o_year" === 1996)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(o_year"))
    assert(pruned.count() ===
      orders.filter($"o_year" === 1996).count())
  }
}
