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
      whenMatchedSet = Map("o_totalprice" -> col("o_totalprice")))
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
        whenMatchedSet = Map("o_totalprice" -> col("o_totalprice")))
    }
    assert(ex.getMessage.contains("cardinality"))
  }

  test("merge cardinality guard also fires under whenMatchedDelete") {
    import spark.implicits._
    val t = scratchOrders()
    val matched = spark.read.parquet(t).limit(1)
    val dupSrc = matched.union(matched.withColumn("o_totalprice", lit(2.0)))
    val ex = intercept[IllegalStateException] {
      Dml.merge(spark, t, dupSrc, "o_orderkey", "o_orderkey",
        whenMatchedDelete = true)
    }
    assert(ex.getMessage.contains("cardinality"))
  }

  /** A scratch copy of orders partitioned by o_orderstatus (3 partitions). */
  private def scratchPartitionedOrders(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dmlp_").toString + "/orders"
    Engine.table(spark, sfDir, "orders").write
      .partitionBy("o_orderstatus").parquet(dir)
    dir
  }

  /** Data-file signature of one partition dir: (name, length, mtime). */
  private def fileSig(table: String, leaf: String): Set[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$table/$leaf")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isFile)
      .filterNot(s => s.getPath.getName.startsWith(".") || s.getPath.getName.startsWith("_"))
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).toSet
  }

  test("partitioned delete touches only partitions containing matches") {
    import spark.implicits._
    val t = scratchPartitionedOrders()
    val before = spark.read.parquet(t)
    val n = before.count()
    val nHit = before.filter($"o_orderstatus" === "P" && $"o_orderkey" % 2 === 0).count()
    val sigO = fileSig(t, "o_orderstatus=O")
    val sigF = fileSig(t, "o_orderstatus=F")
    assert(sigO.nonEmpty && sigF.nonEmpty)
    Dml.deleteWhere(spark, t,
      col("o_orderstatus") === "P" && col("o_orderkey") % 2 === 0)
    // untouched partitions keep their exact files (same names, sizes, mtimes)
    assert(fileSig(t, "o_orderstatus=O") === sigO)
    assert(fileSig(t, "o_orderstatus=F") === sigF)
    val after = spark.read.parquet(t)
    assert(after.count() === n - nHit)
    assert(after.filter($"o_orderstatus" === "P" && $"o_orderkey" % 2 === 0).count() === 0)
  }

  test("partitioned delete on a partition predicate drops the whole directory") {
    import spark.implicits._
    val t = scratchPartitionedOrders()
    val keep = spark.read.parquet(t).filter($"o_orderstatus" =!= "F").count()
    val sigO = fileSig(t, "o_orderstatus=O")
    Dml.deleteWhere(spark, t, col("o_orderstatus") === "F")
    assert(fileSig(t, "o_orderstatus=F").isEmpty) // dir removed, not rewritten
    assert(fileSig(t, "o_orderstatus=O") === sigO)
    assert(spark.read.parquet(t).count() === keep)
  }

  test("partitioned update rewrites only matching partitions; partition column assignment throws") {
    import spark.implicits._
    val t = scratchPartitionedOrders()
    val sigF = fileSig(t, "o_orderstatus=F")
    val sigP = fileSig(t, "o_orderstatus=P")
    Dml.updateWhere(spark, t,
      col("o_orderstatus") === "O" && col("o_totalprice") > 100000,
      Map("o_orderpriority" -> lit("0-REWRITTEN")))
    assert(fileSig(t, "o_orderstatus=F") === sigF)
    assert(fileSig(t, "o_orderstatus=P") === sigP)
    val after = spark.read.parquet(t)
    assert(after.filter($"o_orderpriority" === "0-REWRITTEN").count() ===
      after.filter($"o_orderstatus" === "O" && $"o_totalprice" > 100000).count())
    intercept[UnsupportedOperationException] {
      Dml.updateWhere(spark, t, lit(true), Map("o_orderstatus" -> lit("X")))
    }
  }

  test("partitioned merge rewrites matched partitions, appends inserts, creates new partitions") {
    import spark.implicits._
    val t = scratchPartitionedOrders()
    val before = spark.read.parquet(t)
    val beforeCount = before.count()
    // matched keys all live in partition F; inserts target existing partition
    // O (append) and brand-new partition Z (new directory)
    val fKeys = before.filter($"o_orderstatus" === "F").limit(5)
      .select($"o_orderkey").as[Long].collect().toSeq
    val sigO = fileSig(t, "o_orderstatus=O")
    val sigP = fileSig(t, "o_orderstatus=P")
    def row(key: Long, status: String) = spark.range(1).select(
      lit(key).as("o_orderkey"), lit(1L).as("o_custkey"),
      lit(123.45).as("o_totalprice"),
      to_timestamp(lit("2020-01-01 00:00:00")).as("o_orderdate"),
      lit("1-URGENT").as("o_orderpriority"), lit(status).as("o_orderstatus"))
    val src = fKeys.map(k => row(k, "F")).reduce(_ union _)
      .union(row(7777771L, "O")).union(row(7777772L, "Z"))
    Dml.merge(spark, t, src, "o_orderkey", "o_orderkey",
      whenMatchedSet = Map("o_totalprice" -> col("o_totalprice")))
    // P untouched; O only gained files (original files still present)
    assert(fileSig(t, "o_orderstatus=P") === sigP)
    val sigOAfter = fileSig(t, "o_orderstatus=O")
    assert(sigO.subsetOf(sigOAfter) && sigOAfter.size > sigO.size)
    assert(fileSig(t, "o_orderstatus=Z").nonEmpty)
    val after = spark.read.parquet(t)
    assert(after.count() === beforeCount + 2)
    assert(after.filter($"o_orderkey".isin(fKeys: _*) && $"o_totalprice" === 123.45)
      .count() === fKeys.size)
    assert(after.filter($"o_orderkey" === 7777772L && $"o_orderstatus" === "Z").count() === 1)
    intercept[UnsupportedOperationException] {
      Dml.merge(spark, t, src, "o_orderkey", "o_orderkey",
        whenMatchedSet = Map("o_orderstatus" -> lit("X")))
    }
  }

  test("partitioned insertInto appends into the key=value layout") {
    import spark.implicits._
    val t = scratchPartitionedOrders()
    val n = spark.read.parquet(t).count()
    val rows = spark.read.parquet(t).limit(3)
      .withColumn("o_orderkey", $"o_orderkey" + 50000000L)
    Dml.insertInto(spark, t, rows)
    assert(spark.read.parquet(t).count() === n + 3)
    // no stray files at the table root — everything under key=value dirs
    assert(fileSig(t, ".").isEmpty)
  }

  test("partition manifest is maintained across statements without re-listing") {
    import spark.implicits._
    val t = scratchPartitionedOrders()
    val listingsBefore = Dml.treeListings.get()
    Dml.updateWhere(spark, t, col("o_orderstatus") === "P" && col("o_totalprice") > 0,
      Map("o_orderpriority" -> lit("M1")))
    Dml.deleteWhere(spark, t,
      col("o_orderstatus") === "P" && col("o_orderkey") % 7 === 0)
    Dml.updateWhere(spark, t, col("o_orderstatus") === "F" && col("o_totalprice") > 0,
      Map("o_orderpriority" -> lit("M2")))
    // only the FIRST statement lists the partition tree; the manifest is
    // maintained transactionally with each commit afterwards
    assert(Dml.treeListings.get() === listingsBefore + 1)
    val after = spark.read.parquet(t)
    assert(after.filter($"o_orderstatus" === "F" && $"o_orderpriority" =!= "M2").count() === 0)
    assert(after.filter($"o_orderstatus" === "P" && $"o_orderkey" % 7 === 0).count() === 0)
  }

  test("delete emptying nested leaves removes empty parent dirs; later DML still works") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dml2_").toString + "/t"
    Engine.table(spark, sfDir, "orders")
      .withColumn("half", (col("o_orderkey") % 2).cast("int"))
      .write.partitionBy("o_orderstatus", "half").parquet(dir)
    Dml.deleteWhere(spark, dir, col("o_orderstatus") === "P")
    val p = new org.apache.hadoop.fs.Path(s"$dir/o_orderstatus=P")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // both half=* leaves under P are gone AND the childless parent is cleaned
    // up — a leftover empty o_orderstatus=P would be parsed as a short leaf
    // and brick every later statement on the table
    assert(!fs.exists(p))
    Dml.updateWhere(spark, dir, col("o_orderstatus") === "O",
      Map("o_orderpriority" -> lit("STILL-WORKS")))
    val after = spark.read.parquet(dir)
    assert(after.filter($"o_orderstatus" === "P").count() === 0)
    assert(after.filter($"o_orderpriority" === "STILL-WORKS").count() ===
      after.filter($"o_orderstatus" === "O").count())
  }

  test("numeric-looking string partition values survive DML exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dml3_").toString + "/t"
    // "00" and "1.10" infer as numbers and would re-render as "0"/"1.1",
    // breaking both the leaf lookup and the staged rewrite — internal reads
    // run with partition-type inference off so dir names round-trip
    spark.range(20).select($"id",
      when($"id" % 2 === 0, "00").otherwise("1.10").as("k"))
      .write.partitionBy("k").parquet(dir)
    Dml.deleteWhere(spark, dir, col("id") < 4) // touches both partitions
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/k=00")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/k=1.10")))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName).toSet === Set("k=00", "k=1.10"))
    assert(spark.read.parquet(dir).count() === 16)
    Dml.updateWhere(spark, dir, col("id") === 10, Map("id" -> lit(1000L)))
    assert(spark.read.parquet(dir).filter($"id" === 1000L).count() === 1)
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
