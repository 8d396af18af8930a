package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed snapshot tables (the reference's CLUSTERED BY ... INTO n
  * BUCKETS layout + sort-merge-bucket map join, ref ql/.../optimizer/
  * AbstractSMBJoinProc.java, metastore StorageDescriptor.bucketCols):
  * file placement correctness, zero-shuffle co-bucketed joins and
  * aggregations, bucket pruning, and layout survival through every
  * write path (append / COW merge / compact).
  */
class SnapshotBucketSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_bucket_").toString + "/t"

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"name$i", i % 7)).toDF("k", "s", "grp")
  }

  /** Every node of the FINAL physical plan: AdaptiveSparkPlanExec and
    * QueryStageExec publish their realized subtrees via fields, not
    * `children`, so a plain `collect` sees an empty shell on any
    * AQE-wrapped query.
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  private def shuffles(df: DataFrame): Int = {
    df.write.format("noop").mode("overwrite").save() // force final plan (AQE)
    allNodes(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  /** Runs `f` with auto-broadcast OFF: these tables are toy-sized, so
    * without this every equi-join broadcasts and a zero-shuffle assertion
    * would be vacuously true of ANY layout. With SMJ forced, zero
    * exchanges is provable only by the reported bucket partitioning — the
    * 100 TB plan shape, where neither fact side broadcasts.
    */
  private def noBroadcast[T](f: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  private def smjCount(df: DataFrame): Int =
    allNodes(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])

  /** Every manifest file must carry a parseable bucket tag that matches its
    * graftbucket= path segment, and every ROW in it must hash to that
    * bucket — the invariant zero-shuffle joins are correct BY.
    */
  private def assertPlacement(t: Snapshots.SnapshotTable, n: Int,
      keyCol: String): Unit = {
    import org.apache.spark.sql.execution.datasources.BucketingUtils
    val files = t.latest().files
    assert(files.nonEmpty)
    files.foreach { f =>
      val name = f.split('/').last
      val tag = BucketingUtils.getBucketId(name)
      assert(tag.isDefined, s"untagged file in bucketed table: $f")
      val seg = f.split('/').find(_.startsWith("graftbucket=")).get
      assert(tag.get === seg.stripPrefix("graftbucket=").toInt)
      val bad = spark.read.parquet(t.root + "/" + f)
        .filter(pmod(PartitionTransforms.murmur3(col(keyCol)), lit(n)) =!= lit(tag.get))
        .limit(1).count()
      assert(bad === 0L, s"rows in $f hash outside bucket ${tag.get}")
    }
  }

  test("create lays out buckets; reads round-trip; placement verified") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 5000),
      bucketBy = Some(("k", 8)))
    assert(t.bucketConfig() === Some(Snapshots.BucketConfig(Seq("k"), 8)))
    assert(t.read().count() === 5000)
    assert(t.read().agg(sum("k")).head.getLong(0) === (0L until 5000L).sum)
    assertPlacement(t, 8, "k")
    // one file per bucket on a fresh create (stage repartitions onto n)
    assert(t.latest().files.size === 8)
  }

  test("co-bucketed join and bucket-key aggregation plan with zero shuffles") {
    val rootA = freshRoot(); val rootB = freshRoot()
    val a = Snapshots.create(spark, rootA, rows(0, 4000),
      bucketBy = Some(("k", 8)))
    val b = Snapshots.create(spark, rootB,
      rows(0, 3000).withColumnRenamed("s", "s2").withColumnRenamed("grp", "g2"),
      bucketBy = Some(("k", 8)))
    val joined = a.read().join(b.read(), "k")
    noBroadcast {
      assert(shuffles(joined) === 0,
        "co-bucketed equi-join must not exchange either side")
      assert(smjCount(joined) === 1,
        "with broadcast off this must be a sort-merge join — the shape " +
          "two 100 TB fact tables get")
    }
    assert(joined.count() === 3000)
    // result equality against a plain (shuffling) recompute
    val plain = rows(0, 4000).join(
      rows(0, 3000).withColumnRenamed("s", "s2").withColumnRenamed("grp", "g2"),
      "k")
    assert(joined.orderBy("k").collect().toSeq ===
      plain.select(joined.columns.map(col).toIndexedSeq: _*)
        .orderBy("k").collect().toSeq)
    // aggregation keyed on the bucket column: partial+final, no exchange
    val agg = a.read().groupBy("k").agg(count(lit(1)).as("c"))
    assert(shuffles(agg) === 0,
      "bucket-key aggregation must not exchange")
    assert(agg.count() === 4000)
    // window functions partitioned by the bucket column: no exchange either
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("grp")
    val win = a.read().withColumn("rn", row_number().over(w))
    assert(shuffles(win) === 0,
      "bucket-key window must not exchange")
    assert(win.count() === 4000)
  }

  test("divisible bucket counts coalesce and join shuffle-free; coprime fall back") {
    val rootA = freshRoot(); val rootB = freshRoot(); val rootC = freshRoot()
    val a = Snapshots.create(spark, rootA, rows(0, 1000),
      bucketBy = Some(("k", 8)))
    val b = Snapshots.create(spark, rootB,
      rows(0, 500).select(col("k"), col("s").as("s2")),
      bucketBy = Some(("k", 4)))
    // 8 refines 4: CoalesceBucketsInJoin folds a's buckets pairwise —
    // the Hive divisible-bucket SMB contract, no exchange on either side
    val joined = a.read().join(b.read(), "k")
    noBroadcast {
      assert(shuffles(joined) === 0,
        "8-bucket x 4-bucket join must coalesce, not shuffle")
      assert(smjCount(joined) === 1)
    }
    assert(joined.count() === 500)
    // non-divisible counts cannot co-locate: plans (with shuffles), correct
    val c = Snapshots.create(spark, rootC,
      rows(0, 300).select(col("k"), col("grp").as("g2")),
      bucketBy = Some(("k", 3)))
    val j2 = a.read().join(c.read(), "k")
    assert(j2.count() === 300)
  }

  test("bucketed snapshot x warehouse bucketBy table: hash-compatible SMB join") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 800),
      bucketBy = Some(("k", 4)))
    Ddl.createBucketedTable(
      rows(0, 400).select(col("k"), col("s").as("ws")),
      "bkt_warehouse_t", buckets = 4, bucketCols = Seq("k"))
    try {
      val joined = t.read().join(spark.table("bkt_warehouse_t"), "k")
      noBroadcast {
        assert(shuffles(joined) === 0,
          "snapshot and warehouse bucketing share the murmur3 hash — " +
            "the join must not exchange")
        assert(smjCount(joined) === 1)
      }
      assert(joined.count() === 400)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_warehouse_t")
  }

  test("bucket pruning: a point predicate reads one bucket") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 4000),
      bucketBy = Some(("k", 8)))
    // the planner may demote the bucketed SCAN (no join/agg wants the
    // partitioning — DisableUnnecessaryBucketedScan), but bucket-set FILE
    // pruning applies on the demoted path too: of the 8 per-bucket files,
    // a point predicate must read exactly the one the key hashes to
    val q = t.read().filter(col("k") === 1234L)
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(1234L))
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, "expected a FileSourceScanExec")
    // numFiles is recorded pre-bucket-pruning; the actual read set is the
    // scan RDD's FilePartitions
    val readFiles = scan.head.inputRDDs().head.partitions.toSeq.flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString).toSeq
      case _ => Seq.empty[String]
    }.distinct
    assert(readFiles.length === 1,
      s"bucket pruning must reduce an 8-file scan to the key's one bucket, " +
        s"read: ${readFiles.length}")
  }

  test("append, COW merge, and compact all preserve the bucket layout") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 2000),
      bucketBy = Some(("k", 8)))
    t.append(rows(2000, 2500))
    assertPlacement(t, 8, "k")
    // keyed MERGE (COW rewrite of matched files + inserts)
    t.merge(rows(2400, 2600).withColumn("s", lit("merged")),
      "k", "k", whenMatchedSet = Map("s" -> col("s")),
      sourceKeysUnique = true)
    assertPlacement(t, 8, "k")
    assert(t.read().count() === 2600)
    assert(t.read().filter(col("s") === "merged").count() === 200)
    t.compact(targetBytes = 1L << 30)
    assertPlacement(t, 8, "k")
    assert(t.read().count() === 2600)
    // layout survived three write paths: the join is still shuffle-free
    val rootB = freshRoot()
    val b = Snapshots.create(spark, rootB,
      rows(0, 100).select(col("k"), col("grp").as("g2")),
      bucketBy = Some(("k", 8)))
    noBroadcast { assert(shuffles(t.read().join(b.read(), "k")) === 0) }
  }

  test("partitioned + bucketed: partition pruning and bucket join co-exist") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 2000),
      partitionBy = Seq("grp"), bucketBy = Some(("k", 4)))
    assert(t.read().count() === 2000)
    assert(t.read().filter(col("grp") === 3).count() ===
      (0 until 2000).count(_ % 7 == 3))
    assertPlacement(t, 4, "k")
    val rootB = freshRoot()
    val b = Snapshots.create(spark, rootB,
      rows(0, 300).select(col("k"), col("s").as("s2")),
      bucketBy = Some(("k", 4)))
    val joined = t.read().filter(col("grp") === 1).join(b.read(), "k")
    noBroadcast { assert(shuffles(joined) === 0) }
    assert(joined.count() === rows(0, 300).filter(col("grp") === 1).count())
  }

  test("guards: bad create specs and bucket-column evolution refuse") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      Snapshots.create(spark, root, rows(0, 10), bucketBy = Some(("nope", 8))) }
    intercept[IllegalArgumentException] {
      Snapshots.create(spark, root, rows(0, 10), bucketBy = Some(("k", 1))) }
    intercept[IllegalArgumentException] {
      Snapshots.create(spark, root, rows(0, 10),
        partitionBy = Seq("k"), bucketBy = Some(("k", 8))) }
    val t = Snapshots.create(spark, freshRoot() , rows(0, 10),
      bucketBy = Some(("k", 4)))
    val e1 = intercept[IllegalArgumentException] { t.dropColumn("k") }
    assert(e1.getMessage.contains("bucket/sort column"))
    val e2 = intercept[IllegalArgumentException] {
      t.alterColumnType("k", org.apache.spark.sql.types.DoubleType) }
    assert(e2.getMessage.contains("bucket column"))
    // rename is metadata-only (physical name anchors the config): allowed,
    // and the renamed table still joins shuffle-free
    t.renameColumn("k", "key")
    val b = Snapshots.create(spark, freshRoot(), rows(0, 10)
      .select(col("k"), col("s").as("s2")), bucketBy = Some(("k", 4)))
    val lhs = t.read(); val rhs = b.read()
    val joined = lhs.join(rhs, lhs("key") === rhs("k"))
    assert(joined.count() === 10)
  }

  test("SQL: CREATE ... CLUSTERED BY INTO BUCKETS, INSERT, SPJ, SHOW CREATE") {
    def sql(q: String) = graft.Engine.sql(spark, sfDir, q)
    val rootA = freshRoot(); val rootB = freshRoot()
    try {
      sql(s"""CREATE TABLE bkt_a (k BIGINT, s STRING) USING snapshot
              CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '$rootA'""")
      sql(s"""CREATE TABLE bkt_b (k BIGINT, v DOUBLE) USING snapshot
              CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '$rootB'""")
      sql("INSERT INTO bkt_a SELECT id AS k, concat('s', id) AS s " +
        "FROM range(0, 1000)")
      sql("INSERT INTO bkt_b SELECT id AS k, id * 1.5 AS v FROM range(0, 600)")
      assertPlacement(Snapshots.table(spark, rootA), 4, "k")
      val joined = sql(
        "SELECT a.k, a.s, b.v FROM bkt_a a JOIN bkt_b b ON a.k = b.k")
      noBroadcast {
        assert(shuffles(joined) === 0,
          "SQL-created co-bucketed tables must join with zero shuffles")
        assert(smjCount(joined) === 1)
      }
      assert(joined.count() === 600)
      val stmt = sql("SHOW CREATE TABLE bkt_a").head.getString(0)
      assert(stmt.contains("CLUSTERED BY (k) INTO 4 BUCKETS"), stmt)
    } finally {
      NamedTables.drop("bkt_a"); NamedTables.drop("bkt_b")
    }
  }

  test("SORTED BY buckets: sort-free merge join, graceful decay, compact restore") {
    def sorts(df: DataFrame): Int = {
      df.write.format("noop").mode("overwrite").save()
      allNodes(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    }
    val rootA = freshRoot(); val rootB = freshRoot()
    val a = Snapshots.create(spark, rootA, rows(0, 2000),
      bucketBy = Some(("k", 4)), bucketSortBy = Seq("k"))
    val b = Snapshots.create(spark, rootB,
      rows(0, 1200).select(col("k"), col("s").as("s2")),
      bucketBy = Some(("k", 4)), bucketSortBy = Seq("k"))
    // every file is internally sorted on k
    a.latest().files.foreach { f =>
      val ks = spark.read.parquet(rootA + "/" + f)
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, s"file $f not sorted on k")
    }
    noBroadcast {
      // the full SMB contract: a merge join with no exchange AND no sort
      val j1 = a.read().join(b.read(), "k")
      assert(shuffles(j1) === 0)
      assert(smjCount(j1) === 1)
      assert(sorts(j1) === 0,
        "sorted co-bucketed merge join must not re-sort either side")
      assert(j1.count() === 1200)
      // an append makes 2 files per bucket: ordering can no longer be
      // declared (two sorted runs are not one), joins stay correct and
      // shuffle-free, sorts reappear
      a.append(rows(2000, 2100))
      val j2 = a.read().join(b.read(), "k")
      assert(shuffles(j2) === 0)
      assert(sorts(j2) > 0, "multi-file buckets cannot claim sortedness")
      assert(j2.count() === 1200)
      // compaction restores one sorted file per bucket -> sort-free again
      a.compact(targetBytes = 1L << 30)
      val j3 = a.read().join(b.read(), "k")
      assert(shuffles(j3) === 0)
      assert(sorts(j3) === 0, "compact must restore the sorted contract")
      assert(j3.count() === 1200)
    }
  }

  test("SQL: SORTED BY round-trips through CREATE and SHOW CREATE TABLE") {
    def sql(q: String) = graft.Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    try {
      sql(s"""CREATE TABLE bkt_sorted (k BIGINT, v DOUBLE) USING snapshot
              CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS
              LOCATION '$root'""")
      sql("INSERT INTO bkt_sorted SELECT id AS k, id * 0.5 AS v " +
        "FROM range(0, 500)")
      assert(Snapshots.table(spark, root).bucketConfig() ===
        Some(Snapshots.BucketConfig(Seq("k"), 4, Seq("k"))))
      val stmt = sql("SHOW CREATE TABLE bkt_sorted").head.getString(0)
      assert(stmt.contains("CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS"),
        stmt)
    } finally NamedTables.drop("bkt_sorted")
  }

  test("multi-column CLUSTERED BY (k, grp): composite-key join shuffle-free") {
    def sql(q: String) = graft.Engine.sql(spark, sfDir, q)
    val rootA = freshRoot(); val rootB = freshRoot()
    val a = Snapshots.create(spark, rootA, rows(0, 2000), Nil, 8,
      Some(Snapshots.BucketBy(Seq("k", "grp"), 4)))
    val b = Snapshots.create(spark, rootB,
      rows(0, 800).select(col("k"), col("grp"), col("s").as("s2")),
      Nil, 8, Some(Snapshots.BucketBy(Seq("k", "grp"), 4)))
    // per-file placement on the COMPOSITE hash
    import org.apache.spark.sql.execution.datasources.BucketingUtils
    a.latest().files.foreach { f =>
      val tag = BucketingUtils.getBucketId(f.split('/').last).get
      val bad = spark.read.parquet(rootA + "/" + f)
        .filter(pmod(PartitionTransforms.murmur3(col("k"), col("grp")), lit(4)) =!= lit(tag))
        .limit(1).count()
      assert(bad === 0L, s"rows in $f hash outside composite bucket $tag")
    }
    noBroadcast {
      val j = a.read().join(b.read(), Seq("k", "grp"))
      assert(shuffles(j) === 0,
        "composite-key co-bucketed join must not exchange")
      assert(smjCount(j) === 1)
      assert(j.count() === 800)
      // joining on a PREFIX of the bucket keys cannot co-locate: the plan
      // shuffles (correctly) instead of claiming false partitioning
      val jk = a.read().join(
        b.read().select(col("k"), col("s2")), Seq("k"))
      assert(shuffles(jk) > 0)
      assert(jk.count() === 800)
    }
    // SQL spelling round-trips; DESCRIBE surfaces the layout; an attach
    // with a MISMATCHED clause refuses instead of silently ignoring it
    val rootC = freshRoot()
    try {
      sql(s"""CREATE TABLE bkt_mc (k BIGINT, grp INT, v DOUBLE)
              USING snapshot CLUSTERED BY (k, grp) INTO 4 BUCKETS
              LOCATION '$rootC'""")
      val stmt = sql("SHOW CREATE TABLE bkt_mc").head.getString(0)
      assert(stmt.contains("CLUSTERED BY (k, grp) INTO 4 BUCKETS"), stmt)
      val desc = sql("DESCRIBE bkt_mc").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc.get("Bucket Columns") === Some("k, grp"))
      assert(desc.get("Num Buckets") === Some("4"))
      NamedTables.drop("bkt_mc")
      val e = intercept[IllegalArgumentException] {
        sql(s"""CREATE TABLE bkt_mc (k BIGINT, grp INT, v DOUBLE)
                USING snapshot CLUSTERED BY (k) INTO 8 BUCKETS
                LOCATION '$rootC'""") }
      assert(e.getMessage.contains("does not match the existing table"))
      // the MATCHING clause re-attaches cleanly
      sql(s"""CREATE TABLE bkt_mc (k BIGINT, grp INT, v DOUBLE)
              USING snapshot CLUSTERED BY (k, grp) INTO 4 BUCKETS
              LOCATION '$rootC'""")
    } finally NamedTables.drop("bkt_mc")
  }

  test("exactly-once streaming appendBatch preserves the bucket layout") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 500),
      bucketBy = Some(("k", 4)))
    t.appendBatch(rows(500, 700), streamId = "s1", batchId = 0L)
    // replay is a no-op (the exactly-once contract), layout still holds
    t.appendBatch(rows(500, 700), streamId = "s1", batchId = 0L)
    assert(t.read().count() === 700)
    assertPlacement(t, 4, "k")
  }

  test("dynamic partition pruning reaches the snapshot FileIndex") {
    import spark.implicits._
    val root = freshRoot()
    // partitioned by grp (7 values) AND bucketed: DPP must prune the fact
    // side's partitions from the dim filter at runtime, through the
    // manifest-backed index, while the bucket layout rides along
    val t = Snapshots.create(spark, root, rows(0, 2000),
      partitionBy = Seq("grp"), bucketBy = Some(("k", 4)))
    val totalFiles = t.latest().files.size
    // DPP plans only when the dim side carries a SELECTIVE predicate (a
    // Filter node) — and it must survive to the optimized plan, so the
    // dim is file-backed (a filtered in-memory relation constant-folds
    // away before the pruning rule runs)
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft_dpp_dim_").toString + "/dim"
    Seq((3, "three"), (5, "five"), (6, "six")).toDF("g", "gname")
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("gname") === "three")
    val joined = t.read().join(dim, col("grp") === col("g"))
    // execute THIS QueryExecution (a write would plan a separate one and
    // the inspected scan's DPP subquery would never run)
    val nRows = joined.collect().length
    assert(nRows === (0 until 2000).count(_ % 7 == 3))
    val scans = allNodes(joined.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.isInstanceOf[SnapshotFileIndex] => f
    }
    assert(scans.nonEmpty, "expected the snapshot-side scan")
    val readFiles = scans.head.inputRDDs().head.partitions.toSeq.flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString).toSeq
      case _ => Seq.empty[String]
    }.distinct
    assert(readFiles.size < totalFiles,
      s"runtime pruning must cut the file set: read ${readFiles.size} " +
        s"of $totalFiles")
    assert(readFiles.forall(_.contains("grp=3")),
      "every surviving file must be in the joined partition")
  }

  test("8 concurrent appends: none lost, every file still bucket-placed") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 100),
      bucketBy = Some(("k", 4)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            val tt = Snapshots.table(spark, root)
            tt.append(rows(100 + i * 50, 150 + i * 50), maxRetries = 30)
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    assert(t.read().count() === 100 + 8 * 50, "a concurrent append was lost")
    assertPlacement(t, 4, "k")
    // the staged-write conf pin must fully unwind after concurrent writers
    assert(spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled") === "true",
      "a racing writer leaked the auto-bucketed-scan pin")
    // and the layout still carries the join contract
    val b = Snapshots.create(spark, freshRoot(),
      rows(0, 50).select(col("k"), col("s").as("s2")),
      bucketBy = Some(("k", 4)))
    noBroadcast {
      val j = t.read().join(b.read(), "k")
      assert(shuffles(j) === 0)
      assert(j.count() === 50)
    }
  }

  test("MOR delete on a bucketed table: correct rows, layout intact") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 1000),
      bucketBy = Some(("k", 4)))
    t.deleteWhereMergeOnRead(col("k") < 100)
    assert(t.read().count() === 900)
    assert(t.read().agg(min("k")).head.getLong(0) === 100L)
    // compaction folds the MOR deletes and re-buckets
    t.compact(targetBytes = 1L << 30, minInputFiles = 1)
    assert(t.latest().deletes.isEmpty)
    assert(t.read().count() === 900)
    assertPlacement(t, 4, "k")
  }

  test("t.partitions reports declared partitions only, never bucket dirs") {
    def sql(q: String) = graft.Engine.sql(spark, sfDir, q)
    // unpartitioned 4-bucket table: ONE partition row (the table itself),
    // not one bogus partition per graftbucket=N staging segment
    val root = freshRoot()
    Snapshots.create(spark, root, rows(0, 1000), bucketBy = Some(("k", 4)))
    NamedTables.registerSnapshot("bpart_t", root)
    try {
      val parts = sql(
        "SELECT partition, record_count, file_count FROM bpart_t.partitions")
        .collect()
      assert(parts.length === 1,
        s"bucket staging dirs leaked as partitions: ${parts.mkString(",")}")
      assert(parts.head.getString(0) === "")
      assert(parts.head.getLong(1) === 1000L)
      assert(parts.head.getLong(2) === 4L)
    } finally NamedTables.drop("bpart_t")
    // partitioned AND bucketed: exactly the declared partitions, each
    // aggregating its buckets' files
    val root2 = freshRoot()
    Snapshots.create(spark, root2, rows(0, 700), partitionBy = Seq("grp"),
      checkpointInterval = 8,
      bucket = Some(Snapshots.BucketBy(Seq("k"), 4, Nil)))
    NamedTables.registerSnapshot("bpart_t2", root2)
    try {
      val parts = sql(
        "SELECT partition, record_count, file_count FROM bpart_t2.partitions")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(parts.keySet === (0 until 7).map(g => s"grp=$g").toSet,
        s"expected the 7 declared grp partitions, got ${parts.keySet}")
      assert(parts.values.sum === 700L)
    } finally NamedTables.drop("bpart_t2")
  }

  test("bucketed CREATE losing the v0 race to a plain CREATE drops its sidecar") {
    // the loser pre-writes _bucket.json before the v0 CAS; if a
    // NON-bucketed create wins, that sidecar lies about the surviving
    // table (untagged files under a bucket spec = 'Invalid bucket file' on
    // every scan) and must be removed. Race both orders repeatedly and
    // assert the invariant: sidecar present iff the WINNING manifest
    // declares the layout, and the table always scans.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (0 until 5).foreach { i =>
        val root = freshRoot()
        val gate = new java.util.concurrent.CyclicBarrier(2)
        def attempt(bucketed: Boolean) = pool.submit(
          new java.util.concurrent.Callable[Option[Throwable]] {
            def call(): Option[Throwable] =
              try {
                gate.await()
                if (bucketed)
                  Snapshots.create(spark, root, rows(0, 400),
                    bucketBy = Some(("k", 4)))
                else Snapshots.create(spark, root, rows(0, 300))
                None
              } catch { case e: Throwable => Some(e) }
          })
        val outcomes = Seq(attempt(bucketed = true),
          attempt(bucketed = i % 2 == 0)).map(_.get())
        val t = Snapshots.table(spark, root)
        val winnerBucketed = t.latest().meta.contains("bucket")
        assert(outcomes.flatten.size === 1,
          s"exactly one CREATE must win the v0 race: $outcomes")
        val sidecar = new java.io.File(root, "_bucket.json")
        assert(sidecar.exists() === winnerBucketed,
          s"iter $i: sidecar=${sidecar.exists()} but winner bucketed=" +
            s"$winnerBucketed — a lost bucketed CREATE left its layout " +
            "claim on the survivor")
        assert(t.bucketConfig().isDefined === winnerBucketed)
        // the survivor scans cleanly under its own (true) layout
        assert(t.read().count() === (if (winnerBucketed) 400 else 300))
      }
    } finally pool.shutdown()
  }
}
