package graft.streaming

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {

  private def batchEvents = Engine.table(spark, sfDir, "events")

  test("streaming tumbling counts equal the batch computation") {
    import spark.implicits._
    val stream = Streams.eventStream(spark, sfDir)
    val q = Streams.drainToMemory(
      Streams.tumblingCounts(stream), "t_tumble", outputMode = "complete")
    try {
      val got = spark.table("t_tumble")
        .select($"window_start", $"event_type", $"n")
      val want = batchEvents
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"window.start".as("window_start"), $"event_type", $"n")
      assert(got.except(want).count() === 0 && want.except(got).count() === 0)
    } finally q.stop()
  }

  test("streaming session windows produce per-user sessions") {
    import spark.implicits._
    val stream = Streams.eventStream(spark, sfDir)
    val q = Streams.drainToMemory(
      Streams.sessionCounts(stream), "t_sess", outputMode = "complete")
    try {
      val got = spark.table("t_sess")
      assert(got.count() > 0)
      assert(got.agg(sum($"n")).head().getLong(0) === batchEvents.count())
    } finally q.stop()
  }

  test("streaming dedup keeps one row per event_id") {
    import spark.implicits._
    val stream = Streams.eventStream(spark, sfDir)
    val q = Streams.drainToMemory(Streams.dedupEvents(stream), "t_dedup")
    try {
      val got = spark.table("t_dedup")
      assert(got.count() === got.select($"event_id").distinct().count())
    } finally q.stop()
  }

  test("stream-stream range join equals the batch computation") {
    import spark.implicits._
    // both sides read from the SAME file stream (a self stream-stream
    // join), watermarked per side; append mode emits a match once both
    // watermarks pass it
    val clicks = Streams.eventStream(spark, sfDir)
      .filter($"event_type" === "click")
    val purchases = Streams.eventStream(spark, sfDir)
      .filter($"event_type" === "purchase")
    val joined = Streams.clickAttribution(clicks, purchases)
    assert(joined.isStreaming)
    val q = Streams.drainToMemory(joined, "t_ssj")
    try {
      val got = spark.table("t_ssj")
        .select($"user_id", $"click_id", $"purchase_id")
      val want = Streams.clickAttribution(
          batchEvents.filter($"event_type" === "click"),
          batchEvents.filter($"event_type" === "purchase"))
        .select($"user_id", $"click_id", $"purchase_id")
      assert(got.count() > 0)
      assert(got.except(want).count() === 0 && want.except(got).count() === 0)
    } finally q.stop()
  }

  test("outer stream-stream join emits NULL rows for unmatched clicks " +
      "after the watermark passes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    // u1: matched inside horizon; u2: no purchase at all; u3: purchase
    // outside the 6h horizon — u2/u3 must surface as NULL rows
    val clickRows = Seq(("u1", "c1", at(0)), ("u2", "c2", at(0)),
      ("u3", "c3", at(0)))
    val purchaseRows = Seq(("u1", "p1", at(2)), ("u3", "p3", at(8)))
    val cs = MemoryStream[(String, String, java.sql.Timestamp)]
    val ps = MemoryStream[(String, String, java.sql.Timestamp)]
    def df(m: MemoryStream[(String, String, java.sql.Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
    val joined = Streams.attributionFunnel(df(cs), df(ps),
      horizon = "6 hours", watermark = "1 hour")
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory").queryName("t_souter")
      .outputMode("append").start()
    try {
      cs.addData(clickRows: _*)
      ps.addData(purchaseRows: _*)
      q.processAllAvailable()
      // two far-future pushers: the first advances the watermark, the
      // second triggers the batch that evicts + emits the NULL rows
      Seq(600, 1200).foreach { h =>
        cs.addData(("wm", s"cw$h", at(h)))
        ps.addData(("wm", s"pw$h", at(h)))
        q.processAllAvailable()
      }
      val got = spark.table("t_souter")
        .where($"user_id" =!= "wm")
        .select($"user_id", $"click_id", $"purchase_id")
      val want = Streams.attributionFunnel(
          clickRows.toDF("user_id", "event_id", "ts"),
          purchaseRows.toDF("user_id", "event_id", "ts"))
        .select($"user_id", $"click_id", $"purchase_id")
      assert(got.count() === 3) // u1 match + u2/u3 NULL rows
      assert(got.where($"purchase_id".isNull)
        .select($"user_id").as[String].collect().toSet === Set("u2", "u3"))
      assert(got.except(want).count() === 0 &&
        want.except(got).count() === 0)
    } finally q.stop()
  }

  test("streaming near-duplicate suppression keys on the MinHash signature") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textAws = "the  quick brown fox jumps  over the lazy dog again and again"
    val textB = "completely different content about distributed query engines"
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    in.addData((1L, at(0), textA), (2L, at(1), textAws), (3L, at(2), textB),
      (4L, at(3), textA))
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = Streams.drainToMemory(
      Streams.dedupNearDuplicates(docs, "text", "ts"), "t_neardup")
    try {
      val got = spark.table("t_neardup").select($"doc_id").as[Long].collect().sorted
      // whitespace-variant and exact copy are suppressed; first of each
      // signature group survives
      assert(got.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("streaming contamination monitor equals the batch overlapStats flags") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpusRows = Seq(
      (10L, "intro words then the quick brown fox jumps over it"), // 3 shared 4-grams
      (11L, "nothing in common with the benchmark suite at all"),
      (12L, "jumps over the lazy dog is a stolen fragment"))        // 2 shared 4-grams
    val in = MemoryStream[(Long, String)]
    in.addData(corpusRows: _*)
    val q = Streams.drainToMemory(
      Streams.contaminationMonitor(in.toDF().toDF("doc_id", "text"), bench,
        k = 4, minOverlap = 2),
      "t_contam", outputMode = "complete")
    try {
      val got = spark.table("t_contam")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.operators.Decontaminate.overlapStats(
          corpusRows.toDF("doc_id", "text"), bench, k = 4, minOverlap = 2)
        .filter($"contaminated" === 1)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_overlap")).toMap
      assert(got === want)
      assert(got.keySet === Set(10L, 12L))
    } finally q.stop()
  }

  test("stream-static join enriches events with a dimension") {
    import spark.implicits._
    val stream = Streams.eventStream(spark, sfDir)
    val dim = batchEvents.select($"user_id").distinct()
      .withColumn("user_tag", concat(lit("u"), $"user_id"))
    val q = Streams.drainToMemory(
      Streams.enrich(stream, dim, "user_id", "user_id")
        .select(stream("event_id"), col("user_tag")), "t_enrich")
    try {
      val got = spark.table("t_enrich")
      assert(got.count() === batchEvents.count())
      assert(got.filter(col("user_tag").isNull).count() === 0)
    } finally q.stop()
  }

  test("flatMapGroupsWithState maintains running per-user totals") {
    import spark.implicits._
    val stream = Streams.eventStream(spark, sfDir)
    val q = Streams.drainToMemory(
      Streams.runningUserTotals(stream).toDF(), "t_state", outputMode = "append")
    try {
      val got = spark.table("t_state")
      val want = batchEvents.groupBy($"user_id")
        .agg(count(lit(1)).as("events_seen"))
      // one final state row per user with the full count (single micro-batch)
      val merged = got.groupBy($"user_id")
        .agg(max($"events_seen").as("events_seen"))
      assert(merged.join(want, Seq("user_id"))
        .filter(merged("events_seen") =!= want("events_seen")).count() === 0)
    } finally q.stop()
  }

  test("upsertSink merges each micro-batch by key (streaming transactional ingest)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_upsert_").toString + "/t"
    val in = MemoryStream[(Long, String, Double)]
    // v doubles as the version: within one batch the HIGHEST v must win,
    // and null keys are dropped (a MERGE key never matches NULL)
    in.addData((1L, "a", 1.0), (2L, "b_old", 2.0), (2L, "b", 5.0))
    val q = Streams.upsertSink(in.toDF().toDF("k", "tag", "v"), path, "k",
      versionCol = Some("v"))
    try {
      assert(spark.read.parquet(path).orderBy($"k").select($"k", $"tag", $"v")
        .as[(Long, String, Double)].collect().toSeq ===
        Seq((1L, "a", 1.0), (2L, "b", 5.0)))
      // second batch: update k=2 (later batch wins), insert k=3
      in.addData((2L, "b2", 20.0), (3L, "c", 3.0))
      q.processAllAvailable()
      val got = spark.read.parquet(path).orderBy($"k").select($"k", $"tag", $"v")
        .as[(Long, String, Double)].collect().toSeq
      assert(got === Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
    } finally q.stop()
  }

  test("upsertSink rewrites only the hash buckets a micro-batch touches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_upsertb_").toString + "/t"
    val nBuckets = 64
    def bucketOf(k: Long): Long = spark.range(1)
      .select(pmod(xxhash64(lit(k)), lit(nBuckets.toLong))).head().getLong(0)
    def sigs(): Map[String, Set[(String, Long, Long)]] = {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map { d =>
          d.getPath.getName -> fs.listStatus(d.getPath).filter(_.isFile)
            .map(f => (f.getPath.getName, f.getLen, f.getModificationTime)).toSet
        }.toMap
    }
    val in = MemoryStream[(Long, Double)]
    in.addData((1L to 40L).map(k => (k, k * 1.0)): _*)
    val q = Streams.upsertSink(in.toDF().toDF("k", "v"), path, "k",
      numBuckets = nBuckets)
    try {
      val before = sigs()
      assert(before.size > 10) // keys spread over many buckets
      // batch 2 touches exactly two keys: update k=7, insert k=1000
      in.addData((7L, 70.0), (1000L, 1.0))
      q.processAllAvailable()
      val after = sigs()
      val touched = Set(bucketOf(7L), bucketOf(1000L)).map("bucket_id=" + _)
      before.keys.filterNot(touched).foreach { b =>
        assert(after(b) === before(b), s"untouched bucket $b was rewritten")
      }
      assert(after(s"bucket_id=${bucketOf(7L)}") !== before(s"bucket_id=${bucketOf(7L)}"))
      assert(spark.read.parquet(path).filter($"k" === 7L).select($"v")
        .head().getDouble(0) === 70.0)
      assert(spark.read.parquet(path).count() === 41)
    } finally q.stop()
  }

  test("parquetAppendSink lands micro-batches atomically") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val stream = Streams.eventStream(spark, sfDir)
    val q = Streams.parquetAppendSink(
      stream.select($"event_id", $"event_type", $"value"), out, ckpt)
    try {
      q.processAllAvailable()
      val written = spark.read.parquet(out)
      assert(written.count() === batchEvents.count())
    } finally q.stop()
  }

  test("snapshotUpsertSink merges micro-batches by key with versioned history") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_snapups_").toString + "/t"
    val t = graft.plans.Snapshots.create(spark, root,
      Seq((1L, "orig", 1.0), (2L, "orig", 2.0)).toDF("k", "tag", "v"))
    val in = MemoryStream[(Long, String, Double)]
    // within one batch the HIGHEST v wins; k=3 inserts; null-ish keys absent
    in.addData((2L, "b_old", 5.0), (2L, "b_new", 9.0), (3L, "c", 3.0))
    val q = Streams.snapshotUpsertSink(in.toDF().toDF("k", "tag", "v"), root,
      "k", versionCol = Some("v"))
    try {
      val got1 = t.read().orderBy($"k").as[(Long, String, Double)].collect().toSeq
      assert(got1 === Seq((1L, "orig", 1.0), (2L, "b_new", 9.0), (3L, "c", 3.0)))
      // second batch: update k=1, insert k=4
      in.addData((1L, "a2", 10.0), (4L, "d", 4.0))
      q.processAllAvailable()
      val got2 = t.read().orderBy($"k").as[(Long, String, Double)].collect().toSeq
      assert(got2 === Seq((1L, "a2", 10.0), (2L, "b_new", 9.0),
        (3L, "c", 3.0), (4L, "d", 4.0)))
      // replaying a batch's content converges instead of duplicating
      t.merge(Seq((4L, "d", 4.0)).toDF("k", "tag", "v"), "k", "k",
        whenMatchedSet = Map("tag" -> col("tag"), "v" -> col("v")),
        sourceKeysUnique = true)
      assert(t.read().count() === 4, "replayed upsert must not duplicate")
      // pre-stream state is still time-travelable
      assert(t.readVersion(0).count() === 2)
    } finally q.stop()
  }

  test("snapshotAppendSink commits one stamped version per micro-batch, exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_snapsink_").toString + "/t"
    val t = graft.plans.Snapshots.create(spark, root,
      Seq((0L, "seed")).toDF("id", "s"))
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"))
    val q = Streams.snapshotAppendSink(in.toDF().toDF("id", "s"), root, "sinkSpec")
    try {
      assert(t.read().count() === 3)
      val v1 = t.latest()
      assert(v1.meta.get("streamId").contains("sinkSpec") &&
        v1.meta.get("batchId").contains("0"))
      in.addData((3L, "c"))
      q.processAllAvailable()
      assert(t.read().count() === 4)
      // a crash-replay of batch 1 must be a no-op (exactly-once)
      val headBefore = t.latest().version
      t.appendBatch(Seq((3L, "c")).toDF("id", "s"), "sinkSpec", batchId = 1L)
      assert(t.latest().version === headBefore, "replayed batch must not commit")
      assert(t.read().count() === 4)
      // readers see each micro-batch as an isolated snapshot version
      assert(t.readVersion(v1.version).count() === 3)
    } finally q.stop()
  }

  test("streaming sinks accept a registered catalog name as the target") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_snapsinkn_").toString + "/t"
    val t = graft.plans.Snapshots.create(spark, root,
      Seq((0L, "seed")).toDF("id", "s"))
    graft.plans.NamedTables.registerSnapshot("streams_named_sink", root)
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"))
    val q = Streams.snapshotAppendSink(in.toDF().toDF("id", "s"),
      "streams_named_sink", "namedSink")
    try assert(t.read().count() === 2)
    finally q.stop()
  }
}
