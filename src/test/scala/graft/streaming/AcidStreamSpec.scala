package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.AcidOrc

/** The ACID warehouse streaming SOURCE: write-id-offset micro-batches,
  * exactly-once emission per delta commit, snapshot-reconstructed first
  * batch, delete contract, schema pinning.
  */
class AcidStreamSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_acidstream_").toString + "/t"

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i")).toDF("id", "s")
  }

  test("first batch is the reconstructed snapshot; new deltas stream " +
      "exactly once per commit") {
    val root = freshRoot()
    AcidOrc.appendDelta(spark, root, 1L, nums(0, 10))
    // a delete already in the layout is part of the FIRST snapshot batch
    val doomed = AcidOrc.rawEvents(spark, s"$root/delta_1_1/bucket_00000")
      .where(col("row.id") < 2)
      .select(col("originalTransaction"), col("bucket"), col("rowId"))
    AcidOrc.appendDeleteDelta(spark, root, 2L, doomed)
    val stream = spark.readStream.format("acid-stream").load(root)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.toSeq === Seq("id", "s"))
    val q = Streams.drainToMemory(stream, "acidstream_basic")
    try {
      assert(spark.table("acidstream_basic").count() === 8)
      // two later commits land as micro-batches, once each
      AcidOrc.appendDelta(spark, root, 3L, nums(10, 15))
      q.processAllAvailable()
      AcidOrc.appendDelta(spark, root, 4L, nums(15, 18))
      q.processAllAvailable()
      val got = spark.table("acidstream_basic")
      assert(got.count() === 16)
      assert(got.select(sum(col("id"))).head.getLong(0) ===
        (2 until 18).map(_.toLong).sum)
      // nothing new emits nothing (exactly-once)
      q.processAllAvailable()
      assert(spark.table("acidstream_basic").count() === 16)
    } finally q.stop()
  }

  test("mid-stream delete_delta fails the stream; ignoreDeletes skips it") {
    val root = freshRoot()
    AcidOrc.appendDelta(spark, root, 1L, nums(0, 5))
    val q = Streams.drainToMemory(
      spark.readStream.format("acid-stream").load(root), "acidstream_del")
    try {
      import spark.implicits._
      assert(spark.table("acidstream_del").count() === 5)
      AcidOrc.appendDeleteDelta(spark, root, 2L,
        Seq((1L, AcidOrc.encodeBucket(0), 0L))
          .toDF("originalTransaction", "bucket", "rowId"))
      val e = intercept[Exception] { q.processAllAvailable() }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
      assert(chain.contains("delete events"), chain)
    } finally q.stop()
    // ignoreDeletes: same layout streams on, inserts only
    val q2 = Streams.drainToMemory(
      spark.readStream.format("acid-stream").option("ignoreDeletes", "true")
        .load(root), "acidstream_del_ok")
    try {
      // fresh query: first batch reconstructs WITH the delete applied
      assert(spark.table("acidstream_del_ok").count() === 4)
      AcidOrc.appendDelta(spark, root, 3L, nums(5, 7))
      q2.processAllAvailable()
      assert(spark.table("acidstream_del_ok").count() === 6)
    } finally q2.stop()
  }

  test("mid-stream add-columns evolution: stream schema stays pinned") {
    import spark.implicits._
    val root = freshRoot()
    AcidOrc.appendDelta(spark, root, 1L, nums(0, 3))
    val q = Streams.drainToMemory(
      spark.readStream.format("acid-stream").load(root), "acidstream_evo")
    try {
      AcidOrc.appendDelta(spark, root, 2L,
        Seq((100L, "wide", 9.5)).toDF("id", "s", "extra"))
      q.processAllAvailable()
      val got = spark.table("acidstream_evo")
      assert(got.columns.toSeq === Seq("id", "s"))
      assert(got.count() === 4)
      assert(got.where($"id" === 100L).select($"s").head.getString(0)
        === "wide")
    } finally q.stop()
  }

  test("withChangeType: delete commits arrive as full pre-image " +
      "retraction rows; inserts carry their write id") {
    import spark.implicits._
    val root = freshRoot()
    AcidOrc.appendDelta(spark, root, 1L, nums(0, 5))
    val q = Streams.drainToMemory(
      spark.readStream.format("acid-stream")
        .option("withChangeType", "true").load(root), "acidstream_cdc")
    try {
      // first batch: the snapshot, all inserts, tagged with write id 1
      val first = spark.table("acidstream_cdc")
      assert(first.columns.toSeq ===
        Seq("id", "s", "_change_type", "_commit_writeid"))
      assert(first.count() === 5)
      assert(first.where($"_change_type" === "insert" &&
        $"_commit_writeid" === 1L).count() === 5)
      // a delete commit arrives as retraction rows WITH the row images
      assert(AcidOrc.deleteWhere(spark, root, $"id" < 2) === 2L)
      q.processAllAvailable()
      val dels = spark.table("acidstream_cdc")
        .where($"_change_type" === "delete").orderBy($"id").collect()
      assert(dels.map(_.getLong(0)).toSeq === Seq(0L, 1L))
      assert(dels.map(_.getString(1)).toSeq === Seq("row0", "row1"))
      assert(dels.forall(_.getLong(3) === 2L)) // the deleting write id
      // a mixed batch: one insert commit + one delete commit
      AcidOrc.appendDelta(spark, root, 3L, nums(5, 7))
      assert(AcidOrc.deleteWhere(spark, root, $"id" === 3L) === 1L)
      q.processAllAvailable()
      val all = spark.table("acidstream_cdc")
      assert(all.where($"_change_type" === "insert").count() === 7)
      assert(all.where($"_change_type" === "delete").count() === 3)
      assert(all.where($"_change_type" === "delete" && $"id" === 3L)
        .select($"_commit_writeid").head.getLong(0) === 4L)
    } finally q.stop()
  }

  test("compaction spans over consumed ids emit nothing") {
    val root = freshRoot()
    AcidOrc.appendDelta(spark, root, 1L, nums(0, 5))
    AcidOrc.appendDelta(spark, root, 2L, nums(5, 8))
    val q = Streams.drainToMemory(
      spark.readStream.format("acid-stream").load(root), "acidstream_cmp")
    try {
      assert(spark.table("acidstream_cmp").count() === 8)
      // a minor compaction rewrites ids 1..3 as one span (same rows +
      // a new id-3 delta it folded in); only genuinely-new data may emit
      AcidOrc.appendDelta(spark, root, 3L, nums(8, 10))
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      AcidOrc.appendDelta(spark, root, 4L, nums(0, 10)) // the folded image
      fs.rename(new org.apache.hadoop.fs.Path(root, "delta_4_4"),
        new org.apache.hadoop.fs.Path(root, "delta_1_3"))
      q.processAllAvailable()
      // delta_3_3 emitted (2 rows); delta_1_3 straddles id 2 -> nothing
      assert(spark.table("acidstream_cmp").count() === 10)
    } finally q.stop()
  }

  test("SQL COMPACT minor auto-wires the lowest live consumer offset: a " +
      "lagging stream survives the fold without losing write ids") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = freshRoot()
    AcidOrc.appendDelta(spark, root, 1L, nums(0, 4))
    AcidOrc.appendDelta(spark, root, 2L, nums(4, 6))
    // drive the V1 Source directly so the lag is deterministic (a live
    // memory-sink query keeps polling and would consume the new commits
    // before the compactor runs)
    val src = new AcidStreamSource(spark, root, ignoreDeletes = false)
    // snapshot batch at offset 2: registers "consumed <= 2" (the returned
    // frame is streaming-tagged; its content is AcidOrc.read at the offset)
    src.getBatch(None, LongOffset(2L))
    assert(AcidOrc.read(spark, root, maxWriteId = 2L).count() === 6)
    assert(AcidStreamRegistry.lowestFloor(spark, root) === 2L)
    // the consumer now LAGS: three more commits land unconsumed
    (3L to 5L).foreach(w => AcidOrc.appendDelta(spark, root, w,
      nums(10 * w.toInt, 10 * w.toInt + 2)))
    // an operator runs the SQL verb with no explicit floor — the verb
    // must split the fold at the registered offset 2, never across it
    graft.Engine.sql(spark, sfDir, s"COMPACT HIVE ACID '$root' 'minor'")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).sorted.toSeq
    assert(names === Seq("delta_1_2", "delta_3_5"), names.mkString(","))
    // the lagging consumer drains ids 3..5 exactly once — no data loss
    src.getBatch(Some(LongOffset(2L)), LongOffset(5L))
    assert(AcidOrc.readChanges(spark, root, 2L, 5L).count() === 6)
    // the IN-FLIGHT batch's latched end is a protection point too: new
    // commits land while (2, 5] is processing, and the fold must not
    // create a span crossing 5 (a retry re-requests exactly (2, 5])
    assert(AcidStreamRegistry.splitPoints(spark, root) === Seq(2L, 5L))
    (6L to 7L).foreach(w => AcidOrc.appendDelta(spark, root, w,
      nums(100 * w.toInt, 100 * w.toInt + 1)))
    graft.Engine.sql(spark, sfDir, s"COMPACT HIVE ACID '$root' 'minor'")
    val names2 = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).sorted.toSeq
    assert(names2 === Seq("delta_1_2", "delta_3_5", "delta_6_7"),
      names2.mkString(","))
    // the retried in-flight range AND the follow-up range both drain
    assert(AcidOrc.readChanges(spark, root, 2L, 5L).count() === 6)
    assert(AcidOrc.readChanges(spark, root, 5L, 7L).count() === 2)
    src.stop()
    // stopped stream deregisters: the floor no longer binds the compactor
    assert(AcidStreamRegistry.lowestFloor(spark, root) === -1L)
  }

  test("insert-only (MM) trees stream: snapshot first batch, exactly-once " +
      "incremental commits, CDC commit ids from the dir names") {
    import graft.sources.AcidMm
    val root = freshRoot()
    AcidMm.appendDelta(spark, root, 1L, nums(0, 6))
    val stream = spark.readStream.format("acid-stream").load(root)
    assert(stream.schema.fieldNames.toSeq === Seq("id", "s"))
    val q = Streams.drainToMemory(stream, "acidstream_mm")
    try {
      assert(spark.table("acidstream_mm").count() === 6)
      AcidMm.appendDelta(spark, root, 2L, nums(6, 9))
      q.processAllAvailable()
      AcidMm.appendDelta(spark, root, 3L, nums(9, 10))
      q.processAllAvailable()
      val got = spark.table("acidstream_mm")
      assert(got.count() === 10)
      assert(got.select(sum(col("id"))).head.getLong(0) ===
        (0 until 10).map(_.toLong).sum)
      q.processAllAvailable() // nothing new emits nothing
      assert(spark.table("acidstream_mm").count() === 10)
    } finally q.stop()
    // CDC shape: every row tags 'insert' with the committing dir's id
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val src = new AcidStreamSource(spark, root, ignoreDeletes = false,
      withChangeType = true)
    assert(src.schema.fieldNames.takeRight(2).toSeq ===
      Seq("_change_type", "_commit_writeid"))
    src.getBatch(None, LongOffset(3L)) // registry side effect only
    val cdc = graft.sources.AcidMm.readChanges(spark, root, 0L, 3L,
      withCommitId = true)
    assert(cdc.count() === 10)
    assert(cdc.groupBy(col("_commit_writeid")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 6L, 2L -> 3L, 3L -> 1L))
    src.stop()
  }
}
