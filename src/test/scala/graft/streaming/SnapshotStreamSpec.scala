package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.{NamedTables, Snapshots}

/** The snapshot-table streaming SOURCE: version-offset micro-batches,
  * exactly-once emission per commit, ignoreDeletes/ignoreChanges contracts,
  * and end-to-end snapshot-to-snapshot streaming.
  */
class SnapshotStreamSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_snapstream_").toString + "/t"

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i")).toDF("id", "s")
  }

  test("first batch is the snapshot; appends stream exactly once per commit") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    val stream = spark.readStream.format("snapshot-stream").load(root)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.toSeq === Seq("id", "s"))
    val q = Streams.drainToMemory(stream, "snapstream_basic")
    try {
      assert(spark.table("snapstream_basic").count() === 10)
      // two separate commits land as later micro-batches, once each
      t.append(nums(10, 15))
      t.append(nums(15, 18))
      q.processAllAvailable()
      val got = spark.table("snapstream_basic")
      assert(got.count() === 18)
      assert(got.select(sum(col("id"))).head.getLong(0) === (0 until 18).sum)
      // re-processing with nothing new emits nothing (exactly-once)
      q.processAllAvailable()
      assert(spark.table("snapstream_basic").count() === 18)
    } finally q.stop()
  }

  test("registered names resolve; MOR deletes pending at start are applied") {
    import spark.implicits._
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 20))
    t.deleteWhereMergeOnRead($"id" < 5)
    NamedTables.registerSnapshot("snapstream_named", root)
    try {
      val q = Streams.drainToMemory(
        spark.readStream.format("snapshot-stream").load("snapstream_named"),
        "snapstream_named_out")
      try {
        val got = spark.table("snapstream_named_out")
        assert(got.count() === 15, "initial snapshot must fold pending MOR deletes")
        assert(got.filter($"id" < 5).count() === 0)
      } finally q.stop()
    } finally NamedTables.drop("snapstream_named")
  }

  test("delete commits fail the stream unless ignoreDeletes; compaction is silent") {
    import spark.implicits._
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    val q = Streams.drainToMemory(
      spark.readStream.format("snapshot-stream").load(root), "snapstream_del")
    try {
      // pure removal (position-delete sidecar, no files added)
      t.deleteWhereMergeOnRead($"id" === 3)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("ignoreDeletes"))
    } finally q.stop()
    // with ignoreDeletes the removal is skipped and appends keep flowing;
    // a compaction between them emits nothing
    val q2 = Streams.drainToMemory(
      spark.readStream.format("snapshot-stream")
        .option("ignoreDeletes", "true").load(root), "snapstream_del2")
    try {
      val base = spark.table("snapstream_del2").count() // snapshot post-delete
      t.compact(minInputFiles = 2)
      q2.processAllAvailable()
      assert(spark.table("snapstream_del2").count() === base,
        "compaction must not re-emit rows")
      t.append(nums(100, 103))
      q2.processAllAvailable()
      assert(spark.table("snapstream_del2").count() === base + 3)
    } finally q2.stop()
  }

  test("update commits need ignoreChanges, which re-emits rewritten files") {
    import spark.implicits._
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10).repartition(2))
    val q = Streams.drainToMemory(
      spark.readStream.format("snapshot-stream")
        .option("ignoreChanges", "true").load(root), "snapstream_upd")
    try {
      t.updateWhere($"id" === 7, Map("s" -> lit("updated")))
      q.processAllAvailable()
      val got = spark.table("snapstream_upd")
      assert(got.filter($"s" === "updated").count() === 1)
      // the rewritten FILE re-emits (duplicates allowed under ignoreChanges),
      // but rows from untouched files don't
      assert(got.count() >= 11 && got.count() < 20)
    } finally q.stop()
  }

  test("rename mid-stream keeps flowing under the stream's original names") {
    import spark.implicits._
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 5))
    val q = Streams.drainToMemory(
      spark.readStream.format("snapshot-stream").load(root), "snapstream_ren")
    try {
      t.renameColumn("s", "label")
      t.append((10 until 13).map(i => (i.toLong, s"row$i")).toDF("id", "label"))
      q.processAllAvailable()
      val got = spark.table("snapstream_ren")
      assert(got.columns.toSeq === Seq("id", "s"), "stream schema is fixed at start")
      assert(got.count() === 8)
      assert(got.filter($"s" === "row11").count() === 1,
        "post-rename appends must flow into the original stream column")
    } finally q.stop()
  }

  test("snapshot-to-snapshot: stream a table into another table exactly once") {
    import spark.implicits._
    val src = freshRoot()
    val dst = freshRoot()
    val t = Snapshots.create(spark, src, nums(0, 10))
    Snapshots.create(spark, dst, nums(0, 0))
    val q = Streams.snapshotAppendSink(
      spark.readStream.format("snapshot-stream").load(src), dst,
      "snapstream_e2e")
    try {
      q.processAllAvailable()
      t.append(nums(10, 14))
      q.processAllAvailable()
      val out = Snapshots.table(spark, dst).read()
      assert(out.count() === 14)
      assert(out.select(sum($"id")).head.getLong(0) === (0 until 14).sum)
    } finally q.stop()
  }
}
