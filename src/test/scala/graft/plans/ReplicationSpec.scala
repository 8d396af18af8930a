package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

/** Incremental snapshot-table replication (Hive REPL DUMP/LOAD analog). */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"n$i", i % 4)).toDF("id", "name", "k")

  private def sorted(t: Snapshots.SnapshotTable) =
    t.read().orderBy($"id").collect().toSeq

  test("bootstrap then append-only syncs ride the incremental path") {
    val srcRoot = tmp("graft_repl_src_")
    val tgtRoot = tmp("graft_repl_tgt_")
    val src = Snapshots.create(spark, srcRoot, rows(0, 100))

    val r1 = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r1.mode === "bootstrap")
    val tgt = Snapshots.table(spark, tgtRoot)
    assert(sorted(tgt) === sorted(src))

    src.append(rows(100, 150))
    src.append(rows(150, 160))
    val r2 = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r2.mode === "incremental" && r2.commitsApplied === 2)
    assert(sorted(tgt) === sorted(src))
    // the replica's commits carry the source version for audit
    assert(tgt.latest().meta.get("repl_source_version").contains("2"))

    // replayed sync is a no-op
    val r3 = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r3.mode === "noop" && r3.commitsApplied === 0)
  }

  test("rewriting commits route to a full overwrite sync") {
    val srcRoot = tmp("graft_repl_src_")
    val tgtRoot = tmp("graft_repl_tgt_")
    val src = Snapshots.create(spark, srcRoot, rows(0, 100))
    Replication.sync(spark, srcRoot, tgtRoot)

    src.append(rows(100, 120))
    src.deleteWhere($"id" < 10) // COW rewrite in the pending window
    val r = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r.mode === "full")
    val tgt = Snapshots.table(spark, tgtRoot)
    assert(sorted(tgt) === sorted(src))
    assert(tgt.read().count() === 110)
  }

  test("MOR deletes on the source replicate faithfully") {
    val srcRoot = tmp("graft_repl_src_")
    val tgtRoot = tmp("graft_repl_tgt_")
    val src = Snapshots.create(spark, srcRoot, rows(0, 50))
    src.deleteWhereMergeOnRead($"id" >= 40)
    val r1 = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r1.mode === "bootstrap")
    assert(Snapshots.table(spark, tgtRoot).read().count() === 40)

    src.deleteWhereMergeOnRead($"id" >= 30) // new sidecar -> non-additive
    val r2 = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r2.mode === "full")
    assert(Snapshots.table(spark, tgtRoot).read().count() === 30)
  }

  test("schema evolution rebootstraps the replica") {
    val srcRoot = tmp("graft_repl_src_")
    val tgtRoot = tmp("graft_repl_tgt_")
    val src = Snapshots.create(spark, srcRoot, rows(0, 20))
    Replication.sync(spark, srcRoot, tgtRoot)
    src.addColumns(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType))))
    src.append(Seq((100L, "x", 0, "e")).toDF("id", "name", "k", "extra"))
    val r = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r.mode === "rebootstrap")
    val tgt = Snapshots.table(spark, tgtRoot)
    assert(tgt.read().columns.toSeq === Seq("id", "name", "k", "extra"))
    assert(sorted(tgt) === sorted(src))
  }

  test("compaction on the source emits nothing to the replica") {
    val srcRoot = tmp("graft_repl_src_")
    val tgtRoot = tmp("graft_repl_tgt_")
    val src = Snapshots.create(spark, srcRoot, rows(0, 20).repartition(4))
    Replication.sync(spark, srcRoot, tgtRoot)
    src.compact()
    src.append(rows(20, 25))
    val r = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r.mode === "incremental" && r.commitsApplied === 1)
    assert(Snapshots.table(spark, tgtRoot).read().count() === 25)
  }

  test("a foreign table at the target is refused; mismatched source too") {
    val srcRoot = tmp("graft_repl_src_")
    val otherRoot = tmp("graft_repl_other_")
    Snapshots.create(spark, srcRoot, rows(0, 10))
    Snapshots.create(spark, otherRoot, rows(0, 5))
    intercept[IllegalArgumentException] {
      Replication.sync(spark, srcRoot, otherRoot)
    }
    val tgtRoot = tmp("graft_repl_tgt_")
    Replication.sync(spark, srcRoot, tgtRoot)
    val src2 = tmp("graft_repl_src2_")
    Snapshots.create(spark, src2, rows(0, 5))
    intercept[IllegalArgumentException] {
      Replication.sync(spark, src2, tgtRoot)
    }
  }

  test("a crash between target append and state write never double-applies") {
    val srcRoot = tmp("graft_repl_src_")
    val tgtRoot = tmp("graft_repl_tgt_")
    val src = Snapshots.create(spark, srcRoot, rows(0, 20))
    Replication.sync(spark, srcRoot, tgtRoot)
    src.append(rows(20, 30))
    Replication.sync(spark, srcRoot, tgtRoot)
    assert(Snapshots.table(spark, tgtRoot).read().count() === 30)
    // simulate the crash window: the append landed (stamped in the target
    // log) but the sidecar still says the OLD version
    val fs = new org.apache.hadoop.fs.Path(tgtRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(tgtRoot, "_repl_state.json"), true)
    out.write(s"""{"sourceRoot":"$srcRoot","lastApplied":0}""".getBytes("UTF-8"))
    out.close()
    val r = Replication.sync(spark, srcRoot, tgtRoot)
    assert(Snapshots.table(spark, tgtRoot).read().count() === 30,
      "rewound sidecar must not re-apply the already-stamped commit")
    assert(r.commitsApplied === 0)
  }

  test("an interrupted bootstrap is adopted, not refused") {
    val srcRoot = tmp("graft_repl_src_")
    val tgtRoot = tmp("graft_repl_tgt_")
    val src = Snapshots.create(spark, srcRoot, rows(0, 30))
    // simulate the crash window: table created, final state write lost
    // (the intent marker with lastApplied = -1 is what survives)
    Snapshots.create(spark, tgtRoot, rows(0, 10)) // partial/stale bootstrap
    val fs = new org.apache.hadoop.fs.Path(tgtRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(tgtRoot, "_repl_state.json"), true)
    out.write(s"""{"sourceRoot":"$srcRoot","lastApplied":-1}"""
      .getBytes("UTF-8"))
    out.close()
    val r = Replication.sync(spark, srcRoot, tgtRoot)
    assert(r.mode === "full")
    assert(sorted(Snapshots.table(spark, tgtRoot)) === sorted(src))
    // and the next sync is a clean no-op
    assert(Replication.sync(spark, srcRoot, tgtRoot).mode === "noop")
  }

  test("SQL verb: REPLICATE TABLE name TO '<root>'") {
    val srcRoot = tmp("graft_repl_src_")
    val tgtRoot = tmp("graft_repl_tgt_")
    Snapshots.create(spark, srcRoot, rows(0, 30))
    NamedTables.registerSnapshot("repl_src_t", srcRoot)
    val out = Engine.sql(spark, sfDir, s"REPLICATE TABLE repl_src_t TO '$tgtRoot'")
      .head()
    assert(out.getString(2) === "bootstrap")
    Snapshots.table(spark, srcRoot).append(rows(30, 40))
    val out2 = Engine.sql(spark, sfDir, s"REPLICATE TABLE repl_src_t TO '$tgtRoot'")
      .head()
    assert(out2.getString(2) === "incremental")
    assert(Snapshots.table(spark, tgtRoot).read().count() === 40)
    NamedTables.drop("repl_src_t")
  }
}
