package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Snapshot-versioned tables: manifest log, snapshot isolation, time travel,
  * file-granularity COW, optimistic concurrency (real racing writers), and
  * vacuum.
  */
class SnapshotsSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_").toString + "/t"

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i", i % 4)).toDF("id", "s", "k")
  }

  test("create/read round-trip and history") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    assert(t.read().count() === 100)
    val h = t.history()
    assert(h.map(_.action) === Seq("create"))
    assert(h.head.version === 0L)
    assert(t.read().columns.toSeq === Seq("id", "s", "k"))
  }

  test("append adds rows and bumps the version; old version still readable") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    t.append(nums(100, 150))
    assert(t.read().count() === 150)
    assert(t.latest().version === 1L)
    assert(t.readVersion(0).count() === 100)
  }

  test("deleteWhere is snapshot-isolated: v0 keeps the full table") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    val m = t.deleteWhere(col("id") < 30)
    assert(m.action === "delete")
    assert(t.read().count() === 70)
    assert(t.read().filter(col("id") < 30).count() === 0)
    assert(t.readVersion(0).count() === 100)
  }

  test("updateWhere rewrites matching rows only") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    t.updateWhere(col("id") >= 90, Map("s" -> lit("UPDATED")))
    val got = t.read()
    assert(got.filter(col("s") === "UPDATED").count() === 10)
    assert(got.filter(col("s").startsWith("row")).count() === 90)
    assert(got.count() === 100)
  }

  test("readAsOf time-travels by commit timestamp") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    val afterCreate = t.latest().timestampMs
    Thread.sleep(5)
    t.deleteWhere(col("id") >= 50)
    assert(t.readAsOf(afterCreate).count() === 100)
    assert(t.readAsOf(System.currentTimeMillis()).count() === 50)
    intercept[IllegalArgumentException](t.readAsOf(afterCreate - 10000))
  }

  test("COW rewrites only affected files; untouched files carry by reference") {
    val root = freshRoot()
    // two separate appends -> at least two distinct file sets
    val t = Snapshots.create(spark, root, nums(0, 100))
    t.append(nums(1000, 1100))
    val before = t.latest()
    // hits only the second commit's id range
    t.deleteWhere(col("id") >= 1050)
    val after = t.latest()
    val keptFromBefore = after.files.toSet.intersect(before.files.toSet)
    assert(keptFromBefore.nonEmpty,
      "the unaffected create-commit files must survive COW by reference")
    assert(after.files.toSet != before.files.toSet)
    assert(t.read().count() === 150)
  }

  test("no-op DML commits nothing") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    val v = t.latest().version
    t.deleteWhere(col("id") > 9999)
    assert(t.latest().version === v)
  }

  test("partitioned snapshot: partition values round-trip and prune COW") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100), partitionBy = Seq("k"))
    assert(t.read().count() === 100)
    assert(t.read().filter(col("k") === 2).count() === 25)
    assert(t.read().columns.toSeq === Seq("id", "s", "k"))
    val before = t.latest()
    t.deleteWhere(col("k") === 2) // affects exactly the k=2 files
    val after = t.latest()
    assert(t.read().count() === 75)
    val removed = before.files.toSet -- after.files.toSet
    assert(removed.nonEmpty && removed.forall(_.contains("k=2")),
      s"only k=2 files may be rewritten, removed: $removed")
    // update may not assign a partition column
    intercept[IllegalArgumentException](
      t.updateWhere(col("id") === 1, Map("k" -> lit(9))))
  }

  test("concurrent appends all win (optimistic rebase, no lost commits)") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      import scala.jdk.CollectionConverters._
      val jobs = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            // each thread opens its own handle, like a separate writer would
            Snapshots.table(spark, root).append(nums(100 * (i + 1), 100 * (i + 1) + 10))
          }
        })
      }
      jobs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(t.latest().version === 8L, "all 8 appends must commit")
    assert(t.read().count() === 10 + 8 * 10)
  }

  test("racing COW writers serialize: both predicates land, no lost update") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val a = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          Snapshots.table(spark, root).deleteWhere(col("id") < 20)
      })
      val b = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          Snapshots.table(spark, root)
            .updateWhere(col("id") >= 80, Map("s" -> lit("X")))
      })
      a.get(120, java.util.concurrent.TimeUnit.SECONDS)
      b.get(120, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdown()
    val got = t.read()
    assert(got.count() === 80)
    assert(got.filter(col("id") < 20).count() === 0, "delete must not be lost")
    assert(got.filter(col("s") === "X").count() === 20, "update must not be lost")
  }

  test("exhausted retries raise ConcurrentModificationException") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 10))
    // jam the next version slot so the writer's CAS can never succeed
    val log = java.nio.file.Paths.get(root, "_graft_log")
    java.nio.file.Files.write(log.resolve("v00000001.json"),
      java.nio.file.Files.readAllBytes(log.resolve("v00000000.json")))
    intercept[Snapshots.ConcurrentModificationException](
      t.append(nums(10, 20), maxRetries = 0))
  }

  test("vacuum drops unreferenced files and pruned versions") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, nums(0, 100))
    t.deleteWhere(col("id") < 50)
    t.vacuum(retainLast = 1)
    assert(t.read().count() === 50, "current snapshot unaffected by vacuum")
    intercept[IllegalArgumentException](t.readVersion(0))
    // every surviving data file is referenced by the retained manifest
    val dataDir = java.nio.file.Paths.get(root, "data")
    val onDisk = java.nio.file.Files.walk(dataDir).iterator()
    import scala.jdk.CollectionConverters._
    val parquets = onDisk.asScala.filter(p =>
      java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith(".")).toSeq
    val referenced = t.latest().files.map(f =>
      java.nio.file.Paths.get(root, f).toString).toSet
    assert(parquets.forall(p => referenced.contains(p.toString)),
      s"unreferenced files survived vacuum: ${parquets.filterNot(p => referenced.contains(p.toString))}")
  }
}
