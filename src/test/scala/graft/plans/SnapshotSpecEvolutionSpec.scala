package graft.plans

import org.apache.spark.sql.functions._
import graft.{Engine, SparkSpec}

/** Partition-spec evolution (`ALTER TABLE ... SET PARTITION SPEC`, ref
  * ql/ddl/table/partition/set/AlterTableSetPartitionSpecAnalyzer.java +
  * iceberg-handler HiveIcebergMetaHook.java:337,519): the commit is
  * metadata-only, old files stay readable AND pruned under their birth
  * spec, new files land under the new spec, and time travel preserves the
  * old spec.
  */
class SnapshotSpecEvolutionSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_specevo_").toString + "/t"

  /** (id, k, d, s): k in 0..2, d in {a, b}, easily partitionable both ways. */
  private def rows(lo: Int, hi: Int, dOf: Int => String = i => if (i % 2 == 0) "a" else "b") = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, (i % 3).toLong, dOf(i), s"r$i"))
      .toDF("id", "k", "d", "s")
  }

  test("evolution roundtrip: both generations read with correct values") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 300), partitionBy = Seq("k"))
    val v0Files = t.latest().files
    val m = t.setPartitionSpec(Seq("d"))
    assert(m.action === "set-partition-spec")
    assert(m.partitionCols === Seq("d"))
    assert(m.files === v0Files, "the evolution commit must move no data")
    t.append(rows(300, 500, _ => "x"))
    // every row reconstructs BOTH columns: old rows take k from the path
    // and d from the data; new rows take d from the path and k from data
    val got = t.read().select(sum("id"), sum("k"),
      count(when(col("d") === "x", 1)), count(when(col("d") === "a", 1)))
      .head
    assert(got.getLong(0) === (0L until 500L).sum)
    assert(got.getLong(1) === (0 until 500).map(_ % 3).sum)
    assert(got.getLong(2) === 200L)
    assert(got.getLong(3) === 150L)
    // per-row spot check across generations
    val byId = t.read().filter(col("id").isin(7, 450)).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(byId.toSeq === Seq((7L, 1L, "b"), (450L, 0L, "x")))
  }

  test("pruning: each generation prunes under its own spec") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 300), partitionBy = Seq("k"))
    t.setPartitionSpec(Seq("d"))
    t.append(rows(300, 500, _ => "x")) // new-gen: k in 0..2 (data), d = x (path)
    val head = t.latest()
    val oldGen = head.files.filter(_.contains("k="))
    val newGen = head.files.filter(_.contains("d="))
    assert(oldGen.nonEmpty && newGen.nonEmpty)
    assert((oldGen ++ newGen).toSet === head.files.toSet)
    // predicate on the OLD partition column: old generation prunes by
    // path (exact), new generation by stats (k spans 0..2 in every new
    // file, so all new files survive — conservative, correct)
    val onK = t.planFiles(head, col("k") === 1L)
    assert(onK.toSet === (oldGen.filter(_.contains("k=1")) ++ newGen).toSet,
      s"old-gen must prune to k=1 by path: $onK")
    // predicate on the NEW partition column: new generation prunes by
    // path; old generation prunes by STATS (d was a data column then, and
    // its per-file min/max a..b excludes x)
    val onD = t.planFiles(head, col("d") === "x")
    assert(onD.toSet === newGen.toSet,
      s"expected only the d=x generation, got $onD")
    // conjunction prunes BOTH generations at once
    val both = t.planFiles(head, col("k") === 1L && col("d") === "a")
    assert(both.toSet === oldGen.filter(_.contains("k=1")).toSet)
    // correctness of the pruned reads
    assert(t.readWhere(col("k") === 1L).count() ===
      (0 until 500).count(_ % 3 == 1))
    assert(t.readWhere(col("d") === "x").count() === 200)
  }

  test("time travel sees the birth spec; history records the evolution") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 100), partitionBy = Seq("k"))
    t.setPartitionSpec(Seq("d"))
    t.append(rows(100, 150))
    assert(t.readVersion(0L).count() === 100)
    assert(t.resolvedManifest(0L).partitionCols === Seq("k"))
    assert(t.latest().partitionCols === Seq("d"))
    assert(t.history().map(_.action) ===
      Seq("create", "set-partition-spec", "append"))
    assert(t.history()(1).meta("previous-spec") === "k")
    // restore to the pre-evolution version brings the old spec back
    t.restore(0L)
    assert(t.latest().partitionCols === Seq("k"))
    t.append(rows(150, 160))
    assert(t.latest().files.forall(f => !f.contains("d=")),
      "writes after restore must use the restored spec")
  }

  test("evolving to and from unpartitioned") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 60)) // unpartitioned
    t.setPartitionSpec(Seq("k"))
    t.append(rows(60, 120))
    assert(t.read().count() === 120)
    assert(t.read().agg(sum("k")).head.getLong(0) ===
      (0 until 120).map(_ % 3).sum)
    // drop back to unpartitioned: three generations coexist
    t.setPartitionSpec(Nil)
    t.append(rows(120, 150))
    assert(t.read().count() === 150)
    val onK = t.planFiles(t.latest(), col("k") === 2L)
    // the middle generation still prunes by path
    val midGen = t.latest().files.filter(_.contains("k="))
    assert(midGen.exists(_.contains("k=2")))
    assert(onK.filter(_.contains("k=")).forall(_.contains("k=2")))
  }

  test("DML and compaction across generations") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 200), partitionBy = Seq("k"))
    t.setPartitionSpec(Seq("d"))
    t.append(rows(200, 300, _ => "x"))
    // COW delete hits both generations
    t.deleteWhere(col("id") % 10 === 0)
    assert(t.read().count() === 270)
    assert(t.read().filter(col("id") % 10 === 0).count() === 0)
    // MOR update exercises the per-generation _metadata provenance path
    t.updateWhereMergeOnRead(col("id") === 7, Map("s" -> lit("patched")))
    assert(t.read().filter(col("s") === "patched").count() === 1)
    assert(t.read().count() === 270)
    // compaction rewrites under the CURRENT spec: the old generation
    // migrates, leaving a single-spec table (and the plain single-relation
    // scan path)
    t.compact(targetBytes = 1L << 30, minInputFiles = 1)
    assert(t.latest().files.forall(f => f.contains("d=") && !f.contains("k=")),
      s"compact must migrate files to the current spec: ${t.latest().files}")
    assert(t.read().count() === 270)
    assert(t.read().filter(col("s") === "patched").count() === 1)
    assert(t.read().agg(sum("id")).head.getLong(0) ===
      (0L until 300L).filterNot(_ % 10 == 0).sum)
  }

  test("SQL verb + guards") {
    import spark.implicits._
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    val t = Snapshots.create(spark, root, rows(0, 90), partitionBy = Seq("k"))
    NamedTables.registerSnapshot("evo_t", root)
    try {
      sql("ALTER TABLE evo_t SET PARTITION SPEC (d)")
      assert(t.latest().partitionCols === Seq("d"))
      sql("INSERT INTO evo_t VALUES (1000, 9, 'z', 'ins')")
      assert(sql("SELECT count(*) AS n FROM evo_t WHERE d = 'z'")
        .head.getLong(0) === 1)
      assert(sql("SELECT count(*) AS n FROM evo_t").head.getLong(0) === 91)
      // guards
      val e = intercept[IllegalArgumentException] {
        t.setPartitionSpec(Seq("nope")) }
      assert(e.getMessage.contains("no such column"))
      // same spec is a no-op commit
      val before = t.history().size
      t.setPartitionSpec(Seq("d"))
      assert(t.history().size === before)
    } finally NamedTables.drop("evo_t")
    // bucket columns can never become partition columns
    val root2 = freshRoot()
    val tb = Snapshots.create(spark, root2, rows(0, 50),
      bucketBy = Some(("k", 4)))
    val e2 = intercept[IllegalArgumentException] {
      tb.setPartitionSpec(Seq("k")) }
    assert(e2.getMessage.contains("bucket"))
  }
}
