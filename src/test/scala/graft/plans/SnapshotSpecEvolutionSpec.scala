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

  /** (id, ts, s): ts = 2026-01-01 00:00 UTC + id hours — 24 rows per day. */
  private def tsRows(lo: Int, hi: Int) = {
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
    (lo until hi).map { i =>
      (i.toLong,
        java.sql.Timestamp.valueOf(base.plusHours(i.toLong)),
        s"r${i % 7}_$i")
    }.toDF("id", "ts", "s")
  }

  test("transform spec day(ts): a ts range predicate prunes day dirs " +
      "even without stats; re-grain to hour(ts) composes") {
    val root = freshRoot()
    // gen 1: identity-partitioned by a column; gen 2: day(ts)
    val t = Snapshots.create(spark, root, tsRows(0, 48)
      .withColumn("g", lit("old")), partitionBy = Seq("g"))
    val m = t.setPartitionSpec(Seq("day(ts)"))
    assert(m.partitionCols === Seq("ts_day"))
    t.append(tsRows(48, 144).withColumn("g", lit("new"))) // days 3,4,5,6
    val head = t.latest()
    val dayGen = head.files.filter(_.contains("ts_day="))
    assert(dayGen.nonEmpty, head.files.mkString(","))
    assert(dayGen.map(_.split('/').find(_.startsWith("ts_day=")).get).toSet
      === Set("ts_day=2026-01-03", "ts_day=2026-01-04", "ts_day=2026-01-05",
        "ts_day=2026-01-06"))
    // stats STRIPPED: only the transform mapping can prune — a ts range
    // inside day 4 must keep exactly that day's dirs of the new
    // generation (old-gen files have no ts dirs and survive)
    val noStats = head.copy(stats = Map.empty)
    val v1 = java.sql.Timestamp.valueOf("2026-01-04 06:00:00")
    val v2 = java.sql.Timestamp.valueOf("2026-01-04 18:00:00")
    val pruned = t.planFiles(noStats, col("ts") >= v1 && col("ts") < v2)
    assert(pruned.filter(_.contains("ts_day="))
      .forall(_.contains("ts_day=2026-01-04")), pruned.mkString(","))
    assert(pruned.exists(_.contains("ts_day=2026-01-04")))
    // WITH stats both generations prune (old gen by per-file ts min/max)
    val withStats = t.planFiles(head, col("ts") >= v1 && col("ts") < v2)
    assert(withStats.size < head.files.size)
    assert(t.readWhere(col("ts") >= v1 && col("ts") < v2).count() === 12)
    // the aggregate over both generations is exact
    assert(t.read().agg(sum("id")).head.getLong(0) === (0L until 144L).sum)
    // day -> hour re-grain: one more metadata commit
    val m2 = t.setPartitionSpec(Seq("hour(ts)"))
    assert(m2.partitionCols === Seq("ts_hour"))
    t.append(tsRows(144, 168).withColumn("g", lit("hourly")))
    val head2 = t.latest()
    assert(head2.files.exists(_.contains("ts_hour=2026-01-07-")),
      head2.files.mkString(","))
    val hv = java.sql.Timestamp.valueOf("2026-01-07 05:30:00")
    val hp = t.planFiles(head2.copy(stats = Map.empty), col("ts") === hv)
    assert(hp.filter(_.contains("ts_hour="))
      .forall(_.contains("ts_hour=2026-01-07-05")), hp.mkString(","))
    assert(t.read().count() === 168)
    // time travel preserves every generation's spec
    assert(t.resolvedManifest(0L).partitionCols === Seq("g"))
    assert(t.history().map(_.partitionCols).distinct ===
      Seq(Seq("g"), Seq("ts_day"), Seq("ts_hour")))
  }

  test("bucket(N, c) and truncate(W, c) transforms: hash-replay and " +
      "prefix-range pruning") {
    val root = freshRoot()
    val t = Snapshots.create(spark, root, tsRows(0, 10)) // unpartitioned
    t.setPartitionSpec(Seq("bucket(8, id)"))
    assert(t.latest().partitionCols === Seq("id_bucket8"))
    t.append(tsRows(10, 90))
    val head = t.latest()
    val bucketGen = head.files.filter(_.contains("id_bucket8="))
    assert(bucketGen.map(_.split('/').find(_.startsWith("id_bucket8=")).get)
      .distinct.size > 1, "rows must spread across bucket dirs")
    // equality on the source hashes the literal: exactly ONE bucket value
    // survives (stats stripped so only the hash replay can prune)
    val p = t.planFiles(head.copy(stats = Map.empty), col("id") === 42L)
    val survivors = p.filter(_.contains("id_bucket8="))
      .map(_.split('/').find(_.startsWith("id_bucket8=")).get).distinct
    assert(survivors.size === 1, s"expected one bucket dir, got $survivors")
    assert(t.readWhere(col("id") === 42L).count() === 1)
    // range predicates do NOT prune on bucket (hash is order-destroying)
    val r = t.planFiles(head.copy(stats = Map.empty), col("id") > 80L)
    assert(r.filter(_.contains("id_bucket8=")).toSet === bucketGen.toSet)
    // truncate on a string column: prefix dirs, prefix-range pruning
    t.setPartitionSpec(Seq("truncate(2, s)"))
    t.append(tsRows(90, 132))
    val head2 = t.latest()
    val truncGen = head2.files.filter(_.contains("s_trunc2="))
    assert(truncGen.nonEmpty)
    val tp = t.planFiles(head2.copy(stats = Map.empty), col("s") === "r3_94")
    assert(tp.filter(_.contains("s_trunc2="))
      .forall(_.contains("s_trunc2=r3")), tp.mkString(","))
    assert(t.readWhere(col("s") === "r3_94").count() === 1)
    assert(t.read().count() === 132)
  }

  test("transform guards: type checks, name collisions, identity wins") {
    import spark.implicits._
    val root = freshRoot()
    val t = Snapshots.create(spark, root, tsRows(0, 5))
    val e1 = intercept[IllegalArgumentException] {
      t.setPartitionSpec(Seq("day(s)")) }
    assert(e1.getMessage.contains("date/timestamp"))
    val e2 = intercept[IllegalArgumentException] {
      t.setPartitionSpec(Seq("truncate(3, ts)")) }
    assert(e2.getMessage.contains("string or integral"))
    val e3 = intercept[IllegalArgumentException] {
      t.setPartitionSpec(Seq("day(nope)")) }
    assert(e3.getMessage.contains("no such column"))
    val e4 = intercept[IllegalArgumentException] {
      t.setPartitionSpec(Seq("bucket(0, id)")) }
    assert(e4.getMessage.contains("positive"))
    // derived-name collision with a real column refuses
    val root2 = freshRoot()
    val t2 = Snapshots.create(spark, root2,
      tsRows(0, 5).withColumn("ts_day", lit("x")))
    val e5 = intercept[IllegalArgumentException] {
      t2.setPartitionSpec(Seq("day(ts)")) }
    assert(e5.getMessage.contains("collides"))
    // the derivable transform namespace is reserved against schema
    // evolution too: a column ADDED (or renamed to) ts_day on a table
    // whose ts column could have day dirs would bind dir values as data
    val root3 = freshRoot()
    val t3 = Snapshots.create(spark, root3, tsRows(0, 5))
    t3.setPartitionSpec(Seq("day(ts)"))
    val e6 = intercept[IllegalArgumentException] {
      t3.addColumns(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts_day",
          org.apache.spark.sql.types.StringType))))
    }
    assert(e6.getMessage.contains("namespace"))
    val e7 = intercept[IllegalArgumentException] {
      t3.renameColumn("s", "ts_hour")
    }
    assert(e7.getMessage.contains("namespace"))
    // ...but the column ts_day itself is a perfectly fine IDENTITY field
    t2.setPartitionSpec(Seq("ts_day"))
    t2.append(Seq((99L, java.sql.Timestamp.valueOf("2026-02-01 00:00:00"),
      "s", "idy")).toDF("id", "ts", "s", "ts_day"))
    assert(t2.latest().files.exists(_.contains("ts_day=idy")))
    assert(t2.read().where(col("ts_day") === "idy").count() === 1)
  }

  test("SQL verb accepts transforms; writes land under the transform spec") {
    def sql(q: String) = Engine.sql(spark, sfDir, q)
    val root = freshRoot()
    val t = Snapshots.create(spark, root, tsRows(0, 24))
    NamedTables.registerSnapshot("evo_tr", root)
    try {
      sql("ALTER TABLE evo_tr SET PARTITION SPEC (day(ts), bucket(4, id))")
      assert(t.latest().partitionCols === Seq("ts_day", "id_bucket4"))
      sql("""INSERT INTO evo_tr VALUES
            |(500, TIMESTAMP '2026-03-05 10:00:00', 'sqlrow')""".stripMargin)
      val f = t.latest().files.filter(_.contains("ts_day=2026-03-05"))
      assert(f.nonEmpty && f.forall(_.contains("id_bucket4=")),
        t.latest().files.mkString(","))
      assert(sql("SELECT count(*) AS n FROM evo_tr WHERE id = 500")
        .head.getLong(0) === 1)
    } finally NamedTables.drop("evo_tr")
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
