package graft.sources

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, DoubleType, StructField, StructType}

/** Insert-only (MM) transactional layout: same base_/delta_ write-id
  * directory contract as full ACID, plain files of any format, no ROW__ID
  * wrapper — the reference's `transactional_properties='insert_only'`
  * flavor and the default conversion target for non-ORC managed tables
  * (ref ql/io/AcidUtils.java:704).
  */
class AcidMmSpec extends SparkSpec {

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft_mm_").toString + "/t"

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def names(dir: String): Seq[String] =
    fsOf(dir).listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).sorted.toSeq

  private def rows(n: Int, from: Int = 0): DataFrame = {
    import spark.implicits._
    (from until from + n).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
  }

  test("parquet MM tree: base wins, widest-wins deltas, originals as " +
      "write id 0; one pruned columnar scan") {
    val dir = scratch()
    val fs = fsOf(dir)
    // pre-conversion original directly in the table dir (write id 0)
    rows(5).coalesce(1).write.parquet(s"$dir/.stage")
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/.stage"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(dir, "000000_0"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/.stage"), true)
    AcidMm.appendDelta(spark, dir, 1L, rows(3, 100))
    AcidMm.appendDelta(spark, dir, 2L, rows(2, 200))
    assert(AcidMm.detectKind(spark, dir) === "insert_only")
    assert(AcidMm.read(spark, dir).count() === 10)
    // a compacted span delta_1_2 shadows the raw delta_2_2 under it
    AcidMm.appendDelta(spark, dir, 3L, rows(5, 100))
    fsOf(dir).rename(new org.apache.hadoop.fs.Path(dir, "delta_3_3"),
      new org.apache.hadoop.fs.Path(dir, "delta_1_2"))
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(dir, "delta_1_1"), true)
    assert(AcidMm.read(spark, dir).count() === 10) // 5 orig + 5 span
    // a base supersedes originals and covered deltas
    AcidMm.appendDelta(spark, dir, 4L, rows(7, 300))
    fsOf(dir).rename(new org.apache.hadoop.fs.Path(dir, "delta_4_4"),
      new org.apache.hadoop.fs.Path(dir, "base_4"))
    assert(AcidMm.read(spark, dir).count() === 7)
    assert(AcidMm.read(spark, dir).columns.toSeq === Seq("k", "v"))
  }

  test("text (Ctrl-A) and ORC variants read back; schema types text " +
      "columns; format sniff routes each") {
    val dirT = scratch()
    AcidMm.appendDelta(spark, dirT, 1L, rows(4), format = "text")
    AcidMm.appendDelta(spark, dirT, 2L, rows(3, 10), format = "text")
    // schema-less: all strings, _c* names (cast-downstream convention)
    val bare = AcidMm.read(spark, dirT)
    assert(bare.count() === 7)
    assert(bare.schema.fields.forall(_.dataType.typeName === "string"))
    // with a schema: typed columns under the caller's names
    val typed = AcidMm.read(spark, dirT, schema = Some(StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))))
    assert(typed.where(col("k") === 12L).select(col("v"))
      .head().getDouble(0) === 12.0)
    val dirO = scratch()
    AcidMm.appendDelta(spark, dirO, 1L, rows(6), format = "orc")
    assert(AcidMm.read(spark, dirO).count() === 6)
    assert(AcidMm.read(spark, dirO).schema.fields.map(_.name).toSeq ===
      Seq("k", "v"))
  }

  test("aborted single-txn deltas are excluded from reads and deleted by " +
      "removeAborted (the reference's removeFilesForMmTable)") {
    val dir = scratch()
    AcidMm.appendDelta(spark, dir, 1L, rows(4))
    AcidMm.appendDelta(spark, dir, 2L, rows(3, 10)) // aborted
    AcidMm.appendDelta(spark, dir, 3L, rows(2, 20))
    assert(AcidMm.read(spark, dir).count() === 9)
    assert(AcidMm.read(spark, dir,
      abortedWriteIds = Set(2L)).count() === 6)
    AcidMm.removeAborted(spark, dir, Set(2L))
    assert(names(dir) === Seq("delta_1_1", "delta_3_3"))
    assert(AcidMm.read(spark, dir).count() === 6)
  }

  test("kind detection separates full-ACID and MM trees; MM read refuses " +
      "a full-ACID tree loudly") {
    import spark.implicits._
    val full = scratch()
    AcidOrc.appendDelta(spark, full, 1L, rows(5))
    assert(AcidMm.detectKind(spark, full) === "full_acid")
    val mm = scratch()
    AcidMm.appendDelta(spark, mm, 1L, rows(5))
    assert(AcidMm.detectKind(spark, mm) === "insert_only")
    // delete_delta presence alone marks full acid
    val full2 = scratch()
    AcidOrc.appendDelta(spark, full2, 1L, rows(5))
    AcidOrc.appendDeleteDelta(spark, full2, 2L,
      Seq((1L, AcidOrc.encodeBucket(0), 0L))
        .toDF("originalTransaction", "bucket", "rowId"))
    assert(AcidMm.detectKind(spark, full2) === "full_acid")
    val e = intercept[IllegalArgumentException] {
      AcidMm.read(spark, full2)
    }
    assert(e.getMessage.contains("full-ACID"))
    assert(AcidMm.detectKind(spark, scratch()) === "empty")
  }

  test("partitioned MM layout: k=v dirs surface as string columns") {
    val dir = scratch()
    import spark.implicits._
    Seq("A", "B").foreach { s =>
      AcidMm.appendDelta(spark, s"$dir/st=$s", 1L, rows(4))
      AcidMm.appendDelta(spark, s"$dir/st=$s", 2L, rows(2, 10))
    }
    val got = AcidMm.read(spark, dir)
    assert(got.columns.toSeq === Seq("k", "v", "st"))
    assert(got.count() === 12)
    assert(got.groupBy(col("st")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("A" -> 6L, "B" -> 6L))
  }

  test("MM major compaction folds each partition to base_N in the " +
      "table's own format; minor folds deltas above the base only") {
    val dir = scratch()
    AcidMm.appendDelta(spark, dir, 1L, rows(10))
    AcidMm.appendDelta(spark, dir, 2L, rows(5, 100))
    AcidMm.appendDelta(spark, dir, 3L, rows(5, 200), format = "parquet")
    AcidMm.compactMajor(spark, dir)
    assert(names(dir) === Seq("base_3"))
    assert(AcidMm.read(spark, dir).count() === 20)
    assert(AcidMm.detectKind(spark, dir) === "insert_only")
    // trickle deltas over the base, then minor: base untouched
    (4L to 7L).foreach(w => AcidMm.appendDelta(spark, dir, w, rows(2,
      (w * 1000).toInt)))
    val fs = fsOf(dir)
    val baseFile = new org.apache.hadoop.fs.Path(dir, "base_3/000000_0")
    val stamp = (fs.getFileStatus(baseFile).getLen,
      fs.getFileStatus(baseFile).getModificationTime)
    AcidMm.compactMinor(spark, dir)
    assert(names(dir) === Seq("base_3", "delta_4_7"))
    assert((fs.getFileStatus(baseFile).getLen,
      fs.getFileStatus(baseFile).getModificationTime) === stamp)
    assert(AcidMm.read(spark, dir).count() === 28)
    // consumerFloor splits the fold so a lagging consumer's range survives
    val dir2 = scratch()
    (1L to 4L).foreach(w => AcidMm.appendDelta(spark, dir2, w, rows(1,
      w.toInt)))
    AcidMm.compactMinor(spark, dir2, consumerFloor = 2L)
    assert(names(dir2) === Seq("delta_1_2", "delta_3_4"))
    assert(AcidMm.read(spark, dir2).count() === 4)
  }

  test("add-columns evolution across MM deltas: widest schema wins, " +
      "older files' missing fields read NULL") {
    val dir = scratch()
    import spark.implicits._
    AcidMm.appendDelta(spark, dir, 1L, rows(4))
    AcidMm.appendDelta(spark, dir, 2L,
      (10 until 13).map(i => (i.toLong, i * 1.0, s"x$i"))
        .toDF("k", "v", "extra"))
    val got = AcidMm.read(spark, dir)
    assert(got.columns.toSeq === Seq("k", "v", "extra"))
    assert(got.count() === 7)
    assert(got.where(col("extra").isNull).count() === 4)
    assert(got.where(col("extra") === "x11").count() === 1)
    // major compaction folds the union schema into the base
    AcidMm.compactMajor(spark, dir)
    val after = AcidMm.read(spark, dir)
    assert(after.count() === 7)
    assert(after.where(col("extra").isNull).count() === 4)
  }

  test("text-format compaction keeps the text format") {
    val dir = scratch()
    AcidMm.appendDelta(spark, dir, 1L, rows(4), format = "text")
    AcidMm.appendDelta(spark, dir, 2L, rows(3, 10), format = "text")
    AcidMm.compactMajor(spark, dir)
    assert(names(dir) === Seq("base_2"))
    val got = AcidMm.read(spark, dir)
    assert(got.count() === 7)
    assert(got.schema.fields.forall(_.dataType.typeName === "string"))
  }

  test("SQL surface: hive_acid() auto-routes MM trees, hive_acid_state " +
      "reports table_kind=insert_only, COMPACT routes to MM compactors") {
    val dir = scratch()
    AcidMm.appendDelta(spark, dir, 1L, rows(8))
    AcidMm.appendDelta(spark, dir, 2L, rows(4, 100))
    graft.plans.SnapshotSql.register(spark)
    assert(spark.sql(s"SELECT count(*) FROM hive_acid('$dir')")
      .head().getLong(0) === 12L)
    val state = spark.sql(s"SELECT kind, dir, table_kind, files FROM " +
      s"hive_acid_state('$dir') ORDER BY dir").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(state.map(t => (t._1, t._2, t._3)).toSeq === Seq(
      ("delta", "delta_1_1", "insert_only"),
      ("delta", "delta_2_2", "insert_only")))
    assert(state.forall(_._4 >= 1L)) // MM task-named files ARE counted
    val msg = Engine.sql(spark, sfDir, s"COMPACT HIVE ACID '$dir' 'minor'")
      .head.getString(0)
    assert(msg.contains("minor compaction"))
    assert(names(dir) === Seq("delta_1_2"))
    Engine.sql(spark, sfDir, s"COMPACT HIVE ACID '$dir'")
    assert(names(dir) === Seq("base_2"))
    assert(spark.sql(s"SELECT count(*) FROM hive_acid('$dir')")
      .head().getLong(0) === 12L)
    // rebalance refuses MM trees with a readable message
    val e = intercept[Exception] {
      Engine.sql(spark, sfDir, s"COMPACT HIVE ACID '$dir' 'rebalance' 4")
    }
    assert(e.getMessage.contains("insert-only"))
    // CONVERT migrates the MM tree to a snapshot table through AcidMm
    val dst = scratch()
    val msg2 = Engine.sql(spark, sfDir,
      s"CONVERT HIVE ACID '$dir' TO SNAPSHOT '$dst'").head.getString(0)
    assert(msg2.contains("12 rows"), msg2)
    assert(graft.plans.Snapshots.table(spark, dst).read().count() === 12L)
  }

  test("SQL surface edges: 2-arg hive_acid auto-detects MM, COMPACT " +
      "takes an ABORTED id list (dropped before any fold), fractional " +
      "rebalance counts are rejected cleanly") {
    val dir = scratch()
    AcidMm.appendDelta(spark, dir, 1L, rows(8))
    AcidMm.appendDelta(spark, dir, 2L, rows(4, 100)) // will be aborted
    AcidMm.appendDelta(spark, dir, 3L, rows(3, 200))
    graft.plans.SnapshotSql.register(spark)
    // the legacy flag concerns full-ACID update deltas only; an MM tree
    // must still route through the MM reader (the 1-arg docstring's
    // auto-detect claim holds for both arities)
    assert(spark.sql(s"SELECT count(*) FROM hive_acid('$dir', false)")
      .head().getLong(0) === 15L)
    // minor compaction with write id 2 aborted: the junk delta is
    // removed FIRST, so the folded span holds only committed rows
    Engine.sql(spark, sfDir,
      s"COMPACT HIVE ACID '$dir' 'minor' ABORTED (2)")
    assert(names(dir) === Seq("delta_1_3"))
    assert(AcidMm.read(spark, dir).count() === 11L)
    // fractional bucket counts fail with a parse-quality message, not a
    // NumberFormatException
    val e = intercept[IllegalArgumentException] {
      Engine.sql(spark, sfDir, s"COMPACT HIVE ACID '$dir' 'rebalance' 3.5")
    }
    assert(e.getMessage.contains("whole number"), e.getMessage)
  }

  test("MM reads keep the pruned columnar path: filters and projection " +
      "push into the parquet scan (the full-ACID bridge can't)") {
    val dir = scratch()
    AcidMm.appendDelta(spark, dir, 1L, rows(1000))
    AcidMm.appendDelta(spark, dir, 2L, rows(1000, 5000))
    val df = AcidMm.read(spark, dir).where(col("k") === 42L).select(col("v"))
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a parquet FileSourceScan")
    val meta = scans.head.metadata
    assert(meta("PushedFilters").contains("EqualTo(k,42)"), meta)
    assert(meta("ReadSchema").contains("k:bigint") &&
      meta("ReadSchema").contains("v:double") &&
      !meta("ReadSchema").contains("extra"), meta)
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(42.0))
  }

  test("INSERT OVERWRITE (new base): supersedes prior deltas+base, " +
      "readChanges straddling it emits nothing, stale/colliding write " +
      "ids refused; partitioned form targets one partition") {
    val dir = scratch()
    AcidMm.appendDelta(spark, dir, 1L, rows(5))
    AcidMm.compactMajor(spark, dir) // base_1
    AcidMm.appendDelta(spark, dir, 2L, rows(3, 100))
    AcidMm.overwrite(spark, dir, 3L, rows(2, 500))
    assert(names(dir).contains("base_3"))
    val got = AcidMm.read(spark, dir).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(500L, 501L)) // everything below is shadowed
    // a change range straddling the overwrite emits nothing for the base
    // (bases are snapshots, not insert events) — only true deltas inside
    assert(AcidMm.readChanges(spark, dir, 2L, 3L).count() === 0L)
    assert(AcidMm.readChanges(spark, dir, 1L, 2L).count() === 3L)
    // clean=true drops the covered dirs
    AcidMm.overwrite(spark, dir, 4L, rows(1, 900), clean = true)
    assert(names(dir) === Seq("base_4"))
    // stale write id refused (must exceed the current max)
    val e = intercept[IllegalArgumentException] {
      AcidMm.overwrite(spark, dir, 4L, rows(1))
    }
    assert(e.getMessage.contains("must exceed"), e.getMessage)
    // partitioned: the whole-table form refuses; PARTITION form lands in
    // one k=v dir and sibling partitions are untouched
    val pdir = scratch()
    AcidMm.appendDelta(spark, s"$pdir/p=a", 1L, rows(4))
    AcidMm.appendDelta(spark, s"$pdir/p=b", 1L, rows(4, 50))
    intercept[IllegalArgumentException] {
      AcidMm.overwrite(spark, pdir, 2L, rows(1))
    }
    AcidMm.overwrite(spark, pdir, 2L, rows(2, 700), partSub = "p=a")
    val byPart = AcidMm.read(spark, pdir).collect()
      .groupBy(_.getString(2)).view.mapValues(_.map(_.getLong(0)).sorted)
    assert(byPart("a").toSeq === Seq(700L, 701L))
    assert(byPart("b").toSeq === Seq(50L, 51L, 52L, 53L))
    // SQL surface: OVERWRITE HIVE ACID ... WRITEID n AS <query>
    graft.plans.SnapshotSql.register(spark)
    val msg = Engine.sql(spark, sfDir,
      s"OVERWRITE HIVE ACID '$pdir' PARTITION 'p=b' WRITEID 3 AS " +
        "SELECT CAST(7 AS BIGINT) AS k, CAST(7.0 AS DOUBLE) AS v")
      .head.getString(0)
    assert(msg.contains("write id 3"), msg)
    assert(spark.sql(s"SELECT count(*) FROM hive_acid('$pdir')")
      .head().getLong(0) === 3L) // 2 in p=a + 1 overwritten p=b
    // the converse guard: a PARTITION-scoped overwrite against an
    // UNpartitioned tree would create a mixed layout — refused
    val udir = scratch()
    AcidMm.appendDelta(spark, udir, 1L, rows(2))
    val e2 = intercept[IllegalArgumentException] {
      AcidMm.overwrite(spark, udir, 2L, rows(1), partSub = "p=a")
    }
    assert(e2.getMessage.contains("mixed layout"), e2.getMessage)
  }

  test("randomized MM op-sequence net: append/abort/minor/major always " +
      "reconstruct to the in-memory model") {
    val rnd = new scala.util.Random(20260815L)
    val dir = scratch()
    val model = scala.collection.mutable.Map[Long, Double]()
    var nextKey = 0L
    var aborted = Set.empty[Long]
    def nextW() = math.max(AcidOrc.maxWriteId(spark, dir) + 1, 1L)
    (0 until 14).foreach { i =>
      val op = if (i == 0) "append" else rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 | 4 => "append"
        case 5 | 6 => "abort"
        case 7 | 8 => "minor"
        case 9 => "major"
        case _ => "overwrite"
      }
      op match {
        case "append" =>
          val m = 1 + rnd.nextInt(6)
          import spark.implicits._
          val rs = (0 until m).map { _ =>
            nextKey += 1; (nextKey, rnd.nextInt(100).toDouble)
          }
          AcidMm.appendDelta(spark, dir, nextW(), rs.toDF("k", "v"))
          rs.foreach { case (k, v) => model(k) = v }
        case "abort" =>
          // an uncommitted writer's delta lands and is later excluded
          val m = 1 + rnd.nextInt(4)
          import spark.implicits._
          val w = nextW()
          AcidMm.appendDelta(spark, dir, w,
            (0 until m).map(_ => (-1L, -1.0)).toDF("k", "v"))
          aborted += w
        case "minor" =>
          AcidMm.compactMinor(spark, dir, clean = rnd.nextBoolean(),
            abortedWriteIds = aborted)
          aborted = Set.empty // compaction physically removed them
        case "major" =>
          AcidMm.compactMajor(spark, dir, clean = rnd.nextBoolean(),
            abortedWriteIds = aborted)
          aborted = Set.empty
        case "overwrite" =>
          // INSERT OVERWRITE: the table becomes exactly these rows; the
          // new base shadows any still-uncleaned aborted deltas too
          val m = 1 + rnd.nextInt(5)
          import spark.implicits._
          val rs = (0 until m).map { _ =>
            nextKey += 1; (nextKey, rnd.nextInt(100).toDouble)
          }
          AcidMm.overwrite(spark, dir, nextW(), rs.toDF("k", "v"),
            clean = rnd.nextBoolean())
          model.clear()
          rs.foreach { case (k, v) => model(k) = v }
          aborted = Set.empty // all below the base — shadowed or cleaned
      }
      val got = AcidMm.read(spark, dir, abortedWriteIds = aborted)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === model.toMap, s"divergence after op $i ($op)")
    }
  }
}
