package graft.plans

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet tables: a manifest log with optimistic
  * concurrency, snapshot-isolation reads, time travel, file-granularity
  * copy-on-write DML, and vacuum.
  *
  * This is the multi-writer upgrade of [[Dml]]'s single-writer COW — the
  * Spark-native substitute for the reference's ACID story (metastore
  * transaction manager + delta files + compactor: ref
  * ql/src/java/org/apache/hadoop/hive/ql/io/AcidUtils.java:148,
  * ql/src/java/org/apache/hadoop/hive/ql/txn/compactor/ — there the
  * metastore serializes writers; here an atomic commit-log publish does).
  * The layout follows the public log-structured table-format design
  * (Delta Lake, VLDB 2020; Iceberg spec):
  *
  * {{{
  * table/
  *   _graft_log/v00000000.json   one manifest per committed version
  *   data/<commit-uuid>/...      immutable parquet files, never rewritten
  * }}}
  *
  * A manifest is the COMPLETE file listing of its version (plus schema and
  * partition columns). Writers stage data files first, then publish
  * `v{N+1}.json` with an atomic create-exclusive (hard link on local
  * filesystems, rename-without-overwrite elsewhere — both fail if the
  * version already exists). A loser re-reads the new latest manifest,
  * re-validates, and retries: appends always rebase cleanly; a COW commit
  * whose replaced files vanished re-plans against the new snapshot; after
  * `maxRetries` it raises `ConcurrentModificationException`. Readers list
  * the log and read one manifest's files — they never block writers and
  * always see a complete committed version (snapshot isolation).
  *
  * Concurrency model = write-serializable at file granularity: two commits
  * conflict iff one removes a file the other's snapshot still contains.
  * Appends commute with everything; DELETE/UPDATE serialize against
  * overlapping DELETE/UPDATE via replaced-file validation and replay their
  * full plan on retry, so predicates are re-evaluated against the winning
  * snapshot (no lost updates).
  *
  * Scale notes (100 TB): the manifest is one JSON listing per version —
  * driver-side metadata, no data-path cost. At 10^6 files that listing is
  * ~100 MB; the production path is incremental manifests + log compaction
  * (exactly Delta's checkpoint design), a mechanical extension of this
  * format. DML cost is proportional to AFFECTED files only: the predicate
  * scan prunes on partition directories (values live in the path, so
  * Catalyst prunes statically), and untouched files carry over by
  * reference. Readers pass the stored schema, so no footer-sampling job.
  */
object Snapshots {

  /** One committed version: the full table state, not a diff. */
  final case class Manifest(
      version: Long,
      parent: Long,
      timestampMs: Long,
      action: String,
      partitionCols: Seq[String],
      schemaJson: String,
      files: Seq[String])

  final class ConcurrentModificationException(msg: String)
    extends RuntimeException(msg)

  private implicit val jsonFormats: org.json4s.Formats = org.json4s.DefaultFormats

  /** Opens an existing snapshot table rooted at `root`. */
  def table(spark: SparkSession, root: String): SnapshotTable =
    new SnapshotTable(spark, root)

  /** Creates version 0 from `df` (fails if a log already exists). */
  def create(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): SnapshotTable = {
    val t = new SnapshotTable(spark, root)
    t.initialize(df, partitionBy)
    t
  }

  final class SnapshotTable private[Snapshots] (
      val spark: SparkSession, val root: String) {

    private val rootPath = new Path(root)
    private val logPath = new Path(rootPath, "_graft_log")
    private def fs: FileSystem =
      rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // ------------------------------------------------------------------ log

    private def manifestPath(v: Long): Path =
      new Path(logPath, f"v$v%08d.json")

    private def writeManifestJson(m: Manifest): String =
      org.json4s.jackson.Serialization.write(m)

    private def readManifest(p: Path): Manifest = {
      val in = fs.open(p)
      try org.json4s.jackson.Serialization.read[Manifest](
        new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    }

    private def versions(): Seq[Long] =
      if (!fs.exists(logPath)) Nil
      else fs.listStatus(logPath).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
        .sorted

    /** Latest committed manifest. */
    def latest(): Manifest = {
      val vs = versions()
      require(vs.nonEmpty, s"not a snapshot table (no _graft_log): $root")
      readManifest(manifestPath(vs.last))
    }

    /** All manifests, oldest first — the table's commit history. */
    def history(): Seq[Manifest] =
      versions().map(v => readManifest(manifestPath(v)))

    /** Atomic create-exclusive publish of `v{version}.json`. Local
      * filesystems get a true atomic hard link (link(2) fails with EEXIST);
      * others use rename-without-overwrite via FileContext, the HDFS-portable
      * equivalent (atomic, fails if the destination exists).
      */
    private def casPublish(m: Manifest): Boolean = {
      fs.mkdirs(logPath)
      val dst = manifestPath(m.version)
      if (fs.exists(dst)) return false
      val tmp = new Path(logPath, s".tmp-${UUID.randomUUID().toString}")
      val out = fs.create(tmp, false)
      try out.write(writeManifestJson(m).getBytes("UTF-8")) finally out.close()
      val ok =
        if (dst.toUri.getScheme == null || dst.toUri.getScheme == "file") {
          val lp = java.nio.file.Paths.get(dst.toUri.getPath)
          val tp = java.nio.file.Paths.get(
            fs.makeQualified(tmp).toUri.getPath)
          try { java.nio.file.Files.createLink(lp, tp); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        } else {
          try {
            org.apache.hadoop.fs.FileContext
              .getFileContext(dst.toUri, spark.sparkContext.hadoopConfiguration)
              .rename(fs.makeQualified(tmp), fs.makeQualified(dst))
            true
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          }
        }
      fs.delete(tmp, false)
      ok
    }

    // ----------------------------------------------------------------- data

    /** Stages `df` as immutable parquet under data/<uuid>/ and returns the
      * new files' table-relative paths. Nothing is visible to readers until
      * the manifest referencing these files is published.
      */
    private def stage(df: DataFrame, partitionCols: Seq[String]): Seq[String] = {
      val commitDir = s"data/${UUID.randomUUID().toString.take(8)}"
      val w = df.write.mode("errorifexists")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(new Path(rootPath, commitDir).toString)
      listParquet(new Path(rootPath, commitDir))
        .map(p => relativize(p))
    }

    private def listParquet(dir: Path): Seq[Path] = {
      val it = fs.listFiles(dir, true)
      val buf = Seq.newBuilder[Path]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          buf += s.getPath
      }
      buf.result()
    }

    private def relativize(p: Path): String = {
      val rootUri = fs.makeQualified(rootPath).toUri.getPath
      val pUri = fs.makeQualified(p).toUri.getPath
      require(pUri.startsWith(rootUri + "/"), s"$p not under $root")
      pUri.stripPrefix(rootUri + "/")
    }

    private def schemaOf(json: String): org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]

    /** Reads exactly one manifest's files. The stored schema is passed
      * explicitly (no footer sampling); partition values come from the
      * `k=v` path segments under each commit dir (`basePath` anchors the
      * discovery so data/<uuid> segments are not parsed as partitions).
      */
    private def readFiles(m: Manifest): DataFrame = {
      if (m.files.isEmpty)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schemaOf(m.schemaJson))
      val schema = schemaOf(m.schemaJson)
      spark.read
        .option("basePath", fs.makeQualified(rootPath).toString)
        .schema(schema)
        .parquet(m.files.map(f => new Path(rootPath, f).toString): _*)
        // partition columns surface at the end of the scan schema — restore
        // the table's declared column order
        .select(schema.fieldNames.map(col): _*)
    }

    // ---------------------------------------------------------------- reads

    /** Current snapshot. */
    def read(): DataFrame = readFiles(latest())

    /** Time travel by version. */
    def readVersion(v: Long): DataFrame = {
      val p = manifestPath(v)
      require(fs.exists(p), s"version $v does not exist (vacuumed or never committed)")
      readFiles(readManifest(p))
    }

    /** Time travel by timestamp: the last version committed at or before
      * `tsMs`.
      */
    def readAsOf(tsMs: Long): DataFrame = {
      val h = history().filter(_.timestampMs <= tsMs)
      require(h.nonEmpty, s"no version committed at or before $tsMs")
      readFiles(h.last)
    }

    // --------------------------------------------------------------- writes

    private[Snapshots] def initialize(df: DataFrame, partitionBy: Seq[String]): Unit = {
      require(versions().isEmpty, s"snapshot table already exists at $root")
      val files = stage(df, partitionBy)
      val m = Manifest(0L, -1L, System.currentTimeMillis(), "create",
        partitionBy, df.schema.json, files)
      if (!casPublish(m))
        throw new ConcurrentModificationException(
          s"concurrent create of snapshot table at $root")
    }

    /** Commit loop: stage once, then CAS against the moving head. `validate`
      * sees the latest manifest and returns the commit's file list (or
      * throws); appends validate trivially, COW validates replaced files.
      */
    private def commit(action: String, maxRetries: Int)(
        validate: Manifest => Option[Seq[String]]): Manifest = {
      var attempt = 0
      while (true) {
        val head = latest()
        validate(head) match {
          case None => return head // no-op (nothing matched)
          case Some(files) =>
            val m = Manifest(head.version + 1, head.version,
              System.currentTimeMillis(), action, head.partitionCols,
              head.schemaJson, files)
            if (casPublish(m)) return m
        }
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"$action at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** Appends `df`. Never conflicts: losers rebase their staged files onto
      * the new head and re-publish (the data files are written once).
      */
    def append(df: DataFrame, maxRetries: Int = 10): Manifest = {
      val head0 = latest()
      require(df.schema.fieldNames.sorted.sameElements(
        schemaOf(head0.schemaJson).fieldNames.sorted),
        "append schema must match table schema")
      val staged = stage(df.select(schemaOf(head0.schemaJson).fieldNames.map(col): _*),
        head0.partitionCols)
      commit("append", maxRetries)(head => Some(head.files ++ staged))
    }

    /** Replaces the table contents. Rebases blindly (an overwrite reads
      * nothing, so it serializes after any concurrent commit).
      */
    def overwrite(df: DataFrame, maxRetries: Int = 10): Manifest = {
      val staged = stage(df, latest().partitionCols)
      commit("overwrite", maxRetries)(_ => Some(staged))
    }

    /** File-granularity COW: rewrites only the files that contain matching
      * rows. On a lost race the ENTIRE plan re-runs against the winning
      * snapshot (affected files recomputed, post-image restaged), so the
      * predicate semantics are serializable, not just the file swap.
      */
    private def cow(action: String, maxRetries: Int)(
        postImage: DataFrame => DataFrame, predicate: Column): Manifest = {
      var attempt = 0
      while (true) {
        val head = latest()
        val snap = readFiles(head)
        val rootQ = fs.makeQualified(rootPath).toUri.getPath + "/"
        val affected = snap.filter(predicate)
          .select(input_file_name().as("f")).distinct()
          .collect().map(_.getString(0))
          .map(f => new Path(f).toUri.getPath.stripPrefix(rootQ))
          .toSet
        if (affected.isEmpty) return head // nothing matched — no-op
        val affectedDf = readFiles(head.copy(files = head.files.filter(affected)))
        val staged = stage(postImage(affectedDf), head.partitionCols)
        val files = head.files.filterNot(affected) ++ staged
        val m = Manifest(head.version + 1, head.version,
          System.currentTimeMillis(), action, head.partitionCols,
          head.schemaJson, files)
        // CAS can only succeed if head is still the latest version, and the
        // affected files were taken FROM head — so a successful publish
        // proves no concurrent commit removed them (write-serializable).
        if (casPublish(m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"$action at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** DELETE WHERE cond — rewrites only files containing matches. */
    def deleteWhere(cond: Column, maxRetries: Int = 10): Manifest =
      cow("delete", maxRetries)(df => df.filter(!coalesce(cond, lit(false))), cond)

    /** UPDATE ... SET ... WHERE cond — partition columns not assignable
      * (rows never move between partitions), matching [[Dml.updateWhere]].
      */
    def updateWhere(cond: Column, set: Map[String, Column],
        maxRetries: Int = 10): Manifest = {
      val head = latest()
      val bad = set.keySet.intersect(head.partitionCols.toSet)
      require(bad.isEmpty, s"cannot assign partition columns: ${bad.mkString(", ")}")
      cow("update", maxRetries)({ df =>
        val c = coalesce(cond, lit(false))
        set.foldLeft(df) { case (d, (name, expr)) =>
          d.withColumn(name, when(c, expr).otherwise(col(name)))
        }
      }, cond)
    }

    // --------------------------------------------------------------- vacuum

    /** Deletes data files referenced by no retained manifest and drops the
      * pruned manifests; time travel older than `retainLast` versions stops
      * working. Do not run concurrently with an in-flight writer whose
      * commit is not yet published (its staged files look unreferenced) —
      * production would add an age threshold, the standard table-format
      * mitigation.
      */
    def vacuum(retainLast: Int = 1): Unit = {
      val vs = versions()
      val keep = vs.takeRight(math.max(retainLast, 1)).toSet
      val referenced = keep.flatMap(v => readManifest(manifestPath(v)).files)
      val dataDir = new Path(rootPath, "data")
      if (fs.exists(dataDir))
        listParquet(dataDir).foreach { p =>
          if (!referenced.contains(relativize(p))) fs.delete(p, false)
        }
      // drop now-empty commit dirs and pruned manifests
      if (fs.exists(dataDir))
        fs.listStatus(dataDir).foreach { d =>
          if (d.isDirectory && listParquet(d.getPath).isEmpty)
            fs.delete(d.getPath, true)
        }
      vs.filterNot(keep).foreach(v => fs.delete(manifestPath(v), false))
    }
  }
}
