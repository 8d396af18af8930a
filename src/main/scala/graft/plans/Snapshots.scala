package graft.plans

import java.util.UUID

import scala.jdk.CollectionConverters._

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
  *   deletes/<commit-uuid>/...   merge-on-read (file, row-pos) sidecars
  * }}}
  *
  * A manifest determines the COMPLETE file listing of its version (plus
  * schema and partition columns) — stored either directly (a `full`
  * checkpoint) or as a delta against its parent (see [[Manifest]]). Writers
  * stage data files first, then publish `v{N+1}.json` with an atomic
  * create-exclusive (hard link on local filesystems,
  * rename-without-overwrite elsewhere — both fail if the version already
  * exists). A loser re-reads the new latest manifest, re-validates, and
  * retries: appends always rebase cleanly; a COW commit whose replaced
  * files vanished re-plans against the new snapshot; after `maxRetries` it
  * raises `ConcurrentModificationException`. Readers list the log and read
  * one manifest's files — they never block writers and always see a
  * complete committed version (snapshot isolation).
  *
  * Concurrency model = write-serializable at file granularity: two commits
  * conflict iff one removes a file the other's snapshot still contains.
  * Appends commute with everything; DELETE/UPDATE serialize against
  * overlapping DELETE/UPDATE via replaced-file validation and replay their
  * full plan on retry, so predicates are re-evaluated against the winning
  * snapshot (no lost updates).
  *
  * Scale notes (100 TB): commit metadata is driver-side JSON with no
  * data-path cost, and since manifests are delta-encoded between
  * checkpoints, each commit writes O(its own change) — an append to a
  * 10^6-file table is a few hundred bytes of log, and a reader folds at
  * most `checkpointInterval`−1 deltas onto the nearest checkpoint. DML
  * cost is proportional to AFFECTED files only: the predicate scan prunes
  * on partition directories (values live in the path, so Catalyst prunes
  * statically), and untouched files carry over by reference. Readers pass
  * the stored schema, so no footer-sampling job.
  */
object Snapshots {

  /** One committed version.
    *
    * `stats` maps each data file to its row count and per-column min/max —
    * the scan-planning index [[SnapshotTable.readWhere]] prunes with (the
    * table-format analog of the reference's column stats in the metastore:
    * ref ql/src/java/org/apache/hadoop/hive/ql/stats/ — there stats feed the
    * optimizer; here they gate file IO directly). `meta` carries commit
    * annotations (e.g. streaming (streamId, batchId) for idempotent sinks).
    * All extension fields default empty so pre-upgrade manifests parse.
    *
    * On disk a manifest is either `kind="full"` (complete files/stats/
    * deletes listing — a checkpoint) or `kind="delta"` (only what the
    * commit changed vs its parent: adds/removes + addStats + deleteAdds/
    * deleteRemoves, with the listing fields empty). Writers emit a delta by
    * default and a full checkpoint every `checkpointInterval` versions, so
    * commit metadata cost is O(the commit's own change), not O(table
    * files) — at 10^6 files an append writes a few hundred bytes, and a
    * reader resolves the head by folding at most `checkpointInterval`
    * deltas onto the nearest checkpoint (exactly Delta Lake's
    * log-plus-checkpoint design, VLDB 2020). Every manifest the engine
    * HANDS OUT (latest/history/readVersion) is resolved to full form, so
    * consumers never see deltas.
    */
  final case class Manifest(
      version: Long,
      parent: Long,
      timestampMs: Long,
      action: String,
      partitionCols: Seq[String],
      schemaJson: String,
      files: Seq[String],
      stats: Map[String, FileStat] = Map.empty,
      meta: Map[String, String] = Map.empty,
      deletes: Seq[String] = Nil,
      kind: String = "full",
      adds: Seq[String] = Nil,
      removes: Seq[String] = Nil,
      addStats: Map[String, FileStat] = Map.empty,
      deleteAdds: Seq[String] = Nil,
      deleteRemoves: Seq[String] = Nil,
      // Column mapping (the Delta-Lake name-mapping / Iceberg field-id
      // design): logical (schema) name -> physical (parquet) name, identity
      // entries omitted. RENAME COLUMN is then a metadata-only commit — the
      // physical name is fixed at column birth and files never rewrite.
      // `droppedPhysical` tombstones the physical names of dropped columns
      // so a later ADD COLUMNS of the same logical name takes a FRESH
      // physical name instead of resurrecting stale values from old files.
      // Both default empty, so manifests written before the fields existed
      // read back as identity-mapped (json4s fills defaults).
      colMapping: Map[String, String] = Map.empty,
      droppedPhysical: Seq[String] = Nil) {
    /** Physical (parquet) name of a logical column. */
    def physical(logical: String): String = colMapping.getOrElse(logical, logical)
  }

  /** Per-column min/max/null-count over one data file; values rendered as
    * strings (parsed back by the column's declared type at prune time).
    */
  final case class ColStat(min: Option[String], max: Option[String], nulls: Long)

  /** Per-file row count, column stats, and byte size. `bytes` (0 = unknown,
    * for manifests written before it was recorded) lets scan planning
    * synthesize file statuses from the manifest alone — zero filesystem
    * calls on the plan path, the Delta `add.size` / Iceberg manifest-entry
    * design.
    */
  final case class FileStat(rows: Long, cols: Map[String, ColStat],
      bytes: Long = 0L)

  final class ConcurrentModificationException(msg: String)
    extends RuntimeException(msg)

  final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  /** Table integrity constraints (`_constraints.json` at the table root) —
    * the engine analog of Hive's enforced NOT NULL / CHECK / DEFAULT and
    * informational PRIMARY KEY / FOREIGN KEY / UNIQUE constraint surface
    * (ref standalone-metastore/.../hive_metastore.thrift: SQLNotNullConstraint,
    * SQLCheckConstraint, SQLDefaultConstraint; enforcement in
    * ql/.../GenericUDFEnforceConstraint.java).
    *
    *  - `notNull`: LOGICAL column names that must be non-null on every write.
    *  - `checks`: name → SQL boolean expression over the row; a row violates
    *    only when the expression is FALSE (NULL passes — SQL standard).
    *  - `defaults`: column → SQL expression filled in for columns omitted
    *    from an INSERT column list (explicit NULLs stay NULL — Hive/ANSI
    *    DEFAULT semantics).
    *  - `informational`: rendered PRIMARY KEY / FOREIGN KEY / UNIQUE
    *    declarations — documented, surfaced in DESCRIBE, never enforced
    *    (the reference's RELY NOVALIDATE contract for optimizer hints).
    */
  final case class TableConstraints(
      notNull: Seq[String] = Nil,
      checks: Map[String, String] = Map.empty,
      defaults: Map[String, String] = Map.empty,
      informational: Map[String, String] = Map.empty)

  /** Bloom file-skipping index config (`_bloom_config.json` at the table
    * root): `cols` are PHYSICAL column names (rename-proof), `bits` is the
    * per-file filter size. See [[SnapshotTable.setBloomColumns]].
    */
  final case class BloomConfig(cols: Seq[String], bits: Long, gen: Long = 0L)

  /** Bucketed-layout config (`_bucket.json` at the table root), fixed at
    * CREATE: every data file holds only rows whose
    * `pmod(murmur3_hash(col), n)` equals the bucket id tagged in the file
    * NAME (Spark's own bucketed-file naming), so scans report
    * `HashPartitioning(col, n)` and co-bucketed joins / aggregations on
    * the bucket key plan with ZERO shuffle — the engine analog of the
    * reference's CLUSTERED BY ... INTO n BUCKETS tables and their
    * sort-merge-bucket map joins (ref ql/.../optimizer/AbstractSMBJoinProc
    * .java, metastore StorageDescriptor.bucketCols). `col` is the PHYSICAL
    * column name (rename-proof, like [[BloomConfig]]).
    *
    * The hash is Spark's `HashPartitioning.partitionIdExpression`
    * (murmur3 seed 42, pmod) — byte-identical to what `FileSourceScanExec`
    * assumes for bucketed relations and to warehouse tables written with
    * `bucketBy`, so snapshot tables co-join shuffle-free with THOSE too.
    */
  final case class BucketConfig(cols: Seq[String], n: Int,
      sortCols: Seq[String] = Nil)

  /** SKEWED BY (cols) ON (values) [STORED AS DIRECTORIES] declaration —
    * list-bucketing metadata (see [[SnapshotBucketOps.setSkewed]]); values
    * are stored as strings, one inner Seq per skewed value tuple.
    */
  final case class SkewSpec(cols: Seq[String], values: Seq[Seq[String]],
      storedAsDirectories: Boolean = false)

  /** CREATE-time bucket spec: `CLUSTERED BY (cols) [SORTED BY (sortBy)]
    * INTO n BUCKETS`.
    */
  final case class BucketBy(cols: Seq[String], n: Int,
      sortBy: Seq[String] = Nil)
  object BucketBy {
    def apply(col: String, n: Int): BucketBy = BucketBy(Seq(col), n)
  }

  /** A named snapshot ref — `kind` is "branch" (mutable head, writable)
    * or "tag" (immutable marker), pointing at a committed version (ref
    * iceberg SnapshotRef / ql/ddl/table/snapshotref/; Hive 4's
    * `ALTER TABLE ... CREATE BRANCH/TAG` surface).
    */
  final case class SnapshotRef(kind: String, version: Long,
      createdAtMs: Long = 0L, maxRefAgeMs: Option[Long] = None)

  /** Serialization row for the refs CAS document (top-level so json4s
    * reflection can construct it).
    */
  private[plans] case class RefRow(name: String, kind: String, version: Long,
      createdAtMs: Long = 0L, maxRefAgeMs: Option[Long] = None)

  /** Manifest-meta marker of a branch commit: its value is the branch
    * name, and its presence takes the commit OFF the mainline.
    */
  private[plans] val RefMetaKey = "graft.ref"

  /** Per-session reentrant pin of
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` for the
    * duration of bucketed staged writes. A naive save/set/restore races
    * when appends run concurrently in one session (writer A can restore
    * the "false" writer B set, leaving the demotion off for the session's
    * lifetime — a parallelism leak on every later plain scan). The FIRST
    * entrant saves the user's value, the LAST exiter restores it; only
    * the bookkeeping synchronizes — the writes themselves stay parallel.
    */
  private object AutoBucketedScanPin {
    private val Key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    private val state =
      new java.util.concurrent.ConcurrentHashMap[SparkSession, (Int, String)]
    def withPinned[T](spark: SparkSession)(f: => T): T = {
      state.compute(spark, (_, cur) =>
        if (cur == null) { val saved = spark.conf.get(Key)
          spark.conf.set(Key, "false"); (1, saved) }
        else (cur._1 + 1, cur._2))
      try f finally
        state.compute(spark, (_, cur) =>
          if (cur._1 == 1) { spark.conf.set(Key, cur._2); null }
          else (cur._1 - 1, cur._2))
    }
  }

  /** Staging-only dynamic-partition dir splitting rows by bucket id
    * (`graftbucket=<i>/`). Deliberately NOT underscore-prefixed — Spark's
    * file listings treat `_`/`.`-led path segments as hidden and stats
    * collection would see no files — and NOT a declared partition column,
    * so [[SnapshotFileIndex]] and stats collection ignore the segment.
    * Data files never contain the column (partitionBy drops it); CREATE
    * refuses a bucketed table with a real column of this name.
    */
  private[plans] val GbCol = "graftbucket"

  private[plans] implicit val jsonFormats: org.json4s.Formats = org.json4s.DefaultFormats

  /** Opens an existing snapshot table rooted at `root`.
    * `checkpointInterval` = how often a commit writes a full listing
    * instead of a delta (readers fold at most interval−1 deltas).
    */
  def table(spark: SparkSession, root: String,
      checkpointInterval: Int = 8): SnapshotTable =
    new SnapshotTable(spark, root, checkpointInterval)

  /** Creates version 0 from `df` (fails if a log already exists).
    * `bucketBy = Some((col, n))` fixes a bucketed layout at birth (see
    * [[BucketConfig]]); it cannot be added or changed later — the hash
    * placement of every existing file would be unverifiable.
    */
  def create(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      checkpointInterval: Int = 8,
      bucketBy: Option[(String, Int)] = None,
      bucketSortBy: Seq[String] = Nil): SnapshotTable =
    create(spark, root, df, partitionBy, checkpointInterval,
      bucketBy.map { case (c, n) => BucketBy(Seq(c), n, bucketSortBy) })

  /** As above with the full (multi-column) bucket spec. */
  def create(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String], checkpointInterval: Int,
      bucket: Option[BucketBy]): SnapshotTable = {
    val t = new SnapshotTable(spark, root, checkpointInterval)
    t.initialize(df, partitionBy, bucket)
    t
  }

  final class SnapshotTable private[Snapshots] (
      val spark: SparkSession, val root: String,
      val checkpointInterval: Int = 8) extends SnapshotRefOps with SnapshotMaintenanceOps
      with SnapshotBloomIndexOps with SnapshotBucketOps {
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")

    private[plans] val rootPath = new Path(root)
    private[plans] val logPath = new Path(rootPath, "_graft_log")
    private[plans] def fs: FileSystem =
      rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // ------------------------------------------------------------------ log

    private[plans] def manifestPath(v: Long): Path =
      new Path(logPath, f"v$v%08d.json")

    private[plans] def writeManifestJson(m: Manifest): String =
      org.json4s.jackson.Serialization.write(m)

    // published manifests are immutable (vacuum's in-place checkpoint
    // rewrite is logically identical), so raw reads cache per path — the
    // mainline-head walk and mainlineVersions() filter then cost one file
    // read per NEW manifest, not per call
    private val rawCache =
      new java.util.concurrent.ConcurrentHashMap[String, Manifest]()
    private[plans] def readManifest(p: Path): Manifest = {
      val key = p.toString
      val cached = rawCache.get(key)
      if (cached != null) return cached
      val in = fs.open(p)
      val m =
        try org.json4s.jackson.Serialization.read[Manifest](
          new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
        finally in.close()
      rawCache.putIfAbsent(key, m)
      m
    }

    private[plans] def versions(): Seq[Long] =
      if (!fs.exists(logPath)) Nil
      else fs.listStatus(logPath).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
        .sorted

    /** Branch commits publish into the SAME version-slot sequence (one CAS
      * namespace — no cross-prefix collisions) but carry [[RefMetaKey]] in
      * their meta; the MAINLINE (what `latest()`/CDC/streams/replication
      * see) is every version without it. Slot numbers are allocated past
      * the global max so a branch commit can never steal the mainline
      * head's next slot and wedge its retry loop.
      */
    private[plans] def isMainline(m: Manifest): Boolean = !m.meta.contains(RefMetaKey)

    /** Slot for the next MAINLINE commit after `head`: the smallest slot
      * past head whose occupants (if any) are all BRANCH commits. Skipping
      * only ref-marked slots preserves the optimistic-concurrency
      * contract: a slot occupied by a mainline manifest forces the writer
      * back through `latest()` (rebase or fail loud) — allocating past it
      * would let a stale writer publish OVER a winner and shadow its
      * commit (a lost update).
      */
    private[plans] def nextSlot(head: Manifest): Long = {
      val existing = versions().toSet
      var c = head.version + 1
      while (existing.contains(c) &&
          !isMainline(readManifest(manifestPath(c)))) c += 1
      c
    }

    /** Slot for a BRANCH commit: past the global max. Branch serialization
      * is the ref CAS, not slot contiguity — a lost slot race just retries
      * with a fresh listing, and a branch manifest published but beaten at
      * the ref bump is simply unreachable.
      */
    private[plans] def nextBranchSlot(): Long =
      versions().lastOption.getOrElse(-1L) + 1

    /** Mainline version numbers, ascending. */
    private[plans] def mainlineVersions(): Seq[Long] =
      versions().filter(v => isMainline(readManifest(manifestPath(v))))

    /** (version -> parent) over EVERY retained manifest, branch slots
      * included — metadata tables walk true lineage THROUGH forks (a
      * fast-forward's parent chain crosses branch commits a mainline-only
      * map would dead-end on).
      */
    private[plans] def lineage(): Map[Long, Long] =
      versions().map(v => v -> readManifest(manifestPath(v)).parent).toMap

    /** Latest committed manifest (resolved to full form). */
    /** Committed MAINLINE version numbers, ascending ([[Replication]]
      * walks them; branch commits are not part of the replicated lineage
      * until fast-forwarded into the mainline).
      */
    private[plans] def committedVersions(): Seq[Long] = mainlineVersions()

    /** Fully-resolved manifest of one version ([[Replication]]). */
    private[plans] def resolvedManifest(v: Long): Manifest =
      resolve(readManifest(manifestPath(v)))

    /** Rows held by `files` of manifest `m` ([[Replication]] applies the
      * per-version added files as incremental appends).
      */
    private[plans] def rowsOf(m: Manifest, files: Seq[String]): DataFrame =
      readFiles(m.copy(files = files))

    def latest(): Manifest = {
      val vs = versions()
      require(vs.nonEmpty, s"not a snapshot table (no _graft_log): $root")
      // mainline head: walk back past any branch commits at the tail
      // (usually zero — one manifest read, same as before refs existed)
      vs.reverseIterator
        .map(v => readManifest(manifestPath(v)))
        .find(isMainline)
        .map(resolve)
        .getOrElse(throw new IllegalStateException(
          s"no mainline manifest at $root — log holds only branch commits"))
    }

    /** MAINLINE manifests, oldest first (each resolved to full form).
      * Branch commits are excluded — time travel, restore-as-of, CDC, and
      * replication all walk the mainline; branch state is reached through
      * [[refs]]/[[readRef]].
      */
    def history(): Seq[Manifest] =
      mainlineVersions().map(v => resolve(readManifest(manifestPath(v))))

    /** Mainline manifests with version > `sinceVersion`, oldest first — the
      * incremental consumers' entry point (reads O(newer versions), not the
      * whole log).
      */
    def historySince(sinceVersion: Long): Seq[Manifest] =
      versions().filter(_ > sinceVersion)
        .map(v => readManifest(manifestPath(v)))
        .filter(isMainline)
        .map(resolve)

    /** The commit log as a relation — DESCRIBE HISTORY: one row per
      * retained version with its action, file/delete counts, row count
      * (from stats) and commit metadata.
      */
    def describeHistory(): DataFrame = {
      import spark.implicits._
      history().map { m =>
        (m.version, m.parent, new java.sql.Timestamp(m.timestampMs),
          m.action, m.files.size.toLong,
          m.stats.values.map(_.rows).sum, m.deletes.size.toLong,
          m.meta)
      }.toDF("version", "parent", "commit_ts", "action", "n_files",
        "n_rows_in_stats", "n_delete_sidecars", "meta")
    }

    /** Fold a delta manifest onto its (recursively resolved) parent. A
      * manifest's resolved form is immutable, so it caches per version;
      * recursion depth is bounded by `checkpointInterval` (vacuum keeps the
      * oldest retained manifest full).
      */
    private val resolvedCache =
      new java.util.concurrent.ConcurrentHashMap[Long, Manifest]()
    private[plans] def resolve(m: Manifest): Manifest = {
      if (m.kind != "delta") return m
      // NOT computeIfAbsent: the parent resolution would nest a map update
      // inside the mapping function, which ConcurrentHashMap forbids
      // (recursive-update IllegalStateException). Racing duplicate work is
      // harmless — resolution is deterministic.
      val cached = resolvedCache.get(m.version)
      if (cached != null) return cached
      val parent =
        try resolve(readManifest(manifestPath(m.parent)))
        catch {
          case e @ (_: java.io.FileNotFoundException |
              _: java.nio.file.NoSuchFileException) =>
            // a concurrent vacuum pruned the parent — but it only does so
            // AFTER rewriting the kept child as a full checkpoint in
            // place. Our cached raw copy predates the rewrite: drop it,
            // re-read from disk, and resolve the fresh (full) form.
            rawCache.remove(manifestPath(m.version).toString)
            val fresh = readManifest(manifestPath(m.version))
            if (fresh.kind != "delta") return fresh
            throw e // genuinely broken chain: fail loud, never wrong data
        }
      val rm = m.removes.toSet
      val drm = m.deleteRemoves.toSet
      val full = m.copy(kind = "full",
        files = parent.files.filterNot(rm) ++ m.adds,
        stats = (parent.stats -- rm) ++ m.addStats,
        deletes = parent.deletes.filterNot(drm) ++ m.deleteAdds,
        adds = Nil, removes = Nil, addStats = Map.empty,
        deleteAdds = Nil, deleteRemoves = Nil)
      resolvedCache.putIfAbsent(m.version, full)
      full
    }

    /** Publish `target` (a FULL next state diffed against the resolved
      * `head` it was planned from): checkpoint versions persist the full
      * listing, every other version persists only the delta. The CAS
      * contract is unchanged — one winner per version slot.
      */
    private[plans] def publish(head: Manifest, target: Manifest): Boolean = {
      val toWrite =
        if (target.version % checkpointInterval == 0) target
        else {
          val headFiles = head.files.toSet
          val targetFiles = target.files.toSet
          val headDels = head.deletes.toSet
          val targetDels = target.deletes.toSet
          val adds = target.files.filterNot(headFiles)
          target.copy(kind = "delta",
            files = Nil, stats = Map.empty, deletes = Nil,
            adds = adds,
            removes = head.files.filterNot(targetFiles),
            addStats = target.stats.view.filterKeys(adds.toSet).toMap,
            deleteAdds = target.deletes.filterNot(headDels),
            deleteRemoves = head.deletes.filterNot(targetDels))
        }
      casPublish(toWrite)
    }

    /** Atomic create-exclusive publish of `v{version}.json`. Local
      * filesystems get a true atomic hard link (link(2) fails with EEXIST);
      * others use rename-without-overwrite via FileContext, the HDFS-portable
      * equivalent (atomic, fails if the destination exists).
      */
    private[plans] def casPublish(m: Manifest): Boolean = {
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
      * new files' table-relative paths plus their column stats. Nothing is
      * visible to readers until the manifest referencing these files is
      * published. Stats cost one aggregation job over the just-written files
      * (page-cache warm); the production path reads them from the parquet
      * footers the write already produced.
      */
    private[plans] def stage(df: DataFrame, partitionCols: Seq[String],
        mapping: Map[String, String] = Map.empty,
        preserveLayout: Boolean = false)
        : (Seq[String], Map[String, FileStat]) = {
      // data files always hold PHYSICAL column names: post-rename commits
      // keep writing the birth name, so every file in the table agrees and
      // reads need exactly one alias layer (stats below key physically too)
      val physDf =
        if (mapping.isEmpty) df
        else df.select(df.columns.map(c =>
          col(c).as(mapping.getOrElse(c, c))): _*)
      // transform partition fields (day(ts) → ts_day dirs, ...) exist only
      // as WRITE-TIME derived columns: files keep storing the source
      // column, stats/bloom cover the source (physDf.schema below), and
      // the dir value is recomputed here on every write — so compaction
      // and COW rewrites migrate old generations to the current spec
      val stagedDf = {
        val physCols = physDf.columns.toSet
        partitionCols.filterNot(physCols.contains).foldLeft(physDf) {
          (d, name) =>
            PartitionTransforms.fromDirName(name, physCols.contains) match {
              case Some(sp) => d.withColumn(name,
                PartitionTransforms.valueColumn(sp, d.schema(sp.src).dataType))
              case None => throw new IllegalArgumentException(
                s"partition column $name is neither a data column nor a " +
                  "recognizable transform field")
            }
        }
      }
      val commitDir = s"data/${UUID.randomUUID().toString.take(8)}"
      val dir = new Path(rootPath, commitDir)
      // Bucketed layout: a [[GbCol]] dynamic-partition dir splits every task's
      // rows by their OWN hash, so file->bucket assignment is correct by
      // construction (never inferred from task ids — an AQE re-plan or a
      // caller-supplied layout cannot misplace a row). The default path
      // additionally repartitions ON the bucket column — Spark's
      // HashPartitioning placement IS the bucket hash, so each task holds
      // exactly one bucket and a commit writes n files per partition dir,
      // not tasks x n. `preserveLayout` (clusterBy/zOrderBy) keeps the
      // caller's range layout instead; their files still split per bucket.
      val bCfg = bucketConfig()
      val toWrite = bCfg match {
        case Some(b) =>
          val base = stagedDf.withColumn(GbCol,
            // NEVER functions.hash: it resolves through the SQL registry,
            // where `hash` is Hive's hashCode (HiveFunctions) — placement
            // must equal HashPartitioning's Murmur3 (task == bucket)
            pmod(PartitionTransforms.murmur3(b.cols.map(col): _*), lit(b.n)))
          if (preserveLayout)
            // the caller (clusterBy/zOrderBy) owns the PARTITION layout,
            // but intra-file order is free — sortWithinPartitions never
            // moves a row across partitions, so the range layout survives
            // AND each written file still honors the SORTED BY contract
            // the scan declares (skipping this would let a z-ordered
            // single-file bucket claim a sort it doesn't have — silent
            // wrong merge-join results)
            (if (b.sortCols.isEmpty) base
             else base.sortWithinPartitions(
               (partitionCols :+ GbCol) ++ b.sortCols map col: _*))
          else {
            val rep = base.repartition(b.n, b.cols.map(col): _*)
            // SORTED BY buckets: sort with the writer's required prefix
            // (partition dirs first, bucket dir next) so FileFormatWriter
            // keeps THIS order instead of re-sorting on its own prefix —
            // each file then holds its sort columns in order and the scan
            // reports the ordering (sort-free SMB merge joins)
            if (b.sortCols.isEmpty) rep
            else rep.sortWithinPartitions(
              (partitionCols :+ GbCol) ++ b.sortCols map col: _*)
          }
        case None => stagedDf
      }
      val writePartCols = partitionCols ++ (if (bCfg.isDefined) Seq(GbCol) else Nil)
      val w = toWrite.write.mode("errorifexists")
      def runWrite(): Unit =
        (if (writePartCols.nonEmpty) w.partitionBy(writePartCols: _*) else w)
          .parquet(dir.toString)
      if (bCfg.isEmpty) runWrite()
      else
        // When the input is THIS table (compact / COW rewrite), keep its
        // bucketed scan ON for the duration of the write: the planner
        // elides our repartition against the scan's HashPartitioning, and
        // the auto-bucketed-scan demotion would then un-group the rows
        // AFTER the shuffle is gone (split-based read tasks mixing
        // buckets -> files-per-bucket multiply and the SORTED BY contract
        // decays on every compaction). With the demotion off, the elision
        // is sound — a self-rewrite re-buckets with ZERO shuffles.
        AutoBucketedScanPin.withPinned(spark)(runWrite())
      if (bCfg.isDefined) tagBucketFiles(dir)
      val listed = listParquetStatus(dir)
      val files = listed.map(s => relativize(s.getPath))
      if (files.isEmpty) (files, Map.empty)
      else {
        // byte sizes come from the listing the write just produced — scan
        // planning then needs no further filesystem calls (see FileStat)
        val sizes = listed.map(s => relativize(s.getPath) -> s.getLen).toMap
        val stats0 = collectStats(dir, listed, physDf.schema, partitionCols)
        val stats = stats0
          .map { case (rel, st) => rel -> st.copy(bytes = sizes.getOrElse(rel, 0L)) }
        writeBloomSidecar(dir, org.apache.spark.sql.types.StructType(
          physDf.schema.fields.filterNot(f => partitionCols.contains(f.name))))
        // a 0-row part file produces no stats group but still needs a size
        val empties = files.filterNot(stats.contains)
          .map(rel => rel -> FileStat(0L, Map.empty, sizes.getOrElse(rel, 0L)))
        (files, stats ++ empties)
      }
    }


    /** Min/max/null-count per (file, column) for the skippable data columns.
      * Partition columns are excluded — their values live in the path and
      * [[readWhere]] prunes them from the `k=v` segments directly.
      *
      * Read from the PARQUET FOOTERS the write just produced (r17): the
      * previous implementation re-scanned every written data file with a
      * min/max aggregation job over ALL columns — a second full pass over
      * each commit's bytes, which at ingest scale doubles the write
      * path's read I/O. Footers carry exact per-row-group row counts,
      * null counts, and min/max for every primitive column, so stats
      * collection is now a metadata read (KBs per file, driver-side,
      * bounded by files per commit — the same bound the manifest itself
      * has). Rendering matches what [[Pruning.key]] parses; any bound the
      * footer cannot vouch for (absent stats, NaN, unknown null count,
      * exotic physical type) is OMITTED, which the pruner treats as
      * "cannot reason, keep the file" — stats only skip, never decide, so
      * a dropped bound costs skipping-efficiency, never correctness.
      *
      * EXCEPTION — TIMESTAMP (LTZ) columns: Spark's default parquet
      * timestamp encoding is INT96, whose footer stats parquet deprecated
      * (none are written). The physical encoding must NOT change (every
      * external reader of engine-written files — the qtest DuckDB leg,
      * the driver's oracle — types annotated UTC-adjusted MICROS as
      * timestamptz, a representation break; and flipping the session conf
      * around the write races with concurrent writers on the shared
      * session). Those columns keep the pre-r17 aggregation job,
      * restricted to JUST the LTZ columns — a narrow columnar scan, not
      * the full-width re-read. TIMESTAMP_NTZ always writes annotated
      * MICROS and stays on the footer path.
      * SnapshotFooterStatsSpec pins footer-vs-aggregation equality per
      * type, nulls and all.
      */
    private def collectStats(dir: Path,
        files: Seq[org.apache.hadoop.fs.FileStatus],
        schema: org.apache.spark.sql.types.StructType,
        partitionCols: Seq[String]): Map[String, FileStat] = {
      import org.apache.spark.sql.types._
      val statTypes: Map[String, DataType] = schema.fields
        .filterNot(f => partitionCols.contains(f.name))
        .filter(f => f.dataType match {
          case _: NumericType | StringType | DateType | TimestampType |
               TimestampNTZType | BooleanType => true
          case _ => false
        })
        .map(f => f.name -> f.dataType).toMap
      val ltzCols = schema.fields
        .filterNot(f => partitionCols.contains(f.name))
        .filter(_.dataType == TimestampType)
      val ltzStats: Map[String, Map[String, ColStat]] =
        if (ltzCols.isEmpty) Map.empty
        else {
          val staged = spark.read
            .schema(StructType(ltzCols)).parquet(dir.toString)
          val aggs = ltzCols.toSeq.flatMap { f =>
            Seq(min(col(f.name)).cast("string").as(s"__min_${f.name}"),
              max(col(f.name)).cast("string").as(s"__max_${f.name}"),
              sum(when(col(f.name).isNull, 1L).otherwise(0L))
                .as(s"__nulls_${f.name}"))
          }
          val rootQ = fs.makeQualified(rootPath).toUri.getPath + "/"
          staged.groupBy(input_file_name().as("__f"))
            .agg(aggs.head, aggs.tail: _*)
            .collect()
            .map { r =>
              val rel = new Path(r.getString(0)).toUri.getPath.stripPrefix(rootQ)
              rel -> ltzCols.map { f =>
                f.name -> ColStat(
                  Option(r.getAs[String](s"__min_${f.name}")),
                  Option(r.getAs[String](s"__max_${f.name}")),
                  r.getAs[Long](s"__nulls_${f.name}"))
              }.toMap
            }.toMap
        }
      val conf = spark.sparkContext.hadoopConfiguration
      def statOf(st: org.apache.hadoop.fs.FileStatus): (String, FileStat) = {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        val (rows, cols) =
          try {
            val blocks = reader.getFooter.getBlocks
            val rows = blocks.asScala.map(_.getRowCount).sum
            // merge row-group stats per column (mergeStatistics uses the
            // column's own comparator — unsigned UTF-8 for binary, which is
            // exactly Spark's string order)
            val merged = scala.collection.mutable.Map.empty[
              String, org.apache.parquet.column.statistics.Statistics[_]]
            val complete = scala.collection.mutable.Map.empty[String, Boolean]
            blocks.asScala.foreach { b =>
              b.getColumns.asScala.foreach { c =>
                val name = c.getPath.toDotString
                // top-level leaves only (ADVICE r17): a struct leaf a.b
                // dot-renders identically to a column literally named
                // "a.b" — matching it against statTypes would attribute
                // the wrong column's bounds and mis-prune
                if (c.getPath.size == 1 && statTypes.contains(name)) {
                  val s = c.getStatistics
                  val ok = s != null && !s.isEmpty && s.isNumNullsSet
                  complete.update(name, complete.getOrElse(name, true) && ok)
                  if (ok) merged.get(name) match {
                    // erased generic: both sides are the same column's
                    // concrete Statistics subclass, the Integer cast only
                    // satisfies the compiler
                    case Some(acc) => acc
                      .asInstanceOf[org.apache.parquet.column.statistics.Statistics[java.lang.Integer]]
                      .mergeStatistics(s
                        .asInstanceOf[org.apache.parquet.column.statistics.Statistics[java.lang.Integer]])
                    case None => merged.put(name, s.copy())
                  }
                }
              }
            }
            val cols = statTypes.keysIterator.flatMap { name =>
              merged.get(name) match {
                case Some(s) if complete.getOrElse(name, false) =>
                  val (mn, mx) =
                    if (!s.hasNonNullValue) (None, None)
                    else (renderStat(statTypes(name), s.genericGetMin),
                      renderStat(statTypes(name), s.genericGetMax))
                  Some(name -> ColStat(mn, mx, s.getNumNulls))
                case _ => None // no trustworthy footer stats — keep-file rule
              }
            }.toMap
            (rows, cols)
          } finally reader.close()
        val rel = relativize(st.getPath)
        rel -> FileStat(rows, cols ++ ltzStats.getOrElse(rel, Map.empty))
      }
      // Footers are independent metadata reads; the serial driver loop
      // serialized many-file commits (ADVICE r17). A small fixed pool bounds
      // concurrency; result order is irrelevant (keyed map).
      if (files.size <= 1) files.map(statOf).toMap
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, files.size))
        try {
          val tasks: java.util.List[java.util.concurrent.Callable[(String, FileStat)]] =
            files.map { st =>
              new java.util.concurrent.Callable[(String, FileStat)] {
                override def call(): (String, FileStat) = statOf(st)
              }
            }.asJava
          pool.invokeAll(tasks).asScala.map(_.get()).toMap
        } finally pool.shutdown()
      }
    }

    /** Footer value → the stats-string rendering [[Pruning.key]] parses.
      * None (bound omitted → file kept) for anything unorderable: NaN
      * floats, or a physical/logical type this engine never writes.
      */
    private def renderStat(dt: org.apache.spark.sql.types.DataType,
        v: Any): Option[String] = {
      import org.apache.spark.sql.types._
      (dt, v) match {
        case (_, null) => None
        case (ByteType | ShortType | IntegerType, i: java.lang.Integer) =>
          Some(i.toString)
        case (LongType, l: java.lang.Long) => Some(l.toString)
        case (FloatType, f: java.lang.Float) =>
          if (f.isNaN) None else Some(f.toString)
        case (DoubleType, d: java.lang.Double) =>
          if (d.isNaN) None else Some(d.toString)
        case (BooleanType, b: java.lang.Boolean) => Some(b.toString)
        case (StringType, b: org.apache.parquet.io.api.Binary) =>
          Some(b.toStringUsingUTF8)
        case (DateType, i: java.lang.Integer) =>
          Some(java.time.LocalDate.ofEpochDay(i.toLong).toString)
        case (TimestampType | TimestampNTZType, l: java.lang.Long) =>
          // Spark writes epoch/wall micros (stage pins TIMESTAMP_MICROS);
          // render the wall-clock UTC form Pruning.key parses back
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            java.lang.Math.floorDiv(l.longValue, 1000000L),
            (java.lang.Math.floorMod(l.longValue, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
          Some(ldt.toString.replace('T', ' '))
        case (t: DecimalType, i: java.lang.Integer) =>
          Some(java.math.BigDecimal.valueOf(i.longValue, t.scale).toPlainString)
        case (t: DecimalType, l: java.lang.Long) =>
          Some(java.math.BigDecimal.valueOf(l.longValue, t.scale).toPlainString)
        case (t: DecimalType, b: org.apache.parquet.io.api.Binary) =>
          Some(new java.math.BigDecimal(
            new java.math.BigInteger(b.getBytes), t.scale).toPlainString)
        case _ => None
      }
    }

    private def listParquetStatus(dir: Path)
        : Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val it = fs.listFiles(dir, true)
      val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          buf += s
      }
      buf.result()
    }

    private[plans] def listParquet(dir: Path): Seq[Path] = {
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

    private[plans] def relativize(p: Path): String = {
      val rootUri = fs.makeQualified(rootPath).toUri.getPath
      val pUri = fs.makeQualified(p).toUri.getPath
      require(pUri.startsWith(rootUri + "/"), s"$p not under $root")
      pUri.stripPrefix(rootUri + "/")
    }

    // asNullable: table columns are always nullable (the reference's model —
    // every Hive column admits NULL), and DML can introduce NULLs into a
    // column whose CREATE source happened to be non-nullable. Reading a
    // parquet NULL through a non-nullable schema would not error — the
    // vectorized reader returns the primitive slot (0/0.0), which is silent
    // corruption.
    private[plans] def schemaOf(json: String): org.apache.spark.sql.types.StructType =
      nullableType(org.apache.spark.sql.types.DataType.fromJson(json))
        .asInstanceOf[org.apache.spark.sql.types.StructType]

    private def nullableType(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = {
      import org.apache.spark.sql.types._
      dt match {
        case s: StructType => StructType(s.fields.map(f =>
          f.copy(dataType = nullableType(f.dataType), nullable = true)))
        case a: ArrayType =>
          ArrayType(nullableType(a.elementType), containsNull = true)
        case m: MapType =>
          MapType(nullableType(m.keyType), nullableType(m.valueType),
            valueContainsNull = true)
        case other => other
      }
    }

    /** Reads exactly one manifest's files, with pending merge-on-read
      * deletes applied. The stored schema is passed explicitly (no footer
      * sampling); partition values come from the `k=v` path segments under
      * each commit dir (`basePath` anchors the discovery so data/<uuid>
      * segments are not parsed as partitions). Tables with no pending
      * deletes take the plain-scan fast path — zero overhead.
      */
    private[plans] def readFiles(m: Manifest): DataFrame = {
      val schema = schemaOf(m.schemaJson)
      if (m.files.isEmpty)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      if (m.deletes.isEmpty)
        // manifest-backed FileIndex: filters pushed by Catalyst reach
        // listFiles at PLAN time and prune the file list with the manifest
        // stats — every read surface (plain SQL over a named table, the
        // TVFs, read()) skips files whose range excludes the predicate,
        // not just readWhere (the Delta-Lake log-backed-index design).
        // The scan runs under PHYSICAL column names; this projection both
        // restores the declared column order and aliases each column back
        // to its logical name (a rename later in the plan would block
        // pushdown; an alias does not — Catalyst substitutes through it).
        scanRelation(m, schema).select(
          schema.fieldNames.map(n => col(m.physical(n)).as(n)): _*)
      else
        applyDeletes(readFilesMeta(m), m).select(schema.fieldNames.map(col): _*)
    }

    /** Base scan plus row provenance: `__file` (table-relative path) and
      * `__pos` (row index within its file) from the parquet reader's
      * `_metadata` columns — the handle merge-on-read deletes key on.
      */
    private[plans] def readFilesMeta(m: Manifest): DataFrame = {
      val schema = schemaOf(m.schemaJson)
      if (m.files.isEmpty)
        return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .withColumn("__file", lit(null).cast("string"))
          .withColumn("__pos", lit(null).cast("long"))
      // same manifest-backed index as readFiles: MOR reads and COW/merge
      // affected-row discovery prune with the pushed filters too (a file
      // pruned from the base scan can hold no matching rows; its delete
      // entries then match nothing — correctness never depends on stats)
      scanRelationMeta(m, schema)
        .select(schema.fieldNames.map(n => col(m.physical(n)).as(n)) :+
          col("__file") :+ col("__pos"): _*)
    }

    /** Scan over the manifest's files through [[SnapshotFileIndex]]. The
      * relation's columns are the PHYSICAL parquet names (identical to the
      * logical ones unless a RENAME COLUMN committed a mapping); callers
      * alias them back to logical. Filters pushed through the alias arrive
      * here named physically — matching both the file-level stats (recorded
      * under physical names at write time) and the parquet footers.
      * Partition columns never rename, so the partition schema is shared.
      */
    /** The partition spec `f` was WRITTEN under — the ordered keys of its
      * own `k=v` path segments (bucket staging dirs excluded). After
      * `SET PARTITION SPEC` a manifest's files span specs; each file's
      * path is the durable record of its birth spec (it survives
      * checkpoint folding and vacuum because it IS the file's location).
      * Keys are physical column names — partition dirs never rename.
      */
    private[plans] def fileSpecOf(f: String): Seq[String] =
      f.split('/').iterator
        .filter(s => s.indexOf('=') > 0)
        .map(s => s.substring(0, s.indexOf('=')))
        .filterNot(_ == GbCol)
        .toSeq

    /** `m`'s files grouped by birth partition spec, in first-file order
      * (commit order: older generations first, so plans and results are
      * deterministic). One group — every table that never evolved its
      * spec — means the scan is a single relation, exactly the pre-
      * evolution plan shape.
      */
    private def specGroups(m: Manifest): Seq[(Seq[String], Seq[String])] = {
      val firstIdx = scala.collection.mutable.LinkedHashMap
        .empty[Seq[String], scala.collection.mutable.ArrayBuffer[String]]
      m.files.foreach(f =>
        firstIdx.getOrElseUpdate(fileSpecOf(f),
          scala.collection.mutable.ArrayBuffer.empty[String]) += f)
      firstIdx.toSeq.map { case (spec, fls) => (spec, fls.toSeq) }
    }

    /** [[scanRelation]] plus row provenance (`__file`, `__pos`) from the
      * parquet reader's `_metadata` columns. `_metadata` only resolves
      * DIRECTLY on a file relation — never through a union — so on a
      * mixed-spec table the provenance projection applies per spec
      * generation before unioning. Every caller needing `_metadata` must
      * come through here rather than selecting it off [[scanRelation]].
      */
    private def scanRelationMeta(m: Manifest,
        schema: org.apache.spark.sql.types.StructType,
        isStreaming: Boolean = false): DataFrame = {
      val prefix = metaPathPrefix(m)
      def attach(base: DataFrame): DataFrame =
        base.withColumn("__file",
            expr(s"substring(_metadata.file_path, ${prefix.length + 2})"))
          .withColumn("__pos", col("_metadata.row_index"))
      val groups = specGroups(m)
      if (groups.size <= 1 && groups.forall(_._1 == m.partitionCols))
        attach(scanOne(m, schema, isStreaming))
      else {
        val physNames = schema.fields.map(f => m.physical(f.name))
        groups.map { case (spec, fls) =>
          attach(scanOne(m.copy(partitionCols = spec, files = fls), schema,
            isStreaming))
            .select((physNames.map(col) ++
              Seq(col("__file"), col("__pos"))).toIndexedSeq: _*)
        }.reduce(_.union(_))
      }
    }

    private def scanRelation(m: Manifest,
        schema: org.apache.spark.sql.types.StructType,
        isStreaming: Boolean = false): DataFrame = {
      val groups = specGroups(m)
      // manifest partitionCols are physical names (partition dirs never
      // rename), directly comparable to the path-derived keys
      if (groups.size <= 1 && groups.forall(_._1 == m.partitionCols))
        scanOne(m, schema, isStreaming)
      else {
        // mixed-spec table: one relation per spec generation, each pruning
        // under ITS OWN spec (path values for its partition columns, stats
        // for the rest), projected to a common physical column order and
        // unioned. Spec changes are rare, so the union is 2-3 branches;
        // Catalyst pushes filters into every branch independently.
        val physNames = schema.fields.map(f => m.physical(f.name))
        groups.map { case (spec, fls) =>
          scanOne(m.copy(partitionCols = spec, files = fls), schema,
            isStreaming).select(physNames.map(col).toIndexedSeq: _*)
        }.reduce(_.union(_))
      }
    }

    private def scanOne(m: Manifest,
        schema: org.apache.spark.sql.types.StructType,
        isStreaming: Boolean = false): DataFrame = {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val physSchema = org.apache.spark.sql.types.StructType(
        schema.fields.map(f => f.copy(name = m.physical(f.name))))
      val dataSchema = org.apache.spark.sql.types.StructType(
        physSchema.fields.filterNot(f => m.partitionCols.contains(f.name)))
      val index = new SnapshotFileIndex(fs.makeQualified(rootPath), fs, m,
        physSchema, bloomPrune)
      // bucketed tables surface their layout to the planner: the scan
      // reports HashPartitioning(col, n) (plus per-bucket file grouping and
      // bucket pruning on point predicates), so co-bucketed joins and
      // bucket-key aggregations plan with no Exchange. The config stores
      // the physical name — exactly the name this relation's schema uses.
      val bSpec = bucketConfig().map(b =>
        org.apache.spark.sql.catalyst.catalog.BucketSpec(b.n, b.cols,
          b.sortCols))
      val rel = HadoopFsRelation(index, index.partitionSchema, dataSchema,
        bSpec,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
        Map.empty[String, String])(spark)
      org.apache.spark.sql.GraftShims
        .ofRows(spark, LogicalRelation(rel, isStreaming = isStreaming))
    }

    /** How the parquet reader renders this table's root in
      * `_metadata.file_path` (scheme rendering differs from Hadoop's
      * `makeQualified`), probed once per table handle from a single file.
      */
    @volatile private var cachedMetaPrefix: String = null
    private def metaPathPrefix(m: Manifest): String = {
      if (cachedMetaPrefix == null) {
        // probe over ALL files (the first may be a 0-row file); whichever
        // file the sampled row came from, its absolute path ends with its
        // table-relative name — the prefix is what precedes it
        // probe through the SAME relation the reads use — path rendering
        // differs between reader implementations, and the prefix must match
        // what _metadata.file_path yields in the actual scans
        // per spec generation (`_metadata` resolves only on a direct file
        // relation, not a mixed-spec union), first group with a row wins —
        // every file shares the one table-root prefix
        val sample = specGroups(m).iterator.map { case (spec, fls) =>
          scanOne(m.copy(partitionCols = spec, files = fls),
              schemaOf(m.schemaJson))
            .select(col("_metadata.file_path")).take(1)
        }.find(_.nonEmpty).getOrElse(Array.empty[org.apache.spark.sql.Row])
        sample.headOption match {
          case Some(row) =>
            val abs = row.getString(0)
            val rel = m.files.find(f => abs.endsWith("/" + f)).getOrElse(
              sys.error(s"_metadata.file_path '$abs' matches no manifest file"))
            cachedMetaPrefix = abs.dropRight(rel.length + 1)
          case None =>
            // every data file holds zero rows (writers can stage empty part
            // files): no row exists to render a path, and none can ever
            // match a delete entry — any well-formed prefix serves, and it
            // is NOT cached so a later append re-probes the real rendering
            return fs.makeQualified(rootPath).toString
        }
      }
      cachedMetaPrefix
    }

    /** Anti-join the manifest's pending delete entries (provenance columns
      * are preserved). Entries referencing files no longer in the manifest
      * match nothing — stale entries are harmless by construction, which is
      * what lets COW and compaction skip sidecar rewrites entirely.
      */
    private[plans] def applyDeletes(withMeta: DataFrame, m: Manifest): DataFrame =
      if (m.deletes.isEmpty) withMeta
      else {
        val delSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("file",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("pos",
            org.apache.spark.sql.types.LongType)))
        val dels = spark.read.schema(delSchema)
          .parquet(m.deletes.map(d => new Path(rootPath, d).toString): _*)
        withMeta.join(dels,
          withMeta("__file") === dels("file") && withMeta("__pos") === dels("pos"),
          "left_anti")
      }

    // ---------------------------------------------------------------- reads

    /** Current snapshot. */
    def read(): DataFrame = readFiles(latest())

    /** Time travel by version. */
    def readVersion(v: Long): DataFrame = {
      val p = manifestPath(v)
      require(fs.exists(p), s"version $v does not exist (vacuumed or never committed)")
      readFiles(resolve(readManifest(p)))
    }

    /** Time travel by timestamp: the last version committed at or before
      * `tsMs`.
      */
    def readAsOf(tsMs: Long): DataFrame = {
      val h = history().filter(_.timestampMs <= tsMs)
      require(h.nonEmpty, s"no version committed at or before $tsMs")
      readFiles(h.last)
    }

    /** Stats-pruned scan: plans the file list against `cond` BEFORE any IO —
      * partition-column conjuncts prune on the `k=v` path segments, data
      * columns on the manifest's per-file min/max — then applies the full
      * predicate to the surviving files (stats only skip, never decide, so
      * correctness never depends on them). At 100 TB this is the difference
      * between opening every file and opening the handful whose range
      * intersects the predicate — scan planning, not scan filtering.
      */
    def readWhere(cond: Column): DataFrame = {
      val m = latest()
      readFiles(m.copy(files = planFiles(m, cond))).filter(cond)
    }

    /** The pruned file list [[readWhere]] would scan (exposed for tests and
      * EXPLAIN-style inspection). The predicate is resolved by the analyzer
      * against the table schema (types checked, casts inserted), then
      * evaluated file-by-file against the manifest ranges.
      */
    def planFiles(m: Manifest, cond: Column): Seq[String] = {
      val schema = schemaOf(m.schemaJson)
      val resolved = {
        val empty = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        empty.filter(cond).queryExecution.analyzed match {
          case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) => Some(c)
          case _ => None
        }
      }
      resolved match {
        case Some(c) =>
          // stats and path segments are keyed by PHYSICAL names — rewrite
          // the predicate's attributes through the mapping before pruning
          val physC =
            if (m.colMapping.isEmpty) c
            else c.transform {
              case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
                  if m.colMapping.contains(a.name) =>
                a.withName(m.colMapping(a.name))
            }
          val physSchema = org.apache.spark.sql.types.StructType(
            schema.fields.map(f => f.copy(name = m.physical(f.name))))
          bloomPrune(m.files.filter(f => Pruning.mayMatch(f, m.stats.get(f),
            m.partitionCols, physSchema, physC)), Seq(physC))
        case None => m.files
      }
    }

    /** Incremental read: rows in files ADDED by each commit after
      * `sinceVersion`, tagged `_commit_version` / `_commit_action`. Appends
      * yield exact row-level changes; COW commits (delete/update/merge)
      * yield the post-image of the rewritten files; `compact` commits are
      * skipped (data-identical by construction). The consumer contract is
      * the standard table-format one: downstream incremental jobs read
      * appended data exactly once per version.
      */
    def readChanges(sinceVersion: Long): DataFrame = {
      // read only the manifests after `sinceVersion` plus each one's parent
      // (for the added-files diff) — O(changed versions), not O(log length)
      val newer = versions().filter(_ > sinceVersion)
      // each mainline commit diffs against the PREVIOUS MAINLINE manifest,
      // not its parent pointer: a fast-forward's parent is the branch head
      // (whose files it already carries — zero diff), while the change the
      // mainline consumer owes is everything the publish surfaced
      var prevMainline: Option[Manifest] =
        versions().filter(_ <= sinceVersion).reverseIterator
          .map(v => readManifest(manifestPath(v)))
          .find(isMainline)
          .map(resolve)
      val changes = newer
        .map(v => readManifest(manifestPath(v)))
        // branch commits are not mainline changes (they surface via
        // fast-forward); compact and cluster are data-identical
        // reorganizations — their rewritten files are not changes
        .filter(isMainline)
        .map(resolve)
        .map { m => val prev = prevMainline; prevMainline = Some(m); (m, prev) }
        .filter { case (m, _) => m.action != "compact" &&
          m.action != "cluster" && m.action != "zorder" }
        .flatMap { case (m, prev) =>
          val parentFiles = prev.map(_.files.toSet).getOrElse(Set.empty[String])
          val added = m.files.filterNot(parentFiles)
          if (added.isEmpty) None
          else Some(readFiles(m.copy(files = added))
            .withColumn("_commit_version", lit(m.version))
            .withColumn("_commit_action", lit(m.action)))
        }
      // allowMissingColumns: versions on either side of a schema evolution
      // union by name with NULL fill, like the per-version reads themselves
      changes.reduceOption(_.unionByName(_, allowMissingColumns = true)).getOrElse {
        readFiles(latest().copy(files = Nil))
          .withColumn("_commit_version", lit(-1L))
          .withColumn("_commit_action", lit(""))
          .limit(0)
      }
    }

    /** Row images RETIRED by merge-on-read delete entries published after
      * `sinceVersion` — the negative half of a signed change set (the
      * reference maintains aggregates under deletes the same way: ref
      * ql/optimizer/calcite/rules/views/
      * HiveAggregateInsertDeleteIncrementalRewritingRule.java folds
      * deleted rows as negative deltas). Valid when the commits in
      * `(sinceVersion, head]` are only appends and MOR DML: then
      * `head.deletes \ since.deletes` are exactly the sidecars those
      * commits published. Reorganizations (compact/cluster/zorder)
      * CONSOLIDATE sidecars — callers must full-rebuild across those, as
      * [[graft.plans.IncrementalViews]] does.
      *
      * Scale: the sidecars are (file, pos) lists — O(retired rows); the
      * base scan is restricted to the affected files (collected
      * driver-side from the sidecars, bounded by the affected-file count,
      * same bound as the COW planners) and the semi-join keys on exactly
      * the provenance columns the MOR read path uses.
      */
    def readRetiredRows(sinceVersion: Long, untilVersion: Long = -1L)
        : DataFrame = {
      val head =
        if (untilVersion < 0) latest() else resolvedManifest(untilVersion)
      val schema = schemaOf(head.schemaJson)
      val sinceDel = resolvedManifest(sinceVersion).deletes.toSet
      val newDel = head.deletes.filterNot(sinceDel)
      if (newDel.isEmpty)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val delSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType)))
      val dels = spark.read.schema(delSchema)
        .parquet(newDel.map(d => new Path(rootPath, d).toString): _*)
      val affected = dels.select("file").distinct()
        .collect().map(_.getString(0)).toSet // bounded: affected files only
      val base = readFilesMeta(head.copy(files =
        head.files.filter(affected), deletes = Nil))
      base.join(dels,
          base("__file") === dels("file") && base("__pos") === dels("pos"),
          "left_semi")
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }

    /** One micro-batch for the streaming source ([[graft.streaming.
      * SnapshotSourceProvider]]): the rows the stream owes for the version
      * range, as STREAMING relations (MicroBatchExecution requires
      * `isStreaming=true` leaves).
      *
      *   - `sinceVersion = None` (first batch of a fresh query): the full
      *     snapshot at `untilVersion` — file list + pending MOR deletes of
      *     that manifest, exactly what a batch read of the version returns.
      *   - `Some(s)`: per-version replay of files ADDED by each commit in
      *     `(s, untilVersion]` — append order, exactly once per version.
      *     Data-identical reorganizations (compact/cluster) and
      *     metadata-only commits emit nothing. Commits that REMOVE data
      *     (delete/truncate) fail the stream unless `ignoreDeletes`;
      *     commits that rewrite rows (update/merge/overwrite, and their
      *     MOR twins) fail unless `ignoreChanges` — then their added files
      *     re-emit the rewritten rows (the Delta streaming-source
      *     contract: downstream must tolerate duplicates under
      *     ignoreChanges).
      *
      * Columns bind by PHYSICAL identity captured at stream start
      * (`streamSchema` logical names + `streamMapping`), so a column
      * renamed mid-stream keeps flowing under the stream's name and a
      * column added mid-stream is ignored — the stream's schema is fixed
      * for the query's lifetime, like every Spark source.
      */
    private[graft] def streamBatch(sinceVersion: Option[Long],
        untilVersion: Long,
        streamSchema: org.apache.spark.sql.types.StructType,
        streamMapping: Map[String, String],
        ignoreDeletes: Boolean, ignoreChanges: Boolean): DataFrame = {
      def emit(m: Manifest, files: Seq[String], withDeletes: Boolean)
          : DataFrame = {
        val vSchema = schemaOf(m.schemaJson)
        val physPresent = vSchema.fieldNames.map(m.physical).toSet
        val base =
          if (!withDeletes || m.deletes.isEmpty)
            scanRelation(m.copy(files = files), vSchema, isStreaming = true)
          else
            applyDeletes(scanRelationMeta(m.copy(files = files), vSchema,
              isStreaming = true), m)
        base.select(streamSchema.fields.map { f =>
          val phys = streamMapping.getOrElse(f.name, f.name)
          (if (physPresent.contains(phys)) col(phys).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)
        }.toIndexedSeq: _*)
      }
      val frames = sinceVersion match {
        case None =>
          val m = resolve(readManifest(manifestPath(untilVersion)))
          if (m.files.isEmpty) Nil else Seq(emit(m, m.files, withDeletes = true))
        case Some(s) =>
          var prevMainline: Option[Manifest] =
            versions().filter(_ <= s).reverseIterator
              .map(v => readManifest(manifestPath(v)))
              .find(isMainline)
              .map(resolve)
          versions().filter(v => v > s && v <= untilVersion).flatMap { v =>
            val raw = readManifest(manifestPath(v))
            if (!isMainline(raw)) Nil else {
            val m = resolve(raw)
            // diff vs the previous MAINLINE (a fast-forward's parent is the
            // branch head it already equals — see readChanges)
            val parentFiles =
              prevMainline.map(_.files.toSet).getOrElse(Set.empty[String])
            prevMainline = Some(m)
            val added = m.files.filterNot(parentFiles)
            // fast-forward and cherry-pick publish APPEND-ONLY branch work
            // (the only branch write is appendToBranch), so the stream
            // replays their added files exactly once like any append
            val appendLike = Set("create", "append", "fast-forward",
              "cherry-pick")
            val reorg = Set("compact", "cluster", "zorder")
            val metadataOnly =
              Set("add-columns", "rename-column", "drop-column")
            m.action match {
              case a if reorg(a) || metadataOnly(a) => None
              case a if appendLike(a) =>
                if (added.isEmpty) None
                else Some(emit(m, added, withDeletes = false))
              case a if added.isEmpty => // delete/truncate/delete-mor shape
                if (!ignoreDeletes && !ignoreChanges)
                  throw new UnsupportedOperationException(
                    s"streaming source at $root: version $v is a data-" +
                      s"removing '$a' commit; restart from fresh or set " +
                      "ignoreDeletes=true to skip removals")
                None
              case a => // update/merge/overwrite (+MOR): rows rewritten
                if (!ignoreChanges)
                  throw new UnsupportedOperationException(
                    s"streaming source at $root: version $v is a row-" +
                      s"rewriting '$a' commit; set ignoreChanges=true to " +
                      "re-emit rewritten files (downstream must tolerate " +
                      "duplicates)")
                Some(emit(m, added, withDeletes = false))
            }
            }
          }
      }
      frames.reduceOption(_.unionByName(_)).getOrElse(
        emit(latest().copy(deletes = Nil), Nil, withDeletes = false))
    }

    // --------------------------------------------------------------- writes

    private[Snapshots] def initialize(df: DataFrame, partitionBy: Seq[String],
        bucket: Option[BucketBy] = None): Unit = {
      require(versions().isEmpty, s"snapshot table already exists at $root")
      bucket.foreach { case BucketBy(cols, n, sortBy) =>
        require(cols.nonEmpty, "CLUSTERED BY needs at least one column")
        cols.foreach { c =>
          val f = df.schema.fields.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(s"no such bucket column: $c"))
          require(!partitionBy.contains(c),
            s"bucket column $c cannot also be a partition column")
          require(org.apache.spark.sql.execution.datasources.BucketingUtils
              .canBucketOn(f.dataType),
            s"cannot bucket on ${f.dataType.simpleString} column $c")
        }
        require(n >= 2 && n <= 100000, s"bucket count must be in [2, 100000]: $n")
        require(!df.schema.fieldNames.contains(GbCol),
          s"bucketed tables reserve the column name $GbCol")
        sortBy.foreach { s =>
          require(df.schema.fieldNames.contains(s),
            s"no such SORTED BY column: $s")
          require(!partitionBy.contains(s),
            s"SORTED BY column $s is a partition column (constant per file)")
        }
        // written before v0 stages so the very first files lay out bucketed;
        // physical == logical at birth (no mapping exists yet)
        writeBucketConfig(BucketConfig(cols, n, sortBy))
      }
      val (files, stats) = stage(df, partitionBy)
      // the bucket spec is ALSO declared in the v0 manifest meta: the
      // sidecar is written pre-CAS, so only the manifest says which
      // CREATE's layout actually won the table
      val bucketMeta = bucket.map(b => "bucket" ->
        org.json4s.jackson.Serialization.write(
          BucketConfig(b.cols, b.n, b.sortBy))).toMap
      val m = Manifest(0L, -1L, System.currentTimeMillis(), "create",
        partitionBy, df.schema.json, files, stats, meta = bucketMeta)
      if (!casPublish(m)) {
        // lost the v0 race. If this attempt pre-wrote _bucket.json but the
        // WINNING create didn't declare a bucket layout, the sidecar is a
        // lie about the surviving table (its untagged files don't satisfy
        // the spec — every later scan would die with 'Invalid bucket
        // file'): remove it. A bucketed winner with the same spec keeps it
        // (different specs can't both reach this point — writeBucketConfig
        // fails the second one loudly).
        if (bucket.isDefined &&
            !readManifest(manifestPath(0L)).meta.contains("bucket")) {
          fs.delete(new Path(rootPath, "_bucket.json"), false)
          cachedBucket = None
        }
        throw new ConcurrentModificationException(
          s"concurrent create of snapshot table at $root")
      }
    }


    /** Commit loop: stage once, then CAS against the moving head. `validate`
      * sees the latest manifest and returns the commit's file list + stats
      * (or throws); appends validate trivially, COW validates replaced files.
      */
    private[plans] def commit(action: String, maxRetries: Int,
        meta: Map[String, String] = Map.empty,
        deletesOf: Manifest => Seq[String] = _.deletes)(
        validate: Manifest => Option[(Seq[String], Map[String, FileStat])]): Manifest = {
      var attempt = 0
      while (true) {
        val head = latest()
        validate(head) match {
          case None => return head // no-op (nothing matched)
          case Some((files, stats)) =>
            val m = Manifest(nextSlot(head), head.version,
              System.currentTimeMillis(), action, head.partitionCols,
              head.schemaJson, files, stats, meta, deletesOf(head),
              colMapping = head.colMapping,
              droppedPhysical = head.droppedPhysical)
            if (publish(head, m)) return m
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
    def append(df: DataFrame, maxRetries: Int = 10,
        meta: Map[String, String] = Map.empty): Manifest =
      appendUnless(df, maxRetries, meta, _ => false)

    /** Stage once, then commit unless `skip(head)` says the append became
      * redundant — re-evaluated against each fresh head inside the CAS
      * retry loop, so the skip decision is serialized with publication.
      */
    /** Order the frame's columns to the table schema AND cast each to its
      * declared type. Writing a differently-typed column (a decimal literal
      * into a double column, say) would stage a parquet file whose physical
      * type disagrees with the table schema — readers would then
      * misinterpret the raw values, which is silent corruption. Uncastable
      * types fail analysis loudly instead.
      */
    private[plans] def conform(df: DataFrame,
        schema: org.apache.spark.sql.types.StructType): DataFrame =
      df.select(schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)

    private def appendUnless(df: DataFrame, maxRetries: Int,
        meta: Map[String, String], skip: Manifest => Boolean): Manifest = {
      val head0 = latest()
      require(df.schema.fieldNames.sorted.sameElements(
        schemaOf(head0.schemaJson).fieldNames.sorted),
        "append schema must match table schema")
      val (staged, stagedStats) = stage(
        validateConstraints(conform(df, schemaOf(head0.schemaJson)), "append"),
        head0.partitionCols, head0.colMapping)
      commit("append", maxRetries, meta)(head =>
        if (skip(head)) None // duplicate landed concurrently — no-op
        else if (head.colMapping != head0.colMapping)
          // a rename committed between staging and publication: the staged
          // files carry stale physical names — restage rather than corrupt
          throw new ConcurrentModificationException(
            s"append at $root raced a column rename — retry the append")
        else Some((head.files ++ staged, head.stats ++ stagedStats)))
    }

    /** Idempotent streaming append: exactly-once per (streamId, batchId) —
      * a replayed micro-batch (post-crash restart from the streaming
      * checkpoint) finds its batch already committed in the log and becomes
      * a no-op, so `foreachBatch(appendBatch(df, id, _))` gives an
      * end-to-end exactly-once sink on top of at-least-once delivery (the
      * same commit-log dedup contract as Delta's `txn` action; the
      * reference's streaming ingest leans on metastore txns instead: ref
      * streaming/src/java/org/apache/hive/streaming/HiveStreamingConnection.java:63).
      */
    def appendBatch(df: DataFrame, streamId: String, batchId: Long,
        maxRetries: Int = 10): Manifest = {
      // batchIds are monotonic per streaming query, so the batch is already
      // committed iff this stream's most recent commit AT OR BELOW the
      // given head has batchId >= ours. Scan the log TAIL-first and stop at
      // the stream's first (most recent) commit — O(versions since that
      // commit), not O(log length); a steady stream finds its previous
      // batch within a few manifests.
      def committed(upTo: Long): Boolean = versions().reverseIterator
        .filter(_ <= upTo)
        .map(v => readManifest(manifestPath(v)))
        .collectFirst {
          case m if m.meta.get("streamId").contains(streamId) =>
            m.meta("batchId").toLong >= batchId
        }.getOrElse(false)
      val head0 = latest()
      if (committed(head0.version)) return head0 // replayed batch — no-op
      // The dedup decision is re-checked inside the CAS loop against each
      // fresh head (not just once up front): two concurrent attempts of the
      // same batch (zombie driver during failover) both stage, but the
      // loser's re-validation sees the winner's commit and no-ops — the
      // same serialization that orders every other writer. The loser's
      // staged files are unreferenced; vacuum reclaims them.
      appendUnless(df, maxRetries,
        Map("streamId" -> streamId, "batchId" -> batchId.toString),
        head => committed(head.version))
    }

    /** Replaces the table contents. Rebases blindly (an overwrite reads
      * nothing, so it serializes after any concurrent commit). Pending
      * delete entries reset — every file they reference is replaced.
      */
    def overwrite(df: DataFrame, maxRetries: Int = 10): Manifest = {
      val head0 = latest()
      val staged = stage(
        validateConstraints(conform(df, schemaOf(head0.schemaJson)), "overwrite"),
        head0.partitionCols, head0.colMapping)
      commit("overwrite", maxRetries, deletesOf = _ => Nil)(_ => Some(staged))
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
        // provenance scan with pending MOR deletes applied: affected files
        // are discovered over VISIBLE rows, and the rewritten post-image
        // folds those deletes in (a deleted row can never resurrect)
        val visible = applyDeletes(readFilesMeta(head), head)
        val affected = visible.filter(predicate)
          .select(col("__file")).distinct()
          .collect().map(_.getString(0))
          .toSet
        if (affected.isEmpty) return head // nothing matched — no-op
        val schema = schemaOf(head.schemaJson)
        val affectedDf = applyDeletes(
          readFilesMeta(head.copy(files = head.files.filter(affected))), head)
          .select(schema.fieldNames.map(col): _*)
        val post =
          if (action == "delete") postImage(affectedDf)
          else validateConstraints(postImage(affectedDf), action)
        val (staged, stagedStats) = stage(post,
          head.partitionCols, head.colMapping)
        val files = head.files.filterNot(affected) ++ staged
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), action, head.partitionCols,
          head.schemaJson, files, (head.stats -- affected) ++ stagedStats,
          Map.empty, head.deletes,
          colMapping = head.colMapping,
          droppedPhysical = head.droppedPhysical)
        // CAS can only succeed if head is still the latest version, and the
        // affected files were taken FROM head — so a successful publish
        // proves no concurrent commit removed them (write-serializable).
        if (publish(head, m)) return m
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

    /** Merge-on-read DELETE: writes only a (file, row-position) delete
      * sidecar — no data file rewrites — and readers anti-join it at scan
      * time. This is the reference's delete-delta design (ref
      * ql/src/java/org/apache/hadoop/hive/ql/io/AcidUtils.java —
      * delete_delta_* dirs folded by the compactor): O(matches) write cost
      * against [[deleteWhere]]'s O(affected files), traded for a read-time
      * merge until [[compact]] folds the deletes into rewritten base files
      * (stale entries then match nothing and vacuum drops their sidecars).
      * Racing writers serialize exactly like COW: a lost CAS replays the
      * predicate against the winning snapshot.
      */
    def deleteWhereMergeOnRead(cond: Column, maxRetries: Int = 10): Manifest = {
      var attempt = 0
      while (true) {
        val head = latest()
        if (head.files.isEmpty) return head
        val matches = applyDeletes(readFilesMeta(head), head)
          .filter(coalesce(cond, lit(false)))
          .select(col("__file").as("file"), col("__pos").as("pos"))
        if (matches.isEmpty) return head // nothing matched — no-op
        val delDir = s"deletes/${UUID.randomUUID().toString.take(8)}"
        matches.write.mode("errorifexists")
          .parquet(new Path(rootPath, delDir).toString)
        val sidecars = listParquet(new Path(rootPath, delDir)).map(relativize)
        if (sidecars.isEmpty) return head // nothing matched — no-op
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "delete-mor", head.partitionCols,
          head.schemaJson, head.files, head.stats, Map.empty,
          head.deletes ++ sidecars,
          colMapping = head.colMapping,
          droppedPhysical = head.droppedPhysical)
        if (publish(head, m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"delete-mor at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** Schema evolution — ALTER TABLE ADD COLUMNS (ref: the reference's
      * AlterTableAddColsDesc under ql/ddl/table/): a metadata-only commit
      * that extends the stored schema with NULLABLE columns. No data file
      * changes hands; readers pass the manifest schema to the scan, so
      * pre-evolution files surface the new columns as NULL. Appends after
      * the evolution must supply the full new schema. Time travel keeps
      * each version's own schema.
      */
    def addColumns(cols: org.apache.spark.sql.types.StructType,
        maxRetries: Int = 10): Manifest = {
      var attempt = 0
      while (true) {
        val head = latest()
        val existing = schemaOf(head.schemaJson)
        val dup = cols.fieldNames.toSet.intersect(existing.fieldNames.toSet)
        require(dup.isEmpty, s"columns already exist: ${dup.mkString(", ")}")
        // transform partition fields live in the DIRECTORY-KEY namespace
        // (ts_day, id_bucket16, ...): a new column taking such a name
        // would make the scan bind old generations' dir VALUES as the new
        // column's data and the path-probe pruning read them as ranges —
        // silent wrong results, so the whole derivable namespace is
        // reserved (current spec, former specs, and any future transform
        // of an existing column)
        val reserved = cols.fieldNames.filter(n =>
          head.partitionCols.contains(n) ||
            PartitionTransforms.fromDirName(n, c =>
              existing.fieldNames.contains(c) ||
                existing.fieldNames.exists(f => head.physical(f) == c))
              .isDefined)
        require(reserved.isEmpty,
          s"column name(s) collide with the partition/transform-field " +
            s"namespace: ${reserved.mkString(", ")}")
        // a new column's physical name must be UNUSED across the table's
        // whole file history: colliding with a live physical (some column
        // renamed away from this name) or a dropped one would read stale
        // values out of pre-evolution files instead of NULL
        val taken = scala.collection.mutable.Set[String]()
        taken ++= existing.fieldNames.map(head.physical)
        taken ++= head.droppedPhysical
        val mappingAdds = cols.fieldNames.flatMap { logical =>
          val phys =
            if (!taken(logical)) logical
            else Iterator.from(2).map(i => s"${logical}__v$i")
              .find(!taken(_)).get
          taken += phys
          if (phys == logical) None else Some(logical -> phys)
        }
        val newSchema = org.apache.spark.sql.types.StructType(
          existing.fields ++ cols.fields.map(_.copy(nullable = true)))
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "add-columns", head.partitionCols,
          newSchema.json, head.files, head.stats, Map.empty, head.deletes,
          colMapping = head.colMapping ++ mappingAdds,
          droppedPhysical = head.droppedPhysical)
        if (publish(head, m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"add-columns at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** Schema evolution — ALTER TABLE RENAME COLUMN (Hive's CHANGE COLUMN
      * rename, ref ql/ddl/table/column/ AlterTableRenameColDesc class of
      * operations): a metadata-only commit. The column's PHYSICAL parquet
      * name is fixed at birth; renaming just rebinds the logical name in
      * the manifest's column mapping, so no data file rewrites and every
      * old file keeps serving the column under its new name. Partition
      * columns cannot rename (their values live in directory paths).
      */
    def renameColumn(oldName: String, newName: String,
        maxRetries: Int = 10): Manifest = {
      require(oldName != newName, "rename to the same name is a no-op")
      var attempt = 0
      while (true) {
        val head = latest()
        val existing = schemaOf(head.schemaJson)
        require(existing.fieldNames.contains(oldName),
          s"no such column: $oldName")
        require(!existing.fieldNames.contains(newName),
          s"column already exists: $newName")
        require(!head.partitionCols.contains(oldName),
          s"cannot rename partition column $oldName")
        // same reserved namespace as addColumns (see there)
        require(!head.partitionCols.contains(newName) &&
            PartitionTransforms.fromDirName(newName, c =>
              existing.fieldNames.contains(c) ||
                existing.fieldNames.exists(f => head.physical(f) == c))
              .isEmpty,
          s"column name collides with the partition/transform-field " +
            s"namespace: $newName")
        val phys = head.physical(oldName)
        val newSchema = org.apache.spark.sql.types.StructType(
          existing.fields.map(f =>
            if (f.name == oldName) f.copy(name = newName) else f))
        val newMapping = (head.colMapping - oldName) ++
          (if (phys == newName) Map.empty[String, String]
           else Map(newName -> phys))
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "rename-column", head.partitionCols,
          newSchema.json, head.files, head.stats, Map.empty, head.deletes,
          colMapping = newMapping,
          droppedPhysical = head.droppedPhysical)
        if (publish(head, m)) {
          renameInConstraints(oldName, newName)
          return m
        }
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"rename-column at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** Schema evolution — ALTER TABLE DROP COLUMN (the reference's REPLACE
      * COLUMNS narrowing): a metadata-only commit that removes the field
      * from the stored schema. Old files keep the physical column; readers
      * never project it. The physical name is tombstoned so a later ADD
      * COLUMNS of the same logical name reads NULL from pre-drop files
      * instead of resurrecting the dropped values.
      */
    def dropColumn(name: String, maxRetries: Int = 10): Manifest = {
      var attempt = 0
      while (true) {
        val head = latest()
        val existing = schemaOf(head.schemaJson)
        require(existing.fieldNames.contains(name), s"no such column: $name")
        require(!head.partitionCols.contains(name),
          s"cannot drop partition column $name")
        require(existing.fields.length > 1,
          s"cannot drop the only column of $root")
        val phys = head.physical(name)
        bucketConfig().foreach(b => require(
          !b.cols.contains(phys) && !b.sortCols.contains(phys),
          s"cannot drop bucket/sort column $name"))
        val newSchema = org.apache.spark.sql.types.StructType(
          existing.fields.filterNot(_.name == name))
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "drop-column", head.partitionCols,
          newSchema.json, head.files, head.stats, Map.empty, head.deletes,
          colMapping = head.colMapping - name,
          droppedPhysical = (head.droppedPhysical :+ phys).distinct)
        if (publish(head, m)) {
          dropFromConstraints(name)
          return m
        }
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"drop-column at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** Schema evolution — ALTER TABLE ... ALTER COLUMN c TYPE t (Hive's
      * CHANGE COLUMN type change): a metadata-only commit, restricted to
      * the WIDENINGS Spark's parquet readers promote losslessly at scan
      * time (SPARK-40876 type widening: integral chain byte→short→int→
      * long, float→double, and integral→double) — old files keep their
      * narrow physical type and read back widened; appends conform to the
      * wide type. Anything else would need a table rewrite and is refused.
      * Bloom filters hash the VALUE AS TYPED, so a widened column's
      * existing filters are invalidated (config generation bump — see
      * [[setBloomColumns]]); re-set bloom columns to re-index.
      */
    def alterColumnType(name: String,
        to: org.apache.spark.sql.types.DataType,
        maxRetries: Int = 10): Manifest = {
      import org.apache.spark.sql.types._
      def widens(from: DataType, t: DataType): Boolean = (from, t) match {
        case (a, b) if a == b => true
        case (ByteType, ShortType | IntegerType | LongType) => true
        case (ShortType, IntegerType | LongType) => true
        case (IntegerType, LongType) => true
        case (FloatType, DoubleType) => true
        case (ByteType | ShortType | IntegerType, DoubleType) => true
        case _ => false
      }
      var attempt = 0
      while (true) {
        val head = latest()
        val existing = schemaOf(head.schemaJson)
        val f = existing.fields.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(s"no such column: $name"))
        require(!head.partitionCols.contains(name),
          s"cannot change the type of partition column $name")
        // the murmur3 bucket hash is type-dependent (an int and the long it
        // widens to hash differently) — a widened bucket column would strand
        // every existing file in the wrong bucket
        bucketConfig().foreach(b => require(
          !b.cols.contains(head.physical(name)),
          s"cannot change the type of bucket column $name"))
        // a widened sort column would leave old files sorted by the narrow
        // type's order — fine for numerics, but refuse for uniformity with
        // the scan's declared ordering contract
        bucketConfig().foreach(b => require(
          !b.sortCols.contains(head.physical(name)),
          s"cannot change the type of SORTED BY column $name"))
        require(widens(f.dataType, to),
          s"only lossless widenings are metadata-only: " +
            s"${f.dataType.simpleString} -> ${to.simpleString} is not")
        if (f.dataType == to) return head // no-op
        // existing blooms hashed the narrow type — invalidate them
        bloomConfig().foreach { cfg =>
          val phys = head.physical(name)
          writeBloomConfig(BloomConfig(cfg.cols.filterNot(_ == phys),
            cfg.bits, cfg.gen + 1))
        }
        val newSchema = StructType(existing.fields.map(x =>
          if (x.name == name) x.copy(dataType = to) else x))
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "alter-column-type", head.partitionCols,
          newSchema.json, head.files, head.stats, Map.empty, head.deletes,
          colMapping = head.colMapping,
          droppedPhysical = head.droppedPhysical)
        if (publish(head, m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"alter-column-type at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** RESTORE TABLE ... TO VERSION AS OF `v`: roll the table back to a
      * prior version as a NEW commit — history is append-only, so nothing
      * is erased and the restore itself can be time-traveled past or
      * re-restored. The full logical state comes back wholesale (file list,
      * stats, MOR delete sidecars, schema, column mapping, drop
      * tombstones): a version's manifest is internally consistent, so
      * mixing any piece of it with the current head's would not be.
      * Requires the target manifest to still be retained — retention is
      * also exactly what guarantees the restored data files still exist
      * ([[vacuum]] keeps every file referenced by a retained manifest).
      */
    def restore(v: Long, maxRetries: Int = 10): Manifest = {
      val p = manifestPath(v)
      require(fs.exists(p),
        s"version $v does not exist (vacuumed or never committed)")
      val old = resolve(readManifest(p))
      var attempt = 0
      while (true) {
        val head = latest()
        require(v <= head.version, s"cannot restore to future version $v")
        if (v == head.version) return head // no-op
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "restore", old.partitionCols,
          old.schemaJson, old.files, old.stats,
          Map("restored_version" -> v.toString), old.deletes,
          colMapping = old.colMapping,
          droppedPhysical = old.droppedPhysical)
        if (publish(head, m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"restore at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** RESTORE ... TO TIMESTAMP AS OF: the last version committed at or
      * before `tsMs` (the read-path [[readAsOf]] resolution), restored.
      */
    def restoreAsOf(tsMs: Long, maxRetries: Int = 10): Manifest = {
      val h = history().filter(_.timestampMs <= tsMs)
      require(h.nonEmpty, s"no version committed at or before $tsMs")
      restore(h.last.version, maxRetries)
    }

    /** Partition-spec evolution (`ALTER TABLE ... SET PARTITION SPEC`,
      * the Iceberg spec-evolution contract the reference reaches through
      * its Iceberg handler — ref ql/ddl/table/partition/set/
      * AlterTableSetPartitionSpecAnalyzer.java, iceberg-handler
      * HiveIcebergMetaHook.java:337,519): a METADATA-ONLY commit that
      * changes the spec for FUTURE writes. No data moves — at 100 TB a
      * day→hour re-grain must not rewrite history. Existing files remain
      * readable and prune under their birth spec (recorded by their own
      * paths); new commits stage under the new spec; the scan unions one
      * relation per spec generation. Time travel to a pre-evolution
      * version sees the old spec untouched. [[compact]] / [[clusterBy]] /
      * [[zOrderBy]] rewrite under the CURRENT spec, so background
      * maintenance gradually migrates old generations.
      */
    def setPartitionSpec(cols: Seq[String], maxRetries: Int = 10): Manifest = {
      var attempt = 0
      while (true) {
        val head = latest()
        val schema = schemaOf(head.schemaJson)
        // entries may be TRANSFORMS — day(ts), month(ts), year(ts),
        // hour(ts), bucket(N, c), truncate(W, c) — encoded as derived
        // dir-key names (ts_day, c_bucket16, ...; see
        // [[PartitionTransforms]]); identity entries stay plain columns.
        // Partition dirs are physical names; map once, here.
        val phys = cols.map(PartitionTransforms.parseEntry(_) match {
          case Left(c) =>
            require(schema.fieldNames.contains(c), s"no such column: $c")
            head.physical(c)
          case Right(sp) =>
            require(schema.fieldNames.contains(sp.src),
              s"no such column: ${sp.src}")
            PartitionTransforms.validate(sp, schema(sp.src).dataType)
            val derived = sp.copy(src = head.physical(sp.src)).dirName
            require(!schema.fieldNames.contains(derived) &&
                !head.colMapping.valuesIterator.contains(derived),
              s"transform field name $derived collides with a column")
            derived
        })
        require(phys.distinct == phys, "duplicate partition column")
        bucketConfig().foreach { b =>
          val clash = phys.filter(c => b.cols.contains(c) ||
            b.sortCols.contains(c))
          require(clash.isEmpty,
            s"bucket/sort columns cannot become partition columns: " +
              clash.mkString(", "))
        }
        if (phys == head.partitionCols) return head
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "set-partition-spec", phys,
          head.schemaJson, head.files, head.stats,
          Map("previous-spec" -> head.partitionCols.mkString(",")),
          head.deletes, colMapping = head.colMapping,
          droppedPhysical = head.droppedPhysical)
        if (publish(head, m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"set-partition-spec at $root lost the commit race " +
              s"$attempt times — giving up")
      }
      sys.error("unreachable")
    }


    /** TRUNCATE TABLE: one metadata commit that empties the file list (and
      * resets pending MOR deletes — every row they referenced is gone).
      * Data files stay on disk for time travel until [[vacuum]].
      */
    def truncate(maxRetries: Int = 10): Manifest =
      commit("truncate", maxRetries, deletesOf = _ => Nil)(head =>
        if (head.files.isEmpty && head.deletes.isEmpty) None
        else Some((Nil, Map.empty)))

    /** Merge-on-read UPDATE: the matched rows' old positions go into a
      * delete sidecar and their updated images append as new files — the
      * reference's (delete_delta, delta) pair for an ACID UPDATE (ref
      * ql/src/java/org/apache/hadoop/hive/ql/io/AcidUtils.java — an update
      * is a delete event + an insert event), committed atomically as one
      * version. Cost is O(matched rows), not O(affected files); reads merge
      * until [[compact]] folds both sides in.
      */
    def updateWhereMergeOnRead(cond: Column, set: Map[String, Column],
        maxRetries: Int = 10): Manifest = {
      val head0 = latest()
      val bad = set.keySet.intersect(head0.partitionCols.toSet)
      require(bad.isEmpty, s"cannot assign partition columns: ${bad.mkString(", ")}")
      val unknown = set.keySet.diff(schemaOf(head0.schemaJson).fieldNames.toSet)
      require(unknown.isEmpty,
        s"UPDATE assigns nonexistent column(s): ${unknown.mkString(", ")}")
      var attempt = 0
      while (true) {
        val head = latest()
        if (head.files.isEmpty) return head
        val schema = schemaOf(head.schemaJson)
        val matches = applyDeletes(readFilesMeta(head), head)
          .filter(coalesce(cond, lit(false)))
        if (matches.isEmpty) return head // nothing matched — no-op
        // old positions retire via sidecar...
        val delDir = s"deletes/${UUID.randomUUID().toString.take(8)}"
        matches.select(col("__file").as("file"), col("__pos").as("pos"))
          .write.mode("errorifexists")
          .parquet(new Path(rootPath, delDir).toString)
        val sidecars = listParquet(new Path(rootPath, delDir)).map(relativize)
        // ...and the updated images append as fresh files (conformed: a
        // SET expression must not change the column's physical type; one
        // projection so all assignments read the PRE-update row)
        val updated = conform(
          matches.select(schema.fieldNames.map(c =>
            set.getOrElse(c, col(c)).as(c)): _*), schema)
        val (staged, stagedStats) = stage(
          validateConstraints(updated, "update-mor"), head.partitionCols,
          head.colMapping)
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "update-mor", head.partitionCols,
          head.schemaJson, head.files ++ staged, head.stats ++ stagedStats,
          Map.empty, head.deletes ++ sidecars,
          colMapping = head.colMapping,
          droppedPhysical = head.droppedPhysical)
        if (publish(head, m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"update-mor at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** UPDATE ... SET ... WHERE cond — partition columns not assignable
      * (rows never move between partitions), matching [[Dml.updateWhere]].
      */
    def updateWhere(cond: Column, set: Map[String, Column],
        maxRetries: Int = 10): Manifest = {
      val head = latest()
      val bad = set.keySet.intersect(head.partitionCols.toSet)
      require(bad.isEmpty, s"cannot assign partition columns: ${bad.mkString(", ")}")
      val unknown = set.keySet.diff(schemaOf(head.schemaJson).fieldNames.toSet)
      require(unknown.isEmpty,
        s"UPDATE assigns nonexistent column(s): ${unknown.mkString(", ")}")
      cow("update", maxRetries)({ df =>
        val c = coalesce(cond, lit(false))
        // one projection, not a fold: SQL assignments all read the
        // PRE-update row (SET a = b, b = a swaps)
        df.select(df.columns.map(name =>
          set.get(name).map(e => when(c, e).otherwise(col(name)))
            .getOrElse(col(name)).as(name)): _*)
      }, cond)
    }

    /** MERGE: keyed upsert at file granularity. Only files containing a
      * matched target row rewrite (matched rows get `whenMatchedSet` applied
      * or, with `whenMatchedDelete`, drop); source rows matching nothing
      * insert (unless `insertUnmatched=false`). Cardinality guard: >1 source
      * row per matched target key fails the statement in-job (no extra
      * target scan), matching [[Dml.merge]]. On a lost commit race the whole
      * plan replays against the winning snapshot — serializable, not just a
      * file swap.
      */
    def merge(source: DataFrame, targetKey: String, sourceKey: String,
        whenMatchedSet: Map[String, Column] = Map.empty,
        whenMatchedDelete: Boolean = false,
        insertUnmatched: Boolean = true,
        sourceKeysUnique: Boolean = false,
        maxRetries: Int = 10): Manifest =
      mergeSpec(source, targetKey, sourceKey,
        MergeEngine.specOf(whenMatchedSet, whenMatchedDelete, insertUnmatched),
        sourceKeysUnique, maxRetries)

    /** Merge-on-read MERGE: matched target rows retire via a (file,
      * row-position) delete sidecar while their updated images and —
      * when `insertUnmatched` — the unmatched source rows append as fresh
      * files, committed atomically as ONE version. Write cost is
      * O(matched + inserted rows) against [[merge]]'s O(affected files):
      * the upsert shape for wide tables where COW write amplification
      * dominates. Readers pay the sidecar anti-join until [[compact]]
      * folds it. Single unconditional matched arm (update set / delete),
      * matching the convenience [[merge]]; multi-arm statements use the
      * COW [[mergeSpec]]. Cardinality guard and racing-writer semantics
      * are identical to the COW path.
      */
    def mergeMergeOnRead(source: DataFrame, targetKey: String, sourceKey: String,
        whenMatchedSet: Map[String, Column] = Map.empty,
        whenMatchedDelete: Boolean = false,
        insertUnmatched: Boolean = true,
        sourceKeysUnique: Boolean = false,
        maxRetries: Int = 10): Manifest =
      mergeMergeOnReadKeys(source, Seq(targetKey -> sourceKey), whenMatchedSet,
        whenMatchedDelete, insertUnmatched, sourceKeysUnique,
        maxRetries = maxRetries)

    /** Composite-key merge-on-read MERGE: `mergeKeys` are the ON-clause
      * equi-pairs (targetCol, sourceCol). `insertValues`, when given, maps
      * each target column to its insert expression over the source row
      * (unassigned columns fill with NULL); when absent the whole source
      * row inserts by name.
      */
    def mergeMergeOnReadKeys(source: DataFrame,
        mergeKeys: Seq[(String, String)],
        whenMatchedSet: Map[String, Column] = Map.empty,
        whenMatchedDelete: Boolean = false,
        insertUnmatched: Boolean = true,
        sourceKeysUnique: Boolean = false,
        insertValues: Option[Map[String, Column]] = None,
        maxRetries: Int = 10): Manifest = {
      require(mergeKeys.nonEmpty, "MERGE needs at least one ON equi-condition")
      val head0 = latest()
      val cols = schemaOf(head0.schemaJson).fieldNames.toSeq
      val bad = whenMatchedSet.keySet.intersect(head0.partitionCols.toSet)
      require(bad.isEmpty,
        s"MERGE cannot assign partition columns: ${bad.mkString(", ")}")
      val missingKeys = mergeKeys.map(_._2).filterNot(source.columns.contains)
      require(missingKeys.isEmpty,
        s"source must carry the merge key(s) ${missingKeys.mkString(", ")}")
      if (insertUnmatched && insertValues.isEmpty) {
        val missing = cols.filterNot(source.columns.contains)
        require(missing.isEmpty,
          s"MERGE with an insert arm needs source columns ${missing.mkString(", ")}")
      }
      def tc(c: String): Column = col("__t_" + c)
      // with no matched arm the statement cannot touch matched target rows
      // at all — only the inserts matter (and duplicate source keys are
      // legal: matched ones simply don't insert)
      val hasMatchedArm = whenMatchedDelete || whenMatchedSet.nonEmpty
      val guardCardinality = !sourceKeysUnique && hasMatchedArm
      val guarded =
        if (!guardCardinality) source
        else source.withColumn("__src_cnt", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(mergeKeys.map(k => col(k._2)): _*)))
      val keyDesc = concat_ws(", ", mergeKeys.map { case (_, sk) =>
        concat(lit(s"$sk="), coalesce(col(sk).cast("string"), lit("NULL")))
      }: _*)

      var attempt = 0
      while (true) {
        val head = latest()
        val schema = schemaOf(head.schemaJson)
        val visible = applyDeletes(readFilesMeta(head), head)
        // matched pairs keep (file, pos) provenance for the sidecar plus
        // both rows' values for the updated image
        val tRen = visible.select(
          schema.fieldNames.map(c => col(c).as("__t_" + c)) ++
            Seq(col("__file"), col("__pos")): _*)
        val joinCond = mergeKeys.map { case (tk, sk) => tc(tk) === col(sk) }
          .reduce(_ && _)
        val joined = tRen.join(guarded, joinCond, "inner")
        val matches =
          if (!guardCardinality) joined
          else joined.filter(when(col("__src_cnt") > 1,
            raise_error(concat(
              lit("MERGE cardinality violation: multiple source rows match target "),
              keyDesc))).isNull)
        val inserts =
          if (!insertUnmatched) None
          else {
            val keys = visible.select(mergeKeys.map { case (tk, _) =>
              col(tk).as("__t_" + tk) }: _*).distinct()
            val antiCond = mergeKeys.map { case (tk, sk) =>
              source(sk) === keys("__t_" + tk) }.reduce(_ && _)
            val unmatched = source.join(keys, antiCond, "left_anti")
            val rows = insertValues match {
              case Some(vs) => unmatched.select(schema.fieldNames.map(c =>
                vs.getOrElse(c, lit(null)).as(c)): _*)
              case None => unmatched.select(schema.fieldNames.map(col): _*)
            }
            if (rows.isEmpty) None else Some(rows)
          }
        val hasMatches = hasMatchedArm && !matches.isEmpty
        if (!hasMatches && inserts.isEmpty) return head // no-op
        // old positions of matched rows retire via sidecar...
        val sidecars =
          if (!hasMatches) Nil
          else {
            val delDir = s"deletes/${UUID.randomUUID().toString.take(8)}"
            matches.select(col("__file").as("file"), col("__pos").as("pos"))
              .write.mode("errorifexists")
              .parquet(new Path(rootPath, delDir).toString)
            listParquet(new Path(rootPath, delDir)).map(relativize)
          }
        // ...and updated images + inserts append as fresh files
        val images =
          if (whenMatchedDelete || !hasMatches) None
          else Some(matches.select(schema.fieldNames.map(c =>
            whenMatchedSet.getOrElse(c, tc(c)).as(c)): _*))
        val appended = (images.toSeq ++ inserts.toSeq)
          .reduceOption(_ unionByName _)
          .map(df => stage(
            validateConstraints(conform(df, schema), "merge-mor"),
            head.partitionCols, head.colMapping))
        val (staged, stagedStats) =
          appended.getOrElse((Seq.empty[String], Map.empty[String, FileStat]))
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "merge-mor", head.partitionCols,
          head.schemaJson, head.files ++ staged, head.stats ++ stagedStats,
          Map.empty, head.deletes ++ sidecars,
          colMapping = head.colMapping,
          droppedPhysical = head.droppedPhysical)
        if (publish(head, m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"merge-mor at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }

    /** Full multi-arm MERGE (conditional matched arms, conditional insert,
      * WHEN NOT MATCHED BY SOURCE) — see [[MergeEngine]] for the statement
      * semantics and joined-scope naming. Arms that touch unmatched target
      * rows force a whole-table rewrite (every file may hold one); all
      * other statements rewrite only files containing matched rows.
      */
    def mergeSpec(source: DataFrame, targetKey: String, sourceKey: String,
        spec: MergeEngine.Spec,
        sourceKeysUnique: Boolean = false,
        maxRetries: Int = 10): Manifest =
      mergeSpec(source, Seq(targetKey -> sourceKey), spec, sourceKeysUnique,
        maxRetries)

    /** Composite-key multi-arm MERGE: `mergeKeys` are the ON-clause
      * equi-pairs (targetCol, sourceCol).
      */
    def mergeSpec(source: DataFrame, mergeKeys: Seq[(String, String)],
        spec: MergeEngine.Spec,
        sourceKeysUnique: Boolean,
        maxRetries: Int): Manifest = {
      val head0 = latest()
      val cols = schemaOf(head0.schemaJson).fieldNames.toSeq
      val setCols = (spec.matched ++ spec.notMatchedBySource)
        .collect { case MergeEngine.Update(_, s) => s.keySet }.flatten.toSet
      val bad = setCols.intersect(head0.partitionCols.toSet)
      require(bad.isEmpty,
        s"MERGE cannot assign partition columns: ${bad.mkString(", ")}")

      def postOf(affectedDf: DataFrame): DataFrame =
        MergeEngine.postImage(affectedDf, source, mergeKeys,
          cols, spec, sourceKeysUnique)

      var attempt = 0
      while (true) {
        val head = latest()
        val keys = source.select(mergeKeys.map { case (tk, sk) =>
          col(sk).as("__s_" + tk) }: _*).distinct()
        // provenance scan over VISIBLE rows (pending MOR deletes applied):
        // a deleted target row neither matches nor resurrects
        val visible = applyDeletes(readFilesMeta(head), head)
        val semiCond = mergeKeys.map { case (tk, _) =>
          visible(tk) === keys("__s_" + tk) }.reduce(_ && _)
        val affected =
          if (spec.touchesUnmatchedTargets) head.files.toSet
          else visible
            .join(keys, semiCond, "left_semi")
            .select(col("__file")).distinct()
            .collect().map(_.getString(0))
            .toSet
        val schema = schemaOf(head.schemaJson)
        val post =
          if (affected.isEmpty) {
            if (spec.inserts.isEmpty) return head // nothing matched, no inserts
            // no target row matches any source key — every source row inserts
            postOf(readFiles(head.copy(files = Nil)))
          } else postOf(applyDeletes(
            readFilesMeta(head.copy(files = head.files.filter(affected))), head)
            .select(schema.fieldNames.map(col): _*))
        val (staged, stagedStats) = stage(
          validateConstraints(post, "merge"), head.partitionCols,
          head.colMapping)
        val m = Manifest(nextSlot(head), head.version,
          System.currentTimeMillis(), "merge", head.partitionCols,
          head.schemaJson, head.files.filterNot(affected) ++ staged,
          (head.stats -- affected) ++ stagedStats, Map.empty, head.deletes,
          colMapping = head.colMapping,
          droppedPhysical = head.droppedPhysical)
        if (publish(head, m)) return m
        attempt += 1
        if (attempt > maxRetries)
          throw new ConcurrentModificationException(
            s"merge at $root lost the commit race $attempt times — giving up")
      }
      sys.error("unreachable")
    }



    // ------------------------------------------------------------------
    // Constraints (see [[TableConstraints]])

    /** Current constraint set (empty if none declared). */
    def constraints(): TableConstraints =
      SidecarJson.read[TableConstraints](fs,
        new Path(rootPath, "_constraints.json")).getOrElse(TableConstraints())

    private def writeConstraints(c: TableConstraints): Unit =
      SidecarJson.write(fs, new Path(rootPath, "_constraints.json"), c)

    /** Violation predicates for the ENFORCED constraints: (description,
      * referenced columns, row-is-violating condition). NOT NULL trips on
      * null; CHECK trips only when the expression is FALSE (NULL passes,
      * per SQL). Referenced columns come from parsing the stored SQL, so a
      * constraint over a since-dropped column can be skipped instead of
      * failing analysis.
      */
    private def violationConds(
        c: TableConstraints): Seq[(String, Seq[String], Column)] =
      c.notNull.sorted.map(n =>
        (s"NOT NULL constraint on column $n", Seq(n), col(n).isNull)) ++
      c.checks.toSeq.sortBy(_._1).map { case (name, sql) =>
        (s"CHECK constraint $name ($sql)", checkRefs(sql),
          coalesce(expr(sql).cast("boolean"), lit(true)) === lit(false))
      }

    /** Column names a CHECK expression references: the LAST name part (so a
      * qualified `t.amount` resolves by its column name, not its qualifier).
      */
    private def checkRefs(sql: String): Seq[String] =
      spark.sessionState.sqlParser.parseExpression(sql).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.last
      }

    /** Validate `df` against the enforced constraints: ONE aggregate pass
      * over the incoming frame computing every constraint's violation count,
      * before anything stages. A deliberate extra evaluation of the incoming
      * batch (the small side at 100 TB — the table itself is never
      * rescanned) rather than an in-write raise_error guard: a side-effecting
      * predicate can be reordered or pushed past other filters by the
      * optimizer and fire on rows the plan would later discard; a plain
      * aggregate cannot.
      */
    private[plans] def validateConstraints(df: DataFrame, action: String): DataFrame = {
      val c = constraints()
      // resolution is CASE-INSENSITIVE (matching expr() resolution) so a
      // differently-cased spelling can never silently disable enforcement;
      // a genuinely absent column (dropped after declaration) skips its
      // constraint rather than failing analysis
      val have = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      val conds = violationConds(c).filter {
        case (_, refs, _) =>
          refs.forall(r => have.contains(r.toLowerCase(java.util.Locale.ROOT)))
      }
      if (conds.isEmpty) return df
      // count(when(...)) is 0 on an empty batch — sum() would be NULL and
      // NPE the getLong below on a legal zero-row write
      val counts = df.agg(
        count(when(conds.head._3, lit(1))).as("c0"),
        conds.tail.zipWithIndex.map { case ((_, _, cond), i) =>
          count(when(cond, lit(1))).as(s"c${i + 1}") }: _*).head()
      val violated = conds.zipWithIndex.collect {
        case ((desc, _, _), i) if counts.getLong(i) > 0 =>
          s"$desc: ${counts.getLong(i)} row(s)"
      }
      if (violated.nonEmpty)
        throw new ConstraintViolationException(
          s"$action at $root rejected: ${violated.mkString("; ")}")
      df
    }

    /** Declare a CHECK constraint. Existing table data is validated first
      * (one stats-free scan) — the constraint is only published if current
      * rows all satisfy it, so "constraints hold" is a table invariant, not
      * an aspiration (Hive's ENABLE semantics; there is no NOVALIDATE mode
      * here).
      */
    def addCheck(name: String, conditionSql: String): Unit = {
      require(name.nonEmpty, "constraint needs a name")
      val c = constraints()
      require(!c.checks.contains(name), s"constraint $name already exists")
      // surface malformed expressions now, not at first write
      val cond = expr(conditionSql).cast("boolean")
      val bad = read().filter(coalesce(cond, lit(true)) === lit(false)).limit(1)
      if (bad.collect().nonEmpty)
        throw new ConstraintViolationException(
          s"cannot add CHECK $name ($conditionSql): existing rows violate it")
      writeConstraints(c.copy(checks = c.checks + (name -> conditionSql)))
    }

    def dropCheck(name: String): Unit = {
      val c = constraints()
      require(c.checks.contains(name) || c.informational.contains(name),
        s"no such constraint: $name")
      writeConstraints(c.copy(checks = c.checks - name,
        informational = c.informational - name))
    }

    /** Declare a column NOT NULL (validates existing data first). */
    def setNotNull(column: String): Unit = {
      val schema = schemaOf(latest().schemaJson)
      require(schema.fieldNames.contains(column), s"no such column: $column")
      val c = constraints()
      if (c.notNull.contains(column)) return
      if (read().filter(col(column).isNull).limit(1).collect().nonEmpty)
        throw new ConstraintViolationException(
          s"cannot set $column NOT NULL: existing rows hold null")
      writeConstraints(c.copy(notNull = c.notNull :+ column))
    }

    def dropNotNull(column: String): Unit = {
      val c = constraints()
      writeConstraints(c.copy(notNull = c.notNull.filterNot(_ == column)))
    }

    /** Follow a RENAME COLUMN: NOT NULL / DEFAULT entries re-key, CHECK
      * expressions rewrite their column references (parse → substitute →
      * re-render), so enforcement survives the rename instead of silently
      * lapsing into the dropped-column skip.
      */
    private def renameInConstraints(oldName: String, newName: String): Unit = {
      val c = constraints()
      def eq(a: String) = a.equalsIgnoreCase(oldName)
      val rewritten = c.checks.map { case (n, sql) =>
        val e = spark.sessionState.sqlParser.parseExpression(sql).transform {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if eq(a.nameParts.last) =>
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
              a.nameParts.init :+ newName)
        }
        n -> e.sql
      }
      val changed = rewritten != c.checks ||
        c.notNull.exists(eq) || c.defaults.keys.exists(eq)
      if (changed) writeConstraints(c.copy(
        notNull = c.notNull.map(n => if (eq(n)) newName else n),
        checks = rewritten,
        defaults = c.defaults.map { case (k, v) =>
          (if (eq(k)) newName else k) -> v }))
    }

    /** Follow a DROP COLUMN: NOT NULL / DEFAULT entries on the column drop,
      * CHECK constraints referencing it drop entirely (the SQL-standard
      * CASCADE behavior — a check over a gone column is unenforceable).
      */
    private def dropFromConstraints(column: String): Unit = {
      val c = constraints()
      def eq(a: String) = a.equalsIgnoreCase(column)
      val keptChecks = c.checks.filterNot { case (_, sql) =>
        checkRefs(sql).exists(eq) }
      val changed = keptChecks != c.checks ||
        c.notNull.exists(eq) || c.defaults.keys.exists(eq)
      if (changed) writeConstraints(c.copy(
        notNull = c.notNull.filterNot(eq),
        checks = keptChecks,
        defaults = c.defaults.filterNot { case (k, _) => eq(k) }))
    }

    /** Declare a DEFAULT expression for a column — filled in when an INSERT
      * column list omits the column (never rewrites existing rows).
      */
    def setDefault(column: String, exprSql: String): Unit = {
      val schema = schemaOf(latest().schemaJson)
      require(schema.fieldNames.contains(column), s"no such column: $column")
      expr(exprSql) // malformed default fails now
      val c = constraints()
      writeConstraints(c.copy(defaults = c.defaults + (column -> exprSql)))
    }

    def dropDefault(column: String): Unit = {
      val c = constraints()
      writeConstraints(c.copy(defaults = c.defaults - column))
    }

    /** Record an informational (never enforced) PRIMARY KEY / FOREIGN KEY /
      * UNIQUE declaration — the reference's RELY NOVALIDATE surface.
      */
    def addInformational(name: String, rendered: String): Unit = {
      val c = constraints()
      require(!c.informational.contains(name) && !c.checks.contains(name),
        s"constraint $name already exists")
      writeConstraints(c.copy(informational = c.informational + (name -> rendered)))
    }


  }

}
