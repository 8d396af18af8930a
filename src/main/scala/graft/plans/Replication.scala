package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** One-way incremental table replication over the snapshot commit log — the
  * engine analog of Hive's REPL DUMP / REPL LOAD cycle (ref ql/src/java/org/
  * apache/hadoop/hive/ql/exec/repl/ReplDumpTask.java, ReplLoadTask.java):
  * a replica warehouse follows a source table by applying its committed
  * changes, resumable and idempotent.
  *
  * Modes, picked per sync from what actually happened on the source:
  *
  *  - **bootstrap**: target doesn't exist — full copy of the source's
  *    current snapshot (REPL DUMP bootstrap).
  *  - **incremental**: every pending source commit is additive (appends /
  *    insert-only merges) or a data-identical reorganization
  *    (compact/cluster/zorder — skipped, like the CDC reader skips them):
  *    each additive commit's added files replay as ONE target append, so
  *    the replica ships only the delta — O(changed bytes), never a re-copy.
  *  - **full**: some pending commit rewrote or removed data (COW
  *    update/delete/merge, MOR sidecars, overwrite, restore, truncate) —
  *    the replica overwrites to the source's pinned head state. Write cost
  *    is one table scan; correctness never depends on diffing rewrites.
  *  - **rebootstrap**: the source schema evolved — the replica is recreated
  *    at the new schema (Hive REPL's metadata-change bootstrap). Replica
  *    time travel restarts; the source keeps its full history.
  *
  * Progress persists in `_repl_state.json` at the TARGET root (source root +
  * last applied source version), so a crashed sync resumes exactly where it
  * stopped and a replayed sync is a no-op. Each incremental target commit
  * also carries `repl_source_version` in its manifest meta for audit.
  *
  * At 100 TB: steady-state ingest is append-dominated, so syncs ride the
  * incremental path and move only new files' rows; the full/rebootstrap
  * paths exist for the rare rewrite and are loud about it in the result.
  */
object Replication {

  final case class SyncResult(mode: String, fromVersion: Long,
      toVersion: Long, commitsApplied: Long)

  private final case class ReplState(sourceRoot: String, lastApplied: Long)

  /** Same (name, type) sequence — nullability intentionally ignored: the
    * replica's schema comes from a parquet read-back, which widens
    * everything to nullable without changing a single value.
    */
  private def sameShape(aJson: String, bJson: String): Boolean = {
    def shape(j: String) = org.apache.spark.sql.types.DataType.fromJson(j)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    shape(aJson) == shape(bJson)
  }

  /** Bring the replica at `targetRoot` up to the source's current version.
    * Safe to call repeatedly (no-ops when current) and concurrently with
    * source writers (syncs to the version pinned at entry).
    */
  def sync(spark: SparkSession, sourceRoot: String,
      targetRoot: String): SyncResult = {
    val src = Snapshots.table(spark, sourceRoot)
    val srcHead = src.latest()
    val tPath = new Path(targetRoot)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statePath = new Path(tPath, "_repl_state.json")

    def writeState(v: Long): Unit =
      SidecarJson.write(fs, statePath, ReplState(sourceRoot, v))

    val targetExists = fs.exists(new Path(tPath, "_graft_log"))
    if (!targetExists) {
      // intent marker FIRST: a bootstrap that dies between create and the
      // final state write must leave a target a later sync can adopt
      // (lastApplied = -1 → "bootstrapped at an unknown version" → the
      // resume below takes the full-overwrite path), not one it refuses
      writeState(-1L)
      Snapshots.create(spark, targetRoot,
        src.rowsOf(srcHead, srcHead.files),
        partitionBy = srcHead.partitionCols)
      writeState(srcHead.version)
      return SyncResult("bootstrap", -1L, srcHead.version, 1L)
    }

    val state = SidecarJson.read[ReplState](fs, statePath).getOrElse(
      throw new IllegalArgumentException(
        s"$targetRoot exists but carries no _repl_state.json — refusing to " +
          "overwrite a table that is not this source's replica"))
    require(state.sourceRoot == sourceRoot,
      s"$targetRoot replicates ${state.sourceRoot}, not $sourceRoot")

    if (state.lastApplied < 0) {
      // interrupted bootstrap: version unknown — re-sync to the pinned head
      val tgt0 = Snapshots.table(spark, targetRoot)
      if (sameShape(srcHead.schemaJson, tgt0.latest().schemaJson))
        tgt0.overwrite(src.rowsOf(srcHead, srcHead.files))
      else {
        fs.delete(tPath, true)
        writeState(-1L)
        Snapshots.create(spark, targetRoot,
          src.rowsOf(srcHead, srcHead.files),
          partitionBy = srcHead.partitionCols)
      }
      writeState(srcHead.version)
      return SyncResult("full", -1L, srcHead.version, 1L)
    }

    if (state.lastApplied >= srcHead.version)
      return SyncResult("noop", state.lastApplied, state.lastApplied, 0L)

    val pending = src.committedVersions()
      .filter(v => v > state.lastApplied && v <= srcHead.version)
      .map(src.resolvedManifest)
    // each commit diffs against the PREVIOUS MAINLINE manifest, not its
    // parent pointer: a fast-forward's parent is the branch head it
    // already equals (zero diff there), while the replica is owed
    // everything the publish surfaced. A vacuumed base manifest makes the
    // diff unknowable — None routes to the full-overwrite path.
    val base: Option[Snapshots.Manifest] = src.committedVersions()
      .filter(_ <= state.lastApplied).lastOption
      .flatMap(v => scala.util.Try(src.resolvedManifest(v)).toOption)
    val withParents = pending.zip(base +: pending.map(Option(_)).init)
    def isReorg(m: Snapshots.Manifest): Boolean =
      m.action == "compact" || m.action == "cluster" || m.action == "zorder"
    def isAdditive(m: Snapshots.Manifest,
        p: Option[Snapshots.Manifest]): Boolean = p.exists(p =>
      p.files.toSet.subsetOf(m.files.toSet) && m.deletes == p.deletes &&
        m.schemaJson == p.schemaJson && m.colMapping == p.colMapping)

    val tgt = Snapshots.table(spark, targetRoot)
    // Crash-idempotence: the replica's own log is the authority on what
    // actually landed (each incremental append is stamped with its source
    // version in manifest meta). A crash between an append and its state
    // write would otherwise double-apply that commit on resume — so the
    // resume point is max(sidecar, newest stamp in the target log), the
    // same dedup contract appendBatch uses for streaming replays.
    val lastStamped = tgt.committedVersions().reverseIterator
      .map(v => tgt.resolvedManifest(v))
      .collectFirst {
        case m if m.meta.contains("repl_source_version") =>
          m.meta("repl_source_version").toLong
      }.getOrElse(-1L)
    val resumeFrom = math.max(state.lastApplied, lastStamped)
    val toApply = withParents.filter(_._1.version > resumeFrom)
    if (toApply.forall { case (m, p) => isReorg(m) || isAdditive(m, p) }) {
      var applied = 0L
      toApply.foreach { case (m, p) =>
        if (!isReorg(m)) {
          val added = m.files.filterNot(p.get.files.toSet)
          if (added.nonEmpty) {
            tgt.append(src.rowsOf(m, added),
              meta = Map("repl_source_version" -> m.version.toString))
            applied += 1
          }
        }
        writeState(m.version) // per-commit progress: a crash resumes here
      }
      if (toApply.isEmpty) writeState(srcHead.version)
      SyncResult("incremental", resumeFrom, srcHead.version, applied)
    } else if (sameShape(srcHead.schemaJson, tgt.latest().schemaJson)) {
      tgt.overwrite(src.rowsOf(srcHead, srcHead.files))
      writeState(srcHead.version)
      SyncResult("full", state.lastApplied, srcHead.version, 1L)
    } else {
      // schema evolved: recreate the replica at the new schema. Intent
      // marker FIRST (the delete removed the old one) — a crash during the
      // re-create must leave a target the next sync adopts, not refuses.
      fs.delete(tPath, true)
      writeState(-1L)
      Snapshots.create(spark, targetRoot,
        src.rowsOf(srcHead, srcHead.files),
        partitionBy = srcHead.partitionCols)
      writeState(srcHead.version)
      SyncResult("rebootstrap", state.lastApplied, srcHead.version, 1L)
    }
  }
}
