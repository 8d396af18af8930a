package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregate materializations over snapshot tables —
  * the analog of the reference's ALTER MATERIALIZED VIEW ... REBUILD, which
  * rebuilds incrementally when the source tables saw only INSERTs since the
  * last rebuild and falls back to a full rebuild otherwise (ref
  * ql/src/java/org/apache/hadoop/hive/ql/ddl/view/materialized/update/
  * MaterializedViewUpdateDesc.java + the calcite incremental-rewriting rules
  * under ql/optimizer/calcite/rules/views/, e.g.
  * HiveAggregateIncrementalRewritingRule.java).
  *
  * The materialization records the snapshot-table version it reflects.
  * `refresh()` inspects the commit log since that version:
  *   - only `append` / `compact` commits → **incremental**: partial-aggregate
  *     ONLY the appended rows ([[Snapshots.SnapshotTable.readChanges]] —
  *     compaction is data-identical and already skipped there) and fold them
  *     into the stored aggregate (sum+sum, count+count, min/min, max/max;
  *     avg maintained as sum+count and derived at read).
  *   - any COW commit (delete/update/merge/overwrite) → **full** rebuild:
  *     deletions can lower a sum or retire a min/max, which insert-only
  *     maintenance cannot express — the same condition under which the
  *     reference abandons incremental rebuild.
  *
  * Scale: an incremental refresh costs one keyed shuffle over the DELTA plus
  * one over the MV — proportional to what changed and to the aggregate
  * cardinality, never to accumulated table size. That is the entire point at
  * 100 TB: a daily-append fact table refreshes its rollups in O(day), not
  * O(history).
  */
object IncrementalViews {

  /** One aggregate column: `func` in sum|count|min|max|avg over `input`
    * (input ignored for count — always count(1) rows), emitted as `name`.
    */
  final case class AggSpec(func: String, input: String, name: String) {
    require(Set("sum", "count", "min", "max", "avg").contains(func),
      s"unsupported incremental aggregate: $func")
  }

  final case class RefreshResult(mode: String, version: Long, deltaRows: Long)

  def create(spark: SparkSession, tableRoot: String, mvPath: String,
      keys: Seq[String], aggs: Seq[AggSpec]): IncrementalAggView = {
    val v = new IncrementalAggView(spark, tableRoot, mvPath, keys, aggs)
    v.rebuildFull()
    v
  }

  def open(spark: SparkSession, tableRoot: String, mvPath: String,
      keys: Seq[String], aggs: Seq[AggSpec]): IncrementalAggView =
    new IncrementalAggView(spark, tableRoot, mvPath, keys, aggs)

  /** Incrementally maintained aggregate over an INNER equi-join of TWO
    * snapshot tables — the join case of the reference's incremental
    * rebuild (ref ql/optimizer/calcite/rules/views/
    * HiveJoinInsertIncrementalRewritingRule.java: insert-only joins
    * maintain as a union of delta joins). With `A_new = A_old ∪ ΔA` and
    * `B_new = B_old ∪ ΔB` (insert-only on both sides):
    *
    * {{{ Δ(A ⋈ B) = (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB) }}}
    *
    * — ΔA⋈ΔB lands exactly once (inside the first term), so folding the
    * partial-aggregated delta into the stored state is exact. A_old comes
    * from TIME TRAVEL to the version the MV reflects — the capability that
    * makes join maintenance possible on this table format at all.
    *
    * Scale: a refresh joins the DELTAS against one full side each — at
    * 100 TB with daily appends that is O(day ⋈ dim/fact), never
    * O(history ⋈ history), and when both tables are bucketed on the join
    * key the delta joins are shuffle-free on the big side.
    */
  def createJoin(spark: SparkSession, leftRoot: String, rightRoot: String,
      mvPath: String, joinOn: Seq[(String, String)], keys: Seq[String],
      aggs: Seq[AggSpec]): IncrementalJoinAggView = {
    val v = new IncrementalJoinAggView(spark, leftRoot, rightRoot, mvPath,
      joinOn, keys, aggs)
    v.rebuildFull()
    v
  }

  def openJoin(spark: SparkSession, leftRoot: String, rightRoot: String,
      mvPath: String, joinOn: Seq[(String, String)], keys: Seq[String],
      aggs: Seq[AggSpec]): IncrementalJoinAggView =
    new IncrementalJoinAggView(spark, leftRoot, rightRoot, mvPath,
      joinOn, keys, aggs)

  /** Shared partial-aggregate machinery of the single-table and join MVs:
    * storage columns (avg carried as __sum/__cnt), the partial→fold split,
    * the stage-and-swap data write, and the finalized read. Subclasses own
    * only their state payload and refresh logic — a fix to the swap dance
    * or a new aggregate function lands once.
    */
  sealed abstract class PartialAggMv private[IncrementalViews] (
      spark: SparkSession, mvPath: String,
      keys: Seq[String], aggs: Seq[AggSpec]) {

    protected val statePath = java.nio.file.Paths.get(mvPath, "_mv_state.json")
    protected def dataDir = s"$mvPath/data"

    /** Internal storage columns: avg is carried as (__sum, __cnt), plus a
      * hidden `__rows` group row count — the evidence delete-aware
      * maintenance needs to DROP a fully-retired group (a full rebuild
      * would not have it), and the tie-breaker that makes signed folding
      * exact.
      */
    protected def storageAggs: Seq[org.apache.spark.sql.Column] = aggs.flatMap {
      case AggSpec("sum", in, name) => Seq(sum(col(in)).as(name))
      case AggSpec("count", _, name) => Seq(count(lit(1)).as(name))
      case AggSpec("min", in, name) => Seq(min(col(in)).as(name))
      case AggSpec("max", in, name) => Seq(max(col(in)).as(name))
      case AggSpec("avg", in, name) => Seq(
        sum(col(in)).as(s"${name}__sum"), count(col(in)).as(s"${name}__cnt"))
      case other => sys.error(s"unreachable: $other")
    } :+ count(lit(1)).as("__rows")

    /** NEGATED partial aggregates of `rows` — the signed-delta form of
      * retired rows (ref HiveAggregateInsertDeleteIncrementalRewritingRule
      * .java): sums fold in with flipped sign, counts as negative counts.
      * min/max have no signed form (a retired extreme cannot be undone
      * from the aggregate alone) — callers full-rebuild instead; guarded
      * in [[IncrementalAggView.refresh]].
      */
    protected def negPartialAgg(rows: DataFrame): DataFrame = {
      val as = aggs.flatMap {
        case AggSpec("sum", in, name) => Seq(sum(-col(in)).as(name))
        case AggSpec("count", _, name) => Seq((-count(lit(1))).as(name))
        case AggSpec("avg", in, name) => Seq(
          sum(-col(in)).as(s"${name}__sum"),
          (-count(col(in))).as(s"${name}__cnt"))
        case AggSpec(f, _, _) =>
          sys.error(s"$f cannot fold deletes as a signed delta")
      } :+ (-count(lit(1))).as("__rows")
      rows.groupBy(keys.map(col): _*).agg(as.head, as.tail: _*)
    }

    /** Fold two partial states with the same storage schema: sums and counts
      * add, mins/maxes re-extremize — exactly the partial→final split Spark
      * itself uses for these aggregates, which is what makes them
      * incrementally maintainable under insert-only changes.
      */
    protected def merge(parts: DataFrame): DataFrame = {
      val folds = aggs.flatMap {
        case AggSpec("sum", _, name) => Seq(sum(col(name)).as(name))
        case AggSpec("count", _, name) => Seq(sum(col(name)).as(name))
        case AggSpec("min", _, name) => Seq(min(col(name)).as(name))
        case AggSpec("max", _, name) => Seq(max(col(name)).as(name))
        case AggSpec("avg", _, name) => Seq(
          sum(col(s"${name}__sum")).as(s"${name}__sum"),
          sum(col(s"${name}__cnt")).as(s"${name}__cnt"))
        case other => sys.error(s"unreachable: $other")
      } :+ sum(col("__rows")).as("__rows")
      parts.groupBy(keys.map(col): _*).agg(folds.head, folds.tail: _*)
    }

    protected def partialAgg(rows: DataFrame): DataFrame = {
      val as = storageAggs
      rows.groupBy(keys.map(col): _*).agg(as.head, as.tail: _*)
    }

    /** Stage-and-swap so a crashed refresh leaves the previous
      * materialization readable (the state file still names it); the
      * caller-provided `stateJson` publishes the new reflected version(s).
      */
    protected def swapData(df: DataFrame, stateJson: String): Unit = {
      val staged = s"$mvPath/data-${java.util.UUID.randomUUID().toString.take(8)}"
      df.write.mode("errorifexists").parquet(staged)
      val old = java.nio.file.Paths.get(dataDir)
      if (java.nio.file.Files.exists(old)) {
        val bak = java.nio.file.Paths.get(s"$mvPath/data-old")
        java.nio.file.Files.move(old, bak)
        java.nio.file.Files.move(java.nio.file.Paths.get(staged), old)
        org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
      } else {
        java.nio.file.Files.createDirectories(old.getParent)
        java.nio.file.Files.move(java.nio.file.Paths.get(staged), old)
      }
      java.nio.file.Files.writeString(statePath, stateJson)
    }

    protected def storedPartials(): DataFrame = spark.read.parquet(dataDir)

    /** The materialized aggregate, with avg derived from its sum+count. */
    def read(): DataFrame = {
      val outCols = keys.map(col) ++ aggs.map {
        case AggSpec("avg", _, name) =>
          (col(s"${name}__sum") / col(s"${name}__cnt")).as(name)
        case a => col(a.name)
      }
      storedPartials().select(outCols: _*)
    }
  }

  final class IncrementalAggView private[IncrementalViews] (
      spark: SparkSession, tableRoot: String, mvPath: String,
      keys: Seq[String], aggs: Seq[AggSpec])
    extends PartialAggMv(spark, mvPath, keys, aggs) {

    private def table = Snapshots.table(spark, tableRoot)

    private def writeState(df: DataFrame, version: Long): Unit =
      swapData(df, s"""{"version":$version}""")

    /** The snapshot-table version this materialization reflects. */
    def version(): Long = {
      require(java.nio.file.Files.exists(statePath),
        s"not an incremental MV (no _mv_state.json): $mvPath")
      val s = java.nio.file.Files.readString(statePath)
      s.replaceAll("[^0-9-]", "").toLong
    }

    /** Full rebuild at the table's current head. */
    def rebuildFull(): RefreshResult = {
      val head = table.latest()
      writeState(partialAgg(table.readVersion(head.version)), head.version)
      RefreshResult("full", head.version, -1L)
    }

    /** Incremental when the log since [[version]] holds only appends and
      * reorganizations, OR only appends and MERGE-ON-READ DML (then
      * retired rows fold as signed deltas — the reference's
      * HiveAggregateInsertDeleteIncrementalRewritingRule); full rebuild
      * otherwise. min/max cannot fold a delete (the retired extreme is
      * unrecoverable from the aggregate alone), so their presence forces
      * the full path under deletes — exactly the reference's split.
      * No-op when already current.
      */
    def refresh(): RefreshResult = {
      val since = version()
      val t = table
      val head = t.latest()
      if (head.version == since) return RefreshResult("noop", since, 0L)
      // only the commits after `since` matter — never list the whole log
      val actions = t.historySince(since).map(_.action).toSet
      // reorganizations (compact/cluster/zorder) are data-identical —
      // readChanges skips them, so they fold as empty deltas. They may NOT
      // mix with the MOR path below: compaction consolidates delete
      // sidecars, destroying the since-vs-head sidecar diff.
      val insertOnly =
        actions.subsetOf(Set("append", "compact", "cluster", "zorder"))
      val morOnly = actions.subsetOf(Set("append", "delete-mor", "update-mor"))
      val signedCapable = aggs.forall(a => a.func != "min" && a.func != "max")
      if (!insertOnly && !(morOnly && signedCapable)) return rebuildFull()
      // storage written before the hidden __rows column cannot fold
      // signed deltas (or union with new-format partials): one full
      // rebuild upgrades it in place
      if (!storedPartials().columns.contains("__rows")) return rebuildFull()
      // fold the signed change set into the stored partials. The deltas
      // must be pinned to `head` (not a racing later commit): readChanges
      // caps at the history we already listed, readRetiredRows at `head`.
      val pos = t.readChanges(sinceVersion = since)
        .filter(col("_commit_version") <= head.version)
        .drop("_commit_version", "_commit_action")
      val neg =
        if (insertOnly) None
        else Some(t.readRetiredRows(since, untilVersion = head.version))
      val posRows = pos.count()
      val negRows = neg.map(_.count()).getOrElse(0L)
      if (posRows + negRows > 0) {
        val parts = (Seq(partialAgg(pos)) ++ neg.map(negPartialAgg))
          .reduce(_.unionByName(_)).unionByName(storedPartials())
        // a fully-retired group must DISAPPEAR, as a rebuild's would
        writeState(merge(parts).filter(col("__rows") > 0), head.version)
      } else
        java.nio.file.Files.writeString(statePath,
          s"""{"version":${head.version}}""")
      RefreshResult("incremental", head.version, posRows + negRows)
    }
  }

  /** See [[createJoin]]. State carries one reflected version PER SIDE. */
  final class IncrementalJoinAggView private[IncrementalViews] (
      spark: SparkSession, leftRoot: String, rightRoot: String,
      mvPath: String, joinOn: Seq[(String, String)], keys: Seq[String],
      aggs: Seq[AggSpec])
    extends PartialAggMv(spark, mvPath, keys, aggs) {
    require(joinOn.nonEmpty, "joinOn must name at least one key pair")

    private def left = Snapshots.table(spark, leftRoot)
    private def right = Snapshots.table(spark, rightRoot)

    private def joined(l: DataFrame, r: DataFrame): DataFrame =
      if (joinOn.forall(p => p._1 == p._2)) l.join(r, joinOn.map(_._1))
      else l.join(r, joinOn.map { case (a, b) => l(a) === r(b) }.reduce(_ && _))

    private def writeState(df: DataFrame, vLeft: Long, vRight: Long): Unit =
      swapData(df, s"""{"left":$vLeft,"right":$vRight}""")

    private def writeVersions(vLeft: Long, vRight: Long): Unit =
      java.nio.file.Files.writeString(statePath,
        s"""{"left":$vLeft,"right":$vRight}""")

    /** (left version, right version) this materialization reflects. */
    def versions(): (Long, Long) = {
      require(java.nio.file.Files.exists(statePath),
        s"not an incremental join MV (no _mv_state.json): $mvPath")
      val s = java.nio.file.Files.readString(statePath)
      def f(k: String) =
        s"""(?s).*"$k":(-?\\d+).*""".r.findFirstMatchIn(s) match {
          case Some(m) => m.group(1).toLong
          case None => sys.error(s"malformed MV state: $s")
        }
      (f("left"), f("right"))
    }

    def rebuildFull(): RefreshResult = {
      val hl = left.latest(); val hr = right.latest()
      writeState(partialAgg(joined(
        left.readVersion(hl.version), right.readVersion(hr.version))),
        hl.version, hr.version)
      RefreshResult("full", math.max(hl.version, hr.version), -1L)
    }

    /** Incremental when BOTH logs since the reflected versions hold only
      * insert/reorganization commits; full rebuild otherwise.
      */
    def refresh(): RefreshResult = {
      val (vl, vr) = versions()
      val l = left; val r = right
      val hl = l.latest(); val hr = r.latest()
      if (hl.version == vl && hr.version == vr)
        return RefreshResult("noop", math.max(vl, vr), 0L)
      def insertOnly(ms: Seq[Snapshots.Manifest]) = ms.forall(m =>
        m.action == "append" || m.action == "compact" ||
          m.action == "cluster" || m.action == "zorder")
      if (!insertOnly(l.historySince(vl)) || !insertOnly(r.historySince(vr)))
        return rebuildFull()
      def deltaOf(t: Snapshots.SnapshotTable, since: Long, cap: Long) =
        t.readChanges(sinceVersion = since)
          .filter(col("_commit_version") <= cap)
          .drop("_commit_version", "_commit_action")
      val dl = deltaOf(l, vl, hl.version)
      val dr = deltaOf(r, vr, hr.version)
      // Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB — ΔA⋈ΔB appears exactly once
      val delta = joined(dl, r.readVersion(hr.version))
        .unionByName(joined(l.readVersion(vl), dr))
      val deltaRows = delta.count()
      if (deltaRows > 0)
        writeState(merge(partialAgg(delta).unionByName(storedPartials())),
          hl.version, hr.version)
      else writeVersions(hl.version, hr.version)
      RefreshResult("incremental", math.max(hl.version, hr.version), deltaRows)
    }
  }
}
