package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance SQL verbs Spark's parser does not know:
  *
  * {{{
  * RESTORE TABLE t TO VERSION AS OF 3
  * RESTORE TABLE t TO TIMESTAMP AS OF '2026-08-01 00:00:00'
  * OPTIMIZE t
  * OPTIMIZE t ZORDER BY (c1, c2)
  * VACUUM t [RETAIN n HOURS]
  * }}}
  *
  * The reference exposes the same lifecycle through ALTER TABLE ... COMPACT
  * and metastore retention (ref ql/src/java/org/apache/hadoop/hive/ql/txn/
  * compactor/Compactor.java:40); here each verb is one call on the
  * snapshot-table API ([[Snapshots.SnapshotTable.restore]], `compact`,
  * `zOrderBy`, `vacuum`) and returns a one-row metrics frame.
  *
  * These five shapes are token-matched from the raw statement text because
  * they are PARSE errors to Spark — this layer only ever sees text the
  * session parser already rejected ([[graft.Engine.sql]] tries the real
  * parser first), so no statement Spark understands can be shadowed. The
  * table identifier is a registered [[NamedTables]] name or a
  * backtick-quoted root path.
  */
object SqlMaintenance {

  private val Ident = """(`[^`]+`|[\w.]+)"""
  private val RestoreV =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreTs =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""").r
  private val OptimizeZ =
    ("""(?is)\s*OPTIMIZE\s+""" + Ident +
      """\s+ZORDER\s+BY\s*\(([^)]+)\)\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + Ident + """\s*;?\s*""").r
  private val VacuumRetain =
    ("""(?is)\s*VACUUM\s+""" + Ident +
      """\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS\s*;?\s*""").r
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + Ident + """\s*;?\s*""").r

  /** Execute `sqlText` if it is a maintenance statement; None otherwise
    * (caller surfaces the canonical parse error).
    */
  def maybeRun(spark: SparkSession, sqlText: String): Option[DataFrame] =
    sqlText match {
      case RestoreV(ident, v) =>
        Some(runRestore(spark, ident, _.restore(v.toLong)))
      case RestoreTs(ident, ts) =>
        Some(runRestore(spark, ident,
          _.restoreAsOf(java.sql.Timestamp.valueOf(ts).getTime)))
      case OptimizeZ(ident, cols) =>
        val zCols = cols.split(',').map(stripQuotes).map(_.trim).toSeq
        Some(runOptimize(spark, ident, _.zOrderBy(zCols)))
      case Optimize(ident) =>
        Some(runOptimize(spark, ident, _.compact()))
      case VacuumRetain(ident, hours) =>
        Some(runVacuum(spark, ident, hours.toDouble))
      case Vacuum(ident) =>
        Some(runVacuum(spark, ident, minAgeHours = 24.0))
      case _ => None
    }

  private def runRestore(spark: SparkSession, ident: String,
      op: Snapshots.SnapshotTable => Snapshots.Manifest): DataFrame = {
    import spark.implicits._
    val t = tableOf(spark, ident)
    val m = op(t)
    Seq((nameOf(ident), m.meta.getOrElse("restored_version", m.version.toString).toLong,
      m.version, m.files.size.toLong))
      .toDF("table", "restored_version", "new_version", "n_files")
  }

  private def runOptimize(spark: SparkSession, ident: String,
      op: Snapshots.SnapshotTable => Snapshots.Manifest): DataFrame = {
    import spark.implicits._
    val t = tableOf(spark, ident)
    val before = t.latest()
    val m = op(t)
    Seq((nameOf(ident), m.action, m.version,
      before.files.size.toLong, m.files.size.toLong))
      .toDF("table", "action", "version", "n_files_before", "n_files_after")
  }

  private def runVacuum(spark: SparkSession, ident: String,
      minAgeHours: Double): DataFrame = {
    import spark.implicits._
    val t = tableOf(spark, ident)
    val reclaimed = t.vacuum(retainLast = 1, minAgeHours = minAgeHours)
    Seq((nameOf(ident), reclaimed))
      .toDF("table", "n_files_reclaimed")
  }

  private def stripQuotes(s: String): String = {
    val x = s.trim
    if (x.startsWith("`") && x.endsWith("`") && x.length > 1)
      x.substring(1, x.length - 1)
    else x
  }

  private def nameOf(ident: String): String = stripQuotes(ident)

  /** A registered catalog name, or a backtick-quoted snapshot root path. */
  private def tableOf(spark: SparkSession, ident: String): Snapshots.SnapshotTable = {
    val name = nameOf(ident)
    val root = NamedTables.get(name) match {
      case Some(r: NamedTables.SnapshotRef) => r.root
      case Some(_: NamedTables.PathRef) => throw new IllegalArgumentException(
        s"$name is a plain parquet path table — maintenance verbs need a snapshot table")
      case None if ident.startsWith("`") => name // quoted root path
      case None => throw new IllegalArgumentException(
        s"$name is not a registered table (register it or backtick-quote a root path)")
    }
    Snapshots.table(spark, root)
  }
}
