package graft.plans

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** Catalog names for engine-managed tables, so plain SQL addresses them like
  * any metastore table — the role of the reference's metastore entry (ref
  * standalone-metastore/src/main/thrift/hive_metastore.thrift:644 struct
  * Table: every Hive table is a name first, a location second). Here a name
  * maps to either a snapshot-table root (versioned manifest log,
  * [[Snapshots]]) or a plain parquet directory (COW DML, [[Dml]]).
  *
  * Resolution is deliberately late-bound: each query's analysis re-reads the
  * CURRENT snapshot, so a name never serves stale data after DML (a temp
  * view would freeze the file list at registration). Two surfaces install
  * it:
  *
  *   - [[graft.GraftExtensions]] injects [[ResolveNamedTables]] as an
  *     analyzer rule — `spark.sql("SELECT ... FROM sales")` works on any
  *     extensions-bootstrapped session;
  *   - [[graft.Engine.sql]] applies [[substitute]] pre-analysis, covering
  *     sessions built without the extensions hook.
  *
  * Session temp views shadow registered names on the read path (the
  * analyzer's view resolution runs first; [[substitute]] checks explicitly).
  * Names are case-insensitive, matching Spark's default resolution.
  */
object NamedTables {

  sealed trait Ref { def root: String }
  /** A snapshot-table root ([[Snapshots]] manifest log). `writeMode` picks
    * the UPDATE/DELETE statement strategy: `cow` rewrites affected files,
    * `merge-on-read` writes position-delete sidecars that readers merge
    * until compaction (the reference's delete-delta design) — the
    * `write.mode` table property.
    */
  final case class SnapshotRef(root: String, writeMode: String = WriteCow)
    extends Ref
  /** A plain parquet table directory ([[Dml]] copy-on-write). */
  final case class PathRef(root: String) extends Ref

  val WriteCow = "copy-on-write"
  val WriteMor = "merge-on-read"

  // JVM-global like the session-catalog it stands in for; tests and the
  // Verify driver share one session per JVM anyway.
  private val registry = scala.collection.concurrent.TrieMap.empty[String, Ref]

  private def norm(name: String): String = name.toLowerCase(Locale.ROOT)

  def register(name: String, ref: Ref): Unit = registry.put(norm(name), ref)

  def registerSnapshot(name: String, root: String,
      writeMode: String = WriteCow): Unit =
    register(name, SnapshotRef(root, writeMode))

  def registerPath(name: String, path: String): Unit =
    register(name, PathRef(path))

  def drop(name: String): Unit = registry.remove(norm(name))

  def get(name: String): Option[Ref] = registry.get(norm(name))

  /** All registered (name, ref) pairs — the SHOW TABLES analog, exposed to
    * SQL as the `graft_tables()` TVF.
    */
  def all(): Seq[(String, Ref)] = registry.toSeq.sortBy(_._1)

  /** The read plan for a reference — built fresh so the latest snapshot
    * version is always served.
    */
  private def readPlan(spark: SparkSession, name: String, ref: Ref): LogicalPlan = {
    val df = ref match {
      case r: SnapshotRef => Snapshots.table(spark, r.root).read()
      case PathRef(path) => spark.read.parquet(path)
    }
    SubqueryAlias(name, df.queryExecution.logical)
  }

  /** Resolve a relation identifier to a registered/path-addressed ref:
    * single-part names come from the registry; `snapshot.`/path`` addresses
    * a snapshot root directly (the DML/DDL analog of Spark's
    * `parquet.`/path``).
    */
  private[plans] def refOf(parts: Seq[String]): Option[Ref] = parts match {
    case Seq(name) => get(name)
    case Seq(fmt, path) if norm(fmt) == "snapshot" => Some(SnapshotRef(path))
    case _ => None
  }

  private def tempViewExists(spark: SparkSession, name: String): Boolean =
    spark.sessionState.catalog.getTempView(name).isDefined ||
      spark.sessionState.catalog.getGlobalTempView(name).isDefined

  /** `VERSION AS OF` / `TIMESTAMP AS OF` read plan for a snapshot ref. */
  private def timeTravelPlan(spark: SparkSession, name: String, ref: Ref,
      timestamp: Option[Expression], version: Option[String]): LogicalPlan = {
    val root = ref match {
      case r: SnapshotRef => r.root
      case PathRef(_) => throw new UnsupportedOperationException(
        s"$name is a plain parquet table — time travel needs a snapshot table")
    }
    val t = Snapshots.table(spark, root)
    val df = (version, timestamp) match {
      case (Some(v), _) => t.readVersion(v.toLong)
      case (_, Some(ts)) => t.readAsOf(evalTimestampMs(ts))
      case _ => t.read()
    }
    SubqueryAlias(name, df.queryExecution.logical)
  }

  /** Evaluate a TIMESTAMP AS OF expression to epoch millis (UTC session). */
  private def evalTimestampMs(e: Expression): Long = {
    val micros =
      try Cast(e, TimestampType, Some("UTC")).eval(null)
      catch { case scala.util.control.NonFatal(_) => null }
    micros match {
      case l: java.lang.Long => l.longValue() / 1000L
      case _ => throw new IllegalArgumentException(
        s"cannot evaluate TIMESTAMP AS OF expression: ${e.sql}")
    }
  }

  /** Pre-analysis substitution of registered names (and `snapshot.`/path``
    * relations) with fresh read plans — the front-door path for sessions
    * built without the extensions hook. Temp views win over registered
    * names, matching the analyzer-rule precedence. Top-down so a
    * RelationTimeTravel wrapper is seen before its child relation.
    */
  def substitute(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithSubqueries {
      case RelationTimeTravel(u: UnresolvedRelation, ts, v)
          if resolvable(spark, u) =>
        timeTravelPlan(spark, u.multipartIdentifier.last,
          refOf(u.multipartIdentifier).get, ts, v)
      case u: UnresolvedRelation if resolvable(spark, u) =>
        readPlan(spark, u.multipartIdentifier.last,
          refOf(u.multipartIdentifier).get)
    }

  private def resolvable(spark: SparkSession, u: UnresolvedRelation): Boolean =
    refOf(u.multipartIdentifier).isDefined &&
      !(u.multipartIdentifier.size == 1 &&
        tempViewExists(spark, u.multipartIdentifier.head))

  /** Analyzer rule form, injected by [[graft.GraftExtensions]]. Built-in view
    * resolution runs earlier in the same fixed-point batch, so temp views
    * shadow registered names without an explicit check.
    */
  class ResolveNamedTables(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
      case RelationTimeTravel(u: UnresolvedRelation, ts, v)
          if refOf(u.multipartIdentifier).isDefined =>
        timeTravelPlan(session, u.multipartIdentifier.last,
          refOf(u.multipartIdentifier).get, ts, v)
      case u: UnresolvedRelation if refOf(u.multipartIdentifier).isDefined =>
        readPlan(session, u.multipartIdentifier.last,
          refOf(u.multipartIdentifier).get)
    }
  }
}
