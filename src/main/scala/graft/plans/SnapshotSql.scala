package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL surface for snapshot tables: table-valued functions so plain
  * `spark.sql` users get time travel and CDC without touching the
  * programmatic API — the role the reference's SQL syntax extensions play
  * (Hive exposes everything through HiveQL; here the TVF registry carries
  * the non-standard relations):
  *
  * {{{
  * SELECT * FROM snapshot_table('/path/to/t')            -- current snapshot
  * SELECT * FROM snapshot_table('/path/to/t', 3)         -- VERSION AS OF 3
  * SELECT * FROM snapshot_changes('/path/to/t', 0)       -- CDC since v0
  * }}}
  *
  * Arguments must be literals (the plan is built at analysis time).
  * Registered by [[graft.Engine.configure]] and the
  * `spark.sql.extensions` hook, idempotently per session.
  */
object SnapshotSql {

  def register(spark: SparkSession): Unit = {
    // plans bind to the session ACTIVE at analysis time, not the one that
    // registered the function — a cloned session sharing this registry
    // must not build plans against its parent
    registerTvf(spark, "snapshot_table",
      "snapshot_table(path[, version]) - snapshot read / time travel") {
      case Seq(path) =>
        Snapshots.table(SparkSession.active, rootOf(asString(path))).read()
      case Seq(path, version) =>
        Snapshots.table(SparkSession.active, rootOf(asString(path)))
          .readVersion(asLong(version))
      case other => throw new IllegalArgumentException(
        s"snapshot_table(path[, version]): got ${other.size} arguments")
    }
    registerTvf(spark, "snapshot_changes",
      "snapshot_changes(path, sinceVersion) - rows added after a version") {
      case Seq(path, since) =>
        Snapshots.table(SparkSession.active, rootOf(asString(path)))
          .readChanges(asLong(since))
      case other => throw new IllegalArgumentException(
        s"snapshot_changes(path, sinceVersion): got ${other.size} arguments")
    }
    registerTvf(spark, "graft_tables",
      "graft_tables() - registered catalog-name tables (SHOW TABLES analog)") {
      case Seq() =>
        val spark = SparkSession.active
        import spark.implicits._
        NamedTables.all().map {
          case (n, r: NamedTables.SnapshotRef) => (n, "snapshot", r.root, r.writeMode)
          case (n, p: NamedTables.PathRef) => (n, "parquet", p.root, "copy-on-write")
        }.toDF("name", "format", "location", "write_mode")
      case other => throw new IllegalArgumentException(
        s"graft_tables(): got ${other.size} arguments")
    }
    registerTvf(spark, "snapshot_history",
      "snapshot_history(path) - the commit log (DESCRIBE HISTORY)") {
      case Seq(path) =>
        Snapshots.table(SparkSession.active, rootOf(asString(path)))
          .describeHistory()
      case other => throw new IllegalArgumentException(
        s"snapshot_history(path): got ${other.size} arguments")
    }
    registerTvf(spark, "hive_acid",
      "hive_acid(path[, legacy]) - snapshot read of a transactional " +
        "table directory (base_N/delta_m_n layout): full-ACID ORC and " +
        "insert-only (MM) trees are auto-detected") {
      case Seq(path) =>
        val s = SparkSession.active
        val dir = asString(path)
        if (graft.sources.AcidMm.detectKind(s, dir) == "insert_only")
          graft.sources.AcidMm.read(s, dir)
        else graft.sources.AcidOrc.read(s, dir)
      case Seq(path, legacy) =>
        val s = SparkSession.active
        val dir = asString(path)
        // MM trees have no update flavor to toggle: detect them here
        // too (the legacy flag only concerns full-ACID update deltas)
        if (graft.sources.AcidMm.detectKind(s, dir) == "insert_only")
          graft.sources.AcidMm.read(s, dir)
        else graft.sources.AcidOrc.read(s, dir,
          legacyUpdates = asBoolean(legacy))
      case other => throw new IllegalArgumentException(
        s"hive_acid(path[, legacy]): got ${other.size} arguments")
    }
    registerTvf(spark, "hive_acid_ids",
      "hive_acid_ids(path) - ACID snapshot read carrying each row's " +
        "ROW__ID struct<writeid,bucketid,rowid> (the reference's virtual " +
        "column over transactional tables)") {
      case Seq(path) =>
        import org.apache.spark.sql.functions.{col, struct}
        graft.sources.AcidOrc.readWithIds(SparkSession.active, asString(path))
          .withColumn("ROW__ID", struct(
            col("_acid_otid").as("writeid"),
            col("_acid_bucket").as("bucketid"),
            col("_acid_rowid").as("rowid")))
          .drop("_acid_otid", "_acid_bucket", "_acid_rowid", "_acid_part")
      case other => throw new IllegalArgumentException(
        s"hive_acid_ids(path): got ${other.size} arguments")
    }
    registerTvf(spark, "hive_acid_state",
      "hive_acid_state(path) - the live directory state the ACID " +
        "snapshot reconstruction selected (base/delta/delete_delta/" +
        "original rows with write-id ranges and sizes) — the " +
        "pre-CONVERT / pre-compaction inspection surface") {
      case Seq(path) =>
        graft.sources.AcidOrc.state(SparkSession.active, asString(path))
      case other => throw new IllegalArgumentException(
        s"hive_acid_state(path): got ${other.size} arguments")
    }
  }

  private def asBoolean(e: Expression): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"expected a boolean literal argument, got: $other")
  }

  /** TVF arguments accept a registered catalog name as well as a root path
    * (`snapshot_history('sales')`) — names resolve through [[NamedTables]].
    */
  private def rootOf(s: String): String = NamedTables.get(s) match {
    case Some(r: NamedTables.SnapshotRef) => r.root
    case _ => s
  }

  private def registerTvf(spark: SparkSession, name: String, usage: String)(
      build: Seq[Expression] => org.apache.spark.sql.DataFrame): Unit = {
    val ident = FunctionIdentifier(name)
    // lookup-before-register: configure() runs per table()/sql() call, and
    // re-registration floods the log with "replaced a previously registered
    // function" warnings
    if (!spark.sessionState.tableFunctionRegistry.functionExists(ident))
      spark.sessionState.tableFunctionRegistry.registerFunction(
        ident,
        new ExpressionInfo(getClass.getName, null, name, usage, ""),
        (exprs: Seq[Expression]) => build(exprs).queryExecution.logical
          : LogicalPlan)
  }

  private def asString(e: Expression): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"expected a string literal argument, got: $other")
  }

  private def asLong(e: Expression): Long = e match {
    case Literal(v: Number, _) => v.longValue()
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got: $other")
  }
}
