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
  private val CreateMv =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+""" + Ident +
      """(?:\s+LOCATION\s+'([^']+)')?\s+AS\s+(.+?)\s*;?\s*""").r
  private val RebuildMv =
    ("""(?is)\s*ALTER\s+MATERIALIZED\s+VIEW\s+""" + Ident +
      """\s+REBUILD\s*;?\s*""").r
  private val DropMv =
    ("""(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+""" + Ident + """\s*;?\s*""").r
  private val ShowMv = """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s*;?\s*""".r
  private val Replicate =
    ("""(?is)\s*REPLICATE\s+TABLE\s+""" + Ident +
      """\s+TO\s+'([^']+)'\s*;?\s*""").r
  private val ExplainAnalyze =
    """(?is)\s*EXPLAIN\s+ANALYZE\s+(.+?)\s*;?\s*""".r
  private val ShowCompactions = """(?is)\s*SHOW\s+COMPACTIONS\s*;?\s*""".r
  private val ShowLocks =
    ("""(?is)\s*SHOW\s+LOCKS(?:\s+""" + Ident + """)?(?:\s+EXTENDED)?\s*;?\s*""").r
  private val ShowTransactions = """(?is)\s*SHOW\s+TRANSACTIONS\s*;?\s*""".r
  // snapshot refs — Hive 4's branch/tag DDL (ref ql/ddl/table/snapshotref/
  // + iceberg-handler IcebergSnapshotRefExec.java). FOR SYSTEM_VERSION AS
  // OF pins the fork point; FAST-FORWARD / CHERRY-PICK / SET_CURRENT_
  // SNAPSHOT are the ALTER TABLE ... EXECUTE family (ref parse/
  // AlterTableExecuteSpec.java ExecuteOperationType).
  private val CreateBranch =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+CREATE\s+BRANCH\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)""" +
      """(?:\s+FOR\s+SYSTEM_VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+RETAIN\s+(\d+)\s+(DAYS|HOURS))?\s*;?\s*""").r
  private val CreateTag =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+CREATE\s+TAG\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)""" +
      """(?:\s+FOR\s+SYSTEM_VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+RETAIN\s+(\d+)\s+(DAYS|HOURS))?\s*;?\s*""").r
  private val DropBranch =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+BRANCH\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*""").r
  private val DropTag =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+TAG\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*""").r
  private val RenameBranch =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+RENAME\s+BRANCH\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""").r
  private val ExecFastForward =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+EXECUTE\s+FAST-FORWARD\s+'?(\w+)'?\s*;?\s*""").r
  private val ExecCherryPick =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+EXECUTE\s+CHERRY-PICK\s+(\d+)\s*;?\s*""").r
  private val ExecRollback =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+EXECUTE\s+ROLLBACK\s*\(\s*'?([^')]+?)'?\s*\)\s*;?\s*""").r
  private val ExecExpireTs =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+EXECUTE\s+EXPIRE_SNAPSHOTS\s*\(\s*'([^']+)'\s*\)\s*;?\s*""").r
  private val ExecExpireRetain =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+EXECUTE\s+EXPIRE_SNAPSHOTS\s+RETAIN\s+LAST\s+(\d+)\s*;?\s*""").r
  private val ExecOrphanFiles =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+EXECUTE\s+(?:DELETE\s+)?ORPHAN-FILES""" +
      """(?:\s+OLDER\s+THAN\s+'([^']+)')?\s*;?\s*""").r
  private val ExecSetCurrent =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+EXECUTE\s+SET_CURRENT_SNAPSHOT\s+(\d+)\s*;?\s*""").r
  // partition-spec evolution (ref ql/ddl/table/partition/set/
  // AlterTableSetPartitionSpecAnalyzer.java) — metadata-only commit;
  // see [[Snapshots.SnapshotTable.setPartitionSpec]]
  private val SetPartSpec =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+SET\s+PARTITION\s+SPEC\s*\(([^)]*)\)\s*;?\s*""").r
  // the reference's EXPLAIN options (ref ql/.../parse/ExplainConfiguration
  // .java): CBO shows the cost-annotated plan -> Spark's EXPLAIN COST;
  // VECTORIZATION reports the vectorized-execution view -> EXPLAIN CODEGEN
  // (whole-stage codegen IS this engine's vectorization runtime)
  private val ExplainCbo = """(?is)\s*EXPLAIN\s+CBO\s+(.+?)\s*;?\s*""".r
  private val ExplainAuth =
    """(?is)\s*EXPLAIN\s+AUTHORIZATION\s+(.+?)\s*;?\s*""".r
  private val ExplainDep =
    """(?is)\s*EXPLAIN\s+DEPENDENCY\s+(.+?)\s*;?\s*""".r
  private val ExplainVec =
    """(?is)\s*EXPLAIN\s+VECTORIZATION\s+(?:ONLY\s+|SUMMARY\s+|DETAIL\s+)?(.+?)\s*;?\s*""".r

  /** Execute `sqlText` if it is a maintenance statement; None otherwise
    * (caller surfaces the canonical parse error).
    */
  /** Enforcement parts for a maintenance ident: plain names check as
    * themselves; backtick-quoted snapshot roots check under the `snapshot`
    * path form so [[Authz]]'s owning-name reverse resolution applies (no
    * path side door).
    */
  private def privParts(ident: String): Seq[String] =
    if (ident.startsWith("`")) Seq("snapshot", nameOf(ident))
    else Seq(nameOf(ident))

  def maybeRun(spark: SparkSession, sqlText: String): Option[DataFrame] =
    sqlText match {
      // state-rewriting table verbs require the table's UPDATE privilege
      // (RESTORE rolls state back, OPTIMIZE rewrites layout, VACUUM
      // destroys time travel) — without this, they are ungated sabotage
      // while the DML verbs they bypass are privilege-checked
      case RestoreV(ident, v) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        Some(runRestore(spark, ident, _.restore(v.toLong)))
      case RestoreTs(ident, ts) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        Some(runRestore(spark, ident,
          _.restoreAsOf(java.sql.Timestamp.valueOf(ts).getTime)))
      case OptimizeZ(ident, cols) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val zCols = cols.split(',').map(stripQuotes).map(_.trim).toSeq
        Some(runOptimize(spark, ident, _.zOrderBy(zCols)))
      case Optimize(ident) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        Some(runOptimize(spark, ident, _.compact()))
      case VacuumRetain(ident, hours) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        Some(runVacuum(spark, ident, hours.toDouble))
      case Vacuum(ident) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        Some(runVacuum(spark, ident, minAgeHours = 24.0))
      // snapshot refs: branch/tag DDL + the EXECUTE family. Creating or
      // moving refs rewrites what readers of the ref (or, for EXECUTE,
      // the MAINLINE) see — same UPDATE gate as RESTORE/OPTIMIZE.
      case CreateBranch(ident, ifNot, name, v, n, unit) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        tableOf(spark, ident).createBranch(name,
          Option(v).map(_.toLong), ifNotExists = ifNot != null,
          maxRefAgeMs = retainMs(n, unit))
        Some(okDf(spark, s"created branch $name"))
      case CreateTag(ident, ifNot, name, v, n, unit) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        tableOf(spark, ident).createTag(name,
          Option(v).map(_.toLong), ifNotExists = ifNot != null,
          maxRefAgeMs = retainMs(n, unit))
        Some(okDf(spark, s"created tag $name"))
      case DropBranch(ident, ifEx, name) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        tableOf(spark, ident).dropBranch(name, ifExists = ifEx != null)
        Some(okDf(spark, s"dropped branch $name"))
      case DropTag(ident, ifEx, name) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        tableOf(spark, ident).dropTag(name, ifExists = ifEx != null)
        Some(okDf(spark, s"dropped tag $name"))
      case RenameBranch(ident, from, to) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        tableOf(spark, ident).renameBranch(from, to)
        Some(okDf(spark, s"renamed branch $from to $to"))
      case ExecFastForward(ident, branch) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val m = tableOf(spark, ident).fastForward(branch)
        Some(okDf(spark, s"fast-forwarded to branch $branch at version ${m.version}"))
      case ExecCherryPick(ident, v) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val m = tableOf(spark, ident).cherryPick(v.toLong)
        Some(okDf(spark, s"cherry-picked version $v as version ${m.version}"))
      case ExecRollback(ident, arg) =>
        // ALTER TABLE t EXECUTE ROLLBACK(<version> | '<timestamp>') — the
        // reference's rollback spelling over [[Snapshots]] restore (ref
        // ddl/table/execute/AlterTableExecuteAnalyzer.java getRollbackDesc)
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val t = tableOf(spark, ident)
        val m =
          if (arg.trim.matches("\\d+")) t.restore(arg.trim.toLong)
          else t.restoreAsOf(java.sql.Timestamp.valueOf(arg.trim).getTime)
        Some(okDf(spark, s"rolled back to version ${m.meta.getOrElse("restored_version", "?")} as version ${m.version}"))
      case ExecExpireTs(ident, ts) =>
        // EXPIRE_SNAPSHOTS('<timestamp>'): retire versions committed at or
        // before the cut, keeping at least the head (vacuum's retain count
        // computed from the mainline history)
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val t = tableOf(spark, ident)
        val cutMs = java.sql.Timestamp.valueOf(ts.trim).getTime
        val newer = t.history().count(_.timestampMs > cutMs)
        val reclaimed = t.vacuum(retainLast = math.max(newer, 1),
          minAgeHours = 0.0)
        Some(okDf(spark, s"expired snapshots at or before $ts ($reclaimed files reclaimed)"))
      case ExecExpireRetain(ident, n) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val reclaimed = tableOf(spark, ident)
          .vacuum(retainLast = n.toInt, minAgeHours = 0.0)
        Some(okDf(spark, s"expired snapshots beyond the last $n ($reclaimed files reclaimed)"))
      case ExecOrphanFiles(ident, olderThan) =>
        // DELETE ORPHAN-FILES [OLDER THAN '<ts>']: reclaim files no
        // manifest references WITHOUT pruning any history (retain
        // everything; the reference defaults the cut to now-3d)
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val hours = Option(olderThan) match {
          case Some(ts) =>
            math.max(0.0, (System.currentTimeMillis() -
              java.sql.Timestamp.valueOf(ts.trim).getTime) / 3600000.0)
          case None => 72.0 // the reference's 3-day default
        }
        val reclaimed = tableOf(spark, ident)
          .vacuum(retainLast = Int.MaxValue, minAgeHours = hours,
            orphanOnly = true)
        Some(okDf(spark, s"deleted $reclaimed orphan files"))
      case ExecSetCurrent(ident, v) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val m = tableOf(spark, ident).setCurrentSnapshot(v.toLong)
        Some(okDf(spark, s"set current snapshot to $v at version ${m.version}"))
      case SetPartSpec(ident, cols) =>
        Authz.requireRelationPrivilege(spark, privParts(ident), "update")
        val cs = cols.split(',').map(stripQuotes).map(_.trim)
          .filter(_.nonEmpty).toSeq
        val m = tableOf(spark, ident).setPartitionSpec(cs)
        Some(okDf(spark, s"set partition spec to (${cs.mkString(", ")}) " +
          s"at version ${m.version}"))
      case CreateMv(ident, loc, query) =>
        // materializing a query = reading it: same SELECT checks, and
        // fail closed for policied users (one MV serves EVERY user via the
        // rewrite — a filtered materialization corrupts it for others, an
        // unfiltered one leaks to the policied user)
        val planned = Authz.checkQueryText(spark, query)
        require(!planned.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.Command],
          "CREATE MATERIALIZED VIEW needs a query, not a command")
        if (Authz.policiedFor(spark, planned))
          throw new Authz.AccessDenied(
            "CREATE MATERIALIZED VIEW over a row-filtered/masked source " +
              "is not allowed for this user — the materialization is " +
              "shared by all users")
        Some(runCreateMv(spark, nameOf(ident), Option(loc), query, planned))
      case RebuildMv(ident) =>
        MaterializedViews.registered(spark)
          .find(_.name == nameOf(ident)).map(_.sql) match {
          case Some(Some(q)) =>
            val planned = Authz.checkQueryText(spark, q)
            if (Authz.policiedFor(spark, planned))
              throw new Authz.AccessDenied(
                "ALTER MATERIALIZED VIEW REBUILD would materialize this " +
                  "user's filtered/masked view into the shared MV")
          case Some(None) =>
            // a plan-declared MV (no stored SQL) cannot be privilege- or
            // policy-checked against its sources — admin only
            Authz.requireAdmin(spark,
              "ALTER MATERIALIZED VIEW REBUILD (plan-declared MV)")
          case None => () // no such MV: runRebuildMv raises the clear error
        }
        Some(runRebuildMv(spark, nameOf(ident)))
      case DropMv(ident) =>
        Authz.requireAdmin(spark, "DROP MATERIALIZED VIEW")
        MaterializedViews.drop(spark, nameOf(ident))
        Some(spark.emptyDataFrame)
      case ShowMv() =>
        import spark.implicits._
        Some(MaterializedViews.registered(spark)
          .map(mv => (mv.name, mv.path, mv.sources.size.toLong))
          .sortBy(_._1).toDF("name", "location", "n_sources"))
      case Replicate(ident, target) =>
        // raw FILE copy to a caller-chosen path: masked/filtered content
        // leaves in cleartext regardless of policies — admin only
        Authz.requireAdmin(spark, "REPLICATE TABLE")
        import spark.implicits._
        val r = Replication.sync(spark, tableOf(spark, ident).root, target)
        Some(Seq((nameOf(ident), target, r.mode, r.fromVersion, r.toVersion,
          r.commitsApplied))
          .toDF("table", "target", "mode", "from_version", "to_version",
            "commits_applied"))
      case ExplainAnalyze(query) =>
        Some(runExplainAnalyze(spark, query))
      case ShowCompactions() =>
        Some(runShowCompactions(spark))
      case ShowLocks(_) =>
        Some(runShowLocks(spark))
      case ShowTransactions() =>
        Some(runShowTransactions(spark))
      // the EXPLAIN family reveals plans/stats of the inner query — it
      // requires the query's own privileges (Hive likewise authorizes
      // EXPLAIN as the statement); ANALYZE additionally EXECUTES, so it
      // runs the policied plan (see runExplainAnalyze)
      case ExplainCbo(query) =>
        Authz.checkQueryText(spark, query)
        Some(spark.sql(s"EXPLAIN COST $query"))
      case ExplainVec(query) =>
        Authz.checkQueryText(spark, query)
        Some(spark.sql(s"EXPLAIN CODEGEN $query"))
      // EXPLAIN AUTHORIZATION stays open by PURPOSE: it is the "what would
      // I need" diagnostic (it reveals only names derived from the text
      // the user typed). DEPENDENCY is lineage tooling — it additionally
      // reverse-resolves paths to owning tables, so it requires the
      // query's privileges like the rest of the EXPLAIN family.
      case ExplainAuth(query) => Some(runExplainAuthorization(spark, query))
      case ExplainDep(query) =>
        Authz.checkQueryText(spark, query)
        Some(runExplainDependency(spark, query))
      case _ => None
    }

  /** EXPLAIN AUTHORIZATION <statement> — the reference's authorization
    * report (ref ql/.../ExplainTask.java `outputDependencies` under the
    * AUTHORIZATION explain option: INPUTS / OUTPUTS / CURRENT_USER /
    * OPERATION). The access profile is EXACTLY what [[Authz]] enforces
    * (same resolution, same CTE scoping), so the report is the enforcement
    * contract, not a parallel guess.
    */
  private def runExplainAuthorization(spark: SparkSession,
      query: String): DataFrame = {
    import spark.implicits._
    val plan = spark.sessionState.sqlParser.parsePlan(query)
    val (inputs, outputs, op) = Authz.statementAccess(plan)
    val lines =
      Seq("INPUTS:") ++ inputs.map("  " + _) ++
        Seq("OUTPUTS:") ++ outputs.map("  " + _) ++
        Seq("CURRENT_USER:", "  " + Authz.currentUser(spark),
          "OPERATION:", "  " + op.toUpperCase(java.util.Locale.ROOT))
    lines.toDF("authorization")
  }

  /** EXPLAIN DEPENDENCY <statement> — the reference's input-table report
    * (ref ql/.../ExplainTask.java getJSONDependencies: one JSON document
    * listing input_tables/input_partitions). Partition granularity is the
    * scan's pruning concern here (partition columns live in the path
    * layout), so input_partitions reports empty, as Hive does for
    * unpartitioned inputs.
    */
  private def runExplainDependency(spark: SparkSession,
      query: String): DataFrame = {
    import spark.implicits._
    val plan = spark.sessionState.sqlParser.parsePlan(query)
    // READ dependencies only — a DML target is written, not depended on
    // (Hive's getJSONDependencies likewise lists inputs; reporting the
    // target would make lineage tools record a table upstream of itself)
    val (inputs, _, _) = Authz.statementAccess(plan)
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    val tables = inputs.distinct.sorted
      .map(t => s"""{"tablename":"${esc(t)}","tabletype":"MANAGED_TABLE"}""")
      .mkString(",")
    Seq(s"""{"input_tables":[$tables],"input_partitions":[]}""")
      .toDF("dependency")
  }

  /** SHOW COMPACTIONS — the reference's compactor-visibility verb (ref
    * ql/.../ddl/process/ShowCompactionsDesc.java). This engine's compactor
    * analog is the versioned reorganization commit (compact / cluster /
    * zorder actions in the manifest log), which either publishes or
    * doesn't — so every listed row is terminal (`succeeded`), there is no
    * queue to report. Lists all registered snapshot tables.
    */
  private def runShowCompactions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val reorg = Set("compact", "cluster", "zorder")
    NamedTables.all().collect {
      case (name, r: NamedTables.SnapshotRef) =>
        Snapshots.table(spark, r.root).history()
          .filter(m => reorg(m.action))
          .map(m => (name, m.version, m.action,
            new java.sql.Timestamp(m.timestampMs), m.files.size.toLong,
            "succeeded"))
    }.flatten
      .sortBy(t => (t._1, t._2))
      .toDF("table", "version", "type", "commit_ts", "n_files", "state")
  }

  /** SHOW LOCKS [table] — the reference's lock-manager visibility verb
    * (ref ql/.../ddl/process/ShowLocksDesc.java, column shape from
    * ShowLocksOperation). This engine's concurrency model is lock-free
    * optimistic (snapshot CAS commits — a writer either publishes its
    * version or retries; nothing ever WAITS on a lock), so the well-formed
    * answer is always zero rows: there are no locks to hold, matching the
    * operability contract the way SHOW COMPACTIONS' terminal rows do.
    */
  private def runShowLocks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, String, String, String, String, String, Long,
        java.sql.Timestamp, java.sql.Timestamp, String, String)]
      .toDF("lockid", "database", "table", "partition", "lock_state",
        "blocked_by", "lock_type", "transaction_id", "last_heartbeat",
        "acquired_at", "user", "hostname")
  }

  /** SHOW TRANSACTIONS — the reference's txn-manager visibility verb (ref
    * ql/.../ddl/process/ShowTransactionsDesc.java). Snapshot commits are
    * atomic CAS publishes with no open-transaction state between
    * statements, so the open-txn list is always empty — zero rows, the
    * reference's column shape.
    */
  private def runShowTransactions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, java.sql.Timestamp, java.sql.Timestamp,
        String, String)]
      .toDF("txnid", "state", "started", "last_heartbeat", "user", "host")
  }

  /** EXPLAIN ANALYZE <query> — Hive's post-execution plan report (ref ql/
    * .../ExplainTask.java, hive.explain.user with actual row counts): runs
    * the query to completion, then renders the FINAL physical plan (AQE
    * re-planned stages included) one node per row with its actual runtime
    * metrics. Spark's native EXPLAIN modes are estimates-only; this is the
    * measured twin.
    */
  private def runExplainAnalyze(spark: SparkSession,
      query: String): DataFrame = {
    import spark.implicits._
    // EXPLAIN ANALYZE EXECUTES the statement: enforce its privileges and
    // run the POLICIED plan — the reported row counts are then the
    // invoker's own view, not a probe oracle over filtered/masked data
    val checked = Authz.checkQueryText(spark, query)
    val df = org.apache.spark.sql.GraftShims.ofRows(spark,
      NamedTables.substitute(spark,
        Authz.applyPolicies(spark, checked)))
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ()) // execute THIS plan object so metrics populate
    val shown = Set("numOutputRows", "numFiles", "filesSize", "spillSize",
      "numPartitions", "dataSize", "shuffleBytesWritten", "shuffleRecordsWritten",
      "recordsRead", "peakMemory", "time", "scanTime", "aggTime", "sortTime")
    def walk(p: org.apache.spark.sql.execution.SparkPlan,
        depth: Int): Seq[String] = {
      val ms = p.metrics.collect {
        case (k, m) if shown.contains(k) && m.value > 0 => s"$k=${m.value}"
      }.toSeq.sorted.mkString(", ")
      val line = s"${"  " * depth}${p.nodeName}" +
        (if (ms.nonEmpty) s"  [$ms]" else "")
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case other => other.children
      }
      line +: kids.flatMap(walk(_, depth + 1))
    }
    walk(qe.executedPlan, 0).toDF("plan")
  }

  /** CREATE MATERIALIZED VIEW name [LOCATION '<dir>'] AS <query> — Hive's
    * declarative MV surface (ref ql/.../CreateMaterializedViewDesc.java);
    * the registered MV then answers matching queries via the rewrite rule
    * (exact subtree + aggregate rollup). The defining SQL is stored so
    * REBUILD re-parses it against the sources' CURRENT state.
    */
  private def runCreateMv(spark: SparkSession, name: String,
      loc: Option[String], query: String,
      planned: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame = {
    import spark.implicits._
    require(!MaterializedViews.registered(spark).exists(_.name == name),
      s"materialized view $name already exists")
    val path = loc.getOrElse(
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        s"/graft_mv/$name")
    val df = org.apache.spark.sql.GraftShims.ofRows(spark,
      NamedTables.substitute(spark, planned))
    MaterializedViews.create(spark, name, df, path, Some(query))
    val rows = spark.read.parquet(path).count()
    Seq((name, path, rows)).toDF("name", "location", "rows")
  }

  /** ALTER MATERIALIZED VIEW name REBUILD (ref ql/.../
    * AlterMaterializedViewRebuildAnalyzer.java): recompute from the stored
    * SQL when available (fresh source listing); plan-declared MVs re-execute
    * their stored plan.
    */
  private def runRebuildMv(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val mv = MaterializedViews.registered(spark).find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"no such materialized view: $name"))
    MaterializedViews.drop(spark, name) // no rewrite against the mid-rebuild dir
    val df = mv.sql match {
      case Some(q) => org.apache.spark.sql.GraftShims.ofRows(spark,
        NamedTables.substitute(spark,
          spark.sessionState.sqlParser.parsePlan(q)))
      case None => org.apache.spark.sql.GraftShims.ofRows(spark, mv.plan)
    }
    MaterializedViews.create(spark, name, df, mv.path, mv.sql)
    val rows = spark.read.parquet(mv.path).count()
    Seq((name, mv.path, rows)).toDF("name", "location", "rows")
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

  /** RETAIN n DAYS|HOURS -> maxRefAgeMs (ref AlterTableSnapshotRefSpec
    * getMaxRefAgeMs).
    */
  private def retainMs(n: String, unit: String): Option[Long] =
    Option(n).map(_.toLong * (if (unit.equalsIgnoreCase("DAYS"))
      86400000L else 3600000L))

  private def okDf(spark: SparkSession, msg: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("result")
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
