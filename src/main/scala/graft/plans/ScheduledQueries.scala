package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scheduled queries (ref ql/src/java/org/apache/hadoop/hive/ql/scheduled/
  * ScheduledQueryExecutionService.java + the `CREATE SCHEDULED QUERY ...
  * EVERY n MINUTES` DDL, parse/ScheduledQueryAnalyzer): a registry of named
  * queries with an interval, executed when due.
  *
  * Deterministic by design: the engine does not own a timer thread —
  * [[runDue]] is driven by whatever clock the deployment provides (a cron
  * tick, an Airflow task, a Structured Streaming trigger), which is also how
  * tests drive it. Hive's executor-pool/metastore-lease machinery is
  * infrastructure Spark deployments already have (SURVEY §7 non-goals); the
  * capability kept here is the schedule registry + due-query execution.
  */
object ScheduledQueries {

  final case class Scheduled(
      name: String,
      everyMillis: Long,
      query: SparkSession => DataFrame,
      sink: DataFrame => Unit,
      lastRunAt: Long,
      enabled: Boolean)

  private val registry =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, Scheduled]]())

  private def regFor(spark: SparkSession) = registry.synchronized {
    var r = registry.get(spark)
    if (r == null) {
      r = new java.util.concurrent.ConcurrentHashMap[String, Scheduled]()
      registry.put(spark, r)
    }
    r
  }

  /** CREATE SCHEDULED QUERY name EVERY interval AS query (+ a sink: Hive's
    * scheduled queries are INSERT/materialization statements).
    */
  def create(spark: SparkSession, name: String, everyMillis: Long)(
      query: SparkSession => DataFrame)(sink: DataFrame => Unit): Unit =
    regFor(spark).put(name,
      Scheduled(name, everyMillis, query, sink, lastRunAt = Long.MinValue, enabled = true))

  /** ALTER SCHEDULED QUERY name ENABLE/DISABLE. */
  def setEnabled(spark: SparkSession, name: String, enabled: Boolean): Unit = {
    val r = regFor(spark)
    Option(r.get(name)).foreach(s => r.put(name, s.copy(enabled = enabled)))
  }

  /** DROP SCHEDULED QUERY name. */
  def drop(spark: SparkSession, name: String): Unit = regFor(spark).remove(name)

  def list(spark: SparkSession): Seq[Scheduled] = {
    import scala.jdk.CollectionConverters._
    regFor(spark).values.asScala.toSeq.sortBy(_.name)
  }

  /** Execute every enabled query whose interval has elapsed at `now`; returns
    * the names run. Failures propagate (the caller's scheduler owns retry
    * policy, as Hive's executor service does).
    */
  def runDue(spark: SparkSession, now: Long): Seq[String] = {
    val r = regFor(spark)
    list(spark).filter(s => s.enabled &&
        (s.lastRunAt == Long.MinValue || now - s.lastRunAt >= s.everyMillis)).map { s =>
      s.sink(s.query(spark))
      r.put(s.name, s.copy(lastRunAt = now))
      s.name
    }
  }

  // ------------------------------------------------------------ SQL verbs
  // the reference's DDL (parse/ScheduledQueryAnalyzer: CREATE SCHEDULED
  // QUERY q EVERY n MINUTES AS <statement>, ALTER ... ENABLE/DISABLE/
  // EXECUTE, DROP, SHOW) — the EVERY form; CRON expressions are the
  // deployment scheduler's job here (runDue is clock-driven by design)

  // statement text per (session, name), for SHOW and re-execution
  private val statements =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, String]]())
  private def stmtsFor(spark: SparkSession) = statements.synchronized {
    var r = statements.get(spark)
    if (r == null) {
      r = new java.util.concurrent.ConcurrentHashMap[String, String]()
      statements.put(spark, r)
    }
    r
  }

  private val CreateR =
    ("""(?is)\s*CREATE\s+SCHEDULED\s+QUERY\s+(\w+)\s+EVERY\s+(\d+)\s+""" +
      """(SECOND|MINUTE|HOUR)S?\s+AS\s+(.+?)\s*;?\s*""").r
  private val AlterToggleR =
    """(?is)\s*ALTER\s+SCHEDULED\s+QUERY\s+(\w+)\s+(ENABLE|DISABLE)\s*;?\s*""".r
  private val AlterExecR =
    """(?is)\s*ALTER\s+SCHEDULED\s+QUERY\s+(\w+)\s+EXECUTE\s*;?\s*""".r
  private val DropR =
    """(?is)\s*DROP\s+SCHEDULED\s+QUERY\s+(\w+)\s*;?\s*""".r
  private val ShowR = """(?is)\s*SHOW\s+SCHEDULED\s+QUERIES\s*;?\s*""".r
  private val ExecDueR = """(?is)\s*EXECUTE\s+SCHEDULED\s+QUERIES\s*;?\s*""".r

  /** Execute `sqlText` if it is a scheduled-query verb (all parse errors
    * to Spark); `runner` is the engine front door the stored statement
    * re-enters (so scheduled DML/INSERT statements execute with full
    * engine semantics). None otherwise.
    */
  def maybeSql(spark: SparkSession, sqlText: String,
      runner: String => DataFrame): Option[DataFrame] = {
    import spark.implicits._
    def done(what: String): DataFrame = Seq(what).toDF("result")
    sqlText match {
      case CreateR(name, n, unit, stmt) =>
        val ms = n.toLong * (unit.toUpperCase match {
          case "SECOND" => 1000L
          case "MINUTE" => 60L * 1000
          case _ => 3600L * 1000
        })
        create(spark, name, ms)(_ => runner(stmt))(_.collect())
        stmtsFor(spark).put(name, stmt.trim)
        Some(done(s"created scheduled query $name"))
      case AlterToggleR(name, toggle) =>
        setEnabled(spark, name, toggle.equalsIgnoreCase("ENABLE"))
        Some(done(s"${toggle.toLowerCase}d scheduled query $name"))
      case AlterExecR(name) =>
        // run-now, unconditionally (the reference's ALTER ... EXECUTE)
        val r = regFor(spark)
        val s = Option(r.get(name)).getOrElse(
          throw new IllegalArgumentException(s"scheduled query not found: $name"))
        s.sink(s.query(spark))
        r.put(name, s.copy(lastRunAt = System.currentTimeMillis()))
        Some(done(s"executed scheduled query $name"))
      case DropR(name) =>
        drop(spark, name)
        stmtsFor(spark).remove(name)
        Some(done(s"dropped scheduled query $name"))
      case ShowR() =>
        val stmts = stmtsFor(spark)
        Some(list(spark).map(s => (s.name, s.everyMillis, s.enabled,
            if (s.lastRunAt == Long.MinValue) null
            else new java.sql.Timestamp(s.lastRunAt),
            stmts.getOrDefault(s.name, "<programmatic>")))
          .toDF("name", "every_ms", "enabled", "last_run", "statement"))
      case ExecDueR() =>
        Some(runDue(spark, System.currentTimeMillis()).toDF("executed"))
      case _ => None
    }
  }
}
