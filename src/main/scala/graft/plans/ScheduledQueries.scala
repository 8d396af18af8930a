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
}
