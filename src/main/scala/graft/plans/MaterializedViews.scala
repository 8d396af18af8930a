package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized views with automatic query rewrite — the one optimizer
  * capability SURVEY §4.1 flags as having no Spark equivalent (Hive:
  * HiveMaterializedViewsRegistry.java:83 + the calcite/rules/views package).
  *
  * v1 scope: exact-subtree rewrite. A registered MV stores its optimized
  * logical plan; [[MvRewriteRule]] replaces any query subtree that
  * `sameResult`s it with a scan of the materialized parquet, remapping output
  * attribute ids. Containment-based rewrite (filters/rollups over the MV) is
  * the v2 extension — the mechanism (plan registry + custom Rule in the
  * optimizer) is what this establishes.
  *
  * The rule is installed by Engine.configure via
  * `spark.experimental.extraOptimizations` (and by GraftExtensions for the
  * spark.sql.extensions deployment path).
  */
object MaterializedViews {

  final case class Mv(name: String, plan: LogicalPlan, path: String)

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Mv]()

  /** CREATE MATERIALIZED VIEW name AS <df>, stored at `path`. */
  def create(spark: SparkSession, name: String, df: DataFrame, path: String): Unit = {
    df.write.mode("overwrite").parquet(path)
    registry.put(name, Mv(name, df.queryExecution.optimizedPlan, path))
  }

  def drop(name: String): Unit = registry.remove(name)

  def registered: Seq[Mv] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.toSeq
  }

  /** Rewrite rule: exact-subtree substitution by plan equivalence. */
  class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan.transformUp {
        case p =>
          registered.find(mv => mv.plan.sameResult(p)) match {
            case Some(mv) =>
              val scan = spark.read.parquet(mv.path).queryExecution.analyzed
              // map MV scan columns back onto the subtree's attribute ids so
              // the surrounding plan resolves unchanged
              Project(p.output.zip(scan.output).map { case (orig, attr) =>
                Alias(attr, orig.name)(exprId = orig.exprId)
              }, scan)
            case None => p
          }
      }
    }
  }

  /** Install the rewrite rule on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[MvRewriteRule]))
      spark.experimental.extraOptimizations = existing :+ new MvRewriteRule(spark)
  }
}
