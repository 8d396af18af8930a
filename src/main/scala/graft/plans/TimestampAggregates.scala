package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Hive sums and averages TIMESTAMP columns as DOUBLE epoch seconds —
  * `sum(ts)` / `avg(ts)` implicitly convert through
  * PrimitiveObjectInspectorUtils.getDouble (seconds + fractional part;
  * ref udf/generic/GenericUDAFSum.java resolving timestamp to the
  * double evaluator; vector_aggregate_9.q pins the values) — where
  * Spark's Sum/Average refuse the type outright. Surfaced by qtest
  * wave 17d.
  *
  * The rewrite matches Sum/Average nodes whose child RESOLVED to
  * TimestampType (the aggregate itself can never resolve — its type
  * check fails — so analysis leaves exactly this shape) and inserts
  * the double cast, which is the same µs/1e6 conversion Hive applies.
  * Runs in the front door after the analyzer pass and as an
  * extensions-injected resolution rule (naturally idempotent: after
  * the rewrite the child is DoubleType).
  */
object TimestampAggregates {

  private[plans] def rewriteResolved(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case s @ Sum(child, _) if child.resolved &&
          child.dataType == TimestampType =>
        s.withNewChildren(Seq(Cast(child, DoubleType)))
      case a @ Average(child, _) if child.resolved &&
          child.dataType == TimestampType =>
        a.withNewChildren(Seq(Cast(child, DoubleType)))
    }

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    if (plan.resolved) return plan // fully resolved = no refused Sum
    val analyzed =
      try spark.sessionState.analyzer.execute(plan)
      catch { case NonFatal(_) => return plan }
    val out = rewriteResolved(analyzed)
    if (out.fastEquals(analyzed)) plan else out
  }

  /** Extensions-injected spelling for plain `spark.sql` deployments. */
  class TimestampAggregatesRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = rewriteResolved(plan)
  }
}
