package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal, MapEntries, MapFromEntries, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.MapType

/** Hive groups by MAP-typed expressions (ref groupby_complex_types.q:
  * `SELECT MAP(key, value), COUNT(1) ... GROUP BY MAP(key, value)` —
  * GenericUDAFEvaluator buckets on ObjectInspectorUtils map equality),
  * where Spark's CheckAnalysis refuses: map is not an orderable type
  * (GROUP_EXPRESSION_TYPE_IS_NOT_ORDERABLE). The gap closes by
  * CANONICALIZING the map for grouping: group on
  * `sort_array(map_entries(m))` — an array<struct<key,value>> sorted by
  * key, an orderable value that is equal exactly when the maps are
  * equal (Hive map keys are unique) — and rebuild the map in the
  * aggregate list with `map_from_entries` over the same canonical
  * array, so the SELECT still answers a map.
  *
  * Runs on the RESOLVED plan (types are needed): the front door applies
  * it right before execution; extensions-bootstrapped plain-`spark.sql`
  * sessions get the same via [[MapGroupByRule]], which fires during
  * resolution — before CheckAnalysis would refuse. Top-level map
  * groupings only; a map nested inside a grouped struct stays Spark's
  * canonical error. Scale: the rewrite is a per-row projection — the
  * shuffle keys on the canonical array exactly as it would on any
  * grouping expression, no extra exchange.
  */
object MapGroupBy {

  private def canon(g: Expression): Expression =
    SortArray(MapEntries(g), Literal(true))

  private def rewriteAgg(a: Aggregate): Aggregate = {
    val mapGroups = a.groupingExpressions.filter(g =>
      g.resolved && g.dataType.isInstanceOf[MapType])
    if (mapGroups.isEmpty) a
    else {
      val newGrouping = a.groupingExpressions.map { g =>
        if (g.resolved && g.dataType.isInstanceOf[MapType]) canon(g) else g
      }
      val newAggs = a.aggregateExpressions.map { ne =>
        ne.transformUp {
          case e: Expression if mapGroups.exists(_.semanticEquals(e)) =>
            MapFromEntries(canon(e))
        }.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]
      }
      a.copy(groupingExpressions = newGrouping,
        aggregateExpressions = newAggs)
    }
  }

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    if (!plan.exists(_.isInstanceOf[Aggregate])) return plan
    val resolved =
      if (plan.resolved) plan
      else try spark.sessionState.analyzer.execute(plan)
      catch { case scala.util.control.NonFatal(_) => return plan }
    val needs = resolved.exists {
      case a: Aggregate => a.groupingExpressions.exists(g =>
        g.resolved && g.dataType.isInstanceOf[MapType])
      case _ => false
    }
    if (!needs) plan
    else resolved.transformUpWithSubqueries { case a: Aggregate =>
      rewriteAgg(a)
    }
  }

  /** Extensions-injected spelling: fires on resolved Aggregates during
    * analysis, ahead of CheckAnalysis's orderability refusal.
    */
  class MapGroupByRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformUpWithSubqueries {
        case a: Aggregate if a.groupingExpressions.exists(g =>
            g.resolved && g.dataType.isInstanceOf[MapType]) =>
          rewriteAgg(a)
      }
  }
}
