package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, GroupingSets, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Hive (and DuckDB, and PostgreSQL) answer the EXPLICIT empty
  * grouping set's global row even when the input is EMPTY —
  * `GROUP BY a, b GROUPING SETS ((), ...)` over zero rows yields one
  * row with NULL aggregates and grouping() = 1 (ref
  * groupby_rollup_empty.q's pinned `NULL, 1`) — where Spark's
  * Expand+Aggregate lowering yields zero rows (no input, no groups).
  *
  * The rewrite splits the EXPLICIT `()` out of the set list and
  * computes it as a key-less global Aggregate — the one plan shape
  * whose empty-input answer is a single row by SQL semantics — unioned
  * under the remaining sets. On non-empty input the result is
  * identical (the `()` row IS the global aggregate); on empty input
  * the global leg supplies the missing row. In the global leg,
  * `grouping(x...)` folds to its all-ones value and `grouping__id` to
  * the full mask; select-list occurrences of the grouping expressions
  * fold to NULL except inside aggregate calls (sum(a) with a also a
  * group key aggregates the raw column, per Hive).
  *
  * Scale note: the global leg re-scans the child once, but as a
  * key-less partial aggregate over only the aggregated columns — the
  * cheapest possible second pass. ROLLUP/CUBE spellings (whose
  * IMPLICIT total row has the same empty-input gap) are deliberately
  * not rewritten: they never state `()` explicitly and rewriting them
  * would tax every rollup query for an edge the corpus pins only on
  * the explicit spelling.
  */
object EmptyGroupingSets {

  // aggregate functions whose arguments must keep the RAW column in
  // the global leg (a grouping expression inside sum() aggregates the
  // column; outside, it names the group and folds to NULL)
  private val AggNames = Set("sum", "count", "avg", "mean", "min", "max",
    "first", "last", "first_value", "last_value", "collect_list",
    "collect_set", "stddev", "stddev_pop", "stddev_samp", "std",
    "variance", "var_pop", "var_samp", "corr", "covar_pop", "covar_samp",
    "percentile", "percentile_approx", "approx_count_distinct",
    "count_if", "any", "some", "every", "bool_and", "bool_or", "bit_and",
    "bit_or", "bit_xor", "histogram_numeric", "skewness", "kurtosis")

  private def fnName(f: UnresolvedFunction): String =
    f.nameParts.last.toLowerCase(Locale.ROOT)

  private def globalize(ne: NamedExpression, groupExprs: Seq[Expression],
      fullMask: Int): NamedExpression = {
    val groupSql = groupExprs.map(_.sql).toSet
    def walk(e: Expression): Expression = e match {
      case f: UnresolvedFunction if fnName(f) == "grouping" =>
        Literal((1 << f.arguments.size) - 1)
      case f: UnresolvedFunction if fnName(f) == "grouping_id" =>
        Literal(fullMask)
      case a: UnresolvedAttribute
          if a.name.toLowerCase(Locale.ROOT) == "grouping__id" =>
        Literal(fullMask)
      case f: UnresolvedFunction if AggNames(fnName(f)) => f // raw args
      case e if groupSql(e.sql) => Literal(null)
      case other => other.mapChildren(walk)
    }
    walk(ne) match {
      case n: NamedExpression => n
      case e => Alias(e, ne.name)()
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case p => p.transformUp {
        case agg @ Aggregate(Seq(gs: GroupingSets), aggExprs, child, _)
            if gs.groupingSets.exists(_.isEmpty) =>
          val nonEmpty = gs.groupingSets.filterNot(_.isEmpty)
          val mask = (1 << gs.userGivenGroupByExprs.size) - 1
          val globalLeg = Aggregate(Nil,
            aggExprs.map(globalize(_, gs.userGivenGroupByExprs, mask)),
            child)
          if (nonEmpty.isEmpty) globalLeg
          else Union(Seq(
            agg.copy(groupingExpressions =
              Seq(GroupingSets(nonEmpty, gs.userGivenGroupByExprs))),
            globalLeg))
      }
    }

  /** Extensions-injected spelling for plain `spark.sql` deployments. */
  class EmptyGroupingSetsRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      EmptyGroupingSets(plan)
  }
}
