package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.DoubleType

/** DISTINCT window aggregates — `COUNT(DISTINCT x) OVER (PARTITION BY
  * p)`, `SUM(DISTINCT x) OVER (...)`, `AVG(DISTINCT x) OVER (...)` —
  * are Hive surface (ref ql/parse/WindowingSpec.java + windowing_
  * distinct.q) that Spark's analyzer refuses outright ("Distinct window
  * functions are not supported"). Front-door rewrite (Engine.sql,
  * pre-analysis): the distinct aggregate lowers to a composition over
  * the frame's distinct-value SET, which Spark's window machinery DOES
  * support:
  *
  *   - `COUNT(DISTINCT x) OVER w`  → `size(collect_set(x) OVER w)`
  *   - `SUM(DISTINCT x) OVER w`    → `aggregate(set, first-first+0BD, +)`
  *     (the `element_at(set,1) - element_at(set,1)` seed is a ZERO of
  *     the set's own element type, widened by `+ cast(0 as
  *     decimal(38,0))` so the accumulator type is CLOSED under
  *     addition — decimal hits the 38-precision cap and stays put,
  *     float/double widen to floating point, integers sum overflow-safe
  *     at full precision; an empty set — all-NULL frame — seeds NULL
  *     and answers NULL, exactly Hive's sum-over-nothing)
  *   - `AVG(DISTINCT x) OVER w`    → sum-over-set / size(set)
  *
  * collect_set drops NULLs, matching distinct-aggregate NULL semantics.
  * The lowering is frame-faithful: under an ordered running frame it
  * computes the running distinct aggregate, same as the whole-partition
  * form Hive's grammar permits. Multi-argument distinct aggregates and
  * other functions pass through untouched (Spark's canonical error
  * surfaces).
  */
object DistinctWindows {

  private val Lowered = Set("count", "sum", "avg")

  def apply(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): LogicalPlan = {
    val rewritten = plan.transformDownWithSubqueries {
      case p => p.transformExpressions {
        case WindowExpression(uf: UnresolvedFunction,
            spec: WindowSpecDefinition)
            if uf.isDistinct && uf.filter.isEmpty &&
              uf.arguments.size == 1 &&
              nameOf(uf).exists(Lowered) =>
          val cset = WindowExpression(
            uf.copy(nameParts = Seq("collect_set"), isDistinct = false),
            spec)
          nameOf(uf).get match {
            // count is BIGINT in Hive/Spark; size() alone answers INT
            case "count" =>
              Cast(sizeOf(cset), org.apache.spark.sql.types.LongType)
            case "sum" => sumOf(spark, cset)
            case "avg" =>
              Divide(sumOf(spark, cset), Cast(sizeOf(cset), DoubleType))
          }
      }
    }
    if (rewritten eq plan) plan else rewritten
  }

  private def sizeOf(cset: Expression): Expression =
    UnresolvedFunction("size", Seq(cset), isDistinct = false)

  /** `aggregate(cset, element_at(cset,1) - element_at(cset,1),
    * (a, b) -> a + b)` with `cset` spliced for the placeholder — parsed
    * once per occurrence so the lambda arrives in exactly the
    * unresolved shape the analyzer expects.
    */
  private def sumOf(spark: org.apache.spark.sql.SparkSession,
      cset: Expression): Expression = {
    val tmpl = spark.sessionState.sqlParser.parseExpression(
      "aggregate(__graft_cset, element_at(__graft_cset, 1) - " +
        "element_at(__graft_cset, 1) + cast(0 as decimal(38,0)), " +
        "(a, b) -> a + b)")
    tmpl.transform {
      case UnresolvedAttribute(Seq("__graft_cset")) => cset
    }
  }

  private def nameOf(fn: UnresolvedFunction): Option[String] =
    if (fn.nameParts.size == 1)
      Some(fn.nameParts.head.toLowerCase(Locale.ROOT))
    else None
}
