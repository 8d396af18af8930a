package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Opt-in rewrite of exact `count(DISTINCT x)` to an HLL-sketch estimate
  * — the reference's BI-mode optimization (ref ql/optimizer/calcite/
  * rules/HiveRewriteToDataSketchesRules.java, gated there by
  * `hive.optimize.bi.enabled`):
  *
  * {{{ SET spark.graft.rewrite.countDistinctToSketch=true }}}
  *
  * rewrites `count(DISTINCT x)` →
  * `cast(round(ds_hll_estimate(ds_hll_sketch(cast(x AS string)))) AS
  * bigint)`. At 100 TB the exact form shuffles every distinct value;
  * the sketch form ships ≤2.5 KB per partition and unions sketches
  * (~1.6% RSE at the library-default lgK=12). Scope mirrors the
  * reference's: single-argument DISTINCT counts with no FILTER clause;
  * everything else stays exact. Off by default — estimates must be
  * chosen, not imposed.
  */
object SketchRewrite {

  val ConfKey = "spark.graft.rewrite.countDistinctToSketch"

  class CountDistinctToSketch(session: SparkSession)
      extends Rule[LogicalPlan] {

    private def fn(name: String, args: Seq[Expression]): Expression =
      session.sessionState.catalog.lookupFunction(
        FunctionIdentifier(name), args)

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (!session.conf.get(ConfKey, "false").toBoolean) return plan
      val rewritten = plan.transformDownWithSubqueries {
        case agg: Aggregate if agg.aggregateExpressions.exists(hasTarget) =>
          agg.copy(aggregateExpressions = agg.aggregateExpressions
            .map(ne => rewriteIn(ne).asInstanceOf[NamedExpression]))
      }
      if (rewritten eq plan) plan
      else {
        // lookupFunction hands back a ScalaAggregator / ScalaUDF with
        // UNRESOLVED encoders — the analyzer steps that normally resolve
        // them have already run, so replay both on the rewritten plan
        val agg = org.apache.spark.sql.execution.aggregate
          .ResolveEncodersInScalaAgg(rewritten)
        session.sessionState.analyzer.ResolveEncodersInUDF(agg)
      }
    }

    private def isTarget(ae: AggregateExpression): Boolean = ae match {
      case AggregateExpression(cnt: Count, _, true, None, _) =>
        cnt.children.size == 1
      case _ => false
    }

    private def hasTarget(e: Expression): Boolean = e.exists {
      case ae: AggregateExpression => isTarget(ae)
      case _ => false
    }

    private def rewriteIn(e: Expression): Expression = e.transformUp {
      case ae: AggregateExpression if isTarget(ae) =>
        replacement(ae.aggregateFunction.children.head).getOrElse(ae)
    }

    /** `cast(round(ds_hll_estimate(ds_hll_sketch(cast(c AS string)))) AS
      * bigint)`, or None when the ds_* functions aren't registered in
      * this session (then the exact aggregate stands).
      */
    private def replacement(c: Expression): Option[Expression] =
      try {
        val arg = if (c.dataType == StringType) c else Cast(c, StringType)
        fn("ds_hll_sketch", Seq(arg)) match {
          case af: AggregateFunction =>
            val est = fn("ds_hll_estimate",
              Seq(af.toAggregateExpression()))
            Some(Cast(Round(est, Literal(0)), LongType))
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }
}
