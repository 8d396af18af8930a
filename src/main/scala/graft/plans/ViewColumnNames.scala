package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Hive names a view's unaliased EXPRESSION columns `_c<position>`
  * (`CREATE VIEW v AS SELECT 10 - key, '12' FROM src` → columns `_c0`,
  * `_c1`), and an explicit alias spelled like an internal name
  * (`` `_c1` ``) is regenerated from the source column (ref ql/parse/
  * SemanticAnalyzer genColListRegex's autogen names; pinned by
  * view_alias.q.out). Spark instead stores the pretty-printed expression
  * (`(10 - key)`), so Hive queries addressing `_c0` break.
  *
  * Front-door rewrite (Engine.sql): a CREATE VIEW with NO explicit
  * column list gets `userSpecifiedColumns` computed by Hive's rule —
  * attributes/stars keep their names, everything else `_c<expanded
  * position>`. The expanded positions come from ANALYZING the view's
  * query (never executing it). Conservative: any shape outside a
  * plain project/aggregate head (or multiple stars) is left to Spark's
  * canonical naming, and analysis failure leaves the statement
  * untouched so the canonical error surfaces.
  */
object ViewColumnNames {

  private val InternalName = """_c\d+""".r

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case cv: CreateView if cv.userSpecifiedColumns.isEmpty =>
        try hiveNames(spark, cv.query) match {
          case Some(names) =>
            cv.copy(userSpecifiedColumns = names.map(n => (n, None)))
          case None => plan
        } catch { case scala.util.control.NonFatal(_) => plan }
      // TEMPORARY views parse straight to the v1 command
      case cv: org.apache.spark.sql.execution.command.CreateViewCommand
          if cv.userSpecifiedColumns.isEmpty =>
        try hiveNames(spark, cv.plan) match {
          case Some(names) =>
            cv.copy(userSpecifiedColumns = names.map(n => (n, None)))
          case None => plan
        } catch { case scala.util.control.NonFatal(_) => plan }
      case _ => plan
    }

  /** The projection head whose items name the view's columns. */
  private def head(p: LogicalPlan): Option[Seq[NamedExpression]] = p match {
    case Project(items, _) => Some(items)
    case Aggregate(_, items, _, _) => Some(items)
    case Sort(_, _, child, _) => head(child)
    case Limit(_, child) => head(child)
    case Distinct(child) => head(child)
    case SubqueryAlias(_, child) => head(child)
    case _ => None
  }

  private def hiveNames(spark: SparkSession,
      query: LogicalPlan): Option[Seq[String]] = {
    val items = head(query).getOrElse(return None)
    if (items.count(_.isInstanceOf[UnresolvedStar]) > 1) return None
    val analyzed = spark.sessionState.executePlan(query).analyzed.output
    val total = analyzed.size
    val starWidth = total - (items.size - 1) // width of the single star
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var changed = false
    items.foreach {
      case _: UnresolvedStar =>
        (0 until starWidth).foreach(_ => out += analyzed(out.size).name)
      case UnresolvedAlias(_: UnresolvedAttribute, _) =>
        out += analyzed(out.size).name
      case _: UnresolvedAttribute =>
        out += analyzed(out.size).name
      case Alias(u: UnresolvedAttribute, name)
          if InternalName.matches(name) =>
        // an internal-looking alias on a PLAIN column reference is
        // discarded — the source column's own name comes back
        // (view_alias.q.out: `key as _c1` stores as `key`); expression
        // aliases keep their spelling even when internal-looking
        // (`'12' as _c121` stores as `_c121`)
        out += u.nameParts.last; changed = true
      case Alias(_, name) => out += name
      case _: UnresolvedAlias => // unaliased expression -> _c<pos>
        out += s"_c${out.size}"; changed = true
      case other => out += analyzed(out.size).name
    }
    if (changed && out.size == total) Some(out.toSeq) else None
  }
}
