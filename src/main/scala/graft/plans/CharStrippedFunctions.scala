package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Hive's CHAR(n) function-argument contract: a char value reaching a
  * UDF is the STRIPPED value — `length(c CHAR(20))` of 'val_238' is 7,
  * `concat(c3, c4)` is '238val_238' with no pad runs (ref
  * common/type/HiveChar.java getStrippedValue + serde2 ObjectInspector
  * conversion; char_udf1.q is the qtest). Comparisons stay
  * pad-insensitive and bare projections display the blank-padded value
  * in BOTH systems. Spark instead pads char columns on read
  * (ApplyCharTypePadding), so every string function sees the padding —
  * `length` answers 20 and concat carries the blanks.
  *
  * Front-door step (Engine.sql, post-analysis): analyze the statement;
  * if any attribute carries char metadata, wrap char-typed attribute
  * references that sit in FUNCTION-ARGUMENT position with `rtrim`.
  * Positions that keep the padded value, matching Hive: bare
  * projections (display), comparison operands and IN lists (both
  * engines are pad-insensitive there natively), sort keys, and
  * grouping keys at the root. Statements with no char columns return
  * the original plan untouched (same-instance fast path).
  */
object CharStrippedFunctions {

  /** Spark's metadata marker for char/varchar-typed string columns. */
  private val Key = "__CHAR_VARCHAR_TYPE_STRING"

  private def isCharAttr(e: Expression): Boolean = e match {
    case a: Attribute => a.metadata.contains(Key) &&
      a.metadata.getString(Key).startsWith("char(")
    case _ => false
  }

  private val CharLen = """char\((\d+)\)""".r

  private def charLen(e: Expression): Option[Int] = e match {
    case a: Attribute if a.metadata.contains(Key) =>
      a.metadata.getString(Key) match {
        case CharLen(n) => Some(n.toInt)
        case _ => None
      }
    case _ => None
  }

  /** Hive's UNION type negotiation for char legs (ref char_union1.q.out):
    * all-char legs unify to char(MAX) — every value re-pads to the max
    * length — while a char leg meeting a plain STRING leg unifies to
    * STRING with the char values STRIPPED (string legs keep their exact
    * spelling). Spark unions the padded strings as-read, so a char(10)
    * leg under a char(20) union keeps 10-width padding and a
    * char-vs-string union renders padded. Per-leg Projects adjust the
    * values; when the FIRST leg changes, a re-aliasing Project above the
    * Union pins the original output exprIds so the resolved parents stay
    * valid.
    */
  private def fixCharUnion(
      u: org.apache.spark.sql.catalyst.plans.logical.Union):
      LogicalPlan = {
    if (u.children.size < 2) return u
    val outs = u.children.map(_.output)
    if (outs.map(_.size).distinct.size != 1) return u
    val width = outs.head.size
    // per-position decision: Left(maxLen) = all-char pad-to-max;
    // Right(()) = mixed char/string strip; None = untouched
    val actions: Seq[Option[scala.util.Either[Int, Unit]]] = (0 until width).map { i =>
      val lens = outs.map(o => charLen(o(i)))
      if (!lens.exists(_.isDefined)) None
      else if (lens.forall(_.isDefined)) {
        val ls = lens.flatten
        if (ls.distinct.size <= 1) None else Some(scala.util.Left(ls.max))
      } else Some(scala.util.Right(()))
    }
    if (actions.forall(_.isEmpty)) return u
    val newChildren = u.children.map { child =>
      var changed = false
      val items = child.output.zipWithIndex.map { case (a, i) =>
        actions(i) match {
          case Some(scala.util.Left(max)) if charLen(a).exists(_ != max) =>
            changed = true
            Alias(StringRPad(a, Literal(max), Literal(" ")), a.name)()
          case Some(scala.util.Right(())) if isCharAttr(a) =>
            changed = true
            Alias(StringTrimRight(a), a.name)()
          case _ => a
        }
      }
      if (changed)
        org.apache.spark.sql.catalyst.plans.logical.Project(items, child)
      else child
    }
    if (newChildren.zip(u.children).forall { case (a, b) => a eq b }) return u
    val newUnion = u.withNewChildren(newChildren)
    // re-pin the original output ids (parents reference them)
    org.apache.spark.sql.catalyst.plans.logical.Project(
      u.output.zip(newUnion.asInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Union].output).map {
        case (orig, n) =>
          Alias(n, orig.name)(exprId = orig.exprId,
            explicitMetadata = Some(orig.metadata))
      }, newUnion)
  }

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    // cheap gate before the (analysis-priced) metadata check: char
    // metadata can only flow from CATALOG tables — a statement whose
    // relations are all temp views (the engine's registered parquet
    // tables) cannot see a char column, and that is the overwhelming
    // statement population. Qualified names and unknown names fall
    // through to the real check.
    val catalog = spark.sessionState.catalog
    val refs = plan.collectWithSubqueries {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier
    }
    val touchesCatalog = refs.exists { id =>
      id.size > 1 || catalog.getTempView(id.last).isEmpty
    }
    if (!touchesCatalog) return plan
    val analyzed =
      try spark.sessionState.executePlan(plan).analyzed
      catch { case scala.util.control.NonFatal(_) => return plan }
    val hasChar = analyzed.exists(p =>
      p.expressions.exists(_.exists(isCharAttr)))
    if (!hasChar) return plan
    analyzed.transformUpWithSubqueries {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
        fixCharUnion(u)
      case p =>
        var changed = false
        val next = p.mapExpressions { e =>
          val r = strip(e, underFn = false)
          if (!(r eq e)) changed = true
          r
        }
        if (changed) next else p
    }
  }

  private def strip(e: Expression, underFn: Boolean): Expression = e match {
    case a: Attribute if underFn && isCharAttr(a) => StringTrimRight(a)
    case a: Attribute => a
    case al: Alias =>
      val c = strip(al.child, underFn)
      if (c eq al.child) al else al.withNewChildren(Seq(c))
    // pad-insensitive positions: the padded values compare/sort/probe
    // identically, so the attrs stay bare (and plans stay prunable).
    // EXCEPTION (r17, char_join1.q): a char compared against a PLAIN
    // STRING column uses the STRIPPED char in Hive ('abc' char(10)
    // meets string 'abc'), where Spark's padding makes them unequal —
    // the char side rtrims when, and only when, the other side is a
    // non-char string expression (char-vs-char and char-vs-literal
    // keep Spark's pad-both comparison, which already matches Hive).
    case c: BinaryComparison
        if isCharAttr(c.left) != isCharAttr(c.right) &&
          // the non-char side must be truly char-FREE: Spark pads a
          // shorter char with StringRPad when lengths differ, and that
          // wrapped side must keep the pad-both comparison
          !(if (isCharAttr(c.left)) c.right else c.left)
            .exists(isCharAttr) &&
          c.left.dataType == org.apache.spark.sql.types.StringType &&
          c.right.dataType == org.apache.spark.sql.types.StringType &&
          !c.left.isInstanceOf[Literal] && !c.right.isInstanceOf[Literal] =>
      c.withNewChildren(Seq(
        if (isCharAttr(c.left)) StringTrimRight(c.left) else c.left,
        if (isCharAttr(c.right)) StringTrimRight(c.right) else c.right))
    case c: BinaryComparison => mapAt(c, underFn = false)
    case i: In => mapAt(i, underFn = false)
    case i: InSet => i
    case s: SortOrder => mapAt(s, underFn = false)
    // value-preserving aggregates answer the PADDED char in Hive
    // (char_udf1.q.out: max(c4) is 'val_238             ')
    case m: aggregate.Max => mapAt(m, underFn = false)
    case m: aggregate.Min => mapAt(m, underFn = false)
    case f: aggregate.First => mapAt(f, underFn = false)
    case l: aggregate.Last => mapAt(l, underFn = false)
    case c: aggregate.CollectSet => mapAt(c, underFn = false)
    case c: aggregate.CollectList => mapAt(c, underFn = false)
    case other => mapAt(other, underFn = true)
  }

  private def mapAt(e: Expression, underFn: Boolean): Expression = {
    var changed = false
    val next = e.mapChildren { c =>
      val r = strip(c, underFn)
      if (!(r eq c)) changed = true
      r
    }
    if (changed) next else e
  }
}
