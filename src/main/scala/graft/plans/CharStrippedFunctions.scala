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
    analyzed.transformUpWithSubqueries { case p =>
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
