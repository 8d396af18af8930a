package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project}
import org.apache.spark.sql.types.StructField

/** Hive's INSERT coerces the projection to the destination schema with
  * its ordinary implicit casts — `INSERT ... SELECT src.key` lands a
  * STRING key in an INT column as a cast (NULL on garbage), exactly like
  * a SELECT-side comparison would (ref ql/parse/SemanticAnalyzer
  * genConversionSelectOperator; every `dest1(key INT)` insert in the
  * input*.q corpus relies on it). Spark's default ANSI store assignment
  * refuses the statement instead, and the LEGACY policy that would allow
  * it is banned for DSv2 writes — so the leniency can't be a session
  * conf.
  *
  * Front-door rewrite (Engine.sql): every InsertIntoStatement whose
  * query's output types differ castably from the destination's expected
  * input schema (data columns minus static partitions, then dynamic
  * partition columns) gains an explicit Project of casts. Non-ANSI
  * session semantics make those casts Hive's (NULL on overflow/garbage).
  * Conservative: by-name inserts, user column lists, unknown tables,
  * arity mismatches and non-castable pairs are left untouched — Spark's
  * canonical error surfaces.
  */
object LenientInsertCasts {

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan transformDown {
      case i: InsertIntoStatement
          if i.userSpecifiedCols.isEmpty && !i.byName =>
        try rewrite(spark, i) catch {
          case scala.util.control.NonFatal(_) => i
        }
    }

  private def expectedFields(spark: SparkSession,
      i: InsertIntoStatement): Option[Seq[StructField]] = i.table match {
    case r: UnresolvedRelation if r.multipartIdentifier.size <= 2 =>
      val ident = r.multipartIdentifier match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
      }
      val cat = spark.sessionState.catalog
      if (cat.isTempView(ident.nameParts) || !cat.tableExists(ident))
        return None
      val meta = cat.getTableMetadata(ident)
      val partCols = meta.partitionColumnNames
      val static = i.partitionSpec.collect {
        case (k, Some(_)) => k.toLowerCase
      }.toSet
      val data = meta.schema.filterNot(f =>
        partCols.exists(_.equalsIgnoreCase(f.name)))
      val dynParts = partCols.filterNot(p => static.contains(p.toLowerCase))
        .flatMap(p => meta.schema.find(_.name.equalsIgnoreCase(p)))
      Some(data ++ dynParts)
    case _ => None
  }

  private def rewrite(spark: SparkSession,
      i: InsertIntoStatement): InsertIntoStatement = {
    val expected = expectedFields(spark, i).getOrElse(return i)
    val out = spark.sessionState.executePlan(i.query).analyzed.output
    if (out.size != expected.size) return i
    val needsCast = out.zip(expected).exists { case (a, f) =>
      a.dataType != f.dataType }
    if (!needsCast) return i
    if (!out.zip(expected).forall { case (a, f) =>
      a.dataType == f.dataType || Cast.canCast(a.dataType, f.dataType) })
      return i
    // the cast projection goes over the ANALYZED query (an already-
    // resolved subtree is legal inside an unresolved statement), so the
    // casts bind positionally to the exact output attributes
    val analyzed = spark.sessionState.executePlan(i.query).analyzed
    val casted = Project(
      analyzed.output.zip(expected).map { case (a, f) =>
        if (a.dataType == f.dataType) a
        else Alias(Cast(a, f.dataType), f.name)()
      }, analyzed)
    i.copy(query = casted)
  }
}
