package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared MERGE semantics for the COW planners ([[Dml.merge]],
  * `Snapshots.merge`): the standard multi-arm statement
  *
  * {{{
  * MERGE INTO t USING s ON t.k = s.k
  *   WHEN MATCHED [AND c1] THEN UPDATE SET ... | DELETE      (ordered arms)
  *   WHEN NOT MATCHED [AND ci] THEN INSERT ...               (one arm)
  *   WHEN NOT MATCHED BY SOURCE [AND cj] THEN UPDATE | DELETE (ordered arms)
  * }}}
  *
  * lowered to ONE full-outer join + a single projection/filter — the same
  * declarative rewrite the reference performs to a multi-insert (ref
  * ql/src/java/org/apache/hadoop/hive/ql/parse/MergeSemanticAnalyzer.java:46),
  * with first-matching-arm-wins selection encoded as a CASE over an arm
  * index. Arm conditions and update expressions evaluate in the joined
  * scope: source columns by their plain names, target columns under the
  * `__t_` prefix (see [[targetSide]]).
  */
private[plans] object MergeEngine {

  /** The joined-scope name of target column `c`. */
  def targetSide(c: String): String = "__t_" + c

  sealed trait MatchedArm { def condition: Option[Column] }
  /** WHEN [NOT] MATCHED [BY SOURCE] [AND cond] THEN UPDATE SET set. */
  final case class Update(condition: Option[Column], set: Map[String, Column])
    extends MatchedArm
  /** WHEN [NOT] MATCHED [BY SOURCE] [AND cond] THEN DELETE. */
  final case class Delete(condition: Option[Column]) extends MatchedArm

  /** WHEN NOT MATCHED [AND cond] THEN INSERT (whole source row by name). */
  final case class Insert(condition: Option[Column])

  final case class Spec(
      matched: Seq[MatchedArm] = Nil,
      insert: Option[Insert] = None,
      notMatchedBySource: Seq[MatchedArm] = Nil) {
    def touchesUnmatchedTargets: Boolean = notMatchedBySource.nonEmpty
  }

  /** Desugar the single-arm convenience parameters the planners expose. */
  def specOf(whenMatchedSet: Map[String, Column], whenMatchedDelete: Boolean,
      insertUnmatched: Boolean): Spec = Spec(
    matched =
      if (whenMatchedDelete) Seq(Delete(None))
      else if (whenMatchedSet.nonEmpty) Seq(Update(None, whenMatchedSet))
      else Nil,
    insert = if (insertUnmatched) Some(Insert(None)) else None)

  /** Post-image of `target ⟗ source`: every surviving row of the merged
    * target. `cols` is the target schema's column order; the source must
    * carry `sourceKey`, plus every target column when an insert arm exists.
    * `sourceKeysUnique` skips the standard cardinality guard (>1 source row
    * matching one target row fails the statement in-job).
    */
  def postImage(target: DataFrame, source: DataFrame, targetKey: String,
      sourceKey: String, cols: Seq[String], spec: Spec,
      sourceKeysUnique: Boolean): DataFrame = {
    val srcCols = source.columns.toSet
    require(srcCols.contains(sourceKey),
      s"source must carry the merge key $sourceKey")
    if (spec.insert.isDefined) {
      val missing = cols.filterNot(srcCols)
      require(missing.isEmpty,
        s"MERGE with an insert arm needs source columns ${missing.mkString(", ")}")
    }
    def tc(c: String): Column = col(targetSide(c))

    val guarded =
      if (sourceKeysUnique) source
      else source.withColumn("__src_cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(sourceKey))))
    val tRen = target.select(cols.map(c => col(c).as(targetSide(c))): _*)
    val joined = tRen.join(guarded, tc(targetKey) === col(sourceKey), "full_outer")

    val matched = tc(targetKey).isNotNull && col(sourceKey).isNotNull
    val sourceOnly = tc(targetKey).isNull && col(sourceKey).isNotNull
    val checked =
      if (sourceKeysUnique) joined
      else joined.filter(when(matched && col("__src_cnt") > 1,
        raise_error(concat(
          lit(s"MERGE cardinality violation: multiple source rows match target $sourceKey="),
          col(sourceKey).cast("string")))).isNull)

    // first-matching-arm-wins: arm index 0 = no arm applies (row unchanged);
    // the when-chain is built in arm order so the FIRST true condition wins
    def armIndex(arms: Seq[MatchedArm], scope: Column): Column = {
      val chain = arms.zipWithIndex.foldLeft(Option.empty[Column]) {
        case (acc, (arm, i)) =>
          val c = scope && arm.condition.getOrElse(lit(true))
          Some(acc.map(_.when(c, i + 1)).getOrElse(when(c, i + 1)))
      }
      chain.map(_.otherwise(0)).getOrElse(lit(0))
    }
    val mIdx = armIndex(spec.matched, matched)
    val nIdx = armIndex(spec.notMatchedBySource, tc(targetKey).isNotNull && col(sourceKey).isNull)

    def deleteIdxs(arms: Seq[MatchedArm]): Seq[Int] =
      arms.zipWithIndex.collect { case (_: Delete, i) => i + 1 }
    def surviving(idx: Column, arms: Seq[MatchedArm]): Column =
      deleteIdxs(arms) match {
        case Nil => lit(true)
        case del => !idx.isin(del.map(Integer.valueOf): _*)
      }

    val insertCond = spec.insert match {
      case None => lit(false)
      case Some(Insert(c)) => c.getOrElse(lit(true))
    }
    val alive = when(sourceOnly, insertCond)
      .when(matched, surviving(mIdx, spec.matched))
      .otherwise(surviving(nIdx, spec.notMatchedBySource))

    def armValue(idx: Column, arms: Seq[MatchedArm], c: String): Column =
      arms.zipWithIndex.foldLeft(tc(c)) {
        case (acc, (Update(_, set), i)) if set.contains(c) =>
          when(idx === (i + 1), set(c)).otherwise(acc)
        case (acc, _) => acc
      }
    val projection = cols.map { c =>
      val insVal = if (srcCols(c)) col(c) else tc(c) // tc: unreachable filler
      when(sourceOnly, insVal)
        .when(matched, armValue(mIdx, spec.matched, c))
        .otherwise(armValue(nIdx, spec.notMatchedBySource, c))
        .as(c)
    }
    // conform to the target's declared types: inserted source columns and
    // SET expressions may carry different (castable) types, and a staged
    // file whose physical type disagrees with the table schema is silent
    // corruption at read time
    val types = target.schema.fields.map(f => f.name -> f.dataType).toMap
    checked.filter(alive).select(projection: _*)
      .select(cols.map(c => col(c).cast(types(c)).as(c)): _*)
  }
}
