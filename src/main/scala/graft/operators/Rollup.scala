package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouping-sets via pre-aggregation.
  *
  * Spark (like Hive's GroupByOperator grouping-sets mode, ref
  * ql/src/java/org/apache/hadoop/hive/ql/exec/GroupByOperator.java:131,230-234)
  * evaluates GROUPING SETS by expanding every input row once per set and
  * aggregating the multiplied stream: N sets → N× the scan feeding the
  * aggregate. At 100 TB that multiplier is the whole game — so this operator
  * aggregates ONCE at the finest grain (the union of all set keys), then rolls
  * each set up from the tiny pre-aggregate. Decomposable aggregates only:
  * sum→sum of sums, count→sum of counts, min/max→min/max of min/maxes (avg =
  * sum/count downstream). The N rollups share the pre-aggregate's shuffle via
  * Spark's exchange reuse.
  */
object Rollup {

  sealed trait Kind
  case object SumAgg extends Kind
  case object CountAgg extends Kind
  case object MinAgg extends Kind
  case object MaxAgg extends Kind

  /** One output aggregate: `name` in the result, computed as `kind` of `expr`. */
  final case class Agg(name: String, expr: Column, kind: Kind)

  /** GROUP BY GROUPING SETS (sets...) over `keys` (the union of all set
    * columns), emitting each key column (null outside its sets), a
    * `grouping_<key>` 0/1 flag per key, and the aggregates.
    */
  def groupingSets(df: DataFrame, keys: Seq[String], sets: Seq[Seq[String]],
      aggs: Seq[Agg]): DataFrame = {
    require(sets.nonEmpty && sets.forall(_.forall(keys.contains)),
      s"every set column must be in keys=$keys")
    val keyTypes = keys.map(k => k -> df.schema(k).dataType).toMap

    // one fine-grain partial aggregate over all keys
    val pre = df.groupBy(keys.map(col): _*).agg(
      aggs.head.kind.pre(aggs.head).as(s"_pre_${aggs.head.name}"),
      aggs.tail.map(a => a.kind.pre(a).as(s"_pre_${a.name}")): _*)

    // each grouping set rolls up from the pre-aggregate
    val branches = sets.map { set =>
      val rolled =
        if (set.isEmpty)
          pre.agg(aggs.head.kind.merge(aggs.head).as(aggs.head.name),
            aggs.tail.map(a => a.kind.merge(a).as(a.name)): _*)
        else
          pre.groupBy(set.map(col): _*).agg(
            aggs.head.kind.merge(aggs.head).as(aggs.head.name),
            aggs.tail.map(a => a.kind.merge(a).as(a.name)): _*)
      val keyCols = keys.map { k =>
        if (set.contains(k)) col(k) else lit(null).cast(keyTypes(k)).as(k)
      }
      val flagCols = keys.map { k =>
        lit(if (set.contains(k)) 0 else 1).as(s"grouping_$k")
      }
      rolled.select(keyCols ++ flagCols ++ aggs.map(a => col(a.name)): _*)
    }
    branches.reduce(_.unionByName(_))
  }

  implicit private class KindOps(val kind: Kind) extends AnyVal {
    /** fine-grain partial */
    def pre(a: Agg): Column = kind match {
      case SumAgg => sum(a.expr)
      case CountAgg => count(a.expr)
      case MinAgg => min(a.expr)
      case MaxAgg => max(a.expr)
    }
    /** rollup of partials (operates on `_pre_<name>`) */
    def merge(a: Agg): Column = kind match {
      case SumAgg => sum(col(s"_pre_${a.name}"))
      // sum-of-counts over an empty pre-aggregate is NULL, but count over
      // empty input is 0 — coalesce keeps the global (empty-set) branch
      // faithful to native count semantics
      case CountAgg => coalesce(sum(col(s"_pre_${a.name}")), lit(0L))
      case MinAgg => min(col(s"_pre_${a.name}"))
      case MaxAgg => max(col(s"_pre_${a.name}"))
    }
  }
}
