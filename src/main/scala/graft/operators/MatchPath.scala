package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-sequence pattern matching over ordered partitions — the Spark analog
  * of Hive's `matchpath` PTF (ref ql/src/java/org/apache/hadoop/hive/ql/udf/
  * ptf/MatchPath.java): find runs of rows matching a symbol pattern inside
  * each partition ordered by a time column.
  *
  * Pattern syntax: symbols joined with '.', '*' suffix for zero-or-more,
  * '+' for one-or-more (e.g. "ARRIVE.DELAY+.DEPART"). Symbols are defined by
  * boolean Columns evaluated per row.
  *
  * Implementation: symbols are evaluated as codegen'd boolean expressions
  * map-side; the per-partition scan runs in groupByKey/flatMapGroups with
  * rows sorted by the order column — one shuffle on the partition key, linear
  * scan per group, no full-partition materialization beyond the group (same
  * execution shape as Hive's PTFPartition, but distributed by Spark).
  */
object MatchPath {

  private[operators] case class Step(symbol: String, min: Int, max: Int) // max = -1 -> unbounded

  private[operators] def parsePattern(pattern: String): Seq[Step] =
    pattern.split("\\.").toSeq.map { tok =>
      if (tok.endsWith("*")) Step(tok.dropRight(1), 0, -1)
      else if (tok.endsWith("+")) Step(tok.dropRight(1), 1, -1)
      else Step(tok, 1, 1)
    }

  /** Greedy-with-backtracking match of the step sequence starting at
    * `start` (regex semantics: a quantified run yields rows back when the
    * next step cannot otherwise match, e.g. "DELAY+.DEPART" where the DEPART
    * row also satisfies DELAY). Returns the exclusive end index, or -1.
    */
  private[operators] def matchAt(flags: Array[Array[Boolean]], start: Int,
      steps: Seq[Step], symIdx: Map[String, Int]): Int = {
    def go(pos: Int, si: Int): Int = {
      if (si == steps.length) return pos
      val step = steps(si)
      val idx = symIdx(step.symbol)
      var maxRun = 0
      while (pos + maxRun < flags.length && flags(pos + maxRun)(idx) &&
        (step.max < 0 || maxRun < step.max)) maxRun += 1
      var take = maxRun
      while (take >= step.min) {
        val r = go(pos + take, si + 1)
        if (r >= 0) return r
        take -= 1
      }
      -1
    }
    go(start, 0)
  }

  /** Returns one row per match: partition key, match start/end order values,
    * match length. `symbols` maps symbol name -> boolean predicate column.
    */
  def matchpath(df: DataFrame, partitionCol: String, orderCol: String,
      symbols: Seq[(String, org.apache.spark.sql.Column)],
      pattern: String): DataFrame = {
    val spark = df.sparkSession
    val steps = parsePattern(pattern)
    val symIdx = symbols.map(_._1).zipWithIndex.toMap
    require(steps.forall(s => symIdx.contains(s.symbol)),
      s"pattern references undefined symbols: $pattern")

    val flagged = df.select(
      col(partitionCol).cast("string").as("__pk"),
      col(orderCol).cast("long").as("__ord"),
      array(symbols.map { case (_, c) => coalesce(c, lit(false)) }: _*).as("__syms"))

    import spark.implicits._
    val matched = flagged
      .as[(String, Long, Seq[Boolean])]
      .groupByKey(_._1)
      .flatMapGroups { (pk, rows) =>
        val sorted = rows.toArray.sortBy(_._2)
        val flags = sorted.map(_._3.toArray)
        val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Int)]()
        var i = 0
        while (i < sorted.length) {
          val end = matchAt(flags, i, steps, symIdx)
          if (end > i) {
            out += ((pk, sorted(i)._2, sorted(end - 1)._2, end - i))
            i = end // non-overlapping matches, Hive semantics
          } else i += 1
        }
        out.iterator
      }
      .toDF("pk", "start_ord", "end_ord", "match_len")
    matched
  }
}
