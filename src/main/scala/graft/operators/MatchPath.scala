package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-sequence pattern matching over ordered partitions — the Spark analog
  * of Hive's `matchpath` PTF (ref ql/src/java/org/apache/hadoop/hive/ql/udf/
  * ptf/MatchPath.java): find runs of rows matching a symbol pattern inside
  * each partition ordered by a time column.
  *
  * Pattern syntax: symbols joined with '.', '*' suffix for zero-or-more,
  * '+' for one-or-more (e.g. "ARRIVE.DELAY+.DEPART"). Symbols are defined by
  * boolean Columns evaluated per row.
  *
  * Scale design (the Spark analog of Hive's spilling PTFPartition /
  * PTFRollingPartition): symbols are evaluated as codegen'd boolean
  * expressions map-side; rows are secondary-sorted — `repartition(pk)` +
  * `sortWithinPartitions(pk, ord)`, where the sort is Spark's external
  * (disk-spilling) sort — and matching runs in `mapPartitions` as a single
  * forward scan holding only the rows of the CURRENT match attempt in
  * memory. A group never materializes whole: the buffer is bounded by the
  * longest single match (for bounded patterns, the pattern length; for
  * unbounded quantifiers, the longest run satisfying the quantified symbol),
  * so one hot partition key cannot OOM an executor. `maxBufferRows` is a
  * guard rail that fails fast with a clear error instead of an executor OOM
  * if a degenerate pattern (e.g. `X*` over a partition where every row is X)
  * tries to buffer more than that.
  */
object MatchPath {

  private[operators] case class Step(symbol: String, min: Int, max: Int) // max = -1 -> unbounded

  private[operators] def parsePattern(pattern: String): Seq[Step] =
    pattern.split("\\.").toSeq.map { tok =>
      if (tok.endsWith("*")) Step(tok.dropRight(1), 0, -1)
      else if (tok.endsWith("+")) Step(tok.dropRight(1), 1, -1)
      else Step(tok, 1, 1)
    }

  /** Streaming matcher over one sorted partition slice: consumes
    * (pk, ord, flags) rows sorted by (pk, ord) and emits
    * (pk, start_ord, end_ord, match_len) for every non-overlapping match
    * (greedy with backtracking — regex semantics, e.g. "DELAY+.DEPART" where
    * the DEPART row also satisfies DELAY yields the last DELAY back).
    * Only rows from the current match attempt onward are buffered; rows the
    * scan has passed are discarded immediately.
    */
  private final class MatchIterator(
      rows: BufferedIterator[(String, Long, Long)],
      steps: IndexedSeq[Step], symIdx: Map[String, Int], maxBufferRows: Int)
    extends Iterator[(String, Long, Long, Int)] {

    private var pk: String = _
    private var started = false
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    private var nextMatch: (String, Long, Long, Int) = _
    private var done = false

    /** Pull rows of the current group until buf(i) exists; false at group end. */
    private def ensure(i: Int): Boolean = {
      while (buf.length <= i && rows.hasNext && rows.head._1 == pk) {
        val r = rows.next()
        buf += ((r._2, r._3))
        if (buf.length > maxBufferRows)
          throw new IllegalStateException(
            s"matchpath buffer exceeded $maxBufferRows rows in one match attempt " +
              s"for partition key '$pk' — pattern run too long; raise maxBufferRows " +
              "or tighten the quantified symbols")
      }
      buf.length > i
    }

    /** Greedy-with-backtracking match anchored at buffer start; returns the
      * exclusive end index (relative to the buffer) or -1. Rows are fetched
      * lazily, so the buffer grows only as far as this attempt needs.
      */
    private def matchFromHead(): Int = {
      def go(pos: Int, si: Int): Int = {
        if (si == steps.length) return pos
        val step = steps(si)
        val idx = symIdx(step.symbol)
        var maxRun = 0
        while ((step.max < 0 || maxRun < step.max) && ensure(pos + maxRun) &&
          ((buf(pos + maxRun)._2 >>> idx) & 1L) == 1L) maxRun += 1
        var take = maxRun
        while (take >= step.min) {
          val r = go(pos + take, si + 1)
          if (r >= 0) return r
          take -= 1
        }
        -1
      }
      go(0, 0)
    }

    private def advance(): Unit = {
      while (true) {
        if (!ensure(0)) {
          if (!rows.hasNext) { done = true; return }
          pk = rows.head._1 // next group begins
          started = true
        } else {
          val end = matchFromHead()
          if (end > 0) {
            nextMatch = (pk, buf(0)._1, buf(end - 1)._1, end)
            buf.remove(0, end) // non-overlapping matches, Hive semantics
            return
          } else buf.remove(0) // no match here: slide the scan forward one row
        }
      }
    }

    override def hasNext: Boolean = {
      if (!done && nextMatch == null) {
        if (!started) { // first call: position on the first group, if any
          if (!rows.hasNext) { done = true; return false }
          pk = rows.head._1
          started = true
        }
        advance()
      }
      !done
    }

    override def next(): (String, Long, Long, Int) = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextMatch
      nextMatch = null
      r
    }
  }

  /** Returns one row per match: partition key, match start/end order values,
    * match length. `symbols` maps symbol name -> boolean predicate column.
    */
  def matchpath(df: DataFrame, partitionCol: String, orderCol: String,
      symbols: Seq[(String, org.apache.spark.sql.Column)],
      pattern: String, maxBufferRows: Int = 4 << 20): DataFrame = {
    val spark = df.sparkSession
    val steps = parsePattern(pattern).toIndexedSeq
    val symIdx = symbols.map(_._1).zipWithIndex.toMap
    require(steps.forall(s => symIdx.contains(s.symbol)),
      s"pattern references undefined symbols: $pattern")

    require(symbols.size <= 64, s"matchpath supports at most 64 symbols, got ${symbols.size}")
    // symbol flags pack into ONE long bitmask (codegen'd map-side): the
    // typed boundary into the matcher then deserializes three primitives
    // per row instead of a boxed Seq[Boolean] + per-row Array copy (r17 —
    // the PTF's per-row hot path at 100 TB is exactly this decode)
    val packed = symbols.zipWithIndex.map { case ((_, c), i) =>
      when(coalesce(c, lit(false)), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val flagged = df.select(
      col(partitionCol).cast("string").as("__pk"),
      col(orderCol).cast("long").as("__ord"),
      packed.as("__syms"))

    import spark.implicits._
    flagged
      .as[(String, Long, Long)]
      .repartition(col("__pk"))
      .sortWithinPartitions(col("__pk"), col("__ord"))
      .mapPartitions { it =>
        new MatchIterator(it.buffered, steps, symIdx, maxBufferRows)
      }
      .toDF("pk", "start_ord", "end_ord", "match_len")
  }
}
