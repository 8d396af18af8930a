package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Dense-vector aggregates as single imperative-buffer Aggregators.
  *
  * The alternative — one `avg(element_at(v, i))` expression per dimension —
  * plans dims× aggregate expressions (fine at 64 dims, codegen bloat at
  * 768+). A single Aggregator keeps one buffer of the whole vector per
  * group and one aggregate expression in the plan regardless of
  * dimensionality; partial aggregation (map-side combine) still applies,
  * so only one (sum[], count) buffer per group crosses the shuffle.
  */
object VectorAggregates {

  /** (running element-wise sum, row count). */
  case class VecSum(sum: Array[Double], n: Long)

  class VectorAvg extends Aggregator[Seq[Double], VecSum, Seq[Double]] {
    override def zero: VecSum = VecSum(Array.emptyDoubleArray, 0L)

    override def reduce(b: VecSum, a: Seq[Double]): VecSum = {
      if (a == null) return b
      if (b.sum.isEmpty) {
        val s = new Array[Double](a.length)
        var i = 0; while (i < a.length) { s(i) = a(i); i += 1 }
        VecSum(s, 1L)
      } else {
        require(b.sum.length == a.length,
          s"vector_avg: mixed dimensionality ${b.sum.length} vs ${a.length}")
        var i = 0; while (i < a.length) { b.sum(i) += a(i); i += 1 }
        VecSum(b.sum, b.n + 1L)
      }
    }

    override def merge(x: VecSum, y: VecSum): VecSum = {
      if (x.sum.isEmpty) y
      else if (y.sum.isEmpty) x
      else {
        require(x.sum.length == y.sum.length,
          s"vector_avg: mixed dimensionality ${x.sum.length} vs ${y.sum.length}")
        var i = 0; while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
        VecSum(x.sum, x.n + y.n)
      }
    }

    // SQL avg semantics: an empty group (all-null vectors) yields NULL, not
    // an empty array. NULL vectors are skipped in reduce; individual vector
    // ELEMENTS must be non-null (array<double> with null elements fails the
    // Seq[Double] encoder — filter such vectors upstream).
    override def finish(r: VecSum): Seq[Double] =
      if (r.n == 0L) null
      else { val out = new Array[Double](r.sum.length)
        var i = 0; while (i < r.sum.length) { out(i) = r.sum(i) / r.n; i += 1 }
        out.toSeq }

    override def bufferEncoder: Encoder[VecSum] = ExpressionEncoder[VecSum]()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  private lazy val vectorAvgUdaf = udaf(new VectorAvg, ExpressionEncoder[Seq[Double]]())

  /** Element-wise mean of an array<double> column (cast float arrays first). */
  def vectorAvg(v: Column): Column = vectorAvgUdaf(v)
}
