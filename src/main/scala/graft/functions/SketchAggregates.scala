package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** DataSketches-backed aggregates (ref ql/src/java/org/apache/hadoop/hive/ql/
  * exec/DataSketchesFunctions.java:316-360 — Hive exposes the hll/cpc/theta/
  * kll families; this engine exposes the two workhorses on the
  * datasketches-java library Spark already ships).
  *
  * Sketches are mergeable by construction, so these aggregate with proper
  * partial/merge semantics: each partition builds a sketch, the shuffle
  * carries serialized sketch bytes (KBs regardless of input size), and
  * quantile/distinct estimates come out at the driver — the canonical
  * 100 TB-safe approximate aggregation shape.
  */
object SketchAggregates {

  /** kll_quantile(value, p): KLL-sketch quantile estimate. The requested
    * quantile p travels in the buffer so partial/merge works across
    * executors.
    */
  class KllQuantile extends Aggregator[(Double, Double), (Double, Array[Byte]), Double] {
    def zero: (Double, Array[Byte]) = (0.5, Array.empty)
    private def sk(b: Array[Byte]): KllDoublesSketch =
      if (b.isEmpty) KllDoublesSketch.newHeapInstance(200)
      else KllDoublesSketch.heapify(Memory.wrap(b))
    def reduce(b: (Double, Array[Byte]), in: (Double, Double)): (Double, Array[Byte]) = {
      val s = sk(b._2)
      s.update(in._1)
      (in._2, s.toByteArray)
    }
    def merge(a: (Double, Array[Byte]), b: (Double, Array[Byte])): (Double, Array[Byte]) = {
      val p = if (b._2.nonEmpty) b._1 else a._1
      if (a._2.isEmpty) return (p, b._2)
      if (b._2.isEmpty) return (p, a._2)
      val s = sk(a._2)
      s.merge(KllDoublesSketch.heapify(Memory.wrap(b._2)))
      (p, s.toByteArray)
    }
    def finish(b: (Double, Array[Byte])): Double =
      if (b._2.isEmpty) Double.NaN
      else sk(b._2).getQuantile(b._1, QuantileSearchCriteria.INCLUSIVE)
    def bufferEncoder: Encoder[(Double, Array[Byte])] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.BINARY)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** theta_count_distinct(x): theta-sketch distinct estimate (long). */
  class ThetaDistinct extends Aggregator[String, Array[Byte], Long] {
    def zero: Array[Byte] = Array.empty
    def reduce(b: Array[Byte], x: String): Array[Byte] = {
      val s = UpdateSketch.builder().build()
      if (x != null) s.update(x)
      if (b.isEmpty) s.compact().toByteArray
      else {
        val u = SetOperation.builder().buildUnion()
        u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
        u.union(s.compact())
        u.getResult.toByteArray
      }
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val u = SetOperation.builder().buildUnion()
      u.union(Sketches.wrapCompactSketch(Memory.wrap(a)))
      u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
      u.getResult.toByteArray
    }
    def finish(b: Array[Byte]): Long =
      if (b.isEmpty) 0L
      else math.round(Sketches.wrapCompactSketch(Memory.wrap(b)).getEstimate)
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("kll_quantile",
      org.apache.spark.sql.functions.udaf(new KllQuantile,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)))
    spark.udf.register("theta_count_distinct",
      org.apache.spark.sql.functions.udaf(new ThetaDistinct, Encoders.STRING))
  }
}
