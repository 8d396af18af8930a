package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** DataSketches-backed aggregates (ref ql/src/java/org/apache/hadoop/hive/ql/
  * exec/DataSketchesFunctions.java:316-360 — Hive exposes the hll/cpc/theta/
  * kll families; this engine exposes the two workhorses on the
  * datasketches-java library Spark already ships).
  *
  * Buffers hold LIVE sketch objects: Spark's udaf wrapper
  * (ScalaAggregator, a TypedImperativeAggregate) keeps the buffer
  * deserialized between update calls, so per-row work is one sketch update;
  * the encoder (sketch bytes) runs only at partial-output/shuffle
  * boundaries — KBs per partition regardless of input size, the canonical
  * 100 TB-safe approximate aggregation shape.
  */
object SketchAggregates {

  /** Mutable holder serialized as compact sketch bytes. */
  final class KllBuf(var p: Double, var sk: KllDoublesSketch) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.writeDouble(p)
      val bytes = if (sk == null) Array.empty[Byte] else sk.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      p = in.readDouble()
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sk = if (n == 0) null else KllDoublesSketch.heapify(Memory.wrap(bytes))
    }
  }

  /** kll_quantile(value, p): KLL-sketch quantile estimate. */
  class KllQuantile extends Aggregator[(Double, Double), KllBuf, Double] {
    def zero: KllBuf = new KllBuf(0.5, null)
    def reduce(b: KllBuf, in: (Double, Double)): KllBuf = {
      if (b.sk == null) b.sk = KllDoublesSketch.newHeapInstance(200)
      b.sk.update(in._1)
      b.p = in._2
      b
    }
    def merge(a: KllBuf, b: KllBuf): KllBuf = {
      val p = if (b.sk != null) b.p else a.p
      if (a.sk == null) { b.p = p; return b }
      if (b.sk != null) a.sk.merge(b.sk)
      a.p = p
      a
    }
    def finish(b: KllBuf): Double =
      if (b.sk == null) Double.NaN
      else b.sk.getQuantile(b.p, QuantileSearchCriteria.INCLUSIVE)
    def bufferEncoder: Encoder[KllBuf] = Encoders.javaSerialization[KllBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Mutable theta-union holder serialized as compact sketch bytes. */
  final class ThetaBuf(var sk: UpdateSketch, var merged: Union) extends Serializable {
    def result: org.apache.datasketches.theta.CompactSketch = {
      if (merged == null) merged = SetOperation.builder().buildUnion()
      if (sk != null) { merged.union(sk.compact()); sk = null }
      merged.getResult
    }
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = result.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sk = null
      merged = SetOperation.builder().buildUnion()
      merged.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    }
  }

  /** theta_count_distinct(x): theta-sketch distinct estimate (long). */
  class ThetaDistinct extends Aggregator[String, ThetaBuf, Long] {
    def zero: ThetaBuf = new ThetaBuf(null, null)
    def reduce(b: ThetaBuf, x: String): ThetaBuf = {
      if (b.sk == null) b.sk = UpdateSketch.builder().build()
      if (x != null) b.sk.update(x)
      b
    }
    def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = {
      if (a.sk == null && a.merged == null) return b
      if (b.sk == null && b.merged == null) return a
      if (a.merged == null) a.merged = SetOperation.builder().buildUnion()
      a.merged.union(b.result)
      if (a.sk != null) { a.merged.union(a.sk.compact()); a.sk = null }
      a
    }
    def finish(b: ThetaBuf): Long =
      if (b.sk == null && b.merged == null) 0L
      else math.round(b.result.getEstimate)
    def bufferEncoder: Encoder[ThetaBuf] = Encoders.javaSerialization[ThetaBuf]
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
