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

  // ------------------------------------------------------ hll family
  // ref DataSketchesFunctions.java:316-360 — the ds_hll_* family with
  // SKETCH-TO-SKETCH union, the shape that matters at 100 TB: partitions
  // (or days) pre-aggregate to KB-sized sketches, and distinct-count
  // roll-ups union the SKETCHES — never re-scanning rows.

  /** Mutable HLL holder serialized as compact sketch bytes. */
  final class HllBuf(var sk: org.apache.datasketches.hll.HllSketch)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = if (sk == null) Array.empty[Byte] else sk.toCompactByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sk = if (n == 0) null
        else org.apache.datasketches.hll.HllSketch.heapify(Memory.wrap(bytes))
    }
  }

  private val HllLgK = 12 // the library default: ~1.6% RSE, 2.5 KB dense

  /** ds_hll_sketch(x): HLL sketch of the values, as bytes. */
  class HllSketchAgg extends Aggregator[String, HllBuf, Array[Byte]] {
    def zero: HllBuf = new HllBuf(null)
    def reduce(b: HllBuf, x: String): HllBuf = {
      if (b.sk == null)
        b.sk = new org.apache.datasketches.hll.HllSketch(HllLgK)
      if (x != null) b.sk.update(x)
      b
    }
    def merge(a: HllBuf, b: HllBuf): HllBuf = {
      if (a.sk == null) return b
      if (b.sk == null) return a
      val u = new org.apache.datasketches.hll.Union(HllLgK)
      u.update(a.sk); u.update(b.sk)
      a.sk = u.getResult
      a
    }
    def finish(b: HllBuf): Array[Byte] =
      (if (b.sk == null) new org.apache.datasketches.hll.HllSketch(HllLgK)
       else b.sk).toCompactByteArray
    def bufferEncoder: Encoder[HllBuf] = Encoders.javaSerialization[HllBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** ds_hll_union(sketch): union of PRE-BUILT hll sketches, as bytes. */
  class HllUnionAgg extends Aggregator[Array[Byte], HllBuf, Array[Byte]] {
    private def asUnion(b: HllBuf): org.apache.datasketches.hll.Union = {
      val u = new org.apache.datasketches.hll.Union(HllLgK)
      if (b.sk != null) u.update(b.sk)
      u
    }
    def zero: HllBuf = new HllBuf(null)
    def reduce(b: HllBuf, bytes: Array[Byte]): HllBuf = {
      if (bytes != null && bytes.nonEmpty) {
        val u = asUnion(b)
        u.update(org.apache.datasketches.hll.HllSketch.heapify(
          Memory.wrap(bytes)))
        b.sk = u.getResult
      }
      b
    }
    def merge(a: HllBuf, b: HllBuf): HllBuf = {
      if (b.sk == null) return a
      if (a.sk == null) return b
      val u = asUnion(a); u.update(b.sk); a.sk = u.getResult
      a
    }
    def finish(b: HllBuf): Array[Byte] =
      (if (b.sk == null) new org.apache.datasketches.hll.HllSketch(HllLgK)
       else b.sk).toCompactByteArray
    def bufferEncoder: Encoder[HllBuf] = Encoders.javaSerialization[HllBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ------------------------------------------------------ cpc family

  /** Mutable CPC holder serialized as sketch bytes. */
  final class CpcBuf(var sk: org.apache.datasketches.cpc.CpcSketch)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = if (sk == null) Array.empty[Byte] else sk.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sk = if (n == 0) null
        else org.apache.datasketches.cpc.CpcSketch.heapify(Memory.wrap(bytes))
    }
  }

  private val CpcLgK = 11 // the library default: same accuracy as HLL in
                          // ~40% less serialized space (the CPC trade)

  private def cpcUnion(a: org.apache.datasketches.cpc.CpcSketch,
      b: org.apache.datasketches.cpc.CpcSketch)
      : org.apache.datasketches.cpc.CpcSketch = {
    val u = new org.apache.datasketches.cpc.CpcUnion(CpcLgK)
    u.update(a); u.update(b)
    u.getResult
  }

  /** ds_cpc_sketch(x): CPC sketch of the values, as bytes. */
  class CpcSketchAgg extends Aggregator[String, CpcBuf, Array[Byte]] {
    def zero: CpcBuf = new CpcBuf(null)
    def reduce(b: CpcBuf, x: String): CpcBuf = {
      if (b.sk == null)
        b.sk = new org.apache.datasketches.cpc.CpcSketch(CpcLgK)
      if (x != null) b.sk.update(x)
      b
    }
    def merge(a: CpcBuf, b: CpcBuf): CpcBuf = {
      if (a.sk == null) return b
      if (b.sk == null) return a
      a.sk = cpcUnion(a.sk, b.sk)
      a
    }
    def finish(b: CpcBuf): Array[Byte] =
      (if (b.sk == null) new org.apache.datasketches.cpc.CpcSketch(CpcLgK)
       else b.sk).toByteArray
    def bufferEncoder: Encoder[CpcBuf] = Encoders.javaSerialization[CpcBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** ds_cpc_union(sketch): union of PRE-BUILT cpc sketches, as bytes. */
  class CpcUnionAgg extends Aggregator[Array[Byte], CpcBuf, Array[Byte]] {
    def zero: CpcBuf = new CpcBuf(null)
    def reduce(b: CpcBuf, bytes: Array[Byte]): CpcBuf = {
      if (bytes != null && bytes.nonEmpty) {
        val in = org.apache.datasketches.cpc.CpcSketch.heapify(
          Memory.wrap(bytes))
        b.sk = if (b.sk == null) in else cpcUnion(b.sk, in)
      }
      b
    }
    def merge(a: CpcBuf, b: CpcBuf): CpcBuf = {
      if (a.sk == null) return b
      if (b.sk == null) return a
      a.sk = cpcUnion(a.sk, b.sk)
      a
    }
    def finish(b: CpcBuf): Array[Byte] =
      (if (b.sk == null) new org.apache.datasketches.cpc.CpcSketch(CpcLgK)
       else b.sk).toByteArray
    def bufferEncoder: Encoder[CpcBuf] = Encoders.javaSerialization[CpcBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // --------------------------------------------- theta as bytes + set ops

  /** ds_theta_sketch(x): theta sketch of the values, as bytes. */
  class ThetaSketchAgg extends Aggregator[String, ThetaBuf, Array[Byte]] {
    private val inner = new ThetaDistinct
    def zero: ThetaBuf = inner.zero
    def reduce(b: ThetaBuf, x: String): ThetaBuf = inner.reduce(b, x)
    def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = inner.merge(a, b)
    def finish(b: ThetaBuf): Array[Byte] = b.result.toByteArray
    def bufferEncoder: Encoder[ThetaBuf] = Encoders.javaSerialization[ThetaBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** ds_theta_union(sketch): union of pre-built theta sketches, as bytes. */
  class ThetaUnionAgg extends Aggregator[Array[Byte], ThetaBuf, Array[Byte]] {
    def zero: ThetaBuf = new ThetaBuf(null, null)
    def reduce(b: ThetaBuf, bytes: Array[Byte]): ThetaBuf = {
      if (bytes != null && bytes.nonEmpty) {
        if (b.merged == null) b.merged = SetOperation.builder().buildUnion()
        b.merged.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
      }
      b
    }
    def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = {
      if (b.merged == null && b.sk == null) return a
      if (a.merged == null && a.sk == null) return b
      if (a.merged == null) a.merged = SetOperation.builder().buildUnion()
      a.merged.union(b.result)
      a
    }
    def finish(b: ThetaBuf): Array[Byte] = b.result.toByteArray
    def bufferEncoder: Encoder[ThetaBuf] = Encoders.javaSerialization[ThetaBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** ds_theta_intersect(sketch): INTERSECTION of pre-built theta sketches —
    * the set-operation breadth the theta family exists for (unions alone,
    * HLL/CPC also give you). NULL when no sketch arrived (an intersection
    * of zero sets has no value).
    */
  final class ThetaInterBuf(
      var inter: org.apache.datasketches.theta.Intersection,
      var any: Boolean) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.writeBoolean(any)
      val bytes =
        if (!any) Array.empty[Byte] else inter.getResult.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      any = in.readBoolean()
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      inter = SetOperation.builder().buildIntersection()
      if (any) inter.intersect(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    }
  }

  class ThetaIntersectAgg
      extends Aggregator[Array[Byte], ThetaInterBuf, Array[Byte]] {
    def zero: ThetaInterBuf =
      new ThetaInterBuf(SetOperation.builder().buildIntersection(), false)
    def reduce(b: ThetaInterBuf, bytes: Array[Byte]): ThetaInterBuf = {
      if (bytes != null && bytes.nonEmpty) {
        b.inter.intersect(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
        b.any = true
      }
      b
    }
    def merge(a: ThetaInterBuf, b: ThetaInterBuf): ThetaInterBuf = {
      if (!b.any) return a
      if (!a.any) return b
      a.inter.intersect(b.inter.getResult)
      a
    }
    def finish(b: ThetaInterBuf): Array[Byte] =
      if (!b.any) null else b.inter.getResult.toByteArray
    def bufferEncoder: Encoder[ThetaInterBuf] =
      Encoders.javaSerialization[ThetaInterBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // -------------------------------------------- kll family (sketch bytes)
  // ds_kll_* — mergeable quantiles as transportable bytes (the existing
  // kll_quantile returns only the final estimate; these let per-partition
  // or per-day sketches persist and roll up later, the reference's
  // sketch-object contract in DataSketchesFunctions.java)

  private val KllK = 200 // ~1.65% rank error, matches kll_quantile

  final class KllBytesBuf(var sk: KllDoublesSketch) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = if (sk == null) Array.empty[Byte] else sk.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sk = if (n == 0) null else KllDoublesSketch.heapify(Memory.wrap(bytes))
    }
  }

  /** ds_kll_sketch(x): KLL quantiles sketch of the values, as bytes. */
  class KllSketchAgg extends Aggregator[Double, KllBytesBuf, Array[Byte]] {
    def zero: KllBytesBuf = new KllBytesBuf(null)
    def reduce(b: KllBytesBuf, x: Double): KllBytesBuf = {
      if (b.sk == null) b.sk = KllDoublesSketch.newHeapInstance(KllK)
      b.sk.update(x)
      b
    }
    def merge(a: KllBytesBuf, b: KllBytesBuf): KllBytesBuf = {
      if (a.sk == null) return b
      if (b.sk != null) a.sk.merge(b.sk)
      a
    }
    def finish(b: KllBytesBuf): Array[Byte] =
      (if (b.sk == null) KllDoublesSketch.newHeapInstance(KllK) else b.sk)
        .toByteArray
    def bufferEncoder: Encoder[KllBytesBuf] =
      Encoders.javaSerialization[KllBytesBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** ds_kll_union(sketch): union of PRE-BUILT kll sketches, as bytes. */
  class KllUnionAgg extends Aggregator[Array[Byte], KllBytesBuf, Array[Byte]] {
    def zero: KllBytesBuf = new KllBytesBuf(null)
    def reduce(b: KllBytesBuf, bytes: Array[Byte]): KllBytesBuf = {
      if (bytes != null && bytes.nonEmpty) {
        val in = KllDoublesSketch.heapify(Memory.wrap(bytes))
        if (b.sk == null) b.sk = in else b.sk.merge(in)
      }
      b
    }
    def merge(a: KllBytesBuf, b: KllBytesBuf): KllBytesBuf = {
      if (a.sk == null) return b
      if (b.sk != null) a.sk.merge(b.sk)
      a
    }
    def finish(b: KllBytesBuf): Array[Byte] =
      (if (b.sk == null) KllDoublesSketch.newHeapInstance(KllK) else b.sk)
        .toByteArray
    def bufferEncoder: Encoder[KllBytesBuf] =
      Encoders.javaSerialization[KllBytesBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ------------------------------------------------ frequent-items family
  // ds_freq_* — Misra-Gries frequent items over strings (ref
  // DataSketchesFunctions.java frequencies family). Estimates are EXACT
  // while the item cardinality stays under the map size (no eviction);
  // beyond it, NO_FALSE_POSITIVES listing keeps only provably-frequent
  // items. maxMapSize 1024 ≈ 32 KB serialized — KB-bounded shuffle.

  private val FreqMapSize = 1024
  private def freqSerDe = new org.apache.datasketches.common.ArrayOfStringsSerDe

  final class FreqBuf(
      var sk: org.apache.datasketches.frequencies.ItemsSketch[String])
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes =
        if (sk == null) Array.empty[Byte] else sk.toByteArray(freqSerDe)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sk = if (n == 0) null
        else org.apache.datasketches.frequencies.ItemsSketch.getInstance(
          Memory.wrap(bytes), freqSerDe)
    }
  }

  /** ds_freq_sketch(x): frequent-items sketch of the values, as bytes. */
  class FreqSketchAgg extends Aggregator[String, FreqBuf, Array[Byte]] {
    def zero: FreqBuf = new FreqBuf(null)
    def reduce(b: FreqBuf, x: String): FreqBuf = {
      if (b.sk == null)
        b.sk = new org.apache.datasketches.frequencies.ItemsSketch[String](
          FreqMapSize)
      if (x != null) b.sk.update(x)
      b
    }
    def merge(a: FreqBuf, b: FreqBuf): FreqBuf = {
      if (a.sk == null) return b
      if (b.sk != null) a.sk.merge(b.sk)
      a
    }
    def finish(b: FreqBuf): Array[Byte] =
      (if (b.sk == null)
         new org.apache.datasketches.frequencies.ItemsSketch[String](
           FreqMapSize)
       else b.sk).toByteArray(freqSerDe)
    def bufferEncoder: Encoder[FreqBuf] = Encoders.javaSerialization[FreqBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** ds_freq_union(sketch): union of pre-built frequency sketches. */
  class FreqUnionAgg extends Aggregator[Array[Byte], FreqBuf, Array[Byte]] {
    def zero: FreqBuf = new FreqBuf(null)
    def reduce(b: FreqBuf, bytes: Array[Byte]): FreqBuf = {
      if (bytes != null && bytes.nonEmpty) {
        val in = org.apache.datasketches.frequencies.ItemsSketch.getInstance(
          Memory.wrap(bytes), freqSerDe)
        if (b.sk == null) b.sk = in else b.sk.merge(in)
      }
      b
    }
    def merge(a: FreqBuf, b: FreqBuf): FreqBuf = {
      if (a.sk == null) return b
      if (b.sk != null) a.sk.merge(b.sk)
      a
    }
    def finish(b: FreqBuf): Array[Byte] =
      (if (b.sk == null)
         new org.apache.datasketches.frequencies.ItemsSketch[String](
           FreqMapSize)
       else b.sk).toByteArray(freqSerDe)
    def bufferEncoder: Encoder[FreqBuf] = Encoders.javaSerialization[FreqBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------------------------------------------- tuple family
  // ds_tuple_* — ArrayOfDoubles tuple sketches (ref
  // DataSketchesFunctions.java tuple family): theta-style distinct keys,
  // each retained key carrying a double summary that SUMS across updates
  // and unions — the mergeable "distinct keys + per-key metric" shape
  // (e.g. distinct users + revenue per shard, rolled up later).

  import org.apache.datasketches.tuple.arrayofdoubles.{
    ArrayOfDoublesSketch, ArrayOfDoublesSketches,
    ArrayOfDoublesSetOperationBuilder, ArrayOfDoublesUpdatableSketch,
    ArrayOfDoublesUpdatableSketchBuilder}

  /** Live updatable sketch (row updates) + compact union residue (merged
    * partials — compact images cannot become updatable again, so they
    * accumulate separately and fold at finish).
    */
  final class TupleBuf(var sk: ArrayOfDoublesUpdatableSketch,
      var merged: Array[Byte]) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = if (sk == null) Array.empty[Byte] else sk.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeInt(merged.length)
      out.write(merged)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sk = if (n == 0) null
        else ArrayOfDoublesSketches.heapifyUpdatableSketch(Memory.wrap(bytes))
      val m = in.readInt()
      merged = new Array[Byte](m)
      in.readFully(merged)
    }
  }

  private def newTupleSketch(): ArrayOfDoublesUpdatableSketch =
    new ArrayOfDoublesUpdatableSketchBuilder().setNumberOfValues(1).build()

  private def tupleUnionOf(a: ArrayOfDoublesSketch,
      b: ArrayOfDoublesSketch): Array[Byte] = {
    val u = new ArrayOfDoublesSetOperationBuilder().buildUnion()
    u.union(a); u.union(b)
    u.getResult.toByteArray
  }

  /** ds_tuple_sketch(key, value): tuple sketch of distinct keys with
    * per-key summed values, as bytes.
    */
  class TupleSketchAgg
      extends Aggregator[(String, Double), TupleBuf, Array[Byte]] {
    def zero: TupleBuf = new TupleBuf(null, Array.empty)
    def reduce(b: TupleBuf, kv: (String, Double)): TupleBuf = {
      if (b.sk == null) b.sk = newTupleSketch()
      if (kv._1 != null) b.sk.update(kv._1, Array(kv._2))
      b
    }
    def merge(a: TupleBuf, b: TupleBuf): TupleBuf = {
      val parts: Seq[ArrayOfDoublesSketch] =
        Seq(Option(a.sk), Option(b.sk)).flatten ++
          Seq(a.merged, b.merged).filter(_.nonEmpty)
            .map(m => ArrayOfDoublesSketches.heapifySketch(Memory.wrap(m)))
      a.sk = null
      a.merged = parts match {
        case Seq() => Array.empty
        case Seq(one) => one.compact().toByteArray
        case many =>
          val u = new ArrayOfDoublesSetOperationBuilder().buildUnion()
          many.foreach(u.union)
          u.getResult.toByteArray
      }
      a
    }
    def finish(b: TupleBuf): Array[Byte] =
      if (b.sk == null && b.merged.isEmpty)
        newTupleSketch().compact().toByteArray
      else if (b.sk == null) b.merged
      else if (b.merged.isEmpty) b.sk.compact().toByteArray
      else tupleUnionOf(b.sk,
        ArrayOfDoublesSketches.heapifySketch(Memory.wrap(b.merged)))
    def bufferEncoder: Encoder[TupleBuf] = Encoders.javaSerialization[TupleBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** ds_tuple_union(sketch): union of pre-built tuple sketches (same-key
    * summaries sum), as bytes.
    */
  class TupleUnionAgg
      extends Aggregator[Array[Byte], TupleUnionBuf, Array[Byte]] {
    def zero: TupleUnionBuf = new TupleUnionBuf(Array.empty)
    def reduce(b: TupleUnionBuf, bytes: Array[Byte]): TupleUnionBuf = {
      if (bytes != null && bytes.nonEmpty) b.add(
        ArrayOfDoublesSketches.heapifySketch(Memory.wrap(bytes)))
      b
    }
    def merge(a: TupleUnionBuf, b: TupleUnionBuf): TupleUnionBuf = {
      if (b.bytes.nonEmpty) a.add(
        ArrayOfDoublesSketches.heapifySketch(Memory.wrap(b.bytes)))
      a
    }
    def finish(b: TupleUnionBuf): Array[Byte] =
      if (b.bytes.isEmpty) newTupleSketch().compact().toByteArray
      else b.bytes
    def bufferEncoder: Encoder[TupleUnionBuf] =
      Encoders.javaSerialization[TupleUnionBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union accumulator kept as COMPACT sketch bytes (the union operator
    * itself is not serializable; compact images are).
    */
  final class TupleUnionBuf(var bytes: Array[Byte]) extends Serializable {
    def add(sk: ArrayOfDoublesSketch): Unit = {
      if (bytes.isEmpty) bytes = sk.compact().toByteArray
      else {
        val cur = ArrayOfDoublesSketches.heapifySketch(Memory.wrap(bytes))
        bytes = tupleUnionOf(cur, sk)
      }
    }
  }

  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("kll_quantile",
      udaf(new KllQuantile,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)))
    spark.udf.register("theta_count_distinct",
      udaf(new ThetaDistinct, Encoders.STRING))
    // the ds_* DataSketches families (ref DataSketchesFunctions.java:316-360)
    spark.udf.register("ds_hll_sketch", udaf(new HllSketchAgg, Encoders.STRING))
    spark.udf.register("ds_hll_union", udaf(new HllUnionAgg, Encoders.BINARY))
    spark.udf.register("ds_cpc_sketch", udaf(new CpcSketchAgg, Encoders.STRING))
    spark.udf.register("ds_cpc_union", udaf(new CpcUnionAgg, Encoders.BINARY))
    spark.udf.register("ds_theta_sketch",
      udaf(new ThetaSketchAgg, Encoders.STRING))
    spark.udf.register("ds_theta_union",
      udaf(new ThetaUnionAgg, Encoders.BINARY))
    spark.udf.register("ds_theta_intersect",
      udaf(new ThetaIntersectAgg, Encoders.BINARY))
    // scalar estimates + two-sketch set ops
    spark.udf.register("ds_hll_estimate", (b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0.0
      else org.apache.datasketches.hll.HllSketch.heapify(Memory.wrap(b))
        .getEstimate)
    spark.udf.register("ds_cpc_estimate", (b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0.0
      else org.apache.datasketches.cpc.CpcSketch.heapify(Memory.wrap(b))
        .getEstimate)
    spark.udf.register("ds_theta_estimate", (b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0.0
      else Sketches.wrapCompactSketch(Memory.wrap(b)).getEstimate)
    spark.udf.register("ds_hll_union_f", (a: Array[Byte], b: Array[Byte]) => {
      val u = new org.apache.datasketches.hll.Union(HllLgK)
      if (a != null && a.nonEmpty)
        u.update(org.apache.datasketches.hll.HllSketch.heapify(Memory.wrap(a)))
      if (b != null && b.nonEmpty)
        u.update(org.apache.datasketches.hll.HllSketch.heapify(Memory.wrap(b)))
      u.getResult.toCompactByteArray
    })
    // kll quantiles family: sketch/union aggregates + scalar extractors
    spark.udf.register("ds_kll_sketch",
      udaf(new KllSketchAgg, Encoders.scalaDouble))
    spark.udf.register("ds_kll_union", udaf(new KllUnionAgg, Encoders.BINARY))
    spark.udf.register("ds_kll_quantile", (b: Array[Byte], p: Double) =>
      if (b == null || b.isEmpty) Double.NaN
      else {
        val sk = KllDoublesSketch.heapify(Memory.wrap(b))
        if (sk.isEmpty) Double.NaN
        else sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)
      })
    spark.udf.register("ds_kll_rank", (b: Array[Byte], v: Double) =>
      if (b == null || b.isEmpty) Double.NaN
      else {
        val sk = KllDoublesSketch.heapify(Memory.wrap(b))
        if (sk.isEmpty) Double.NaN
        else sk.getRank(v, QuantileSearchCriteria.INCLUSIVE)
      })
    // the EXCLUSIVE (fraction < v) twin — what a rank() estimate needs
    // (rank = #(< v) + 1; the INCLUSIVE form above is the cume_dist shape)
    spark.udf.register("ds_kll_rank_lt", (b: Array[Byte], v: Double) =>
      if (b == null || b.isEmpty) Double.NaN
      else {
        val sk = KllDoublesSketch.heapify(Memory.wrap(b))
        if (sk.isEmpty) Double.NaN
        else sk.getRank(v, QuantileSearchCriteria.EXCLUSIVE)
      })
    spark.udf.register("ds_kll_n", (b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0L
      else KllDoublesSketch.heapify(Memory.wrap(b)).getN)
    // frequent-items family
    spark.udf.register("ds_freq_sketch",
      udaf(new FreqSketchAgg, Encoders.STRING))
    spark.udf.register("ds_freq_union",
      udaf(new FreqUnionAgg, Encoders.BINARY))
    spark.udf.register("ds_freq_estimate", (b: Array[Byte], item: String) =>
      if (b == null || b.isEmpty || item == null) 0L
      else org.apache.datasketches.frequencies.ItemsSketch.getInstance(
        Memory.wrap(b), freqSerDe).getEstimate(item))
    // provably-frequent items (NO_FALSE_POSITIVES), most-frequent first
    spark.udf.register("ds_freq_items", (b: Array[Byte]) =>
      if (b == null || b.isEmpty) Seq.empty[String]
      else org.apache.datasketches.frequencies.ItemsSketch.getInstance(
          Memory.wrap(b), freqSerDe)
        .getFrequentItems(
          org.apache.datasketches.frequencies.ErrorType.NO_FALSE_POSITIVES)
        .map(_.getItem).toSeq)
    // tuple family: distinct keys + per-key summed double summary
    spark.udf.register("ds_tuple_sketch", udaf(new TupleSketchAgg,
      Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)))
    spark.udf.register("ds_tuple_union",
      udaf(new TupleUnionAgg, Encoders.BINARY))
    spark.udf.register("ds_tuple_estimate", (b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0.0
      else ArrayOfDoublesSketches.heapifySketch(Memory.wrap(b)).getEstimate)
    // estimated total of the summed values over all distinct keys:
    // sum(retained summaries) / theta — exact while nothing was sampled
    spark.udf.register("ds_tuple_sum", (b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0.0
      else {
        val sk = ArrayOfDoublesSketches.heapifySketch(Memory.wrap(b))
        val it = sk.iterator()
        var s = 0.0
        while (it.next()) s += it.getValues()(0)
        s / sk.getTheta
      })
    // ds_theta_exclude(a, b): A-and-not-B — the retention/churn primitive
    spark.udf.register("ds_theta_exclude", (a: Array[Byte], b: Array[Byte]) => {
      val op = SetOperation.builder().buildANotB()
      val ea = Sketches.wrapCompactSketch(Memory.wrap(
        if (a == null || a.isEmpty)
          UpdateSketch.builder().build().compact().toByteArray else a))
      val eb = Sketches.wrapCompactSketch(Memory.wrap(
        if (b == null || b.isEmpty)
          UpdateSketch.builder().build().compact().toByteArray else b))
      op.aNotB(ea, eb).toByteArray
    })
  }
}
