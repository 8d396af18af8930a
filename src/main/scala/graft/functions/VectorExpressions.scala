package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Primitive-loop vector arithmetic over array<float>/array<double> columns.
  *
  * zip_with/aggregate run their lambdas interpretively per element; for
  * 64-1024-dim embeddings crossed against a query set that cost dominates the
  * scan. These expressions read ArrayData directly in a tight JVM loop —
  * map-side, no shuffle, linear in corpus size.
  */
private object VecRead {
  /** Read element i as double from a float or double array. */
  def get(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _ => throw new IllegalArgumentException(s"unsupported vector type $et")
  }
  def elementType(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val ta = VecRead.elementType(left.dataType)
    val tb = VecRead.elementType(right.dataType)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += VecRead.get(a, ta, i) * VecRead.get(b, tb, i); i += 1 }
    java.lang.Double.valueOf(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class L2Norm(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val t = VecRead.elementType(child.dataType)
    var s = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { val v = VecRead.get(a, t, i); s += v * v; i += 1 }
    java.lang.Double.valueOf(math.sqrt(s))
  }
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val ta = VecRead.elementType(left.dataType)
    val tb = VecRead.elementType(right.dataType)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = VecRead.get(a, ta, i); val y = VecRead.get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero-magnitude vectors have no direction: similarity 0, not NaN
    // (NaN sorts above every number in Spark and passes >= filters)
    val denom = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** LSH band hashes of a minhash signature: array of `bands` xxhash64 values,
  * one per contiguous rows-per-band block. Primitive-loop twin of
  * xxhash64(concat_ws(",", slice(sig, ...))).
  */
case class LshBandHashes(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val n = sig.numElements()
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = TextHash.Seed
      var i = 0
      while (i < r) {
        // xxhash64-style mix of each signature component into the band hash
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(sig.getLong(b * r + i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): LshBandHashes = copy(child = c)
}

/** Fraction of equal components between two equal-length long-array
  * signatures (MinHash agreement = estimated Jaccard).
  */
case class SigMatchFraction(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    java.lang.Double.valueOf(if (n == 0) 0.0 else eq.toDouble / n)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchFraction =
    copy(left = l, right = r)
}

/** Signature of sign-projections onto fixed hyperplanes, packed into a long.
  * The plane matrix is generated deterministically driver-side and shipped in
  * the expression (tiny: nPlanes x dims doubles).
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(planes.length <= 64,
    s"at most 64 hyperplanes fit a long signature, got ${planes.length}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val t = VecRead.elementType(child.dataType)
    val n = v.numElements()
    var sigBits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var s = 0.0; var i = 0
      val m = math.min(n, plane.length)
      while (i < m) { s += VecRead.get(v, t, i) * plane(i); i += 1 }
      if (s >= 0) sigBits |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sigBits)
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneSignature = copy(child = c)
}

object VectorColumns {
  import org.apache.spark.unsafe.types.UTF8String

  /** Deterministic pseudo-random hyperplane matrix in [-1, 1), derived from
    * (seed, plane, dim) via xxhash64 — reproducible across runs.
    */
  def planeMatrix(nPlanes: Int, dims: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes, dims) { (p, d) =>
      val s = UTF8String.fromString(s"$seed:$p:$d")
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
        .toDouble / Long.MaxValue.toDouble
    }

  def sigMatchFraction(a: Column, b: Column): Column =
    GraftShims.column(SigMatchFraction(GraftShims.expression(a), GraftShims.expression(b)))
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column =
    GraftShims.column(HyperplaneSignature(GraftShims.expression(vec), planes))
  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))
  def l2Norm(a: Column): Column =
    GraftShims.column(L2Norm(GraftShims.expression(a)))
  def cosine(a: Column, b: Column): Column =
    GraftShims.column(CosineSimilarity(GraftShims.expression(a), GraftShims.expression(b)))
  def lshBandHashes(sig: Column, bands: Int): Column =
    GraftShims.column(LshBandHashes(GraftShims.expression(sig), bands))
}
