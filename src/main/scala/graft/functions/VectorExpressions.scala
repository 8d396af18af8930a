package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Primitive-loop vector arithmetic over array<float>/array<double> columns.
  *
  * zip_with/aggregate run their lambdas interpretively per element; for
  * 64-1024-dim embeddings crossed against a query set that cost dominates the
  * scan. These expressions read ArrayData directly in a tight JVM loop —
  * map-side, no shuffle, linear in corpus size — and codegen as static-kernel
  * calls ([[VectorKernels]]) so the surrounding projection stays in one
  * WholeStageCodegen span.
  */
private object VecRead {
  def elementType(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType
  /** True for float arrays, false for double arrays; anything else is an
    * error — reading int storage through getDouble would silently produce
    * garbage similarity scores.
    */
  def isFloat(e: Expression): Boolean = elementType(e.dataType) match {
    case FloatType => true
    case DoubleType => false
    case other => throw new IllegalArgumentException(
      s"vector expressions require array<float> or array<double>, got array<$other>")
  }
}

/** Static kernels invoked from generated code. `xFloat` flags select the
  * float/double ArrayData accessor (decided once at plan time, branch-free
  * per element thanks to JIT specialization on the constant).
  */
object VectorKernels {
  @inline private def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, aFloat, i) * get(b, bFloat, i); i += 1 }
    s
  }

  def l2(a: ArrayData, aFloat: Boolean): Double = {
    var s = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { val v = get(a, aFloat, i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, aFloat, i); val y = get(b, bFloat, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero-magnitude vectors have no direction: similarity 0, not NaN
    // (NaN sorts above every number in Spark and passes >= filters)
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def lshBands(sig: ArrayData, bands: Int): ArrayData = {
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

  def sigMatch(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** Symmetric int8 quantization codes: code_i = round(x_i / (maxAbs/127)).
    * 4x smaller than float32. Cosine is invariant to the per-vector scale,
    * so codes alone reconstruct cosine to ~1e-2 — no scale column needed
    * for similarity work (store the scale only if values must be
    * reconstructed).
    */
  def int8Codes(v: ArrayData, vFloat: Boolean): Array[Byte] = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) { val a = math.abs(get(v, vFloat, i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val out = new Array[Byte](n)
    if (maxAbs == 0.0) return out
    val inv = 127.0 / maxAbs
    i = 0
    while (i < n) {
      out(i) = math.rint(get(v, vFloat, i) * inv).toInt
        .max(-127).min(127).toByte
      i += 1
    }
    out
  }

  /** Cosine over int8 code arrays — integer multiply-accumulate (the form
    * SIMD vectorizes), one double division at the end.
    */
  def int8Cosine(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      val x = a(i).toInt; val y = b(i).toInt
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (denom == 0.0) 0.0 else dot.toDouble / denom
  }

  /** Unit-L2 copy of the vector as array<double> (zero vectors stay zero). */
  def l2Normalize(v: ArrayData, vFloat: Boolean): ArrayData = {
    val n = v.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = get(v, vFloat, i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    if (norm > 0.0) { i = 0; while (i < n) { out(i) = get(v, vFloat, i) / norm; i += 1 } }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Product-quantization encode: split the vector into `m` contiguous
    * subspaces and store, per subspace, the index of the L2-nearest codebook
    * entry — one byte each (codebooks of <= 256 entries). 64-dim float32 ->
    * 8 bytes at m=8: 32x compression.
    */
  def pqEncode(v: ArrayData, vFloat: Boolean,
      codebooks: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val sub = cb(0).length
      val off = s * sub
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0; var i = 0
        while (i < sub) {
          val x = get(v, vFloat, off + i) - cent(i); d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Per-query ADC lookup table: lut[s*K + c] = dot(query_sub_s, codebook
    * entry c of subspace s). Computed once per query (m*K*subdim flops);
    * scoring a corpus code is then m lookups + adds.
    */
  def pqLut(q: ArrayData, qFloat: Boolean,
      codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val k = codebooks(0).length
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val sub = cb(0).length
      val off = s * sub
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0; var i = 0
        while (i < sub) { d += get(q, qFloat, off + i) * cent(i); i += 1 }
        out(s * k + c) = d
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC dot product: sum of per-subspace LUT entries for the stored codes. */
  def pqAdcDot(codes: Array[Byte], lut: ArrayData, k: Int): Double = {
    var s = 0; var d = 0.0
    while (s < codes.length) {
      d += lut.getDouble(s * k + (codes(s) & 0xff))
      s += 1
    }
    d
  }

  /** Id of the cosine-nearest centroid (ties to the lowest id — centroids
    * arrive sorted by id). Linear scan over the (tiny) centroid matrix per
    * row: the whole Lloyd assignment step is one map-side projection.
    */
  def nearestCentroid(v: ArrayData, vFloat: Boolean,
      cents: Array[Array[Double]], ids: Array[Long]): Long = {
    val n = v.numElements()
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val m = math.min(n, cent.length)
      while (i < m) {
        val x = get(v, vFloat, i); val y = cent(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    ids(best)
  }

  def hyperplane(v: ArrayData, vFloat: Boolean, planes: Array[Array[Double]]): Long = {
    val n = v.numElements()
    var sigBits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var s = 0.0; var i = 0
      val m = math.min(n, plane.length)
      while (i < m) { s += get(v, vFloat, i) * plane(i); i += 1 }
      if (s >= 0) sigBits |= (1L << p)
      p += 1
    }
    sigBits
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(VectorKernels.dot(
      l.asInstanceOf[ArrayData], VecRead.isFloat(left),
      r.asInstanceOf[ArrayData], VecRead.isFloat(right)))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.dot($a, ${VecRead.isFloat(left)}, $b, ${VecRead.isFloat(right)});")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      VectorKernels.l2(input.asInstanceOf[ArrayData], VecRead.isFloat(child)))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.l2($c, ${VecRead.isFloat(child)});")
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(VectorKernels.cosine(
      l.asInstanceOf[ArrayData], VecRead.isFloat(left),
      r.asInstanceOf[ArrayData], VecRead.isFloat(right)))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.cosine($a, ${VecRead.isFloat(left)}, $b, ${VecRead.isFloat(right)});")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** LSH band hashes of a minhash signature: array of `bands` xxhash64 values,
  * one per contiguous rows-per-band block. Primitive-loop twin of
  * xxhash64(concat_ws(",", slice(sig, ...))).
  */
case class LshBandHashes(child: Expression, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.lshBands(input.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.lshBands($c, $bands);")
  override protected def withNewChildInternal(c: Expression): LshBandHashes = copy(child = c)
}

/** Fraction of equal components between two equal-length long-array
  * signatures (MinHash agreement = estimated Jaccard).
  */
case class SigMatchFraction(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(VectorKernels.sigMatch(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.sigMatch($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchFraction =
    copy(left = l, right = r)
}

/** Signature of sign-projections onto fixed hyperplanes, packed into a long.
  * The plane matrix is generated deterministically driver-side and shipped in
  * the expression (tiny: nPlanes x dims doubles; codegen references it via
  * addReferenceObj).
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.length <= 64,
    s"at most 64 hyperplanes fit a long signature, got ${planes.length}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(VectorKernels.hyperplane(
      input.asInstanceOf[ArrayData], VecRead.isFloat(child), planes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.hyperplane($c, ${VecRead.isFloat(child)}, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneSignature = copy(child = c)
}

/** Symmetric int8 quantization of a float/double vector into a byte array
  * (4x compression; pair with [[Int8CosineSim]] for integer-ALU scoring).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.int8Codes(input.asInstanceOf[ArrayData], VecRead.isFloat(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.int8Codes($c, ${VecRead.isFloat(child)});")
  override protected def withNewChildInternal(c: Expression): Int8Quantize = copy(child = c)
}

/** Cosine similarity over two int8 code arrays (integer MAC loop). */
case class Int8CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(VectorKernels.int8Cosine(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.int8Cosine($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8CosineSim =
    copy(left = l, right = r)
}

/** Unit-L2 normalization (dot of normalized vectors == cosine). */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.l2Normalize(input.asInstanceOf[ArrayData], VecRead.isFloat(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.l2Normalize($c, ${VecRead.isFloat(child)});")
  override protected def withNewChildInternal(c: Expression): L2Normalize = copy(child = c)
}

/** Product-quantization encode against literal codebooks (shipped via
  * addReferenceObj; tiny — m*K*subdim doubles).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(cb => cb.nonEmpty && cb.length <= 256),
    "pq_encode needs 1..256 codebook entries per subspace")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqEncode(input.asInstanceOf[ArrayData], VecRead.isFloat(child), codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.pqEncode($c, ${VecRead.isFloat(child)}, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** Per-query ADC lookup table over literal codebooks. */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqLut(input.asInstanceOf[ArrayData], VecRead.isFloat(child), codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.pqLut($c, ${VecRead.isFloat(child)}, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): PqLut = copy(child = c)
}

/** ADC dot product of stored PQ codes against a query's lookup table. */
case class PqAdcDot(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(VectorKernels.pqAdcDot(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[ArrayData], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.pqAdcDot($a, $b, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDot =
    copy(left = l, right = r)
}

/** Cosine-argmax against a literal centroid matrix (IVF assignment / one
  * Lloyd half-step as a shuffle-free map-side projection; the centroid set is
  * tiny and ships in the expression via addReferenceObj).
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]],
    ids: Array[Long]) extends UnaryExpression {
  require(cents.nonEmpty && cents.length == ids.length,
    "nearest_centroid needs a non-empty centroid set with matching ids")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(VectorKernels.nearestCentroid(
      input.asInstanceOf[ArrayData], VecRead.isFloat(child), cents, ids))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.nearestCentroid($c, ${VecRead.isFloat(child)}, $centsRef, $idsRef);")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
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
  def nearestCentroid(vec: Column, cents: Array[Array[Double]],
      ids: Array[Long]): Column =
    GraftShims.column(NearestCentroid(GraftShims.expression(vec), cents, ids))
  def int8Quantize(vec: Column): Column =
    GraftShims.column(Int8Quantize(GraftShims.expression(vec)))
  def int8Cosine(a: Column, b: Column): Column =
    GraftShims.column(Int8CosineSim(GraftShims.expression(a), GraftShims.expression(b)))
  def l2Normalize(vec: Column): Column =
    GraftShims.column(L2Normalize(GraftShims.expression(vec)))
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftShims.column(PqEncode(GraftShims.expression(vec), codebooks))
  def pqLut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftShims.column(PqLut(GraftShims.expression(vec), codebooks))
  def pqAdcDot(codes: Column, lut: Column, k: Int): Column =
    GraftShims.column(PqAdcDot(GraftShims.expression(codes), GraftShims.expression(lut), k))
}
