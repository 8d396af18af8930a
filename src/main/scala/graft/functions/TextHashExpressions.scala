package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Primitive-loop signature expressions for dedup at scale.
  *
  * Spark's higher-order functions (transform/aggregate/filter) evaluate their
  * lambdas interpretively per element; a 64-permutation MinHash expressed as
  * nested transforms costs ~10µs per inner op. These expressions do the same
  * math in a single JVM primitive loop per row, ~1000× faster and still
  * map-side, partition-parallel, shuffle-free. Each implements `doGenCode` as
  * a call into a static kernel ([[TextHashKernels]]), so projections
  * containing them stay inside one WholeStageCodegen span — no interpreted
  * eval() boundary in the hot path.
  */
object TextHash {
  val Seed = 42L // matches Spark's xxhash64 default seed

  /** Per-permutation odd multipliers: h -> h * mult_i + i is a bijection of
    * the 64-bit ring (odd multiplier), so each signature slot is an honest
    * permutation min under unsigned comparison — no modular reduction, no
    * overflow bias.
    */
  def oddMultiplier(i: Int): Long =
    XXH64.hashLong(i.toLong, Seed) | 1L

  private def hashUtf8(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)

  /** Hashes of word k-shingles ("w1 w2 .. wk"); a short doc collapses to one
    * whole-doc shingle (mirrors TextAnalysis.shingles).
    */
  def shingleHashes(words: ArrayData, k: Int): Array[Long] = {
    val n = words.numElements()
    val sep = UTF8String.fromString(" ")
    if (n == 0) return Array.empty
    val count = if (n < k) 1 else n - k + 1
    val width = if (n < k) n else k
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](2 * width - 1)
      var j = 0
      while (j < width) {
        parts(2 * j) = words.getUTF8String(i + j)
        if (j < width - 1) parts(2 * j + 1) = sep
        j += 1
      }
      out(i) = hashUtf8(UTF8String.concat(parts: _*))
      i += 1
    }
    out
  }
}

/** Static kernels invoked from generated code (Scala top-level objects emit
  * static forwarders, so janino sees plain static methods).
  */
object TextHashKernels {
  private val multsCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def mults(numHashes: Int): Array[Long] =
    multsCache.computeIfAbsent(numHashes,
      (n: Integer) => Array.tabulate(n.intValue)(TextHash.oddMultiplier))

  def minhash(words: ArrayData, shingleSize: Int, numHashes: Int): ArrayData = {
    val hs = TextHash.shingleHashes(words, shingleSize)
    val m = mults(numHashes)
    val sig = Array.fill(numHashes)(-1L) // unsigned max
    var s = 0
    while (s < hs.length) {
      val h = hs(s)
      var i = 0
      while (i < numHashes) {
        val v = h * m(i) + i
        if (java.lang.Long.compareUnsigned(v, sig(i)) < 0) sig(i) = v
        i += 1
      }
      s += 1
    }
    if (hs.isEmpty) java.util.Arrays.fill(sig, 0L)
    new GenericArrayData(sig)
  }

  def simhash(words: ArrayData): Long = {
    val n = words.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, TextHash.Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  def shingles(words: ArrayData, shingleSize: Int): ArrayData =
    new GenericArrayData(TextHash.shingleHashes(words, shingleSize))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable 60-bit shingle hashes: the first 60 bits of MD5 of each word
    * k-shingle, i.e. exactly `conv(substring(md5(s), 1, 15), 16, 10)` — an
    * expression every ANSI engine with an md5() can replay, which puts
    * fingerprint queries under a cross-engine oracle instead of a golden.
    * Same shingle construction (and short-doc collapse) as
    * [[TextHash.shingleHashes]]; still one primitive JVM loop per row.
    */
  private def md5_60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 15 hex chars = big-endian bits 0..59 of the digest
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  private val portableMultsCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  /** Slot multipliers every ANSI engine can derive:
    * `('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT | 1`.
    */
  private def portableMults(numHashes: Int): Array[Long] =
    portableMultsCache.computeIfAbsent(numHashes,
      (n: Integer) => Array.tabulate(n.intValue)(i =>
        md5_60(UTF8String.fromString(String.valueOf(i))) | 1L))

  private val Mask60 = (1L << 60) - 1

  /** Cross-engine-replayable MinHash: shingle hashes are the portable
    * 60-bit MD5 ([[portableShingles]]); slot i applies the affine map
    * `(h * m_i + i) mod 2^60` with the odd multiplier above and takes the
    * min. Because 2^60 divides 2^64, the wrapped 64-bit product's low 60
    * bits ARE the exact product mod 2^60 — so a HUGEINT-exact engine
    * (DuckDB oracle leg) computes the identical value. An empty doc
    * answers all-zero slots. The XXH64 [[minhash]] stays the production
    * kernel (one hash per shingle vs one MD5 per shingle here); this twin
    * exists so the signature algorithm sits under a real cross-engine
    * oracle instead of a golden transcript.
    */
  def portableMinhash(words: ArrayData, shingleSize: Int,
      numHashes: Int): ArrayData = {
    val hsData = portableShingles(words, shingleSize)
    val cnt = hsData.numElements()
    val m = portableMults(numHashes)
    val sig = new Array[Long](numHashes)
    if (cnt == 0) return new GenericArrayData(sig)
    java.util.Arrays.fill(sig, java.lang.Long.MAX_VALUE) // > any 60-bit value
    var s = 0
    while (s < cnt) {
      val h = hsData.getLong(s)
      var i = 0
      while (i < numHashes) {
        val v = (h * m(i) + i) & Mask60
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** Cross-engine-replayable SimHash: 60-bit majority vote over the
    * portable per-WORD MD5 hashes (duplicates counted). Same verification
    * rationale as [[portableMinhash]]; [[simhash]] (XXH64, 64-bit) stays
    * the production kernel.
    */
  def portableSimhash(words: ArrayData): Long = {
    val n = words.numElements()
    val counts = new Array[Int](60)
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    var i = 0
    while (i < n) {
      // same 60-bit value as md5_60, without the per-word digest allocation
      md.reset()
      md.update(words.getUTF8String(i).getBytes)
      md.digest(dig, 0, 16)
      val h = digestLong(dig) >>> 4
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Big-endian long from the first 8 digest bytes (what
    * `ByteBuffer.wrap(d, 0, 8).getLong` computed, without the wrapper).
    */
  private def digestLong(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)

  def portableShingles(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val count = if (n < k) 1 else n - k + 1
    val width = if (n < k) n else k
    val md = md5Local.get()
    // One UTF-8 byte copy per WORD, not per shingle (r18, guide step 4):
    // each word participates in up to k shingles, and the old
    // concat-then-getBytes path paid a parts array + concat buffer +
    // getBytes copy + digest allocation PER SHINGLE. The digest is fed
    // incrementally from the per-word byte arrays instead — the MD5 input
    // byte sequence ("w1 w2 ... wk") is identical, so the hash values are
    // identical by construction.
    val wb = new Array[Array[Byte]](n)
    var w = 0
    while (w < n) { wb(w) = words.getUTF8String(w).getBytes; w += 1 }
    val out = new Array[Long](count)
    val dig = new Array[Byte](16)
    var i = 0
    while (i < count) {
      md.reset()
      var j = 0
      while (j < width) {
        if (j > 0) md.update(' '.toByte)
        md.update(wb(i + j))
        j += 1
      }
      md.digest(dig, 0, 16)
      // first 15 hex chars = big-endian bits 0..59 of the digest
      out(i) = digestLong(dig) >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash signature of array<string> words: array<bigint> of length
  * `numHashes`, sig[i] = unsigned-min over shingles of the i-th 64-bit
  * permutation (odd-multiplier affine map) of the shingle hash.
  */
case class MinHashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.minhash(input.asInstanceOf[ArrayData], shingleSize, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.minhash($c, $shingleSize, $numHashes);")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** 64-bit SimHash of array<string> words: per-bit majority vote of word
  * hashes.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextHashKernels.simhash(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.simhash($c);")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Shingle hash array (for fingerprinting): array<bigint> of xxhash64 of each
  * word k-shingle — the primitive-loop twin of
  * transform(shingles(words,k), xxhash64).
  */
case class ShingleHashes(child: Expression, shingleSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.shingles(input.asInstanceOf[ArrayData], shingleSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.shingles($c, $shingleSize);")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** Portable fingerprint shingle hashes: array<bigint> of the first 60 bits
  * of MD5 of each word k-shingle (see [[TextHashKernels.portableShingles]]).
  */
case class PortableShingleHashes(child: Expression, shingleSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.portableShingles(input.asInstanceOf[ArrayData], shingleSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.portableShingles($c, $shingleSize);")
  override protected def withNewChildInternal(c: Expression): PortableShingleHashes =
    copy(child = c)
}

/** Cross-engine-replayable MinHash signature (see
  * [[TextHashKernels.portableMinhash]]).
  */
case class PortableMinHash(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.portableMinhash(
      input.asInstanceOf[ArrayData], shingleSize, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.portableMinhash($c, " +
        s"$shingleSize, $numHashes);")
  override protected def withNewChildInternal(c: Expression): PortableMinHash =
    copy(child = c)
}

/** Cross-engine-replayable 60-bit SimHash (see
  * [[TextHashKernels.portableSimhash]]).
  */
case class PortableSimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TextHashKernels.portableSimhash(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashKernels.portableSimhash($c);")
  override protected def withNewChildInternal(c: Expression): PortableSimHash60 =
    copy(child = c)
}

object TextHashColumns {
  def portableMinhash(words: Column, shingleSize: Int, numHashes: Int): Column =
    GraftShims.column(
      PortableMinHash(GraftShims.expression(words), shingleSize, numHashes))
  def portableSimhash(words: Column): Column =
    GraftShims.column(PortableSimHash60(GraftShims.expression(words)))
  def minhashSignature(words: Column, shingleSize: Int, numHashes: Int): Column =
    GraftShims.column(
      MinHashSignature(GraftShims.expression(words), shingleSize, numHashes))
  def simhash64(words: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(words)))
  def shingleHashes(words: Column, shingleSize: Int): Column =
    GraftShims.column(ShingleHashes(GraftShims.expression(words), shingleSize))
  def portableShingleHashes(words: Column, shingleSize: Int): Column =
    GraftShims.column(
      PortableShingleHashes(GraftShims.expression(words), shingleSize))
}
