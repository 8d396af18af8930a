package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r18 incremental-digest rewrite of the portable (MD5-based,
  * cross-engine-replayable) text-hash kernels against the definitional
  * concat-then-md5 computation: the optimization changed HOW the digest is
  * fed (per-word byte arrays + separator updates, reusable output buffer),
  * not WHAT is hashed — these tests fail if the byte sequence ever drifts.
  */
class PortableHashKernelSpec extends AnyFunSuite {

  private def words(ws: String*): ArrayData =
    new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])

  /** Definitional 60-bit hash: first 15 hex chars of md5(s) as a long —
    * exactly the DuckDB oracle's `('0x' || substr(md5(g),1,15))::BIGINT`.
    */
  private def refMd5_60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def refShingles(ws: Seq[String], k: Int): Seq[Long] =
    if (ws.isEmpty) Seq.empty
    else if (ws.size < k) Seq(refMd5_60(ws.mkString(" ")))
    else ws.sliding(k).map(g => refMd5_60(g.mkString(" "))).toSeq

  private val cases = Seq(
    Seq.empty[String],
    Seq("one"),
    Seq("a", "b"),
    Seq("the", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog"),
    Seq("münchen", "日本語", "naïve", "", "x"), // unicode + empty word
    Seq.tabulate(40)(i => s"w$i"))

  test("portableShingles == concat-then-md5 definition (k=3 and k=5)") {
    for (ws <- cases; k <- Seq(3, 5)) {
      val got = TextHashKernels.portableShingles(words(ws: _*), k)
      val exp = refShingles(ws, k)
      assert(got.numElements() == exp.size, s"count for $ws k=$k")
      exp.zipWithIndex.foreach { case (e, i) =>
        assert(got.getLong(i) == e, s"shingle $i of $ws k=$k")
      }
    }
  }

  test("portableSimhash == per-word md5 majority-vote definition") {
    for (ws <- cases) {
      val got = TextHashKernels.portableSimhash(words(ws: _*))
      val hs = ws.map(refMd5_60)
      var exp = 0L
      for (b <- 0 until 60)
        if (hs.count(h => ((h >>> b) & 1L) == 1L) * 2 > hs.size)
          exp |= (1L << b)
      assert(got == exp, s"simhash of $ws")
    }
  }

  test("portableMinhash slots == affine-min over definitional shingles") {
    val ws = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val k = 5; val numHashes = 32
    val got = TextHashKernels.portableMinhash(words(ws: _*), k, numHashes)
    val hs = refShingles(ws, k)
    val mask = (1L << 60) - 1
    for (i <- 0 until numHashes) {
      val m = refMd5_60(i.toString) | 1L
      val exp = hs.map(h => (h * m + i) & mask).min
      assert(got.getLong(i) == exp, s"slot $i")
    }
  }
}
