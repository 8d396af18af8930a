package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Codegen-friendly point-in-polygon over a PRE-PARSED flat coordinate
  * array — the hot-loop twin of [[Geo]]'s `locate` for the spatial-join
  * refine step (ref ql/src/java/org/apache/hadoop/hive/ql/udf/esri/
  * ST_Contains.java / ST_Intersects.java wrap the same test per row).
  *
  * The WKT text is parsed ONCE per polygon (before the candidate join's
  * cell fan-out) into the packed layout; the refine predicate then runs a
  * primitive loop over an `ArrayData` of doubles per candidate pair — no
  * per-pair parse, no memo lookup, no boxing, and the expression stays
  * inside whole-stage codegen (same pattern as [[VectorKernels]]).
  *
  * Packed layout (all doubles; counts are exact below 2^53):
  * {{{ [nPolys, {nRings, {nPts, x0,y0, x1,y1, ...}*}*] }}}
  */
object GeoPack {
  import Geo._

  /** Flatten a (multi)polygon; null for any other geometry (callers fall
    * back to the general WKT kernel for those rows).
    */
  def pack(g: Geom): Array[Double] = g match {
    case GPolygon(rings, _) => packPolys(IndexedSeq(rings))
    case GMultiPolygon(ps, _) => packPolys(ps)
    case _ => null
  }

  private def packPolys(
      polys: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]]): Array[Double] = {
    var size = 1
    polys.foreach { rings =>
      size += 1
      rings.foreach(r => size += 1 + 2 * r.length)
    }
    val out = new Array[Double](size)
    var i = 0
    out(i) = polys.length.toDouble; i += 1
    polys.foreach { rings =>
      out(i) = rings.length.toDouble; i += 1
      rings.foreach { r =>
        out(i) = r.length.toDouble; i += 1
        r.foreach { p => out(i) = p.x; out(i + 1) = p.y; i += 2 }
      }
    }
    out
  }

  /** General TYPE-TAGGED packing for ANY geometry (r17; the
    * geometry-geometry refine's parse-once carrier): `[tag, payload...]`
    * with tag 0=point, 1=multipoint, 2=line, 3=multiline,
    * 4=(multi)polygon (payload = [[pack]]'s layout). An empty point
    * packs as `[0]`. Unpacking rebuilds the exact [[Geo.Geom]], so the
    * refine reuses the ONE kernel — bit-identical answers, no per-pair
    * WKT parse.
    */
  def packAny(g: Geom): Array[Double] = g match {
    case GPoint(None, _) => Array(0d)
    case GPoint(Some(p), _) => Array(0d, p.x, p.y)
    case GMultiPoint(pts, _) =>
      val out = new Array[Double](2 + 2 * pts.length)
      out(0) = 1d; out(1) = pts.length.toDouble
      var i = 0
      pts.foreach { p => out(2 + 2 * i) = p.x; out(3 + 2 * i) = p.y; i += 1 }
      out
    case GLine(pts, _) =>
      val out = new Array[Double](2 + 2 * pts.length)
      out(0) = 2d; out(1) = pts.length.toDouble
      var i = 0
      pts.foreach { p => out(2 + 2 * i) = p.x; out(3 + 2 * i) = p.y; i += 1 }
      out
    case GMultiLine(lines, _) =>
      val size = 2 + lines.map(l => 1 + 2 * l.length).sum
      val out = new Array[Double](size)
      out(0) = 3d; out(1) = lines.length.toDouble
      var i = 2
      lines.foreach { l =>
        out(i) = l.length.toDouble; i += 1
        l.foreach { p => out(i) = p.x; out(i + 1) = p.y; i += 2 }
      }
      out
    case GPolygon(rings, _) => 4d +: packPolys(IndexedSeq(rings))
    case GMultiPolygon(ps, _) => 4d +: packPolys(ps)
  }

  private def readPts(a: ArrayData, off: Int, n: Int): IndexedSeq[Pt] =
    (0 until n).map(i =>
      Pt(a.getDouble(off + 2 * i), a.getDouble(off + 2 * i + 1)))

  /** Rebuild the [[Geo.Geom]] a [[packAny]] array encodes. */
  def unpackAny(a: ArrayData): Geom = a.getDouble(0).toInt match {
    case 0 =>
      if (a.numElements() < 3) GPoint(None)
      else GPoint(Some(Pt(a.getDouble(1), a.getDouble(2))))
    case 1 => GMultiPoint(readPts(a, 2, a.getDouble(1).toInt))
    case 2 => GLine(readPts(a, 2, a.getDouble(1).toInt))
    case 3 =>
      val nLines = a.getDouble(1).toInt
      var i = 2
      val lines = (0 until nLines).map { _ =>
        val n = a.getDouble(i).toInt; i += 1
        val pts = readPts(a, i, n); i += 2 * n
        pts
      }
      GMultiLine(lines)
    case 4 =>
      val nPolys = a.getDouble(1).toInt
      var i = 2
      val polys = (0 until nPolys).map { _ =>
        val nRings = a.getDouble(i).toInt; i += 1
        (0 until nRings).map { _ =>
          val n = a.getDouble(i).toInt; i += 1
          val pts = readPts(a, i, n); i += 2 * n
          pts
        }
      }
      if (nPolys == 1) GPolygon(polys.head) else GMultiPolygon(polys)
  }

  /** Static refine kernel: unpack both sides (array reads, no text) and
    * run the ONE intersects kernel.
    */
  def intersectsPacked(a: ArrayData, b: ArrayData): Boolean =
    Geo.intersects(unpackAny(a), unpackAny(b))

  private val Eps = 1e-9

  /** 2 = interior, 1 = boundary, 0 = outside — bit-identical to
    * [[Geo]]'s ring arithmetic (same crossing + on-segment formulas, same
    * epsilon), so the packed refine answers exactly as the WKT kernel.
    */
  def locate(packed: ArrayData, x: Double, y: Double): Int = {
    var i = 0
    val nPolys = packed.getDouble(i).toInt; i += 1
    var best = 0
    var p = 0
    while (p < nPolys) {
      val nRings = packed.getDouble(i).toInt; i += 1
      var loc = 0
      var r = 0
      while (r < nRings) {
        val nPts = packed.getDouble(i).toInt; i += 1
        if (r == 0) {
          loc = ring(packed, i, nPts, x, y)
        } else if (loc == 2) {
          // holes only matter when the shell said interior
          ring(packed, i, nPts, x, y) match {
            case 2 => loc = 0
            case 1 => loc = 1
            case _ => ()
          }
        }
        i += 2 * nPts
        r += 1
      }
      if (loc > best) best = loc
      if (best == 2) return 2
      p += 1
    }
    best
  }

  /** Ray-cast one ring: 2 inside, 1 on boundary, 0 outside. */
  private def ring(c: ArrayData, off: Int, nPts: Int,
      px: Double, py: Double): Int = {
    var inside = false
    var i = 0
    while (i < nPts - 1) {
      val ax = c.getDouble(off + 2 * i); val ay = c.getDouble(off + 2 * i + 1)
      val bx = c.getDouble(off + 2 * i + 2); val by = c.getDouble(off + 2 * i + 3)
      // onSegment(p, a, b): |cross(a,b,p)| <= eps and p within the bbox
      val cr = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
      if (math.abs(cr) <= Eps &&
          px >= math.min(ax, bx) - Eps && px <= math.max(ax, bx) + Eps &&
          py >= math.min(ay, by) - Eps && py <= math.max(ay, by) + Eps)
        return 1
      if ((ay > py) != (by > py)) {
        val xint = ax + (py - ay) * (bx - ax) / (by - ay)
        if (xint > px) inside = !inside
      }
      i += 1
    }
    if (inside) 2 else 0
  }
}

/** `locate(packed, x, y) >= minLocate` as a whole-stage-codegen predicate:
  * minLocate = 2 is OGC contains (boundary excluded), 1 is intersects.
  */
case class PackedPointInGeom(packed: Expression, xe: Expression,
    ye: Expression, minLocate: Int) extends TernaryExpression {
  override def first: Expression = packed
  override def second: Expression = xe
  override def third: Expression = ye
  override def dataType: DataType = BooleanType
  override def nullSafeEval(p: Any, x: Any, y: Any): Any =
    java.lang.Boolean.valueOf(GeoPack.locate(p.asInstanceOf[ArrayData],
      x.asInstanceOf[Double], y.asInstanceOf[Double]) >= minLocate)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, x, y) =>
      s"${ev.value} = graft.functions.GeoPack.locate($p, $x, $y) >= $minLocate;")
  override protected def withNewChildrenInternal(p: Expression, x: Expression,
      y: Expression): PackedPointInGeom = copy(packed = p, xe = x, ye = y)
}

/** `intersectsPacked(a, b)` as a whole-stage-codegen predicate — the
  * geometry-geometry refine over two [[GeoPack.packAny]] arrays (r17:
  * replaces the per-pair WKT-parsing UDF in SpatialJoin's intersect
  * join).
  */
case class PackedGeomIntersects(a: Expression, b: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = BooleanType
  override def nullSafeEval(x: Any, y: Any): Any =
    java.lang.Boolean.valueOf(GeoPack.intersectsPacked(
      x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.GeoPack.intersectsPacked($x, $y);")
  override protected def withNewChildrenInternal(x: Expression,
      y: Expression): PackedGeomIntersects = copy(a = x, b = y)
}
