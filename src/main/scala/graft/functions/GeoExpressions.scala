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
