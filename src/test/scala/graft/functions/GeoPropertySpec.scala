package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.Geo._

/** Property net over the geometry kernel: 500 random geometries (valid
  * polygons built as convex hulls of random point clouds), invariants that
  * must hold for ANY input — codec round-trips, relation implications,
  * metric symmetry, envelope/bin consistency.
  */
class GeoPropertySpec extends AnyFunSuite with Matchers {

  private val rnd = new scala.util.Random(20260814L)

  private def rndPt(): Pt = Pt(
    math.rint((rnd.nextDouble() * 100 - 50) * 100) / 100,
    math.rint((rnd.nextDouble() * 100 - 50) * 100) / 100)

  /** A valid random geometry; polygons via convex hull (always simple). */
  private def rndGeom(): Geom = rnd.nextInt(5) match {
    case 0 => GPoint(Some(rndPt()))
    case 1 => GMultiPoint(Vector.fill(1 + rnd.nextInt(5))(rndPt()).distinct)
    case 2 => GLine(Vector.fill(2 + rnd.nextInt(4))(rndPt()).distinct match {
      case v if v.length >= 2 => v
      case v => v ++ Vector(Pt(v.head.x + 1, v.head.y))
    })
    case _ =>
      convexHull(GMultiPoint(Vector.fill(4 + rnd.nextInt(6))(rndPt()).distinct)) match {
        case Some(p: GPolygon) => p
        case _ => GPoint(Some(rndPt())) // degenerate cloud collapsed
      }
  }

  private val geoms = Vector.fill(500)(rndGeom())
  private val pairs = Vector.fill(300)((rndGeom(), rndGeom()))

  test("WKT, WKB, and GeoJSON round-trip every random geometry") {
    geoms.foreach { g =>
      val w = toWkt(g)
      withClue(w) {
        parseWkt(w).map(toWkt) shouldBe Some(w)
        fromWkb(toWkb(g)).map(toWkt) shouldBe Some(w)
        fromGeoJson(toGeoJson(g)).map(toWkt) shouldBe Some(w)
      }
    }
  }

  test("envelope bounds every vertex; centroid lies inside the envelope") {
    geoms.filterNot(_.isEmpty).foreach { g =>
      val (x0, y0, x1, y1) = envelope(g).get
      g.vertices.foreach { p =>
        p.x should (be >= x0 and be <= x1)
        p.y should (be >= y0 and be <= y1)
      }
      centroid(g).foreach { c =>
        c.x should (be >= x0 - 1e-9 and be <= x1 + 1e-9)
        c.y should (be >= y0 - 1e-9 and be <= y1 + 1e-9)
      }
    }
  }

  test("convex hull is idempotent and never shrinks area") {
    geoms.foreach { g =>
      convexHull(g).foreach { h =>
        area(h) should be >= area(g) - 1e-9
        convexHull(h).foreach { h2 =>
          area(h2) shouldBe area(h) +- 1e-9
        }
      }
    }
  }

  test("relation implications hold on every random pair") {
    pairs.foreach { case (a, b) =>
      val clue = s"${toWkt(a)} vs ${toWkt(b)}"
      withClue(clue) {
        val inter = intersects(a, b)
        disjoint(a, b) shouldBe !inter
        if (contains(a, b)) inter shouldBe true
        if (within(a, b)) contains(b, a) shouldBe true
        if (touches(a, b)) { inter shouldBe true; contains(a, b) shouldBe false }
        if (inter && !a.isEmpty && !b.isEmpty)
          envIntersects(a, b) shouldBe Some(true)
        // intersects is symmetric
        intersects(b, a) shouldBe inter
      }
    }
  }

  test("distance is symmetric, non-negative, zero iff intersecting") {
    pairs.foreach { case (a, b) =>
      if (!a.isEmpty && !b.isEmpty) {
        val d1 = distance(a, b).get
        val d2 = distance(b, a).get
        withClue(s"${toWkt(a)} vs ${toWkt(b)}: ") {
          d1 shouldBe d2 +- 1e-9
          d1 should be >= 0.0
          if (intersects(a, b)) d1 shouldBe 0.0
          else d1 should be > 0.0
        }
      }
    }
  }

  test("polygon contains its own centroid's point geometry or touches it") {
    geoms.collect { case p: GPolygon if area(p) > 1e-6 => p }.foreach { p =>
      val c = centroid(p).get
      // convex polygon: centroid strictly interior
      withClue(toWkt(p)) {
        contains(p, GPoint(Some(c))) shouldBe true
      }
    }
  }

  test("every point lands inside its bin envelope for random bin sizes") {
    Seq(0.25, 1.0, 7.5).foreach { size =>
      val bins = new Bins(size)
      (0 until 200).foreach { _ =>
        val p = rndPt()
        val (x0, y0, x1, y1) = bins.envelopeOf(bins.id(p.x, p.y))
        p.x should (be >= x0 - 1e-6 and be <= x1 + 1e-6)
        p.y should (be >= y0 - 1e-6 and be <= y1 + 1e-6)
      }
    }
  }

  test("clip intersection area never exceeds either operand") {
    val rects = Vector.fill(100) {
      val x0 = rnd.nextDouble() * 40; val y0 = rnd.nextDouble() * 40
      val w = rnd.nextDouble() * 20 + 0.5; val h = rnd.nextDouble() * 20 + 0.5
      GPolygon(Vector(Vector(Pt(x0, y0), Pt(x0 + w, y0), Pt(x0 + w, y0 + h),
        Pt(x0, y0 + h), Pt(x0, y0))))
    }
    rects.sliding(2).foreach { case Vector(a, b) =>
      intersection(a, b).foreach { ix =>
        val ar = area(ix)
        ar should be <= math.min(area(a), area(b)) + 1e-6
        // overlap area equals the closed-form rectangle overlap
        val (ax0, ay0, ax1, ay1) = envelope(a).get
        val (bx0, by0, bx1, by1) = envelope(b).get
        val expected = math.max(0, math.min(ax1, bx1) - math.max(ax0, bx0)) *
          math.max(0, math.min(ay1, by1) - math.max(ay0, by0))
        ar shouldBe expected +- 1e-6
      }
      if (intersects(a, b) && area(a) > 1e-9) intersection(a, b) should not be None
    }
  }
}
