package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Bin-bucketed spatial join: equals brute force, never a cartesian plan. */
class SpatialJoinSpec extends SparkSpec with Matchers {
  import org.apache.spark.sql.functions._

  lazy val points = {
    import spark.implicits._
    (0 until 400).map { i =>
      (i.toLong, (i % 40) * 0.7, ((i * 13) % 37) * 0.9)
    }.toDF("pid", "x", "y")
  }

  lazy val polys = {
    import spark.implicits._
    // axis-aligned rects + one triangle + one concave + one with a hole
    (Seq(
      (0L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      (1L, "POLYGON ((5 5, 20 5, 20 20, 5 20, 5 5))"),
      (2L, "POLYGON ((15 0, 27 0, 21 30, 15 0))"),
      (3L, "POLYGON ((0 20, 28 20, 28 33, 0 33, 0 20), (10 22, 20 22, 20 30, 10 30, 10 22))"),
      (4L, "POLYGON ((30 30, 40 30, 40 40, 30 40, 30 30))")) // empty region
      ).toDF("polyid", "wkt")
  }

  def bruteForce(predicate: String): Set[(Long, Long)] = {
    import graft.functions.Geo
    val ps = points.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val gs = polys.collect().map(r => (r.getLong(r.fieldIndex("polyid")),
      Geo.parseWkt(r.getAs[String]("wkt")).get))
    (for {
      (pid, x, y) <- ps
      (gid, g) <- gs
      pt = Geo.GPoint(Some(Geo.Pt(x, y)))
      hit = if (predicate == "contains") Geo.contains(g, pt) else Geo.intersects(g, pt)
      if hit
    } yield (pid, gid)).toSet
  }

  test("contains join matches brute force across bin sizes") {
    for (binSize <- Seq(1.0, 4.0, 50.0)) {
      val got = SpatialJoin.pointsInPolygons(points, "x", "y", polys, "wkt", binSize)
        .select("pid", "polyid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe bruteForce("contains")
    }
  }

  test("intersects join includes boundary points") {
    val got = SpatialJoin.pointsInPolygons(points, "x", "y", polys, "wkt", 5.0, "intersects")
      .select("pid", "polyid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = bruteForce("intersects")
    got shouldBe brute
    // boundary-only pairs exist in intersects but not contains (x=7.0,y=0 style)
    (brute -- bruteForce("contains")) should not be empty
  }

  test("the plan is an equi-join on the cell id, not a cartesian product") {
    val plan = SpatialJoin.pointsInPolygons(points, "x", "y", polys, "wkt", 5.0)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("randomized net: 300 points x 40 random polygons equal brute force") {
    import spark.implicits._
    import graft.functions.Geo
    val rnd = new scala.util.Random(20260814L) // fixed seed: deterministic spec
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextDouble() * 60 - 5, rnd.nextDouble() * 60 - 5)).toList
    def rect(): String = {
      val x0 = rnd.nextDouble() * 50; val y0 = rnd.nextDouble() * 50
      val w = rnd.nextDouble() * 12 + 0.5; val h = rnd.nextDouble() * 12 + 0.5
      s"POLYGON (($x0 $y0, ${x0 + w} $y0, ${x0 + w} ${y0 + h}, $x0 ${y0 + h}, $x0 $y0))"
    }
    def tri(): String = {
      // CCW triangle: sort three random points, orientation-fix via kernel parse
      val Seq(a, b, c) = Seq.fill(3)((rnd.nextDouble() * 50, rnd.nextDouble() * 50))
      s"POLYGON ((${a._1} ${a._2}, ${b._1} ${b._2}, ${c._1} ${c._2}, ${a._1} ${a._2}))"
    }
    def ell(): String = {
      // concave L: outer rect minus a corner notch, built as one ring
      val x0 = rnd.nextDouble() * 40; val y0 = rnd.nextDouble() * 40
      val w = rnd.nextDouble() * 10 + 4; val h = rnd.nextDouble() * 10 + 4
      val nw = w * (0.3 + rnd.nextDouble() * 0.4); val nh = h * (0.3 + rnd.nextDouble() * 0.4)
      s"POLYGON (($x0 $y0, ${x0 + w} $y0, ${x0 + w} ${y0 + h - nh}, " +
        s"${x0 + w - nw} ${y0 + h - nh}, ${x0 + w - nw} ${y0 + h}, $x0 ${y0 + h}, $x0 $y0))"
    }
    val polyRows = (0 until 40).map { i =>
      (i.toLong, i % 3 match { case 0 => rect(); case 1 => tri(); case 2 => ell() })
    }.toList
    val pDf = pts.toDF("pid", "x", "y")
    val gDf = polyRows.toDF("polyid", "wkt")
    val brute = (for {
      (pid, x, y) <- pts
      (gid, w) <- polyRows
      g = Geo.parseWkt(w).get
      if Geo.contains(g, Geo.GPoint(Some(Geo.Pt(x, y))))
    } yield (pid, gid)).toSet
    for (binSize <- Seq(2.0, 11.0)) {
      val got = SpatialJoin.pointsInPolygons(pDf, "x", "y", gDf, "wkt", binSize)
        .select("pid", "polyid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe brute
    }
    brute should not be empty
  }

  test("geometry-geometry join: exact pairs, no duplicates across bin sizes") {
    import spark.implicits._
    import graft.functions.Geo
    val rnd = new scala.util.Random(77L)
    def rect(): String = {
      val x0 = rnd.nextDouble() * 40; val y0 = rnd.nextDouble() * 40
      val w = rnd.nextDouble() * 15 + 1; val h = rnd.nextDouble() * 15 + 1
      s"POLYGON (($x0 $y0, ${x0 + w} $y0, ${x0 + w} ${y0 + h}, $x0 ${y0 + h}, $x0 $y0))"
    }
    def line(): String = {
      val x0 = rnd.nextDouble() * 50; val y0 = rnd.nextDouble() * 50
      s"LINESTRING ($x0 $y0, ${x0 + rnd.nextDouble() * 20 - 10} ${y0 + rnd.nextDouble() * 20 - 10})"
    }
    val as = (0 until 30).map(i => (i.toLong, if (i % 2 == 0) rect() else line())).toList
    val bs = (0 until 30).map(i => (i.toLong, rect())).toList
    val brute = (for {
      (ia, wa) <- as; (ib, wb) <- bs
      if Geo.intersects(Geo.parseWkt(wa).get, Geo.parseWkt(wb).get)
    } yield (ia, ib)).toSet
    brute should not be empty
    for (binSize <- Seq(3.0, 10.0)) {
      val rows = SpatialJoin.geometriesIntersecting(
        as.toDF("ida", "wa"), "wa", bs.toDF("idb", "wb"), "wb", binSize)
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
      rows.length shouldBe rows.toSet.size // reporting-cell dedup: exactly once
      rows.toSet shouldBe brute
    }
  }

  test("packed refine kernel is bit-identical to the WKT kernel") {
    import graft.functions.{Geo, GeoPack}
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(4242L)
    // random polygons incl. holes + multipolygons; probe a dense grid PLUS
    // exact vertices/edge midpoints (the boundary cases where an epsilon
    // mismatch between the two kernels would hide)
    val wkts = Seq(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      "POLYGON ((0 20, 28 20, 28 33, 0 33, 0 20), (10 22, 20 22, 20 30, 10 30, 10 22))",
      "POLYGON ((15 0, 27 0, 21 30, 15 0))",
      "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((20 20, 30 20, 30 30, 20 30, 20 20), (22 22, 28 22, 28 28, 22 28, 22 22)))"
    ) ++ (0 until 20).map { _ =>
      val x0 = rnd.nextDouble() * 30; val y0 = rnd.nextDouble() * 30
      val w = rnd.nextDouble() * 12 + 0.5; val h = rnd.nextDouble() * 12 + 0.5
      s"POLYGON (($x0 $y0, ${x0 + w} $y0, ${x0 + w} ${y0 + h}, $x0 ${y0 + h}, $x0 $y0))"
    }
    var checked = 0
    wkts.foreach { w =>
      val g = Geo.parseWkt(w).get
      val packed = GeoPack.pack(g)
      packed should not be null
      val ad = ArrayData.toArrayData(packed)
      val vertexProbes = w.replaceAll("[A-Z()]", "").split(",").toSeq
        .map(_.trim.split("\\s+")).collect { case Array(a, b) =>
          (a.toDouble, b.toDouble) }
      val probes = (for (i <- 0 until 30; j <- 0 until 30)
        yield (i * 1.2 - 2.0, j * 1.2 - 2.0)) ++ vertexProbes ++
        vertexProbes.sliding(2).collect { case Seq((ax, ay), (bx, by)) =>
          ((ax + bx) / 2, (ay + by) / 2) }.toSeq
      probes.foreach { case (x, y) =>
        val pt = Geo.GPoint(Some(Geo.Pt(x, y)))
        val wktContains = Geo.contains(g, pt)
        val wktIntersects = Geo.intersects(g, pt)
        val loc = GeoPack.locate(ad, x, y)
        assert((loc >= 2) === wktContains, s"contains mismatch at ($x,$y) on $w")
        assert((loc >= 1) === wktIntersects, s"intersects mismatch at ($x,$y) on $w")
        checked += 1
      }
    }
    assert(checked > 20000)
    // non-polygon geometries decline packing (join falls back to WKT kernel)
    assert(GeoPack.pack(Geo.parseWkt("LINESTRING (0 0, 5 5)").get) == null)
    assert(GeoPack.pack(Geo.parseWkt("POINT (1 2)").get) == null)
  }

  test("a join over mixed polygon/non-polygon geometries still matches brute force") {
    import spark.implicits._
    import graft.functions.Geo
    // a LINESTRING in the polys column exercises the fallback branch
    val mixed = (Seq(
      (0L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      (1L, "LINESTRING (0 0, 20 20)"),
      (2L, "POLYGON ((5 5, 20 5, 20 20, 5 20, 5 5))"))).toDF("polyid", "wkt")
    val pts = Seq((0L, 5.0, 5.0), (1L, 3.0, 3.0), (2L, 15.0, 15.0),
      (3L, 25.0, 25.0)).toDF("pid", "x", "y")
    val brute = (for {
      r <- pts.collect(); s <- mixed.collect()
      g = Geo.parseWkt(s.getString(1)).get
      if Geo.intersects(g, Geo.GPoint(Some(Geo.Pt(r.getDouble(1), r.getDouble(2)))))
    } yield (r.getLong(0), s.getLong(0))).toSet
    val got = SpatialJoin.pointsInPolygons(pts, "x", "y", mixed, "wkt", 5.0,
        "intersects")
      .select("pid", "polyid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe brute
    assert(brute.contains((1L, 1L)), "the line fallback row must match")
  }

  test("a point in a polygon hole is excluded") {
    import spark.implicits._
    val pt = Seq((99L, 15.0, 25.0)).toDF("pid", "x", "y") // inside polyid=3's hole
    val got = SpatialJoin.pointsInPolygons(pt, "x", "y", polys, "wkt", 5.0)
      .select("polyid").collect().map(_.getLong(0)).toSet
    got shouldBe Set.empty
  }
}
