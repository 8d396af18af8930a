package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.Geo
import graft.functions.Geo._

/** Geometry kernel + ST_* SQL surface (ref ql/.../udf/esri/). */
class GeoSpec extends AnyFunSuite with Matchers with SparkSpec {

  // ----------------------------------------------------------- kernel: WKT
  test("WKT round-trips every supported kind") {
    val wkts = Seq(
      "POINT (1.5 2.5)",
      "POINT EMPTY",
      "MULTIPOINT ((10 40), (40 30), (20 20))",
      "LINESTRING (0 0, 10 10, 20 5)",
      "MULTILINESTRING ((2 4, 10 10), (20 20, 7 8))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON (((0 0, 0 1, 1 0, 0 0)), ((2 2, 2 3, 3 2, 2 2)))")
    wkts.foreach { w =>
      val g = parseWkt(w)
      assert(g.isDefined, w)
      toWkt(g.get) shouldBe w
    }
  }

  test("WKT parse is case-insensitive, auto-closes rings, rejects garbage") {
    toWkt(parseWkt("point (10.02 20.01)").get) shouldBe "POINT (10.02 20.01)"
    // unclosed polygon ring gets closed (reference accepts both)
    parseWkt("POLYGON ((0 0, 4 0, 4 4, 0 4))").get
      .asInstanceOf[GPolygon].rings.head.length shouldBe 5
    parseWkt("POINT (1)") shouldBe None
    parseWkt("CIRCLE (0 0, 5)") shouldBe None
    parseWkt("POINT (a b)") shouldBe None
    parseWkt(null) shouldBe None
  }

  test("WKB round-trips every supported kind (little-endian OGC layout)") {
    val wkts = Seq(
      "POINT (1.5 2.5)",
      "MULTIPOINT ((10 40), (40 30))",
      "LINESTRING (0 0, 10 10, 20 5)",
      "MULTILINESTRING ((2 4, 10 10), (20 20, 7 8))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON (((0 0, 0 1, 1 0, 0 0)))")
    wkts.foreach { w =>
      val g = parseWkt(w).get
      fromWkb(toWkb(g)).map(toWkt) shouldBe Some(w)
    }
    // point WKB is the canonical 21 bytes
    toWkb(parseWkt("POINT (1 2)").get).length shouldBe 21
  }

  test("GeoJSON round-trips through fromGeoJson for every kind") {
    val wkts = Seq(
      "POINT (1.5 2.5)",
      "MULTIPOINT ((10 40), (40 30))",
      "LINESTRING (0 0, 10 10, 20 5)",
      "MULTILINESTRING ((2 4, 10 10), (20 20, 7 8))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON (((0 0, 0 1, 1 0, 0 0)), ((2 2, 2 3, 3 2, 2 2)))")
    wkts.foreach { w =>
      val g = parseWkt(w).get
      fromGeoJson(toGeoJson(g)).map(toWkt) shouldBe Some(w)
    }
    // member order + whitespace tolerated; garbage rejected
    fromGeoJson("""{ "coordinates": [3, 4], "type": "Point" }""")
      .map(toWkt) shouldBe Some("POINT (3 4)")
    fromGeoJson("""{"type":"Banana","coordinates":[1,2]}""") shouldBe None
    fromGeoJson("not json") shouldBe None
    fromGeoJson(null) shouldBe None
  }

  // ------------------------------------------------------ kernel: measures
  test("area: shoelace with holes subtracted; multipolygon sums") {
    area(parseWkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))").get) shouldBe 100.0
    area(parseWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))").get) shouldBe 96.0
    area(parseWkt(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))").get) shouldBe 5.0
    area(parseWkt("LINESTRING (0 0, 5 5)").get) shouldBe 0.0
  }

  test("length: segment sums for lines, perimeter for polygons") {
    Geo.length(parseWkt("LINESTRING (0 0, 3 4)").get) shouldBe 5.0
    Geo.length(parseWkt("LINESTRING (0 0, 3 4, 3 10)").get) shouldBe 11.0
    Geo.length(parseWkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))").get) shouldBe 40.0
  }

  test("distance: point/segment/polygon combinations") {
    def d(a: String, b: String) = distance(parseWkt(a).get, parseWkt(b).get).get
    d("POINT (0 0)", "POINT (3 4)") shouldBe 5.0
    d("POINT (5 5)", "LINESTRING (0 10, 10 10)") shouldBe 5.0
    // inside -> 0; outside polygon edge distance
    d("POINT (5 5)", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))") shouldBe 0.0
    d("POINT (15 5)", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))") shouldBe 5.0
    d("LINESTRING (0 0, 0 10)", "LINESTRING (4 0, 4 10)") shouldBe 4.0
    // crossing segments -> 0
    d("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)") shouldBe 0.0
  }

  test("haversine matches the reference constant and a known city pair") {
    // Paris (2.3522, 48.8566) -> London (-0.1276, 51.5072) ~ 343.5 km
    val m = haversine(2.3522, 48.8566, -0.1276, 51.5072)
    m should be(343500.0 +- 2000.0)
    Geo.EarthRadiusMeters shouldBe 6371008.0 // ref esri/Haversine.java:31
  }

  test("centroid: point mean, length-weighted line, area-weighted polygon") {
    centroid(parseWkt("MULTIPOINT ((0 0), (2 0), (2 2), (0 2))").get).get shouldBe Pt(1, 1)
    centroid(parseWkt("LINESTRING (0 0, 10 0)").get).get shouldBe Pt(5, 0)
    centroid(parseWkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))").get).get shouldBe Pt(2, 2)
    // L-shape: area centroid is NOT the vertex mean
    val l = parseWkt("POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))").get
    val c = centroid(l).get
    c.x should be(0.8333333 +- 1e-6)
    c.y should be(0.8333333 +- 1e-6)
  }

  // ----------------------------------------------------- kernel: relations
  val box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
  val boxWithHole = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"

  def rel(f: (Geom, Geom) => Boolean)(a: String, b: String): Boolean =
    f(parseWkt(a).get, parseWkt(b).get)

  test("contains: interior yes, boundary no, hole no (OGC semantics)") {
    rel(contains)(box, "POINT (5 5)") shouldBe true
    rel(contains)(box, "POINT (0 5)") shouldBe false // boundary point not contained
    rel(contains)(box, "POINT (15 5)") shouldBe false
    rel(contains)(boxWithHole, "POINT (5 5)") shouldBe false // inside the hole
    rel(contains)(boxWithHole, "POINT (2 2)") shouldBe true
    rel(contains)(box, "LINESTRING (1 1, 9 9)") shouldBe true
    rel(contains)(box, "LINESTRING (1 1, 15 15)") shouldBe false
    rel(contains)(box, "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))") shouldBe true
    rel(contains)("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))", box) shouldBe false
    rel(within)("POINT (5 5)", box) shouldBe true
  }

  test("contains rejects a shape whose vertices are inside but edges exit") {
    // U-shaped container, segment spans the notch: vertices inside, middle outside
    val u = "POLYGON ((0 0, 10 0, 10 10, 7 10, 7 3, 3 3, 3 10, 0 10, 0 0))"
    rel(contains)(u, "LINESTRING (1 8, 9 8)") shouldBe false
    rel(contains)(u, "LINESTRING (1 1, 9 1)") shouldBe true
  }

  test("intersects / disjoint / envIntersects") {
    rel(intersects)(box, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))") shouldBe true
    rel(intersects)(box, "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))") shouldBe false
    rel(disjoint)(box, "POINT (20 20)") shouldBe true
    // envelopes overlap but shapes don't: env-only test says true, real test false
    val tri1 = "POLYGON ((0 0, 10 0, 0 10, 0 0))"
    val tri2 = "POLYGON ((9.5 9.5, 10 9.5, 10 10, 9.5 9.5))"
    rel(intersects)(tri1, tri2) shouldBe false
    envIntersects(parseWkt(tri1).get, parseWkt(tri2).get) shouldBe Some(true)
    // two crossing lines with no shared vertex
    rel(intersects)("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)") shouldBe true
  }

  test("touches: boundary-only contact") {
    rel(touches)(box, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))") shouldBe true // shared edge
    rel(touches)(box, "POINT (0 5)") shouldBe true // point on boundary
    rel(touches)(box, "POINT (5 5)") shouldBe false // interior
    rel(touches)(box, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))") shouldBe false // overlap
    rel(touches)("LINESTRING (0 0, 5 5)", "LINESTRING (5 5, 10 0)") shouldBe true // endpoint meet
  }

  test("crosses: lines crossing at interior point; line through polygon") {
    rel(crosses)("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)") shouldBe true
    rel(crosses)("LINESTRING (0 0, 5 5)", "LINESTRING (5 5, 10 0)") shouldBe false // touch only
    rel(crosses)("LINESTRING (-5 5, 15 5)", box) shouldBe true // enters and exits
    rel(crosses)("LINESTRING (1 1, 9 9)", box) shouldBe false // wholly inside
  }

  test("overlaps: partial same-dimension overlap only") {
    rel(overlaps)(box, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))") shouldBe true
    rel(overlaps)(box, "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))") shouldBe false // contained
    rel(overlaps)(box, "LINESTRING (5 5, 15 15)") shouldBe false // dim mismatch
    rel(overlaps)("LINESTRING (0 0, 10 0)", "LINESTRING (5 0, 15 0)") shouldBe true
  }

  test("geomEquals tolerates ring rotation via double containment") {
    rel(geomEquals)(box, "POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))") shouldBe true
    rel(geomEquals)(box, "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))") shouldBe false
  }

  // ---------------------------------------------------- kernel: processing
  test("convex hull: monotone chain") {
    val hull = convexHull(parseWkt(
      "MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5), (2 3))").get).get
    area(hull) shouldBe 100.0
    hull.kind shouldBe "POLYGON"
    convexHull(parseWkt("MULTIPOINT ((1 1))").get).get.kind shouldBe "POINT"
    convexHull(parseWkt("MULTIPOINT ((0 0), (5 5))").get).get.kind shouldBe "LINESTRING"
  }

  test("buffer: point disc area converges to pi*r^2") {
    val disc = buffer(parseWkt("POINT (0 0)").get, 2.0, nSides = 256).get
    area(disc) should be(math.Pi * 4 +- 0.01)
    // envelope-expansion fallback for lines is the documented approximation
    val lineBuf = buffer(parseWkt("LINESTRING (0 0, 10 0)").get, 1.0).get
    area(lineBuf) shouldBe 24.0 // (10+2) x 2 envelope ring
  }

  test("intersection: point membership, polygon clip, line clip") {
    def ix(a: String, b: String) =
      intersection(parseWkt(a).get, parseWkt(b).get).map(toWkt)
    ix("POINT (5 5)", box) shouldBe Some("POINT (5 5)")
    ix("POINT (50 5)", box) shouldBe Some("POINT EMPTY")
    // half-overlapping unit squares -> 0.5-width strip
    val clipped = intersection(
      parseWkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))").get,
      parseWkt("POLYGON ((0.5 0, 1.5 0, 1.5 1, 0.5 1, 0.5 0))").get).get
    area(clipped) should be(0.5 +- 1e-9)
    // line clipped to the box interior
    val seg = intersection(parseWkt("LINESTRING (-5 5, 15 5)").get, parseWkt(box).get).get
    Geo.length(seg) should be(10.0 +- 1e-9)
    ix("MULTIPOINT ((5 5), (50 5))", box) shouldBe Some("MULTIPOINT ((5 5))")
  }

  test("boundary: line endpoints, polygon rings") {
    boundary(parseWkt("LINESTRING (0 0, 5 5)").get).map(toWkt) shouldBe
      Some("MULTIPOINT ((0 0), (5 5))")
    boundary(parseWkt(box).get).get.kind shouldBe "LINESTRING"
    boundary(parseWkt(boxWithHole).get).get.kind shouldBe "MULTILINESTRING"
  }

  test("bins: id/envelope round-trip matches the reference addressing math") {
    val bins = new Bins(1.0)
    val id = bins.id(10.25, 20.75)
    val (x0, y0, x1, y1) = bins.envelopeOf(id)
    x0 should be <= 10.25; x1 should be >= 10.25
    y0 should be <= 20.75; y1 should be >= 20.75
    (x1 - x0) shouldBe 1.0 +- 1e-9
    // neighboring x falls in the adjacent cell
    bins.id(11.25, 20.75) shouldBe id + 1
    // fractional bin sizes shrink the addressable extent (ref BinUtils.java:36)
    val half = new Bins(0.5)
    val id2 = half.id(0.25, 0.25)
    val env2 = half.envelopeOf(id2)
    env2._1 should be <= 0.25; env2._3 should be >= 0.25
  }

  // -------------------------------------------------------- SQL surface
  test("ST_* SQL surface: constructors, accessors, measures, predicates") {
    val row = spark.sql("""
      SELECT
        ST_AsText(ST_Point(1.5, 2.5))                                     AS p,
        ST_X(ST_Point(1.5, 2.5))                                          AS x,
        ST_GeometryType(ST_GeomFromText('polygon ((0 0, 0 10, 10 10, 0 0))')) AS gt,
        ST_Area(ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')) AS a,
        ST_Length(ST_GeomFromText('LINESTRING (0 0, 3 4)'))               AS len,
        ST_Distance(ST_Point(0, 0), ST_Point(3, 4))                       AS d,
        ST_Contains(ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), ST_Point(5, 5)) AS cont,
        ST_Intersects(ST_GeomFromText('LINESTRING (0 0, 10 10)'),
                      ST_GeomFromText('LINESTRING (0 10, 10 0)'))          AS ix,
        ST_NumPoints(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2)'))        AS np,
        ST_AsText(ST_Centroid(ST_GeomFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))) AS c,
        ST_Bin(1.0, ST_Point(10.25, 20.75))                                AS bin,
        ST_SRID(ST_Point(1, 2))                                            AS srid,
        ST_IsEmpty(ST_GeomFromText('POINT EMPTY'))                         AS emp,
        ST_AsText(ST_GeomFromWKB(ST_AsBinary(ST_Point(7, 8))))             AS wkbrt,
        ST_AsGeoJson(ST_Point(1, 2))                                       AS gj
    """).collect()(0)
    row.getAs[String]("p") shouldBe "POINT (1.5 2.5)"
    row.getAs[Double]("x") shouldBe 1.5
    row.getAs[String]("gt") shouldBe "ST_POLYGON"
    row.getAs[Double]("a") shouldBe 100.0
    row.getAs[Double]("len") shouldBe 5.0
    row.getAs[Double]("d") shouldBe 5.0
    row.getAs[Boolean]("cont") shouldBe true
    row.getAs[Boolean]("ix") shouldBe true
    row.getAs[Int]("np") shouldBe 3
    row.getAs[String]("c") shouldBe "POINT (2 2)"
    row.getAs[Int]("srid") shouldBe 0
    row.getAs[Boolean]("emp") shouldBe true
    row.getAs[String]("wkbrt") shouldBe "POINT (7 8)"
    row.getAs[String]("gj") shouldBe """{"type":"Point","coordinates":[1,2]}"""
    val bins = new Bins(1.0)
    row.getAs[Long]("bin") shouldBe bins.id(10.25, 20.75)
  }

  test("ST_* SQL surface: null/invalid inputs yield NULL, not errors") {
    val row = spark.sql("""
      SELECT
        ST_GeomFromText('NOT A SHAPE') AS bad,
        ST_Area(CAST(NULL AS STRING))  AS nularea,
        ST_X(ST_GeomFromText('LINESTRING (0 0, 1 1)')) AS xline,
        ST_Distance(ST_Point(0,0), CAST(NULL AS STRING)) AS nuldist
    """).collect()(0)
    row.isNullAt(0) shouldBe true
    row.isNullAt(1) shouldBe true
    row.isNullAt(2) shouldBe true // ST_X defined only for points
    row.isNullAt(3) shouldBe true
  }

  test("st_bin powers a spatial GROUP BY; st_binenvelope contains its points") {
    import spark.implicits._
    // the reference grid's cell boundaries sit on the half-integers for
    // binSize=1 (extent is an odd count of cells centered at the origin,
    // ref esri/BinUtils.java:32-40) — pick pairs that co-bin under it
    val pts = Seq((0.6, 0.6), (1.4, 1.4), (5.6, 5.6), (6.4, 6.4))
      .toDF("x", "y")
      .selectExpr("x", "y", "st_bin(1.0, st_point(x, y)) AS bin")
    val counts = pts.groupBy("bin").count().collect()
    counts.map(_.getAs[Long]("count")).sorted.toSeq shouldBe Seq(2L, 2L)
    // every point sits inside its bin envelope
    val ok = pts.selectExpr(
      "st_contains(st_binenvelope(1.0, bin), st_point(x, y)) OR " +
        "st_touches(st_binenvelope(1.0, bin), st_point(x, y)) AS ok")
      .collect().forall(_.getAs[Boolean]("ok"))
    ok shouldBe true
  }

  test("st_aggr_convexhull dissolves grouped points into one hull") {
    import spark.implicits._
    val df = Seq(
      ("a", 0.0, 0.0), ("a", 4.0, 0.0), ("a", 4.0, 4.0), ("a", 0.0, 4.0), ("a", 2.0, 2.0),
      ("b", 0.0, 0.0), ("b", 1.0, 0.0))
      .toDF("g", "x", "y")
      .selectExpr("g", "st_point(x, y) AS pt")
    val hulls = df.groupBy("g").agg(
      org.apache.spark.sql.functions.expr("st_aggr_convexhull(pt)").as("hull"))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[String]("hull")).toMap
    area(parseWkt(hulls("a")).get) shouldBe 16.0
    parseWkt(hulls("b")).get.kind shouldBe "LINESTRING"
  }
}
