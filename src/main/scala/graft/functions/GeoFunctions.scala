package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the geospatial surface (SURVEY §2.5 geospatial row;
  * ref ql/src/java/org/apache/hadoop/hive/ql/udf/esri/ — the reference wraps
  * the ESRI geometry library in ~70 `ST_*` GenericUDFs).
  *
  * Geometries are WKT strings on the wire (so they parquet-serialize, group,
  * and join with zero extra machinery); every function is a deterministic
  * Scala UDF over [[Geo]]'s planar kernel. These are not hot-loop primitives
  * like the hash/vector kernels (which are codegen'd Expressions) — the
  * reference's own implementations are per-row GenericUDFs over an external
  * library, and the scale path for spatial aggregation is `st_bin`, a
  * map-side cell id that turns spatial GROUP BY / joins into plain keyed
  * relational operations (ref esri/BinUtils.java).
  *
  * Names are registered lowercase; Spark SQL resolves function names
  * case-insensitively, so `ST_Point(...)` works as in the reference.
  */
object GeoFunctions {
  import Geo._

  private val registeredSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  // -- WKT-level helpers (null-safe: null/invalid input -> SQL NULL).
  // Parses are memoized per-thread (Geo.parseWktCached): predicates evaluate
  // repeated geometry text per row, so the parse cost must not be per-row.
  private def g1[T](f: Geom => Option[T]): String => T =
    wkt => parseWktCached(wkt).flatMap(f).getOrElse(null.asInstanceOf[T])
  private def g2[T](f: (Geom, Geom) => Option[T]): (String, String) => T =
    (a, b) => (for (ga <- parseWktCached(a); gb <- parseWktCached(b); r <- f(ga, gb)) yield r)
      .getOrElse(null.asInstanceOf[T])

  def registerAll(spark: SparkSession): Unit = {
    if (registeredSessions.put(spark, java.lang.Boolean.TRUE) != null) return
    val u = spark.udf

    // ------------------------------------------------------- constructors
    u.register("st_point", (x: Double, y: Double) => toWkt(GPoint(Some(Pt(x, y)))))
    u.register("st_geomfromtext", (wkt: String) => parseWkt(wkt).map(toWkt).orNull)
    u.register("st_astext", (wkt: String) => parseWkt(wkt).map(toWkt).orNull)
    u.register("st_linestring", (xs: Seq[Double], ys: Seq[Double]) =>
      if (xs == null || ys == null || xs.length != ys.length || xs.length < 2) null
      else toWkt(GLine(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toVector)))
    u.register("st_polygon", (xs: Seq[Double], ys: Seq[Double]) =>
      if (xs == null || ys == null || xs.length != ys.length || xs.length < 3) null
      else {
        val ring = xs.zip(ys).map { case (x, y) => Pt(x, y) }.toVector
        toWkt(GPolygon(Vector(if (ring.head == ring.last) ring else ring :+ ring.head)))
      })
    u.register("st_multipoint", (xs: Seq[Double], ys: Seq[Double]) =>
      if (xs == null || ys == null || xs.length != ys.length) null
      else toWkt(GMultiPoint(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toVector)))
    u.register("st_asbinary", (wkt: String) => parseWkt(wkt).map(toWkb).orNull)
    u.register("st_geomfromwkb", (b: Array[Byte]) => fromWkb(b).map(toWkt).orNull)
    u.register("st_asgeojson", (wkt: String) => parseWkt(wkt).map(toGeoJson).orNull)
    u.register("st_geomfromgeojson", (js: String) => fromGeoJson(js).map(toWkt).orNull)
    // ST_AsJson / ST_GeomFromJson speak ESRI REST JSON, not GeoJSON — the
    // reference keeps the two dialects on separate names (ref esri/
    // ST_AsJson.java vs ST_AsGeoJson.java); mirrored here
    u.register("st_asjson", (wkt: String) => parseWkt(wkt).map(toEsriJson).orNull)
    u.register("st_geomfromjson", (js: String) => fromEsriJson(js).map(toWkt).orNull)

    // ---------------------------------------------------------- accessors
    u.register("st_geometrytype", (wkt: String) =>
      parseWkt(wkt).map(g => "ST_" + g.kind).orNull) // "ST_POINT" etc, ref esri/ST_GeometryType.java:34-58
    u.register("st_x", g1[java.lang.Double] {
      case GPoint(Some(p), _) => Some(p.x); case _ => None })
    u.register("st_y", g1[java.lang.Double] {
      case GPoint(Some(p), _) => Some(p.y); case _ => None })
    u.register("st_minx", g1[java.lang.Double](g => envelope(g).map(_._1)))
    u.register("st_miny", g1[java.lang.Double](g => envelope(g).map(_._2)))
    u.register("st_maxx", g1[java.lang.Double](g => envelope(g).map(_._3)))
    u.register("st_maxy", g1[java.lang.Double](g => envelope(g).map(_._4)))
    u.register("st_numpoints", g1[java.lang.Integer] {
      // ref esri/ST_NumPoints.java: polygons count the closing vertex per ring
      case GPoint(p, _) => Some(p.size)
      case g => Some(g.vertices.length)
    })
    u.register("st_pointn", (wkt: String, n: Int) =>
      (parseWkt(wkt) match {
        case Some(GLine(ps, _)) if n >= 1 && n <= ps.length =>
          Some(toWkt(GPoint(Some(ps(n - 1)))))
        case Some(GMultiPoint(ps, _)) if n >= 1 && n <= ps.length =>
          Some(toWkt(GPoint(Some(ps(n - 1)))))
        case _ => None
      }).orNull)
    u.register("st_startpoint", g1[String] {
      case GLine(ps, _) if ps.nonEmpty => Some(toWkt(GPoint(Some(ps.head)))); case _ => None })
    u.register("st_endpoint", g1[String] {
      case GLine(ps, _) if ps.nonEmpty => Some(toWkt(GPoint(Some(ps.last)))); case _ => None })
    u.register("st_numgeometries", g1[java.lang.Integer] {
      case GMultiPoint(ps, _) => Some(ps.length)
      case GMultiLine(ls, _) => Some(ls.length)
      case GMultiPolygon(ps, _) => Some(ps.length)
      case g => Some(if (g.isEmpty) 0 else 1)
    })
    u.register("st_geometryn", (wkt: String, n: Int) =>
      (parseWkt(wkt) match {
        case Some(GMultiPoint(ps, s)) if n >= 1 && n <= ps.length =>
          Some(toWkt(GPoint(Some(ps(n - 1)), s)))
        case Some(GMultiLine(ls, s)) if n >= 1 && n <= ls.length =>
          Some(toWkt(GLine(ls(n - 1), s)))
        case Some(GMultiPolygon(ps, s)) if n >= 1 && n <= ps.length =>
          Some(toWkt(GPolygon(ps(n - 1), s)))
        case Some(g) if n == 1 && !g.isEmpty => Some(toWkt(g))
        case _ => None
      }).orNull)
    u.register("st_exteriorring", g1[String] {
      case GPolygon(rs, s) if rs.nonEmpty => Some(toWkt(GLine(rs.head, s))); case _ => None })
    u.register("st_numinteriorring", g1[java.lang.Integer] {
      case GPolygon(rs, _) if rs.nonEmpty => Some(rs.length - 1); case _ => None })
    u.register("st_interiorringn", (wkt: String, n: Int) =>
      (parseWkt(wkt) match {
        case Some(GPolygon(rs, s)) if n >= 1 && n < rs.length => Some(toWkt(GLine(rs(n), s)))
        case _ => None
      }).orNull)
    u.register("st_isempty", g1[java.lang.Boolean](g => Some(g.isEmpty)))
    u.register("st_isclosed", g1[java.lang.Boolean] {
      case l: GLine => Some(l.closed)
      case GMultiLine(ls, _) => Some(ls.nonEmpty && ls.forall(l => l.length >= 4 && l.head == l.last))
      case _ => None
    })
    u.register("st_isring", g1[java.lang.Boolean] {
      case l: GLine => Some(l.closed); case _ => None })
    u.register("st_dimension", g1[java.lang.Integer] {
      case _: GPoint | _: GMultiPoint => Some(0)
      case _: GLine | _: GMultiLine => Some(1)
      case _: GPolygon | _: GMultiPolygon => Some(2)
    })
    u.register("st_coorddim", g1[java.lang.Integer](_ => Some(2)))
    u.register("st_is3d", g1[java.lang.Boolean](_ => Some(false)))
    u.register("st_ismeasured", g1[java.lang.Boolean](_ => Some(false)))
    u.register("st_srid", g1[java.lang.Integer](g => Some(g.srid)))
    u.register("st_setsrid", (wkt: String, srid: Int) =>
      parseWkt(wkt).map(g => toWkt(g.withSrid(srid))).orNull) // WKT carries no srid; identity text, kept for surface parity
    u.register("st_envelope", g1[String] { g =>
      envelope(g).map { case (x0, y0, x1, y1) =>
        if (x0 == x1 && y0 == y1) toWkt(GPoint(Some(Pt(x0, y0))))
        else toWkt(GPolygon(Vector(Vector(
          Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1), Pt(x0, y0)))))
      }
    })
    u.register("st_centroid", g1[String](g => centroid(g).map(p => toWkt(GPoint(Some(p))))))
    u.register("st_boundary", g1[String](g => boundary(g).map(toWkt)))

    // ----------------------------------------------------------- measures
    u.register("st_area", g1[java.lang.Double](g => Some(area(g))))
    u.register("st_length", g1[java.lang.Double](g => Some(length(g))))
    u.register("st_distance", g2[java.lang.Double]((a, b) =>
      distance(a, b).map(java.lang.Double.valueOf)))
    u.register("st_distancesphere", g2[java.lang.Double] {
      case (GPoint(Some(p), _), GPoint(Some(q), _)) =>
        Some(haversine(p.x, p.y, q.x, q.y))
      case _ => None
    })
    u.register("st_geodesiclengthwgs84", g1[java.lang.Double] {
      case l: GLine =>
        Some(l.segments.map { case (a, b) => haversine(a.x, a.y, b.x, b.y) }.sum)
      case GMultiLine(ls, s) =>
        Some(ls.map(l => GLine(l, s).segments
          .map { case (a, b) => haversine(a.x, a.y, b.x, b.y) }.sum).sum)
      case _ => None
    })

    // ---------------------------------------------------------- relations
    u.register("st_equals", g2[java.lang.Boolean]((a, b) => Some(geomEquals(a, b))))
    u.register("st_intersects", g2[java.lang.Boolean]((a, b) => Some(intersects(a, b))))
    u.register("st_disjoint", g2[java.lang.Boolean]((a, b) => Some(disjoint(a, b))))
    u.register("st_contains", g2[java.lang.Boolean]((a, b) => Some(contains(a, b))))
    u.register("st_within", g2[java.lang.Boolean]((a, b) => Some(within(a, b))))
    u.register("st_touches", g2[java.lang.Boolean]((a, b) => Some(touches(a, b))))
    u.register("st_crosses", g2[java.lang.Boolean]((a, b) => Some(crosses(a, b))))
    u.register("st_overlaps", g2[java.lang.Boolean]((a, b) => Some(overlaps(a, b))))
    u.register("st_envintersects", g2[java.lang.Boolean]((a, b) =>
      envIntersects(a, b).map(java.lang.Boolean.valueOf)))

    // --------------------------------------------------------- processing
    u.register("st_convexhull", g1[String](g => convexHull(g).map(toWkt)))
    u.register("st_buffer", (wkt: String, d: Double) =>
      parseWkt(wkt).flatMap(g => buffer(g, d)).map(toWkt).orNull)
    u.register("st_intersection", g2[String]((a, b) => intersection(a, b).map(toWkt)))

    // ------------------------------------------------------------ binning
    u.register("st_bin", (binSize: Double, pointWkt: String) =>
      (parseWkt(pointWkt) match {
        case Some(GPoint(Some(p), _)) => Some(new Bins(binSize).id(p.x, p.y))
        case _ => None
      }).map(java.lang.Long.valueOf).orNull)
    u.register("st_binenvelope", (binSize: Double, binIdOrPoint: Long) => {
      val (x0, y0, x1, y1) = new Bins(binSize).envelopeOf(binIdOrPoint)
      toWkt(GPolygon(Vector(Vector(
        Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1), Pt(x0, y0)))))
    })

    // --------------------------------------------------------- aggregates
    // ST_Aggr_ConvexHull (ref esri/ST_Aggr_ConvexHull.java): the buffer is
    // reduced to its own hull after every fold, so state is O(hull), not
    // O(rows) — mergeable partials, safe at any group size.
    u.register("st_aggr_convexhull",
      org.apache.spark.sql.functions.udaf(HullAggregator,
        org.apache.spark.sql.Encoders.STRING))
  }

  import org.apache.spark.sql.expressions.Aggregator
  import org.apache.spark.sql.{Encoder, Encoders}

  object HullAggregator extends Aggregator[String, Seq[Seq[Double]], String] {
    private def hullOf(pts: Seq[Seq[Double]]): Seq[Seq[Double]] = {
      val g = GMultiPoint(pts.map(p => Pt(p(0), p(1))).toVector)
      convexHull(g).map(_.vertices.map(p => Seq(p.x, p.y))).getOrElse(Nil)
    }
    def zero: Seq[Seq[Double]] = Nil
    def reduce(b: Seq[Seq[Double]], wkt: String): Seq[Seq[Double]] =
      parseWkt(wkt) match {
        case Some(g) => hullOf(b ++ g.vertices.map(p => Seq(p.x, p.y)))
        case None => b
      }
    def merge(a: Seq[Seq[Double]], b: Seq[Seq[Double]]): Seq[Seq[Double]] = hullOf(a ++ b)
    def finish(b: Seq[Seq[Double]]): String =
      if (b.isEmpty) null
      else convexHull(GMultiPoint(b.map(p => Pt(p(0), p(1))).toVector)).map(toWkt).orNull
    def bufferEncoder: Encoder[Seq[Seq[Double]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Double]]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
