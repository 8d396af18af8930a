package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala planar geometry kernel backing the `ST_*` function surface
  * (SURVEY §2.5 geospatial row; ref ql/src/java/org/apache/hadoop/hive/ql/
  * udf/esri/ — ~70 UDFs wrapping the ESRI geometry library).
  *
  * Geometries travel between operators as WKT strings (the reference's
  * interchange text form, ref esri/ST_AsText.java / ST_GeomFromText.java);
  * WKB and GeoJSON encodings are provided for the binary/JSON surfaces.
  * All computation is exact planar double arithmetic — no third-party
  * geometry dependency (none is available in the container, and none is
  * needed for the 2D subset).
  *
  * Supported kinds: POINT, MULTIPOINT, LINESTRING, MULTILINESTRING,
  * POLYGON (with holes), MULTIPOLYGON, each with an EMPTY form.
  */
object Geo {

  final case class Pt(x: Double, y: Double)

  sealed trait Geom {
    def srid: Int
    def withSrid(s: Int): Geom
    /** All vertices, flattened. */
    def vertices: IndexedSeq[Pt]
    def isEmpty: Boolean = vertices.isEmpty
    def kind: String
  }
  final case class GPoint(p: Option[Pt], srid: Int = 0) extends Geom {
    def withSrid(s: Int): Geom = copy(srid = s)
    def vertices: IndexedSeq[Pt] = p.toIndexedSeq
    def kind = "POINT"
  }
  final case class GMultiPoint(pts: IndexedSeq[Pt], srid: Int = 0) extends Geom {
    def withSrid(s: Int): Geom = copy(srid = s)
    def vertices: IndexedSeq[Pt] = pts
    def kind = "MULTIPOINT"
  }
  final case class GLine(pts: IndexedSeq[Pt], srid: Int = 0) extends Geom {
    def withSrid(s: Int): Geom = copy(srid = s)
    def vertices: IndexedSeq[Pt] = pts
    def kind = "LINESTRING"
    def segments: IndexedSeq[(Pt, Pt)] =
      if (pts.length < 2) IndexedSeq.empty else pts.init.zip(pts.tail)
    def closed: Boolean = pts.length >= 4 && pts.head == pts.last
  }
  final case class GMultiLine(lines: IndexedSeq[IndexedSeq[Pt]], srid: Int = 0) extends Geom {
    def withSrid(s: Int): Geom = copy(srid = s)
    def vertices: IndexedSeq[Pt] = lines.flatten
    def kind = "MULTILINESTRING"
  }
  /** rings.head = shell, rings.tail = holes; every ring closed (first==last). */
  final case class GPolygon(rings: IndexedSeq[IndexedSeq[Pt]], srid: Int = 0) extends Geom {
    def withSrid(s: Int): Geom = copy(srid = s)
    def vertices: IndexedSeq[Pt] = rings.flatten
    def kind = "POLYGON"
  }
  final case class GMultiPolygon(polys: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]], srid: Int = 0) extends Geom {
    def withSrid(s: Int): Geom = copy(srid = s)
    def vertices: IndexedSeq[Pt] = polys.flatten.flatten
    def kind = "MULTIPOLYGON"
  }

  /** Per-thread LRU over parsed WKT. Join refinements and predicate UDFs
    * evaluate the SAME geometry text against millions of rows (a dim-side
    * polygon meets every candidate point); memoizing the parse turns the
    * per-row cost into a hash probe. Thread-local so no locks; bounded so a
    * high-cardinality geometry column can't hold the heap.
    */
  private val parseCache =
    new ThreadLocal[java.util.LinkedHashMap[String, Option[Geom]]] {
      override def initialValue() =
        new java.util.LinkedHashMap[String, Option[Geom]](256, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Option[Geom]]): Boolean = size() > 1024
        }
    }

  /** Memoized [[parseWkt]] — use in per-row predicates over repeated
    * geometries (join refines); semantics identical.
    */
  def parseWktCached(wkt: String): Option[Geom] = {
    if (wkt == null) return None
    val c = parseCache.get()
    val hit = c.get(wkt)
    if (hit != null) hit
    else {
      val parsed = parseWkt(wkt)
      c.put(wkt, parsed)
      parsed
    }
  }

  // ----------------------------------------------------------------- WKT
  /** Parse WKT (case-insensitive, EMPTY forms, nested-paren MULTIPOINT).
    * Returns None on malformed input — callers surface SQL NULL, the
    * reference UDFs' invalid-input behavior.
    */
  def parseWkt(wkt: String): Option[Geom] = {
    if (wkt == null) return None
    val s = wkt.trim
    val m = java.util.regex.Pattern
      .compile("(?i)^([A-Z]+)\\s*(EMPTY|\\(.*\\))$", java.util.regex.Pattern.DOTALL)
      .matcher(s)
    if (!m.matches()) return None
    val name = m.group(1).toUpperCase
    val body = m.group(2)
    val empty = body.equalsIgnoreCase("EMPTY")
    try {
      name match {
        case "POINT" =>
          if (empty) Some(GPoint(None))
          else parseCoordList(inner(body)).flatMap {
            case Seq(p) => Some(GPoint(Some(p)))
            case _ => None
          }
        case "MULTIPOINT" =>
          if (empty) Some(GMultiPoint(Vector.empty))
          else {
            val in = inner(body).trim
            // both "MULTIPOINT ((1 2), (3 4))" and "MULTIPOINT (1 2, 3 4)"
            if (in.startsWith("(")) {
              splitTop(in).map(g => parseCoordList(inner(g.trim)))
                .foldLeft(Option(Vector.empty[Pt])) {
                  case (Some(acc), Some(Seq(p))) => Some(acc :+ p)
                  case _ => None
                }.map(GMultiPoint(_))
            } else parseCoordList(in).map(ps => GMultiPoint(ps.toVector))
          }
        case "LINESTRING" =>
          if (empty) Some(GLine(Vector.empty))
          else parseCoordList(inner(body)).filter(_.length >= 2).map(ps => GLine(ps.toVector))
        case "MULTILINESTRING" =>
          if (empty) Some(GMultiLine(Vector.empty))
          else sequence(splitTop(inner(body)).map(g => parseCoordList(inner(g.trim))))
            .map(ls => GMultiLine(ls.map(_.toVector).toVector))
        case "POLYGON" =>
          if (empty) Some(GPolygon(Vector.empty))
          else sequence(splitTop(inner(body)).map(g => parseCoordList(inner(g.trim)).map(closeRing)))
            .map(rs => GPolygon(rs.map(_.toVector).toVector))
        case "MULTIPOLYGON" =>
          if (empty) Some(GMultiPolygon(Vector.empty))
          else sequence(splitTop(inner(body)).map { poly =>
            sequence(splitTop(inner(poly.trim)).map(g => parseCoordList(inner(g.trim)).map(closeRing)))
          }).map(ps => GMultiPolygon(ps.map(_.map(_.toVector).toVector).toVector))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def closeRing(ps: Seq[Pt]): Seq[Pt] =
    if (ps.length >= 3 && ps.head != ps.last) ps :+ ps.head else ps

  /** Strip ONE outer paren layer. */
  private def inner(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
  }

  /** Split a paren-balanced string on top-level commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  private def parseCoordList(s: String): Option[Seq[Pt]] = {
    val parts = s.split(",").map(_.trim).filter(_.nonEmpty)
    val pts = parts.map { p =>
      val nums = p.split("\\s+").filter(_.nonEmpty)
      if (nums.length < 2) return None
      try Pt(nums(0).toDouble, nums(1).toDouble)
      catch { case _: NumberFormatException => return None }
    }
    if (pts.isEmpty) None else Some(pts.toSeq)
  }

  private def fmt(v: Double): String =
    if (v == v.toLong && math.abs(v) < 1e15) v.toLong.toString else v.toString
  private def fmtPt(p: Pt): String = s"${fmt(p.x)} ${fmt(p.y)}"

  def toWkt(g: Geom): String = g match {
    case GPoint(None, _) => "POINT EMPTY"
    case GPoint(Some(p), _) => s"POINT (${fmtPt(p)})"
    case GMultiPoint(ps, _) =>
      if (ps.isEmpty) "MULTIPOINT EMPTY"
      else s"MULTIPOINT (${ps.map(p => s"(${fmtPt(p)})").mkString(", ")})"
    case GLine(ps, _) =>
      if (ps.isEmpty) "LINESTRING EMPTY"
      else s"LINESTRING (${ps.map(fmtPt).mkString(", ")})"
    case GMultiLine(ls, _) =>
      if (ls.isEmpty) "MULTILINESTRING EMPTY"
      else s"MULTILINESTRING (${ls.map(l => s"(${l.map(fmtPt).mkString(", ")})").mkString(", ")})"
    case GPolygon(rs, _) =>
      if (rs.isEmpty) "POLYGON EMPTY"
      else s"POLYGON (${rs.map(r => s"(${r.map(fmtPt).mkString(", ")})").mkString(", ")})"
    case GMultiPolygon(ps, _) =>
      if (ps.isEmpty) "MULTIPOLYGON EMPTY"
      else s"MULTIPOLYGON (${ps.map(rs => s"(${rs.map(r => s"(${r.map(fmtPt).mkString(", ")})").mkString(", ")})").mkString(", ")})"
  }

  // ----------------------------------------------------------------- WKB
  /** Standard little-endian WKB (OGC 99-049): byteOrder=1, uint32 type
    * (1..6), packed doubles. Ref surface: esri/ST_AsBinary.java,
    * ST_GeomFromWKB.java.
    */
  def toWkb(g: Geom): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def sized(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def header(b: ByteBuffer, typ: Int): Unit = { b.put(1.toByte); b.putInt(typ) }
    g match {
      case GPoint(p, _) =>
        val b = sized(21); header(b, 1)
        val pt = p.getOrElse(Pt(Double.NaN, Double.NaN))
        b.putDouble(pt.x).putDouble(pt.y); b.array()
      case GMultiPoint(ps, s) =>
        val b = sized(9 + ps.length * 21); header(b, 4); b.putInt(ps.length)
        ps.foreach(p => b.put(toWkb(GPoint(Some(p), s)))); b.array()
      case GLine(ps, _) =>
        val b = sized(9 + ps.length * 16); header(b, 2); b.putInt(ps.length)
        ps.foreach(p => b.putDouble(p.x).putDouble(p.y)); b.array()
      case GMultiLine(ls, s) =>
        val parts = ls.map(l => toWkb(GLine(l, s)))
        val b = sized(9 + parts.map(_.length).sum); header(b, 5); b.putInt(ls.length)
        parts.foreach(b.put); b.array()
      case GPolygon(rs, _) =>
        val b = sized(9 + rs.map(4 + _.length * 16).sum); header(b, 3); b.putInt(rs.length)
        rs.foreach { r => b.putInt(r.length); r.foreach(p => b.putDouble(p.x).putDouble(p.y)) }
        b.array()
      case GMultiPolygon(ps, s) =>
        val parts = ps.map(rs => toWkb(GPolygon(rs, s)))
        val b = sized(9 + parts.map(_.length).sum); header(b, 6); b.putInt(ps.length)
        parts.foreach(b.put); b.array()
    }
  }

  def fromWkb(bytes: Array[Byte]): Option[Geom] = {
    import java.nio.{ByteBuffer, ByteOrder}
    if (bytes == null || bytes.length < 5) return None
    def read(b: ByteBuffer): Option[Geom] = {
      val order = b.get()
      b.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      def ring(): IndexedSeq[Pt] = {
        val n = b.getInt()
        Vector.fill(n)(Pt(b.getDouble(), b.getDouble()))
      }
      b.getInt() match {
        case 1 =>
          val x = b.getDouble(); val y = b.getDouble()
          Some(if (x.isNaN && y.isNaN) GPoint(None) else GPoint(Some(Pt(x, y))))
        case 2 => Some(GLine(ring()))
        case 3 => Some(GPolygon(Vector.fill(b.getInt())(ring())))
        case 4 =>
          val n = b.getInt()
          sequence(Vector.fill(n)(read(b))).map(gs =>
            GMultiPoint(gs.collect { case GPoint(Some(p), _) => p }.toVector))
        case 5 =>
          val n = b.getInt()
          sequence(Vector.fill(n)(read(b))).map(gs =>
            GMultiLine(gs.collect { case GLine(ps, _) => ps }.toVector))
        case 6 =>
          val n = b.getInt()
          sequence(Vector.fill(n)(read(b))).map(gs =>
            GMultiPolygon(gs.collect { case GPolygon(rs, _) => rs }.toVector))
        case _ => None
      }
    }
    try read(ByteBuffer.wrap(bytes)) catch { case _: Exception => None }
  }

  def toGeoJson(g: Geom): String = {
    def arr(p: Pt) = s"[${fmt(p.x)},${fmt(p.y)}]"
    def coords(ps: Seq[Pt]) = ps.map(arr).mkString("[", ",", "]")
    g match {
      case GPoint(None, _) => """{"type":"Point","coordinates":[]}"""
      case GPoint(Some(p), _) => s"""{"type":"Point","coordinates":${arr(p)}}"""
      case GMultiPoint(ps, _) => s"""{"type":"MultiPoint","coordinates":${coords(ps)}}"""
      case GLine(ps, _) => s"""{"type":"LineString","coordinates":${coords(ps)}}"""
      case GMultiLine(ls, _) =>
        s"""{"type":"MultiLineString","coordinates":${ls.map(coords).mkString("[", ",", "]")}}"""
      case GPolygon(rs, _) =>
        s"""{"type":"Polygon","coordinates":${rs.map(coords).mkString("[", ",", "]")}}"""
      case GMultiPolygon(ps, _) =>
        s"""{"type":"MultiPolygon","coordinates":${ps.map(rs => rs.map(coords).mkString("[", ",", "]")).mkString("[", ",", "]")}}"""
    }
  }

  /** Parse GeoJSON geometry (the inverse of [[toGeoJson]]; ref
    * esri/ST_GeomFromGeoJson.java). Tolerates whitespace and either member
    * order; None on malformed input.
    */
  def fromGeoJson(json: String): Option[Geom] = {
    if (json == null) return None
    try {
      val typeRx = """"type"\s*:\s*"([A-Za-z]+)"""".r
      val coordRx = """"coordinates"\s*:\s*(\[.*\])""".r
      val typ = typeRx.findFirstMatchIn(json).map(_.group(1)).getOrElse(return None)
      val coordsRaw = coordRx.findFirstMatchIn(json).map(_.group(1)).getOrElse(return None)
      // trim trailing object junk after the coordinates array (bracket-balance)
      var depth = 0; var end = -1
      var i = 0
      while (i < coordsRaw.length && end < 0) {
        coordsRaw.charAt(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) return None
      val coords = coordsRaw.substring(0, end + 1)

      sealed trait J
      case class JNum(v: Double) extends J
      case class JArr(xs: List[J]) extends J
      def parse(s: String, from: Int): (J, Int) = {
        var i = from
        while (s.charAt(i).isWhitespace) i += 1
        if (s.charAt(i) == '[') {
          i += 1
          val items = List.newBuilder[J]
          var done = false
          while (!done) {
            while (s.charAt(i).isWhitespace) i += 1
            if (s.charAt(i) == ']') { i += 1; done = true }
            else {
              val (v, ni) = parse(s, i)
              items += v
              i = ni
              while (s.charAt(i).isWhitespace) i += 1
              if (s.charAt(i) == ',') i += 1
            }
          }
          (JArr(items.result()), i)
        } else {
          val start = i
          while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
          (JNum(s.substring(start, i).toDouble), i)
        }
      }
      val ast = parse(coords, 0)._1
      def pt(j: J): Pt = j match {
        case JArr(JNum(x) :: JNum(y) :: _) => Pt(x, y)
        case _ => throw new IllegalArgumentException("bad point")
      }
      def pts(j: J): Vector[Pt] = j match {
        case JArr(xs) => xs.map(pt).toVector
        case _ => throw new IllegalArgumentException("bad ring")
      }
      def rings(j: J): Vector[Vector[Pt]] = j match {
        case JArr(xs) => xs.map(pts).toVector
        case _ => throw new IllegalArgumentException("bad rings")
      }
      typ match {
        case "Point" => ast match {
          case JArr(Nil) => Some(GPoint(None))
          case j => Some(GPoint(Some(pt(j))))
        }
        case "MultiPoint" => Some(GMultiPoint(pts(ast)))
        case "LineString" => Some(GLine(pts(ast)))
        case "MultiLineString" => Some(GMultiLine(rings(ast)))
        case "Polygon" => Some(GPolygon(rings(ast).map(r => closeRing(r).toVector)))
        case "MultiPolygon" => ast match {
          case JArr(xs) => Some(GMultiPolygon(
            xs.map(p => rings(p).map(r => closeRing(r).toVector)).toVector))
          case _ => None
        }
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** Emit Esri REST JSON geometry (ref esri/EsriJsonConverter.java /
    * ST_AsJson.java — the reference's `ST_AsJson` speaks THIS dialect,
    * distinct from GeoJSON): points are {"x","y"}, multipoints "points",
    * polylines "paths", polygons "rings" (an Esri polygon carries all its
    * rings flat — a multipolygon flattens, per the REST spec).
    */
  /** Esri ring-orientation contract (the REST spec's ONLY multipolygon
    * disambiguator in the flat "rings" array): exterior rings are
    * CLOCKWISE, holes counterclockwise.
    */
  private def oriented(r: IndexedSeq[Pt], clockwise: Boolean): IndexedSeq[Pt] =
    if ((ringArea(r) < 0) == clockwise) r else r.reverse

  def toEsriJson(g: Geom): String = {
    def arr(p: Pt) = s"[${fmt(p.x)},${fmt(p.y)}]"
    def coords(ps: Seq[Pt]) = ps.map(arr).mkString("[", ",", "]")
    def polyRings(rs: Seq[IndexedSeq[Pt]]): Seq[String] = rs match {
      case shell +: holes =>
        coords(oriented(shell, clockwise = true)) +:
          holes.map(h => coords(oriented(h, clockwise = false)))
      case _ => Nil
    }
    g match {
      case GPoint(None, _) => """{"x":null,"y":null}"""
      case GPoint(Some(p), _) => s"""{"x":${fmt(p.x)},"y":${fmt(p.y)}}"""
      case GMultiPoint(ps, _) => s"""{"points":${coords(ps)}}"""
      case GLine(ps, _) => s"""{"paths":[${coords(ps)}]}"""
      case GMultiLine(ls, _) =>
        s"""{"paths":${ls.map(coords).mkString("[", ",", "]")}}"""
      case GPolygon(rs, _) =>
        s"""{"rings":${polyRings(rs).mkString("[", ",", "]")}}"""
      case GMultiPolygon(ps, _) =>
        // the flat rings array: each polygon's CW shell, then its CCW
        // holes — orientation is what lets a reader regroup them
        s"""{"rings":${ps.flatMap(polyRings).mkString("[", ",", "]")}}"""
    }
  }

  /** Parse Esri REST JSON geometry (the inverse of [[toEsriJson]]; ref
    * esri/ST_GeomFromJson.java). Keys decide the kind: "rings" → polygon,
    * "paths" → polyline, "points" → multipoint, "x"/"y" → point (null or
    * "NaN" coordinates = empty point). None on malformed input.
    */
  def fromEsriJson(json: String): Option[Geom] = {
    if (json == null) return None
    try {
      def member(key: String): Option[String] = {
        val rx = ("(?s)\"" + key + "\"\\s*:\\s*(\\[.*)").r
        rx.findFirstMatchIn(json).map(_.group(1)).flatMap { raw =>
          var depth = 0; var end = -1; var i = 0
          while (i < raw.length && end < 0) {
            raw.charAt(i) match {
              case '[' => depth += 1
              case ']' => depth -= 1; if (depth == 0) end = i
              case _ =>
            }
            i += 1
          }
          if (end < 0) None else Some(raw.substring(0, end + 1))
        }
      }
      def nums(arrayJson: String): Vector[Vector[Vector[Double]]] = {
        // parse up to 3 levels of nested numeric arrays (rings/paths)
        val g = fromGeoJson(
          s"""{"type":"MultiLineString","coordinates":$arrayJson}""")
        g match {
          case Some(GMultiLine(ls, _)) =>
            ls.toVector.map(_.toVector.map(p => Vector(p.x, p.y)))
          case _ => Vector.empty
        }
      }
      member("rings") match {
        case Some(r) =>
          val rs = nums(r).map(_.map(v => Pt(v(0), v(1))))
            .map(closeRing(_).toVector)
          // regroup by the spec's orientation: CLOCKWISE rings are shells,
          // counterclockwise rings are holes — assigned to the shell that
          // CONTAINS them (the spec constrains orientation, not ordering,
          // so "hole follows its shell" cannot be assumed), falling back
          // to the last preceding shell for degenerate input. One shell
          // (or non-conforming orientation) stays a single polygon with
          // the rings as given — without any of this, two disjoint
          // polygons would rebuild as shell+hole and flip area/contains
          val shells = rs.count(ringArea(_) < 0)
          if (shells <= 1) return Some(GPolygon(rs))
          val groups = scala.collection.mutable.ArrayBuffer
            .empty[scala.collection.mutable.ArrayBuffer[Vector[Pt]]]
          val shellRings = scala.collection.mutable.ArrayBuffer.empty[Vector[Pt]]
          rs.foreach { ring =>
            if (ringArea(ring) < 0 || groups.isEmpty) {
              groups += scala.collection.mutable.ArrayBuffer(ring)
              shellRings += ring
            } else {
              val owner = shellRings.indexWhere(sh =>
                ring.headOption.exists(p => pipRing(p, sh) > 0))
              groups(if (owner >= 0) owner else groups.length - 1) += ring
            }
          }
          return Some(GMultiPolygon(groups.map(_.toVector).toVector))
        case None => ()
      }
      member("paths") match {
        case Some(p) =>
          val ls = nums(p).map(_.map(v => Pt(v(0), v(1))))
          return Some(if (ls.length == 1) GLine(ls.head) else GMultiLine(ls))
        case None => ()
      }
      member("points") match {
        case Some(p) =>
          // one level shallower: reuse the LineString shape
          val g = fromGeoJson(s"""{"type":"LineString","coordinates":$p}""")
          return g.collect { case GLine(ps, _) => GMultiPoint(ps) }
        case None => ()
      }
      val numRx = """(?s)"x"\s*:\s*(null|"NaN"|[-+0-9.eE]+)""".r
      val numRyRx = """(?s)"y"\s*:\s*(null|"NaN"|[-+0-9.eE]+)""".r
      (numRx.findFirstMatchIn(json).map(_.group(1)),
        numRyRx.findFirstMatchIn(json).map(_.group(1))) match {
        case (Some(x), Some(y))
            if x != "null" && x != "\"NaN\"" && y != "null" && y != "\"NaN\"" =>
          Some(GPoint(Some(Pt(x.toDouble, y.toDouble))))
        case (Some(_), _) => Some(GPoint(None))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------ primitives
  private val Eps = 1e-9

  private def cross(o: Pt, a: Pt, b: Pt): Double =
    (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)

  private def onSegment(p: Pt, a: Pt, b: Pt): Boolean =
    math.abs(cross(a, b, p)) <= Eps &&
      p.x >= math.min(a.x, b.x) - Eps && p.x <= math.max(a.x, b.x) + Eps &&
      p.y >= math.min(a.y, b.y) - Eps && p.y <= math.max(a.y, b.y) + Eps

  /** Segment intersection test (incl. touching endpoints / collinear overlap). */
  private def segIntersect(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Boolean = {
    val d1 = cross(b1, b2, a1); val d2 = cross(b1, b2, a2)
    val d3 = cross(a1, a2, b1); val d4 = cross(a1, a2, b2)
    if (((d1 > Eps && d2 < -Eps) || (d1 < -Eps && d2 > Eps)) &&
        ((d3 > Eps && d4 < -Eps) || (d3 < -Eps && d4 > Eps))) true
    else onSegment(a1, b1, b2) || onSegment(a2, b1, b2) ||
      onSegment(b1, a1, a2) || onSegment(b2, a1, a2)
  }

  /** Proper crossing: interiors cross at a single point (no touch/overlap). */
  private def segProperCross(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Boolean = {
    val d1 = cross(b1, b2, a1); val d2 = cross(b1, b2, a2)
    val d3 = cross(a1, a2, b1); val d4 = cross(a1, a2, b2)
    ((d1 > Eps && d2 < -Eps) || (d1 < -Eps && d2 > Eps)) &&
      ((d3 > Eps && d4 < -Eps) || (d3 < -Eps && d4 > Eps))
  }

  private def distPointSeg(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 <= 0) 0.0
      else math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / len2))
    math.hypot(p.x - (a.x + t * dx), p.y - (a.y + t * dy))
  }

  private def distSegSeg(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Double =
    if (segIntersect(a1, a2, b1, b2)) 0.0
    else Seq(distPointSeg(a1, b1, b2), distPointSeg(a2, b1, b2),
      distPointSeg(b1, a1, a2), distPointSeg(b2, a1, a2)).min

  /** 2 = strictly inside, 1 = on boundary, 0 = outside (holes respected). */
  private def pipRing(p: Pt, ring: IndexedSeq[Pt]): Int = {
    var inside = false
    var i = 0
    val n = ring.length
    while (i < n - 1) {
      val a = ring(i); val b = ring(i + 1)
      if (onSegment(p, a, b)) return 1
      if ((a.y > p.y) != (b.y > p.y)) {
        val xint = a.x + (p.y - a.y) * (b.x - a.x) / (b.y - a.y)
        if (xint > p.x) inside = !inside
      }
      i += 1
    }
    if (inside) 2 else 0
  }

  private def pipPolygon(p: Pt, rings: IndexedSeq[IndexedSeq[Pt]]): Int = {
    if (rings.isEmpty) return 0
    val shell = pipRing(p, rings.head)
    if (shell != 2) return shell
    var i = 1
    while (i < rings.length) {
      pipRing(p, rings(i)) match {
        case 2 => return 0 // inside a hole
        case 1 => return 1 // on a hole boundary
        case _ =>
      }
      i += 1
    }
    2
  }

  /** Point membership for any geometry: 2 interior, 1 boundary, 0 outside. */
  private def locate(p: Pt, g: Geom): Int = g match {
    case GPoint(Some(q), _) => if (math.hypot(p.x - q.x, p.y - q.y) <= Eps) 2 else 0
    case GPoint(None, _) => 0
    case GMultiPoint(ps, _) => if (ps.exists(q => math.hypot(p.x - q.x, p.y - q.y) <= Eps)) 2 else 0
    case l @ GLine(ps, _) =>
      if (ps.length < 2) 0
      else if (l.segments.exists { case (a, b) => onSegment(p, a, b) }) {
        val interiorEnd = l.closed
        if (!interiorEnd && (math.hypot(p.x - ps.head.x, p.y - ps.head.y) <= Eps ||
            math.hypot(p.x - ps.last.x, p.y - ps.last.y) <= Eps)) 1
        else 2
      } else 0
    case GMultiLine(ls, s) =>
      ls.map(l => locate(p, GLine(l, s))).maxOption.getOrElse(0)
    case GPolygon(rs, _) => pipPolygon(p, rs)
    case GMultiPolygon(ps, _) =>
      ps.map(rs => pipPolygon(p, rs)).maxOption.getOrElse(0)
  }

  private def allSegments(g: Geom): IndexedSeq[(Pt, Pt)] = g match {
    case l: GLine => l.segments
    case GMultiLine(ls, s) => ls.flatMap(l => GLine(l, s).segments)
    case GPolygon(rs, _) => rs.flatMap(r => if (r.length < 2) Nil else r.init.zip(r.tail))
    case GMultiPolygon(ps, s) => ps.flatMap(rs => allSegments(GPolygon(rs, s)))
    case _ => Vector.empty
  }

  private def hasArea(g: Geom): Boolean = g match {
    case _: GPolygon | _: GMultiPolygon => true
    case _ => false
  }

  /** A point strictly interior to a polygon (centroid when it qualifies,
    * else a horizontal-scanline midpoint — handles concave shapes and holes).
    */
  private def interiorPoint(rings: IndexedSeq[IndexedSeq[Pt]]): Option[Pt] = {
    if (rings.isEmpty) return None
    centroid(GPolygon(rings)).filter(c => pipPolygon(c, rings) == 2).orElse {
      val ys = rings.flatMap(_.map(_.y)).distinct.sorted
      ys.init.zip(ys.tail).iterator.flatMap { case (y0, y1) =>
        val y = (y0 + y1) / 2
        val xs = rings.flatMap { r =>
          r.init.zip(r.tail).collect {
            case (a, b) if (a.y > y) != (b.y > y) =>
              a.x + (y - a.y) * (b.x - a.x) / (b.y - a.y)
          }
        }.sorted
        xs.init.zip(xs.tail).map { case (x0, x1) => Pt((x0 + x1) / 2, y) }
          .find(p => pipPolygon(p, rings) == 2)
      }.nextOption()
    }
  }

  /** Sample points of g: vertices + segment midpoints + (for area kinds) a
    * strictly-interior point per polygon component — robustness for
    * containment/interior checks on shapes whose vertices all lie on
    * boundaries (identical polygons) or inside while edges exit.
    */
  private def samplePoints(g: Geom): IndexedSeq[Pt] = {
    val interior = g match {
      case GPolygon(rs, _) => interiorPoint(rs).toVector
      case GMultiPolygon(ps, _) => ps.flatMap(interiorPoint)
      case _ => Vector.empty
    }
    g.vertices ++
      allSegments(g).map { case (a, b) => Pt((a.x + b.x) / 2, (a.y + b.y) / 2) } ++
      interior
  }

  // ------------------------------------------------------------- measures
  def envelope(g: Geom): Option[(Double, Double, Double, Double)] = {
    val vs = g.vertices
    if (vs.isEmpty) None
    else Some((vs.map(_.x).min, vs.map(_.y).min, vs.map(_.x).max, vs.map(_.y).max))
  }

  private def ringArea(r: IndexedSeq[Pt]): Double = {
    var s = 0.0; var i = 0
    while (i < r.length - 1) {
      s += r(i).x * r(i + 1).y - r(i + 1).x * r(i).y
      i += 1
    }
    s / 2
  }

  def area(g: Geom): Double = g match {
    case GPolygon(rs, _) =>
      if (rs.isEmpty) 0.0
      else math.abs(ringArea(rs.head)) - rs.tail.map(r => math.abs(ringArea(r))).sum
    case GMultiPolygon(ps, s) => ps.map(rs => area(GPolygon(rs, s))).sum
    case _ => 0.0
  }

  /** Length of lines; perimeter for polygons (ESRI ST_Length on area types). */
  def length(g: Geom): Double =
    allSegments(g).map { case (a, b) => math.hypot(b.x - a.x, b.y - a.y) }.sum

  def distance(a: Geom, b: Geom): Option[Double] = {
    if (a.isEmpty || b.isEmpty) return None
    if (intersects(a, b)) return Some(0.0)
    val aSegs = allSegments(a); val bSegs = allSegments(b)
    val cands = ArrayBuffer.empty[Double]
    if (aSegs.isEmpty && bSegs.isEmpty)
      for (p <- a.vertices; q <- b.vertices) cands += math.hypot(p.x - q.x, p.y - q.y)
    else if (aSegs.isEmpty)
      for (p <- a.vertices; (s1, s2) <- bSegs) cands += distPointSeg(p, s1, s2)
    else if (bSegs.isEmpty)
      for (p <- b.vertices; (s1, s2) <- aSegs) cands += distPointSeg(p, s1, s2)
    else
      for ((a1, a2) <- aSegs; (b1, b2) <- bSegs) cands += distSegSeg(a1, a2, b1, b2)
    if (cands.isEmpty) None else Some(cands.min)
  }

  /** Haversine meters; ref esri/Haversine.java (R = 6371008 m, atan2 form). */
  val EarthRadiusMeters = 6371008.0
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val h = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    EarthRadiusMeters * 2 * math.atan2(math.sqrt(h), math.sqrt(1 - h))
  }

  def centroid(g: Geom): Option[Pt] = g match {
    case GPoint(p, _) => p
    case GMultiPoint(ps, _) =>
      if (ps.isEmpty) None
      else Some(Pt(ps.map(_.x).sum / ps.length, ps.map(_.y).sum / ps.length))
    case _: GLine | _: GMultiLine =>
      val segs = allSegments(g)
      val totalLen = segs.map { case (a, b) => math.hypot(b.x - a.x, b.y - a.y) }.sum
      if (segs.isEmpty) None
      else if (totalLen <= 0) Some(g.vertices.head)
      else {
        var cx = 0.0; var cy = 0.0
        segs.foreach { case (a, b) =>
          val w = math.hypot(b.x - a.x, b.y - a.y)
          cx += w * (a.x + b.x) / 2; cy += w * (a.y + b.y) / 2
        }
        Some(Pt(cx / totalLen, cy / totalLen))
      }
    case GPolygon(rs, _) =>
      if (rs.isEmpty) None
      else {
        // signed-area-weighted shell minus holes
        var ax = 0.0; var ay = 0.0; var aa = 0.0
        rs.zipWithIndex.foreach { case (r, idx) =>
          val sgn = if (idx == 0) 1.0 else -1.0
          val a = math.abs(ringArea(r))
          val (cx, cy) = ringCentroid(r)
          ax += sgn * a * cx; ay += sgn * a * cy; aa += sgn * a
        }
        if (math.abs(aa) <= 0) centroid(GMultiPoint(rs.head.dropRight(1)))
        else Some(Pt(ax / aa, ay / aa))
      }
    case GMultiPolygon(ps, s) =>
      val parts = ps.map(rs => (area(GPolygon(rs, s)), centroid(GPolygon(rs, s))))
        .collect { case (a, Some(c)) => (a, c) }
      val total = parts.map(_._1).sum
      if (parts.isEmpty) None
      else if (total <= 0) Some(parts.head._2)
      else Some(Pt(parts.map(p => p._1 * p._2.x).sum / total,
        parts.map(p => p._1 * p._2.y).sum / total))
  }

  private def ringCentroid(r: IndexedSeq[Pt]): (Double, Double) = {
    val a = ringArea(r)
    if (math.abs(a) <= 0) {
      val core = r.dropRight(1)
      (core.map(_.x).sum / core.length, core.map(_.y).sum / core.length)
    } else {
      var cx = 0.0; var cy = 0.0; var i = 0
      while (i < r.length - 1) {
        val f = r(i).x * r(i + 1).y - r(i + 1).x * r(i).y
        cx += (r(i).x + r(i + 1).x) * f
        cy += (r(i).y + r(i + 1).y) * f
        i += 1
      }
      (cx / (6 * a), cy / (6 * a))
    }
  }

  // ------------------------------------------------------------ relations
  def envIntersects(a: Geom, b: Geom): Option[Boolean] =
    for (ea <- envelope(a); eb <- envelope(b))
      yield ea._1 <= eb._3 + Eps && eb._1 <= ea._3 + Eps &&
        ea._2 <= eb._4 + Eps && eb._2 <= ea._4 + Eps

  def intersects(a: Geom, b: Geom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!envIntersects(a, b).getOrElse(false)) return false
    // any vertex of one located in/on the other
    if (a.vertices.exists(p => locate(p, b) > 0)) return true
    if (b.vertices.exists(p => locate(p, a) > 0)) return true
    // any segment pair intersecting
    val aSegs = allSegments(a); val bSegs = allSegments(b)
    if (aSegs.exists { case (a1, a2) => bSegs.exists { case (b1, b2) => segIntersect(a1, a2, b1, b2) } })
      return true
    false
  }

  def disjoint(a: Geom, b: Geom): Boolean = !intersects(a, b)

  /** OGC Contains: every point of b within a, and interiors intersect.
    * Implemented on vertices + edge midpoints plus a no-proper-crossing
    * check — exact for the supported straight-edge geometry classes.
    */
  def contains(a: Geom, b: Geom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    val samples = samplePoints(b)
    if (samples.isEmpty) return false
    val locs = samples.map(p => locate(p, a))
    if (locs.exists(_ == 0)) return false
    if (!locs.exists(_ == 2)) return false // boundary-only contact
    // no edge of b may properly cross a boundary edge of a
    val aSegs = allSegments(a)
    val bSegs = allSegments(b)
    !bSegs.exists { case (b1, b2) =>
      aSegs.exists { case (a1, a2) => segProperCross(a1, a2, b1, b2) }
    }
  }

  def within(a: Geom, b: Geom): Boolean = contains(b, a)

  def geomEquals(a: Geom, b: Geom): Boolean = contains(a, b) && contains(b, a) || {
    (a.isEmpty && b.isEmpty) || (a == b.withSrid(a.srid))
  }

  /** OGC Touches: boundaries meet, interiors do not. */
  def touches(a: Geom, b: Geom): Boolean = {
    if (!intersects(a, b)) return false
    // interiors must not intersect: no sample of either strictly interior to
    // the other, and no proper segment crossing
    val aSegs = allSegments(a); val bSegs = allSegments(b)
    if (aSegs.exists { case (a1, a2) => bSegs.exists { case (b1, b2) => segProperCross(a1, a2, b1, b2) } })
      return false
    if (samplePoints(b).exists(p => locate(p, a) == 2 && locate(p, b) == 2)) return false
    if (samplePoints(a).exists(p => locate(p, b) == 2 && locate(p, a) == 2)) return false
    true
  }

  /** OGC Crosses (line/line: interiors meet at a point; line/area: line is
    * partly inside and partly outside).
    */
  def crosses(a: Geom, b: Geom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    (hasArea(a), hasArea(b)) match {
      case (false, false) =>
        val aSegs = allSegments(a); val bSegs = allSegments(b)
        aSegs.exists { case (a1, a2) => bSegs.exists { case (b1, b2) => segProperCross(a1, a2, b1, b2) } }
      case (false, true) =>
        val pts = samplePoints(a)
        pts.exists(p => locate(p, b) == 2) && pts.exists(p => locate(p, b) == 0)
      case (true, false) => crosses(b, a)
      case (true, true) => false
    }
  }

  /** OGC Overlaps: same dimension, interiors intersect, neither contains the
    * other.
    */
  def overlaps(a: Geom, b: Geom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (hasArea(a) != hasArea(b)) return false
    if (allSegments(a).isEmpty != allSegments(b).isEmpty) return false
    intersects(a, b) && !contains(a, b) && !contains(b, a) && {
      if (hasArea(a)) {
        samplePoints(a).exists(p => locate(p, b) == 2) ||
          samplePoints(b).exists(p => locate(p, a) == 2) ||
          allSegments(a).exists { case (a1, a2) =>
            allSegments(b).exists { case (b1, b2) => segProperCross(a1, a2, b1, b2) } }
      } else true
    }
  }

  // ----------------------------------------------------------- processing
  /** Andrew monotone-chain convex hull → point / linestring / polygon. */
  def convexHull(g: Geom): Option[Geom] = {
    val pts = g.vertices.distinct.sortBy(p => (p.x, p.y))
    if (pts.isEmpty) return None
    if (pts.length == 1) return Some(GPoint(Some(pts.head), g.srid))
    val lower = ArrayBuffer.empty[Pt]
    pts.foreach { p =>
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = ArrayBuffer.empty[Pt]
    pts.reverse.foreach { p =>
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toVector
    if (hull.length == 2) Some(GLine(hull, g.srid))
    else Some(GPolygon(Vector(hull :+ hull.head), g.srid))
  }

  /** Exact n-gon disc for points/multipoints; envelope expanded by d for
    * other kinds (documented planar approximation — the full curve-offset
    * buffer needs an arc type the WKT subset deliberately omits).
    */
  def buffer(g: Geom, d: Double, nSides: Int = 32): Option[Geom] = {
    if (g.isEmpty) return None
    if (d <= 0) return Some(g)
    def disc(c: Pt): IndexedSeq[Pt] = {
      val ring = (0 until nSides).map { i =>
        val t = 2 * math.Pi * i / nSides
        Pt(c.x + d * math.cos(t), c.y + d * math.sin(t))
      }.toVector
      ring :+ ring.head
    }
    g match {
      case GPoint(Some(p), s) => Some(GPolygon(Vector(disc(p)), s))
      case GMultiPoint(ps, s) => Some(GMultiPolygon(ps.map(p => Vector(disc(p))).toVector, s))
      case _ =>
        envelope(g).map { case (x0, y0, x1, y1) =>
          GPolygon(Vector(Vector(
            Pt(x0 - d, y0 - d), Pt(x1 + d, y0 - d), Pt(x1 + d, y1 + d),
            Pt(x0 - d, y1 + d), Pt(x0 - d, y0 - d))), g.srid)
        }
    }
  }

  /** Intersection for the closed-form cases: point-vs-any (membership),
    * any-vs-convex-polygon (Sutherland–Hodgman clip for polygons, parametric
    * clip for lines, filter for multipoints). Returns None when the result
    * is empty or the pair falls outside the supported cases.
    */
  def intersection(a: Geom, b: Geom): Option[Geom] = {
    def pointCase(p: Pt, other: Geom, srid: Int): Option[Geom] =
      if (locate(p, other) > 0) Some(GPoint(Some(p), srid)) else Some(GPoint(None, srid))
    (a, b) match {
      case (GPoint(Some(p), s), _) => pointCase(p, b, s)
      case (_, GPoint(Some(p), s)) => pointCase(p, a, s)
      case (GMultiPoint(ps, s), _) => Some(GMultiPoint(ps.filter(p => locate(p, b) > 0), s))
      case (_, GMultiPoint(ps, s)) => Some(GMultiPoint(ps.filter(p => locate(p, a) > 0), s))
      case _ =>
        val (subject, clip) =
          if (isConvexPolygon(b)) (a, b)
          else if (isConvexPolygon(a)) (b, a)
          else return None
        val ring = clip.asInstanceOf[GPolygon].rings.head
        subject match {
          case GPolygon(rs, s) if rs.nonEmpty =>
            val clipped = clipRing(rs.head, ring)
            if (clipped.length < 3) None
            else Some(GPolygon(Vector(clipped :+ clipped.head), s))
          case l @ GLine(_, s) =>
            val parts = l.segments.flatMap { case (p1, p2) => clipSegment(p1, p2, ring) }
            if (parts.isEmpty) None
            else Some(GMultiLine(parts.map(seg => Vector(seg._1, seg._2)).toVector, s))
          case _ => None
        }
    }
  }

  private def isConvexPolygon(g: Geom): Boolean = g match {
    case GPolygon(rs, _) if rs.length == 1 && rs.head.length >= 4 =>
      val r = rs.head
      val signs = r.init.indices.map { i =>
        val o = r(i); val p = r((i + 1) % (r.length - 1)); val q = r((i + 2) % (r.length - 1))
        math.signum(cross(o, p, q))
      }.filter(_ != 0)
      signs.distinct.length <= 1
    case _ => false
  }

  /** Sutherland–Hodgman clip of `subject` ring by convex ring `clip`. */
  private def clipRing(subject: IndexedSeq[Pt], clip: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    val ccwClip = if (ringArea(clip) < 0) clip.reverse else clip
    var out = subject.dropRight(1)
    var i = 0
    while (i < ccwClip.length - 1 && out.nonEmpty) {
      val a = ccwClip(i); val b = ccwClip(i + 1)
      val in = out
      val res = ArrayBuffer.empty[Pt]
      var j = 0
      while (j < in.length) {
        val cur = in(j); val prev = in((j + in.length - 1) % in.length)
        val curIn = cross(a, b, cur) >= -Eps
        val prevIn = cross(a, b, prev) >= -Eps
        if (curIn) {
          if (!prevIn) lineIntersect(prev, cur, a, b).foreach(res.+=)
          res += cur
        } else if (prevIn) lineIntersect(prev, cur, a, b).foreach(res.+=)
        j += 1
      }
      out = res.toVector
      i += 1
    }
    out
  }

  private def lineIntersect(p1: Pt, p2: Pt, a: Pt, b: Pt): Option[Pt] = {
    val d1 = cross(a, b, p1); val d2 = cross(a, b, p2)
    if (math.abs(d1 - d2) < 1e-30) None
    else {
      val t = d1 / (d1 - d2)
      Some(Pt(p1.x + t * (p2.x - p1.x), p1.y + t * (p2.y - p1.y)))
    }
  }

  /** Clip one segment to a convex ring: parametric (Cyrus–Beck style). */
  private def clipSegment(p1: Pt, p2: Pt, clip: IndexedSeq[Pt]): Option[(Pt, Pt)] = {
    val ccw = if (ringArea(clip) < 0) clip.reverse else clip
    var t0 = 0.0; var t1 = 1.0
    val dx = p2.x - p1.x; val dy = p2.y - p1.y
    var i = 0
    while (i < ccw.length - 1) {
      val a = ccw(i); val b = ccw(i + 1)
      val nx = -(b.y - a.y); val ny = b.x - a.x // inward normal of CCW edge
      val denom = nx * dx + ny * dy
      val num = nx * (a.x - p1.x) + ny * (a.y - p1.y)
      if (math.abs(denom) < 1e-30) {
        if (num > Eps) return None // parallel and outside (n.(p1-a) = -num < 0)
      } else {
        val t = num / denom
        if (denom > 0) t0 = math.max(t0, t) else t1 = math.min(t1, t)
        if (t0 > t1 + Eps) return None
      }
      i += 1
    }
    if (t1 - t0 <= Eps) None
    else Some((Pt(p1.x + t0 * dx, p1.y + t0 * dy), Pt(p1.x + t1 * dx, p1.y + t1 * dy)))
  }

  def boundary(g: Geom): Option[Geom] = g match {
    case GPoint(_, s) => Some(GMultiPoint(Vector.empty, s))
    case GMultiPoint(_, s) => Some(GMultiPoint(Vector.empty, s))
    case l @ GLine(ps, s) =>
      if (ps.isEmpty || l.closed) Some(GMultiPoint(Vector.empty, s))
      else Some(GMultiPoint(Vector(ps.head, ps.last), s))
    case GMultiLine(ls, s) =>
      val ends = ls.filter(l => l.nonEmpty && !(l.length >= 4 && l.head == l.last))
        .flatMap(l => Vector(l.head, l.last))
      Some(GMultiPoint(ends.toVector, s))
    case GPolygon(rs, s) =>
      if (rs.isEmpty) None
      else if (rs.length == 1) Some(GLine(rs.head, s))
      else Some(GMultiLine(rs, s))
    case GMultiPolygon(ps, s) => Some(GMultiLine(ps.flatten, s))
  }

  // -------------------------------------------------------------- binning
  /** Square-bin spatial aggregation ids; exact reimplementation of the
    * reference's addressing math (ref esri/BinUtils.java:28-73): the plane
    * is a sqrt(Long.MaxValue)-per-axis grid centered at the origin, row-major
    * cell ids. This is the scale path for spatial GROUP BY — a map-side id,
    * no spatial index, no shuffle beyond the aggregation's own.
    */
  final class Bins(binSize: Double) {
    private val maxBinsPerAxis = math.sqrt(Long.MaxValue).toLong
    private val size: Double = if (binSize < 1) maxBinsPerAxis * binSize else maxBinsPerAxis.toDouble
    val extentMax: Double = size / 2
    val extentMin: Double = extentMax - size
    val numCols: Long = math.ceil(size / binSize).toLong
    def id(x: Double, y: Double): Long =
      ((extentMax - y) / binSize).toLong * numCols + ((x - extentMin) / binSize).toLong
    def envelopeOf(binId: Long): (Double, Double, Double, Double) = {
      val down = binId / numCols; val over = binId % numCols
      val xmin = extentMin + over * binSize
      val ymax = extentMax - down * binSize
      (xmin, ymax - binSize, xmin + binSize, ymax)
    }
  }
}
