package graft.sources

import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Enclosed Esri-JSON / GeoJSON feature files + the two JSON geometry
  * dialects behind them (ST_AsJson/ST_GeomFromJson = Esri REST,
  * ST_AsGeoJson/ST_GeomFromGeoJson = GeoJSON — separate names, as in the
  * reference).
  */
class EnclosedJsonSpec extends SparkSpec with Matchers {

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("enclosed_")
    java.nio.file.Files.write(dir.resolve("part-00000.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("esri JSON geometry dialect round-trips through ST_AsJson/ST_GeomFromJson") {
    graft.functions.GeoFunctions.registerAll(spark)
    val wkts = Seq(
      "POINT (1.5 -2)",
      "MULTIPOINT (0 0, 3 4)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    wkts.foreach { w =>
      val js = spark.sql(s"SELECT st_asjson('$w') AS j").head.getString(0)
      val back = spark.sql(
        s"SELECT st_equals(st_geomfromjson('${js.replace("'", "''")}'), " +
          s"'$w') AS eq").head.getBoolean(0)
      assert(back, s"esri-json round trip diverged for $w -> $js")
    }
    // the two dialects are distinct: AsJson speaks x/y-rings, AsGeoJson
    // speaks type/coordinates
    val esri = spark.sql("SELECT st_asjson('POINT (1 2)') AS j").head.getString(0)
    val geo = spark.sql("SELECT st_asgeojson('POINT (1 2)') AS j").head.getString(0)
    assert(esri.contains("\"x\"") && !esri.contains("coordinates"))
    assert(geo.contains("\"coordinates\"") && !geo.contains("\"x\""))
    // MULTIPOLYGON survives the flat rings array via the spec's ring
    // orientation (CW shells, CCW holes) — two disjoint squares must NOT
    // rebuild as shell+hole (which would subtract areas)
    val mp = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), " +
      "((5 5, 6 5, 6 6, 5 6, 5 5)))"
    val mpBack = spark.sql(
      s"SELECT st_area(st_geomfromjson(st_asjson('$mp'))) AS a, " +
        s"st_area('$mp') AS e").head
    assert(mpBack.getDouble(0) === mpBack.getDouble(1),
      "multipolygon area changed through the Esri rings round trip")
    assert(mpBack.getDouble(0) === 2.0)
    // a polygon WITH a hole keeps subtracting
    val holed = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), " +
      "(2 2, 4 2, 4 4, 2 4, 2 2))"
    val hb = spark.sql(
      s"SELECT st_area(st_geomfromjson(st_asjson('$holed'))) AS a").head
    assert(hb.getDouble(0) === 96.0)
    // the spec constrains ORIENTATION, not ordering: a writer emitting all
    // shells first (shellA CW, shellB CW, holeInA CCW) must still attach
    // the hole to the CONTAINING shell — area = (100-4) + 1 = 97
    val outOfOrder =
      """{"rings":[[[0,0],[0,10],[10,10],[10,0],[0,0]],
        |[[20,20],[20,21],[21,21],[21,20],[20,20]],
        |[[2,2],[4,2],[4,4],[2,4],[2,2]]]}""".stripMargin.replace("\n", "")
    val ooArea = spark.sql(
      s"SELECT st_area(st_geomfromjson('$outOfOrder')) AS a").head.getDouble(0)
    assert(ooArea === 97.0,
      s"hole must attach to its CONTAINING shell, got area $ooArea")
    // empty point and polyline parse too
    assert(spark.sql("""SELECT st_geomfromjson('{"x":null,"y":null}') AS g""")
      .head.getString(0) === "POINT EMPTY")
    assert(spark.sql(
      """SELECT st_geomfromjson('{"paths":[[[0,0],[2,2]],[[5,5],[6,5]]]}') AS g""")
      .head.getString(0).startsWith("MULTILINESTRING"))
  }

  test("enclosed Esri JSON features read as typed attributes + WKT geometry") {
    val dir = writeLines(Seq(
      """{"attributes":{"id":1,"name":"hq","pop":1200},"geometry":{"x":13.4,"y":52.5}}""",
      """{"attributes":{"id":2,"name":"lab","pop":40},"geometry":{"x":-71.1,"y":42.3}}""",
      """{"attributes":{"id":3,"name":"zone","pop":7},"geometry":{"rings":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}}"""))
    val df = EnclosedJson.readEsriJson(spark, dir,
      Seq("id" -> "bigint", "name" -> "string", "pop" -> "int"))
    assert(df.schema.map(f => f.name -> f.dataType.typeName) ===
      Seq("id" -> "long", "name" -> "string", "pop" -> "integer",
        "shape" -> "string"))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(0).getString(3) === "POINT (13.4 52.5)")
    assert(rows(2).getString(3).startsWith("POLYGON"))
    // geometry is live for the ST_* surface: point-in-polygon across rows
    df.createOrReplaceTempView("esri_feats")
    val hit = spark.sql(
      """SELECT count(*) AS n FROM esri_feats a JOIN esri_feats b
        |ON b.id = 3 AND a.id <> 3
        |AND st_contains(b.shape, st_point(st_x(a.shape), st_y(a.shape)))"""
        .stripMargin).head.getLong(0)
    assert(hit === 0) // neither point lies in the 0..10 zone
  }

  test("enclosed GeoJSON features read via the properties/geometry contract") {
    val dir = writeLines(Seq(
      """{"type":"Feature","properties":{"id":10,"kind":"poi"},"geometry":{"type":"Point","coordinates":[2.35,48.86]}}""",
      """{"type":"Feature","properties":{"id":11,"kind":"area"},"geometry":{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}}"""))
    val df = EnclosedJson.readGeoJson(spark, dir,
      Seq("id" -> "int", "kind" -> "string"), geomCol = "geom")
    val rows = df.orderBy("id").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((10, "poi"), (11, "area")))
    assert(rows(0).getString(2) === "POINT (2.35 48.86)")
    assert(rows(1).getString(2).startsWith("POLYGON"))
    // malformed geometry yields NULL (the SerDe's lenient contract), not a crash
    val bad = writeLines(Seq(
      """{"type":"Feature","properties":{"id":12,"kind":"broken"},"geometry":{"type":"Nope"}}"""))
    val b = EnclosedJson.readGeoJson(spark, bad,
      Seq("id" -> "int", "kind" -> "string"))
    assert(b.head.get(2) == null)
  }
}
