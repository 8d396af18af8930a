package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Enclosed-JSON spatial file readers (ref ql/io/esriJson/
  * EnclosedEsriJsonInputFormat.java + udf/esri/serde/EsriJsonSerDe.java and
  * GeoJsonSerDe.java): one feature per line —
  *
  *   - Esri dialect: `{"attributes": {...}, "geometry": <esri-json>}`
  *     (REST-spec geometry: x/y, points, paths, rings);
  *   - GeoJSON dialect: `{"type":"Feature","properties": {...},
  *     "geometry": <geojson>}`.
  *
  * Both compose the built-in text source with codegen'd JSON extraction
  * (`get_json_object` + `from_json` for the typed attribute struct); only
  * the geometry conversion to WKT runs through the registered `ST_*`
  * dialect parsers — the same wrapper stance as the rest of the geo
  * surface (the reference wraps the esri library in UDFs identically).
  * Attribute columns land typed, the geometry lands as a WKT column ready
  * for [[graft.operators.SpatialJoin]] and the ST_* functions.
  */
object EnclosedJson {

  /** attributes: (name, Spark DDL type) pairs, e.g. ("id", "bigint"). */
  def readEsriJson(spark: SparkSession, path: String,
      attributes: Seq[(String, String)],
      geomCol: String = "shape"): DataFrame =
    readEnclosed(spark, path, attributes, geomCol,
      attrsKey = "attributes", geomFn = "st_geomfromjson")

  def readGeoJson(spark: SparkSession, path: String,
      attributes: Seq[(String, String)],
      geomCol: String = "shape"): DataFrame =
    readEnclosed(spark, path, attributes, geomCol,
      attrsKey = "properties", geomFn = "st_geomfromgeojson")

  private def readEnclosed(spark: SparkSession, path: String,
      attributes: Seq[(String, String)], geomCol: String,
      attrsKey: String, geomFn: String): DataFrame = {
    graft.functions.GeoFunctions.registerAll(spark)
    val attrSchema = StructType(attributes.map { case (n, t) =>
      StructField(n, DataType.fromDDL(t)) })
    val cols = attributes.map { case (n, _) =>
      col("__attrs").getField(n).as(n)
    } :+ expr(s"$geomFn(get_json_object(value, '$$.geometry'))").as(geomCol)
    spark.read.text(path)
      .withColumn("__attrs",
        from_json(get_json_object(col("value"), s"$$.$attrsKey"), attrSchema))
      .select(cols: _*)
  }
}
