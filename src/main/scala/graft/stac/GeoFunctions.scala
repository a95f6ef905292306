package graft.stac

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Registered geometry UDFs (SURVEY §2.4 G1/G2/G4).
  *
  * These run only at the ingest/egress boundary (same position as the
  * reference's shapely calls, `stac_geoparquet/arrow/_batch.py:93-118,
  * 150-161`); the normalized table keeps geometry as WKB binary so scans
  * and filters stay codegen'd.
  */
object GeoFunctions {

  case class Bounds(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  val geojsonToWkbUdf = udf((s: String) => Wkb.geoJsonToWkb(s))
  val wkbToGeojsonUdf = udf((b: Array[Byte]) => Wkb.wkbToGeoJson(b))
  val wkbBoundsUdf = udf((b: Array[Byte]) =>
    Wkb.bounds(b).map { case (x0, y0, x1, y1) => Bounds(x0, y0, x1, y1) })

  def geojson_to_wkb(c: Column): Column = geojsonToWkbUdf(c)
  def wkb_to_geojson(c: Column): Column = wkbToGeojsonUdf(c)
  def wkb_bounds(c: Column): Column = wkbBoundsUdf(c)

  /** Register for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geojson_to_wkb", geojsonToWkbUdf)
    spark.udf.register("wkb_to_geojson", wkbToGeojsonUdf)
    spark.udf.register("wkb_bounds", wkbBoundsUdf)
  }
}
