package graft.stac

/** STAC-GeoParquet schema constants and file-metadata builders.
  *
  * References (in /root/reference/):
  *  - top-level key set: `stac_geoparquet/arrow/_from_arrow.py:36-46`
  *  - timestamp column whitelist: `stac_geoparquet/arrow/_to_arrow.py:60-69`
  *  - `geo` / `stac-geoparquet` footer metadata:
  *    `stac_geoparquet/arrow/_to_parquet.py:82-175`
  *  - WGS84 PROJJSON: `stac_geoparquet/arrow/_crs.py:3` (pyproj EPSG:4326)
  */
object StacSchema {

  /** Column reference by EXACT name: backquoted (doubling escapes a
    * literal backquote) so a field name containing a dot is ONE column,
    * never a nested path — `col("a.b")` silently resolves into a
    * sibling struct. THE one shared escaping idiom: every projection
    * over dynamic field names (hoisted STAC properties, Delta table
    * schemas, user-supplied keys) must go through here. */
  def quotedCol(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col("`" + name.replace("`", "``") + "`")

  /** Alias-prefixed exact reference (`t`.`a.b` style). */
  def quotedCol(alias: String, name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col(
      alias + ".`" + name.replace("`", "``") + "`")

  /** Closed set of STAC top-level keys — everything else is a property. */
  val TopLevelKeys: Set[String] = Set(
    "type", "stac_version", "stac_extensions", "id",
    "geometry", "bbox", "links", "assets", "collection")

  /** The 8 datetime columns typed as timestamp[us, UTC]. */
  val TimestampColumns: Seq[String] = Seq(
    "datetime", "start_datetime", "end_datetime",
    "created", "updated", "expires", "published", "unpublished")

  /** RFC3339 output format on denormalize (`_from_arrow.py:28` uses
    * pyarrow strftime "%Y-%m-%dT%H:%M:%SZ", where %S carries the
    * sub-second digits of the µs type — hence the fixed 6-digit
    * fraction here). */
  val Rfc3339Format = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  /** PROJJSON for EPSG:4326 (standard public document; the reference
    * generates it with pyproj at import time). */
  val Wgs84ProjJson: String =
    """{"$schema":"https://proj.org/schemas/v0.7/projjson.schema.json","type":"GeographicCRS","name":"WGS 84","datum_ensemble":{"name":"World Geodetic System 1984 ensemble","members":[{"name":"World Geodetic System 1984 (Transit)","id":{"authority":"EPSG","code":1166}},{"name":"World Geodetic System 1984 (G730)","id":{"authority":"EPSG","code":1152}},{"name":"World Geodetic System 1984 (G873)","id":{"authority":"EPSG","code":1153}},{"name":"World Geodetic System 1984 (G1150)","id":{"authority":"EPSG","code":1154}},{"name":"World Geodetic System 1984 (G1674)","id":{"authority":"EPSG","code":1155}},{"name":"World Geodetic System 1984 (G1762)","id":{"authority":"EPSG","code":1156}},{"name":"World Geodetic System 1984 (G2139)","id":{"authority":"EPSG","code":1309}}],"ellipsoid":{"name":"WGS 84","semi_major_axis":6378137,"inverse_flattening":298.257223563},"accuracy":"2.0","id":{"authority":"EPSG","code":6326}},"coordinate_system":{"subtype":"ellipsoidal","axis":[{"name":"Geodetic latitude","abbreviation":"Lat","direction":"north","unit":"degree"},{"name":"Geodetic longitude","abbreviation":"Lon","direction":"east","unit":"degree"}]},"scope":"Horizontal component of 3D system.","area":"World.","bbox":{"south_latitude":-90,"west_longitude":-180,"north_latitude":90,"east_longitude":180},"id":{"authority":"EPSG","code":4326}}"""

  val DefaultGeoParquetVersion = "1.1.0"
  val StacGeoParquetVersion = "1.0.0"

  /** Build the `geo` footer JSON (`_to_parquet.py:82-136`): WKB encoding,
    * WGS84 CRS, planar edges; bbox covering for spec >= 1.1; a second
    * `proj:geometry` column entry with `crs: null` when present.
    *
    * 3-D tables (6-field bbox struct with zmin/zmax) keep the SAME 2-D
    * covering mapping — a documented choice against the spec: GeoParquet
    * 1.1's `covering.bbox` object defines exactly the four keys
    * xmin/ymin/xmax/ymax (its JSON Schema admits no z paths), so naming
    * the struct's x/y leaves is the conformant encoding for both 2-D and
    * 3-D tables; the z bounds stay queryable as ordinary struct leaves
    * (row-group stats and Delta log stats cover them like any column),
    * they are just not part of the declared covering.
    * `GeoParquetSchemaSpec` pins this over a 3-D fixture. */
  def geoMetadata(
      schemaVersion: String = DefaultGeoParquetVersion,
      hasProjGeometry: Boolean = false): String = {
    val covering =
      if (schemaVersion.split("\\.")(1).toInt >= 1)
        ""","covering":{"bbox":{"xmin":["bbox","xmin"],"ymin":["bbox","ymin"],"xmax":["bbox","xmax"],"ymax":["bbox","ymax"]}}"""
      else ""
    val geometryCol =
      s"""{"encoding":"WKB","geometry_types":[],"crs":$Wgs84ProjJson,"edges":"planar"$covering}"""
    val projCol =
      if (hasProjGeometry)
        ""","proj:geometry":{"encoding":"WKB","geometry_types":[],"crs":null}"""
      else ""
    s"""{"version":"$schemaVersion","columns":{"geometry":$geometryCol$projCol},"primary_column":"geometry"}"""
  }

  /** Build the `stac-geoparquet` footer JSON (`_to_parquet.py:149-175`). */
  def stacGeoParquetMetadata(collectionsJson: Option[String] = None): String =
    collectionsJson match {
      case Some(c) => s"""{"version":"$StacGeoParquetVersion","collections":$c}"""
      case None => s"""{"version":"$StacGeoParquetVersion"}"""
    }

  /** geoarrow field metadata assigned to the geometry column (P4,
    * `_to_arrow.py:203-217`). */
  def geoArrowFieldMetadataJson: String =
    s"""{"ARROW:extension:name":"geoarrow.wkb","ARROW:extension:metadata":"{\\"crs\\": ${Wgs84ProjJson.replace("\"", "\\\"")}}"}"""

  import org.apache.spark.sql.types._

  /** A1: permissive union-merge of two schemas, mirroring the reference's
    * fold over `pa.unify_schemas(..., promote_options="permissive")`
    * (`_schema/models.py:52-59`) for the dict-input path (Spark's own JSON
    * inference performs this fold internally; this utility exists for
    * merging schemas of separately-read chunks).
    *
    * Promotion rules: null adopts the other side; integral widths widen;
    * integral + fractional → double; any other scalar conflict → string
    * (Spark's JSON-inference fallback); arrays merge element types;
    * structs union fields by name (left order first) and merge recursively;
    * a field missing on one side stays nullable.
    */
  def mergeStructTypes(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val aNames = a.fieldNames.toSet
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) => StructField(fa.name, mergeDataTypes(fa.dataType, fb.dataType),
          fa.nullable || fb.nullable, fa.metadata)
        case None => fa.copy(nullable = true)
      }
    } ++ b.fields.filterNot(f => aNames.contains(f.name)).map(_.copy(nullable = true))
    StructType(merged)
  }

  def mergeDataTypes(x: DataType, y: DataType): DataType = (x, y) match {
    case (a, b) if a == b => a
    case (NullType, t) => t
    case (t, NullType) => t
    case (a: StructType, b: StructType) => mergeStructTypes(a, b)
    case (ArrayType(a, n1), ArrayType(b, n2)) => ArrayType(mergeDataTypes(a, b), n1 || n2)
    case (a, b) if integralWidth(a) > 0 && integralWidth(b) > 0 =>
      if (integralWidth(a) >= integralWidth(b)) a else b
    case (a, b) if isNumeric(a) && isNumeric(b) => DoubleType
    case _ => StringType
  }

  /** >0 for integer types (their byte width), 0 otherwise. */
  private def integralWidth(t: DataType): Int = t match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 4
    case LongType => 8
    case _ => 0
  }

  private def isNumeric(t: DataType): Boolean =
    integralWidth(t) > 0 || t == FloatType || t == DoubleType
}
