package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Offline JSON-Schema conformance for the `stac-geoparquet` footer
  * (reference: `tests/test_parquet.py:62-111`, which fetches
  * stac-geoparquet-spec 0.7.0's metadata.json over HTTP and validates
  * with Python jsonschema). The identical schema document is vendored at
  * `src/test/resources/geoparquet/stac-geoparquet-metadata-0.7.0.json`
  * (copied verbatim from the reference's recorded VCR cassette —
  * `tests/cassettes/test_parquet/test_metadata[True].yaml`), and
  * validated here with [[JsonSchemaLite]]. */
class GeoParquetSchemaSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private lazy val schema = mapper.readTree(
    getClass.getResourceAsStream("/geoparquet/stac-geoparquet-metadata-0.7.0.json"))

  test("vendored schema is the spec document (sanity)") {
    assert(schema.get("title").asText() == "STAC GeoParquet Metadata")
    assert(schema.get("required").get(0).asText() == "version")
    assert(schema.get("properties").get("version").get("const").asText() == "1.0.0")
  }

  test("builder output without collections validates") {
    val inst = mapper.readTree(StacSchema.stacGeoParquetMetadata())
    assert(JsonSchemaLite.validate(schema, inst).isEmpty)
  }

  test("builder output with collections validates") {
    val coll = """{"naip":{"id":"naip","description":"d"}}"""
    val inst = mapper.readTree(StacSchema.stacGeoParquetMetadata(Some(coll)))
    assert(JsonSchemaLite.validate(schema, inst).isEmpty)
  }

  test("the validator has teeth: bad instances are rejected") {
    def errsOf(json: String) = JsonSchemaLite.validate(schema, mapper.readTree(json))
    assert(errsOf("""{}""").exists(_.contains("missing required key 'version'")))
    assert(errsOf("""{"version":"2.0.0"}""").exists(_.contains("const")))
    assert(errsOf("""{"version":1}""").nonEmpty)
    assert(errsOf("""{"version":"1.0.0","collections":{"naip":"not-an-object"}}""")
      .exists(_.contains("expected object")))
    assert(errsOf("""{"version":"1.0.0","collections":"nope"}""").nonEmpty)
  }

  test("footer read back from a real GeoParquet write validates against the spec") {
    val tmp = java.nio.file.Files.createTempDirectory("gpqschema").toString
    val df = Normalize(StacJsonReader.read(SparkSpec.spark,
      Seq(SparkSpec.resource("/data/naip-pc.json"))))
    GeoParquetWriter.write(df, s"$tmp/naip",
      collectionsJson = Some("""{"naip":{"id":"naip"}}"""))
    val part = new java.io.File(s"$tmp/naip").listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val kv = GeoParquetWriter.readFooterMetadata(
      new org.apache.hadoop.conf.Configuration(), part.getAbsolutePath)
    val inst = mapper.readTree(kv("stac-geoparquet"))
    val errs = JsonSchemaLite.validate(schema, inst)
    assert(errs.isEmpty, errs.mkString("; "))
    // `geo` structural assertions from the same reference test
    val geo = mapper.readTree(kv("geo"))
    assert(geo.properties().size() == 3) // exactly {version, columns, primary_column}
    assert(geo.has("version") && geo.has("columns") && geo.has("primary_column"))
  }

  test("3-D table (3dep-lidar-copc): covering stays the spec's 2-D mapping; " +
       "footer still validates") {
    val tmp = java.nio.file.Files.createTempDirectory("gpq3d").toString
    val df = Normalize(StacJsonReader.read(SparkSpec.spark,
      Seq(SparkSpec.resource("/data/3dep-lidar-copc-pc.json"))))
    // the fixture's 6-element bbox arrays carry z — the bbox struct must be 3-D
    val bboxT = df.schema("bbox").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(bboxT.fieldNames.toSeq ==
      Seq("xmin", "ymin", "zmin", "xmax", "ymax", "zmax"),
      s"expected a 6-field 3-D bbox struct, got ${bboxT.fieldNames.toSeq}")
    GeoParquetWriter.write(df, s"$tmp/copc")
    val part = new java.io.File(s"$tmp/copc").listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val kv = GeoParquetWriter.readFooterMetadata(
      new org.apache.hadoop.conf.Configuration(), part.getAbsolutePath)
    assert(JsonSchemaLite.validate(schema,
      mapper.readTree(kv("stac-geoparquet"))).isEmpty)
    // documented choice (StacSchema.geoMetadata): GeoParquet 1.1's
    // covering.bbox JSON Schema defines EXACTLY xmin/ymin/xmax/ymax —
    // no z paths exist in the spec — so a 3-D table declares the same
    // four x/y struct leaves and leaves zmin/zmax as ordinary columns
    val covering = mapper.readTree(kv("geo"))
      .get("columns").get("geometry").get("covering")
    assert(covering != null && covering.has("bbox"))
    val cb = covering.get("bbox")
    assert(cb.properties().asScala.map(_.getKey).toSet ==
      Set("xmin", "ymin", "xmax", "ymax"),
      s"covering must carry the spec's four 2-D keys only: $cb")
    for (k <- Seq("xmin", "ymin", "xmax", "ymax")) {
      val path = cb.get(k)
      assert(path.isArray && path.size() == 2 &&
        path.get(0).asText() == "bbox" && path.get(1).asText() == k,
        s"covering.$k must point at the bbox struct leaf: $path")
    }
  }
}
