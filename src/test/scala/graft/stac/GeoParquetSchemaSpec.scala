package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

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
}
