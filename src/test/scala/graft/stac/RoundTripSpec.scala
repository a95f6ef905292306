package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Round-trip tests over the reference's 13 golden collections
  * (`tests/test_arrow.py:46-57`, `tests/test_parquet.py:43-59`):
  * items JSON → normalize → (GeoParquet) → denormalize → items JSON,
  * compared with the fuzzy oracle. */
class RoundTripSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private lazy val spark = SparkSpec.spark

  private val collections = Seq(
    "3dep-lidar-copc-pc", "3dep-lidar-dsm-pc", "cop-dem-glo-30-pc",
    "io-lulc-annual-v02-pc", "io-lulc-pc", "landsat-c2-l1-pc",
    "landsat-c2-l2-pc", "naip-pc", "planet-nicfi-analytic-pc",
    "sentinel-1-rtc-pc", "sentinel-2-l2a-pc", "umbra-sar", "us-census-pc")

  private def origItems(name: String): Map[String, JsonNode] = {
    val arr = mapper.readTree(new java.io.File(SparkSpec.resource(s"/data/$name.json")))
    (0 until arr.size()).map(i => arr.get(i).get("id").asText() -> arr.get(i)).toMap
  }

  private def roundTrip(name: String): Unit = {
    val path = SparkSpec.resource(s"/data/$name.json")
    val df = StacJsonReader.read(spark, Seq(path))
    val norm = Normalize(df)

    // spec-shape schema invariants
    assert(!norm.schema.fieldNames.contains("properties"), "properties must be hoisted")
    assert(norm.schema("geometry").dataType == BinaryType)
    StacSchema.TimestampColumns.foreach { c =>
      norm.schema.fields.find(_.name == c).foreach(f =>
        assert(f.dataType == TimestampType, s"$c should be timestamp"))
    }
    if (norm.schema.fieldNames.contains("bbox"))
      assert(norm.schema("bbox").dataType.isInstanceOf[StructType], "bbox must be struct")

    val back = Denormalize.toItemJson(norm).collect()
    val orig = origItems(name)
    assert(back.length == orig.size, s"row count: ${back.length} != ${orig.size}")
    back.foreach { itemJson =>
      val node = mapper.readTree(itemJson)
      val id = node.get("id").asText()
      JsonEquals.assertEqual(orig(id), node)
    }
  }

  collections.foreach { name =>
    test(s"items → normalize → denormalize → items: $name") { roundTrip(name) }
  }

  test("round trip through GeoParquet file with footer metadata: naip-pc") {
    val tmp = java.nio.file.Files.createTempDirectory("gpq").toString
    val df = Normalize(StacJsonReader.read(spark, Seq(SparkSpec.resource("/data/naip-pc.json"))))
    GeoParquetWriter.write(df, s"$tmp/naip")

    // footer KV metadata (K1)
    val part = new java.io.File(s"$tmp/naip").listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val kv = GeoParquetWriter.readFooterMetadata(
      new org.apache.hadoop.conf.Configuration(), part.getAbsolutePath)
    assert(kv.contains("geo") && kv.contains("stac-geoparquet"))
    val geo = mapper.readTree(kv("geo"))
    assert(geo.get("version").asText() == "1.1.0")
    assert(geo.get("primary_column").asText() == "geometry")
    assert(geo.get("columns").get("geometry").get("encoding").asText() == "WKB")
    assert(geo.get("columns").get("geometry").get("covering").get("bbox").get("xmin").get(0).asText() == "bbox")
    assert(mapper.readTree(kv("stac-geoparquet")).get("version").asText() == "1.0.0")

    // read back through Spark and denormalize
    val back = Denormalize.toItemJson(spark.read.parquet(s"$tmp/naip")).collect()
    val orig = origItems("naip-pc")
    assert(back.length == orig.size)
    back.foreach { itemJson =>
      val node = mapper.readTree(itemJson)
      JsonEquals.assertEqual(orig(node.get("id").asText()), node)
    }
  }

  test("K6 layout: partitionBy(collection) write gets footers in every subdirectory") {
    val tmp = java.nio.file.Files.createTempDirectory("gpqpart").toString
    val df = Normalize(StacJsonReader.read(spark, Seq(
      SparkSpec.resource("/data/naip-pc.json"), SparkSpec.resource("/data/sentinel-2-l2a-pc.json"))))
    df.write.partitionBy("collection").parquet(s"$tmp/by_collection")
    GeoParquetWriter.addFooterMetadata(spark, s"$tmp/by_collection",
      Map("geo" -> graft.stac.StacSchema.geoMetadata(),
        "stac-geoparquet" -> graft.stac.StacSchema.stacGeoParquetMetadata()))
    val partFiles = new java.io.File(s"$tmp/by_collection").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.getName.endsWith(".parquet"))
    assert(partFiles.length >= 2, "expected one part dir per collection")
    partFiles.foreach { f =>
      val kv = GeoParquetWriter.readFooterMetadata(
        new org.apache.hadoop.conf.Configuration(), f.getAbsolutePath)
      assert(kv.contains("geo") && kv.contains("stac-geoparquet"), f.getName)
    }
    // data still reads back with partition pruning on collection
    val back = spark.read.parquet(s"$tmp/by_collection")
    assert(back.filter(org.apache.spark.sql.functions.col("collection") === "naip").count() > 0)
  }

  test("3-D bbox becomes 6-field struct with zmin/zmax: 3dep-lidar-copc-pc") {
    val df = Normalize(StacJsonReader.read(spark,
      Seq(SparkSpec.resource("/data/3dep-lidar-copc-pc.json"))))
    val bbox = df.schema("bbox").dataType.asInstanceOf[StructType]
    assert(bbox.fieldNames.toSeq == Seq("xmin", "ymin", "zmin", "xmax", "ymax", "zmax"))
  }

  test("property/top-level collision drops with warning or raises") {
    import spark.implicits._
    val item =
      """{"type":"Feature","id":"x","geometry":{"type":"Point","coordinates":[1.0,2.0]},
         "bbox":[1.0,2.0,1.0,2.0],"links":[],"assets":{},
         "properties":{"collection":"evil","datetime":"2020-01-01T00:00:00Z","ok":1},
         "collection":"good"}""".replaceAll("\n\\s*", "")
    val ds = spark.createDataset(Seq(StacJsonReader.geometryToWkbHex(item)))
    val df = StacJsonReader.hexGeometryToBinary(spark.read.json(ds))
    val dropped = Normalize(df, dropInvalidProperties = true)
    assert(dropped.select("collection").head().getString(0) == "good")
    assert(dropped.schema.fieldNames.contains("ok"))
    intercept[IllegalArgumentException] {
      Normalize(df, dropInvalidProperties = false)
    }
  }

  test("schema strategies: explicit, sampled, full infer agree on naip") {
    val path = SparkSpec.resource("/data/naip-pc.json")
    val full = StacJsonReader.read(spark, Seq(path), StacJsonReader.InferFull)
    val sampled = StacJsonReader.read(spark, Seq(path), StacJsonReader.InferSample(2))
    val explicit = StacJsonReader.read(spark, Seq(path),
      StacJsonReader.Explicit(spark.read.json(
        StacJsonReader.readItemStrings(spark, Seq(path))).schema))
    assert(full.count() == 4 && sampled.count() == 4 && explicit.count() == 4)
    assert(sampled.schema == full.schema)
  }
}
