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

  test("property: random synthetic item batches survive the full round trip") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import com.fasterxml.jackson.databind.node.ObjectNode
    // fixed-precision grid doubles survive the JSON round trip exactly
    val coord = Gen.chooseNum(-17900L, 17900L).map(_ / 100.0)
    val grid = Gen.chooseNum(-999999L, 999999L).map(_ / 100.0)
    val rfc3339 = for {
      y <- Gen.choose(2015, 2024); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59)
    } yield f"$y%04d-$mo%02d-$d%02dT$h%02d:$mi%02d:00Z"

    def geometry(node: ObjectNode, is3d: Boolean, pts: Seq[(Double, Double, Double)],
                 poly: Boolean): Unit = {
      val g = node.putObject("geometry")
      def arr(p: (Double, Double, Double)) = {
        val a = mapper.createArrayNode()
        a.add(p._1); a.add(p._2); if (is3d) a.add(p._3); a
      }
      if (poly) {
        g.put("type", "Polygon")
        val ring = g.putArray("coordinates").addArray()
        (pts :+ pts.head).foreach(p => ring.add(arr(p)))
      } else {
        g.put("type", "Point")
        g.set[com.fasterxml.jackson.databind.JsonNode]("coordinates", arr(pts.head))
      }
    }

    def itemGen(idx: Int, is3d: Boolean, bbox3d: Boolean): Gen[ObjectNode] = for {
      poly <- Gen.oneOf(true, false)
      pts <- Gen.listOfN(if (poly) 4 else 1, Gen.zip(coord, coord, coord)).map(_.map(t => t))
      hasDt <- Gen.prob(0.8); dt <- rfc3339
      hasStr <- Gen.prob(0.7); sv <- Gen.alphaNumStr.map(_.take(12))
      nullStr <- Gen.prob(0.15)
      hasInt <- Gen.prob(0.7); iv <- Gen.chooseNum(-100000L, 100000L)
      hasDbl <- Gen.prob(0.7); dv <- grid
      hasBool <- Gen.prob(0.5); bv <- Gen.oneOf(true, false)
      hasArr <- Gen.prob(0.5); a1 <- grid; a2 <- grid
      hasNested <- Gen.prob(0.4); nv <- Gen.chooseNum(0L, 999L); ns <- Gen.alphaNumStr.map(_.take(6))
      hasBbox <- Gen.prob(0.8); b1 <- coord; b2 <- coord; bz <- coord
      hasAssets <- Gen.prob(0.7); hasThumb <- Gen.prob(0.4)
    } yield {
      val item = mapper.createObjectNode()
      item.put("type", "Feature"); item.put("stac_version", "1.0.0")
      item.put("id", s"item-$idx")
      geometry(item, is3d, pts, poly)
      if (hasBbox) {
        val b = item.putArray("bbox")
        val (x0, x1) = (math.min(b1, b2), math.max(b1, b2))
        b.add(x0); b.add(x0)
        if (bbox3d) b.add(bz)
        b.add(x1); b.add(x1)
        if (bbox3d) b.add(bz + 1.0)
      }
      val props = item.putObject("properties")
      if (hasDt) props.put("datetime", dt)
      if (nullStr) props.putNull("str_prop")
      else if (hasStr) props.put("str_prop", sv)
      if (hasInt) props.put("int_prop", iv)
      if (hasDbl) props.put("dbl_prop", dv)
      if (hasBool) props.put("bool_prop", bv)
      if (hasArr) { val a = props.putArray("arr_prop"); a.add(a1); a.add(a2) }
      if (hasNested) { val n = props.putObject("nested"); n.put("a", nv); n.put("b", ns) }
      item.putArray("links")
      val assets = item.putObject("assets")
      if (hasAssets) {
        val d = assets.putObject("data")
        d.put("href", s"s3://bucket/item-$idx.tif")
        d.putArray("roles").add("data")
      }
      if (hasThumb) {
        val t = assets.putObject("thumb")
        t.put("href", s"s3://bucket/item-$idx.png")
        t.put("type", "image/png")
      }
      item
    }

    val batchGen: Gen[(List[ObjectNode], Boolean)] = for {
      is3d <- Gen.oneOf(true, false)     // geometry dims: batch-wide
      bbox3d <- Gen.oneOf(true, false)   // bbox dims: batch-wide (mixed is rejected by P3)
      n <- Gen.choose(3, 7)
      items <- Gen.sequence[List[ObjectNode], ObjectNode](
        (0 until n).map(i => itemGen(i, is3d, bbox3d)))
    } yield (items, is3d)

    val prop = Prop.forAll(batchGen) { case (items, _) =>
      val arr = mapper.createArrayNode()
      items.foreach(arr.add)
      val tmp = java.nio.file.Files.createTempFile("fuzzitems", ".json")
      java.nio.file.Files.writeString(tmp, mapper.writeValueAsString(arr))
      try {
        val norm = Normalize(StacJsonReader.read(spark, Seq(tmp.toString)))
        val back = Denormalize.toItemJson(norm).collect()
        val orig = items.map(i => i.get("id").asText() -> i).toMap
        back.length == orig.size && back.forall { itemJson =>
          val node = mapper.readTree(itemJson)
          JsonEquals.equal(orig(node.get("id").asText()), node)
        }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
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

  test("a property name containing a DOT hoists, queries, and round-trips " +
       "as one column") {
    import spark.implicits._
    // "sci.doi"-style dotted keys are legal JSON property names; the
    // hoist/re-nest projections must treat them as EXACT names, never
    // nested paths (round 12: quoted references in Normalize/Denormalize)
    val item =
      """{"type":"Feature","id":"dotty","geometry":{"type":"Point","coordinates":[1.0,2.0]},
         "bbox":[1.0,2.0,1.0,2.0],"links":[],"assets":{},
         "properties":{"datetime":"2020-01-01T00:00:00Z","sci.doi":"10.5/x","score":7},
         "collection":"c"}""".replaceAll("\n\\s*", "")
    val ds = spark.createDataset(Seq(StacJsonReader.geometryToWkbHex(item)))
    val df = StacJsonReader.hexGeometryToBinary(spark.read.json(ds))
    val norm = Normalize(df)
    assert(norm.schema.fieldNames.contains("sci.doi"),
      s"dotted property must hoist as ONE column: ${norm.schema.fieldNames.toSeq}")
    assert(norm.select(org.apache.spark.sql.functions.col("`sci.doi`"))
      .head().getString(0) == "10.5/x")
    val back = mapper.readTree(Denormalize.toItemJson(norm).collect().head)
    assert(back.get("properties").get("sci.doi").asText() == "10.5/x",
      s"dotted property must re-nest flat: ${back.get("properties")}")
    assert(back.get("properties").get("score").asLong() == 7L)
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
