package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming STAC ingest: files land → normalized spec-shape parquet,
  * incrementally, exactly once. */
class StacStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def itemLine(id: Int): String = {
    val x = id % 10
    s"""{"id":"it$id","geometry":{"type":"Point","coordinates":[$x.0,1.0]},""" +
      s""""bbox":[$x.0,1.0,$x.0,1.0],"assets":{},""" +
      s""""properties":{"datetime":"2024-03-0${1 + id % 9}T00:00:00Z","gsd":10}}"""
  }

  test("incremental streaming ingest normalizes new files exactly once") {
    val src = java.nio.file.Files.createTempDirectory("ss-src")
    val out = java.nio.file.Files.createTempDirectory("ss-out").toString + "/items"
    val ckpt = java.nio.file.Files.createTempDirectory("ss-ckpt").toString

    java.nio.file.Files.write(src.resolve("a.ndjson"),
      (0 until 5).map(itemLine).mkString("\n").getBytes("UTF-8"))
    val schema = StacStream.inferItemSchema(spark, Seq(src.resolve("a.ndjson").toString))

    StacStream.ingest(spark, src.toString, out, ckpt, schema, bboxDims = Some(4))
      .awaitTermination(120000)
    val first = spark.read.parquet(out)
    assert(first.count() == 5)
    // normalized shape: hoisted properties, typed datetime, struct bbox, WKB geometry
    assert(first.schema("datetime").dataType.typeName == "timestamp")
    assert(first.schema("bbox").dataType.typeName == "struct")
    assert(first.schema("geometry").dataType.typeName == "binary")
    assert(first.columns.contains("gsd") && !first.columns.contains("properties"))

    // a new file lands → only its items are appended
    java.nio.file.Files.write(src.resolve("b.ndjson"),
      (5 until 8).map(itemLine).mkString("\n").getBytes("UTF-8"))
    StacStream.ingest(spark, src.toString, out, ckpt, schema, bboxDims = Some(4))
      .awaitTermination(120000)
    val all = spark.read.parquet(out)
    assert(all.count() == 8)
    assert(all.select("id").distinct().count() == 8)
    // WKB round-trips through the batch denormalizer
    val gj = mapper.readTree(graft.stac.Wkb.wkbToGeoJson(
      all.filter(col("id") === "it7").select("geometry").head().getAs[Array[Byte]](0)))
    assert(gj.get("type").asText() == "Point")
    assert(gj.get("coordinates").get(0).asDouble() == 7.0)
  }
}
