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

  test("a line conflicting with the pinned schema fails the batch (FAILFAST), no silent nulls") {
    val src = java.nio.file.Files.createTempDirectory("ss-bad")
    val out = java.nio.file.Files.createTempDirectory("ss-badout").toString + "/items"
    val ckpt = java.nio.file.Files.createTempDirectory("ss-badckpt").toString
    java.nio.file.Files.write(src.resolve("a.ndjson"), itemLine(0).getBytes("UTF-8"))
    val (schema, dims) = StacStream.inferIngestSpec(spark, Seq(src.resolve("a.ndjson").toString))
    java.nio.file.Files.write(src.resolve("bad.ndjson"),
      """{"id":"b","geometry":{"type":"Point","coordinates":[0.0,0.0]},"bbox":[0.0,0.0,0.0,0.0],"assets":{},"properties":{"datetime":"2024-01-01T00:00:00Z","gsd":"oops"}}""".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StacStream.ingest(spark, src.toString, out, ckpt, schema, dims).awaitTermination()
    }
    assert(e.getMessage.contains("MALFORMED") || e.getMessage.contains("FAILFAST")
      || Option(e.getCause).exists(c => c.toString.contains("MALFORMED") || c.toString.contains("FAILFAST")))
  }

  test("inferIngestSpec rejects mixed 2-D/3-D bboxes") {
    val src = java.nio.file.Files.createTempDirectory("ss-mix")
    java.nio.file.Files.write(src.resolve("a.ndjson"),
      (Seq(itemLine(1)) :+
        """{"id":"z","geometry":{"type":"Point","coordinates":[0.0,0.0,1.0]},"bbox":[0.0,0.0,1.0,0.0,0.0,1.0],"assets":{},"properties":{"datetime":"2024-01-01T00:00:00Z","gsd":10}}""")
        .mkString("\n").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      StacStream.inferIngestSpec(spark, Seq(src.resolve("a.ndjson").toString))
    }
    assert(e.getMessage.contains("Mixed 2d-3d"))
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
