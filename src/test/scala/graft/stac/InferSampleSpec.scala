package graft.stac

import org.scalatest.funsuite.AnyFunSuite

/** Pins InferSample's divergence envelope vs the reference's FirstBatch
  * strategy (`_api.py:121-126,49-62`): FirstBatch raises on ANY schema
  * disagreement in later chunks; Spark's FAILFAST JSON read raises on type
  * conflicts but silently drops fields absent from the schema. The
  * difference is documented on StacJsonReader — this test keeps it true. */
class InferSampleSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def writeNdjson(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("infer", ".ndjson")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("type conflict after the sampled prefix fails loudly (FAILFAST)") {
    val path = writeNdjson(Seq(
      """{"id":"a","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":10}}""",
      """{"id":"b","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":20}}""",
      """{"id":"c","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":"not-a-number"}}"""))
    val e = intercept[org.apache.spark.SparkException] {
      StacJsonReader.read(spark, Seq(path), StacJsonReader.InferSample(2)).collect()
    }
    assert(e.getMessage.contains("FAILFAST") || e.getMessage.contains("MALFORMED"))
  }

  test("Explicit schema conflicts fail loudly instead of silently nulling rows") {
    val path = writeNdjson(Seq(
      """{"id":"a","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":10}}""",
      """{"id":"b","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":"oops"}}"""))
    val schema = StacJsonReader.read(spark, Seq(writeNdjson(Seq(
      """{"id":"a","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":10}}""")))).schema
    val e = intercept[org.apache.spark.SparkException] {
      StacJsonReader.read(spark, Seq(path), StacJsonReader.Explicit(schema)).collect()
    }
    assert(e.getMessage.contains("FAILFAST") || e.getMessage.contains("MALFORMED"))
  }

  test("ndjson misrouted to the whole-file path still yields every item") {
    // leading blank line defeats line-peek detection ONLY if blank lines
    // weren't skipped; even when a file does land on the whole-file path,
    // concatenated documents must all be parsed
    val path = writeNdjson(Seq(
      "",
      """{"id":"a","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":10}}""",
      """{"id":"b","geometry":{"type":"Point","coordinates":[3.0,4.0]},"properties":{"gsd":20}}"""))
    val df = StacJsonReader.read(spark, Seq(path))
    assert(df.count() == 2, "all items must survive regardless of routing")
  }

  test("fields absent from the sampled prefix are dropped, not errors (divergence from FirstBatch)") {
    val path = writeNdjson(Seq(
      """{"id":"a","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":10}}""",
      """{"id":"b","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":20}}""",
      """{"id":"c","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"gsd":30,"platform":"s2"}}"""))
    val df = StacJsonReader.read(spark, Seq(path), StacJsonReader.InferSample(2))
    assert(df.count() == 3)
    assert(!df.select("properties.*").columns.contains("platform"))
    // the full-inference strategy keeps it
    val full = StacJsonReader.read(spark, Seq(path), StacJsonReader.InferFull)
    assert(full.select("properties.*").columns.contains("platform"))
  }
}
