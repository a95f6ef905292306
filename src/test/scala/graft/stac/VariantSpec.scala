package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** VARIANT columns through the portable engine — the spec's
  * `variantType` reader+writer feature: declared at table birth (an
  * unaware reader would misread the two-binary-field encoding), healed
  * on schema evolution, and the column rides DML, checkpoints, and the
  * CDF reconstruction untouched (stats-ineligible: never pruned on). */
class VariantSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pvar").toString + "/tbl"

  private def vdf(n: Int) = spark.range(n).selectExpr("id",
    "parse_json(concat('{\"k\":', id, ',\"s\":\"v', id, '\"}')) AS payload")

  test("variant table declares variantType at birth; DML/checkpoint/CDF round-trip") {
    val path = tmp()
    PortableDelta.write(vdf(6).coalesce(1), path,
      properties = Map(PortableDelta.CdfProp -> "true"))
    // protocol: BOTH sides from v0
    val lines = scala.io.Source.fromFile(
      s"$path/_delta_log/${"%020d".format(0L)}.json", "UTF-8")
      .getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
    val proto = lines.find(_.has("protocol")).get.get("protocol")
    def feats(k: String) = Option(proto.get(k)).filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    assert(feats("readerFeatures").contains("variantType") &&
      feats("writerFeatures").contains("variantType"))
    // typed access round-trips
    assert(PortableDelta.readTable(spark, path)
      .selectExpr("sum(variant_get(payload, '$.k', 'long')) AS s")
      .collect().head.getLong(0) == 15L)
    // DML over the variant-carrying files (DV path)
    PortableDelta.delete(spark, path, col("id") % 2 === 0L)
    // the CDF reconstruction carries the variant column too
    val ch = PortableDelta.readChanges(spark, path, 1L, 1L)
      .filter(col("_change_type") === "delete")
      .selectExpr("variant_get(payload, '$.k', 'long') AS k")
      .collect().map(_.getLong(0)).toSet
    assert(ch == Set(0L, 2L, 4L))
    // maintenance: the column rides checkpoint replay
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    assert(PortableDelta.readTable(spark, path)
      .selectExpr("variant_get(payload, '$.s', 'string') AS s")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("v1", "v3", "v5"))
    // variant is stats-INELIGIBLE: no bounds recorded, never pruned on
    val snap = PortableDelta.snapshot(spark, path)
    snap.files.flatMap(_.stats).foreach { s =>
      assert(!mapper.readTree(s).get("minValues").has("payload"))
    }
  }

  test("schema evolution into variant heals the feature on an existing table") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 3L).map(i => (i, s"d$i")).toDF("id", "body")
      .coalesce(1), path)
    assert(!PortableDelta.snapshot(spark, path)
      .writerFeatures.contains("variantType"))
    PortableDelta.write(
      spark.range(10, 12).selectExpr("id", "'x' AS body",
        "parse_json('{\"a\":1}') AS extra").coalesce(1),
      path, mode = "append", mergeSchema = true)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.readerFeatures.contains("variantType") &&
      snap.writerFeatures.contains("variantType"),
      "the evolving append must declare the feature in the same commit")
    assert(PortableDelta.readTable(spark, path)
      .filter(col("extra").isNull).count() == 3L)
  }
}
