package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Column defaults (the `allowColumnDefaults` writer feature; Spark's
  * CURRENT_DEFAULT field metadata): writes missing the column fill the
  * default, provided values always win, mergeInto inserts honor it,
  * and the feature is declared/healed. */
class DefaultsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pdflt").toString + "/tbl"

  private val defMeta: Metadata = new MetadataBuilder()
    .putString("CURRENT_DEFAULT", "'pending'").build()

  private def createTable(path: String): Unit = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("state", StringType, nullable = true, defMeta),
      StructField("v", LongType)))
    PortableDelta.write(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), path)
  }

  private def rows(path: String): Set[(Long, String, Long)] =
    PortableDelta.readTable(spark, path)
      .select(col("id"), col("state"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("append missing the column fills the default; provided wins") {
    val s = spark; import s.implicits._
    val path = tmp()
    createTable(path)
    assert(PortableDelta.snapshot(spark, path).writerFeatures
      .contains("allowColumnDefaults"))
    // batch WITHOUT the column: default computed, mid-schema order heals
    PortableDelta.write(Seq((0L, 10L), (1L, 20L)).toDF("id", "v")
      .coalesce(1), path, mode = "append")
    // batch WITH the column: provided values (incl. null) win
    PortableDelta.write(Seq((2L, "done", 30L), (3L, null, 40L))
      .toDF("id", "state", "v").coalesce(1), path, mode = "append")
    assert(rows(path) == Set(
      (0L, "pending", 10L), (1L, "pending", 20L),
      (2L, "done", 30L), (3L, null, 40L)))
  }

  test("mergeInto inserts fill the default; update branch untouched") {
    val s = spark; import s.implicits._
    val path = tmp()
    createTable(path)
    PortableDelta.write(Seq((0L, "done", 1L)).toDF("id", "state", "v")
      .coalesce(1), path, mode = "append")
    // source lacks `state` entirely — legal: update SETs only v, the
    // insert fills the default
    val st = PortableDelta.mergeInto(spark, path,
      Seq((0L, 100L), (5L, 500L)).toDF("id", "v"), Seq("id"),
      PortableDelta.MergeClauses(
        updateSet = Some(Map("v" -> col("s.v")))))
    assert(st.updatedRows == 1L && st.insertedRows == 1L, s"got $st")
    assert(rows(path) == Set(
      (0L, "done", 100L), (5L, "pending", 500L)))
  }

  test("external legacy table gains the feature on a default-filling append") {
    val s = spark; import s.implicits._
    val path = tmp()
    createTable(path)
    PortableDelta.write(Seq((0L, 1L)).toDF("id", "v").coalesce(1),
      path, mode = "append")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.writerFeatures.contains("allowColumnDefaults"))
    // defaults are WRITE-side only: the stored bytes carry the value
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    assert(rows(path) == Set((0L, "pending", 1L)))
  }
}
