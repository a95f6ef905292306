package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `disableColumnMapping`: the un-map verb that makes `DROP FEATURE
  * columnMapping` reachable. Identity-mapped tables (no physical-name
  * divergence) un-map metadata-only; diverged tables rewrite every
  * live file under the logical names in ONE commit; a dropped column's
  * lingering bytes refuse by name (the zombie guard) until
  * `reorgPurge(purgeDroppedColumns = true)` clears them. */
class UnmapSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("punmap").toString + "/tbl"

  private def df(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"$tag$i")).toDF("id", "tag")
  }

  private def mappingFree(schema: org.apache.spark.sql.types.StructType): Boolean =
    schema.fields.forall(f =>
      !f.metadata.contains("delta.columnMapping.id") &&
        !f.metadata.contains("delta.columnMapping.physicalName"))

  test("identity mapping (rename there and back) un-maps metadata-only") {
    val path = tmp()
    PortableDelta.write(df(0L until 8L, "a").repartition(2), path)        // v0
    PortableDelta.renameColumn(spark, path, "tag", "t2")                  // v1
    PortableDelta.renameColumn(spark, path, "t2", "tag")                  // v2: identity
    val before = PortableDelta.snapshot(spark, path)
    assert(before.configuration.contains(PortableDelta.ColumnMappingModeProp))
    val v = PortableDelta.disableColumnMapping(spark, path)               // v3
    assert(v == 3L)
    val snap = PortableDelta.snapshot(spark, path)
    assert(!snap.configuration.contains(PortableDelta.ColumnMappingModeProp))
    assert(!snap.configuration.contains("delta.columnMapping.maxColumnId"))
    assert(mappingFree(snap.schema), "mapping metadata must leave the schema")
    assert(snap.files.map(_.path).toSet == before.files.map(_.path).toSet,
      "identity un-map must be metadata-only — no file moves")
    // the feature stays LISTED (pre-disable history still needs it)
    assert(snap.readerFeatures.contains("columnMapping"))
    assert(PortableDelta.readTable(spark, path).count() == 8L)
    // appends after the un-map stage plain logical bytes
    PortableDelta.write(df(8L until 10L, "a").coalesce(1), path,
      mode = "append")                                                    // v4
    val newFile = PortableDelta.snapshot(spark, path).files
      .filterNot(f => snap.files.map(_.path).contains(f.path)).head
    val cols = spark.read.parquet(s"$path/${newFile.path}").columns.toSet
    assert(cols == Set("id", "tag"), s"post-unmap bytes must be logical: $cols")
  }

  test("a dropped column's lingering bytes refuse the un-map until purged") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 6L).map(i => (i, s"a$i", s"junk$i"))
      .toDF("id", "tag", "junk").coalesce(1), path)                       // v0
    PortableDelta.dropColumn(spark, path, "junk")                        // v1
    val e = intercept[IllegalArgumentException] {
      PortableDelta.disableColumnMapping(spark, path)
    }
    assert(e.getMessage.contains("purgeDroppedColumns"),
      s"the refusal must point at the purge: ${e.getMessage}")
    val st = PortableDelta.reorgPurge(spark, path,
      purgeDroppedColumns = true)                                         // v2
    assert(st.removedFiles == 1)
    PortableDelta.disableColumnMapping(spark, path)                       // v3
    val snap = PortableDelta.snapshot(spark, path)
    assert(mappingFree(snap.schema))
    assert(PortableDelta.readTable(spark, path).columns.toSet ==
      Set("id", "tag"))
    assert(PortableDelta.readTable(spark, path).count() == 6L)
  }

  test("diverged names rewrite in one commit; DROP FEATURE then completes") {
    val path = tmp()
    PortableDelta.write(df(0L until 9L, "a").repartition(3), path)        // v0
    PortableDelta.renameColumn(spark, path, "tag", "label")               // v1
    PortableDelta.write(df(9L until 12L, "a").coalesce(1)
      .withColumnRenamed("tag", "label"), path, mode = "append")          // v2
    val before = PortableDelta.readTable(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val pre = PortableDelta.snapshot(spark, path)
    val v = PortableDelta.disableColumnMapping(spark, path)               // v3
    assert(v == 3L)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.files.map(_.path).toSet
      .intersect(pre.files.map(_.path).toSet).isEmpty,
      "diverged un-map must rewrite every live file")
    assert(mappingFree(snap.schema))
    val after = PortableDelta.readTable(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "the rewrite must not change the data")
    // the rewritten bytes carry the LOGICAL name
    val cols = spark.read.parquet(s"$path/${snap.files.head.path}").columns
    assert(cols.contains("label") && !cols.exists(_.startsWith("col-")),
      s"bytes must be logical: ${cols.mkString(",")}")
    // the full downgrade: feature off the protocol, history truncated,
    // protocol NORMALIZED back to plain legacy versions
    PortableDelta.dropFeatureSupport(spark, path, "columnMapping",
      truncateHistory = true)                                             // v4
    val snap2 = PortableDelta.snapshot(spark, path)
    assert(!snap2.readerFeatures.contains("columnMapping") &&
      !snap2.writerFeatures.contains("columnMapping"))
    assert(snap2.minReaderVersion == 1 && snap2.minWriterVersion == 2,
      s"exact legacy tier must normalize: ${snap2.minReaderVersion}/" +
        s"${snap2.minWriterVersion}")
    assert(!new java.io.File(s"$path/_delta_log").listFiles()
      .exists(_.getName == "%020d.json".format(0L)),
      "TRUNCATE HISTORY must reclaim the pre-drop log")
    assert(PortableDelta.readTable(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == before)
    PortableDelta.validateChecksum(spark, path)
  }

  test("row IDs survive the diverged rewrite — pairing still exact") {
    val path = tmp()
    PortableDelta.write(df(0L until 6L, "a").coalesce(1), path)           // v0
    PortableDelta.renameColumn(spark, path, "tag", "label")               // v1
    PortableDelta.enableRowTracking(spark, path)                          // v2
    PortableDelta.update(spark, path, col("id") < 2L,
      Map("label" -> concat(lit("u"), col("id").cast("string"))))         // v3
    PortableDelta.disableColumnMapping(spark, path)                       // v4
    PortableDelta.update(spark, path, col("id") === 1L,
      Map("label" -> lit("uu1")))                                         // v5
    val ch = PortableDelta.readChanges(spark, path, 5L, 5L)
      .select(col("id"), col("label"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(ch == Set(
      (1L, "u1", "update_preimage"), (1L, "uu1", "update_postimage")),
      s"row identity must survive the un-map rewrite: $ch")
  }
}
