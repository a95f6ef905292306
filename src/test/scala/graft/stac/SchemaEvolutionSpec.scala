package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** mergeSchema appends: new columns join as nullable (old rows read
  * null), batch-missing columns fill null, type changes are rejected,
  * and the evolved metaData survives checkpoint truncation. */
class SchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pevo").toString + "/tbl"

  test("append with a new column evolves the schema; old rows read null") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 5L).map(i => (i, s"d$i")).toDF("id", "body")
      .coalesce(1), path)
    // without the flag: rejected, with a hint
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(Seq((5L, "d5", "en")).toDF("id", "body", "lang")
        .coalesce(1), path, mode = "append")
    }
    assert(e.getMessage.contains("mergeSchema"))
    PortableDelta.write(Seq((5L, "d5", "en"), (6L, "d6", "fr"))
      .toDF("id", "body", "lang").coalesce(1), path,
      mode = "append", mergeSchema = true)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "body", "lang"))
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("lang")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert((0L until 5L).forall(got(_).isEmpty), "old rows read the new column as null")
    assert(got(5L).contains("en") && got(6L).contains("fr"))

    // a batch MISSING a column appends nulls for it
    PortableDelta.write(Seq((7L, "d7")).toDF("id", "body").coalesce(1), path,
      mode = "append", mergeSchema = true)
    val got2 = PortableDelta.readTable(spark, path)
      .select(col("id"), col("lang")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got2(7L).isEmpty && got2.size == 8)
    // schema unchanged by the subset append: no metaData churn
    assert(PortableDelta.snapshot(spark, path).schema.fieldNames.toSeq ==
      Seq("id", "body", "lang"))
  }

  test("type changes are rejected by name; evolution survives checkpoints") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 3L).map(i => (i, i * 1.5)).toDF("id", "score")
      .coalesce(1), path)
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(Seq((3L, "high")).toDF("id", "score").coalesce(1),
        path, mode = "append", mergeSchema = true)
    }
    assert(e.getMessage.contains("cannot change column 'score'"), e.getMessage)
    PortableDelta.write(Seq((3L, 4.5, 7L)).toDF("id", "score", "rank")
      .coalesce(1), path, mode = "append", mergeSchema = true)
    // time travel BEFORE the evolution reads the ORIGINAL schema
    assert(PortableDelta.snapshotAt(spark, path, 0L)
      .schema.fieldNames.toSeq == Seq("id", "score"))
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "score", "rank"),
      "evolved schema must ride the checkpoint metaData")
    assert(PortableDelta.readTable(spark, path).filter(col("rank").isNull).count() == 3)
  }

  test("ALTER ADD COLUMN: metadata-only, nullable, mapped tables get a UUID physical name") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 4L).map(i => (i, s"d$i")).toDF("id", "body")
      .coalesce(1), path)
    val v = PortableDelta.addColumn(spark, path, "lang",
      org.apache.spark.sql.types.StringType, comment = Some("ISO 639-1"))
    assert(v == 1L)
    // no data files moved: the commit carries no add actions
    val dataFiles = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataFiles == 1, "ADD COLUMN must be metadata-only")
    assert(PortableDelta.readTable(spark, path)
      .filter(col("lang").isNull).count() == 4, "existing rows read null")
    // duplicate (case-insensitive) refuses by name
    val e = intercept[IllegalArgumentException] {
      PortableDelta.addColumn(spark, path, "LANG",
        org.apache.spark.sql.types.StringType)
    }
    assert(e.getMessage.contains("LANG"))
    // appends now carry the column; the new field is stats-eligible
    PortableDelta.write(Seq((10L, "d10", "en")).toDF("id", "body", "lang")
      .coalesce(1), path, mode = "append")
    assert(PortableDelta.readTable(spark, path)
      .filter(col("lang") === "en").count() == 1)
    // on a MAPPED table the new field gets a fresh id + col-<uuid>
    // physical name (never the logical name — no physical-name reuse)
    PortableDelta.renameColumn(spark, path, "body", "text")
    val preIds = PortableDelta.snapshot(spark, path).schema.fields
      .map(_.metadata.getLong("delta.columnMapping.id")).toSet
    PortableDelta.addColumn(spark, path, "score",
      org.apache.spark.sql.types.DoubleType)
    val snap = PortableDelta.snapshot(spark, path)
    val f = snap.schema.fields.find(_.name == "score").get
    assert(f.metadata.getString("delta.columnMapping.physicalName")
      .startsWith("col-"))
    assert(!preIds.contains(f.metadata.getLong("delta.columnMapping.id")),
      "the new field's mapping id must be fresh")
    assert(snap.configuration("delta.columnMapping.maxColumnId").toLong ==
      f.metadata.getLong("delta.columnMapping.id"))
    // the mapped append round-trips through physical names
    PortableDelta.write(Seq((11L, "d11", "fr", 0.5))
      .toDF("id", "text", "lang", "score").coalesce(1), path, mode = "append")
    assert(PortableDelta.readTable(spark, path)
      .filter(col("score") === 0.5).select(col("text")).collect()
      .head.getString(0) == "d11")
  }

  test("SET/UNSET TBLPROPERTIES: feature heal, guarded names refuse") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 3L).map(i => (i, s"d$i")).toDF("id", "body")
      .coalesce(1), path)
    // setting CDF declares the writer feature in the SAME commit
    val v = PortableDelta.setTableProperties(spark, path,
      Map(PortableDelta.CdfProp -> "true", "custom.owner" -> "team-x"))
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.configuration(PortableDelta.CdfProp) == "true")
    assert(snap.configuration("custom.owner") == "team-x")
    assert(snap.writerFeatures.contains("changeDataFeed"),
      "the implied feature must be declared with the property")
    // the feed is live from the next DML on
    PortableDelta.delete(spark, path, col("id") === 0L)
    val ch = PortableDelta.readChanges(spark, path, v + 1, v + 1)
    assert(ch.filter(col("_change_type") === "delete").count() == 1)
    // unset removes the plain property; missing keys are a no-op
    PortableDelta.unsetTableProperties(spark, path,
      Seq("custom.owner", "never.set"))
    assert(!PortableDelta.snapshot(spark, path)
      .configuration.contains("custom.owner"))
    // guarded names refuse with the dedicated verb named
    val e1 = intercept[IllegalArgumentException] {
      PortableDelta.setTableProperties(spark, path,
        Map(PortableDelta.RowTrackingProp -> "true"))
    }
    assert(e1.getMessage.contains("enableRowTracking"))
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.unsetTableProperties(spark, path,
        Seq(PortableDelta.ColumnMappingModeProp))
    }
    assert(e2.getMessage.contains("renameColumn"))
  }
}
