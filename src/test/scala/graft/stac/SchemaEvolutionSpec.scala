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
}
