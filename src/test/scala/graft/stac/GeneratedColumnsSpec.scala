package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}
import org.scalatest.funsuite.AnyFunSuite

/** Generated columns (`delta.generationExpression` field metadata, the
  * legacy writer-4 / `generatedColumns` feature): the expression owns
  * the column — absent in a batch it is computed, present it is
  * validated, on UPDATE it recomputes from the SET-applied values, and
  * SETting it directly is rejected. */
class GeneratedColumnsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pgencol").toString + "/tbl"

  private val genMeta: Metadata = new MetadataBuilder()
    .putString("delta.generationExpression", "CAST(price * 100 AS BIGINT)")
    .build()

  private def base(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, i * 1.5)).toDF("id", "price")
  }

  test("create declares the feature; appends compute or validate") {
    val path = tmp()
    val withGen = base(0L until 4L)
      .withColumn("cents", expr("CAST(price * 100 AS BIGINT)").as("cents", genMeta))
    PortableDelta.write(withGen.coalesce(1), path)                        // v0
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.minWriterVersion == 7 &&
      snap.writerFeatures.contains("generatedColumns"),
      s"got ${snap.minWriterVersion}/${snap.writerFeatures}")
    // a batch MISSING the generated column gets it computed
    PortableDelta.write(base(4L until 6L).coalesce(1), path, mode = "append")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (0L until 6L).map(i => i -> (i * 150L)).toMap, s"got $got")
    // a batch providing WRONG values is rejected by name, nothing lands
    val bad = base(Seq(9L)).withColumn("cents", lit(1L))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(bad.coalesce(1), path, mode = "append")
    }
    assert(e.getMessage.contains("generated column cents"), e.getMessage)
    assert(PortableDelta.snapshot(spark, path).version == 1L)
    assert(PortableDelta.readTable(spark, path).count() == 6L)
  }

  test("append computes a MID-schema generated column (field order heals)") {
    val s = spark; import s.implicits._
    val path = tmp()
    // generated column sits BETWEEN id and price — a computed-if-absent
    // append must re-order to table schema, or the order-sensitive
    // append check fails with a misleading schema mismatch
    val withGen = (0L until 4L).map(i => (i, i * 1.5)).toDF("id", "price")
      .select(col("id"),
        expr("CAST(price * 100 AS BIGINT)").as("cents", genMeta),
        col("price"))
    PortableDelta.write(withGen.coalesce(1), path) // v0
    PortableDelta.write(base(4L until 6L).coalesce(1), path, mode = "append")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (0L until 6L).map(i => i -> (i * 150L)).toMap, s"got $got")
    // schema order unchanged: generated column still mid-schema
    assert(PortableDelta.snapshot(spark, path).schema.fieldNames.toSeq ==
      Seq("id", "cents", "price"))
  }

  test("UPDATE recomputes; SETting the generated column is rejected") {
    val path = tmp()
    PortableDelta.write(base(0L until 6L)
      .withColumn("cents", expr("CAST(price * 100 AS BIGINT)").as("cents", genMeta))
      .coalesce(1), path)
    val st = PortableDelta.update(spark, path, col("id") < 2L,
      Map("price" -> (col("price") + 1)))
    assert(st.updatedRows == 2L)
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == 100L && got(1L) == 250L && got(2L) == 300L,
      s"cents must recompute from the SET-applied price: $got")
    val e = intercept[IllegalArgumentException] {
      PortableDelta.update(spark, path, col("id") === 3L,
        Map("cents" -> lit(7L)))
    }
    assert(e.getMessage.contains("generated column cents"), e.getMessage)
  }

  test("MERGE computes the generated column for a source that lacks it") {
    val path = tmp()
    PortableDelta.write(base(0L until 4L)
      .withColumn("cents", expr("CAST(price * 100 AS BIGINT)").as("cents", genMeta))
      .coalesce(1), path)
    val s = spark; import s.implicits._
    val src = Seq((1L, 9.0), (8L, 2.0)).toDF("id", "price") // no cents
    val st = PortableDelta.merge(spark, path, src, Seq("id"))
    assert(st.updatedRows == 1L && st.insertedRows == 1L)
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 900L && got(8L) == 200L, s"got $got")
  }
}
