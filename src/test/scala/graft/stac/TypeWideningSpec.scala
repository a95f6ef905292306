package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The typeWidening table feature: metadata-only lossless promotions,
  * old narrow files upcast at scan, new writes land wide, stats keep
  * skipping across the width change, and the change history rides the
  * field metadata for external readers. */
class TypeWideningSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("widen").toString + "/tbl"

  test("widen int->long: upcast reads, wide appends, stats still prune") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0 until 10).map(i => (i, i * 1.5f)).toDF("n", "x")
      .coalesce(1), path)
    assert(PortableDelta.snapshot(spark, path).schema("n").dataType == IntegerType)
    // opt-in required, named
    val e = intercept[IllegalArgumentException] {
      PortableDelta.widenColumnType(spark, path, "n", LongType)
    }
    assert(e.getMessage.contains("delta.enableTypeWidening"))
    PortableDelta.setTableProperties(spark, path,
      Map("delta.enableTypeWidening" -> "true"))
    val v = PortableDelta.widenColumnType(spark, path, "n", LongType)
    val snap1 = PortableDelta.snapshot(spark, path)
    assert(snap1.schema("n").dataType == LongType)
    // feature declared BOTH sides (readers must upcast old files)
    assert(snap1.readerFeatures.contains("typeWidening") &&
      snap1.writerFeatures.contains("typeWidening"))
    // change history in the spec's field metadata
    val hist = snap1.schema("n").metadata.getMetadataArray("delta.typeWidening")
    assert(hist.length == 1 &&
      hist(0).getString("fromType") == "integer" &&
      hist(0).getString("toType") == "long" &&
      hist(0).getLong("tableVersion") == v)
    // the old int32 file upcasts at scan
    assert(PortableDelta.readTable(spark, path).agg(sum(col("n")))
      .collect().head.getLong(0) == 45L)
    // a genuinely-long append lands beside it
    val big = 1L + Int.MaxValue
    PortableDelta.write(Seq((big, 0.5f)).toDF("n", "x").coalesce(1), path,
      mode = "append")
    assert(PortableDelta.readTable(spark, path).count() == 11L)
    // skipping: the old file's int-bounded stats decode under LONG and
    // prune; only the wide file survives the > Int.MaxValue predicate
    val snap2 = PortableDelta.snapshot(spark, path)
    val (kept, pruned) = PortableDelta.statsPrune(spark, snap2,
      col("n") > Int.MaxValue.toLong)
    assert(kept.size == 1 && pruned == 1,
      s"narrow-file stats must stay sound bounds: kept ${kept.size}")
    assert(PortableDelta.readTableWhere(spark, path,
      col("n") > Int.MaxValue.toLong).collect().map(_.getLong(0)).toSeq ==
      Seq(big))
    // float->double widens too; DML over the mixed-width files stays exact
    PortableDelta.widenColumnType(spark, path, "x", DoubleType)
    PortableDelta.delete(spark, path, col("n") < 5L)
    assert(PortableDelta.readTable(spark, path).count() == 6L)
    assert(PortableDelta.readTable(spark, path)
      .agg(sum(col("x"))).collect().head.getDouble(0) ==
      (5 until 10).map(_ * 1.5).sum + 0.5)
    // schema + history survive checkpoint truncation
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val snap3 = PortableDelta.snapshot(spark, path)
    assert(snap3.schema("n").dataType == LongType &&
      snap3.schema("x").dataType == DoubleType)
    assert(snap3.schema("n").metadata.contains("delta.typeWidening"))
    assert(PortableDelta.readTable(spark, path).count() == 6L)
  }

  test("lossy promotions refuse by name; history stacks; legacy writers gate") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0 until 4).map(i => (i.toShort, i.toLong))
      .toDF("a", "b").coalesce(1), path,
      properties = Map("delta.enableTypeWidening" -> "true"))
    // long -> double is lossy above 2^53: refused
    val e1 = intercept[IllegalArgumentException] {
      PortableDelta.widenColumnType(spark, path, "b", DoubleType)
    }
    assert(e1.getMessage.contains("not a lossless promotion"))
    // narrowing refuses
    intercept[IllegalArgumentException] {
      PortableDelta.widenColumnType(spark, path, "b", IntegerType)
    }
    // short -> int -> long stacks two history entries
    PortableDelta.widenColumnType(spark, path, "a", IntegerType)
    PortableDelta.widenColumnType(spark, path, "a", LongType)
    val f = PortableDelta.snapshot(spark, path).schema("a")
    assert(f.dataType == LongType)
    val hist = f.metadata.getMetadataArray("delta.typeWidening")
    assert(hist.map(h => (h.getString("fromType"), h.getString("toType")))
      .toSeq == Seq(("short", "integer"), ("integer", "long")))
    assert(PortableDelta.readTable(spark, path).agg(sum(col("a")))
      .collect().head.getLong(0) == 6L)
  }
}
