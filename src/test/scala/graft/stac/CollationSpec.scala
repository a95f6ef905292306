package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The `collations` writer feature: collated string columns serialize
  * through Spark's own StructType JSON — plain "string" physical type +
  * `__COLLATIONS` field metadata, the delta collation-RFC layout, so
  * feature-unaware readers still parse the schema — replay materializes
  * the collated type back, and the engine declares the writer feature
  * on create/evolve/addColumn and heals externally-shaped tables.
  * Ordering and comparison are collation-aware end to end, through
  * appends, checkpoints, time travel, and external-shaped logs. */
class CollationSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("colla").toString + "/tbl"

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("id", "name")
      .withColumn("name", expr("collate(name, 'UTF8_LCASE')"))
  }

  private def rawSchemaString(path: String, v: Long): String = {
    val src = scala.io.Source.fromFile(
      s"$path/_delta_log/${"%020d".format(v)}.json")
    try src.getLines().find(_.contains("\"metaData\"")).get finally src.close()
  }

  test("create: schemaString carries plain string + __COLLATIONS; feature declared") {
    val path = tmp()
    PortableDelta.write(df((1L, "Alpha"), (2L, "beta")), path)
    // the LOG's serialized shape is the portable RFC layout
    val meta = rawSchemaString(path, 0L)
    assert(meta.contains("""\"type\":\"string\"""") &&
      meta.contains("__COLLATIONS") &&
      meta.contains("spark.UTF8_LCASE"), meta.take(400))
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.writerFeatures.contains("collations"),
      s"got ${snap.writerFeatures}")
    // replay materializes the collated TYPE (marker consumed by parse)
    assert(snap.schema("name").dataType.json == "\"string collate UTF8_LCASE\"")
    val back = PortableDelta.readTable(spark, path)
    assert(back.schema("name").dataType.json == "\"string collate UTF8_LCASE\"")
  }

  test("collation-aware semantics round-trip: CI ordering and equality") {
    val path = tmp()
    PortableDelta.write(df((1L, "Alpha"), (2L, "alpha"), (3L, "BETA")), path)
    PortableDelta.write(df((4L, "ALPHA")), path, mode = "append")
    val back = PortableDelta.readTable(spark, path)
    // case-insensitive ordering: all alphas (1,2,4 by id tiebreak) then beta
    val order = back.orderBy(col("name"), col("id"))
      .collect().map(_.getLong(0)).toSeq
    assert(order == Seq(1L, 2L, 4L, 3L), s"got $order")
    assert(back.filter(col("name") === "alpha").count() == 3L,
      "UTF8_LCASE equality must match case variants")
    // DML predicates are collation-aware too (delta-spark parity)
    val d = PortableDelta.delete(spark, path, col("name") === "ALPHA")
    assert(d.deletedRows == 3L, s"CI delete must hit all case variants: $d")
  }

  test("checkpoint + time travel + truncated tail preserve the collation") {
    val path = tmp()
    PortableDelta.write(df((1L, "Alpha")), path)                     // v0
    PortableDelta.write(df((2L, "BRAVO")), path, mode = "append")    // v1
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark, path)
    PortableDelta.write(df((3L, "charlie")), path, mode = "append")  // v2
    // replay seeds from the checkpoint parquet: the shape must survive
    val back = PortableDelta.readTable(spark, path)
    assert(back.schema("name").dataType.json == "\"string collate UTF8_LCASE\"")
    assert(back.filter(col("name") === "bravo").count() == 1L)
    // time travel restores it too
    val tt = PortableDelta.readTable(spark, path, 1L)
    assert(tt.schema("name").dataType.json == "\"string collate UTF8_LCASE\"")
  }

  test("evolve: mergeSchema append and addColumn gain collated columns + the feature") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(Seq((1L, 10L)).toDF("id", "v"), path)        // plain
    assert(!PortableDelta.snapshot(spark, path).writerFeatures
      .contains("collations"))
    // mergeSchema append introducing a collated column declares the
    // feature in the SAME commit
    PortableDelta.write(Seq((2L, 20L, "Xray")).toDF("id", "v", "tag")
        .withColumn("tag", expr("collate(tag, 'UTF8_LCASE')")),
      path, mode = "append", mergeSchema = true)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.writerFeatures.contains("collations"))
    assert(snap.schema("tag").dataType.json == "\"string collate UTF8_LCASE\"")
    assert(PortableDelta.readTable(spark, path)
      .filter(col("tag") === "XRAY").count() == 1L)
    // addColumn with a collated (ICU) type
    val path2 = tmp()
    PortableDelta.write(Seq(Tuple1(1L)).toDF("id"), path2)
    PortableDelta.addColumn(spark, path2, "label",
      org.apache.spark.sql.types.StringType("UNICODE_CI"))
    val snap2 = PortableDelta.snapshot(spark, path2)
    assert(snap2.writerFeatures.contains("collations"))
    assert(snap2.schema("label").dataType.json == "\"string collate UNICODE_CI\"")
    assert(rawSchemaString(path2, 1L).contains("icu.UNICODE_CI"))
  }

  test("NESTED collated strings ride the same convention (struct leaf)") {
    val s = spark; import s.implicits._
    val path = tmp()
    val nested = Seq((1L, "Kilo"), (2L, "KILO")).toDF("id", "raw")
      .select(col("id"),
        struct(expr("collate(raw, 'UTF8_LCASE')").as("inner")).as("payload"))
    PortableDelta.write(nested, path)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.writerFeatures.contains("collations"))
    assert(rawSchemaString(path, 0L).contains("__COLLATIONS"))
    assert(PortableDelta.readTable(spark, path)
      .filter(col("payload.inner") === "kilo").count() == 2L)
  }

  test("external-shaped log with __COLLATIONS metadata reads collated and accepts appends") {
    val s = spark; import s.implicits._
    val path = tmp()
    new java.io.File(s"$path/_delta_log").mkdirs()
    // one data file an "external engine" wrote (plain strings)
    val data = Seq((1L, "Mike"), (2L, "MIKE")).toDF("id", "name")
    val tmpd = java.nio.file.Files.createTempDirectory("collext").toString + "/p"
    data.coalesce(1).write.parquet(tmpd)
    val part = new java.io.File(tmpd).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(path, "part-ext.parquet").toPath)
    // hand-build the RFC-shaped schemaString: plain string + __COLLATIONS
    val schemaJson =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"name","type":"string","nullable":true,
        |"metadata":{"__COLLATIONS":{"name":"SPARK.UTF8_LCASE"}}}]}"""
        .stripMargin.replace("\n", "")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val log =
      s"""{"commitInfo":{"operation":"WRITE","timestamp":1}}
         |{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","collations"]}}
         |{"metaData":{"id":"ext-1","format":{"provider":"parquet","options":{}},"schemaString":${mapper.writeValueAsString(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"part-ext.parquet","partitionValues":{},"size":${part.length()},"modificationTime":1,"dataChange":true}}
         |""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(s"$path/_delta_log/${"%020d".format(0L)}.json").toPath,
      log.getBytes("UTF-8"))
    val back = PortableDelta.readTable(spark, path)
    assert(back.schema("name").dataType.json == "\"string collate UTF8_LCASE\"")
    assert(back.filter(col("name") === "mike").count() == 2L)
    // and this engine can append (feature supported, collation preserved)
    PortableDelta.write(df((3L, "mIkE")), path, mode = "append")
    assert(PortableDelta.readTable(spark, path)
      .filter(col("name") === "MIKE").count() == 3L)
  }
}
