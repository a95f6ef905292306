package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Column-mapping READ (reader version 2 / the `columnMapping` table
  * feature): externally-renamed tables store parquet columns under
  * physical `col-<uuid>` names while the log's schemaString carries the
  * logical names plus `delta.columnMapping.physicalName` metadata. The
  * reader must scan physical and project logical — including the
  * adversarial case where one column's PHYSICAL name equals another's
  * LOGICAL name (a rename swap), which breaks any name-keyed shortcut. */
class ColumnMappingSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pcmap").toString + "/tbl"

  private def meta(k: String, phys: String): Metadata =
    new MetadataBuilder().putString("delta.columnMapping.physicalName", phys).build()

  /** Write one physically-named parquet part into the table root;
    * returns (fileName, size). */
  private def writePhys(path: String, df: org.apache.spark.sql.DataFrame): (String, Long) = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$path/.cm-tmp")
    val part = new java.io.File(s"$path/.cm-tmp").listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val dest = new java.io.File(path, part.getName)
    java.nio.file.Files.move(part.toPath, dest.toPath)
    (dest.getName, dest.length())
  }

  private def commitTable(path: String, schema: StructType, readerV: Int,
                          features: Seq[String], adds: Seq[(String, Long)],
                          dv: Option[(String, (String, Int, Long))] = None): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val proto = mapper.createObjectNode()
    val p = proto.putObject("protocol")
    p.put("minReaderVersion", readerV)
    p.put("minWriterVersion", if (readerV == 3) 7 else 5)
    if (readerV == 3) {
      val rf = p.putArray("readerFeatures"); features.foreach(rf.add)
      val wf = p.putArray("writerFeatures"); features.foreach(wf.add)
    }
    val metaN = mapper.createObjectNode()
    val m = metaN.putObject("metaData")
    m.put("id", "cm-ext-1")
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    m.putArray("partitionColumns")
    m.putObject("configuration").put("delta.columnMapping.mode", "name")
    m.put("createdTime", 1L)
    val addNodes = adds.map { case (name, size) =>
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", name); a.putObject("partitionValues")
      a.put("size", size); a.put("modificationTime", 1L); a.put("dataChange", true)
      dv.filter(_._1 == name).foreach { case (_, (inline, sz, card)) =>
        val d = a.putObject("deletionVector")
        d.put("storageType", "i"); d.put("pathOrInlineDv", inline)
        d.put("sizeInBytes", sz); d.put("cardinality", card)
      }
      n
    }
    PortableDelta.commit(conf, path, 0L, Seq(proto, metaN) ++ addNodes)
  }

  test("reader v2, name mode: physical scan projects to logical — incl. a swap") {
    val path = tmp()
    val s = spark; import s.implicits._
    // logical (id, price, qty): id stored as "col-aaaa"; price and qty
    // are SWAPPED physically — price lives in physical column "qty" and
    // vice versa; plus a nested struct with a renamed inner field
    val phys = Seq((1L, 10.0, 7L, (100L, "x1")), (2L, 20.0, 8L, (200L, "x2")))
      .toDF("col-aaaa", "qty", "price", "col-nest")
      .withColumn("col-nest", struct(col("col-nest._1").as("col-inner"),
        col("col-nest._2").as("col-tag")))
    val (f1, s1) = writePhys(path, phys)
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("id", "col-aaaa")),
      StructField("price", DoubleType, nullable = true, meta("price", "qty")),
      StructField("qty", LongType, nullable = true, meta("qty", "price")),
      StructField("nest", StructType(Seq(
        StructField("inner", LongType, nullable = true, meta("inner", "col-inner")),
        StructField("tag", StringType, nullable = true, meta("tag", "col-tag")))),
        nullable = true, meta("nest", "col-nest"))))
    commitTable(path, logical, readerV = 2, features = Nil, adds = Seq((f1, s1)))
    val got = PortableDelta.readTable(spark, path)
    assert(got.schema.fieldNames.toSeq == Seq("id", "price", "qty", "nest"))
    val rows = got.select(col("id"), col("price"), col("qty"),
        col("nest.inner"), col("nest.tag"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    // the physical df wrote price values 10/20 in physical col "qty"
    assert(rows == Set((1L, 10.0, 7L, 100L, "x1"), (2L, 20.0, 8L, 200L, "x2")),
      s"swap must resolve by MAPPING, not by name: $rows")
  }

  test("v3 table-features form: columnMapping + deletionVectors compose") {
    val path = tmp()
    val s = spark; import s.implicits._
    val phys = (0L until 6L).map(i => (i, s"d$i")).toDF("col-k", "col-b")
    val (f1, s1) = writePhys(path, phys)
    val logical = StructType(Seq(
      StructField("k", LongType, nullable = true, meta("k", "col-k")),
      StructField("body", StringType, nullable = true, meta("body", "col-b"))))
    // rows at physical positions 1 and 4 are deleted via an inline DV
    val (inline, sz, card) = DeletionVectors.inlineDescriptor(Seq(1L, 4L))
    commitTable(path, logical, readerV = 3,
      features = Seq("columnMapping", "deletionVectors"),
      adds = Seq((f1, s1)), dv = Some((f1, (inline, sz, card))))
    val got = PortableDelta.readTable(spark, path)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 2L, 3L, 5L),
      "DV positions must apply to the physically-scanned file")
    // snapshot exposes the protocol we accepted
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.minReaderVersion == 3 &&
      snap.readerFeatures.toSet == Set("columnMapping", "deletionVectors"))
  }

  test("an unknown reader feature is still refused by name") {
    val path = tmp()
    val s = spark; import s.implicits._
    val (f1, s1) = writePhys(path, Seq((1L, "x")).toDF("col-k", "col-b"))
    val logical = StructType(Seq(
      StructField("k", LongType, nullable = true, meta("k", "col-k")),
      StructField("body", StringType, nullable = true, meta("body", "col-b"))))
    commitTable(path, logical, readerV = 3,
      features = Seq("columnMapping", "icebergCompatV9"), adds = Seq((f1, s1)))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.readTable(spark, path).collect()
    }
    assert(e.getMessage.contains("icebergCompatV9"), e.getMessage)
  }

  // ---------- WRITE side: RENAME / DROP COLUMN ----------

  test("RENAME COLUMN: metadata-only commit, physical appends, external shape") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(
      (0L until 6L).map(i => (i, s"d$i")).toDF("id", "body").coalesce(1), path)
    val dataFilesBefore = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    val v = PortableDelta.renameColumn(spark, path, "id", "key")
    assert(v == 1L)
    // no parquet byte moved — the rename is pure metadata
    assert(new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length).toMap == dataFilesBefore)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("key", "body"))
    assert(snap.configuration.get("delta.columnMapping.mode").contains("name"))
    // physicalName preserved = the OLD name, so existing files resolve
    val keyF = snap.schema.fields.find(_.name == "key").get
    assert(keyF.metadata.getString("delta.columnMapping.physicalName") == "id")
    assert(keyF.metadata.getLong("delta.columnMapping.id") >= 1L)
    // externally-shaped: the commit declares columnMapping on BOTH sides
    val proto = logLinesOf(path, 1L).filter(_.has("protocol")).map(_.get("protocol"))
    assert(proto.size == 1)
    import scala.jdk.CollectionConverters._
    assert(proto.head.get("readerFeatures").elements().asScala.map(_.asText())
      .contains("columnMapping"))
    assert(proto.head.get("writerFeatures").elements().asScala.map(_.asText())
      .contains("columnMapping"))
    // reads project logical; appends stage PHYSICAL parquet
    assert(PortableDelta.readTable(spark, path)
      .select(col("key")).collect().map(_.getLong(0)).toSet == (0L until 6L).toSet)
    PortableDelta.write(
      Seq((6L, "d6")).toDF("key", "body").coalesce(1), path, mode = "append")
    val newFile = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .filterNot(f => dataFilesBefore.contains(f.getName))
    assert(newFile.length == 1)
    val rawCols = spark.read.parquet(newFile.head.toString).columns.toSeq
    assert(rawCols == Seq("id", "body"),
      s"appended parquet must carry PHYSICAL names, got $rawCols")
    assert(PortableDelta.readTable(spark, path)
      .select(col("key")).collect().map(_.getLong(0)).toSet == (0L until 7L).toSet)
    // DML after the rename: UPDATE stages physical row versions
    PortableDelta.update(spark, path, col("key") === 3L,
      Map("body" -> lit("patched")))
    val got = PortableDelta.readTable(spark, path)
      .select(col("key"), col("body")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(3L) == "patched" && got(6L) == "d6" && got.size == 7)
  }

  test("DROP COLUMN hides data going forward; time travel still sees it") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 4L).map(i => (i, s"d$i", s"t$i"))
      .toDF("id", "body", "tag").coalesce(1), path)
    PortableDelta.dropColumn(spark, path, "tag")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "body"))
    assert(PortableDelta.readTable(spark, path).columns.toSeq == Seq("id", "body"))
    // bytes still in the files: pre-drop version reads the column
    assert(PortableDelta.readTable(spark, path, versionAsOf = 0L)
      .select(col("tag")).collect().map(_.getString(0)).toSet ==
      (0L until 4L).map(i => s"t$i").toSet)
    // appends no longer carry it
    PortableDelta.write(Seq((9L, "d9")).toDF("id", "body").coalesce(1), path,
      mode = "append")
    assert(PortableDelta.readTable(spark, path).count() == 5L)
    // guards: partition columns and constraint-referenced columns refuse
    val e = intercept[IllegalArgumentException] {
      PortableDelta.dropColumn(spark, path, "nope")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("rename of a partition column keeps layout, pruning, and DML working") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(
      (0L until 12L).map(i => (i, if (i % 2 == 0) "A" else "B", s"d$i"))
        .toDF("id", "status", "body"),
      path, partitionBy = Seq("status"))
    PortableDelta.renameColumn(spark, path, "status", "state")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.partitionColumns == Seq("state"))
    assert(PortableDelta.readTable(spark, path)
      .where(col("state") === "A").count() == 6L)
    // append after the rename: hive dirs keyed by PHYSICAL name (the
    // original), consistent with the existing layout
    PortableDelta.write(Seq((12L, "A", "d12")).toDF("id", "state", "body"),
      path, mode = "append")
    assert(new java.io.File(s"$path/status=A").exists(),
      "hive layout keeps the physical dir name")
    assert(PortableDelta.readTable(spark, path)
      .where(col("state") === "A").count() == 7L)
    // DELETE prunes and applies on the renamed partition column
    val st = PortableDelta.delete(spark, path, col("state") === "B")
    assert(st.deletedRows == 6L, s"unexpected $st")
    assert(PortableDelta.readTable(spark, path).count() == 7L)
  }

  test("rename refuses a column referenced by a CHECK constraint") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 3L).map(i => (i, i * 10.0))
      .toDF("id", "v").coalesce(1), path)
    PortableDelta.addCheckConstraint(spark, path, "v_cap", "v < 1000")
    val e = intercept[IllegalArgumentException] {
      PortableDelta.renameColumn(spark, path, "v", "value")
    }
    assert(e.getMessage.contains("v_cap"), e.getMessage)
    // the non-referenced column renames fine
    PortableDelta.renameColumn(spark, path, "id", "key")
    assert(PortableDelta.snapshot(spark, path).schema.fieldNames.toSeq ==
      Seq("key", "v"))
  }

  test("CDF on a renamed table: cdc files physical, feed reads logical") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 6L).map(i => (i, s"d$i")).toDF("id", "body")
      .coalesce(1), path, properties = Map(PortableDelta.CdfProp -> "true"))
    PortableDelta.renameColumn(spark, path, "id", "key")                  // v1
    PortableDelta.delete(spark, path, col("key") < 2L)                    // v2
    // the cdc parquet carries the PHYSICAL column name
    val cdc = new java.io.File(s"$path/_change_data").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(cdc.nonEmpty)
    assert(spark.read.parquet(cdc.head.toString).columns.contains("id"),
      "cdc bytes must be physically named on a mapped table")
    val ch = PortableDelta.readChanges(spark, path, 2L, 2L)
      .select(col("key"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((0L, "delete"), (1L, "delete")))
  }

  private def logLinesOf(path: String, v: Long) =
    scala.io.Source.fromFile(
      new java.io.File(s"$path/_delta_log/${"%020d".format(v)}.json"), "UTF-8")
      .getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
}
