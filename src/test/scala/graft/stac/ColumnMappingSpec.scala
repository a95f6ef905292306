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
      features = Seq("columnMapping", "timestampNtz"), adds = Seq((f1, s1)))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.readTable(spark, path).collect()
    }
    assert(e.getMessage.contains("timestampNtz"), e.getMessage)
  }
}
