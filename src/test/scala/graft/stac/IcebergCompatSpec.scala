package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** `icebergCompatV2` write-side obligations (PROTOCOL.md "Iceberg
  * Compatibility V2", the UniForm substrate) — the round-13 VERDICT's
  * refusal-flip. Contracts: an external-shaped icebergCompatV2 log is
  * accepted for read AND write; every commit on an ACTIVE table
  * enforces numRecords-on-every-add, no deletion vectors, and
  * name/id column mapping; row-level DV verbs refuse EARLY by name
  * staging nothing; enabling on an existing table validates live
  * files; icebergCompatV1 (different obligations, unimplemented)
  * still refuses by name. */
class IcebergCompatSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("piceberg").toString + "/tbl"

  private def meta(phys: String): Metadata =
    new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys).build()

  /** One physically-named parquet part in the table root. */
  private def writePhys(path: String, df: org.apache.spark.sql.DataFrame): (String, Long) = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$path/.ic-tmp")
    val part = new java.io.File(s"$path/.ic-tmp").listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val dest = new java.io.File(path, part.getName)
    java.nio.file.Files.move(part.toPath, dest.toPath)
    (dest.getName, dest.length())
  }

  private val logical = StructType(Seq(
    StructField("id", LongType, nullable = true, meta("col-id")),
    StructField("body", StringType, nullable = true, meta("col-body"))))

  /** External-shaped ACTIVE icebergCompatV2 table: reader-2 column
    * mapping (name mode), writer-7 listing columnMapping +
    * icebergCompatV2, enable property set, adds carrying numRecords. */
  private def mkIcebergTable(path: String, nRows: Long): Unit = {
    val s = spark; import s.implicits._
    val phys = (0L until nRows).map(i => (i, s"b$i")).toDF("col-id", "col-body")
    val (f1, s1) = writePhys(path, phys)
    val conf = spark.sessionState.newHadoopConf()
    val proto = mapper.createObjectNode()
    val p = proto.putObject("protocol")
    p.put("minReaderVersion", 2); p.put("minWriterVersion", 7)
    p.putArray("writerFeatures").add("columnMapping").add("icebergCompatV2")
    val metaN = mapper.createObjectNode()
    val m = metaN.putObject("metaData")
    m.put("id", "iceberg-ext-1")
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", logical.json)
    m.putArray("partitionColumns")
    val c = m.putObject("configuration")
    c.put("delta.columnMapping.mode", "name")
    c.put("delta.enableIcebergCompatV2", "true")
    m.put("createdTime", 1L)
    val addN = mapper.createObjectNode()
    val a = addN.putObject("add")
    a.put("path", f1); a.putObject("partitionValues")
    a.put("size", s1); a.put("modificationTime", 1L); a.put("dataChange", true)
    a.put("stats", s"""{"numRecords":$nRows}""")
    PortableDelta.commit(conf, path, 0L, Seq(proto, metaN, addN),
      Map("delta.columnMapping.mode" -> "name",
        "delta.enableIcebergCompatV2" -> "true"))
  }

  test("external icebergCompatV2 log: read works, append works, adds carry numRecords") {
    val path = tmp()
    mkIcebergTable(path, 4L)
    assert(PortableDelta.readTable(spark, path).count() == 4L)
    val s = spark; import s.implicits._
    PortableDelta.write(Seq((9L, "b9")).toDF("id", "body"), path, mode = "append")
    val got = PortableDelta.readTable(spark, path)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 9L))
    // the append's add action carries the obligated statistic
    val lines = scala.io.Source.fromFile(
      s"$path/_delta_log/${"%020d".format(1L)}.json", "UTF-8").getLines()
      .filter(_.nonEmpty).map(mapper.readTree).toSeq
    val adds = lines.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty && adds.forall(a =>
      a.has("stats") && mapper.readTree(a.get("stats").asText()).has("numRecords")))
  }

  test("row-level DV verbs refuse EARLY by name, staging nothing") {
    val path = tmp()
    mkIcebergTable(path, 4L)
    def listing(): Map[String, Long] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        d.listFiles().toSeq.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(path)).map(f => f.getPath -> f.length()).toMap
    }
    val before = listing()
    def refused(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("icebergCompatV2") &&
        e.getMessage.contains("refusing to commit"), e.getMessage)
    }
    refused(PortableDelta.delete(spark, path, col("id") === 1L))
    refused(PortableDelta.update(spark, path, col("id") === 1L,
      Map("body" -> lit("x"))))
    val s = spark; import s.implicits._
    refused(PortableDelta.merge(spark, path,
      Seq((1L, "z")).toDF("id", "body"), Seq("id")))
    refused(PortableDelta.mergeInto(spark, path,
      Seq((1L, "z")).toDF("id", "body"), Seq("id")))
    assert(listing() == before, "a refused verb must stage NOTHING")
  }

  test("commit gate: a DV-carrying or stats-less add refuses by name") {
    val path = tmp()
    mkIcebergTable(path, 4L)
    val conf = spark.sessionState.newHadoopConf()
    val cfg = Map("delta.columnMapping.mode" -> "name",
      "delta.enableIcebergCompatV2" -> "true")
    def addNode(withStats: Boolean, withDv: Boolean) = {
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", "fabricated.parquet"); a.putObject("partitionValues")
      a.put("size", 10L); a.put("modificationTime", 1L); a.put("dataChange", true)
      if (withStats) a.put("stats", """{"numRecords":1}""")
      if (withDv) {
        val d = a.putObject("deletionVector")
        d.put("storageType", "i"); d.put("pathOrInlineDv", "xxxx")
        d.put("sizeInBytes", 4); d.put("cardinality", 1L)
      }
      n
    }
    val e1 = intercept[IllegalArgumentException](
      PortableDelta.commit(conf, path, 1L, Seq(addNode(withStats = false, withDv = false)), cfg))
    assert(e1.getMessage.contains("numRecords") &&
      e1.getMessage.contains("icebergCompatV2"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      PortableDelta.commit(conf, path, 1L, Seq(addNode(withStats = true, withDv = true)), cfg))
    assert(e2.getMessage.contains("deletion vectors") &&
      e2.getMessage.contains("icebergCompatV2"), e2.getMessage)
    assert(!new java.io.File(
      s"$path/_delta_log/${"%020d".format(1L)}.json").exists(),
      "a refused commit must not write the version file")
  }

  test("enable-time validation: plain table refuses (no mapping); DV'd table refuses") {
    val s = spark; import s.implicits._
    // no column mapping → refuse
    val p1 = tmp()
    PortableDelta.write(Seq((1L, "a")).toDF("id", "body"), p1)
    val e1 = intercept[IllegalArgumentException](
      PortableDelta.setTableProperties(spark, p1,
        Map("delta.enableIcebergCompatV2" -> "true")))
    assert(e1.getMessage.contains("columnMapping.mode") &&
      e1.getMessage.contains("refusing to commit"), e1.getMessage)
    assert(PortableDelta.snapshot(spark, p1).version == 0L)
  }

  test("icebergCompatV1 stays refused by name (different obligations)") {
    val path = tmp()
    mkIcebergTable(path, 4L)
    // push a protocol adding V1 alongside — appends must refuse naming it
    val proto = mapper.createObjectNode()
    val p = proto.putObject("protocol")
    p.put("minReaderVersion", 2); p.put("minWriterVersion", 7)
    p.putArray("writerFeatures").add("columnMapping")
      .add("icebergCompatV2").add("icebergCompatV1")
    val out = new java.io.FileOutputStream(
      s"$path/_delta_log/${"%020d".format(1L)}.json")
    try out.write((mapper.writeValueAsString(proto) + "\n").getBytes("UTF-8"))
    finally out.close()
    val s = spark; import s.implicits._
    val e = intercept[IllegalArgumentException](
      PortableDelta.write(Seq((9L, "x")).toDF("id", "body"), path,
        mode = "append"))
    assert(e.getMessage.contains("icebergCompatV1") &&
      e.getMessage.contains("refusing to commit"), e.getMessage)
  }
}
