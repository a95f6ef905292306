package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Hive-partitioned Delta tables over the portable log — the interop
  * shape most externally-written tables have: `col=value/` subdirs,
  * partition columns absent from the parquet bytes, `partitionValues`
  * on every add action, `partitionColumns` in metaData. Contracts:
  * write/read round trip (the LOG values are authoritative, never dir
  * names), partition pruning as point-statistics data skipping, DELETE /
  * MERGE / checkpoint / vacuum all partition-aware, and an
  * external-shaped log (including the hive null partition) reads back
  * correctly. */
class PartitionedDeltaSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ppart").toString + "/tbl"

  private def df(n: Long) = {
    val s = spark; import s.implicits._
    (0L until n).map(i => (i, s"d$i", s"g${i % 3}")).toDF("id", "body", "grp")
  }

  test("partitioned write: hive layout, partitionValues on adds, round trip") {
    val path = tmp()
    PortableDelta.write(df(30L), path, partitionBy = Seq("grp"))
    // hive directories exist and hold the part files
    for (g <- 0 until 3)
      assert(new java.io.File(s"$path/grp=g$g").isDirectory, s"missing grp=g$g/")
    val lines = scala.io.Source.fromFile(
      s"$path/_delta_log/${"%020d".format(0L)}.json", "UTF-8").getLines()
      .filter(_.nonEmpty).map(mapper.readTree).toSeq
    val meta = lines.filter(_.has("metaData")).head.get("metaData")
    assert(meta.get("partitionColumns").elements().asScala.map(_.asText()).toSeq ==
      Seq("grp"))
    val adds = lines.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      assert(a.get("path").asText().startsWith("grp=g"),
        s"add path must be partition-relative: ${a.get("path").asText()}")
      val pv = a.get("partitionValues")
      assert(pv.has("grp") && pv.get("grp").asText().startsWith("g"))
      // data files must NOT store the partition column
      val st = mapper.readTree(a.get("stats").asText())
      assert(!st.get("minValues").has("grp"),
        "partition column must not appear in file stats (not in the bytes)")
    }
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("grp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 30 && (0L until 30L).forall(i => got(i) == s"g${i % 3}"))
  }

  test("partition pruning: equality keeps one partition, works sans stats") {
    val path = tmp()
    PortableDelta.write(df(30L), path, partitionBy = Seq("grp"))
    val snap = PortableDelta.snapshot(spark, path)
    val total = snap.files.size
    val (kept, pruned) = PortableDelta.statsPrune(spark, snap, col("grp") === "g1")
    assert(kept.nonEmpty && kept.forall(_.partitionValues("grp") == "g1"))
    assert(pruned == total - kept.size && pruned > 0)
    // pruning must survive stats-stripping: partition values alone prune
    val bare = snap.copy(files = snap.files.map(_.copy(stats = None)))
    val (keptB, prunedB) = PortableDelta.statsPrune(spark, bare, col("grp") === "g2")
    assert(prunedB > 0 && keptB.forall(_.partitionValues("grp") == "g2"))
    // combined partition + data-column predicate composes
    val got = PortableDelta.readTableWhere(spark, path,
        col("grp") === "g1" && col("id") < 10L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == (0L until 10L).filter(_ % 3 == 1).toSet)
  }

  test("DELETE and MERGE are partition-aware") {
    val path = tmp()
    PortableDelta.write(df(30L), path, partitionBy = Seq("grp"))
    val del = PortableDelta.delete(spark, path,
      col("grp") === "g0" && col("id") < 10L)
    assert(del.deletedRows == 4, s"ids 0,3,6,9: $del") // 0,3,6,9 in g0
    // re-stated adds keep their partitionValues
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.files.filter(_.dv.isDefined)
      .forall(_.partitionValues("grp") == "g0"))
    val s = spark; import s.implicits._
    val src = Seq((1L, "upd", "g1"), (100L, "new", "g1"))
      .toDF("id", "body", "grp")
    val st = PortableDelta.merge(spark, path, src, Seq("id"))
    assert(st.updatedRows == 1 && st.insertedRows == 1, s"$st")
    // merged appends land INSIDE the hive layout
    val appended = PortableDelta.snapshot(spark, path).files
      .filter(f => f.path.startsWith("grp=g1/"))
    assert(appended.nonEmpty)
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("body")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "upd" && got(100L) == "new")
    assert(!got.contains(0L) && !got.contains(9L))
    assert(got.size == 30 - 4 + 1)
    // spec: extendedFileMetadata=true tombstones MUST carry
    // partitionValues (+ size) — external engines consume them via
    // checkpoint carry-forward and vacuum
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val logFiles = new java.io.File(s"$path/_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    val removes = logFiles.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty)
        .map(mapper.readTree).filter(_.has("remove")).map(_.get("remove")))
    assert(removes.nonEmpty)
    removes.foreach { r =>
      if (r.get("extendedFileMetadata").asBoolean()) {
        assert(r.has("partitionValues") && r.get("partitionValues").isObject,
          s"extended tombstone missing partitionValues: $r")
        assert(r.get("partitionValues").has("grp"))
        assert(r.has("size") && r.get("size").asLong() > 0L)
      }
    }
  }

  test("append inherits partitioning; a mismatch is rejected") {
    val path = tmp()
    PortableDelta.write(df(9L), path, partitionBy = Seq("grp"))
    PortableDelta.write(df(9L).withColumn("id", col("id") + 100L), path,
      mode = "append") // no partitionBy given: inherits grp
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.partitionColumns == Seq("grp"))
    assert(snap.files.forall(_.path.startsWith("grp=")))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(df(3L), path, mode = "append",
        partitionBy = Seq("body"))
    }
    assert(e.getMessage.contains("partitioning"))
  }

  test("checkpoint + cleanup round-trips partitionValues and pruning") {
    val path = tmp()
    PortableDelta.write(df(30L), path, partitionBy = Seq("grp"))
    PortableDelta.write(df(30L).withColumn("id", col("id") + 100L), path,
      mode = "append")
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.partitionColumns == Seq("grp"),
      "partitionColumns must survive the checkpoint metaData row")
    assert(snap.files.forall(_.partitionValues.contains("grp")),
      "partitionValues must ride the checkpoint add struct")
    val (kept, pruned) = PortableDelta.statsPrune(spark, snap, col("grp") === "g0")
    assert(pruned > 0 && kept.forall(_.partitionValues("grp") == "g0"))
    assert(PortableDelta.readTable(spark, path).count() == 60)
    // vacuum walks the hive subdirs but reclaims nothing referenced
    assert(PortableDelta.vacuum(spark, path, graceMillis = 0L) == 0)
  }

  test("interop: external-shaped log with a hive NULL partition reads back") {
    val path = tmp()
    val s = spark; import s.implicits._
    // data files WITHOUT the partition column, placed hive-style by hand
    val conf = spark.sessionState.newHadoopConf()
    def writeOne(dir: String, ids: Seq[Long]): (String, Long) = {
      val d = new java.io.File(s"$path/$dir"); d.mkdirs()
      ids.map(i => (i, s"d$i")).toDF("id", "body").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/.ext-tmp")
      val part = new java.io.File(s"$path/.ext-tmp").listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dest = new java.io.File(d, part.getName)
      java.nio.file.Files.move(part.toPath, dest.toPath)
      (s"$dir/${dest.getName}", dest.length())
    }
    val (p1, s1) = writeOne("region=eu", Seq(1L, 2L))
    val (p2, s2) = writeOne("region=__HIVE_DEFAULT_PARTITION__", Seq(3L))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("body", "string").add("region", "string")
    val proto = mapper.createObjectNode()
    proto.putObject("protocol").put("minReaderVersion", 1).put("minWriterVersion", 2)
    val meta = mapper.createObjectNode()
    val m = meta.putObject("metaData")
    m.put("id", "ext-part-1")
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    m.putArray("partitionColumns").add("region")
    m.putObject("configuration"); m.put("createdTime", 1L)
    def add(p: String, sz: Long, region: Option[String]) = {
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", p)
      val pv = a.putObject("partitionValues")
      region match { case Some(r) => pv.put("region", r); case None => pv.putNull("region") }
      a.put("size", sz); a.put("modificationTime", 1L); a.put("dataChange", true)
      n
    }
    PortableDelta.commit(conf, path, 0L,
      Seq(proto, meta, add(p1, s1, Some("eu")), add(p2, s2, None)))
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("region")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("eu"), 2L -> Some("eu"), 3L -> None),
      s"null partition must read back as null: $got")
    // pruning: the null partition is invisible to value predicates…
    val snap = PortableDelta.snapshot(spark, path)
    val (kept, _) = PortableDelta.statsPrune(spark, snap, col("region") === "eu")
    assert(kept.size == 1 && kept.head.path == p1)
    // …and exclusively visible to IS NULL
    val (keptN, _) = PortableDelta.statsPrune(spark, snap, col("region").isNull)
    assert(keptN.size == 1 && keptN.head.path == p2)
  }

  test("checkpoint tombstones carry partitionValues; external ones sans " +
       "them drop the extendedFileMetadata claim") {
    val path = tmp()
    PortableDelta.write(df(30L), path, partitionBy = Seq("grp"))
    // a whole-partition delete rewrites files → real tombstones with
    // partitionValues in the JSON log
    val del = PortableDelta.delete(spark, path, col("grp") === "g1")
    assert(del.deletedRows == 10)
    // one external-shaped tombstone WITHOUT partitionValues/size, as a
    // minimal external engine might write it
    val conf = spark.sessionState.newHadoopConf()
    val bare = mapper.createObjectNode()
    val br = bare.putObject("remove")
    br.put("path", "grp=g9/ext-phantom.parquet")
    br.put("deletionTimestamp", System.currentTimeMillis())
    br.put("dataChange", false)
    val v = PortableDelta.snapshot(spark, path).version + 1
    PortableDelta.commit(conf, path, v, Seq(bare))
    PortableDelta.checkpoint(spark, path)
    val cv = PortableDelta.snapshot(spark, path).version
    val ckpt = s"$path/_delta_log/${"%020d".format(cv)}.checkpoint.parquet"
    assert(new java.io.File(ckpt).isFile)
    val removes = spark.read.parquet(ckpt)
      .where(col("remove").isNotNull).select(col("remove.*")).collect()
    assert(removes.nonEmpty)
    val byPath = removes.map(r => r.getAs[String]("path") -> r).toMap
    val (ext, own) = byPath.partition(_._1 == "grp=g9/ext-phantom.parquet")
    assert(ext.size == 1 && own.nonEmpty)
    // spec: extendedFileMetadata=true promises partitionValues AND size
    own.values.foreach { r =>
      assert(r.getAs[Boolean]("extendedFileMetadata"),
        s"engine tombstone lost its extended claim: $r")
      val pv = r.getAs[Map[String, String]]("partitionValues")
      assert(pv != null && pv.get("grp").contains("g1"),
        s"checkpoint tombstone lost partitionValues: $r")
      assert(r.getAs[Long]("size") > 0L)
    }
    // the bare external tombstone must NOT claim extended metadata
    val e = ext.values.head
    assert(!e.getAs[Boolean]("extendedFileMetadata"),
      s"extended claim without partitionValues/size violates the spec: $e")
    // and the table still reads correctly through the checkpoint
    assert(PortableDelta.readTable(spark, path).count() == 20)
  }
}
