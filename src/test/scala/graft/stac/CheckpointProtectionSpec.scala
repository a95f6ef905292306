package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The checkpointProtection writer feature (delta spec): while
  * `delta.requireCheckpointProtectionBeforeVersion = V` binds, metadata
  * cleanup must not remove commits or checkpoints below V unless the
  * sweep truncates against a checkpoint AT or BEYOND V — the protected
  * region goes whole or not at all. Covers: property-driven feature
  * declaration, the cleanup no-op inside the protected region, the
  * full sweep once the boundary is crossed, the conf-only tail-scan
  * resolution, the drop-feature trace gate, and the external-shaped-log
  * replay + write path. */
class CheckpointProtectionSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private def conf = spark.sessionState.newHadoopConf()
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ckprot").toString + "/tbl"

  private def df(ids: Long*) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"row $i")).toDF("id", "tag")
  }

  private def jsonVersions(path: String): Seq[Long] =
    new java.io.File(s"$path/_delta_log").listFiles()
      .filter(_.getName.matches("\\d{20}\\.json"))
      .map(_.getName.stripSuffix(".json").toLong).sorted.toSeq

  test("boundary property declares the feature; cleanup no-ops inside the region") {
    val path = tmp()
    PortableDelta.write(df(0L), path, properties = Map(
      PortableDelta.CheckpointProtectionProp -> "5"))           // v0
    val snap0 = PortableDelta.snapshot(spark, path)
    assert(snap0.writerFeatures.contains("checkpointProtection"),
      s"property must declare the feature: ${snap0.writerFeatures}")
    PortableDelta.write(df(1L), path, mode = "append")          // v1
    PortableDelta.write(df(2L), path, mode = "append")          // v2
    val cv = PortableDelta.checkpoint(spark, path)
    assert(cv == 2L)
    // cv < boundary: a partial sweep of the protected region refuses —
    // zero commits removed, every JSON survives
    assert(PortableDelta.cleanupLog(spark, path) == 0)
    assert(jsonVersions(path) == Seq(0L, 1L, 2L))
    // the protected superseded checkpoint also survives checkpoint GC
    PortableDelta.write(df(3L), path, mode = "append")          // v3
    PortableDelta.checkpoint(spark, path)                       // ckpt@3, still < 5
    PortableDelta.cleanupCheckpoints(spark, path)
    assert(new java.io.File(
      f"$path/_delta_log/${2L}%020d.checkpoint.parquet").exists(),
      "checkpoint below the boundary is a protected log entry")
    // cross the boundary: commits to v5, checkpoint at >= 5 — now the
    // whole region sweeps
    PortableDelta.write(df(4L), path, mode = "append")          // v4
    PortableDelta.write(df(5L), path, mode = "append")          // v5
    val cv2 = PortableDelta.checkpoint(spark, path)
    assert(cv2 == 5L)
    assert(PortableDelta.cleanupLog(spark, path) == 6)
    assert(jsonVersions(path).isEmpty)
    PortableDelta.cleanupCheckpoints(spark, path)
    assert(!new java.io.File(
      f"$path/_delta_log/${2L}%020d.checkpoint.parquet").exists(),
      "once the boundary is crossed the swept region's checkpoints go too")
    // the table stays fully readable and writable throughout
    assert(PortableDelta.readTable(spark, path).count() == 6L)
    PortableDelta.write(df(6L), path, mode = "append")          // v6
    assert(PortableDelta.readTable(spark, path).count() == 7L)
  }

  test("conf-only cleanup resolves a tail-visible boundary; drop gates on the property") {
    val path = tmp()
    PortableDelta.write(df(0L), path)                           // v0
    PortableDelta.write(df(1L), path, mode = "append")          // v1
    val cv = PortableDelta.checkpoint(spark, path)              // ckpt@1
    // the boundary lands AFTER the checkpoint, in the JSON tail — the
    // engine-less overload must still see and honor it
    PortableDelta.setTableProperties(spark, path, Map(
      PortableDelta.CheckpointProtectionProp -> "4"))           // v2
    assert(PortableDelta.cleanupLog(conf, path) == 0,
      "tail-visible boundary must bind the conf-only overload")
    assert(jsonVersions(path) == Seq(0L, 1L, 2L))
    // drop-feature trace gate: refuses BY NAME while the property binds
    val e = intercept[IllegalArgumentException] {
      PortableDelta.dropFeatureSupport(spark, path, "checkpointProtection")
    }
    assert(e.getMessage.contains(PortableDelta.CheckpointProtectionProp))
    PortableDelta.unsetTableProperties(spark, path,
      Seq(PortableDelta.CheckpointProtectionProp))              // v3
    PortableDelta.dropFeatureSupport(spark, path, "checkpointProtection")
    val snap = PortableDelta.snapshot(spark, path)
    assert(!snap.writerFeatures.contains("checkpointProtection"))
    // with the boundary gone, cleanup proceeds
    assert(PortableDelta.cleanupLog(conf, path) > 0)
  }

  test("conf-only cleanup honors the _last_checkpoint hint, the crc, and " +
       "the checkpoint parquet's metaData; refuses when no tier resolves") {
    val path = tmp()
    PortableDelta.write(df(0L), path, properties = Map(
      PortableDelta.CheckpointProtectionProp -> "5"))           // v0
    PortableDelta.write(df(1L), path, mode = "append")          // v1
    PortableDelta.write(df(2L), path, mode = "append")          // v2
    assert(PortableDelta.checkpoint(spark, path) == 2L)
    PortableDelta.write(df(3L), path, mode = "append")          // v3
    // the tail (v3) re-states NO metaData: the boundary now lives only
    // in the checkpoint parquet — plus the hint our checkpoint recorded
    // in _last_checkpoint, which the conf-only overload must honor
    val lcFile = new java.io.File(s"$path/_delta_log/_last_checkpoint")
    val lcJson = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(lcFile.toPath), "UTF-8"))
    assert(lcJson.has(PortableDelta.CheckpointProtectionProp) &&
      lcJson.get(PortableDelta.CheckpointProtectionProp).asLong() == 5L,
      s"checkpoint must record the boundary hint: $lcJson")
    assert(PortableDelta.cleanupLog(conf, path) == 0,
      "hinted boundary (5 > ckpt 2) must no-op the conf-only sweep")
    assert(jsonVersions(path) == Seq(0L, 1L, 2L, 3L))
    // engine-less resolution order: with the hint stripped, the VERSION
    // CHECKSUM (≥ ckpt) still carries the full configuration — the
    // conf-only sweep resolves the boundary from it and no-ops
    val crcs = new java.io.File(s"$path/_delta_log").listFiles()
      .filter(_.getName.matches("\\d{20}\\.crc")).sortBy(_.getName)
    assert(crcs.nonEmpty, "engine writes a crc per commit")
    // simulate an EXTERNAL checkpoint (no hint) + a tail protocol that
    // lists the feature: the boundary is then unresolvable engine-lessly
    // and the conf-only sweep must REFUSE rather than guess
    val stripped = mapper.createObjectNode()
    lcJson.properties().forEach { e =>
      if (e.getKey != PortableDelta.CheckpointProtectionProp)
        stripped.set(e.getKey, e.getValue)
    }
    java.nio.file.Files.write(lcFile.toPath,
      mapper.writeValueAsBytes(stripped))
    // the raw rewrite bypassed Hadoop's LocalFileSystem, whose stale
    // .crc sidecar would fail the next fs.open
    new java.io.File(s"$path/_delta_log/._last_checkpoint.crc").delete()
    val proto =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","checkpointProtection"]}}
        |""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(s"$path/_delta_log/${"%020d".format(4L)}.json").toPath,
      proto.getBytes("UTF-8"))                                  // v4
    // the crc evidence path: with the hint gone but checksums present,
    // the boundary resolves from the newest crc's configuration — no-op
    assert(PortableDelta.cleanupLog(conf, path) == 0,
      "crc-resolved boundary (5 > ckpt 2) must no-op the sweep")
    // fourth tier: no hint, no usable crc (a crc with "metadata": null —
    // external shape variant — must read as ABSENT evidence, not as an
    // empty (=unprotected) config), but the CHECKPOINT PARQUET's own
    // metaData row carries the configuration — the conf-only sweep reads
    // it engine-lessly via parquet-hadoop and no-ops
    crcs.foreach(f => assert(f.delete()))
    new java.io.File(s"$path/_delta_log").listFiles()
      .filter(f => f.getName.matches("\\d{20}\\.crc") ||
        f.getName.startsWith(".") && f.getName.contains(".crc"))
      .foreach(_.delete())
    java.nio.file.Files.write(
      new java.io.File(s"$path/_delta_log/${"%020d".format(4L)}.crc").toPath,
      """{"tableSizeBytes":1,"numFiles":1,"metadata":null,"protocol":null}"""
        .getBytes("UTF-8"))
    assert(PortableDelta.cleanupLog(conf, path) == 0,
      "checkpoint-parquet-resolved boundary (5 > ckpt 2) must no-op the sweep")
    // the engine-ful overload resolves the boundary and no-ops correctly
    assert(PortableDelta.cleanupLog(spark, path) == 0)
    // a truly evidence-less external table: additionally strip the
    // configuration group OUT of the checkpoint's metaData row (external
    // shape variant) — with every tier absent and the tail protocol
    // naming the feature, the sweep must REFUSE, not guess
    val ckptFile = new java.io.File(
      s"$path/_delta_log/${"%020d".format(2L)}.checkpoint.parquet")
    assert(ckptFile.isFile)
    val cdf = spark.read.parquet(ckptFile.toString)
    val mdFields = cdf.schema("metaData").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.filterNot(_ == "configuration")
    val strippedMd = when(col("metaData").isNotNull,
      struct(mdFields.map(f => col(s"metaData.`$f`").as(f)): _*))
    val rewritten = cdf.withColumn("metaData", strippedMd)
    val rwDir = java.nio.file.Files.createTempDirectory("ckrw").toString
    rewritten.coalesce(1).write.mode("overwrite").parquet(rwDir)
    val part = new java.io.File(rwDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .head
    assert(ckptFile.delete())
    java.nio.file.Files.copy(part.toPath, ckptFile.toPath)
    new java.io.File(s"$path/_delta_log/.${ckptFile.getName}.crc").delete()
    val e = intercept[IllegalStateException] {
      PortableDelta.cleanupLog(conf, path)
    }
    assert(e.getMessage.contains("checkpointProtection") &&
      e.getMessage.contains("cleanupLog(spark, path)"))
    assert(jsonVersions(path) == Seq(0L, 1L, 2L, 3L, 4L),
      "a refused sweep must delete nothing")
  }

  test("interop: external-shaped log listing checkpointProtection replays and accepts writes") {
    val path = tmp()
    val logDir = new java.io.File(s"$path/_delta_log")
    logDir.mkdirs()
    // one data file an "external engine" wrote
    val stage = java.nio.file.Files.createTempDirectory("ext").toString + "/d"
    df(10L, 11L).coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
    val dataName = "part-ext-0001.parquet"
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(path, dataName).toPath)
    val schemaJson = df(0L).schema.json
    val v0 =
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","checkpointProtection"]}}
         |{"metaData":{"id":"ext-table-1","format":{"provider":"parquet","options":{}},"schemaString":${mapper.writeValueAsString(schemaJson)},"partitionColumns":[],"configuration":{"${PortableDelta.CheckpointProtectionProp}":"3"},"createdTime":1700000000000}}
         |{"add":{"path":"$dataName","partitionValues":{},"size":${part.length()},"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${0L}%020d.json").toPath,
      v0.getBytes("UTF-8"))
    // replays: the feature is writer-side only and this engine supports it
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.writerFeatures.contains("checkpointProtection"))
    assert(PortableDelta.readTable(spark, path).count() == 2L)
    // writes are accepted (requireWritable passes) and the protection
    // carries: checkpoint inside the region + cleanup is a no-op
    PortableDelta.write(df(12L), path, mode = "append")         // v1
    PortableDelta.checkpoint(spark, path)                       // ckpt@1 < 3
    assert(PortableDelta.cleanupLog(spark, path) == 0)
    assert(jsonVersions(path) == Seq(0L, 1L))
    // an UNKNOWN writer feature alongside still refuses by name
    val bad = tmp()
    val badLog = new java.io.File(s"$bad/_delta_log"); badLog.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(badLog, f"${0L}%020d.json").toPath,
      v0.replace("\"checkpointProtection\"",
        "\"checkpointProtection\",\"futureCleanupV9\"").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(df(1L), bad, mode = "append")
    }
    assert(e.getMessage.contains("futureCleanupV9"))
  }
}
