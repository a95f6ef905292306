package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Protocol feature declarations the spec requires BEYOND the operation
  * itself: a table whose configuration enables change data feed or
  * in-commit timestamps must DECLARE the matching writer feature, or an
  * external writer that fully supports the base protocol will commit
  * DML without cdc files / ICT stamps and silently corrupt the feed.
  * Plus the log-maintenance safety lines: out-of-root cdc paths are
  * never deleted, and superseded checkpoints survive until full JSON
  * replay can do without them. */
class ProtocolFeatureSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(tag: String = "pfeat"): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/tbl"

  private def df(ids: Seq[Long], tag: String = "a") = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"$tag $i")).toDF("id", "body")
  }

  private def logLines(path: String, version: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val f = new java.io.File(s"$path/_delta_log/${"%020d".format(version)}.json")
    assert(f.isFile, s"missing commit file $f")
    scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty)
      .map(mapper.readTree).toSeq
  }

  private def protocolOf(path: String, version: Long) =
    logLines(path, version).filter(_.has("protocol")).map(_.get("protocol"))

  private def featSeq(p: com.fasterxml.jackson.databind.JsonNode,
                      field: String): Seq[String] =
    Option(p.get(field)).filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)

  test("table born with CDF enabled declares changeDataFeed from v0") {
    val path = tmp()
    PortableDelta.write(df(0L until 6L).coalesce(1), path,
      properties = Map(PortableDelta.CdfProp -> "true"))
    val ps = protocolOf(path, 0L)
    assert(ps.size == 1)
    val p = ps.head
    // writer-side feature: reader version stays base (CDF needs no
    // reader capability — the feed is opt-in via the cdc files)
    assert(p.get("minReaderVersion").asInt() == 1)
    assert(p.get("minWriterVersion").asInt() == 7)
    assert(featSeq(p, "writerFeatures").contains("changeDataFeed"))
    assert(featSeq(p, "readerFeatures").isEmpty)
    // the first DV-writing DML joins deletionVectors WITHOUT dropping
    // the already-declared changeDataFeed (protocol actions replace)
    PortableDelta.delete(spark, path, col("id") < 2L)
    val ps1 = protocolOf(path, 1L)
    assert(ps1.size == 1)
    // the upgrade folds the legacy-implied features (appendOnly,
    // invariants) in — a version-7 table enables only LISTED features
    assert(featSeq(ps1.head, "writerFeatures").toSet ==
      Set("appendOnly", "invariants", "changeDataFeed", "deletionVectors"))
    assert(featSeq(ps1.head, "readerFeatures") == Seq("deletionVectors"))
    // the feed itself still reads
    val ch = PortableDelta.readChanges(spark, path, 1L, 1L)
      .select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((0L, "delete"), (1L, "delete")))
  }

  test("legacy table with the CDF property gets the feature on first DML") {
    val path = tmp()
    PortableDelta.write(df(0L until 6L).coalesce(1), path)
    // externally-shaped v1: re-state metaData with the property set but
    // NO protocol upgrade — the out-of-spec state the fix must heal
    val snap = PortableDelta.snapshot(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val meta = mapper.createObjectNode()
    val m = meta.putObject("metaData")
    m.put("id", snap.tableId)
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", snap.schema.json)
    m.putArray("partitionColumns")
    m.putObject("configuration").put(PortableDelta.CdfProp, "true")
    val ci = mapper.createObjectNode()
    ci.putObject("commitInfo").put("operation", "SET TBLPROPERTIES")
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/${"%020d".format(1L)}.json"), false)
    try out.write((mapper.writeValueAsString(ci) + "\n" +
      mapper.writeValueAsString(meta) + "\n").getBytes("UTF-8"))
    finally out.close()

    PortableDelta.delete(spark, path, col("id") === 0L) // v2
    val ps = protocolOf(path, 2L)
    assert(ps.size == 1, s"expected one protocol action, got $ps")
    assert(featSeq(ps.head, "writerFeatures").toSet ==
      Set("appendOnly", "invariants", "deletionVectors", "changeDataFeed"))
    // and the commit carries the cdc action the property demands
    assert(logLines(path, 2L).exists(_.has("cdc")))
  }

  test("upgrade from legacy writer 4 folds EVERY implied feature in") {
    val path = tmp()
    PortableDelta.write(df(0L until 6L).coalesce(1), path)
    // externally-shaped v1: a LEGACY protocol bump to writer 4 (CDF +
    // generatedColumns implied, plus writer 2/3's appendOnly/invariants/
    // checkConstraints) with the CDF property active
    val snap = PortableDelta.snapshot(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val proto = mapper.createObjectNode()
    val p = proto.putObject("protocol")
    p.put("minReaderVersion", 1); p.put("minWriterVersion", 4)
    val meta = mapper.createObjectNode()
    val m = meta.putObject("metaData")
    m.put("id", snap.tableId)
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", snap.schema.json)
    m.putArray("partitionColumns")
    m.putObject("configuration").put(PortableDelta.CdfProp, "true")
    val ci = mapper.createObjectNode()
    ci.putObject("commitInfo").put("operation", "UPGRADE PROTOCOL")
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/${"%020d".format(1L)}.json"), false)
    try out.write((mapper.writeValueAsString(ci) + "\n" +
      mapper.writeValueAsString(proto) + "\n" +
      mapper.writeValueAsString(meta) + "\n").getBytes("UTF-8"))
    finally out.close()

    // first DML re-protocols to (3,7) — the version-7 list must carry
    // all writer-4-implied legacy features, or external engines stop
    // enforcing constraints/append-only/generation expressions
    PortableDelta.delete(spark, path, col("id") === 0L) // v2
    val ps = protocolOf(path, 2L)
    assert(ps.size == 1, s"expected one protocol action, got $ps")
    assert(featSeq(ps.head, "writerFeatures").toSet ==
      Set("appendOnly", "invariants", "checkConstraints", "changeDataFeed",
        "generatedColumns", "deletionVectors"))
    assert(featSeq(ps.head, "readerFeatures") == Seq("deletionVectors"))
  }

  test("delta.feature.* properties request declaration; unknown names refuse") {
    val path = tmp()
    // the delta-spark enablement route: a property, not a verb
    PortableDelta.write(df(0L until 4L).coalesce(1), path,
      properties = Map(
        "delta.feature.deletionVectors" -> "supported",
        "delta.feature.v2Checkpoint" -> "supported"))
    val ps = protocolOf(path, 0L)
    assert(ps.size == 1)
    val p = ps.head
    assert(p.get("minReaderVersion").asInt() == 3 &&
      p.get("minWriterVersion").asInt() == 7)
    // reader+writer features declared on BOTH sides at birth
    assert(featSeq(p, "readerFeatures").toSet ==
      Set("deletionVectors", "v2Checkpoint"))
    assert(featSeq(p, "writerFeatures").toSet ==
      Set("appendOnly", "invariants", "deletionVectors", "v2Checkpoint"))
    // the table reads and mutates normally
    PortableDelta.delete(spark, path, col("id") === 0L)
    assert(PortableDelta.readTable(spark, path).count() == 3L)
    // typeWidening/variantType are reader+writer too: the property
    // route must declare them on BOTH protocol sides (data-path healing
    // would otherwise mask a writer-only declaration until data lands)
    val rw = tmp()
    PortableDelta.write(df(0L until 2L).coalesce(1), rw,
      properties = Map(
        "delta.feature.typeWidening" -> "supported",
        "delta.feature.variantType" -> "supported"))
    val prw = protocolOf(rw, 0L).head
    assert(featSeq(prw, "readerFeatures").toSet ==
      Set("typeWidening", "variantType"),
      s"reader side: ${featSeq(prw, "readerFeatures")}")
    assert(Set("typeWidening", "variantType").subsetOf(
      featSeq(prw, "writerFeatures").toSet))
    // an unknown feature name refuses BY NAME before anything lands
    val bad = tmp()
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(df(0L until 2L).coalesce(1), bad,
        properties = Map("delta.feature.futureFancy" -> "supported"))
    }
    assert(e.getMessage.contains("futureFancy"), e.getMessage)
    assert(!new java.io.File(s"$bad/_delta_log").exists())
    // refused BEFORE staging: no data file ever landed either
    assert(Option(new java.io.File(bad).listFiles()).forall(_.isEmpty))
  }

  test("table born with ICT declares inCommitTimestamp and stamps from v0") {
    val path = tmp()
    PortableDelta.write(df(0L until 4L).coalesce(1), path,
      properties = Map(PortableDelta.IctProp -> "true"))
    val ps = protocolOf(path, 0L)
    assert(ps.size == 1)
    assert(ps.head.get("minWriterVersion").asInt() == 7)
    assert(featSeq(ps.head, "writerFeatures").contains("inCommitTimestamp"))
    val ci = logLines(path, 0L).find(_.has("commitInfo")).get.get("commitInfo")
    assert(ci.has("inCommitTimestamp"), "v0 commitInfo must carry the stamp")
    // appends keep stamping (property rides the table configuration)
    PortableDelta.write(df(4L until 6L).coalesce(1), path, mode = "append")
    assert(logLines(path, 1L).find(_.has("commitInfo")).get
      .get("commitInfo").has("inCommitTimestamp"))
  }

  test("overwrite enabling ICT declares the feature with provenance") {
    val path = tmp()
    PortableDelta.write(df(0L until 4L).coalesce(1), path) // plain v0
    PortableDelta.write(df(0L until 4L, "b").coalesce(1), path,
      mode = "overwrite", properties = Map(PortableDelta.IctProp -> "true"))
    val ps = protocolOf(path, 1L)
    assert(ps.size == 1)
    assert(featSeq(ps.head, "writerFeatures").contains("inCommitTimestamp"))
    val cfg = PortableDelta.snapshot(spark, path).configuration
    // mid-life enablement records WHERE ICT starts — pre-ICT commits
    // have only file-modification times
    assert(cfg.get("delta.inCommitTimestampEnablementVersion").contains("1"))
    assert(cfg.contains("delta.inCommitTimestampEnablementTimestamp"))
    assert(logLines(path, 1L).find(_.has("commitInfo")).get
      .get("commitInfo").has("inCommitTimestamp"))
  }

  test("delta.logRetentionDuration keeps the time-travel window behind the checkpoint") {
    val path = tmp()
    PortableDelta.write(df(0L until 4L).coalesce(1), path,
      properties = Map("delta.logRetentionDuration" -> "interval 1 hours"))
    (1 to 3).foreach(k => PortableDelta.write(df(Seq(10L + k)).coalesce(1),
      path, mode = "append"))                                        // v1-3
    PortableDelta.checkpoint(spark, path)                            // @3
    // property-honoring entry: every commit is younger than 1 hour —
    // NOTHING truncates, and the whole window stays travelable
    assert(PortableDelta.cleanupLog(spark, path) == 0)
    (0L to 3L).foreach(v =>
      assert(PortableDelta.readTable(spark, path, v).count() == 4L + v))
    // explicit zero retention (or the legacy conf entry) truncates all
    val conf = spark.sessionState.newHadoopConf()
    assert(PortableDelta.cleanupLog(conf, path,
      retainMillis = Some(0L)) == 4)
    assert(PortableDelta.readTable(spark, path).count() == 7L)
    // interval parsing covers the delta property format
    assert(PortableDelta.parseInterval("interval 30 days")
      .contains(30L * 86400000L))
    assert(PortableDelta.parseInterval("interval 2 hours")
      .contains(7200000L))
    assert(PortableDelta.parseInterval("45 minutes").contains(2700000L))
    assert(PortableDelta.parseInterval("1 week").contains(604800000L))
    assert(PortableDelta.parseInterval("nonsense").isEmpty)
  }

  test("delta.checkpointInterval auto-checkpoints every interval-th commit") {
    val path = tmp()
    def lastCkpt: Option[Long] = {
      val f = new java.io.File(s"$path/_delta_log/_last_checkpoint")
      if (!f.isFile) None
      else Some(mapper.readTree(f).get("version").asLong())
    }
    PortableDelta.write(df(0L until 4L).coalesce(1), path,
      properties = Map("delta.checkpointInterval" -> "2"))
    assert(lastCkpt.isEmpty, "v0 (create) must not checkpoint")
    PortableDelta.write(df(Seq(10L)).coalesce(1), path, mode = "append") // v1
    assert(lastCkpt.isEmpty)
    PortableDelta.write(df(Seq(11L)).coalesce(1), path, mode = "append") // v2
    assert(lastCkpt.contains(2L), "the interval-th commit checkpoints itself")
    // DML verbs ride the same cadence: v3 (off-interval) no, v4 yes
    PortableDelta.delete(spark, path, col("id") === 10L)                 // v3
    assert(lastCkpt.contains(2L))
    PortableDelta.write(df(Seq(12L)).coalesce(1), path, mode = "append") // v4
    assert(lastCkpt.contains(4L))
    // auto-checkpoint is maintenance, not truncation: the full history
    // stays travelable and the current read is exact
    assert(PortableDelta.readTable(spark, path, 0L).count() == 4L)
    assert(PortableDelta.readTable(spark, path).count() == 6L)
    // delta.checkpointPolicy=v2 routes the cadence through the v2
    // (UUID-named + sidecar) layout
    val p2 = tmp()
    PortableDelta.write(df(0L until 3L).coalesce(1), p2, properties = Map(
      "delta.checkpointInterval" -> "2", "delta.checkpointPolicy" -> "v2"))
    PortableDelta.write(df(Seq(10L)).coalesce(1), p2, mode = "append") // v1
    PortableDelta.write(df(Seq(11L)).coalesce(1), p2, mode = "append") // v2
    val logFiles = new java.io.File(s"$p2/_delta_log").listFiles().map(_.getName)
    assert(logFiles.exists(_.matches("\\d{20}\\.checkpoint\\.[0-9a-f-]{36}\\.parquet")),
      s"expected a v2 UUID checkpoint, got ${logFiles.mkString(", ")}")
    assert(PortableDelta.readTable(spark, p2).count() == 5L)
  }

  test("delta.enableExpiredLogCleanup truncates behind the checkpoint automatically") {
    val path = tmp()
    PortableDelta.write(df(0L until 3L).coalesce(1), path, properties = Map(
      "delta.enableExpiredLogCleanup" -> "true",
      "delta.logRetentionDuration" -> "interval 0 milliseconds"))
    (1 to 2).foreach(k => PortableDelta.write(df(Seq(10L + k)).coalesce(1),
      path, mode = "append"))                                        // v1-2
    Thread.sleep(5) // commits strictly older than the zero window
    PortableDelta.checkpoint(spark, path) // cleanup rides the checkpoint
    val jsons = new java.io.File(s"$path/_delta_log").listFiles()
      .count(_.getName.matches("\\d{20}\\.json"))
    assert(jsons == 0, s"expired tail must truncate automatically, $jsons left")
    assert(PortableDelta.readTable(spark, path).count() == 5L)
    // history survives via the sidecar harvest
    assert(PortableDelta.history(spark.sessionState.newHadoopConf(), path)
      .map(_._1).sorted == Seq(0L, 1L, 2L))
  }

  test("delta.setTransactionRetentionDuration expires idle txn watermarks at checkpoint") {
    // young txns under a 1-hour retention survive the checkpoint
    val keep = tmp()
    PortableDelta.write(df(0L until 3L).coalesce(1), keep,
      properties = Map("delta.setTransactionRetentionDuration" -> "interval 1 hours"))
    PortableDelta.write(df(Seq(10L)).coalesce(1), keep, mode = "append",
      txn = Some(("appA", 1L)))
    PortableDelta.checkpoint(spark, keep)
    assert(PortableDelta.snapshot(spark, keep).txns == Map("appA" -> 1L))
    assert(PortableDelta.snapshot(spark, keep).txnLastUpdated.contains("appA"),
      "lastUpdated must ride the checkpoint (it feeds the NEXT expiry decision)")
    // zero retention expires every lastUpdated-stamped txn; a txn
    // WITHOUT lastUpdated (external writer) is never expired — its age
    // is unknown
    val drop = tmp()
    PortableDelta.write(df(0L until 3L).coalesce(1), drop,
      properties = Map("delta.setTransactionRetentionDuration" -> "interval 0 milliseconds"))
    PortableDelta.write(df(Seq(10L)).coalesce(1), drop, mode = "append",
      txn = Some(("appA", 1L)))                                          // v1
    val raw = new java.io.File(s"$drop/_delta_log/${"%020d".format(2L)}.json")
    java.nio.file.Files.write(raw.toPath,
      """{"txn":{"appId":"ext","version":9}}""".getBytes("UTF-8"))       // v2
    assert(PortableDelta.snapshot(spark, drop).txns ==
      Map("appA" -> 1L, "ext" -> 9L))
    Thread.sleep(5) // ensure appA's lastUpdated is strictly in the past
    PortableDelta.checkpoint(spark, drop)
    val after = PortableDelta.snapshot(spark, drop)
    assert(after.txns == Map("ext" -> 9L),
      s"stamped txn expires, unstamped survives: ${after.txns}")
    assert(PortableDelta.readTable(spark, drop).count() == 4L)
  }

  test("cleanupLog never deletes out-of-root cdc paths") {
    val other = java.nio.file.Files.createTempDirectory("pfeat-other")
    val foreign = other.resolve("foreign.parquet")
    java.nio.file.Files.write(foreign, Array[Byte](1, 2, 3))
    val path = tmp()
    PortableDelta.write(df(0L until 6L).coalesce(1), path,
      properties = Map(PortableDelta.CdfProp -> "true"))
    PortableDelta.delete(spark, path, col("id") === 0L) // v1 writes a cdc file
    val inRootCdc = new java.io.File(s"$path/_change_data").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(inRootCdc.nonEmpty)
    // externally-shaped v2: a cdc action with an ABSOLUTE out-of-root
    // path (spec-legal for clone/external logs)
    val node = mapper.createObjectNode()
    val c = node.putObject("cdc")
    c.put("path", foreign.toUri.toString)
    c.putObject("partitionValues"); c.put("size", 3L); c.put("dataChange", false)
    val ci = mapper.createObjectNode()
    ci.putObject("commitInfo").put("operation", "EXTERNAL CDC")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_delta_log/${"%020d".format(2L)}.json"), false)
    try out.write((mapper.writeValueAsString(ci) + "\n" +
      mapper.writeValueAsString(node) + "\n").getBytes("UTF-8"))
    finally out.close()

    PortableDelta.checkpoint(spark, path)
    val conf = spark.sessionState.newHadoopConf()
    assert(PortableDelta.cleanupLog(conf, path) == 3)
    // this table's cdc files are reclaimed; the foreign file survives
    assert(inRootCdc.forall(!_.exists()), "in-root cdc must be reclaimed")
    assert(java.nio.file.Files.exists(foreign),
      "cleanup of THIS table must never delete ANOTHER table's files")
  }

  test("superseded checkpoint survives until full replay can do without it") {
    val path = tmp()
    val conf = spark.sessionState.newHadoopConf()
    for (v <- 0L until 4L)
      PortableDelta.write(df(Seq(v), s"c$v").coalesce(1), path,
        mode = if (v == 0) "error" else "append")            // v0..v3
    PortableDelta.checkpoint(spark, path)                    // ckpt @3
    assert(PortableDelta.cleanupLog(conf, path) == 4)        // JSONs 0..3 gone
    for (v <- 4L until 7L)
      PortableDelta.write(df(Seq(v), s"c$v").coalesce(1), path,
        mode = "append")                                     // v4..v6
    PortableDelta.checkpoint(spark, path)                    // ckpt @6
    // versions 3..5 are servable ONLY via ckpt@3 + JSON tail — the pass
    // must retain it (deleting it would shrink time travel to >= 6)
    assert(PortableDelta.cleanupCheckpoints(spark, path) == 0,
      "checkpoint@3 still seeds versions 3..5")
    assert(PortableDelta.readTable(spark, path, versionAsOf = 4L)
      .count() == 5L, "time travel through the retained checkpoint")
    // after the tail truncates too, ckpt@3 is genuinely garbage
    assert(PortableDelta.cleanupLog(conf, path) == 3)        // JSONs 4..6 gone
    assert(PortableDelta.cleanupCheckpoints(spark, path) >= 1)
    assert(PortableDelta.readTable(spark, path).count() == 7L)
  }

  test("delta.appendOnly forbids every mutating verb, allows appends") {
    val path = tmp()
    PortableDelta.write(df(0L until 6L).coalesce(1), path,
      properties = Map("delta.appendOnly" -> "true"))
    // appends and dataChange=false maintenance stay legal
    PortableDelta.write(df(6L until 8L).coalesce(1), path, mode = "append")
    PortableDelta.checkpoint(spark, path)
    assert(PortableDelta.readTable(spark, path).count() == 8L)
    def refused(op: String)(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("append-only") &&
        e.getMessage.contains(op), s"$op: ${e.getMessage}")
    }
    val s = spark; import s.implicits._
    refused("DELETE")(PortableDelta.delete(spark, path, col("id") === 0L))
    refused("UPDATE")(PortableDelta.update(spark, path, col("id") === 0L,
      Map("body" -> lit("x"))))
    refused("MERGE")(PortableDelta.merge(spark, path,
      Seq((0L, "m")).toDF("id", "body"), Seq("id")))
    refused("RESTORE")(PortableDelta.restore(spark, path, 0L))
    refused("overwrite")(PortableDelta.write(df(0L until 2L).coalesce(1),
      path, mode = "overwrite"))
    // nothing committed by any refusal
    assert(PortableDelta.snapshot(spark, path).version == 1L)
    assert(PortableDelta.readTable(spark, path).count() == 8L)
  }

  test("superseded checkpoint IS deleted while full replay remains intact") {
    val path = tmp()
    for (v <- 0L until 3L)
      PortableDelta.write(df(Seq(v), s"c$v").coalesce(1), path,
        mode = if (v == 0) "error" else "append")            // v0..v2
    PortableDelta.checkpoint(spark, path)                    // ckpt @2
    PortableDelta.write(df(Seq(3L), "c3").coalesce(1), path, mode = "append")
    PortableDelta.checkpoint(spark, path)                    // ckpt @3
    // no cleanupLog ran: JSONs 0..3 all present, full replay covers
    // everything ckpt@2 could seed — it is safe garbage
    assert(PortableDelta.cleanupCheckpoints(spark, path) >= 1)
    assert(PortableDelta.readTable(spark, path, versionAsOf = 2L).count() == 3L)
    assert(PortableDelta.readTable(spark, path).count() == 4L)
  }
}
