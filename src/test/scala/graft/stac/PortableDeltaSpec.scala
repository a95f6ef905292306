package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The portable Delta transaction-log writer (K3 without the jar).
  * Validates the EMITTED BYTES against the open Delta protocol — file
  * naming, action shapes, pinned protocol versions, schemaString — not
  * just our own reader's replay, so any conformant engine (delta-spark,
  * delta-rs, DuckDB delta) loads these tables. Where delta-spark exists,
  * DeltaSinkSpec's jar-gated leg is the cross-engine read. */
class PortableDeltaSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pdelta").toString + "/tbl"

  private def df(ids: Long*) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"doc $i")).toDF("id", "body")
  }

  private def logLines(path: String, version: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val f = new java.io.File(s"$path/_delta_log/${"%020d".format(version)}.json")
    assert(f.isFile, s"missing commit file $f")
    scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty)
      .map(mapper.readTree).toSeq
  }

  test("version 0 emits spec-shaped commitInfo/protocol/metaData/add actions") {
    val path = tmp()
    val data = df(1L, 2L, 3L)
    PortableDelta.write(data, path, properties = Map("k" -> "v"), mode = "error")
    val logDir = new java.io.File(s"$path/_delta_log")
    // ignore local-FS checksum shadows (.crc) — hidden names per Delta/Spark
    assert(logDir.listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq ==
      Seq("00000000000000000000.json"), "exactly one 20-digit commit file")
    val lines = logLines(path, 0)
    val protocol = lines.filter(_.has("protocol"))
    assert(protocol.size == 1)
    assert(protocol.head.get("protocol").get("minReaderVersion").asInt() == 1)
    assert(protocol.head.get("protocol").get("minWriterVersion").asInt() == 2)
    val meta = lines.filter(_.has("metaData"))
    assert(meta.size == 1)
    val m = meta.head.get("metaData")
    assert(m.get("format").get("provider").asText() == "parquet")
    // schemaString is the Spark StructType JSON — what delta-spark parses
    assert(m.get("schemaString").asText() == data.schema.json)
    assert(m.get("configuration").get("k").asText() == "v")
    assert(m.get("id").asText().nonEmpty)
    assert(m.get("partitionColumns").isArray && m.get("partitionColumns").size() == 0)
    val adds = lines.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val f = new java.io.File(s"$path/${a.get("path").asText()}")
      assert(f.isFile, s"add action points at missing file $f")
      assert(f.length() == a.get("size").asLong(), "size must be filesystem-true")
      assert(a.get("dataChange").asBoolean())
      assert(a.get("partitionValues").isObject)
    }
  }

  test("append commits v1 with add-only actions; metaData stays v0's") {
    val path = tmp()
    PortableDelta.write(df(1L), path)
    PortableDelta.write(df(2L, 3L), path, mode = "append")
    val lines = logLines(path, 1)
    assert(lines.exists(_.has("add")))
    assert(!lines.exists(_.has("metaData")) && !lines.exists(_.has("protocol")))
    val snap = PortableDelta.snapshot(
      spark.sessionState.newHadoopConf(), path)
    assert(snap.version == 1)
    val back = PortableDelta.readTable(spark, path)
    assert(back.select(sum(col("id"))).collect().head.getLong(0) == 6L)
  }

  test("append with a different schema is rejected before any write") {
    val path = tmp()
    PortableDelta.write(df(1L), path)
    val s = spark; import s.implicits._
    val bad = Seq((1L, 2.0)).toDF("id", "score")
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(bad, path, mode = "append")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("overwrite is logical: removes in the log, old files stay on disk") {
    val path = tmp()
    PortableDelta.write(df(1L, 2L), path)
    PortableDelta.write(df(10L), path, mode = "overwrite")
    val lines = logLines(path, 1)
    val removed = lines.filter(_.has("remove")).map(_.get("remove").get("path").asText())
    assert(removed.nonEmpty, "overwrite must emit remove actions")
    removed.foreach { p =>
      assert(new java.io.File(s"$path/$p").isFile,
        "removed files remain on disk for earlier-version readers")
    }
    val back = PortableDelta.readTable(spark, path)
    assert(back.select(col("id")).collect().map(_.getLong(0)).toSeq == Seq(10L))
    // directory listing would double-count — the log is the source of truth
    assert(spark.read.parquet(path).count() > back.count())
  }

  test("mode=error refuses an existing table; commit clash surfaces clearly") {
    val path = tmp()
    PortableDelta.write(df(1L), path)
    val e1 = intercept[IllegalArgumentException] { PortableDelta.write(df(2L), path) }
    assert(e1.getMessage.contains("already exists"))
    // a racing writer that computed the same next version must hit the
    // put-if-absent guard, not clobber the existing commit file
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.commit(spark.sessionState.newHadoopConf(), path, 0, Seq.empty)
    }
    assert(e2.getMessage.contains("commit 0 already exists"))
  }

  test("non-contiguous log is rejected, not silently replayed") {
    val path = tmp()
    PortableDelta.write(df(1L), path)
    PortableDelta.write(df(2L), path, mode = "append")
    // a missing EARLIER version (v0 gone, v1 present) breaks replay
    assert(new java.io.File(s"$path/_delta_log/${"%020d".format(0L)}.json").delete())
    val e = intercept[IllegalArgumentException] {
      PortableDelta.snapshot(spark.sessionState.newHadoopConf(), path)
    }
    assert(e.getMessage.contains("non-contiguous"))
  }

  test("writeStac carries geo metadata as table properties AND parquet footers") {
    val path = tmp()
    val items = Normalize(StacJsonReader.read(
      spark, Seq(SparkSpec.resource("/data/naip-pc.json"))))
    PortableDelta.writeStac(items, path)
    val snap = PortableDelta.snapshot(spark.sessionState.newHadoopConf(), path)
    assert(snap.configuration.contains("geo") &&
      snap.configuration.contains("stac-geoparquet"))
    // the same metadata rides each part file's footer (K1's born-with seam)
    val conf = new org.apache.hadoop.conf.Configuration()
    snap.files.foreach { f =>
      val kv = GeoParquetWriter.readFooterMetadata(conf, s"$path/${f.path}")
      assert(kv.contains("geo") && kv.contains("stac-geoparquet"))
    }
    val back = PortableDelta.readTable(spark, path)
    assert(back.count() == items.count())
    assert(back.schema == snap.schema)
  }

  test("checkpoint: spec-named parquet + _last_checkpoint, replay survives log truncation") {
    val path = tmp()
    PortableDelta.write(df(1L, 2L), path, properties = Map("k" -> "v"))
    PortableDelta.write(df(3L), path, mode = "append")
    PortableDelta.write(df(10L, 11L), path, mode = "overwrite")
    val cv = PortableDelta.checkpoint(spark, path)
    assert(cv == 2)
    val ckpt = new java.io.File(s"$path/_delta_log/${"%020d".format(2L)}.checkpoint.parquet")
    assert(ckpt.isFile, "checkpoint must be ONE file at the spec name")
    val lc = new java.io.File(s"$path/_delta_log/_last_checkpoint")
    assert(lc.isFile)
    val lcNode = mapper.readTree(scala.io.Source.fromFile(lc).mkString)
    assert(lcNode.get("version").asLong() == 2 && lcNode.get("size").asLong() > 0)
    // checkpoint rows carry the spec's FULL action schema: readers that
    // require the remove/txn columns (older delta-rs, DuckDB delta) must
    // find them, null-typed — not just the columns this writer populates
    val rows = spark.read.parquet(ckpt.getPath)
    assert(rows.columns.sorted.toSeq == Seq("add", "metaData", "protocol", "remove", "txn"))
    assert(rows.filter(col("protocol").isNotNull).count() == 1)
    assert(rows.filter(col("metaData").isNotNull).count() == 1)
    assert(rows.filter(col("add").isNotNull).count() > 0)
    assert(rows.filter(col("remove").isNotNull || col("txn").isNotNull).count() == 0,
      "remove/txn are shape-only in our checkpoints: no row populates them")
    // truncate the JSON tail: state must survive on checkpoint alone
    val removed = PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    assert(removed == 3, s"all three subsumed commits should go, removed $removed")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == 2 && snap.configuration("k") == "v")
    assert(PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L))
    // the JSON-only reader points at the engine overload, not a puzzle
    val e = intercept[IllegalArgumentException] {
      PortableDelta.snapshot(spark.sessionState.newHadoopConf(), path)
    }
    assert(e.getMessage.contains("checkpoint-truncated"))
    // commits continue AFTER the truncation: append lands as v3 on top
    PortableDelta.write(df(12L), path, mode = "append")
    assert(PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L, 12L))
  }

  // ------------------------------------------------- external-shaped logs
  // The reference hands Delta writes to a full engine (`_delta_lake.py:
  // 28-71`) and assumes a full engine on the read side; our portable
  // reader must load logs OTHER writers produce. These cases synthesize
  // the external shapes a conformant engine emits — multi-part
  // checkpoints, tombstones for never-added paths, action types beyond
  // our writer's vocabulary — and the protocol gate that refuses tables
  // needing reader features we don't implement.

  test("interop: multi-part checkpoint (<v>.checkpoint.<i>.<n>.parquet) replays") {
    val path = tmp()
    PortableDelta.write(df(1L, 2L), path, properties = Map("k" -> "v"))
    PortableDelta.write(df(3L), path, mode = "append")
    PortableDelta.write(df(10L, 11L), path, mode = "overwrite")
    val cv = PortableDelta.checkpoint(spark, path)
    val logDir = s"$path/_delta_log"
    val single = new java.io.File(s"$logDir/${"%020d".format(cv)}.checkpoint.parquet")
    // shard the single-file checkpoint into the spec's multi-part layout:
    // part 1 = protocol+metaData rows, part 2 = add rows (an external
    // writer shards by row ranges; any partition of the rows is legal)
    val rows = spark.read.parquet(single.getPath)
    def moveSinglePart(src: org.apache.spark.sql.DataFrame, dest: java.io.File): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("ckpt-part").toString + "/p"
      src.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
      assert(part.renameTo(dest))
    }
    moveSinglePart(rows.filter(col("add").isNull),
      new java.io.File(f"$logDir/$cv%020d.checkpoint.${1}%010d.${2}%010d.parquet"))
    moveSinglePart(rows.filter(col("add").isNotNull),
      new java.io.File(f"$logDir/$cv%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    assert(single.delete())
    val lc = new java.io.File(s"$logDir/_last_checkpoint")
    val lcNode = mapper.readTree(scala.io.Source.fromFile(lc).mkString)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    lcNode.put("parts", 2)
    java.nio.file.Files.write(lc.toPath,
      lcNode.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the raw rewrite bypassed Hadoop's LocalFileSystem, leaving OUR
    // stale .crc shadow behind; an external writer's log has no such
    // sidecar, so drop it to keep the synthesized shape faithful
    new java.io.File(s"$logDir/._last_checkpoint.crc").delete()
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == cv && snap.configuration("k") == "v")
    assert(PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L))
    // a missing shard is an error, not a silent partial replay
    assert(new java.io.File(f"$logDir/$cv%020d.checkpoint.${2}%010d.${2}%010d.parquet").delete())
    val e = intercept[IllegalArgumentException] { PortableDelta.snapshot(spark, path) }
    assert(e.getMessage.contains("missing"))
  }

  test("interop: remove for a never-added path is a legal no-op tombstone") {
    val path = tmp()
    PortableDelta.write(df(1L, 2L), path)
    val conf = spark.sessionState.newHadoopConf()
    val tomb = mapper.createObjectNode()
    tomb.putObject("remove").put("path", "part-ghost.parquet")
      .put("deletionTimestamp", 1L).put("dataChange", true)
    PortableDelta.commit(conf, path, 1, Seq(tomb))
    val snap = PortableDelta.snapshot(conf, path)
    assert(snap.version == 1 && snap.files.size > 0)
    assert(PortableDelta.readTable(spark, path)
      .select(sum(col("id"))).collect().head.getLong(0) == 3L)
  }

  test("interop: unknown action types (txn/domainMetadata/future) are ignored") {
    val path = tmp()
    PortableDelta.write(df(1L), path)
    val conf = spark.sessionState.newHadoopConf()
    val txn = mapper.createObjectNode()
    txn.putObject("txn").put("appId", "ext-app").put("version", 7L)
    val dom = mapper.createObjectNode()
    dom.putObject("domainMetadata").put("domain", "ext.domain")
      .put("configuration", "{}").put("removed", false)
    val future = mapper.createObjectNode()
    future.putObject("someFutureAction").put("x", 1)
    PortableDelta.commit(conf, path, 1, Seq(txn, dom, future))
    // forward-compatibility rule: unknown action NAMES never fail a read —
    // feature gating lives in the protocol action alone
    val snap = PortableDelta.snapshot(conf, path)
    assert(snap.version == 1)
    assert(PortableDelta.readTable(spark, path).count() == 1)
  }

  test("interop: reader features beyond minReaderVersion 1 are refused BY NAME") {
    val path = tmp()
    PortableDelta.write(df(1L), path)
    val conf = spark.sessionState.newHadoopConf()
    val proto = mapper.createObjectNode()
    val p = proto.putObject("protocol")
    p.put("minReaderVersion", 3).put("minWriterVersion", 7)
    p.putArray("readerFeatures").add("deletionVectors").add("columnMapping")
    PortableDelta.commit(conf, path, 1, Seq(proto))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.snapshot(conf, path)
    }
    assert(e.getMessage.contains("reader version 3"))
    assert(e.getMessage.contains("deletionVectors") && e.getMessage.contains("columnMapping"),
      s"rejection must NAME the unsupported features: ${e.getMessage}")
  }

  test("txn actions: idempotent writes, watermark survives checkpoint truncation") {
    val path = tmp()
    val v0 = PortableDelta.write(df(1L, 2L), path, mode = "append", txn = Some(("app", 0L)))
    val v1 = PortableDelta.write(df(3L), path, mode = "append", txn = Some(("app", 1L)))
    assert(v0 == 0 && v1 == 1)
    val conf = spark.sessionState.newHadoopConf()
    assert(PortableDelta.snapshot(conf, path).txns == Map("app" -> 1L))
    // re-delivery of batch 1 (and any older batch) is a committed-txn
    // no-op: same version back, nothing staged or appended
    val nBefore = PortableDelta.readTable(spark, path).count()
    assert(PortableDelta.write(df(3L), path, mode = "append", txn = Some(("app", 1L))) == 1)
    assert(PortableDelta.write(df(1L, 2L), path, mode = "append", txn = Some(("app", 0L))) == 1)
    assert(PortableDelta.readTable(spark, path).count() == nBefore)
    assert(PortableDelta.snapshot(conf, path).version == 1)
    // a SECOND app's watermark is independent
    PortableDelta.write(df(9L), path, mode = "append", txn = Some(("other", 5L)))
    val snap2 = PortableDelta.snapshot(conf, path)
    assert(snap2.txns == Map("app" -> 1L, "other" -> 5L))
    // the watermark must survive checkpoint + JSON-tail truncation (the
    // spec stores the latest txn per appId in the checkpoint parquet)
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(conf, path)
    val replayed = PortableDelta.snapshot(spark, path)
    assert(replayed.txns == Map("app" -> 1L, "other" -> 5L),
      s"txn watermarks lost in checkpoint replay: ${replayed.txns}")
    // and stays idempotent across the truncation boundary
    val n2 = PortableDelta.readTable(spark, path).count()
    // post-truncation writes consult the checkpoint-aware snapshot
    val eNoEngine = intercept[IllegalArgumentException] {
      PortableDelta.snapshot(conf, path)
    }
    assert(eNoEngine.getMessage.contains("checkpoint-truncated"))
    assert(PortableDelta.write(df(9L), path.toString, mode = "append",
      txn = Some(("other", 4L))) == replayed.version)
    assert(PortableDelta.readTable(spark, path).count() == n2)
  }

  test("a foreign file in the table directory is never committed") {
    // write() discovers its output from a job-scoped staging dir, not a
    // before/after listing diff — a file landing in the table root during
    // the write window (concurrent writer, leftover staging) must stay
    // invisible to the log, not become silent table data
    val path = tmp()
    PortableDelta.write(df(1L, 2L), path)
    val existing = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    java.nio.file.Files.copy(existing.toPath,
      java.nio.file.Paths.get(path, "stray-foreign-file.parquet"))
    PortableDelta.write(df(3L), path, mode = "append")
    val snap = PortableDelta.snapshot(spark.sessionState.newHadoopConf(), path)
    assert(!snap.files.exists(_.path.contains("stray")),
      s"foreign file leaked into the log: ${snap.files.map(_.path)}")
    assert(PortableDelta.readTable(spark, path)
      .select(sum(col("id"))).collect().head.getLong(0) == 6L,
      "foreign rows must not appear in the table read")
  }

  test("time travel: versionAsOf replays the state that WAS current; history lists commits") {
    val path = tmp()
    PortableDelta.write(df(1L, 2L), path)                       // v0
    PortableDelta.write(df(3L), path, mode = "append")          // v1
    PortableDelta.write(df(10L, 11L), path, mode = "overwrite") // v2
    def idsAt(v: Long) = PortableDelta.readTable(spark, path, v)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(idsAt(0) == Seq(1L, 2L))
    assert(idsAt(1) == Seq(1L, 2L, 3L))
    assert(idsAt(2) == Seq(10L, 11L))
    val e = intercept[IllegalArgumentException](PortableDelta.snapshotAt(spark, path, 3))
    assert(e.getMessage.contains("exceeds"))
    val h = PortableDelta.history(spark.sessionState.newHadoopConf(), path)
    assert(h.map(_._1) == Seq(2L, 1L, 0L), "history is newest first")
    assert(h.head._2.contains("overwrite") && h.last._2.contains("CREATE"))
    assert(h.forall(_._3 > 0), "commitInfo timestamps present")
    // checkpoint + truncation: the checkpointed version stays travel-able
    // (checkpoint seed), older versions are gone and the error SAYS so
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    assert(idsAt(2) == Seq(10L, 11L))
    val e2 = intercept[IllegalArgumentException](PortableDelta.snapshotAt(spark, path, 1))
    assert(e2.getMessage.contains("not reconstructable"))
    // appends after truncation remain travel-able from the checkpoint seed
    PortableDelta.write(df(12L), path, mode = "append")          // v3
    assert(idsAt(2) == Seq(10L, 11L) && idsAt(3) == Seq(10L, 11L, 12L))
  }

  test("DeltaSink.write falls back to the portable log when the jar is absent") {
    assume(!DeltaSink.available)
    val path = tmp()
    val items = Normalize(StacJsonReader.read(
      spark, Seq(SparkSpec.resource("/data/naip-pc.json"))))
    DeltaSink.write(items, path)
    val snap = PortableDelta.snapshot(spark.sessionState.newHadoopConf(), path)
    assert(snap.configuration.contains("geo"))
    assert(PortableDelta.readTable(spark, path).count() == items.count())
  }
}
