package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** K3 without the jar: a minimal, PORTABLE Delta Lake transaction-log
  * writer/reader over the open Delta protocol (the `_delta_log` format
  * is a published spec: newline-delimited JSON actions per commit,
  * 20-digit zero-padded version filenames, last-metaData-wins replay).
  * Reference capability: `stac_geoparquet/arrow/_delta_lake.py:28-71`
  * (write_deltalake with the `geo` metadata on the table), round-tripped
  * in `tests/test_delta_lake.py:38-54`.
  *
  * This writer emits real Delta tables — `protocol` (1/2), `metaData`
  * (Spark schema JSON, table properties), `add`/`remove` actions with
  * filesystem-true sizes — that any Delta reader (delta-spark,
  * delta-rs, DuckDB delta) can load; [[DeltaSinkSpec]] cross-checks the
  * layout with delta-spark wherever that jar exists. Data files are
  * written through the normal Spark parquet committer (born with the
  * geo footer via [[GeoParquetFileFormat]] on the STAC face), so the
  * 100-TB write path is the stock distributed one; only the O(files)
  * commit-JSON append is driver-side, exactly like Delta itself.
  *
  * Scope (documented, deliberate): single-writer commits via
  * atomic-rename put-if-absent (the Delta storage contract for
  * filesystems with atomic rename; no LogStore coordination for S3
  * multi-writer). Checkpoint compaction IS supported ([[checkpoint]]
  * writes the spec's `<v>.checkpoint.parquet` + `_last_checkpoint`,
  * [[cleanupLog]] truncates the JSON tail behind it), so replay cost
  * is O(commits-since-checkpoint) — the same maintenance story as a
  * full Delta engine, which reads these logs and checkpoints as-is. */
object PortableDelta {

  /** Pinned protocol: the base feature set this writer emits needs
    * nothing newer (no column mapping, no deletion vectors). */
  val MinReaderVersion = 1
  val MinWriterVersion = 2

  final case class AddFile(path: String, size: Long, modificationTime: Long)
  /** `txns` is the spec's per-appId transaction watermark (latest `txn`
    * action per application id) — the idempotent-streaming-writes
    * contract: a writer that tags each commit with {appId, version}
    * can detect an already-committed batch after a crash. */
  final case class Snapshot(
      version: Long,
      minReaderVersion: Int,
      minWriterVersion: Int,
      tableId: String,
      schema: StructType,
      configuration: Map[String, String],
      files: Seq[AddFile],
      txns: Map[String, Long] = Map.empty)

  @transient private lazy val mapper = new ObjectMapper()

  /** Write `df` into the Delta table at `path`.
    *
    * Modes: `error` (table must not exist), `append` (new add actions;
    * schema must equal the table's), `overwrite` (logical overwrite:
    * remove actions for every live file + adds — prior data files stay
    * on disk for earlier-version readers, the Delta semantic, NOT a
    * directory wipe).
    *
    * `footerKv` non-empty routes the data write through the
    * `geoparquet` format so part files are born with those footer
    * entries (the K1 seam); empty uses stock parquet.
    *
    * `txn` = Some((appId, version)) tags the commit with the spec's
    * transaction-identifier action AND makes the write IDEMPOTENT per
    * (appId, version): if the table has already committed a txn for
    * `appId` at `version` or later, the call is a no-op returning the
    * current table version — nothing is staged, written, or committed.
    * This is the Delta idempotent-streaming-writes pattern: a
    * foreachBatch sink passes its batchId and a crash-replayed batch
    * cannot double-append. */
  def write(df: DataFrame, path: String,
            properties: Map[String, String] = Map.empty,
            mode: String = "error",
            footerKv: Map[String, String] = Map.empty,
            txn: Option[(String, Long)] = None): Long = {
    require(Set("error", "append", "overwrite").contains(mode),
      s"mode must be error|append|overwrite, got $mode")
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val prior =
      if (lastCheckpointVersion(conf, path).isDefined)
        Some(snapshot(df.sparkSession, path)) // checkpoint-truncated log
      else currentSnapshot(conf, path)
    require(mode != "error" || prior.isEmpty,
      s"Delta table already exists at $path (version ${prior.map(_.version).orNull}); " +
        "use mode=append or mode=overwrite")
    // idempotence gate: an (appId, version) the log already carries —
    // at this version or newer — is a re-delivered batch; skip BEFORE
    // any data lands
    txn.foreach { case (appId, v) =>
      prior.foreach { p =>
        if (p.txns.get(appId).exists(_ >= v)) return p.version
      }
    }
    prior.filter(_ => mode == "append").foreach { s =>
      require(DataType.equalsIgnoreNullability(s.schema, df.schema),
        s"append schema mismatch at $path:\n table: ${s.schema.simpleString}\n " +
          s"batch: ${df.schema.simpleString}")
    }
    // this job's output is discovered from a JOB-SCOPED staging directory,
    // not a before/after listing diff of the table root: a diff would
    // silently commit any file that lands in the window (a concurrent
    // writer, leftover staging output) as this version's data. The part
    // files keep their committer-given names (unique via the per-job
    // UUID), and the move is an atomic-rename metadata op on filesystems
    // honoring the same Delta storage contract commit() already assumes.
    val rootP = new Path(path)
    val fs = rootP.getFileSystem(conf)
    val staging = new Path(rootP, s".staging-${java.util.UUID.randomUUID()}")
    val w = df.write.mode("append")
    val writer =
      if (footerKv.isEmpty) w.format("parquet")
      else footerKv.foldLeft(w.format("geoparquet")) { case (b, (k, v)) =>
        b.option(GeoParquetFileFormat.OptionPrefix + k, v)
      }
    writer.save(staging.toString)
    val parts = fs.listStatus(staging).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    val added = parts.map { st =>
      val dest = new Path(rootP, st.getPath.getName)
      require(!fs.exists(dest), s"part-file collision at $dest — staging move aborted")
      require(fs.rename(st.getPath, dest), s"could not move ${st.getPath} to $dest")
      fs.getFileStatus(dest)
    }
    fs.delete(staging, true)
    val version = prior.map(_.version + 1).getOrElse(0L)
    val now = System.currentTimeMillis()

    val actions = Seq.newBuilder[JsonNode]
    actions += commitInfo(now, if (prior.isEmpty) "CREATE TABLE AS SELECT"
      else if (mode == "overwrite") "WRITE (overwrite)" else "WRITE (append)")
    txn.foreach { case (appId, v) =>
      val r = mapper.createObjectNode()
      val t = r.putObject("txn")
      t.put("appId", appId); t.put("version", v); t.put("lastUpdated", now)
      actions += r
    }
    if (prior.isEmpty) {
      actions += protocolAction()
      actions += metaDataAction(java.util.UUID.randomUUID().toString,
        df.schema, properties, now)
    } else if (mode == "overwrite") {
      // overwrite re-states metaData (schema/properties may change) but
      // keeps the table id — the replace-table shape
      actions += metaDataAction(prior.get.tableId, df.schema,
        if (properties.nonEmpty) properties else prior.get.configuration, now)
      prior.get.files.foreach { f =>
        val r = mapper.createObjectNode()
        val b = r.putObject("remove")
        b.put("path", f.path); b.put("deletionTimestamp", now)
        b.put("dataChange", true)
        actions += r
      }
    }
    added.foreach { f =>
      val r = mapper.createObjectNode()
      val b = r.putObject("add")
      b.put("path", f.getPath.getName)
      b.putObject("partitionValues")
      b.put("size", f.getLen)
      b.put("modificationTime", f.getModificationTime)
      b.put("dataChange", true)
      actions += r
    }
    commit(conf, path, version, actions.result())
    version
  }

  /** The K3 face: STAC table → Delta table carrying the `geo` /
    * `stac-geoparquet` metadata BOTH as table properties (what
    * `write_deltalake(..., schema.metadata)` persists; readable via
    * `SHOW TBLPROPERTIES` in any Delta engine) and in each part file's
    * parquet footer (so files exported from the table remain valid
    * GeoParquet on their own). */
  def writeStac(df: DataFrame, path: String,
                schemaVersion: String = StacSchema.DefaultGeoParquetVersion,
                collectionsJson: Option[String] = None,
                mode: String = "error"): Long = {
    val hasProjGeometry = df.schema.fields.exists(f =>
      f.name == "proj:geometry" &&
        f.dataType == org.apache.spark.sql.types.BinaryType)
    val kv = Map(
      "geo" -> StacSchema.geoMetadata(schemaVersion, hasProjGeometry),
      "stac-geoparquet" -> StacSchema.stacGeoParquetMetadata(collectionsJson))
    write(df, path, properties = kv, mode = mode, footerKv = kv)
  }

  /** Replay the log: contiguous versions from 0, newline-delimited JSON
    * actions, last protocol/metaData win, adds minus removes by path.
    * JSON-only — on a checkpoint-truncated log this fails with a pointer
    * to the SparkSession overload (reading the checkpoint parquet needs
    * an engine). */
  def snapshot(conf: Configuration, path: String): Snapshot =
    currentSnapshot(conf, path).getOrElse(
      throw new IllegalArgumentException(s"no Delta table at $path (no _delta_log)"))

  /** Checkpoint-aware replay: start from `_last_checkpoint`'s parquet
    * state when present (single-file or the spec's multi-part
    * `<v>.checkpoint.<i>.<n>.parquet` layout external writers produce),
    * then apply the JSON commits after it. */
  def snapshot(spark: SparkSession, path: String): Snapshot = {
    val conf = spark.sessionState.newHadoopConf()
    lastCheckpointRef(conf, path) match {
      case None => snapshot(conf, path)
      case Some(ref) => checkpointSnapshot(spark, path, ref)
    }
  }

  /** Read the table's CURRENT version: exactly the log's live files with
    * the logged schema — files on disk but removed (or never committed)
    * in the log are invisible, the property that makes the log, not the
    * directory listing, the source of truth. */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val snap = snapshot(spark, path)
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else
      spark.read.schema(snap.schema)
        .parquet(snap.files.map(f => s"$path/${f.path}"): _*)
  }

  /** Write the spec's checkpoint for the CURRENT version V:
    * `_delta_log/<V padded>.checkpoint.parquet` — one row per live
    * action with the protocol / metaData / add struct columns a Delta
    * reader expects — plus the `_last_checkpoint` pointer file. Replay
    * after this is O(commits since V); pair with [[cleanupLog]] to
    * actually truncate the JSON tail. Returns V. */
  def checkpoint(spark: SparkSession, path: String): Long = {
    import org.apache.spark.sql.functions.{lit, map_from_arrays, array, struct, typedLit}
    val conf = spark.sessionState.newHadoopConf()
    val snap = snapshot(spark, path)
    val s = spark; import s.implicits._
    val emptyMap = typedLit(Map.empty[String, String])
    val protocolDf = Seq(1).toDF("x").select(
      struct(lit(snap.minReaderVersion).as("minReaderVersion"),
        lit(snap.minWriterVersion).as("minWriterVersion")).as("protocol"),
      lit(null).cast("struct<id:string,format:struct<provider:string,options:map<string,string>>," +
        "schemaString:string,partitionColumns:array<string>," +
        "configuration:map<string,string>,createdTime:bigint>").as("metaData"),
      lit(null).cast("struct<path:string,partitionValues:map<string,string>," +
        "size:bigint,modificationTime:bigint,dataChange:boolean>").as("add"))
    val metaDf = Seq(1).toDF("x").select(
      lit(null).cast("struct<minReaderVersion:int,minWriterVersion:int>").as("protocol"),
      struct(lit(snap.tableId).as("id"),
        struct(lit("parquet").as("provider"), emptyMap.as("options")).as("format"),
        lit(snap.schema.json).as("schemaString"),
        array().cast("array<string>").as("partitionColumns"),
        typedLit(snap.configuration).as("configuration"),
        lit(System.currentTimeMillis()).as("createdTime")).as("metaData"),
      lit(null).cast("struct<path:string,partitionValues:map<string,string>," +
        "size:bigint,modificationTime:bigint,dataChange:boolean>").as("add"))
    val addsDf = snap.files.map(f => (f.path, f.size, f.modificationTime))
      .toDF("p", "sz", "mt").select(
        lit(null).cast("struct<minReaderVersion:int,minWriterVersion:int>").as("protocol"),
        lit(null).cast("struct<id:string,format:struct<provider:string,options:map<string,string>>," +
          "schemaString:string,partitionColumns:array<string>," +
          "configuration:map<string,string>,createdTime:bigint>").as("metaData"),
        struct($"p".as("path"), emptyMap.as("partitionValues"),
          $"sz".as("size"), $"mt".as("modificationTime"),
          lit(true).as("dataChange")).as("add"))
    // the per-appId streaming watermarks must survive log truncation —
    // the spec stores the latest txn action per appId in the checkpoint
    val txnType = "struct<appId:string,version:bigint,lastUpdated:bigint>"
    val txnsDf = snap.txns.toSeq.map { case (app, v) => (app, v) }
      .toDF("app", "v").select(
        lit(null).cast("struct<minReaderVersion:int,minWriterVersion:int>").as("protocol"),
        lit(null).cast("struct<id:string,format:struct<provider:string,options:map<string,string>>," +
          "schemaString:string,partitionColumns:array<string>," +
          "configuration:map<string,string>,createdTime:bigint>").as("metaData"),
        lit(null).cast("struct<path:string,partitionValues:map<string,string>," +
          "size:bigint,modificationTime:bigint,dataChange:boolean>").as("add"),
        struct($"app".as("appId"), $"v".as("version"),
          lit(null).cast("bigint").as("lastUpdated")).as("txn"))
    // the full action schema: some conformant readers (older delta-rs,
    // DuckDB delta) expect the remove/txn columns to exist even when no
    // row populates them — emit them null-typed so the checkpoint parquet
    // matches the spec's action shape, not just the columns we use
    val all = protocolDf.unionByName(metaDf).unionByName(addsDf)
      .withColumn("txn", lit(null).cast(txnType))
      .unionByName(txnsDf)
      .withColumn("remove", lit(null).cast(
        "struct<path:string,deletionTimestamp:bigint,dataChange:boolean," +
          "extendedFileMetadata:boolean,partitionValues:map<string,string>,size:bigint>"))
    // Spark writes a directory; the spec wants ONE file at the exact
    // name — write single-part to a temp dir and move the part file in
    val tmp = new Path(logDir(path), s".ckpt-tmp-${java.util.UUID.randomUUID()}")
    all.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val fs = tmp.getFileSystem(conf)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    val target = new Path(logDir(path), f"${snap.version}%020d.checkpoint.parquet")
    fs.delete(target, false)
    require(fs.rename(part, target), s"could not move checkpoint into place at $target")
    fs.delete(tmp, true)
    val lc = new Path(logDir(path), "_last_checkpoint")
    val out = fs.create(lc, true)
    try out.write(
      s"""{"version":${snap.version},"size":${2 + snap.files.size + snap.txns.size}}""".getBytes("UTF-8"))
    finally out.close()
    snap.version
  }

  /** Truncate the JSON tail behind the checkpoint: delete commit files
    * with version ≤ the `_last_checkpoint` version (they are fully
    * subsumed by the checkpoint parquet — the Delta maintenance pass).
    * No-op without a checkpoint. Returns the number of files removed. */
  def cleanupLog(conf: Configuration, path: String): Int =
    lastCheckpointVersion(conf, path) match {
      case None => 0
      case Some(cv) =>
        val dir = logDir(path)
        val fs = dir.getFileSystem(conf)
        val old = fs.listStatus(dir).toSeq
          .map(_.getPath)
          .filter(p => p.getName.matches("\\d{20}\\.json") &&
            p.getName.stripSuffix(".json").toLong <= cv)
        old.foreach(p => fs.delete(p, false))
        old.size
    }

  /** `_last_checkpoint` content: version plus the optional `parts` count
    * external writers use for multi-part checkpoints. */
  private final case class CheckpointRef(version: Long, parts: Option[Int])

  private def lastCheckpointRef(conf: Configuration, path: String): Option[CheckpointRef] = {
    val lc = new Path(logDir(path), "_last_checkpoint")
    val fs = lc.getFileSystem(conf)
    if (!fs.exists(lc)) None
    else {
      val in = fs.open(lc)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val node = mapper.readTree(txt)
      Some(CheckpointRef(node.get("version").asLong(),
        Option(node.get("parts")).map(_.asInt()).filter(_ > 0)))
    }
  }

  private def lastCheckpointVersion(conf: Configuration, path: String): Option[Long] =
    lastCheckpointRef(conf, path).map(_.version)

  /** Mutable replay accumulator shared by the JSON and checkpoint paths:
    * last protocol/metaData win, adds minus removes by path (a `remove`
    * for a never-added path is a legal no-op — external logs carry such
    * tombstones), latest txn per appId (the idempotent-streaming
    * watermark), and every action key this reader does not understand
    * (`cdc`, `domainMetadata`, commitInfo variants, future ones) is
    * IGNORED, which is exactly the Delta forward-compatibility rule:
    * feature gating lives in `protocol`, not in action names. */
  private final class ReplayState(tablePath: String) {
    var readerV: Int = MinReaderVersion
    var writerV: Int = MinWriterVersion
    var readerFeatures: Seq[String] = Nil
    var tableId = ""; var schemaJson = ""
    var configuration: Map[String, String] = Map.empty
    val live: scala.collection.mutable.LinkedHashMap[String, AddFile] =
      scala.collection.mutable.LinkedHashMap.empty
    // spec: the LATEST txn action per appId wins (commits replay in
    // version order, so plain overwrite is the right merge)
    val txns: scala.collection.mutable.LinkedHashMap[String, Long] =
      scala.collection.mutable.LinkedHashMap.empty

    def applyJson(node: JsonNode): Unit = {
      if (node.has("txn")) {
        val t = node.get("txn")
        txns.put(t.get("appId").asText(), t.get("version").asLong())
      }
      if (node.has("protocol")) {
        val p = node.get("protocol")
        readerV = p.get("minReaderVersion").asInt()
        writerV = p.get("minWriterVersion").asInt()
        readerFeatures = Option(p.get("readerFeatures"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      }
      if (node.has("metaData")) {
        val m = node.get("metaData")
        tableId = m.get("id").asText()
        schemaJson = m.get("schemaString").asText()
        configuration = Option(m.get("configuration")).map(_.asInstanceOf[ObjectNode]
          .properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty)
      }
      if (node.has("add")) {
        val a = node.get("add")
        live.put(a.get("path").asText(),
          AddFile(a.get("path").asText(), a.get("size").asLong(),
            a.get("modificationTime").asLong()))
      }
      if (node.has("remove"))
        live.remove(node.get("remove").get("path").asText())
    }

    /** The protocol gate: reject tables needing features this portable
      * reader does not implement (column mapping, deletion vectors, ...)
      * with an error that NAMES them — never a silent wrong read. */
    def requireReadable(): Unit =
      require(readerV <= MinReaderVersion,
        s"table at $tablePath requires reader version $readerV" +
          (if (readerFeatures.nonEmpty)
            s" with reader features [${readerFeatures.mkString(", ")}]" else "") +
          s"; this portable reader supports version $MinReaderVersion" +
          " (no column mapping, no deletion vectors, no v2 checkpoints)")

    def toSnapshot(version: Long): Snapshot = {
      requireReadable()
      Snapshot(version, readerV, writerV, tableId,
        DataType.fromJson(schemaJson).asInstanceOf[StructType],
        configuration, live.values.toSeq, txns.toMap)
    }
  }

  /** Seed a ReplayState from the checkpoint parquet at `ref` (single-file
    * or the spec's multi-part `<v>.checkpoint.<i>.<n>.parquet` layout
    * external writers emit). */
  private def seedCheckpoint(spark: SparkSession, path: String,
                             ref: CheckpointRef, st: ReplayState): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val cv = ref.version
    val fs = logDir(path).getFileSystem(conf)
    val ckptFiles: Seq[Path] = ref.parts match {
      case None => Seq(new Path(logDir(path), f"$cv%020d.checkpoint.parquet"))
      case Some(n) => (1 to n).map(i =>
        new Path(logDir(path), f"$cv%020d.checkpoint.$i%010d.$n%010d.parquet"))
    }
    ckptFiles.foreach(p => require(fs.exists(p),
      s"_last_checkpoint points at $cv but $p is missing"))
    val rows = spark.read.parquet(ckptFiles.map(_.toString): _*).collect()
    rows.foreach { r =>
      val pi = r.fieldIndex("protocol")
      if (!r.isNullAt(pi)) {
        val p = r.getStruct(pi)
        st.readerV = p.getInt(p.fieldIndex("minReaderVersion"))
        st.writerV = p.getInt(p.fieldIndex("minWriterVersion"))
        if (p.schema != null && p.schema.fieldNames.contains("readerFeatures") &&
            !p.isNullAt(p.fieldIndex("readerFeatures")))
          st.readerFeatures = p.getSeq[String](p.fieldIndex("readerFeatures"))
      }
      val mi = r.fieldIndex("metaData")
      if (!r.isNullAt(mi)) {
        val m = r.getStruct(mi)
        st.tableId = m.getString(m.fieldIndex("id"))
        st.schemaJson = m.getString(m.fieldIndex("schemaString"))
        st.configuration = m.getMap[String, String](m.fieldIndex("configuration")).toMap
      }
      val ai = r.fieldIndex("add")
      if (!r.isNullAt(ai)) {
        val a = r.getStruct(ai)
        val p = a.getString(a.fieldIndex("path"))
        st.live.put(p, AddFile(p, a.getLong(a.fieldIndex("size")),
          a.getLong(a.fieldIndex("modificationTime"))))
      }
      // txn rows carry the per-appId streaming watermark across log
      // truncation (the spec stores the latest txn per appId in the
      // checkpoint); ours and external writers both emit them
      if (r.schema.fieldNames.contains("txn")) {
        val ti = r.fieldIndex("txn")
        if (!r.isNullAt(ti)) {
          val t = r.getStruct(ti)
          st.txns.put(t.getString(t.fieldIndex("appId")),
            t.getLong(t.fieldIndex("version")))
        }
      }
      // remove rows in a checkpoint are VACUUM tombstones, not state: live
      // files are exactly the add rows, so they (and cdc/unknown columns)
      // are deliberately not replayed
    }
    require(st.schemaJson.nonEmpty,
      s"checkpoint ${ckptFiles.head} carries no metaData row")
  }

  private def applyJsonCommit(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                              st: ReplayState): Unit = {
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    lines.filter(_.nonEmpty).foreach(line => st.applyJson(mapper.readTree(line)))
  }

  private def checkpointSnapshot(spark: SparkSession, path: String,
                                 ref: CheckpointRef): Snapshot = {
    val conf = spark.sessionState.newHadoopConf()
    val cv = ref.version
    val fs = logDir(path).getFileSystem(conf)
    val st = new ReplayState(path)
    seedCheckpoint(spark, path, ref, st)
    // JSON commits after the checkpoint (contiguous from cv+1, if any)
    val tail = fs.listStatus(logDir(path)).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches("\\d{20}\\.json"))
      .map(s => s.getPath.getName.stripSuffix(".json").toLong -> s.getPath)
      .filter(_._1 > cv).sortBy(_._1)
    require(tail.map(_._1) == (cv + 1 to cv + tail.size),
      s"non-contiguous Delta log after checkpoint $cv: ${tail.map(_._1).mkString(",")}")
    var version = cv
    tail.foreach { case (v, p) =>
      version = v
      applyJsonCommit(fs, p, st)
    }
    st.toSnapshot(version)
  }

  /** Time travel: the table state AS OF `versionAsOf` (the Delta
    * `versionAsOf` read). Replays JSON commits 0..v when they survive,
    * else seeds from a checkpoint at cv ≤ v and applies the JSON tail
    * (cv, v]; errors — naming what is reconstructable — when cleanupLog
    * has truncated past the requested version. */
  def snapshotAt(spark: SparkSession, path: String, versionAsOf: Long): Snapshot = {
    require(versionAsOf >= 0, s"versionAsOf must be >= 0, got $versionAsOf")
    val conf = spark.sessionState.newHadoopConf()
    val dir = logDir(path)
    val fs = dir.getFileSystem(conf)
    require(fs.exists(dir), s"no Delta table at $path (no _delta_log)")
    val jsons = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches("\\d{20}\\.json"))
      .map(s => s.getPath.getName.stripSuffix(".json").toLong -> s.getPath)
      .sortBy(_._1).toMap
    val current = (jsons.keySet ++ lastCheckpointVersion(conf, path)).maxOption
      .getOrElse(throw new IllegalArgumentException(s"empty Delta log at $dir"))
    require(versionAsOf <= current,
      s"versionAsOf $versionAsOf exceeds the current version $current of $path")
    val st = new ReplayState(path)
    val ckpt = lastCheckpointRef(conf, path).filter(_.version <= versionAsOf)
    val fromV: Long =
      if ((0L to versionAsOf).forall(jsons.contains)) 0L
      else ckpt match {
        case Some(ref) if ((ref.version + 1) to versionAsOf).forall(jsons.contains) =>
          seedCheckpoint(spark, path, ref, st)
          ref.version + 1
        case _ =>
          throw new IllegalArgumentException(
            s"version $versionAsOf of $path is not reconstructable: JSON log covers " +
              s"[${jsons.keySet.minOption.getOrElse(-1L)}, ${jsons.keySet.maxOption.getOrElse(-1L)}]" +
              ckpt.map(r => s", checkpoint at ${r.version}").getOrElse(", no checkpoint") +
              " (cleanupLog truncated past it)")
      }
    (fromV to versionAsOf).foreach(v => applyJsonCommit(fs, jsons(v), st))
    st.toSnapshot(versionAsOf)
  }

  /** Read the table AS OF a version — the files that were live then,
    * under the schema that was current then. */
  def readTable(spark: SparkSession, path: String, versionAsOf: Long): DataFrame = {
    val snap = snapshotAt(spark, path, versionAsOf)
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else
      spark.read.schema(snap.schema)
        .parquet(snap.files.map(f => s"$path/${f.path}"): _*)
  }

  /** DESCRIBE HISTORY analog: (version, operation, timestamp) per
    * surviving JSON commit, newest first, from the commitInfo actions.
    * Commits truncated by cleanupLog no longer appear — same as any
    * Delta engine after log cleanup. */
  def history(conf: Configuration, path: String): Seq[(Long, String, Long)] = {
    val dir = logDir(path)
    val fs = dir.getFileSystem(conf)
    require(fs.exists(dir), s"no Delta table at $path (no _delta_log)")
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches("\\d{20}\\.json"))
      .map(s => s.getPath.getName.stripSuffix(".json").toLong -> s.getPath)
      .sortBy(-_._1)
      .map { case (v, p) =>
        val in = fs.open(p)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        val ci = lines.filter(_.nonEmpty).map(mapper.readTree)
          .find(_.has("commitInfo")).map(_.get("commitInfo"))
        (v,
          ci.flatMap(c => Option(c.get("operation"))).map(_.asText()).getOrElse(""),
          ci.flatMap(c => Option(c.get("timestamp"))).map(_.asLong()).getOrElse(0L))
      }
  }

  // ---------------------------------------------------------------- internals

  private def logDir(path: String) = new Path(path, "_delta_log")

  private def versionFileName(v: Long) = f"$v%020d.json"

  private def commitInfo(ts: Long, op: String): JsonNode = {
    val r = mapper.createObjectNode()
    val b = r.putObject("commitInfo")
    b.put("timestamp", ts)
    b.put("operation", op)
    b.put("engineInfo", "graft-portable-delta")
    r
  }

  private def protocolAction(): JsonNode = {
    val r = mapper.createObjectNode()
    val b = r.putObject("protocol")
    b.put("minReaderVersion", MinReaderVersion)
    b.put("minWriterVersion", MinWriterVersion)
    r
  }

  private def metaDataAction(id: String, schema: StructType,
                             properties: Map[String, String], ts: Long): JsonNode = {
    val r = mapper.createObjectNode()
    val b = r.putObject("metaData")
    b.put("id", id)
    val fmt = b.putObject("format")
    fmt.put("provider", "parquet"); fmt.putObject("options")
    b.put("schemaString", schema.json)
    b.putArray("partitionColumns")
    val cfg = b.putObject("configuration")
    properties.foreach { case (k, v) => cfg.put(k, v) }
    b.put("createdTime", ts)
    r
  }

  /** Atomic put-if-absent commit: write the actions to a hidden temp
    * name in `_delta_log`, then rename to the version file. Rename onto
    * an existing destination fails on filesystems honoring the Delta
    * storage contract (HDFS, local) → a lost race surfaces as a clear
    * concurrent-commit error, never a clobbered log. */
  private[stac] def commit(conf: Configuration, path: String, version: Long,
                           actions: Seq[JsonNode]): Unit = {
    val dir = logDir(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val finalP = new Path(dir, versionFileName(version))
    require(!fs.exists(finalP), s"commit $version already exists at $finalP")
    val tmp = new Path(dir, s".tmp-${versionFileName(version)}-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try actions.foreach { a =>
      out.write(mapper.writeValueAsBytes(a)); out.write('\n')
    } finally out.close()
    if (!fs.rename(tmp, finalP)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent commit detected: $finalP exists; retry the write against the new version")
    }
  }

  private def currentSnapshot(conf: Configuration, path: String): Option[Snapshot] = {
    val dir = logDir(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return None
    val versioned = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.matches("\\d{20}\\.json"))
      .map(st => st.getPath.getName.stripSuffix(".json").toLong -> st.getPath)
      .sortBy(_._1)
    val truncated = " — this log is checkpoint-truncated; use snapshot(spark, path)"
    if (versioned.isEmpty) {
      require(lastCheckpointVersion(conf, path).isEmpty,
        s"Delta log at $dir has no JSON commits$truncated")
      return None
    }
    require(versioned.map(_._1) == (0L until versioned.size.toLong),
      s"non-contiguous Delta log at $dir: versions ${versioned.map(_._1).mkString(",")}" +
        (if (lastCheckpointVersion(conf, path).isDefined) truncated else ""))

    val st = new ReplayState(path)
    versioned.foreach { case (_, p) =>
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines.filter(_.nonEmpty).foreach(line => st.applyJson(mapper.readTree(line)))
    }
    require(st.schemaJson.nonEmpty, s"Delta log at $dir has no metaData action")
    Some(st.toSnapshot(versioned.last._1))
  }
}
