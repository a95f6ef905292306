package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
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
  * multi-writer), no checkpoint compaction (replay is O(commits) —
  * fine for the bounded-commit sink shape; long-lived tables should be
  * maintained by a full Delta engine, which reads these logs as-is). */
object PortableDelta {

  /** Pinned protocol: the base feature set this writer emits needs
    * nothing newer (no column mapping, no deletion vectors). */
  val MinReaderVersion = 1
  val MinWriterVersion = 2

  final case class AddFile(path: String, size: Long, modificationTime: Long)
  final case class Snapshot(
      version: Long,
      minReaderVersion: Int,
      minWriterVersion: Int,
      tableId: String,
      schema: StructType,
      configuration: Map[String, String],
      files: Seq[AddFile])

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
    * entries (the K1 seam); empty uses stock parquet. */
  def write(df: DataFrame, path: String,
            properties: Map[String, String] = Map.empty,
            mode: String = "error",
            footerKv: Map[String, String] = Map.empty): Long = {
    require(Set("error", "append", "overwrite").contains(mode),
      s"mode must be error|append|overwrite, got $mode")
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val prior = currentSnapshot(conf, path)
    require(mode != "error" || prior.isEmpty,
      s"Delta table already exists at $path (version ${prior.map(_.version).orNull}); " +
        "use mode=append or mode=overwrite")
    prior.filter(_ => mode == "append").foreach { s =>
      require(DataType.equalsIgnoreNullability(s.schema, df.schema),
        s"append schema mismatch at $path:\n table: ${s.schema.simpleString}\n " +
          s"batch: ${df.schema.simpleString}")
    }
    // new data files = listing diff around an append-mode write: Spark
    // part filenames embed a per-job UUID, so concurrent/sequential jobs
    // never collide and the diff is exactly this job's committed output
    val before = dataFiles(conf, path).map(_.getPath.getName).toSet
    val w = df.write.mode("append")
    val writer =
      if (footerKv.isEmpty) w.format("parquet")
      else footerKv.foldLeft(w.format("geoparquet")) { case (b, (k, v)) =>
        b.option(GeoParquetFileFormat.OptionPrefix + k, v)
      }
    writer.save(path)
    val added = dataFiles(conf, path).filterNot(f => before(f.getPath.getName))
    val version = prior.map(_.version + 1).getOrElse(0L)
    val now = System.currentTimeMillis()

    val actions = Seq.newBuilder[JsonNode]
    actions += commitInfo(now, if (prior.isEmpty) "CREATE TABLE AS SELECT"
      else if (mode == "overwrite") "WRITE (overwrite)" else "WRITE (append)")
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
    * actions, last protocol/metaData win, adds minus removes by path. */
  def snapshot(conf: Configuration, path: String): Snapshot =
    currentSnapshot(conf, path).getOrElse(
      throw new IllegalArgumentException(s"no Delta table at $path (no _delta_log)"))

  /** Read the table's CURRENT version: exactly the log's live files with
    * the logged schema — files on disk but removed (or never committed)
    * in the log are invisible, the property that makes the log, not the
    * directory listing, the source of truth. */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val snap = snapshot(spark.sessionState.newHadoopConf(), path)
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else
      spark.read.schema(snap.schema)
        .parquet(snap.files.map(f => s"$path/${f.path}"): _*)
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

  private def dataFiles(conf: Configuration, path: String): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
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
    if (versioned.isEmpty) return None
    require(versioned.map(_._1) == (0L until versioned.size.toLong),
      s"non-contiguous Delta log at $dir: versions ${versioned.map(_._1).mkString(",")}")

    var readerV = MinReaderVersion; var writerV = MinWriterVersion
    var tableId = ""; var schemaJson = ""
    var configuration = Map.empty[String, String]
    val live = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    versioned.foreach { case (_, p) =>
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("protocol")) {
          readerV = node.get("protocol").get("minReaderVersion").asInt()
          writerV = node.get("protocol").get("minWriterVersion").asInt()
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
    }
    require(readerV <= MinReaderVersion,
      s"table at $path requires reader version $readerV; this portable reader supports $MinReaderVersion")
    require(schemaJson.nonEmpty, s"Delta log at $dir has no metaData action")
    Some(Snapshot(versioned.last._1, readerV, writerV, tableId,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      configuration, live.values.toSeq))
  }
}
