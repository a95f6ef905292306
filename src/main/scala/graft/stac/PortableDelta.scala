package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructField, StructType, TimestampNTZType}
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
  * Scope: commits publish through the [[GraftLogStore]] put-if-absent
  * seam — default atomic-rename (exact same-JVM, cross-process atomic
  * on rename-refusing filesystems, the Delta storage contract); object
  * stores without atomic rename (S3 multi-writer) plug a coordinated
  * implementation via `spark.graft.delta.logStore.impl`, the
  * delta-spark LogStore shape. Checkpoint compaction IS supported ([[checkpoint]]
  * writes the spec's `<v>.checkpoint.parquet` + `_last_checkpoint`,
  * [[cleanupLog]] truncates the JSON tail behind it), so replay cost
  * is O(commits-since-checkpoint) — the same maintenance story as a
  * full Delta engine, which reads these logs and checkpoints as-is. */
object PortableDelta
    extends DeltaDmlOps
    with DeltaChangeFeedOps
    with DeltaAlterOps
    with DeltaMaintenanceOps
    with DeltaCheckpointOps
    with DeltaChecksumOps {

  /** Pinned protocol: the base feature set this writer emits needs
    * nothing newer (no column mapping, no deletion vectors). The READER
    * additionally understands version-3 tables whose readerFeatures are
    * all in [[SupportedReaderFeatures]] — see [[DeletionVectors]]. */
  val MinReaderVersion = 1
  val MinWriterVersion = 2

  /** Reader features this portable reader implements beyond the base
    * protocol (Delta's table-features gate: a reader may open a
    * version-3 table iff it supports EVERY listed reader feature). */
  val SupportedReaderFeatures: Set[String] =
    Set("deletionVectors", "columnMapping", "v2Checkpoint", "timestampNtz",
      "vacuumProtocolCheck", "typeWidening", "variantType")

  /** Writer features this engine implements — the spec's WRITER gate:
    * a writer may commit to a version-7 table only if it implements
    * EVERY listed writer feature (an unknown feature may impose commit
    * obligations this engine cannot honor — e.g. files it must write,
    * invariants it must maintain). Every mutating verb checks this and
    * refuses BY NAME; reads are governed by the reader gate alone. */
  val SupportedWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "changeDataFeed",
    "generatedColumns", "columnMapping", "identityColumns",
    "deletionVectors", "v2Checkpoint", "timestampNtz", "inCommitTimestamp",
    "rowTracking", "domainMetadata", "clustering", "vacuumProtocolCheck",
    "allowColumnDefaults", "typeWidening", "variantType",
    "checkpointProtection", "collations", "icebergCompatV2")

  /** `delta.requireCheckpointProtectionBeforeVersion` — the
    * checkpointProtection feature's companion property: metadata cleanup
    * must not remove log entries (commits or checkpoints) below this
    * version unless the sweep truncates against a checkpoint AT or
    * BEYOND it (the spec's all-or-nothing rule for the protected
    * region). */
  val CheckpointProtectionProp = "delta.requireCheckpointProtectionBeforeVersion"

  private[stac] def protectionBoundary(cfg: Map[String, String]): Option[Long] =
    cfg.get(CheckpointProtectionProp)
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption).filter(_ > 0L)

  /** `delta.enableIcebergCompatV2` — the UniForm/Iceberg-compat dial.
    * When true (PROTOCOL.md "Iceberg Compatibility V2"), this engine
    * enforces the spec's writer obligations it can honor: column
    * mapping in `name`/`id` mode, the `numRecords` statistic on EVERY
    * committed add, no deletion vectors (Iceberg conversion has no DV
    * analog — row-level DV verbs refuse by name), and `icebergCompatV1`
    * never active alongside (V1 stays an unsupported feature — its
    * obligations differ and are not implemented). Enabling on an
    * existing table validates the live files first. */
  val IcebergV2Prop = "delta.enableIcebergCompatV2"

  private[stac] def icebergV2Enabled(cfg: Map[String, String]): Boolean =
    cfg.get(IcebergV2Prop).exists(_.trim.equalsIgnoreCase("true"))

  /** The commit-time obligations of an ACTIVE icebergCompatV2 table —
    * validated against the commit's effective configuration (a metaData
    * action in the commit overrides the prior table config, so the
    * CREATE/enable commit is checked too). One choke point covers every
    * verb: any add lacking `numRecords`, any add carrying a deletion
    * vector, or a non-name/id mapping mode refuses BEFORE the version
    * file is written. */
  private[stac] def requireIcebergCompatV2(path: String, actions: Seq[JsonNode],
                                           tableCfg: Map[String, String]): Unit = {
    val eff: Map[String, String] = actions.collectFirst {
      case n if n.has("metaData") && n.get("metaData").has("configuration") =>
        val c = n.get("metaData").get("configuration")
        c.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(tableCfg)
    if (!icebergV2Enabled(eff)) return
    val mode = eff.getOrElse("delta.columnMapping.mode", "none")
    require(mode == "name" || mode == "id",
      s"icebergCompatV2 on $path requires delta.columnMapping.mode " +
        s"'name' or 'id' (got '$mode') — refusing to commit")
    actions.filter(_.has("add")).foreach { n =>
      val a = n.get("add")
      val p = Option(a.get("path")).map(_.asText()).getOrElse("?")
      require(!a.has("deletionVector") || a.get("deletionVector").isNull,
        s"icebergCompatV2 on $path forbids deletion vectors " +
          s"(add $p carries one) — refusing to commit")
      val nr = Option(a.get("stats")).filterNot(_.isNull).map(_.asText())
        .flatMap { j =>
          try Option(mapper.readTree(j).get("numRecords")).filterNot(_.isNull)
          catch { case scala.util.control.NonFatal(_) => None }
        }
      require(nr.isDefined,
        s"icebergCompatV2 on $path requires the numRecords statistic on " +
          s"every add (missing on $p) — refusing to commit")
    }
    actions.collectFirst {
      case n if n.has("protocol") && n.get("protocol").has("writerFeatures") =>
        n.get("protocol").get("writerFeatures")
    }.foreach { wf =>
      require(!wf.elements().asScala.exists(_.asText() == "icebergCompatV1"),
        s"icebergCompatV2 on $path cannot coexist with icebergCompatV1 " +
          "in one protocol — refusing to commit")
    }
  }

  /** The writer gate ([[SupportedWriterFeatures]]). Legacy versions
    * (writer ≤ 6) imply only features this engine implements, so they
    * always pass. */
  private[stac] def requireWritable(snap: Snapshot, path: String): Unit =
    if (snap.minWriterVersion >= 7) {
      val unknown = snap.writerFeatures
        .filterNot(SupportedWriterFeatures.contains)
      require(unknown.isEmpty,
        s"table at $path requires writer feature(s) " +
          s"[${unknown.mkString(", ")}] this engine does not implement — " +
          "refusing to commit (reads remain available)")
    }

  /** Commit-conflict signal: the target version file appeared between
    * snapshot and rename — the loser of the put-if-absent race. write()
    * catches this and rebases (optimistic concurrency). */
  final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  /** The spec's deletionVectorDescriptor for an add action (storageType
    * "i" inline / "u" relative-uuid file / "p" absolute path). */
  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                                offset: Option[Int], sizeInBytes: Int,
                                cardinality: Long)

  /** `stats` is the spec's per-file column-statistics JSON (numRecords /
    * minValues / maxValues / nullCount) — the data-skipping substrate.
    * `partitionValues` is the spec's hive-partition map (column →
    * serialized value; null value = the hive default/null partition);
    * partitioned files live under `col=value/` subdirs and do NOT store
    * the partition columns in their parquet bytes. */
  /** `clusteringProvider` is the spec's clustered-table marker: files
    * written BY a clustering rewrite carry the provider name; files
    * appended since are provider-less, which is exactly what
    * [[optimizeClusterIncremental]] keys its victim selection on. */
  final case class AddFile(path: String, size: Long, modificationTime: Long,
                           dv: Option[DvDescriptor] = None,
                           stats: Option[String] = None,
                           partitionValues: Map[String, String] = Map.empty,
                           baseRowId: Option[Long] = None,
                           defaultRowCommitVersion: Option[Long] = None,
                           clusteringProvider: Option[String] = None)
  /** `txns` is the spec's per-appId transaction watermark (latest `txn`
    * action per application id) — the idempotent-streaming-writes
    * contract: a writer that tags each commit with {appId, version}
    * can detect an already-committed batch after a crash. */
  /** `domainMetadata` is the spec's named-domain configuration store
    * (latest non-removed action per domain) — row tracking keeps its
    * `rowIdHighWaterMark` in the `delta.rowTracking` domain. */
  final case class Snapshot(
      version: Long,
      minReaderVersion: Int,
      minWriterVersion: Int,
      tableId: String,
      schema: StructType,
      configuration: Map[String, String],
      files: Seq[AddFile],
      txns: Map[String, Long] = Map.empty,
      readerFeatures: Seq[String] = Nil,
      writerFeatures: Seq[String] = Nil,
      partitionColumns: Seq[String] = Nil,
      domainMetadata: Map[String, String] = Map.empty,
      txnLastUpdated: Map[String, Long] = Map.empty)

  @transient private[stac] lazy val mapper = new ObjectMapper()

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
  def write(dfRaw: DataFrame, path: String,
            properties: Map[String, String] = Map.empty,
            mode: String = "error",
            footerKv: Map[String, String] = Map.empty,
            txn: Option[(String, Long)] = None,
            maxRetries: Int = 10,
            partitionBy: Seq[String] = Nil,
            mergeSchema: Boolean = false): Long = {
    require(Set("error", "append", "overwrite").contains(mode),
      s"mode must be error|append|overwrite, got $mode")
    propertyFeatures(properties) // unknown delta.feature.* refuses BEFORE staging
    val df0 = dfRaw
    val conf = df0.sparkSession.sessionState.newHadoopConf()
    def readPrior(): Option[Snapshot] =
      if (checkpointRefFor(conf, path).isDefined)
        Some(snapshot(df0.sparkSession, path)) // checkpoint-truncated log
      else currentSnapshot(conf, path)
    val prior0 = readPrior()
    prior0.foreach(p => requireWritable(p, path))
    require(mode != "error" || prior0.isEmpty,
      s"Delta table already exists at $path (version ${prior0.map(_.version).orNull}); " +
        "use mode=append or mode=overwrite")
    // idempotence gate: an (appId, version) the log already carries —
    // at this version or newer — is a re-delivered batch; skip BEFORE
    // any data lands
    txn.foreach { case (appId, v) =>
      prior0.foreach { p =>
        if (p.txns.get(appId).exists(_ >= v)) return p.version
      }
    }
    // generated columns resolve BEFORE the schema checks: an append
    // missing one gets it computed against the TABLE schema; a batch
    // providing one (and any create/overwrite whose own schema declares
    // generation metadata) is validated
    val df1 = prior0 match {
      case Some(p) if mode == "append" =>
        applyGeneratedColumns(df0, p.schema, s"write to $path")
      case _ => applyGeneratedColumns(df0, df0.schema, s"write to $path")
    }
    // identity columns resolve next: an append MISSING one gets values
    // generated from the table's high-water mark; a batch PROVIDING one
    // needs allowExplicit (GENERATED BY DEFAULT) and advances the mark.
    // identUpdates carries the new per-column marks into the commit's
    // metaData; identHwmUsed is the optimistic-concurrency baseline —
    // a competing commit moving a mark forces a regenerate-and-restage.
    val identTargetSchema = prior0 match {
      case Some(p) if mode == "append" => p.schema
      case _ => df1.schema
    }
    val idents = identityFields(identTargetSchema)
    // column DEFAULTS (the `allowColumnDefaults` writer feature —
    // Spark's CURRENT_DEFAULT field metadata): an append missing the
    // column gets the default computed; provided values always win
    val defaults = defaultFields(identTargetSchema)
    val identHwmUsed: Map[String, Option[Long]] =
      idents.map(i => i.field.name -> i.hwm).toMap
    var identUpdates = Map.empty[String, Long]
    var identPersisted: Option[DataFrame] = None
    val df = if (idents.isEmpty && defaults.isEmpty) df1 else {
      var out = df1
      if (mode == "append" && prior0.nonEmpty)
        defaults.foreach { case (f, d) =>
          if (!out.columns.contains(f.name))
            out = out.withColumn(f.name,
              org.apache.spark.sql.functions.expr(d)
                .cast(f.dataType).as(f.name, f.metadata))
        }
      idents.foreach { i =>
        if (!out.columns.contains(i.field.name)) {
          if (identPersisted.isEmpty) {
            out = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            identPersisted = Some(out)
          }
          val base = nextIdentityBase(i.start, i.step, i.hwm)
          val (d2, n) = assignIdentityValues(out, i.field, base, i.step)
          out = d2
          if (n > 0) identUpdates += i.field.name -> (base + (n - 1) * i.step)
        } else {
          // a CREATE/overwrite batch DEFINES the table — its values
          // seed the mark; only appends are gated on allowExplicit
          require(mode != "append" || prior0.isEmpty || i.allowExplicit,
            s"identity column ${i.field.name} is GENERATED ALWAYS — " +
              "batches may not supply it (set delta.identity.allowExplicit)")
          import org.apache.spark.sql.functions.{col, max, min}
          val r = out.agg(
            (if (i.step > 0) max(quotedCol(i.field.name))
             else min(quotedCol(i.field.name))).cast(LongType)).collect()(0)
          if (!r.isNullAt(0)) {
            val v = r.getLong(0)
            val past = i.hwm.forall(h => if (i.step > 0) v > h else v < h)
            if (past) identUpdates += i.field.name -> v
          }
        }
      }
      // computed columns appended at the END — re-select in table order
      // (same heal as generated columns)
      val tableOrder = identTargetSchema.fieldNames.filter(out.columns.contains)
      val extras = out.columns.filterNot(identTargetSchema.fieldNames.contains)
      out.select((tableOrder ++ extras).map(
        org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    }
    partitionBy.foreach(c => require(df.schema.fieldNames.contains(c),
      s"partition column $c not in the batch schema"))
    def appendSchemaOf(prior: Snapshot): StructType =
      if (!mergeSchema) {
        require(DataType.equalsIgnoreNullability(prior.schema, df.schema),
          s"append schema mismatch at $path:\n table: ${prior.schema.simpleString}\n " +
            s"batch: ${df.schema.simpleString}\n " +
            "(pass mergeSchema = true to evolve the table schema)")
        prior.schema
      } else evolveSchema(prior.schema, df.schema)
    prior0.filter(_ => mode == "append").foreach(appendSchemaOf)
    // data-quality gate BEFORE anything stages: CHECK constraints ride
    // the effective table configuration, NOT NULL the effective schema
    def effectiveConstraints(prior: Option[Snapshot]): (StructType, Map[String, String]) = {
      val cfg = (mode, prior) match {
        case ("append", Some(p)) => p.configuration
        case ("overwrite", Some(p)) =>
          if (properties.nonEmpty) properties else p.configuration
        case _ => properties
      }
      val sch = prior match {
        case Some(p) if mode == "append" =>
          if (mergeSchema) evolveSchema(p.schema, df.schema) else p.schema
        case _ => df.schema
      }
      (sch, cfg)
    }
    if (mode == "overwrite")
      prior0.foreach(p => requireNotAppendOnly(p.configuration, "overwrite"))
    val (cSch0, cCfg0) = effectiveConstraints(prior0)
    enforceConstraints(df, cSch0, cCfg0, s"write to $path")
    // appends inherit the table's partitioning; an explicit partitionBy
    // must agree (a mixed-layout table would be unreadable)
    val effPartitionBy = prior0 match {
      case Some(p) if mode == "append" =>
        require(partitionBy.isEmpty || partitionBy == p.partitionColumns,
          s"append partitioning $partitionBy != table's ${p.partitionColumns}")
        p.partitionColumns
      case _ => partitionBy
    }
    val physFor0 = if (mappedCfg(cCfg0)) Some(cSch0) else None
    val (added, cleanupMoved) =
      try stageAndMove(df, path, footerKv, conf, effPartitionBy, physFor0)
      finally identPersisted.foreach { p => p.unpersist(); () }

    // per-file column stats from the just-written parquet footers —
    // metadata-only reads sharded over executors; committed on the add
    // actions so readers skip files by min/max without opening them
    // (keyed by PHYSICAL names on mapped tables, per spec)
    val statsByName: Map[String, String] = DeltaStats.collectFileStats(
      df.sparkSession, path, added.map(_.relPath),
      physFor0.map(physSchemaOf).getOrElse(df.schema), cCfg0,
      logicalSchema = physFor0)

    // Optimistic-concurrency commit loop: build the action list against
    // the CURRENT snapshot, attempt the put-if-absent rename, and on a
    // lost race re-read the log and rebase — re-running the txn
    // idempotence gate (a competing writer may have landed OUR batch:
    // then our staged files must be withdrawn, not committed) and the
    // mode invariants (overwrite recomputes its removes against the new
    // live set; append re-checks schema against a possibly-changed
    // metaData). Bounded retries; the staged data files are written ONCE
    // — only the O(actions) JSON commit is retried, which is exactly
    // Delta's optimistic-concurrency shape.
    var prior = prior0
    var attempt = 0
    while (true) {
      txn.foreach { case (appId, v) =>
        prior.foreach { p =>
          if (p.txns.get(appId).exists(_ >= v)) { cleanupMoved(); return p.version }
        }
      }
      if (mode == "error" && prior.nonEmpty) {
        cleanupMoved()
        throw new IllegalArgumentException(
          s"Delta table already exists at $path (version ${prior.map(_.version).orNull}); " +
            "use mode=append or mode=overwrite")
      }
      val evolvedSchema: Option[StructType] =
        prior.filter(_ => mode == "append").flatMap { s =>
          val target =
            try appendSchemaOf(s)
            catch { case e: IllegalArgumentException => cleanupMoved(); throw e }
          if (target.json == s.schema.json) None else Some(target)
        }
      val version = prior.map(_.version + 1).getOrElse(0L)
      val now = System.currentTimeMillis()
      val actions = Seq.newBuilder[JsonNode]
      actions += commitInfo(now, if (prior.isEmpty) "CREATE TABLE AS SELECT"
        else if (mode == "overwrite") "WRITE (overwrite)" else "WRITE (append)",
        Map("numFiles" -> added.size.toLong,
          "numOutputRows" -> outputRowsOf(statsByName),
          "numOutputBytes" -> added.map(_.status.getLen).sum) ++
          (if (mode == "overwrite")
            prior.map(p => Map("numRemovedFiles" -> p.files.size.toLong))
              .getOrElse(Map.empty)
           else Map.empty))
      txn.foreach { case (appId, v) => actions += txnActionNode(appId, v, now) }
      if (prior.isEmpty) {
        // a table BORN with delta.enableChangeDataFeed / ICT must declare
        // the matching writer feature from version 0 — the property alone
        // would let a feature-unaware external writer commit DML without
        // cdc files / ICT stamps, silently corrupting the feed. (ICT
        // enabled at creation needs no enablement-version provenance:
        // every commit of the table carries a stamp.)
        // TIMESTAMP WITHOUT TIME ZONE columns are protocol-gated on the
        // timestampNtz feature — BOTH sides (old readers would misread
        // the parquet bytes as zoned timestamps); generation metadata
        // declares the generatedColumns writer feature
        val ntz = (if (containsNtz(df.schema)) Seq("timestampNtz") else Nil) ++
          (if (containsVariant(df.schema)) Seq("variantType") else Nil)
        val born = cfgWriterFeatures(properties) ++
          (if (generatedFields(df.schema).nonEmpty) Seq("generatedColumns")
           else Nil) ++
          (if (idents.nonEmpty) Seq("identityColumns") else Nil) ++
          (if (defaults.nonEmpty) Seq("allowColumnDefaults") else Nil) ++
          (if (hasCollatedStrings(df.schema)) Seq("collations") else Nil)
        if (born.isEmpty && ntz.isEmpty) actions += protocolAction()
        else {
          val base = Snapshot(-1L, MinReaderVersion, MinWriterVersion, "",
            df.schema, Map.empty, Nil)
          actions += featureUpgradeAction(base,
            ntz ++ cfgReaderFeatures(properties), born ++ ntz).get
        }
        actions += metaDataAction(java.util.UUID.randomUUID().toString,
          stampIdentityHwm(df.schema, identUpdates), properties, now,
          effPartitionBy)
      } else if (mode == "overwrite") {
        // new properties may switch on CDF/ICT mid-life: declare the
        // features in the SAME commit, with ICT enablement provenance
        // (the table has pre-ICT history, unlike the create path)
        var effProps = if (properties.nonEmpty) properties
                       else prior.get.configuration
        if (properties.nonEmpty) {
          featureUpgradeAction(prior.get, cfgReaderFeatures(properties),
            cfgWriterFeatures(properties))
            .foreach { p =>
              actions += p
              if (properties.get(IctProp).contains("true") &&
                  !prior.get.configuration.get(IctProp).contains("true"))
                effProps = effProps +
                  ("delta.inCommitTimestampEnablementVersion" -> version.toString) +
                  ("delta.inCommitTimestampEnablementTimestamp" -> now.toString)
            }
        }
        // overwrite re-states metaData (schema/properties may change) but
        // keeps the table id — the replace-table shape
        actions += metaDataAction(prior.get.tableId,
          stampIdentityHwm(df.schema, identUpdates), effProps, now,
          effPartitionBy)
        // removeActionNode carries the DV descriptor when one rides the
        // file — without it the tombstone loses the pack reference and
        // log-based reclaim (vacuumLite) can never free the pack
        prior.get.files.foreach(f =>
          actions += removeActionNode(f, now, dataChange = true))
      } else if (evolvedSchema.isDefined || identUpdates.nonEmpty) {
        // mergeSchema append re-states metaData with the EVOLVED schema
        // (old files read the new columns as null); an identity-
        // generating append re-states it to carry the new high-water
        // mark — either way same table id/config
        actions += metaDataAction(prior.get.tableId,
          stampIdentityHwm(evolvedSchema.getOrElse(prior.get.schema),
            identUpdates),
          prior.get.configuration, now, effPartitionBy)
      }
      // healing upgrade for EXISTING tables gaining (or already
      // carrying, sans declaration) an NTZ column — schema evolution,
      // overwrite-with-new-schema, or an externally-created legacy log
      if (prior.nonEmpty && containsNtz(df.schema))
        featureUpgradeAction(prior.get, Seq("timestampNtz"),
          Seq("timestampNtz")).foreach(actions += _)
      if (prior.nonEmpty && containsVariant(df.schema))
        featureUpgradeAction(prior.get, Seq("variantType"),
          Seq("variantType")).foreach(actions += _)
      // same healing for identity columns and defaults (writer-side)
      if (prior.nonEmpty && idents.nonEmpty)
        featureUpgradeAction(prior.get, Nil, Seq("identityColumns"))
          .foreach(actions += _)
      if (prior.nonEmpty && defaults.nonEmpty)
        featureUpgradeAction(prior.get, Nil, Seq("allowColumnDefaults"))
          .foreach(actions += _)
      // a table gaining its first collated column (mergeSchema append /
      // overwrite-with-new-schema) declares the writer feature in the
      // same commit
      if (prior.nonEmpty &&
          (hasCollatedStrings(df.schema) ||
           evolvedSchema.exists(hasCollatedStrings)))
        featureUpgradeAction(prior.get, Nil, Seq("collations"))
          .foreach(actions += _)
      val commitCfg = prior.map(p =>
        if (mode == "overwrite" && properties.nonEmpty) properties
        else p.configuration).getOrElse(properties)
      val rt = assignRowIds(conf, path, commitCfg,
        prior.map(_.domainMetadata).getOrElse(Map.empty), added, statsByName)
      added.foreach { f =>
        val r = mapper.createObjectNode()
        val b = r.putObject("add")
        b.put("path", f.relPath)
        putPartitionValues(b, f.partitionValues)
        b.put("size", f.status.getLen)
        b.put("modificationTime", f.status.getModificationTime)
        b.put("dataChange", true)
        statsByName.get(f.relPath).foreach(b.put("stats", _))
        rt.foreach { case (ids, _) =>
          b.put("baseRowId", ids(f.relPath))
          b.put("defaultRowCommitVersion", version)
        }
        actions += r
      }
      rt.foreach(t => actions += t._2)
      try {
        commit(conf, path, version, actions.result(), commitCfg)
        return version
      } catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > maxRetries) {
            cleanupMoved()
            throw new IllegalStateException(
              s"write to $path lost the commit race $attempt times (last: ${e.getMessage}); " +
                "staged files withdrawn", e)
          }
          prior = readPrior() // rebase and retry
          prior.foreach(p => requireWritable(p, path))
          // identity columns: a competing commit may have advanced a
          // high-water mark past the base our STAGED values were
          // generated from — committing them would mint duplicates.
          // Withdraw the staged files and restart the whole write
          // (regenerate + restage against the new mark).
          if (idents.nonEmpty && mode == "append") {
            val nowHwm: Map[String, Option[Long]] = prior.toSeq
              .flatMap(p => identityFields(p.schema))
              .map(i => i.field.name -> i.hwm).toMap
            if (idents.exists(i =>
                nowHwm.getOrElse(i.field.name, None) !=
                  identHwmUsed(i.field.name))) {
              cleanupMoved()
              return write(df0, path, properties, mode, footerKv, txn,
                maxRetries - attempt, partitionBy, mergeSchema)
            }
          }
          // a concurrent commit may have added/changed constraints —
          // re-validate before re-attempting (withdrawing on violation)
          val (cSch, cCfg) = effectiveConstraints(prior)
          if (cCfg != cCfg0 || cSch.json != cSch0.json)
            try enforceConstraints(df, cSch, cCfg, s"write to $path")
            catch { case t: Throwable => cleanupMoved(); throw t }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Stage `df`'s part files under a hidden job-scoped directory, then
    * move them into the table root. The job's output is discovered from
    * the STAGING dir, not a before/after listing diff of the root: a diff
    * would silently commit any file landing in the window (a concurrent
    * writer, leftover staging output) as this version's data. Part files
    * keep their committer-given names (unique via the per-job UUID); the
    * move is an atomic-rename metadata op on filesystems honoring the
    * same Delta storage contract commit() already assumes. Runs under
    * try/finally: an abort deletes the staging dir AND best-effort
    * removes already-moved part files, so a failed write leaves no
    * orphans. Returns the moved files plus a withdraw hook for callers
    * whose COMMIT later aborts. */
  /** One staged-and-moved part file: filesystem status, table-relative
    * path (subdirs for hive-partitioned layouts), and the partition
    * values parsed from its directory components. */
  private[stac] final case class StagedFile(
      status: org.apache.hadoop.fs.FileStatus, relPath: String,
      partitionValues: Map[String, String])

  private[stac] def stageAndMove(df: DataFrame, path: String,
                           footerKv: Map[String, String], conf: Configuration,
                           partitionBy: Seq[String] = Nil,
                           physFor: Option[StructType] = None,
                           physPassThrough: Set[String] = Set.empty)
      : (Seq[StagedFile], () => Unit) = {
    val rootP = new Path(path)
    val fs = rootP.getFileSystem(conf)
    val staging = new Path(rootP, s".staging-${java.util.UUID.randomUUID()}")
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    def cleanupMoved(): Unit = moved.foreach { p =>
      try fs.delete(p, false)
      catch { case _: java.io.IOException => () } // best-effort
    }
    // column-mapped tables store PHYSICAL names in the parquet bytes
    // (and hive dirs / partitionValues key by them)
    val (dfW, pbW) = physFor match {
      case Some(ts) => toPhysical(df, ts, partitionBy, physPassThrough)
      case None => (df, partitionBy)
    }
    val added: Seq[StagedFile] =
      try {
        val w0 = dfW.write.mode("append")
        val w = if (pbW.isEmpty) w0 else w0.partitionBy(pbW: _*)
        val writer =
          if (footerKv.isEmpty) w.format("parquet")
          else footerKv.foldLeft(w.format("geoparquet")) { case (b, (k, v)) =>
            b.option(GeoParquetFileFormat.OptionPrefix + k, v)
          }
        writer.save(staging.toString)
        // recursive walk: partitioned writes nest part files under
        // hive-style `col=value/` directories
        val it = fs.listFiles(staging, true)
        val parts = scala.collection.mutable.ArrayBuffer
          .empty[(Path, String)] // (absolute, staging-relative)
        val prefix = staging.toUri.getPath.stripSuffix("/") + "/"
        while (it.hasNext) {
          val st = it.next()
          val n = st.getPath.getName
          if (st.isFile && n.endsWith(".parquet") &&
              !n.startsWith("_") && !n.startsWith("."))
            parts += ((st.getPath,
              st.getPath.toUri.getPath.stripPrefix(prefix)))
        }
        parts.toSeq.map { case (src, rel) =>
          val dest = new Path(rootP, rel)
          fs.mkdirs(dest.getParent)
          require(!fs.exists(dest), s"part-file collision at $dest — staging move aborted")
          require(fs.rename(src, dest), s"could not move $src to $dest")
          moved += dest
          // hive components in nesting order = partitionBy order; the
          // LOG carries the authoritative values
          val pv = rel.split('/').dropRight(1).collect {
            case seg if seg.contains('=') =>
              val (k, v) = seg.splitAt(seg.indexOf('='))
              val raw = unescapeHive(v.drop(1))
              k -> (if (raw == "__HIVE_DEFAULT_PARTITION__") null else raw)
          }.toMap
          StagedFile(fs.getFileStatus(dest), rel, pv)
        }
      } catch {
        case e: Throwable => cleanupMoved(); throw e
      } finally {
        fs.delete(staging, true); ()
      }
    (added, () => cleanupMoved())
  }

  /** Hive path-segment unescape (%XX sequences, the encoding Spark's
    * partitioned writer applies to special characters). */
  private[stac] def unescapeHive(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: Exception => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString()
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
    checkpointRefFor(conf, path) match {
      case None => snapshot(conf, path)
      case Some(ref) => checkpointSnapshot(spark, path, ref)
    }
  }

  /** Read the table's CURRENT version: exactly the log's live files with
    * the logged schema — files on disk but removed (or never committed)
    * in the log are invisible, the property that makes the log, not the
    * directory listing, the source of truth. Files carrying a
    * deletionVector are scanned WITH the DV applied: deleted row
    * positions are filtered out via `_metadata.row_index`. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    snapshotDf(spark, path, snapshot(spark, path))

  /** Stats-based file pruning: the subset of `snap.files` whose min/max
    * stats could satisfy `condition`, plus the pruned-away count. Files
    * without stats (or predicates outside the supported conjunct shapes)
    * are conservatively kept — skipping is an optimization, never a
    * filter. */
  def statsPrune(spark: SparkSession, snap: Snapshot,
                 condition: org.apache.spark.sql.Column): (Seq[AddFile], Int) = {
    val pred = DeltaStats.resolvePredicate(spark, snap.schema, condition)
    val kept = snap.files.filter(f =>
      DeltaStats.satisfiable(f.stats, f.partitionValues, snap.schema, pred))
    (kept, snap.files.size - kept.size)
  }

  /** Read the current version with `condition` applied, DATA-SKIPPING
    * files whose logged stats prove no row can match — at 100 TB this is
    * the difference between opening a million footers and opening the
    * dozen files a range predicate actually touches; the log itself is
    * the index. The full predicate still runs over surviving rows (and
    * parquet row-group pushdown applies within kept files).
    *
    * On a checkpoint-seeded table the add-file state stays a DATAFRAME
    * end-to-end: skipping evaluates on executors over the checkpoint's
    * add rows, and only the SURVIVING files — the ones the scan must
    * name anyway — reach the driver. A million-add checkpoint costs the
    * driver O(matching files + JSON tail), not O(table). */
  def readTableWhere(spark: SparkSession, path: String,
                     condition: org.apache.spark.sql.Column): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    checkpointRefFor(conf, path) match {
      case Some(ref) =>
        val (snapBase, addsDf) = lazyCheckpointState(spark, path, ref)
        val schema = snapBase.schema
        val pred = DeltaStats.resolvePredicate(spark, schema, condition)
        val kept = addsDf.filter { (r: org.apache.spark.sql.Row) =>
          val pv = if (r.isNullAt(9)) Map.empty[String, String]
                   else r.getMap[String, String](9).toMap
          DeltaStats.satisfiable(Option(r.getString(8)), pv, schema, pred)
        }.collect().map(rowToAddFile).toSeq
        snapshotDf(spark, path, snapBase.copy(files = kept)).filter(condition)
      case None =>
        val snap = snapshot(spark, path)
        val (kept, _) = statsPrune(spark, snap, condition)
        snapshotDf(spark, path, snap.copy(files = kept)).filter(condition)
    }
  }

  /** Checkpoint-seeded state WITHOUT materializing the add list: the
    * small state (protocol/metaData/txns, replayed through the JSON
    * tail) plus the FULL live add set as a DataFrame — the checkpoint's
    * add rows minus tail-touched paths, unioned with the tail's own net
    * adds. Driver memory is O(small state + tail commits), never
    * O(table files); consumers narrow the frame (stats pruning, scan
    * construction) before anything collects. */
  private[stac] def lazyCheckpointState(spark: SparkSession, path: String,
                                  ref: CheckpointRef,
                                  maxVersion: Long = Long.MaxValue): (Snapshot, DataFrame) = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = logDir(path).getFileSystem(conf)
    val st = new ReplayState(path)
    seedCheckpointSmall(spark, path, ref, st)
    val cv = ref.version
    val tail = listJsonCommits(fs, path)
      .filter(p => p._1 > cv && p._1 <= maxVersion)
    require(tail.map(_._1) == (cv + 1 to cv + tail.size),
      s"non-contiguous Delta log after checkpoint $cv: ${tail.map(_._1).mkString(",")}")
    // the tail is replayed into the (checkpoint-add-free) ReplayState:
    // st.live ends as the tail's NET adds; `touched` marks every path
    // the tail re-stated or removed, which must override checkpoint rows
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    tail.foreach { case (_, p) =>
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      lines.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("add")) touched += node.get("add").get("path").asText()
        if (node.has("remove")) touched += node.get("remove").get("path").asText()
        st.applyJson(node)
      }
    }
    val tailAdds = st.live.values.toSeq
    val snapBase = st.toSnapshot(cv + tail.size).copy(files = Nil)
    val ckpt = ckptAddsFlatDf(spark, path, ref)
    import org.apache.spark.sql.functions.col
    val untouchedCkpt =
      if (touched.isEmpty) ckpt
      else ckpt.filter(!col("path").isInCollection(touched.toSeq))
    val addsDf =
      if (tailAdds.isEmpty) untouchedCkpt
      else untouchedCkpt.unionByName(addFilesToFlatDf(spark, tailAdds))
    (snapBase, addsDf)
  }

  /** Snapshot whose FILE LIST is narrowed BEFORE it reaches the driver —
    * the DML-verb seam. On a checkpoint-seeded table the add state stays
    * a DataFrame: `narrowDf` filters the flat add rows on EXECUTORS and
    * only the survivors — the files the verb must touch anyway — are
    * collected, so a DML against a million-add checkpoint costs the
    * driver O(touched files + JSON tail), never O(table). Pre-checkpoint
    * logs replay their (bounded, young) JSON with `narrowFiles`. */
  private[stac] def narrowedSnapshot(spark: SparkSession, path: String,
      narrowDf: (StructType, DataFrame) => DataFrame,
      narrowFiles: Snapshot => Seq[AddFile]): Snapshot = {
    val conf = spark.sessionState.newHadoopConf()
    checkpointRefFor(conf, path) match {
      case Some(ref) =>
        val (snapBase, addsDf) = lazyCheckpointState(spark, path, ref)
        snapBase.copy(files =
          narrowDf(snapBase.schema, addsDf).collect().map(rowToAddFile).toSeq)
      case None =>
        val snap = snapshot(conf, path)
        snap.copy(files = narrowFiles(snap))
    }
  }

  /** The DML snapshot: file list narrowed to the files `condition`
    * could possibly touch (stats-based skipping, conservative — files
    * without stats or under unsupported predicate shapes are kept).
    * None keeps every live file but still routes checkpoint-seeded
    * state through the DataFrame path. */
  private[stac] def dmlSnapshot(spark: SparkSession, path: String,
      condition: Option[org.apache.spark.sql.Column]): Snapshot =
    narrowedSnapshot(spark, path,
      (schema, df) => condition match {
        case None => df
        case Some(c) =>
          val pred = DeltaStats.resolvePredicate(spark, schema, c)
          df.filter { (r: org.apache.spark.sql.Row) =>
            val pv = if (r.isNullAt(9)) Map.empty[String, String]
                     else r.getMap[String, String](9).toMap
            DeltaStats.satisfiable(Option(r.getString(8)), pv, schema, pred)
          }
      },
      snap => condition match {
        case None => snap.files
        case Some(c) => statsPrune(spark, snap, c)._1
      })

  /** Current snapshot WITHOUT file state (`files = Nil`) — protocol/
    * metaData/txns/domainMetadata only, O(small state + tail) driver
    * cost on checkpoint-seeded tables. For schema/config gates that
    * never need the add list. */
  private[graft] def smallSnapshot(spark: SparkSession, path: String): Snapshot = {
    val conf = spark.sessionState.newHadoopConf()
    checkpointRefFor(conf, path) match {
      case Some(ref) => lazyCheckpointState(spark, path, ref)._1
      case None => snapshot(conf, path).copy(files = Nil)
    }
  }

  /** The table's current version — a SMALL-state read (protocol/
    * metaData/tail only, never the add list): the poll a streaming
    * consumer issues per trigger, O(JSON tail) however large the
    * table. */
  def currentVersion(spark: SparkSession, path: String): Long =
    smallSnapshot(spark, path).version

  /** Snapshot → DataFrame, applying deletion vectors when present. The
    * DV bitmaps are decoded once on the driver and broadcast (compressed
    * Roaring bytes — KBs per million deleted rows); the per-row probe is
    * a bitmap contains() against the file's physical row index, which
    * Spark's parquet reader exposes as `_metadata.row_index`. Files
    * without a DV take the plain scan path untouched. Partitioned
    * tables (hive layout: `col=value/` subdirs, partition columns absent
    * from the parquet bytes) re-inject the partition columns as per-file
    * literals from the log's `partitionValues` — the LOG values are
    * authoritative, never the directory names. */
  private[stac] def snapshotDf(spark: SparkSession, path: String, snap: Snapshot): DataFrame =
    buildScan(spark, path, snap, withPos = false, applyDvs = true,
      validateDvCardinality = true)

  /** @param extraCols extra RAW parquet column names (long-typed) to
    *   surface alongside the table columns — absent-in-file reads as
    *   null. Carries the row-tracking materialized-row-id column, which
    *   lives in the parquet bytes but NOT in the table schema. */
  private[stac] def buildScan(spark: SparkSession, path: String, snap: Snapshot,
                        withPos: Boolean, applyDvs: Boolean,
                        validateDvCardinality: Boolean = false,
                        extraCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions.{col, element_at, lit, split, udf}
    val posFields = (if (withPos)
      Seq(StructField(PosFileCol, StringType), StructField(PosIdxCol, LongType))
      else Nil) ++ extraCols.map(StructField(_, LongType))
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(snap.schema.fields.toSeq ++ posFields))
    val partCols = snap.partitionColumns
    val dvFiles = snap.files.filter(_.dv.isDefined)
    val needPos = withPos || dvFiles.nonEmpty

    // column mapping (reader v2 / the columnMapping feature): the
    // parquet bytes store PHYSICAL column names (`col-<uuid>` style,
    // stamped in each field's `delta.columnMapping.physicalName`
    // metadata by the renaming engine); the scan reads the physical
    // schema and projects back to logical names with a positional
    // struct cast — sound because the physical schema is a pure
    // node-for-node rename of the logical one
    val mapped = snap.configuration.get("delta.columnMapping.mode")
      .exists(m => m == "name" || m == "id")
    val physDataSchema = StructType(
      snap.schema.filterNot(f => partCols.contains(f.name)).map { f =>
        StructField(physFieldName(f),
          if (mapped) physDataType(f.dataType) else f.dataType, f.nullable)
      } ++ extraCols.map(StructField(_, LongType)))
    val physOf = snap.schema.map(f => f.name -> physFieldName(f)).toMap

    // PosFileCol must be the TABLE-RELATIVE path, not the bare file
    // name: hive-partitioned writes reuse part numbers in every
    // `col=value/` dir, so names collide across partitions and a
    // name-keyed DV would tombstone rows of the WRONG partition's file
    val relDepth = partCols.size + 1
    def scanGroup(files: Seq[AddFile]): DataFrame = {
      var df = spark.read.schema(physDataSchema)
        .parquet(files.map(f => resolvedDataPath(path, f.path).toString): _*)
      if (needPos) df = df
        .withColumn(PosFileCol,
          org.apache.spark.sql.functions.array_join(
            org.apache.spark.sql.functions.slice(
              split(col("_metadata.file_path"), "/"), -relDepth, relDepth), "/"))
        .withColumn(PosIdxCol, col("_metadata.row_index"))
      val pv = files.head.partitionValues
      // the alias re-attaches each field's METADATA (geoarrow extension
      // tags, column-mapping ids) — a bare .as() would drop it
      val sel = snap.schema.fields.toSeq.map { f =>
        if (partCols.contains(f.name)) {
          // partitionValues keys are physical under column mapping;
          // tolerate logical-keyed maps from plainer writers
          val v = pv.get(physOf(f.name)).orElse(pv.get(f.name)).orNull
          (if (v == null) lit(null) else lit(v))
            .cast(f.dataType).as(f.name, f.metadata)
        } else {
          // quotedCol: a field name containing a dot is ONE column
          // here, never a nested path
          val c = quotedCol(physOf(f.name))
          (if (mapped) c.cast(f.dataType) else c).as(f.name, f.metadata)
        }
      } ++ (if (needPos) Seq(col(PosFileCol), col(PosIdxCol)) else Nil) ++
        extraCols.map(quotedCol)
      df.select(sel: _*)
    }

    // one scan per distinct partition tuple (unpartitioned = one group);
    // at many-partition scale the groups are a driver-side plan union —
    // bounded by TOUCHED partitions, the same order as planning itself
    val base =
      if (partCols.isEmpty) scanGroup(snap.files)
      else snap.files.groupBy(_.partitionValues).values.toSeq
        .map(scanGroup).reduce(_ unionByName _)

    val filtered =
      if (!applyDvs || dvFiles.isEmpty) base
      else {
        val conf = spark.sessionState.newHadoopConf()
        // keyed by the position-column suffix (see logKey — equals the
        // table-relative path for this writer's own adds); decode
        // eagerly so a corrupt DV fails the read, not a random task
        filesByLogKey(snap.files, relDepth) // ambiguity guard table-wide
        val decoded: Map[String, DeletionVectors.Dv] = dvFiles.map { f =>
          val d = f.dv.get
          val dv = DeletionVectors.load(conf, path, d.storageType,
            d.pathOrInlineDv, d.offset, d.sizeInBytes)
          if (validateDvCardinality)
            require(dv.cardinality == d.cardinality,
              s"DV for ${f.path}: decoded cardinality ${dv.cardinality} != " +
                s"descriptor ${d.cardinality}")
          logKey(f.path, relDepth) -> dv
        }.toMap
        val bc = spark.sparkContext.broadcast(decoded)
        val keep = udf((fileName: String, idx: Long) =>
          !bc.value.get(fileName).exists(_.contains(idx)))
        base.filter(keep(col(PosFileCol), col(PosIdxCol)))
      }
    if (withPos || !needPos) filtered
    else filtered.drop(PosFileCol, PosIdxCol)
  }

  /** Outcome of a [[delete]]: the committed version, how many rows became
    * newly deleted, and the file-action split (files that gained/updated a
    * deletion vector vs files removed outright because every row died). */
  final case class DeleteStats(version: Long, deletedRows: Long,
                               dvFiles: Int, removedFiles: Int)

  private[stac] val PosFileCol = "__graft_file"
  private[stac] val PosIdxCol = "__graft_idx"
  private[stac] val RidCol = "__graft_rid"

  /** The spec's CDF enablement property. When set, [[delete]]/[[update]]/
    * [[merge]] additionally write their row-level changes as cdc parquet
    * under `_change_data/` with `cdc` (AddCDCFile) actions in the commit
    * — the shape external CDF readers consume directly (and the one
    * [[readChanges]] prefers over file-diff reconstruction), including
    * the update_preimage/update_postimage pairs reconstruction cannot
    * express. Plain appends stay cdc-less per spec: insert-only commits
    * are derivable from their add actions. */
  val CdfProp = "delta.enableChangeDataFeed"

  private[stac] def cdfEnabled(cfg: Map[String, String]): Boolean =
    cfg.get(CdfProp).contains("true")

  /** Generated columns (the spec's `delta.generationExpression` field
    * metadata — legacy writer-4 / the `generatedColumns` feature): a
    * batch MISSING a generated column gets it computed from the
    * expression; a batch PROVIDING one is validated against it
    * (null-safe equality, one aggregate pass in the CHECK-constraint
    * style) — a mismatch names the column with its row count and
    * nothing lands. */
  private[stac] def generatedFields(schema: StructType): Seq[(StructField, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains("delta.generationExpression") =>
        (f, f.metadata.getString("delta.generationExpression"))
    }

  private[stac] def applyGeneratedColumns(df: DataFrame, tableSchema: StructType,
                                    ctx: String): DataFrame = {
    val gens = generatedFields(tableSchema)
    if (gens.isEmpty) return df
    import org.apache.spark.sql.functions.{col, expr, sum, when}
    var out = df
    var computedAny = false
    val toCheck = Seq.newBuilder[(String, org.apache.spark.sql.Column)]
    gens.foreach { case (f, g) =>
      if (!out.columns.contains(f.name)) {
        out = out.withColumn(f.name, expr(g).cast(f.dataType).as(f.name, f.metadata))
        computedAny = true
      } else
        toCheck += (s"generated column ${f.name} AS ($g)" ->
          (quotedCol(f.name) <=> expr(g).cast(f.dataType)))
    }
    // withColumn APPENDS; the append-path schema check compares field
    // ORDER — re-select in table order (table fields present in the
    // batch first, then any extra batch columns in their own order) so
    // a batch missing a mid-schema generated column still appends
    if (computedAny) {
      val tableOrder = tableSchema.fieldNames.filter(out.columns.contains)
      val extras = out.columns.filterNot(tableSchema.fieldNames.contains)
      out = out.select((tableOrder ++ extras).map(quotedCol).toIndexedSeq: _*)
    }
    val checks = toCheck.result()
    if (checks.nonEmpty) {
      val aggs = checks.map { case (_, c) => sum(when(c, 0L).otherwise(1L)) }
      val row = out.agg(aggs.head, aggs.tail: _*).collect()(0)
      val bad = checks.zipWithIndex.collect {
        case ((n, _), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
          s"$n: ${row.getLong(i)} row(s)"
      }
      require(bad.isEmpty, s"$ctx violates ${bad.mkString("; ")}")
    }
    out
  }

  /** Identity columns (the spec's `delta.identity.*` field metadata —
    * legacy writer-6 / the `identityColumns` writer feature): a bigint
    * column whose values the WRITER generates as `start + k*step`,
    * tracking the farthest generated value in the field's
    * `delta.identity.highWaterMark` metadata (re-stated with the
    * commit's metaData). `allowExplicit = true` (GENERATED BY DEFAULT)
    * additionally accepts batch-supplied values, advancing the mark
    * past them; `false` (GENERATED ALWAYS) refuses them by name. */
  private[stac] final case class IdentityField(field: StructField,
      start: Long, step: Long, allowExplicit: Boolean, hwm: Option[Long])

  private[stac] def identityFields(schema: StructType): Seq[IdentityField] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains("delta.identity.start") ||
                f.metadata.contains("delta.identity.step") =>
        require(f.dataType == LongType,
          s"identity column ${f.name} must be BIGINT, got ${f.dataType.simpleString}")
        def l(k: String, d: Long) =
          if (f.metadata.contains(k)) f.metadata.getLong(k) else d
        val step = l("delta.identity.step", 1L)
        require(step != 0L, s"identity column ${f.name}: step must be non-zero")
        IdentityField(f, l("delta.identity.start", 1L), step,
          f.metadata.contains("delta.identity.allowExplicit") &&
            f.metadata.getBoolean("delta.identity.allowExplicit"),
          if (f.metadata.contains("delta.identity.highWaterMark"))
            Some(f.metadata.getLong("delta.identity.highWaterMark"))
          else None)
    }

  /** Column defaults (the spec's `allowColumnDefaults` writer feature;
    * Spark's own CURRENT_DEFAULT field-metadata key): the SQL
    * expression a write fills in when the batch omits the column.
    * Write-side only per spec — adding a default to an EXISTING column
    * never rewrites old rows (which is why Delta forbids ADD COLUMN
    * with a default). */
  private[stac] def defaultFields(schema: StructType): Seq[(StructField, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains("CURRENT_DEFAULT") =>
        (f, f.metadata.getString("CURRENT_DEFAULT"))
    }

  /** The next value to generate: the smallest `start + k*step` (k >= 0)
    * strictly past the high-water mark in step direction; `start`
    * itself when no value was ever generated. */
  private[stac] def nextIdentityBase(start: Long, step: Long,
                               hwm: Option[Long]): Long = hwm match {
    case None => start
    case Some(h) =>
      if (step > 0) {
        if (h < start) start
        else start + ((h - start) / step + 1) * step
      } else {
        if (h > start) start
        else start + ((start - h) / (-step) + 1) * step
      }
  }

  /** Stamp updated high-water marks into the identity fields' metadata
    * (the committed metaData carries them forward). */
  private[stac] def stampIdentityHwm(schema: StructType,
                               updates: Map[String, Long]): StructType =
    if (updates.isEmpty) schema
    else StructType(schema.fields.map { f =>
      updates.get(f.name) match {
        case Some(h) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putLong("delta.identity.highWaterMark", h).build())
        case None => f
      }
    })

  /** Distributed identity-value assignment for an n-row batch: value =
    * base + step * (partition offset + within-partition index). ONE
    * small count aggregate computes per-partition offsets; the id
    * itself is `monotonically_increasing_id`'s within-partition counter
    * (its low 33 bits), so no global sort or single-partition funnel is
    * involved. The CALLER must have persisted `df` — the count job and
    * the staging write must observe identical partitioning. Returns the
    * frame plus the generated row count. */
  private[stac] def assignIdentityValues(df: DataFrame, f: StructField,
      base: Long, step: Long): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{col, element_at, lit,
      monotonically_increasing_id, spark_partition_id, typedLit}
    val counts = df.select(spark_partition_id().as("p"))
      .groupBy(col("p")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    var off = 0L
    val offsets: Map[Int, Long] = counts.toSeq.sortBy(_._1).map { case (p, c) =>
      val o = off; off += c; p -> o
    }.toMap
    if (off == 0L) return (df.withColumn(f.name,
      lit(null).cast(LongType).as(f.name, f.metadata)), 0L)
    val local = monotonically_increasing_id()
      .bitwiseAND(lit((1L << 33) - 1))
    val value = lit(base) + lit(step) *
      (element_at(typedLit(offsets), spark_partition_id()).cast(LongType) + local)
    (df.withColumn(f.name, value.cast(LongType).as(f.name, f.metadata)), off)
  }

  /** Delta `collations` writer feature — COLLATED STRING columns.
    * Serialization needs no engine-side shuffling: Spark's own
    * StructType JSON hoists a field's collation into the
    * `__COLLATIONS` field-metadata entry with a PLAIN "string" physical
    * type — exactly the delta collation-RFC layout — and the parser
    * materializes the collated type back (consuming the marker). So the
    * schemaString in the log/checkpoint is portable (feature-unaware
    * readers still parse it and read the unchanged bytes), replay
    * yields collated Spark types, and every read/DML comparison
    * downstream is collation-aware natively. What the ENGINE owns is
    * the protocol obligation: any schema carrying a collated string —
    * top-level or nested — declares the `collations` writer feature
    * (create, evolve, addColumn, healing upgrade on externally-shaped
    * tables). Identifiers follow "provider.NAME" ("spark.UTF8_LCASE",
    * "icu.UNICODE_CI"). */
  val CollationsMetadataKey = "__COLLATIONS"

  /** "PROVIDER.NAME" identifier of a NON-DEFAULT collation (None for
    * plain UTF8_BINARY strings). */
  private[stac] def collationIdentifier(
      s: org.apache.spark.sql.types.StringType): Option[String] = {
    val c = org.apache.spark.sql.catalyst.util.CollationFactory
      .fetchCollation(s.collationId)
    if (c.collationName == "UTF8_BINARY") None
    else Some(s"${c.provider}.${c.collationName}") // "spark.UTF8_LCASE",
    // "icu.UNICODE_CI" — Spark's own serialized casing
  }

  /** Does the schema carry a NON-DEFAULT collated string anywhere?
    * Such tables are gated on the `collations` writer feature. */
  private[stac] def hasCollatedStrings(dt: DataType): Boolean = dt match {
    case s: org.apache.spark.sql.types.StringType =>
      collationIdentifier(s).isDefined
    case s: StructType => s.fields.exists(f => hasCollatedStrings(f.dataType))
    case org.apache.spark.sql.types.ArrayType(e, _) => hasCollatedStrings(e)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      hasCollatedStrings(k) || hasCollatedStrings(v)
    case _ => false
  }

  /** Does the schema carry a TIMESTAMP WITHOUT TIME ZONE anywhere
    * (top-level or nested)? Such tables are gated on the spec's
    * `timestampNtz` reader+writer feature. */
  private[stac] def containsNtz(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.TimestampNTZType => true
    case s: StructType => s.fields.exists(f => containsNtz(f.dataType))
    case org.apache.spark.sql.types.ArrayType(e, _) => containsNtz(e)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      containsNtz(k) || containsNtz(v)
    case _ => false
  }

  /** Does the schema carry a VARIANT anywhere? Such tables are gated on
    * the spec's `variantType` reader+writer feature (an unaware reader
    * would misread the two-binary-field physical encoding). */
  private[stac] def containsVariant(dt: DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.VariantType => true
    case s: StructType => s.fields.exists(f => containsVariant(f.dataType))
    case org.apache.spark.sql.types.ArrayType(e, _) => containsVariant(e)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      containsVariant(k) || containsVariant(v)
    case _ => false
  }

  /** The spec's `delta.appendOnly=true` (legacy writer-2 `appendOnly`
    * feature): existing data may not be deleted or changed — DELETE/
    * UPDATE/MERGE/overwrite/RESTORE refuse BY NAME; appends and
    * dataChange=false maintenance (OPTIMIZE, checkpoints) stay legal. */
  private[stac] def requireNotAppendOnly(cfg: Map[String, String], op: String): Unit =
    require(!cfg.get("delta.appendOnly").contains("true"),
      s"$op is forbidden on an append-only table (delta.appendOnly=true)")

  /** Row-level verbs in this engine are DELETION-VECTOR based
    * (delete/update/merge death paths), and icebergCompatV2 forbids
    * DVs — refuse EARLY, before any scan or DV pack file stages
    * (the WriterGateSpec stages-nothing discipline). Whole-file
    * operations (append, overwrite, OPTIMIZE, RESTORE) stay legal. */
  private[stac] def requireIcebergRowLevel(cfg: Map[String, String],
                                           path: String, op: String): Unit =
    require(!icebergV2Enabled(cfg),
      s"$op on $path refused: icebergCompatV2 forbids deletion vectors " +
        "and this engine's row-level verbs write them — disable " +
        s"$IcebergV2Prop or replace data via overwrite — refusing to commit")

  /** Write `changes` (table columns + `_change_type`) as cdc parquet
    * files and return (cdc action nodes, withdraw hook for lost commit
    * races). Partitioned tables keep partition columns INLINE in the
    * cdc parquet (with empty partitionValues) — readable by this
    * module's reader and by engines that project the file schema.
    * `dataChange=false`: cdc files never contribute to table state, so
    * a reader that ignores unknown actions stays correct. On column-
    * mapped tables the cdc parquet carries PHYSICAL names (plus
    * `_change_type`), same as the data files. */
  private[stac] def writeCdcActions(spark: SparkSession, path: String,
                              changes: DataFrame,
                              physFor: Option[StructType] = None)
      : (Seq[JsonNode], () => Unit) = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val cdcDir = new Path(root, "_change_data")
    fs.mkdirs(cdcDir)
    val tmp = new Path(root, s".cdc-tmp-${java.util.UUID.randomUUID()}")
    val changesW = physFor match {
      case Some(ts) =>
        val byName = ts.fields.map(f => f.name -> f).toMap
        val cols = changes.schema.fields.toSeq.map { c =>
          if (c.name == "_change_type")
            org.apache.spark.sql.functions.col(c.name)
          else {
            val f = byName(c.name)
            quotedCol(c.name)
              .cast(physDataType(f.dataType)).as(physFieldName(f))
          }
        }
        changes.select(cols: _*)
      case None => changes
    }
    changesW.write.mode("overwrite").parquet(tmp.toString)
    val parts = fs.listStatus(tmp).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .sortBy(_.getName)
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    val nodes = parts.toSeq.map { p =>
      val dest = new Path(cdcDir, s"cdc-${java.util.UUID.randomUUID()}.parquet")
      require(fs.rename(p, dest), s"could not move cdc file into place at $dest")
      moved += dest
      val st = fs.getFileStatus(dest)
      val r = mapper.createObjectNode()
      val b = r.putObject("cdc")
      b.put("path", s"_change_data/${dest.getName}")
      b.putObject("partitionValues")
      b.put("size", st.getLen)
      b.put("dataChange", false)
      r
    }
    fs.delete(tmp, true)
    (nodes, () => { moved.foreach(fs.delete(_, false)); () })
  }

  /** Resolve an add action's `path` against the table root. The spec
    * allows RELATIVE paths (this writer's own output) or ABSOLUTE URIs
    * (external writers; [[cloneShallow]] emits absolute paths pointing
    * into the SOURCE table) — Hadoop's Path(parent, child) resolves
    * both. */
  private[stac] def resolvedDataPath(root: String, p: String): Path =
    new Path(new Path(root), p)

  /** Row-position keying for DV probes: the last `relDepth` path
    * segments (partition dirs + file name). For relative adds this IS
    * `add.path`; for absolute adds it matches the suffix the scan's
    * `_metadata.file_path` slice produces — the key that ties a
    * scanned row back to its log entry either way. */
  private[stac] def logKey(p: String, relDepth: Int): String =
    p.split('/').takeRight(relDepth).mkString("/")

  /** Suffix-keyed file map with the ambiguity guard (two adds whose
    * last `relDepth` segments collide cannot be told apart by the
    * scan's position column — possible only with absolute-path adds
    * from DIFFERENT roots carrying identical dir/file names). */
  private[stac] def filesByLogKey(files: Seq[AddFile], relDepth: Int): Map[String, AddFile] = {
    val keyed = files.map(f => logKey(f.path, relDepth) -> f)
    require(keyed.map(_._1).distinct.size == keyed.size,
      "ambiguous add paths: two files share the same trailing " +
        s"$relDepth path segment(s) — cannot key row positions")
    keyed.toMap
  }

  /** The live-file scan with each row's physical position exposed
    * (`__graft_file` = part-file name, `__graft_idx` = row index).
    * `applyDvs = true` additionally filters already-deleted rows — the
    * frame row-mutation operators (MERGE key-matching) must see. */
  private[stac] def scanWithPos(spark: SparkSession, path: String, snap: Snapshot,
                          applyDvs: Boolean,
                          extraCols: Seq[String] = Nil): DataFrame =
    buildScan(spark, path, snap, withPos = true, applyDvs = applyDvs,
      extraCols = extraCols)

  /** One touched file's outcome from the executor-side DV build: the
    * merged-bitmap cardinalities plus, for survivors, the shard pack +
    * slot its bitmap landed in (`packPath` empty = full-file death).
    * Bitmap BYTES never leave the executors — only these descriptor
    * rows do, O(touched files), the same order as the commit JSON. */
  private[stac] final case class DvShardRow(fileKey: String, packPath: String,
      offset: Int, size: Int, newCard: Long, oldCard: Long)

  /** The assembled DV half of a row-mutation commit: remove/re-add (or
    * remove-only) actions, counters, and the staged-pack withdraw hook
    * for callers whose commit later aborts. */
  private[stac] final class DvParts(
      val newlyDeleted: Long, val dvFiles: Int, val removedFiles: Int,
      gone: Seq[AddFile], kept: Seq[(AddFile, DvShardRow)],
      path: String, conf: Configuration) {
    def actions(now: Long): Seq[JsonNode] = {
      val out = Seq.newBuilder[JsonNode]
      gone.foreach(f => out += removeActionNode(f, now, dataChange = true))
      // remove BEFORE the re-stating add: both this module's sequential
      // replay (last action per path wins) and spec reconciliation
      // (distinct (path, dvId) pairs) resolve to the new add
      kept.foreach { case (f, e) =>
        out += removeActionNode(f, now, dataChange = true)
        val r = mapper.createObjectNode()
        val b = r.putObject("add")
        b.put("path", f.path)
        putPartitionValues(b, f.partitionValues)
        b.put("size", f.size)
        b.put("modificationTime", f.modificationTime)
        b.put("dataChange", true)
        // the pre-delete stats remain SOUND bounds over surviving rows
        // (a DV only hides rows; it can't widen min/max)
        f.stats.foreach(b.put("stats", _))
        // row tracking: a DV re-add is the SAME file — stable row IDs
        // (and its clustering provenance) ride along unchanged
        f.baseRowId.foreach(b.put("baseRowId", _))
        f.defaultRowCommitVersion.foreach(b.put("defaultRowCommitVersion", _))
        f.clusteringProvider.foreach(b.put("clusteringProvider", _))
        val n = b.putObject("deletionVector")
        n.put("storageType", "u"); n.put("pathOrInlineDv", e.packPath)
        n.put("offset", e.offset); n.put("sizeInBytes", e.size)
        n.put("cardinality", e.newCard)
        out += r
      }
      out.result()
    }
    def dropPack(): Unit = {
      val packs = kept.map(_._2.packPath).distinct
      if (packs.nonEmpty) {
        val fs = new Path(path).getFileSystem(conf)
        packs.foreach { pp =>
          try { fs.delete(DeletionVectors.dvFilePath(path, pp), false); () }
          catch { case _: java.io.IOException => () }
        }
      }
    }
  }

  /** Outcome of a [[merge]]: committed version plus the three row
    * counters (a source row matching a LIVE target key counts as one
    * update — its target row dies and its new version appends; an
    * unmatched source row is an insert; `whenMatched = "delete"` turns
    * the update counter into deletes). */
  final case class MergeStats(version: Long, updatedRows: Long,
                              insertedRows: Long, deletedRows: Long)

  /** The clause set of a full SQL MERGE ([[mergeInto]]):
    *   WHEN MATCHED [AND matchedCondition] THEN UPDATE SET …|DELETE,
    *   WHEN NOT MATCHED [AND notMatchedCondition] THEN INSERT.
    * Expressions reference TARGET columns as `t.<col>` and SOURCE
    * columns as `s.<col>` (`matchedCondition`/`updateSet` see both
    * sides; `notMatchedCondition` sees the source). `updateSet = None`
    * with action "update" takes the source row wholesale (the
    * [[merge]] shape). `matchedAction = "none"` is the INSERT-only
    * merge. */
  final case class MergeClauses(
      matchedCondition: Option[org.apache.spark.sql.Column] = None,
      matchedAction: String = "update",
      updateSet: Option[Map[String, org.apache.spark.sql.Column]] = None,
      notMatchedCondition: Option[org.apache.spark.sql.Column] = None,
      insertNotMatched: Boolean = true)

  /** One `WHEN MATCHED [AND condition] THEN UPDATE SET …|DELETE` clause
    * of [[mergeIntoFull]]. Clauses evaluate IN ORDER per matched row —
    * the first whose condition holds applies; rows matching no clause
    * are untouched. `action` is "update"|"delete"; `set = None` with
    * "update" takes the whole source row (the [[merge]] shape).
    * Conditions and SET values see both sides as `t.<col>`/`s.<col>`. */
  final case class MergeMatched(
      action: String,
      condition: Option[org.apache.spark.sql.Column] = None,
      set: Option[Map[String, org.apache.spark.sql.Column]] = None)

  /** One `WHEN NOT MATCHED [AND condition] THEN INSERT` clause.
    * Condition and values see ONLY the source row. `values = None`
    * inserts the schema-aligned source row (every table column must
    * come from the source unless generated/identity/default); an
    * explicit map inserts those expressions, fills declared defaults,
    * computes generated columns, assigns identity values, and NULLs
    * the rest (delta-spark's unnamed-column rule — NOT NULL
    * constraints still gate the commit). */
  final case class MergeNotMatched(
      condition: Option[org.apache.spark.sql.Column] = None,
      values: Option[Map[String, org.apache.spark.sql.Column]] = None)

  /** One `WHEN NOT MATCHED BY SOURCE [AND condition] THEN UPDATE SET
    * …|DELETE` clause: applies to LIVE target rows whose key matches no
    * source row. Conditions and SET values see ONLY the target row
    * (the SQL scope rule). By-source clauses inherently touch the
    * whole table, so they disable source-key file pruning. */
  final case class MergeBySource(
      action: String,
      condition: Option[org.apache.spark.sql.Column] = None,
      set: Map[String, org.apache.spark.sql.Column] = Map.empty)

  /** Outcome of an [[update]]: committed version + rows rewritten. */
  final case class UpdateStats(version: Long, updatedRows: Long)

  /** Outcome of a [[restore]]: the new commit, the version whose state it
    * reinstates, and the file-action split. */
  final case class RestoreStats(version: Long, restoredVersion: Long,
                                addedFiles: Int, removedFiles: Int)

  /** Outcome of an [[optimizeCompact]] / [[optimizeZOrder]] rewrite. */
  final case class OptimizeStats(version: Long, removedFiles: Int,
                                 addedFiles: Int, purgedDvRows: Long)

  /** Features a LEGACY protocol version implies SUPPORT for (the spec's
    * table-features mapping) — a minWriterVersion-4 table may write
    * change-data files without listing `changeDataFeed` anywhere, so
    * the upgrade check below must treat these as already declared. */
  private[stac] def legacyWriterFeatures(writerV: Int): Set[String] = {
    val tiers = Seq(
      2 -> Seq("appendOnly", "invariants"),
      3 -> Seq("checkConstraints"),
      4 -> Seq("changeDataFeed", "generatedColumns"),
      5 -> Seq("columnMapping"),
      6 -> Seq("identityColumns"))
    tiers.filter(_._1 <= writerV).flatMap(_._2).toSet
  }
  private[stac] def legacyReaderFeatures(readerV: Int): Set[String] =
    if (readerV >= 2) Set("columnMapping") else Set.empty

  private[stac] def supportsWriterFeature(snap: Snapshot, f: String): Boolean =
    if (snap.minWriterVersion >= 7) snap.writerFeatures.contains(f)
    else legacyWriterFeatures(snap.minWriterVersion).contains(f)
  private[stac] def supportsReaderFeature(snap: Snapshot, f: String): Boolean =
    if (snap.minReaderVersion >= 3) snap.readerFeatures.contains(f)
    else legacyReaderFeatures(snap.minReaderVersion).contains(f)

  /** The protocol action (if any) a commit must carry so the table
    * declares `readerFeats`/`writerFeats` under the table-features
    * protocol. A protocol action REPLACES its predecessor, so already-
    * declared features are carried forward — dropping one here would
    * undeclare it for every later writer. None when everything needed
    * is already declared (explicitly at version 7+, or implied by a
    * legacy version — the spec only requires LISTING a feature when the
    * table starts using it under version 7; unused legacy implications
    * are not re-emitted). */
  private[stac] def featureUpgradeAction(snap: Snapshot,
      readerFeats: Seq[String], writerFeats: Seq[String]): Option[JsonNode] = {
    val needR = readerFeats.filterNot(supportsReaderFeature(snap, _))
    val needW = writerFeats.filterNot(supportsWriterFeature(snap, _))
    if (needR.isEmpty && needW.isEmpty) return None
    val newReaderV = if (needR.nonEmpty || snap.minReaderVersion >= 3) 3
                     else snap.minReaderVersion
    // a version-7 table enables a feature only if LISTED: upgrading a
    // legacy-versioned table must fold every feature its old version
    // IMPLIED into the emitted lists (delta-spark does the same), or
    // spec-compliant engines stop enforcing columnMapping / appendOnly /
    // checkConstraints / generation expressions on the upgraded table
    val legacyW =
      if (snap.minWriterVersion < 7)
        legacyWriterFeatures(snap.minWriterVersion).toSeq.sorted
      else Nil
    val legacyR =
      if (newReaderV >= 3 && snap.minReaderVersion < 3)
        legacyReaderFeatures(snap.minReaderVersion).toSeq.sorted
      else Nil
    val r = mapper.createObjectNode()
    val b = r.putObject("protocol")
    b.put("minReaderVersion", newReaderV)
    b.put("minWriterVersion", 7)
    if (newReaderV >= 3) {
      val rf = b.putArray("readerFeatures")
      (snap.readerFeatures ++ legacyR ++ needR).distinct.foreach(rf.add)
    }
    val wf = b.putArray("writerFeatures")
    (snap.writerFeatures ++ legacyW ++ needW).distinct.foreach(wf.add)
    Some(r)
  }

  /** Features that gate BOTH protocol sides (the rest are
    * writer-only). */
  private[stac] val ReaderWriterFeatures: Set[String] =
    Set("deletionVectors", "columnMapping", "v2Checkpoint", "timestampNtz",
      "vacuumProtocolCheck", "typeWidening", "variantType")

  /** The delta-spark feature-enablement route: TBLPROPERTIES
    * (`delta.feature.<name>` = 'supported' | 'enabled') ask for the
    * feature to be DECLARED on the protocol. Unknown names are refused
    * BY NAME (declaring a feature this engine cannot honor would be a
    * lie every later commit repeats). */
  private[stac] def propertyFeatures(cfg: Map[String, String]): Seq[String] =
    cfg.toSeq.sortBy(_._1).collect {
      case (k, v) if k.startsWith("delta.feature.") &&
          (v == "supported" || v == "enabled") =>
        val name = k.stripPrefix("delta.feature.")
        require(SupportedWriterFeatures.contains(name) ||
          SupportedReaderFeatures.contains(name),
          s"table property $k requests feature '$name', which this " +
            "engine does not implement")
        name
    }

  /** The writer features a commit whose table configuration is `cfg`
    * must have declared beyond what the operation itself needs: CDF
    * writes change files, ICT stamps commitInfo — both spec-gated on a
    * protocol declaration, not just the property; `delta.feature.*`
    * properties request declaration explicitly. */
  private[stac] def cfgWriterFeatures(cfg: Map[String, String]): Seq[String] =
    (if (cdfEnabled(cfg)) Seq("changeDataFeed") else Nil) ++
      (if (cfg.get(IctProp).contains("true")) Seq("inCommitTimestamp") else Nil) ++
      (if (rowTrackingEnabled(cfg)) Seq("rowTracking", "domainMetadata")
       else Nil) ++
      (if (protectionBoundary(cfg).isDefined) Seq("checkpointProtection")
       else Nil) ++
      (if (icebergV2Enabled(cfg)) Seq("icebergCompatV2") else Nil) ++
      propertyFeatures(cfg)

  /** The READER-side declarations `delta.feature.*` properties demand
    * (the reader+writer features among them). */
  private[stac] def cfgReaderFeatures(cfg: Map[String, String]): Seq[String] =
    propertyFeatures(cfg).filter(ReaderWriterFeatures.contains)

  /** `_last_checkpoint` content: version plus the optional `parts` count
    * external writers use for multi-part checkpoints. */
  private[stac] final case class CheckpointRef(version: Long, parts: Option[Int])

  // ---------------------------------------------------------------- internals

  /** One add action node → AddFile, including the optional
    * deletionVector descriptor. */
  private[stac] def parseAddNode(a: JsonNode): AddFile = {
    val dv = Option(a.get("deletionVector")).filterNot(_.isNull).map { d =>
      DvDescriptor(d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
        d.get("sizeInBytes").asInt(), d.get("cardinality").asLong())
    }
    val pv = Option(a.get("partitionValues")).filterNot(_.isNull).map { p =>
      p.asInstanceOf[ObjectNode].properties().asScala.map(e =>
        e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())).toMap
    }.getOrElse(Map.empty[String, String])
    AddFile(a.get("path").asText(), a.get("size").asLong(),
      a.get("modificationTime").asLong(), dv,
      Option(a.get("stats")).filterNot(_.isNull).map(_.asText()), pv,
      Option(a.get("baseRowId")).filterNot(_.isNull).map(_.asLong()),
      Option(a.get("defaultRowCommitVersion")).filterNot(_.isNull).map(_.asLong()),
      Option(a.get("clusteringProvider")).filterNot(_.isNull).map(_.asText()))
  }

  private[stac] def logDir(path: String) = new Path(path, "_delta_log")

  private[stac] def versionFileName(v: Long) = f"$v%020d.json"

  /** `operationMetrics` follows the delta-spark convention (string
    * values keyed by the per-operation metric names) — what DESCRIBE
    * HISTORY consumers read. */
  private[stac] def commitInfo(ts: Long, op: String,
                         metrics: Map[String, Long] = Map.empty): JsonNode = {
    val r = mapper.createObjectNode()
    val b = r.putObject("commitInfo")
    b.put("timestamp", ts)
    b.put("operation", op)
    b.put("engineInfo", "graft-portable-delta")
    if (metrics.nonEmpty) {
      val m = b.putObject("operationMetrics")
      metrics.toSeq.sortBy(_._1).foreach { case (k, v) =>
        m.put(k, v.toString)
      }
    }
    r
  }

  /** Sum of the staged files' logged row counts (stats are harvested
    * for every staged file, so this is exact and free). */
  private[stac] def outputRowsOf(statsByName: Map[String, String]): Long =
    statsByName.values.flatMap { j =>
      try Option(mapper.readTree(j).get("numRecords")).map(_.asLong())
      catch { case _: Exception => None }
    }.sum

  private[stac] def protocolAction(): JsonNode = {
    val r = mapper.createObjectNode()
    val b = r.putObject("protocol")
    b.put("minReaderVersion", MinReaderVersion)
    b.put("minWriterVersion", MinWriterVersion)
    r
  }

  private[stac] def metaDataAction(id: String, schema: StructType,
                             properties: Map[String, String], ts: Long,
                             partitionColumns: Seq[String] = Nil): JsonNode = {
    val r = mapper.createObjectNode()
    val b = r.putObject("metaData")
    b.put("id", id)
    val fmt = b.putObject("format")
    fmt.put("provider", "parquet"); fmt.putObject("options")
    b.put("schemaString", schema.json)
    val pc = b.putArray("partitionColumns")
    partitionColumns.foreach(pc.add)
    val cfg = b.putObject("configuration")
    properties.foreach { case (k, v) => cfg.put(k, v) }
    b.put("createdTime", ts)
    r
  }

  /** Delta-strict schema evolution for mergeSchema appends: NEW columns
    * (top-level or nested in structs) join the table as nullable; a
    * column missing from the batch stays (its new rows read null); a
    * TYPE change is rejected — old files' bytes can't be reinterpreted,
    * so silent coercion would corrupt reads (this is deliberately
    * stricter than [[StacSchema.mergeStructTypes]]'s permissive
    * JSON-inference promotion). Field order: table first, new batch
    * fields appended. */
  private[stac] def evolveSchema(table: StructType, batch: StructType): StructType = {
    val tNames = table.fieldNames.toSet
    val merged = table.fields.map { tf =>
      batch.fields.find(_.name == tf.name) match {
        case Some(bf) => (tf.dataType, bf.dataType) match {
          case (a: StructType, b: StructType) =>
            tf.copy(dataType = evolveSchema(a, b),
              nullable = tf.nullable || bf.nullable)
          case (a, b) =>
            require(DataType.equalsIgnoreNullability(a, b),
              s"mergeSchema cannot change column '${tf.name}': table " +
                s"${a.simpleString} vs batch ${b.simpleString}")
            tf.copy(nullable = tf.nullable || bf.nullable)
        }
        case None => tf.copy(nullable = true)
      }
    } ++ batch.fields.filterNot(f => tNames.contains(f.name)).map(_.copy(nullable = true))
    StructType(merged)
  }

  /** `delta.columnMapping.mode` — "name"/"id" switches the table to
    * physical column names in the parquet bytes. */
  val ColumnMappingModeProp = "delta.columnMapping.mode"
  private[stac] val MaxColumnIdProp = "delta.columnMapping.maxColumnId"
  private[stac] def mappedCfg(cfg: Map[String, String]): Boolean =
    cfg.get(ColumnMappingModeProp).exists(m => m == "name" || m == "id")

  /** The PHYSICAL shape of a mapped table's schema — the names the
    * parquet bytes (and their footer stats) carry. */
  private[stac] def physSchemaOf(schema: StructType): StructType =
    StructType(schema.fields.toSeq.map(f =>
      StructField(physFieldName(f), physDataType(f.dataType), f.nullable)))

  /** Project `df` (logical names) to the physical column names of
    * `tableSchema` for staging into a column-mapped table; partition
    * column names translate alongside. The positional struct cast
    * renames nested fields — sound because the physical schema is a
    * node-for-node rename of the logical one. */
  private[stac] def toPhysical(df: DataFrame, tableSchema: StructType,
                         partitionBy: Seq[String],
                         passThrough: Set[String] = Set.empty)
      : (DataFrame, Seq[String]) = {
    val byName = tableSchema.fields.map(f => f.name -> f).toMap
    val cols = df.schema.fields.toSeq.map { c =>
      byName.get(c.name) match {
        case Some(f) =>
          quotedCol(c.name)
            .cast(physDataType(f.dataType)).as(physFieldName(f))
        case None if passThrough.contains(c.name) =>
          // the row-tracking materialized column lives OUTSIDE the table
          // schema; it is already physically named (whatever name the
          // table's MaterializedRowIdProp configures)
          quotedCol(c.name)
        case None => throw new IllegalArgumentException(
          s"column ${c.name} not in the mapped table schema " +
            s"${tableSchema.fieldNames.mkString("[", ", ", "]")}")
      }
    }
    (df.select(cols: _*), partitionBy.map(n => physFieldName(byName(n))))
  }

  /** Deep-nullable mirror of a type (every struct field / array element
    * / map value nullable) — the read-side cast target for bytes parquet
    * may have written with relaxed nullability. */
  private[graft] def deepNullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = deepNullable(f.dataType), nullable = true)))
    case org.apache.spark.sql.types.ArrayType(e, _) =>
      org.apache.spark.sql.types.ArrayType(deepNullable(e), containsNull = true)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      org.apache.spark.sql.types.MapType(deepNullable(k), deepNullable(v),
        valueContainsNull = true)
    case other => other
  }

  /** Alias-prefixed exact reference (`t`.`a.b` style) — the join-side
    * sibling of [[quotedCol]]. */
  private[stac] def quotedCol(alias: String, name: String): org.apache.spark.sql.Column =
    StacSchema.quotedCol(alias, name)

  /** Column reference by EXACT name: backquoted (with doubling for
    * literal backquotes) so a field name containing a dot is one
    * column, never a nested path — `col("a.b")` would silently resolve
    * into a sibling struct. Every projection over table/physical field
    * NAMES must use this, not bare col(). */
  private[stac] def quotedCol(name: String): org.apache.spark.sql.Column =
    StacSchema.quotedCol(name)

  /** A field's parquet-physical name under column mapping (falls back
    * to the logical name when no mapping metadata is present). */
  private[stac] def physFieldName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** Recursively rename a data type's struct fields to their physical
    * names (arrays/maps recurse into their element/value types). */
  private[stac] def physDataType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(physFieldName(f), physDataType(f.dataType), f.nullable)))
    case org.apache.spark.sql.types.ArrayType(e, n) =>
      org.apache.spark.sql.types.ArrayType(physDataType(e), n)
    case org.apache.spark.sql.types.MapType(k, v, n) =>
      org.apache.spark.sql.types.MapType(physDataType(k), physDataType(v), n)
    case other => other
  }

  /** The spec's partitionValues object on an add action (null value =
    * hive default/null partition). */
  private[stac] def putPartitionValues(b: ObjectNode,
                                 pv: Map[String, String]): Unit = {
    val o = b.putObject("partitionValues")
    pv.foreach { case (k, v) => if (v == null) o.putNull(k) else o.put(k, v) }
  }

  /** Atomic put-if-absent commit: write the actions to a hidden temp
    * name in `_delta_log`, then rename to the version file. Rename onto
    * an existing destination fails on filesystems honoring the Delta
    * storage contract (HDFS, local) → a lost race surfaces as a clear
    * concurrent-commit error, never a clobbered log. */
  // ======================= version checksum files =======================

  /** The `<version>.crc` VERSION CHECKSUM artifact (delta-spark's
    * `VersionChecksum`, one JSON object per committed version): a
    * post-commit summary of table state — total data bytes, live file
    * count, the current `metaData` and `protocol` action bodies, per-appId
    * transaction watermarks, and live domain metadata. Two uses:
    * [[tableStats]] answers numFiles/sizeInBytes in O(1) without ever
    * touching the add list (on a million-file table that is the
    * difference between a metadata read and a checkpoint scan), and
    * [[validateChecksum]] recomputes the state independently and fails
    * NAMING the drifted field — corruption or a non-compliant concurrent
    * writer surfaces at the next validation instead of as a silent wrong
    * read much later.
    *
    * `setTransactions` is None when the writer omitted the field (the
    * delta-spark behavior past a size cap — absence means "unknown",
    * never "empty", so validation skips the comparison). */
  final case class TableChecksum(
      version: Long,
      tableSizeBytes: Long,
      numFiles: Long,
      metadata: ObjectNode,
      protocol: ObjectNode,
      setTransactions: Option[Map[String, Long]],
      txnLastUpdated: Map[String, Long],
      domainMetadata: Map[String, String],
      inCommitTimestamp: Option[Long])

  final case class TableStats(version: Long, numFiles: Long,
                              sizeInBytes: Long)

  /** DESCRIBE DETAIL's row (the delta-spark column set). */
  final case class TableDetail(
      format: String, id: String, location: String,
      createdAt: Option[Long], lastModified: Option[Long],
      partitionColumns: Seq[String], clusteringColumns: Seq[String],
      numFiles: Long, sizeInBytes: Long,
      properties: Map[String, String],
      minReaderVersion: Int, minWriterVersion: Int,
      tableFeatures: Seq[String])

  private[stac] def commit(conf: Configuration, path: String, version: Long,
                           actions: Seq[JsonNode],
                           tableCfg: Map[String, String] = Map.empty,
                           crcDelta: Option[(Long, Long)] = None): Unit = {
    val dir = logDir(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    // icebergCompatV2 obligations gate EVERY commit before any byte lands
    requireIcebergCompatV2(path, actions, tableCfg)
    // inCommitTimestamps (writer feature): when the table property
    // enables it, stamp the commitInfo with a MONOTONIC in-commit
    // timestamp — max(wall clock, predecessor's commit time + 1), the
    // spec's clock-skew-proof ordering. The predecessor's time prefers
    // its own ICT ([[commitInfoOf]]) and survives log truncation via
    // the history sidecar, so monotonicity holds across cleanupLog.
    if (tableCfg.get(IctProp).contains("true") && version >= 0) {
      val prevTs =
        if (version == 0) 0L
        else {
          val prev = new Path(dir, versionFileName(version - 1))
          if (fs.exists(prev)) commitInfoOf(fs, prev)._2
          else readHistorySidecar(fs, path).toMap
            .get(version - 1).map(_._2).getOrElse(0L)
        }
      val ict = math.max(System.currentTimeMillis(), prevTs + 1)
      actions.find(_.has("commitInfo")).foreach(n =>
        n.get("commitInfo").asInstanceOf[ObjectNode]
          .put("inCommitTimestamp", ict))
    }
    val finalP = new Path(dir, versionFileName(version))
    val tmp = new Path(dir, s".tmp-${versionFileName(version)}-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try actions.foreach { a =>
      out.write(mapper.writeValueAsBytes(a)); out.write('\n')
    } finally out.close()
    // the put-if-absent publishes through the LOG STORE seam
    // ([[GraftLogStore]]): default = exists-check + rename under a
    // JVM-wide lock (exact for same-JVM writers; cross-process atomic
    // on rename-refusing filesystems — HDFS/ABFS/GCS, the Delta
    // storage contract); object stores without atomic rename plug a
    // coordinated implementation via spark.graft.delta.logStore.impl.
    val renamed = GraftLogStore.resolve(conf).putIfAbsent(fs, tmp, finalP)
    if (!renamed) {
      fs.delete(tmp, false)
      throw new ConcurrentCommitException(
        s"concurrent commit detected: $finalP exists; rebasing against the new version")
    }
    // version checksum: incremental from the predecessor's crc — never
    // fatal (the commit above is already durable; a broken chain re-seeds
    // at the next checkpoint or tableStats call)
    try writeCommitChecksum(conf, path, version, actions, crcDelta)
    catch { case scala.util.control.NonFatal(_) => () }
    // delta.checkpointInterval (the delta-spark post-commit cadence):
    // when the table property is set, every interval-th commit writes a
    // checkpoint automatically — the maintenance knob that keeps replay
    // cost bounded without an external scheduler. Only honored when
    // EXPLICITLY configured (no silent default-10 surprise for tables
    // driving [[checkpoint]] themselves), and non-fatal: the commit is
    // durable already; a failed checkpoint must not fail the verb (the
    // delta semantic — the next interval retries).
    tableCfg.get("delta.checkpointInterval")
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption).filter(_ > 0)
      .foreach { iv =>
        if (version > 0 && version % iv == 0)
          SparkSession.getActiveSession.foreach { s =>
            // delta.checkpointPolicy=v2 routes the cadence through the
            // v2 (UUID + sidecar) layout external engines expect there
            try {
              if (tableCfg.get("delta.checkpointPolicy").contains("v2"))
                checkpointV2(s, path)
              else checkpoint(s, path)
            } catch {
              case scala.util.control.NonFatal(e) =>
                System.err.println(
                  s"[portable-delta] auto-checkpoint at $path v$version failed " +
                    s"(commit is durable; next interval retries): ${e.getMessage}")
            }
          }
      }
    // delta-spark's symlink-manifest compatibility property: every
    // commit regenerates the Presto/Trino manifests. Non-fatal (the
    // commit is durable; a DV-carrying commit refuses by name and the
    // warning tells the operator which guard fired).
    if (tableCfg.get("delta.compatibility.symlinkFormatManifest.enabled")
        .contains("true"))
      SparkSession.getActiveSession.foreach { s =>
        try generateSymlinkManifest(s, path)
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[portable-delta] symlink-manifest regen at $path " +
                s"v$version failed: ${e.getMessage}")
        }
      }
  }


  private[stac] def currentSnapshot(conf: Configuration, path: String): Option[Snapshot] = {
    val dir = logDir(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return None
    val versioned = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.matches("\\d{20}\\.json"))
      .map(st => st.getPath.getName.stripSuffix(".json").toLong -> st.getPath)
      .sortBy(_._1)
    val jsons = versioned.toMap
    val spanEnds = compactedSpans(fs, path).values.flatten.map(_._1)
    val truncated = " — this log is checkpoint-truncated; use snapshot(spark, path)"
    val current = (jsons.keySet ++ spanEnds).maxOption match {
      case Some(c) => c
      case None =>
        require(checkpointRefFor(conf, path).isEmpty,
          s"Delta log at $dir has no JSON commits$truncated")
        return None
    }
    // replay through the plan: compacted spans substitute for their
    // commits wherever usable (longest first), plain JSON elsewhere
    val plan = replayPlan(fs, path, jsons, 0L, current)
    require(plan.isDefined,
      s"non-contiguous Delta log at $dir: versions ${versioned.map(_._1).mkString(",")}" +
        (if (checkpointRefFor(conf, path).isDefined) truncated else ""))
    val st = new ReplayState(path)
    plan.get.foreach(p => applyJsonCommit(fs, p, st))
    require(st.schemaJson.nonEmpty, s"Delta log at $dir has no metaData action")
    Some(st.toSnapshot(current))
  }
}
