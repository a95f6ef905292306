package graft.stac

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, OutputWriterFactory, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("portable-delta").load(path)` — the file-source
  * read path for the portable Delta log, so PLAIN SQL users get the
  * engine's query surface without the Scala API:
  *
  *   CREATE TABLE items USING `portable-delta` OPTIONS (path '/data/items');
  *   SELECT * FROM items WHERE collection = 'sentinel-2' AND dt >= ...;
  *
  * The reference's analytics thesis is "read-back IS the query surface"
  * (docs/usage.md:50-57): its tables are consumed by whatever engine
  * reads the format. GeoParquet already has that here
  * ([[GeoParquetFileFormat]]); this closes the gap for Delta tables.
  *
  * Architecture (Spark-first, the delta-spark shape): a plain V1
  * `RelationProvider` returning a [[HadoopFsRelation]] whose
  * [[FileIndex]] is backed by the LOG, not a directory listing — the
  * same split delta-spark's TahoeLogFileIndex uses. Everything
  * downstream is stock Catalyst: parquet filter pushdown
  * (`PushedFilters` in the scan), column pruning, partition-column
  * injection from the index's `PartitionDirectory` values, whole-stage
  * codegen over the vectorized reader. The only custom code is WHERE
  * the file list comes from — [[PortableDeltaFileIndex.listFiles]]
  * evaluates the query's pushed-down predicates against the log's
  * per-file stats ([[DeltaStats.satisfiable]]) and partitionValues, so
  * file skipping happens at PLANNING time from metadata alone.
  *
  * Scale shape: on a checkpoint-seeded table the add state stays a
  * DataFrame end-to-end ([[PortableDelta.lazyCheckpointState]]) —
  * stats pruning runs on EXECUTORS over the checkpoint's add rows and
  * only the SURVIVING files (the ones the scan must name anyway) reach
  * the driver, the readTableWhere discipline. A million-add table
  * costs the driver O(matching files + JSON tail) per query.
  *
  * Refused BY NAME (never a silent wrong read; `readTable` handles
  * both): tables with column mapping enabled (the parquet bytes store
  * physical `col-<uuid>` names the stock file scan cannot rename
  * back), and scans whose surviving files carry deletion vectors (the
  * stock reader would resurrect deleted rows). */
class PortableDeltaDataSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "portable-delta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "portable-delta requires a path: " +
          "spark.read.format(\"portable-delta\").load(<table dir>) or " +
          "CREATE TABLE ... USING `portable-delta` OPTIONS (path '...')"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    PortableDeltaRelation(sqlContext.sparkSession, pathOf(parameters), parameters)

  /** `df.write.format("portable-delta").mode(...).partitionBy(...)
    * .save(path)` — the DataFrame write surface over
    * [[PortableDelta.write]] (full protocol: stats harvest, constraint/
    * feature gates, optimistic-concurrency commit). `partitionBy`
    * columns arrive through Spark's V1 `__partition_columns` JSON
    * option. SaveMode.Ignore is the spec semantic: an existing table
    * short-circuits without writing. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    val partitionBy: Seq[String] =
      parameters.get("__partition_columns").map { json =>
        import scala.jdk.CollectionConverters._
        val n = PortableDelta.mapper.readTree(json)
        require(n.isArray, s"malformed __partition_columns: $json")
        n.elements().asScala.map(_.asText()).toSeq
      }.getOrElse(Nil)
    val exists = PortableDelta.currentSnapshot(
      spark.sessionState.newHadoopConf(), path).isDefined
    val m = mode match {
      case SaveMode.ErrorIfExists => Some("error")
      case SaveMode.Append => Some("append")
      case SaveMode.Overwrite => Some("overwrite")
      case SaveMode.Ignore => if (exists) None else Some("error")
    }
    m.foreach(mm => PortableDelta.write(data.toDF(), path, mode = mm,
      partitionBy = partitionBy,
      mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean)))
    PortableDeltaRelation(spark, path, parameters - "__partition_columns")
  }

  /** `df.writeStream.format("portable-delta").option("path", ...)` —
    * the declarative form of [[graft.streaming.EventStream.deltaSink]]:
    * every micro-batch commits atomically WITH its {appId, batchId}
    * transaction action, so a crash-replayed batch (same batchId from
    * the recovered checkpoint) is detected in the log and skipped
    * before any data lands — EXACTLY-once, the Delta idempotent-
    * streaming-writes pattern. Append mode appends; Complete mode is a
    * per-batch logical overwrite (the table ends as the last batch);
    * Update refuses (no key contract here — use
    * [[graft.streaming.EventStream.deltaMergeSink]]). The txn appId
    * defaults to the CHECKPOINT location (stable across restarts —
    * exactly the property exactly-once needs); override with
    * option("txnAppId", ...) when two queries share a checkpoint dir
    * layout. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = pathOf(parameters)
    import org.apache.spark.sql.streaming.OutputMode._
    val mode = outputMode match {
      case m if m == Append() => "append"
      case m if m == Complete() => "overwrite"
      case other => throw new IllegalArgumentException(
        s"portable-delta sink supports Append and Complete output " +
          s"modes, got $other — for keyed upserts use " +
          "EventStream.deltaMergeSink")
    }
    val appId = parameters.getOrElse("txnAppId",
      parameters.getOrElse("checkpointLocation",
        throw new IllegalArgumentException(
          "portable-delta sink needs a checkpointLocation (or an " +
            "explicit txnAppId) — the exactly-once txn id derives from it")))
    new PortableDeltaSink(path, mode, appId, partitionColumns,
      parameters.get("mergeSchema").exists(_.toBoolean))
  }
}

/** The V1 micro-batch sink behind `writeStream.format("portable-delta")`.
  * addBatch rewraps the incremental frame as a replayable batch
  * ([[org.apache.spark.sql.GraftSqlShim.replayableBatch]] — the
  * ForeachBatchSink idiom) and routes it through [[PortableDelta.write]]
  * with the {appId, batchId} txn action: full protocol (stats harvest,
  * writer gates, optimistic commit) plus log-level idempotence. */
private[stac] class PortableDeltaSink(path: String, mode: String,
    appId: String, partitionBy: Seq[String], mergeSchema: Boolean)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.GraftSqlShim.replayableBatch(data)
    PortableDelta.write(batch, path,
      mode = if (PortableDelta.currentSnapshot(
          batch.sparkSession.sessionState.newHadoopConf(), path).isEmpty)
        "error" else mode,
      txn = Some((appId, batchId)),
      partitionBy = partitionBy, mergeSchema = mergeSchema)
    ()
  }

  override def toString: String = s"PortableDeltaSink[$path, $mode]"
}

/** Read-only [[ParquetFileFormat]] for the relation: Catalyst routes
  * `INSERT INTO` on a HadoopFsRelation-backed table through the stock
  * file-write command, which would land parquet files the Delta log
  * never commits — INVISIBLE rows (the log is the source of truth), a
  * silent data loss. Refuse LOUDLY at write planning; reads inherit
  * the full vectorized parquet path untouched. */
private[stac] class PortableDeltaReadOnlyFormat extends ParquetFileFormat {
  override def prepareWrite(sparkSession: SparkSession,
                            job: org.apache.hadoop.mapreduce.Job,
                            options: Map[String, String],
                            dataSchema: StructType): OutputWriterFactory =
    throw new UnsupportedOperationException(
      "INSERT INTO a portable-delta table would bypass the Delta log " +
        "(the written files would be invisible to every reader) — use " +
        "df.write.format(\"portable-delta\").mode(\"append\").save(path) " +
        "or PortableDelta.write instead")
}

object PortableDeltaRelation {

  /** Build the relation: ONE log replay pins (schema, partition
    * columns, version, add frame) — a consistent snapshot; concurrent
    * commits after this point are invisible to the relation (standard
    * Delta snapshot-isolation read semantics). Time travel via the
    * `versionAsOf` / `timestampAsOf` options (the delta-spark names):
    * the pinned state replays to that version ([[PortableDelta
    * .snapshotAt]] — file list materialized like the readTable(version)
    * API, the bounded-age-history trade documented there). */
  def apply(spark: SparkSession, tablePath: String,
            options: Map[String, String]): BaseRelation = {
    val conf = spark.sessionState.newHadoopConf()
    val vOpt = options.get("versionAsOf").map(_.trim.toLong)
    val tsOpt = options.get("timestampAsOf").map { s =>
      scala.util.Try(s.trim.toLong).getOrElse(
        java.sql.Timestamp.valueOf(s.trim.replace('T', ' ')
          .stripSuffix("Z")).getTime)
    }
    require(vOpt.isEmpty || tsOpt.isEmpty,
      "specify versionAsOf OR timestampAsOf, not both")
    val asOf: Option[Long] = vOpt.orElse(
      tsOpt.map(PortableDelta.versionAtTimestamp(conf, tablePath, _)))
    val (snapBase, addsDf) = asOf match {
      case Some(v) =>
        val snap = PortableDelta.snapshotAt(spark, tablePath, v)
        (snap.copy(files = Nil),
          PortableDelta.addFilesToFlatDf(spark, snap.files))
      case None =>
        PortableDelta.checkpointRefFor(conf, tablePath) match {
          case Some(ref) =>
            PortableDelta.lazyCheckpointState(spark, tablePath, ref)
          case None =>
            val snap = PortableDelta.snapshot(conf, tablePath)
            (snap.copy(files = Nil),
              PortableDelta.addFilesToFlatDf(spark, snap.files))
        }
      }
    if (PortableDelta.mappedCfg(snapBase.configuration))
      throw new IllegalStateException(
        s"portable-delta relation at $tablePath refused: column mapping " +
          "is enabled and the parquet bytes store physical column names " +
          "— read through PortableDelta.readTable instead")
    val index = new PortableDeltaFileIndex(spark, tablePath, snapBase, addsDf)
    // nullable-on-read, the readTable contract: parquet bytes relax
    // struct-field nullability and evolved tables surface null for
    // columns absent from old files — the read schema cannot promise
    // more than the files deliver (deepNullable keeps field METADATA:
    // geoarrow extension tags flow through to the scan output)
    val dataSchema = StructType(snapBase.schema.fields.filterNot(f =>
        snapBase.partitionColumns.exists(_.equalsIgnoreCase(f.name)))
      .map(f => f.copy(
        dataType = PortableDelta.deepNullable(f.dataType), nullable = true)))
    HadoopFsRelation(index, index.partitionSchema, dataSchema,
      bucketSpec = None, new PortableDeltaReadOnlyFormat, options)(spark)
  }
}

/** Log-backed [[FileIndex]]: the planner's question "which files must
  * this query read?" answered from the Delta log's per-file stats and
  * partitionValues — no directory listing, no footer I/O. Pinned at
  * build time to one table version (snapshot isolation). */
final class PortableDeltaFileIndex(
    spark: SparkSession,
    tablePath: String,
    private[stac] val snapBase: PortableDelta.Snapshot,
    addsDf: DataFrame) extends FileIndex {

  /** Exposed for gates/tests: the version this relation reads. */
  def version: Long = snapBase.version

  /** The pinned flat add frame + table path — the
    * [[OptimizeDeltaMetadataOnlyAgg]] seam. */
  private[stac] def adds: DataFrame = addsDf
  private[stac] def path: String = tablePath
  private[stac] def session: SparkSession = spark

  override val partitionSchema: StructType = StructType(
    snapBase.partitionColumns.map { n =>
      snapBase.schema.fields.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalStateException(
          s"partition column $n missing from schema of $tablePath"))
        .copy(nullable = true) // the hive null partition reads as null
    })

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def refresh(): Unit = () // pinned snapshot — nothing to refresh

  /** Total live bytes from the log (drives broadcast decisions). One
    * executor-side fold over the add frame; never the file list. */
  override lazy val sizeInBytes: Long = {
    import org.apache.spark.sql.functions.sum
    val r = addsDf.agg(sum("size")).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  override def inputFiles: Array[String] =
    addsDf.select("path").collect().map(r =>
      PortableDelta.resolvedDataPath(tablePath, r.getString(0)).toString)

  /** The pruning seam. Flat add-frame columns (FlatAddSchema): 0=path,
    * 1=size, 2=modificationTime, 3=dv_storageType, 8=stats,
    * 9=partitionValues. Partition filters AND data filters both route
    * through [[DeltaStats.satisfiable]] — partition pruning is exactly
    * data skipping over point ranges (min = max = the hive value), so
    * one conservative evaluator serves both. Spark re-applies the
    * partition filters over the returned directory values and the full
    * predicate over rows; a file kept too eagerly costs I/O, never
    * correctness — and a file dropped wrongly cannot happen because
    * satisfiable() keeps on any uncertainty. */
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val schema = snapBase.schema
    val pred = (partitionFilters ++ dataFilters)
      .reduceOption(And).getOrElse(Literal.TrueLiteral)
    val survivors = addsDf.filter { (r: org.apache.spark.sql.Row) =>
      val pv = if (r.isNullAt(9)) Map.empty[String, String]
               else r.getMap[String, String](9).toMap
      DeltaStats.satisfiable(Option(r.getString(8)), pv, schema, pred)
    }.collect()

    val withDv = survivors.filter(r => !r.isNullAt(3))
    require(withDv.isEmpty,
      s"portable-delta scan of $tablePath refused: ${withDv.length} " +
        s"surviving file(s) carry deletion vectors the stock parquet " +
        "reader would ignore (deleted rows would resurrect) — read " +
        "through PortableDelta.readTable instead")

    survivors.toSeq
      .groupBy(r => if (r.isNullAt(9)) Map.empty[String, String]
                    else r.getMap[String, String](9).toMap)
      .map { case (pv, rows) =>
        val statuses = rows.map { r =>
          new FileStatus(r.getLong(1), false, 0, 128L * 1024 * 1024,
            r.getLong(2),
            PortableDelta.resolvedDataPath(tablePath, r.getString(0)))
        }.toArray
        PartitionDirectory(partitionRow(pv), statuses)
      }.toSeq
  }

  /** Log partitionValues (hive-serialized strings, LOG-authoritative —
    * never directory names) → one typed InternalRow in partitionSchema
    * order. An undecodable value errors loudly: silently nulling it
    * would answer queries wrong. */
  private def partitionRow(pv: Map[String, String]): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
      pv.get(f.name).orElse(
          pv.collectFirst { case (k, v) if k.equalsIgnoreCase(f.name) => v })
        match {
          case None | Some(null) => null
          case Some("__HIVE_DEFAULT_PARTITION__") => null
          case Some(v) => castPartitionValue(v, f.dataType, f.name)
        }
    })

  private def castPartitionValue(v: String, dt: DataType, name: String): Any = {
    val out = try
      Cast(Literal(UTF8String.fromString(v), org.apache.spark.sql.types.StringType),
        dt, Option("UTC")).eval(null)
    catch { case scala.util.control.NonFatal(e) =>
      throw new IllegalArgumentException(
        s"undecodable partition value for $name in $tablePath: '$v' as $dt", e)
    }
    if (out == null) throw new IllegalArgumentException(
      s"undecodable partition value for $name in $tablePath: '$v' as $dt")
    out
  }
}
