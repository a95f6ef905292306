package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.7 notes the reference's only
  * streaming-like behaviors: lazy RecordBatchReader pipelining and the
  * `updated_after` incremental sync K6, `pgstac_reader.py:340-383`).
  *
  * This module gives the engine the real streaming constructs a 100-TB
  * pipeline needs: watermarked tumbling/sliding windows, streaming
  * dedup-by-key, session windows, and an incremental batch (AvailableNow)
  * sync that mirrors K6's at-least-once watermark pattern with exactly-once
  * file-sink semantics via checkpointing.
  */
object EventStream {

  /** The events schema as the CURRENT generator writes it
    * (TIMESTAMP(MICROS)) — the fallback when [[readEvents]]' footer probe
    * finds no files yet (a stream may legally start over an empty
    * directory primed later; the probe would throw "unable to infer
    * schema"). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over an events directory. A file stream needs its
    * schema up front; the physical `ts` type depends on how the source
    * parquet was generated (TIMESTAMP(NANOS)→Long under nanosAsLong, or
    * TIMESTAMP(MICROS)→timestamp/ntz), so take it from one driver-side
    * footer read of the directory and normalize `ts` to µs TimestampType
    * either way — the same dual-shape contract as `Tables.events`. The
    * probe is O(footers), not a scan; pass `schema` explicitly (or prime
    * the directory) when the source starts empty AND its eventual shape
    * is not [[eventsSchema]]. */
  def readEvents(spark: SparkSession, dir: String,
                 schema: Option[StructType] = None): DataFrame = {
    val fileSchema = schema.getOrElse(
      try spark.read.parquet(dir).schema
      catch { // no files yet (empty or missing dir): start on the static shape
        case _: org.apache.spark.sql.AnalysisException => eventsSchema
      })
    val raw = spark.readStream.schema(fileSchema).parquet(dir)
    fileSchema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Exact-cents sum — the SINGLE definition of the cross-engine money
    * convention shared by the windowed/session/enrichment aggregates
    * (st04's state machine deliberately uses a floor(+0.5) form instead;
    * that difference is part of its pinned contract). */
  private def centsSum(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(round(value * 100, 0).cast("long"))

  /** Sliding-window aggregation: 1-hour windows every 30 minutes — each
    * event lands in two windows (vs one in the tumbling form below). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Stream-stream interval join: clicks joined to the same user's
    * purchases within `intervalMinutes` after the purchase (default 10).
    * Both sides carry watermarks, so the join state is bounded — Spark
    * drops buffered rows once they age past watermark + interval
    * (late-data handling built in). */
  def purchaseClickJoin(events: DataFrame, intervalMinutes: Int = 10): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("cts") >= col("pts") &&
        col("cts") < col("pts") + expr(s"INTERVAL $intervalMinutes MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("user_id"))
  }

  /** Watermarked tumbling-window aggregation (count + exact cent sum). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (centsSum(col("value")).cast("double") / 100.0).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Streaming dedup: drop duplicate event_ids within the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id", "ts")

  /** Stream-static enrichment: the streaming side joins a STATIC
    * dimension frame (broadcast per micro-batch — stateless, no
    * watermark needed on either side; the planner re-reads the static
    * side each batch, so a dim table updated between batches is picked
    * up) and aggregates per dim attribute. The standard "enrich the
    * event firehose against a slowly-changing dim" shape. */
  def staticEnrichedAgg(events: DataFrame, dim: DataFrame,
                        dimKey: String, dimAttr: String): DataFrame =
    events.join(broadcast(dim.select(col(dimKey).as("user_id"),
        col(dimAttr).as("segment"))), "user_id")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        centsSum(col("value")).as("value_cents"))

  /** Session windows per user (30-minute gap). */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        centsSum(col("value")).as("value_cents"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("value_cents"))

  /** Per-user running totals as an explicit state machine
    * (`flatMapGroupsWithState` — the arbitrary-stateful-processing hook for
    * logic that windowed aggregation can't express). State is one compact
    * tuple per user, partitioned by the grouping key across executors; each
    * micro-batch folds its events into the state and emits the updated
    * summary (Update mode). Exact integer-cents arithmetic as everywhere. */
  final case class UserEvent(user_id: Long, value: Double, us: Long)
  final case class UserStat(user_id: Long, n_events: Long, value_cents: Long, last_us: Long)

  def userRunningStats(events: DataFrame): Dataset[UserStat] = {
    val evs = events
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .as[UserEvent](Encoders.product[UserEvent])
    evs.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[(Long, Long, Long), UserStat](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[(Long, Long, Long)]) =>
          var (n, cents, last) = state.getOption.getOrElse((0L, 0L, 0L))
          it.foreach { e =>
            n += 1
            cents += math.floor(e.value * 100 + 0.5).toLong
            if (e.us > last) last = e.us
          }
          state.update((n, cents, last))
          Iterator(UserStat(uid, n, cents, last))
      }(Encoders.product[(Long, Long, Long)], Encoders.product[UserStat])
  }

  /** K6-analog incremental sync: process whatever is new since the last
    * checkpoint and stop (Trigger.AvailableNow) — repeated invocations
    * only pick up new files, like the reference's `updated_after`
    * partition filter. */
  def incrementalSync(spark: SparkSession, srcDir: String, outDir: String,
                      checkpoint: String): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** EXACTLY-once streaming append into a portable Delta table: each
    * micro-batch commits atomically together with its {appId, batchId}
    * transaction-identifier action, so a batch re-delivered after a
    * crash (same batchId from the recovered checkpoint) is detected in
    * the log and skipped BEFORE any data lands — the Delta
    * idempotent-streaming-writes pattern, upgrading foreachBatch's
    * native at-least-once to exactly-once without a distinct pass on
    * read (st11/st12's documented effectively-once needs one; a Delta
    * reader of this table does not). */
  def deltaSink(df: DataFrame, path: String, appId: String,
                checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.stac.PortableDelta.write(batch, path, mode = "append",
          txn = Some((appId, batchId)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming CDC UPSERT into a Delta table, exactly-once: every
    * micro-batch MERGEs on `keys` (matched target rows die by deletion
    * vector, new row versions + inserts append — the DV-era upsert,
    * never a rewrite), committing atomically WITH its {appId, batchId}
    * transaction action. A crash-replayed batchId is detected in the
    * log and skipped before any position scan or staging — so unlike an
    * append sink, re-delivery can neither double-insert NOR double-
    * apply an update. The first batch creates the table (same txn
    * gate). Source batches must be key-unique (the merge contract);
    * dedup within the batch upstream if the CDC feed can repeat keys. */
  def deltaMergeSink(df: DataFrame, path: String, keys: Seq[String],
                     appId: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.stac.PortableDelta
        val conf = batch.sparkSession.sessionState.newHadoopConf()
        val exists = new org.apache.hadoop.fs.Path(path, "_delta_log")
          .getFileSystem(conf)
          .exists(new org.apache.hadoop.fs.Path(path, "_delta_log"))
        if (!exists)
          PortableDelta.write(batch, path, txn = Some((appId, batchId)))
        else
          PortableDelta.merge(batch.sparkSession, path, batch, keys,
            txn = Some((appId, batchId)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
