package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
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

  /** events.parquet schema as scanned with nanosAsLong (ts = epoch ns). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over an events directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Watermarked tumbling-window aggregation (count + exact cent sum). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")).cast("double") / 100.0).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Streaming dedup: drop duplicate event_ids within the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id", "ts")

  /** Session windows per user (30-minute gap). */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("value_cents"))

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
}
