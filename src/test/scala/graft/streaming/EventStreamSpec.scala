package graft.streaming

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def stageEvents(dst: java.nio.file.Path, copies: Int = 1): Unit = {
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    (1 to copies).foreach { i =>
      java.nio.file.Files.copy(src, dst.resolve(s"events_$i.parquet"))
    }
  }

  /** Batch leg over a staged copy with `ts`/`us` normalized the same way
    * `Tables.events` does — robust to either physical ts type. */
  private def batchEvents(path: String) = {
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("us")))
      case _ =>
        raw.withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts", timestamp_micros(col("us")))
    }
  }

  test("watermarked hourly aggregation matches the batch plan") {
    val dir = java.nio.file.Files.createTempDirectory("ev")
    stageEvents(dir)
    val q = EventStream.hourlyAgg(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly")
      .select(col("hour"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("hour"), col("event_type")).collect()
    val batch = batchEvents(s"$dir/events_1.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")).cast("double") / 100.0).as("total_value"))
      .orderBy(col("hour"), col("event_type")).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("streaming dedup drops replayed events") {
    val dir = java.nio.file.Files.createTempDirectory("evdup")
    stageEvents(dir, copies = 2) // every event delivered twice
    val q = EventStream.dedup(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val total = spark.read.parquet(dir.toString).count()
    val distinct = spark.table("dedup").count()
    assert(total == 2 * distinct, s"staged $total, deduped $distinct")
  }

  test("session windows per user produce disjoint sessions") {
    val dir = java.nio.file.Files.createTempDirectory("evses")
    stageEvents(dir)
    val q = EventStream.sessions(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val sessions = spark.table("sessions")
      .select(col("user_id"), col("session_start").cast("long"),
        col("session_end").cast("long")).collect()
    assert(sessions.nonEmpty)
    // sessions of one user must not overlap
    sessions.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 <= s2, "overlapping sessions")
        case _ =>
      }
    }
  }

  test("sliding windows put each event in exactly two windows") {
    val dir = java.nio.file.Files.createTempDirectory("evslide")
    stageEvents(dir)
    val q = EventStream.slidingAgg(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val slidingTotal = spark.table("sliding").agg(sum("n")).head().getLong(0)
    val events = spark.read.parquet(s"$dir/events_1.parquet").count()
    assert(slidingTotal == 2 * events, s"each event should land in 2 windows: $slidingTotal vs $events")
  }

  test("stream-stream interval join matches the equivalent batch range join") {
    val dir = java.nio.file.Files.createTempDirectory("evssj")
    stageEvents(dir)
    val q = EventStream.purchaseClickJoin(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssj").count()
    val ev = batchEvents(s"$dir/events_1.parquet")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("lo"),
        (col("us") + 600000000L).as("hi"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("us"))
    val batch = p.join(c, col("user_id") === col("cu") &&
      col("us") >= col("lo") && col("us") < col("hi")).count()
    assert(streamed == batch, s"stream-stream join $streamed vs batch $batch")
  }

  test("flatMapGroupsWithState running totals converge to the batch aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("evstate")
    stageEvents(dir)
    val q = EventStream.userRunningStats(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("ustats")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode emits one row per user per micro-batch; the final state is
    // the row with the highest n_events per user
    val finalRows = spark.table("ustats")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("value_cents"), col("last_us"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.value_cents"), col("s.last_us"))
      .orderBy(col("user_id")).collect()
    val batch = batchEvents(s"$dir/events_1.parquet")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"),
        max(col("us")).as("last_us"))
      .orderBy(col("user_id")).collect()
    assert(finalRows.length == batch.length)
    finalRows.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("incremental sync (K6 analog) picks up only new files, exactly once") {
    val src = java.nio.file.Files.createTempDirectory("evsrc")
    val out = java.nio.file.Files.createTempDirectory("evout").toString + "/data"
    val ckpt = java.nio.file.Files.createTempDirectory("evckpt").toString

    stageEvents(src)
    EventStream.incrementalSync(spark, src.toString, out, ckpt).awaitTermination(120000)
    val n1 = spark.read.parquet(out).count()

    // no new data → no new rows
    EventStream.incrementalSync(spark, src.toString, out, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(out).count() == n1)

    // new file arrives → only its rows are appended
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), src.resolve("events_new.parquet"))
    EventStream.incrementalSync(spark, src.toString, out, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(out).count() == 2 * n1)
  }
}
