package graft.queries

import graft.QuerySpec
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming operators under the value-checked gate: the streaming job runs
  * to completion (Trigger.AvailableNow → memory sink) inside the query
  * function and the materialized result is compared against the batch
  * oracle — proving the watermarked streaming pipeline computes exactly
  * the batch answer, not just "some rows".
  */
object StreamingOps {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "st01_streaming_hourly",
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%dT%H:%M:%SZ') AS hour,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2"""),
      (s, dir) => {
        // stage the events file as a streaming source dir (cleaned on exit)
        val src = java.nio.file.Files.createTempDirectory("st01src")
        val staged = src.resolve("events.parquet")
        src.toFile.deleteOnExit(); staged.toFile.deleteOnExit()
        java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), staged)
        val name = s"st01_${System.nanoTime()}"
        val q = EventStream.hourlyAgg(EventStream.readEvents(s, src.toString))
          .writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        // bounded wait: a wedged micro-batch fails this query like any
        // other gate error instead of hanging the whole Verify run
        if (!q.awaitTermination(300000)) {
          q.stop()
          throw new RuntimeException("st01 streaming job did not finish within 300s")
        }
        s.table(name)
          .select(date_format(col("hour"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("hour"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      timed = false)
  )
}
