package graft.streaming

import graft.stac.{PortableDelta, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `readStream.format("portable-delta")` — the declarative V1 streaming
  * source. Contracts: initial snapshot then incremental appends; Spark's
  * OWN checkpoint carries the offsets (restart-exact, mid-snapshot
  * included); rate-limited snapshot drain in bounded slices; exact
  * window reconstruction on restart; startingVersion skips the
  * snapshot; CDF mode replays the change feed; schema pinned at start. */
class PortableDeltaStreamSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def idDf(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"d$i")).toDF("id", "body")
  }

  /** Drain the stream into a thread-safe buffer via foreachBatch —
    * buffers SURVIVE query restarts (unlike the memory sink), so
    * exactly-once claims are assertable across stop/start. */
  private def drain(src: DataFrame, cp: String,
                    buf: java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row])
      : Unit = {
    val q = src.writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(buf.add); ()
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
  }

  test("default mode: initial snapshot, then appends; restart delivers only new data") {
    val path = tmp("pdss") + "/tbl"
    val cp = tmp("pdss-cp")
    PortableDelta.write(idDf(0L until 5L), path)                    // v0
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val src = spark.readStream.format("portable-delta").load(path)
    assert(src.schema.fieldNames.toSeq == Seq("id", "body"))
    drain(src, cp, buf)
    assert(buf.size == 5, s"initial snapshot must deliver 5, got ${buf.size}")
    // new commits between runs arrive EXACTLY once after restart
    PortableDelta.write(idDf(10L until 13L), path, mode = "append") // v1
    PortableDelta.write(idDf(20L until 22L), path, mode = "append") // v2
    drain(spark.readStream.format("portable-delta").load(path), cp, buf)
    val got = buf.toArray(Array.empty[org.apache.spark.sql.Row])
      .map(_.getLong(0)).sorted.toSeq
    assert(got == ((0L until 5L) ++ (10L until 13L) ++ (20L until 22L)),
      s"restart must deliver exactly the new commits: $got")
  }

  test("rate-limited snapshot drains slice-wise; mid-drain restart loses and duplicates nothing") {
    val path = tmp("pdss2") + "/tbl"
    val cp = tmp("pdss2-cp")
    PortableDelta.write(idDf(0L until 40L).repartitionByRange(5, col("id")),
      path)                                                         // v0, 5 files
    // consumer is IDEMPOTENT PER BATCH-ID: a batch whose commit the
    // kill raced (rows delivered, commit log unwritten) is legally
    // REPLAYED on restart — per-epoch overwrite collapses the replay,
    // the foreachBatch contract's split of labor (the st22 gate shape)
    val byEpoch = new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()
    def sink(df: DataFrame, epoch: Long): Unit = {
      byEpoch.put(epoch, df.collect().map(_.getLong(0))); ()
    }
    // stop after the FIRST micro-batch lands: the checkpoint holds a
    // mid-snapshot Sv:k offset
    val q1 = spark.readStream.format("portable-delta")
      .option("maxFilesPerTrigger", "2").load(path)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch((df: DataFrame, e: Long) => sink(df, e)).start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (byEpoch.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    } finally q1.stop()
    import scala.jdk.CollectionConverters._
    val partial = byEpoch.values.asScala.map(_.length).sum
    assert(partial > 0 && partial < 40,
      s"expected a partial snapshot before the stop, got $partial")
    // restart resumes the pinned snapshot at the logged file offset
    val q2 = spark.readStream.format("portable-delta")
      .option("maxFilesPerTrigger", "2").load(path)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch((df: DataFrame, e: Long) => sink(df, e)).start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = byEpoch.values.asScala.toSeq.flatten.sorted
    assert(got == (0L until 40L).toSeq,
      s"mid-snapshot restart must compose to exactly the snapshot: " +
        s"${got.size} rows, dupes=${got.size - got.distinct.size}")
    assert(byEpoch.values.asScala.forall(_.length <= 16),
      "maxFilesPerTrigger=2 must bound every slice")
  }

  test("startingVersion skips the snapshot; rate-limited appends split commits exactly") {
    val path = tmp("pdss3") + "/tbl"
    val cp = tmp("pdss3-cp")
    PortableDelta.write(idDf(0L until 50L), path)                   // v0 (skipped)
    PortableDelta.write(idDf(100L until 104L)
      .repartitionByRange(4, col("id")), path, mode = "append")     // v1, 4 files
    PortableDelta.write(idDf(200L until 202L), path, mode = "append") // v2
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    drain(spark.readStream.format("portable-delta")
      .option("startingVersion", "1")
      .option("maxFilesPerTrigger", "3").load(path), cp, buf)
    val got = buf.toArray(Array.empty[org.apache.spark.sql.Row])
      .map(_.getLong(0)).sorted.toSeq
    assert(got == ((100L until 104L) ++ (200L until 202L)),
      s"appends from v1 only, split across triggers, no loss: $got")
    // the offset log must show a MID-COMMIT position (v1 split by the
    // file budget) — the restart-exactness the declarative route owes
    val offs = new java.io.File(cp, "offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).map { f =>
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          .linesIterator.toSeq.last
      }.toSeq
    assert(offs.exists(_.contains(":")),
      s"expected a mid-commit (v:k) offset in the checkpoint, got $offs")
  }

  test("CDF mode: startingVersion=0 replays the feed; default joins as inserts") {
    val path = tmp("pdss4") + "/tbl"
    PortableDelta.write(idDf(0L until 6L), path,
      properties = Map("delta.enableChangeDataFeed" -> "true"))     // v0
    PortableDelta.delete(spark, path, col("id") % 3 === 0)          // v1
    PortableDelta.write(idDf(50L until 52L), path, mode = "append") // v2
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    drain(spark.readStream.format("portable-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0").load(path), tmp("pdss4-cp"), buf)
    val expected = PortableDelta.readChanges(spark, path, 0L, 2L)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val got = buf.toArray(Array.empty[org.apache.spark.sql.Row])
      .map(r => (r.getLong(0),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("_commit_version")))).sorted.toSeq
    assert(got == expected, s"stream CDF must equal readChanges:\n$got\nvs\n$expected")
    // default (no startingVersion): the table joins as INSERT rows
    // stamped with the pinned version, then incremental changes
    val buf2 = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val cp2 = tmp("pdss4-cp2")
    drain(spark.readStream.format("portable-delta")
      .option("readChangeFeed", "true").load(path), cp2, buf2)
    val snap = buf2.toArray(Array.empty[org.apache.spark.sql.Row])
    assert(snap.length == 6 && snap.forall(
      _.getString(2) == "insert"), "default CDF start is the snapshot as inserts")
    assert(snap.forall(_.getLong(3) == 2L), "stamped with the pinned version")
    PortableDelta.delete(spark, path, col("id") === 50L)            // v3
    drain(spark.readStream.format("portable-delta")
      .option("readChangeFeed", "true").load(path), cp2, buf2)
    val after = buf2.toArray(Array.empty[org.apache.spark.sql.Row])
    assert(after.length == 7 &&
      after.exists(r => r.getLong(0) == 50L && r.getString(2) == "delete"),
      "post-snapshot changes flow as row-level changes")
  }

  test("Trigger.AvailableNow drains rate-limited windows to the prepared target and stops") {
    val path = tmp("pdss6") + "/tbl"
    val cp = tmp("pdss6-cp")
    PortableDelta.write(idDf(0L until 20L).repartitionByRange(4, col("id")),
      path)                                                         // v0, 4 files
    PortableDelta.write(idDf(100L until 102L), path, mode = "append") // v1
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    var batches = 0
    val q = spark.readStream.format("portable-delta")
      .option("maxFilesPerTrigger", "2").load(path)
      .writeStream.option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
        if (rows.nonEmpty) batches += 1
        rows.foreach(buf.add); ()
      }.start()
    assert(q.awaitTermination(300000), "AvailableNow must terminate on its own")
    val got = buf.toArray(Array.empty[org.apache.spark.sql.Row])
      .map(_.getLong(0)).sorted.toSeq
    assert(got == ((0L until 20L) ++ (100L until 102L)),
      s"the drain must cover snapshot + appends exactly once: $got")
    assert(batches >= 3, s"maxFilesPerTrigger=2 over 4+1 files must slice, got $batches")
    // a second AvailableNow run with nothing new terminates with no data
    val buf2 = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val q2 = spark.readStream.format("portable-delta")
      .option("maxFilesPerTrigger", "2").load(path)
      .writeStream.option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(buf2.add); ()
      }.start()
    assert(q2.awaitTermination(300000))
    assert(buf2.isEmpty, "an empty drain must deliver nothing")
  }

  test("user-specified schema refuses; offsets are the human-readable token grammar") {
    val path = tmp("pdss5") + "/tbl"
    PortableDelta.write(idDf(0L until 3L), path)
    val e = intercept[Exception] {
      spark.readStream.format("portable-delta")
        .schema(org.apache.spark.sql.types.StructType(Nil)).load(path)
        .writeStream.format("noop").start()
    }
    assert(e.getMessage.contains("table's own schema"), e.getMessage)
  }
}
