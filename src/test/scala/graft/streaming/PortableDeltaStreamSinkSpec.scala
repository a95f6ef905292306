package graft.streaming

import graft.stac.{PortableDelta, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `writeStream.format("portable-delta")` — the declarative exactly-once
  * Delta sink (the V1 StreamSinkProvider over PortableDelta.write with
  * {appId, batchId} txn actions). Contracts: append across restarts with
  * no duplicates, txn watermarks in the log keyed by the checkpoint
  * location, Complete-mode per-batch overwrite, Update-mode and
  * missing-checkpoint refusals. */
class PortableDeltaStreamSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private val sch = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType)))

  private def stage(dir: String, ids: Seq[Long], name: String): Unit = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"g${i % 2}")).toDF("id", "grp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.stage-$name")
    val part = new java.io.File(s"$dir/.stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dir, s"$name.parquet").toPath)
  }

  private def run(src: String, out: String, cp: String): Unit = {
    val q = spark.readStream.schema(sch).parquet(src)
      .writeStream.format("portable-delta")
      .option("path", out)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("append: exactly-once across restarts, txn watermarks in the log") {
    val src = tmp("pdsink-src"); val out = tmp("pdsink-out") + "/tbl"
    val cp = tmp("pdsink-cp")
    stage(src, 0L until 5L, "a")
    run(src, out, cp)
    assert(PortableDelta.readTable(spark, out)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == (0L until 5L))
    val snap1 = PortableDelta.snapshot(spark, out)
    assert(snap1.txns.keySet == Set(cp),
      s"txn appId must default to the checkpoint location: ${snap1.txns}")
    // restart with NEW data: only the new file lands, nothing re-lands
    stage(src, 10L until 15L, "b")
    run(src, out, cp)
    val got = PortableDelta.readTable(spark, out)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == ((0L until 5L) ++ (10L until 15L)),
      s"restart must append exactly the new batch: $got")
    assert(PortableDelta.snapshot(spark, out).txns(cp) >
      snap1.txns(cp), "the txn watermark must advance")
    // restart with NOTHING new: no commit at all
    val vBefore = PortableDelta.snapshot(spark, out).version
    run(src, out, cp)
    assert(PortableDelta.snapshot(spark, out).version == vBefore)
  }

  test("a crash-replayed batchId is skipped by the LOG, not just the checkpoint") {
    val src = tmp("pdsink2-src"); val out = tmp("pdsink2-out") + "/tbl"
    val cp = tmp("pdsink2-cp")
    stage(src, 0L until 4L, "a")
    run(src, out, cp)
    val n0 = PortableDelta.readTable(spark, out).count()
    // simulate the re-delivery a crashed driver would produce: the same
    // (appId, batchId) arriving again through the write path
    val s = spark; import s.implicits._
    val v = PortableDelta.write(
      Seq((99L, "gx")).toDF("id", "grp"), out, mode = "append",
      txn = Some((cp, 0L)))
    assert(PortableDelta.readTable(spark, out).count() == n0,
      "a replayed batchId must commit NOTHING")
    assert(v == PortableDelta.snapshot(spark, out).version)
  }

  test("Complete mode: each batch logically overwrites — the table is the last totals") {
    val src = tmp("pdsink3-src"); val out = tmp("pdsink3-out") + "/tbl"
    val cp = tmp("pdsink3-cp")
    stage(src, 0L until 6L, "a")
    def runAgg(): Unit = {
      val q = spark.readStream.schema(sch).parquet(src)
        .groupBy("grp").agg(count(lit(1)).as("n"))
        .writeStream.format("portable-delta")
        .outputMode("complete")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runAgg()
    assert(PortableDelta.readTable(spark, out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("g0" -> 3L, "g1" -> 3L))
    stage(src, 6L until 10L, "b")
    runAgg()
    assert(PortableDelta.readTable(spark, out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("g0" -> 5L, "g1" -> 5L),
      "Complete mode must leave exactly the LAST batch's totals")
  }

  test("Update mode: keyed upsert via mergeKeys — latest values win, exactly once") {
    val src = tmp("pdsink6-src"); val out = tmp("pdsink6-out") + "/tbl"
    val cp = tmp("pdsink6-cp")
    stage(src, 0L until 4L, "a")
    def runUpsert(): Unit = {
      val q = spark.readStream.schema(sch).parquet(src)
        .groupBy("id").agg(max("grp").as("grp"), count(lit(1)).as("n"))
        .writeStream.format("portable-delta")
        .outputMode("update")
        .option("path", out)
        .option("checkpointLocation", cp)
        .option("mergeKeys", "id")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runUpsert()
    assert(PortableDelta.readTable(spark, out).count() == 4L)
    // overlapping keys arrive: the second wave UPDATES 0..3, inserts 4..5
    stage(src, 0L until 6L, "b")
    runUpsert()
    val got = PortableDelta.readTable(spark, out).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == (0L until 6L).toSet,
      s"upsert must end with the distinct keys: ${got.keySet}")
    assert(got(0L) == 2L && got(5L) == 1L,
      s"matched keys must carry the LATEST aggregate values: $got")
    // the txn watermark advanced; a replay of the last batchId is a no-op
    val snap = PortableDelta.snapshot(spark, out)
    assert(snap.txns(cp) >= 1L)
    val n0 = PortableDelta.readTable(spark, out).count()
    PortableDelta.merge(spark, out,
      PortableDelta.readTable(spark, out), Seq("id"),
      txn = Some((cp, snap.txns(cp))))
    assert(PortableDelta.snapshot(spark, out).version == snap.version &&
      PortableDelta.readTable(spark, out).count() == n0,
      "a replayed batchId must be skipped at the log")
  }

  test("refusals: Update mode without mergeKeys; missing checkpointLocation") {
    val src = tmp("pdsink4-src")
    stage(src, 0L until 2L, "a")
    val e1 = intercept[Exception] {
      spark.readStream.schema(sch).parquet(src)
        .groupBy("grp").agg(count(lit(1)).as("n"))
        .writeStream.format("portable-delta")
        .outputMode("update")
        .option("path", tmp("pdsink4-out") + "/tbl")
        .option("checkpointLocation", tmp("pdsink4-cp"))
        .trigger(Trigger.AvailableNow())
        .start()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e1).exists(_.contains("mergeKeys")), msgs(e1).mkString(" | "))
    val e2 = intercept[Exception] {
      spark.readStream.schema(sch).parquet(src)
        .writeStream.format("portable-delta")
        .option("path", tmp("pdsink5-out") + "/tbl")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    assert(msgs(e2).exists(_.contains("checkpointLocation")), msgs(e2).mkString(" | "))
  }
}
