package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stac.{PortableDelta, SparkSpec}

/** The streaming CDF source's offset contract: per-trigger version
  * windows, a watermark that moves only on commit, crash-before-commit
  * re-delivery (at-least-once), and the exactly-once composition with
  * a txn-tagged Delta sink — the full source→sink pipeline both ends
  * of which are this engine's own primitives. */
class DeltaCdfSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/d"

  private def df(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"$tag$i")).toDF("id", "tag")
  }

  test("windows bound by maxVersionsPerTrigger; watermark only moves on commit") {
    val tbl = tmp("cdfsrc") ; val ck = tmp("cdfsrc-ck")
    PortableDelta.write(df(0L until 3L, "a").coalesce(1), tbl)       // v0
    (1 to 4).foreach(k => PortableDelta.write(
      df(Seq(10L + k), "a").coalesce(1), tbl, mode = "append"))      // v1-4
    val src = new DeltaCdfSource(spark, tbl, ck, maxVersionsPerTrigger = 2)
    val Some((w1, to1)) = src.readAvailable()
    assert(to1.version == 1L && w1.count() == 4L) // v0 (3 rows) + v1 (1 row)
    // NOT committed: a re-read returns the SAME window
    val Some((w1b, to1b)) = src.readAvailable()
    assert(to1b.version == 1L && w1b.count() == 4L)
    src.commitProgress(1L)
    val Some((w2, to2)) = src.readAvailable()
    assert(to2.version == 3L && w2.count() == 2L)
    src.commitProgress(3L)
    val Some((w3, to3)) = src.readAvailable()
    assert(to3.version == 4L && w3.count() == 1L)
    src.commitProgress(4L)
    assert(src.readAvailable().isEmpty && src.watermark == 4L)
  }

  test("rate limits pack WHOLE versions by changed-file/byte load; never stall") {
    val tbl = tmp("cdfsrc3"); val ck = tmp("cdfsrc3-ck")
    PortableDelta.write(df(0L until 9L, "a").repartition(3), tbl,
      properties = Map(PortableDelta.CdfProp -> "true"))            // v0: 3 files
    PortableDelta.write(df(10L until 16L, "b").repartition(2), tbl,
      mode = "append")                                              // v1: 2 files
    PortableDelta.write(df(Seq(20L), "c").coalesce(1), tbl,
      mode = "append")                                              // v2: 1 file
    PortableDelta.delete(spark, tbl, col("id") === 20L)             // v3: cdc
    // maxFilesPerTrigger=3: v0 fills trigger 1 exactly; v1+v2 pack
    // trigger 2; v3 rides alone
    val src = new DeltaCdfSource(spark, tbl, ck, maxFilesPerTrigger = Some(3))
    val ends = scala.collection.mutable.ArrayBuffer.empty[Long]
    var rows = 0L
    val n = src.runAvailableNow((changes, to) => {
      ends += to; rows += changes.count()
    })
    assert(ends.toSeq == Seq(0L, 2L, 3L), s"packing drifted: $ends")
    assert(n == 3 && rows >= 9L + 6L + 1L + 1L,
      "every change delivered across the packed windows")
    // a byte budget smaller than any commit still admits one per
    // trigger — an oversized commit cannot stall the stream
    val ck2 = tmp("cdfsrc3-ck2")
    val tiny = new DeltaCdfSource(spark, tbl, ck2, maxBytesPerTrigger = Some(1L))
    val ends2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    tiny.runAvailableNow((_, to) => ends2 += to)
    assert(ends2.toSeq == Seq(0L, 1L, 2L, 3L), s"got $ends2")
  }

  test("crash before commitProgress re-delivers; txn sink makes it exactly-once") {
    val tbl = tmp("cdfpipe") ; val ck = tmp("cdfpipe-ck")
    val down = tmp("cdfpipe-down")
    PortableDelta.write(df(0L until 4L, "a").coalesce(1), tbl)       // v0
    PortableDelta.write(df(4L until 8L, "a").coalesce(1), tbl,
      mode = "append")                                               // v1
    PortableDelta.delete(spark, tbl, col("id") === 0L)               // v2

    // the sink: appends each window's INSERT rows into a downstream
    // Delta table, txn-tagged by the window's end version — the
    // crash-replay dedup the source's at-least-once contract expects
    def sink(changes: org.apache.spark.sql.DataFrame, to: Long): Unit = {
      val ins = changes.filter(col("_change_type") === "insert")
        .select(col("id"), col("tag"))
      PortableDelta.write(ins.coalesce(1), down,
        mode = (if (new java.io.File(s"$down/_delta_log").exists()) "append"
                else "error"),
        txn = Some(("cdf-pipe", to)))
    }
    // trigger 1 processes v0, SINKS it, then "crashes" before
    // commitProgress — the watermark still says -1
    val src1 = new DeltaCdfSource(spark, tbl, ck, maxVersionsPerTrigger = 1)
    val Some((c1, to1)) = src1.readAvailable()
    sink(c1, to1.version)
    assert(src1.watermark == -1L)
    // restart: the SAME window re-delivers; the txn-tagged sink voids
    // the duplicate before any data lands, then progress commits
    val src2 = new DeltaCdfSource(spark, tbl, ck, maxVersionsPerTrigger = 1)
    val n = src2.runAvailableNow { (changes, to) => sink(changes, to) }
    assert(n == 3, s"expected re-delivered v0 + v1 + v2, got $n")
    assert(src2.watermark == 2L)
    // downstream holds each inserted row ONCE (v0's double delivery
    // deduped by the txn gate); v2's delete emitted no inserts
    val got = PortableDelta.readTable(spark, down)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == (0L until 8L).toSet, s"got $got")
    assert(PortableDelta.readTable(spark, down).count() == 8L,
      "exactly-once: no duplicate from the re-delivered window")
    val txns = PortableDelta.snapshot(spark, down).txns
    assert(txns.get("cdf-pipe").contains(2L), s"got $txns")
  }

  test("initial snapshot: late joiner accumulates to the direct read; " +
       "restart-exact mid-snapshot; truncated history is fine") {
    val tbl = tmp("cdfsnap"); val ck = tmp("cdfsnap-ck")
    PortableDelta.write(df(0L until 6L, "a").repartition(3), tbl)    // v0
    PortableDelta.write(df(10L until 14L, "b").repartition(2), tbl,
      mode = "append")                                               // v1
    PortableDelta.delete(spark, tbl, col("id") === 2L)               // v2 (DV)
    // checkpoint + truncate: the early history is GONE — a from-0
    // replay cannot serve this consumer, only the snapshot start can
    assert(PortableDelta.checkpoint(spark, tbl) == 2L)
    PortableDelta.cleanupLog(spark, tbl)
    val replayer = new DeltaCdfSource(spark, tbl, tmp("cdfsnap-ck0"))
    val e = intercept[IllegalArgumentException] {
      replayer.readAvailable().foreach(_._1.count())
    }
    assert(e.getMessage.contains("not available") ||
      e.getMessage.contains("checkpoint-truncated"), e.getMessage)

    // late joiner under a 1-file rate limit: the snapshot drains
    // slice-wise; crash after two slices, restart resumes exactly
    val acc = scala.collection.mutable.Map.empty[Long, String]
    def applyBatch(changes: org.apache.spark.sql.DataFrame): Unit =
      changes.select("id", "tag", "_change_type").collect().foreach { r =>
        if (r.getString(2) == "delete") acc.remove(r.getLong(0))
        else acc(r.getLong(0)) = r.getString(1)
      }
    val src1 = new DeltaCdfSource(spark, tbl, ck,
      maxFilesPerTrigger = Some(1), initialSnapshot = true)
    for (_ <- 0 until 2) src1.readAvailable().foreach { case (d, off) =>
      assert(off.snapshot, "1-file slices of a 5-file snapshot stay in-flight")
      val rows = d.select("id", "tag", "_change_type", "_commit_version").collect()
      assert(rows.forall(r => r.getString(2) == "insert" && r.getLong(3) == 2L),
        "snapshot rows surface as inserts stamped with the pinned version")
      applyBatch(d); src1.commitProgress(off)
    }
    assert(src1.offset.exists(_.snapshot) && src1.watermark == -1L)
    // commits racing PAST the pinned snapshot arrive later as changes
    PortableDelta.write(df(Seq(20L), "c").coalesce(1), tbl,
      mode = "append")                                               // v3
    PortableDelta.delete(spark, tbl, col("id") === 10L)              // v4
    val src2 = new DeltaCdfSource(spark, tbl, ck,
      maxFilesPerTrigger = Some(1), initialSnapshot = true)
    val n = src2.runAvailableNow((d, _) => applyBatch(d))
    assert(n >= 3, s"remaining slices + v3 + v4, got $n")
    assert(src2.watermark == 4L)
    val direct = PortableDelta.readTable(spark, tbl)
      .select("id", "tag").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(acc.toMap == direct,
      s"accumulated state must equal the direct read: $acc vs $direct")
    // caught up, no re-delivery
    assert(new DeltaCdfSource(spark, tbl, ck,
      initialSnapshot = true).readAvailable().isEmpty)
  }
}
