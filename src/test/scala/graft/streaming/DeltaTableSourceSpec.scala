package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stac.{PortableDelta, SparkSpec}

/** The plain (append-stream) Delta source: initial-snapshot vs
  * startingVersion modes, dataChange=false commits contributing
  * nothing, the refusal semantics for row-changing commits, and the
  * delta-source escape hatches (ignoreDeletes / skipChangeCommits). */
class DeltaTableSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/d"

  private def df(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"$tag$i")).toDF("id", "tag")
  }

  test("initial snapshot batch, then incremental appends; restart resumes") {
    val tbl = tmp("tsrc"); val ck = tmp("tsrc-ck")
    PortableDelta.write(df(0L until 3L, "a").coalesce(1), tbl)        // v0
    PortableDelta.write(df(10L until 13L, "a").coalesce(1), tbl,
      mode = "append")                                                // v1
    PortableDelta.delete(spark, tbl, col("id") === 0L)                // v2
    // pre-start history may be arbitrary — the snapshot batch absorbs it
    val src = new DeltaTableSource(spark, tbl, ck)
    val Some((snap, o0)) = src.readAvailable()
    assert(o0.version == 2L && snap.count() == 5L, "snapshot batch = current rows")
    // uncommitted: the same snapshot batch re-delivers
    assert(src.readAvailable().map(_._2.version).contains(2L))
    src.commitProgress(o0)
    assert(src.readAvailable().isEmpty, "caught up after the snapshot")
    PortableDelta.write(df(Seq(20L), "b").coalesce(1), tbl,
      mode = "append")                                                // v3
    PortableDelta.write(df(Seq(21L), "b").coalesce(1), tbl,
      mode = "append")                                                // v4
    // a RESTARTED consumer resumes at the watermark — no snapshot re-run
    val src2 = new DeltaTableSource(spark, tbl, ck, maxVersionsPerTrigger = 1)
    val Some((w1, t1)) = src2.readAvailable()
    assert(t1.version == 3L && w1.collect().map(_.getLong(0)).toSeq == Seq(20L))
    src2.commitProgress(t1)
    val Some((w2, t2)) = src2.readAvailable()
    assert(t2.version == 4L && w2.collect().map(_.getLong(0)).toSeq == Seq(21L))
    src2.commitProgress(t2)
    assert(src2.readAvailable().isEmpty && src2.watermark.contains(4L))
  }

  test("maxFilesPerTrigger splits big commits; no row lost or duplicated") {
    val tbl = tmp("tsrc5"); val ck = tmp("tsrc5-ck")
    PortableDelta.write(df(0L until 9L, "a").repartition(3), tbl)     // v0: 3 files
    PortableDelta.write(df(10L until 16L, "b").repartition(2), tbl,
      mode = "append")                                                // v1: 2 files
    val src = new DeltaTableSource(spark, tbl, ck,
      startingVersion = Some(0L), maxFilesPerTrigger = Some(2))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val offsets = scala.collection.mutable.ArrayBuffer.empty[String]
    var more = true
    while (more) src.readAvailable() match {
      case Some((rows, off)) =>
        seen ++= rows.collect().map(_.getLong(0))
        offsets += off.token
        src.commitProgress(off)
      case None => more = false
    }
    // v0's 3 files split 2+1, the second trigger rolls into v1
    assert(offsets.toSeq == Seq("0:2", "1:1", "1"), s"got $offsets")
    assert(seen.sorted == ((0L until 9L) ++ (10L until 16L)),
      "every appended row exactly once across the split triggers")
    assert(src.watermark.contains(1L) && src.readAvailable().isEmpty)
    // restart mid-commit: an uncommitted partial trigger re-delivers
    // the SAME slice
    val ck2 = tmp("tsrc5-ck2")
    val srcB = new DeltaTableSource(spark, tbl, ck2,
      startingVersion = Some(0L), maxFilesPerTrigger = Some(2))
    val Some((b1, ob1)) = srcB.readAvailable()
    val rows1 = b1.collect().map(_.getLong(0)).toSet
    val Some((b1again, ob1again)) = srcB.readAvailable() // not committed
    assert(ob1.token == ob1again.token &&
      b1again.collect().map(_.getLong(0)).toSet == rows1,
      "an uncommitted slice must re-deliver identically")
  }

  test("initial snapshot drains SLICE-WISE under rate limits; restart-exact; appends follow") {
    val tbl = tmp("tsrc9"); val ck = tmp("tsrc9-ck")
    PortableDelta.write(df(0L until 9L, "a").repartition(3), tbl)     // v0: 3 files
    PortableDelta.write(df(10L until 16L, "b").repartition(2), tbl,
      mode = "append")                                                // v1: 2 files
    PortableDelta.delete(spark, tbl, col("id") === 0L)                // v2: DV
    val src = new DeltaTableSource(spark, tbl, ck, maxFilesPerTrigger = Some(2))
    // slice 1 of the snapshot pinned at v2
    val Some((s1, o1)) = src.readAvailable()
    assert(o1.snapshot && !o1.complete && o1.version == 2L &&
      o1.token == "S2:2", s"got ${o1.token}")
    // uncommitted: the SAME slice re-delivers
    val Some((s1b, o1b)) = src.readAvailable()
    assert(o1b.token == o1.token &&
      s1b.collect().map(_.getLong(0)).toSet == s1.collect().map(_.getLong(0)).toSet)
    src.commitProgress(o1)
    assert(src.watermark.isEmpty, "no version fully processed mid-snapshot")
    // a commit RACING past the pinned snapshot must not leak into it
    PortableDelta.write(df(Seq(20L), "c").coalesce(1), tbl,
      mode = "append")                                                // v3
    // drain the remainder: a RESTARTED consumer (fresh source object,
    // same checkpoint) continues at the pinned version and file offset
    val src2 = new DeltaTableSource(spark, tbl, ck, maxFilesPerTrigger = Some(2))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    seen ++= s1.collect().map(_.getLong(0))
    var more = true
    while (more) src2.readAvailable() match {
      case Some((rows, off)) =>
        seen ++= rows.collect().map(_.getLong(0))
        src2.commitProgress(off)
      case None => more = false
    }
    // snapshot slices = exactly v2's live rows (id 0 deleted by DV),
    // then v3's append — nothing lost, nothing doubled
    assert(seen.sorted == ((1L until 9L) ++ (10L until 16L) ++ Seq(20L)),
      s"slice-wise join drifted: ${seen.sorted}")
    assert(src2.watermark.contains(3L))
    // an unlimited source restarted mid-snapshot drains the REST in one
    // slice (offset form stays readable without rate limits)
    val ck2 = tmp("tsrc9-ck2")
    val a = new DeltaTableSource(spark, tbl, ck2, maxFilesPerTrigger = Some(2))
    val Some((f1, oA)) = a.readAvailable()
    a.commitProgress(oA)
    val b = new DeltaTableSource(spark, tbl, ck2) // no rate limits
    val Some((rest, oB)) = b.readAvailable()
    assert(oB.complete && oB.version == 3L)
    assert(f1.collect().map(_.getLong(0)).toSet ++
      rest.collect().map(_.getLong(0)).toSet ==
      ((1L until 9L) ++ (10L until 16L) ++ Seq(20L)).toSet,
      "remainder slice completes the pinned snapshot exactly")
  }

  test("mid-commit offset resumes WITHOUT rate limits: consumed prefix not re-delivered") {
    val tbl = tmp("tsrc8"); val ck = tmp("tsrc8-ck")
    PortableDelta.write(df(0L until 9L, "a").repartition(3), tbl)     // v0: 3 files
    PortableDelta.write(df(10L until 16L, "b").repartition(2), tbl,
      mode = "append")                                                // v1: 2 files
    // consume a partial slice of v0 under maxFilesPerTrigger, commit it
    val srcA = new DeltaTableSource(spark, tbl, ck,
      startingVersion = Some(0L), maxFilesPerTrigger = Some(2))
    val Some((s1, o1)) = srcA.readAvailable()
    val consumed = s1.collect().map(_.getLong(0)).toSet
    assert(o1.token == "0:2" && consumed.nonEmpty)
    srcA.commitProgress(o1)
    // RESTART with no rate limits, same checkpoint: the stored "0:2"
    // offset must skip v0's 2 consumed files, not replay them
    val srcB = new DeltaTableSource(spark, tbl, ck)
    val Some((rest, oRest)) = srcB.readAvailable()
    val restIds = rest.collect().map(_.getLong(0)).toSet
    assert(restIds.intersect(consumed).isEmpty,
      s"consumed prefix re-delivered on rate-limit-free restart: " +
        s"${restIds.intersect(consumed)}")
    assert(restIds ++ consumed == ((0L until 9L) ++ (10L until 16L)).toSet,
      "remaining files of v0 plus v1 exactly once")
    assert(oRest.complete && oRest.version == 1L)
    srcB.commitProgress(oRest)
    assert(srcB.readAvailable().isEmpty && srcB.watermark.contains(1L))
  }

  test("startingVersion replays history; dataChange=false commits add nothing") {
    val tbl = tmp("tsrc2"); val ck = tmp("tsrc2-ck")
    PortableDelta.write(df(0L until 4L, "a").repartition(2), tbl)     // v0
    PortableDelta.write(df(10L until 14L, "a").repartition(2), tbl,
      mode = "append")                                                // v1
    val os = PortableDelta.optimizeCompact(spark, tbl)                // v2
    assert(os.removedFiles >= 2, "compaction must have rewritten files")
    PortableDelta.write(df(Seq(20L), "b").coalesce(1), tbl,
      mode = "append")                                                // v3
    val src = new DeltaTableSource(spark, tbl, ck,
      maxVersionsPerTrigger = 1, startingVersion = Some(0L))
    var got = Seq.empty[(Long, Long)] // (endVersion, rowCount)
    val n = src.runAvailableNow((rows, to) => got :+= (to, rows.count()))
    assert(n == 4, s"one trigger per version, got $n")
    assert(got == Seq((0L, 4L), (1L, 4L), (2L, 0L), (3L, 1L)),
      s"the OPTIMIZE version must contribute ZERO rows: $got")
    // the replayed stream equals the direct read (no dupes from the
    // compaction rewrite)
    val streamed = PortableDelta.readAppends(spark, tbl, 0L, 3L)
    val direct = PortableDelta.readTable(spark, tbl)
    assert(streamed.except(direct).isEmpty && direct.except(streamed).isEmpty)
  }

  test("row-changing commits refuse by version; escape hatches skip them") {
    val tbl = tmp("tsrc3"); val ck = tmp("tsrc3-ck")
    PortableDelta.write(df(0L until 4L, "a").coalesce(1), tbl)        // v0
    PortableDelta.update(spark, tbl, col("id") === 1L,
      Map("tag" -> lit("UP")))                                        // v1
    PortableDelta.write(df(Seq(20L), "b").coalesce(1), tbl,
      mode = "append")                                                // v2
    // default: the UPDATE commit refuses BY VERSION with the options named
    val e = intercept[IllegalStateException] {
      PortableDelta.readAppends(spark, tbl, 0L, 2L).count()
    }
    assert(e.getMessage.contains("version 1") &&
      e.getMessage.contains("skipChangeCommits"))
    // ignoreDeletes is NOT enough for a rewrite (re-delivering rewritten
    // files would duplicate rows)
    intercept[IllegalStateException] {
      PortableDelta.readAppends(spark, tbl, 0L, 2L, ignoreDeletes = true).count()
    }
    // skipChangeCommits drops v1 wholesale: v0's rows + v2's append
    val src = new DeltaTableSource(spark, tbl, ck,
      startingVersion = Some(0L), skipChangeCommits = true)
    val Some((rows, off)) = src.readAvailable()
    assert(off.version == 2L && rows.count() == 5L)
    assert(rows.filter(col("tag") === "UP").count() == 0L,
      "the skipped UPDATE's rewritten rows must not re-deliver")
  }

  test("whole-file delete commits: refused by default, skipped under ignoreDeletes") {
    val tbl = tmp("tsrc4"); val ck = tmp("tsrc4-ck")
    PortableDelta.write(df(0L until 3L, "a").coalesce(1), tbl)        // v0
    PortableDelta.write(df(10L until 13L, "b").coalesce(1), tbl,
      mode = "append")                                                // v1
    // every row of v1's single file matches → the file dies whole
    // (remove without add)
    val ds = PortableDelta.delete(spark, tbl, col("id") >= 10L)       // v2
    assert(ds.deletedRows == 3L)
    PortableDelta.write(df(Seq(20L), "c").coalesce(1), tbl,
      mode = "append")                                                // v3
    intercept[IllegalStateException] {
      PortableDelta.readAppends(spark, tbl, 0L, 3L).count()
    }
    val got = PortableDelta.readAppends(spark, tbl, 0L, 3L,
      ignoreDeletes = true)
    // the delete-only commit skips; earlier appends still deliver the
    // at-least-once superset (ids 10-12 were appended, then deleted)
    assert(got.count() == 7L)
    val src = new DeltaTableSource(spark, tbl, ck, ignoreDeletes = true)
    val Some((snap, off)) = src.readAvailable() // snapshot mode: 4 live rows
    assert(off.version == 3L && snap.count() == 4L)
  }

  test("maxBytesPerTrigger: soft byte budget splits windows, nothing lost") {
    val tbl = tmp("tsrc6"); val ck = tmp("tsrc6-ck")
    PortableDelta.write(df(0L until 9L, "a").repartition(3), tbl)     // v0: 3 files
    PortableDelta.write(df(10L until 16L, "b").repartition(2), tbl,
      mode = "append")                                                // v1: 2 files
    val fileBytes = PortableDelta.snapshot(spark, tbl).files.map(_.size)
    val one = fileBytes.min // every file is roughly this size
    // budget of ~1.5 files: each trigger admits one file, starts a
    // second, overshoots, stops — so exactly 2 files per trigger
    val src = new DeltaTableSource(spark, tbl, ck,
      startingVersion = Some(0L), maxBytesPerTrigger = Some(one * 3 / 2))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var triggers = 0
    var more = true
    while (more) src.readAvailable() match {
      case Some((rows, off)) =>
        seen ++= rows.collect().map(_.getLong(0))
        triggers += 1
        src.commitProgress(off)
      case None => more = false
    }
    assert(triggers == 3, s"5 files at 2/trigger = 3 triggers, got $triggers")
    assert(seen.sorted == ((0L until 9L) ++ (10L until 16L)),
      "every appended row exactly once across byte-budget triggers")
    // a budget smaller than any file still progresses one file at a time
    val ck2 = tmp("tsrc6-ck2")
    val tiny = new DeltaTableSource(spark, tbl, ck2,
      startingVersion = Some(0L), maxBytesPerTrigger = Some(1L))
    val Some((r1, o1)) = tiny.readAvailable()
    assert(o1.token == "0:1" && r1.count() > 0, "first file always admits")
  }

  test("startingTimestamp resolves to the first commit at/after the instant") {
    val tbl = tmp("tsrc7"); val ck = tmp("tsrc7-ck")
    PortableDelta.write(df(0L until 3L, "a").coalesce(1), tbl,
      properties = Map(PortableDelta.IctProp -> "true"))              // v0
    PortableDelta.write(df(Seq(10L), "b").coalesce(1), tbl,
      mode = "append")                                                // v1
    PortableDelta.write(df(Seq(11L), "c").coalesce(1), tbl,
      mode = "append")                                                // v2
    val hist = PortableDelta.history(
      spark.sessionState.newHadoopConf(), tbl).sortBy(_._1)
    val tsV1 = hist.find(_._1 == 1L).get._3
    // an instant exactly at v1's commit starts the stream AT v1 —
    // no snapshot batch, v0's rows never delivered
    val src = new DeltaTableSource(spark, tbl, ck,
      startingTimestamp = Some(tsV1))
    val Some((w1, o1)) = src.readAvailable()
    assert(o1.version <= 2L)
    src.commitProgress(o1)
    var rest = Set.empty[Long]
    rest ++= w1.collect().map(_.getLong(0))
    var more = true
    while (more) src.readAvailable() match {
      case Some((rows, off)) =>
        rest ++= rows.collect().map(_.getLong(0)); src.commitProgress(off)
      case None => more = false
    }
    assert(rest == Set(10L, 11L), s"from-v1 replay only, got $rest")
    // an instant past the last commit refuses by name (delta behavior)
    val late = new DeltaTableSource(spark, tbl, tmp("tsrc7-ck2"),
      startingTimestamp = Some(hist.map(_._3).max + 60000L))
    val e = intercept[IllegalArgumentException] { late.readAvailable() }
    assert(e.getMessage.contains("after the last commit"))
    // both start modes together refuse at construction
    intercept[IllegalArgumentException] {
      new DeltaTableSource(spark, tbl, tmp("tsrc7-ck3"),
        startingVersion = Some(0L), startingTimestamp = Some(tsV1))
    }
  }
}
