package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Replay of the SECOND frozen external-shaped fixture
  * (`src/test/resources/external_modern_delta/`, bytes committed at
  * round 12 — provenance in `graft.FixtureGenModern`): identityColumns
  * (GENERATED ALWAYS, HWM in field metadata), typeWidening (int→long at
  * v2 with per-field change history), variantType (real variant parquet
  * bytes), a V2 CHECKPOINT AS PRIMARY (UUID top-level + sidecar, no
  * classic checkpoint anywhere), and a checkpointProtection boundary
  * (version 100) that outlives the whole fixture history. External
  * commitInfo fields and add `tags` are mangled in, as in the combined
  * fixture. Frozen bytes = reader claims that cannot co-evolve with the
  * writer. */
class ModernFixtureSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def stage(): String = {
    val src = java.nio.file.Paths.get("src/test/resources/external_modern_delta")
    assert(java.nio.file.Files.isDirectory(src), s"fixture missing at $src")
    val dst = java.nio.file.Files.createTempDirectory("modfix").resolve("tbl")
    java.nio.file.Files.walk(src).forEach { p =>
      val tgt = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(tgt)
      else {
        java.nio.file.Files.createDirectories(tgt.getParent)
        java.nio.file.Files.copy(p, tgt)
      }
      ()
    }
    dst.toString
  }

  test("frozen modern fixture replays through the v2 checkpoint: features, " +
       "identity values, widened type, variant bytes") {
    val path = stage()
    // v2 checkpoint IS the primary: a UUID top-level + sidecars, no
    // classic checkpoint parquet anywhere in the log
    val logFiles = new java.io.File(s"$path/_delta_log").listFiles().map(_.getName)
    assert(logFiles.exists(_.matches("\\d{20}\\.checkpoint\\.[0-9a-fA-F-]{36}\\.parquet")),
      s"expected a v2 UUID checkpoint: ${logFiles.mkString(", ")}")
    assert(!logFiles.exists(_.matches("\\d{20}\\.checkpoint\\.parquet")) &&
      !logFiles.exists(_.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet")),
      "no classic/multi-part checkpoint may exist — v2 is the primary")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == 5L)
    assert(snap.readerFeatures.toSet ==
      Set("v2Checkpoint", "typeWidening", "variantType"),
      s"readerFeatures: ${snap.readerFeatures}")
    assert(Set("identityColumns", "typeWidening", "variantType",
      "checkpointProtection", "v2Checkpoint").subsetOf(snap.writerFeatures.toSet),
      s"writerFeatures: ${snap.writerFeatures}")
    // widened column reads as LONG; the per-field change history names
    // the widen commit
    val scoreF = snap.schema("score")
    assert(scoreF.dataType == LongType)
    val hist = scoreF.metadata.getMetadataArray("delta.typeWidening")
    assert(hist.length == 1 && hist.head.getString("fromType") == "integer" &&
      hist.head.getString("toType") == "long" &&
      hist.head.getLong("tableVersion") == 2L, s"widening history: ${hist.toSeq}")
    // identity values are exactly start + k*step in id order, HWM recorded
    val got = PortableDelta.readTable(spark, path)
      .selectExpr("rid", "id", "score", "to_json(payload) AS pj")
      .orderBy("id").collect()
    assert(got.length == 6)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == i.toLong && r.getLong(2) == 2L * i)
      assert(r.getLong(0) == 100L + 10L * i,
        s"identity must be start+k*step in generation order: row $i = $r")
      // variant round-trips through parquet + the mapped read
      assert(r.getString(3) == s"""{"k":$i,"tag":"t${i % 3}"}""",
        s"variant payload mismatch: ${r.getString(3)}")
    }
    assert(snap.schema("rid").metadata.getLong("delta.identity.highWaterMark")
      == 150L)
  }

  test("frozen modern fixture: every cleanup refuses inside the protected " +
       "region; continuation writes keep identity + wide types") {
    val path = stage()
    val s = spark; import s.implicits._
    // continuation append: identity continues PAST the frozen HWM
    PortableDelta.write(
      Seq((6L, 12L)).toDF("id", "score")
        .selectExpr("id", "score",
          "parse_json('{\"k\":6,\"tag\":\"t0\"}') AS payload").coalesce(1),
      path, mode = "append")                                     // v6
    val rid6 = PortableDelta.readTable(spark, path)
      .filter(col("id") === 6L).select(col("rid")).collect().head.getLong(0)
    assert(rid6 == 160L, s"identity must continue off the frozen HWM: $rid6")
    PortableDelta.checkpoint(spark, path)                        // ckpt@6
    // the protected region (boundary 100) outlives everything here:
    // engine-ful cleanup no-ops...
    assert(PortableDelta.cleanupLog(spark, path) == 0)
    // ...and the conf-only overload sees the boundary via the
    // _last_checkpoint hint our checkpoint recorded (round-12 fix)
    assert(PortableDelta.cleanupLog(
      spark.sessionState.newHadoopConf(), path) == 0)
    val jsons = new java.io.File(s"$path/_delta_log").listFiles()
      .map(_.getName).filter(_.matches("\\d{20}\\.json")).sorted
    assert(jsons.length == 7, s"no commit may leave the protected region: " +
      jsons.mkString(", "))
    // the table still reads completely through checkpoint + tail
    assert(PortableDelta.readTable(spark, path).count() == 7L)
  }

  test("frozen modern fixture: a streaming consumer slice-drains the " +
       "initial snapshot through the v2 checkpoint") {
    val path = stage()
    val ck = java.nio.file.Files.createTempDirectory("modfix_ck").toString
    // maxFilesPerTrigger forces the Sv:k slicing path: the pinned
    // ordering builds off the V2 checkpoint's add rows (UUID top-level
    // + sidecar) unioned with the JSON tail — variant bytes, identity
    // values, and the widened column all ride the sliced scans
    val src = new graft.streaming.DeltaTableSource(spark, path, ck,
      maxFilesPerTrigger = Some(1))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    var slices = 0
    val n = src.runAvailableNow { (df, _) =>
      got ++= df.selectExpr("rid", "id", "score", "to_json(payload) AS pj")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      slices += 1
    }
    assert(n >= 4, s"1-file slices over a 4-file snapshot must take ≥4 triggers: $n")
    val rows = got.sortBy(_._2)
    assert(rows.map(_._2) == (0L to 5L), s"ids: ${rows.map(_._2)}")
    rows.zipWithIndex.foreach { case ((rid, id, score, pj), i) =>
      assert(rid == 100L + 10L * i && score == 2L * i &&
        pj == s"""{"k":$i,"tag":"t${i % 3}"}""",
        s"sliced row $i diverged: ($rid, $id, $score, $pj)")
    }
    assert(new graft.streaming.DeltaTableSource(spark, path, ck,
      maxFilesPerTrigger = Some(1)).readAvailable().isEmpty,
      "a caught-up consumer must return no batch")
  }
}
