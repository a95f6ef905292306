package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based fuzz of the WHOLE portable-Delta DML surface: a seeded
  * random sequence of append / overwrite / DELETE / UPDATE / MERGE /
  * OPTIMIZE / Z-ORDER / checkpoint (classic AND v2 sidecar layout,
  * with checkpoint GC) / vacuum / RESTORE / SET-UNSET TBLPROPERTIES
  * (sometimes flipping on the delta.checkpointInterval auto-cadence
  * for the rest of the run) / net-no-op ADD+DROP COLUMN pairs runs
  * against the real log while a trivial in-memory map applies the same
  * semantics.
  * After EVERY op the table read-back must equal the model exactly, and
  * time travel to a random earlier version must equal the model's
  * recorded history — so any cross-op interaction bug (a DV the
  * optimize rewrite resurrects, a restore that misses an update's
  * appended files, a checkpoint that drops a tombstone) surfaces at the
  * op where state first diverges, with the seed + op trace in the
  * failure message. The table is born ICT-enabled, and after every op
  * a random recorded version is read back BOTH ways — versionAsOf and
  * timestampAsOf at that commit's in-commit timestamp. */
class DeltaModelSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  // model row: id -> (tag, v)
  private type Model = Map[Long, (String, Long)]

  private def toDf(m: Seq[(Long, String, Long)]) = {
    val s = spark; import s.implicits._
    m.toDF("id", "tag", "v")
  }

  private def readBack(path: String): Model =
    PortableDelta.readTable(spark, path).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  private def runSeed(seed: Int, nOps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    var path = java.nio.file.Files.createTempDirectory(s"pfuzz$seed")
      .toString + "/tbl"
    var cloneN = 0
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    def ctx = s"seed=$seed trace=[${trace.mkString("; ")}]"

    var nextId = 0L
    def freshRows(n: Int, tag: String): Seq[(Long, String, Long)] = {
      val out = (nextId until nextId + n).map(i => (i, tag, rnd.nextInt(1000).toLong))
      nextId += n
      out
    }

    // create v0 — born with in-commit timestamps, so every generated
    // commit carries a strictly monotonic ICT and the per-step
    // timestampAsOf probe below can resolve EVERY version exactly
    val r0 = freshRows(20, "base")
    PortableDelta.write(toDf(r0).repartition(3), path,
      properties = Map(PortableDelta.IctProp -> "true"))
    var model: Model = r0.map(t => t._1 -> ((t._2, t._3))).toMap
    // model history per committed version; minRestorable rises when
    // cleanupLog truncates the JSON the restore replay needs
    val history = scala.collection.mutable.Map[Long, Model](0L -> model)
    var minRestorable = 0L

    def syncVersion(): Long = {
      val v = PortableDelta.snapshot(spark, path).version
      history(v) = model
      v
    }

    var lastV = 0L
    for (step <- 1 to nOps) {
      val op = rnd.nextInt(17)
      val modelBefore = model
      op match {
        case 0 | 1 => // append fresh rows
          val rows = freshRows(5 + rnd.nextInt(10), s"ap$step")
          trace += s"append(${rows.size})"
          PortableDelta.write(toDf(rows).repartition(1 + rnd.nextInt(3)),
            path, mode = "append")
          model = model ++ rows.map(t => t._1 -> ((t._2, t._3)))
        case 2 => // overwrite with a fresh set
          val rows = freshRows(10 + rnd.nextInt(10), s"ow$step")
          trace += s"overwrite(${rows.size})"
          PortableDelta.write(toDf(rows).repartition(2), path, mode = "overwrite")
          model = rows.map(t => t._1 -> ((t._2, t._3))).toMap
        case 3 => // DELETE by predicate (DV path)
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          trace += s"delete(id%$m==$r)"
          PortableDelta.delete(spark, path, col("id") % m === r)
          model = model.filterNot { case (id, _) => id % m == r }
        case 4 | 5 => // UPDATE by predicate (DV + re-append path)
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val c = 1L + rnd.nextInt(50)
          trace += s"update(id%$m==$r, v+=$c, tag=u$step)"
          PortableDelta.update(spark, path, col("id") % m === r,
            Map("v" -> (col("v") + c), "tag" -> lit(s"u$step")))
          model = model.map { case (id, (t, v)) =>
            if (id % m == r) id -> ((s"u$step", v + c)) else id -> ((t, v))
          }
        case 6 => // MERGE: update half the existing sample, insert fresh
          val existing = model.keys.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(8)
          val fresh = freshRows(3, s"mi$step")
          val src = existing.map(id => (id, s"mu$step", rnd.nextInt(1000).toLong)) ++ fresh
          if (src.nonEmpty) {
            trace += s"merge(${existing.size}u+${fresh.size}i)"
            PortableDelta.merge(spark, path, toDf(src), Seq("id"))
            model = model ++ src.map(t => t._1 -> ((t._2, t._3)))
          } else trace += "merge(skipped)"
        case 7 => // OPTIMIZE / Z-ORDER / incremental clustering / REORG
          // PURGE: layout only, no logical change (maintenance must
          // never mutate)
          rnd.nextInt(4) match {
            case 0 =>
              trace += "optimizeCompact"
              PortableDelta.optimizeCompact(spark, path)
            case 1 =>
              trace += "optimizeZOrder"
              PortableDelta.optimizeZOrder(spark, path, Seq("id", "v"), 2)
            case 2 =>
              trace += "reorgPurge"
              PortableDelta.reorgPurge(spark, path)
            case _ =>
              if (PortableDelta.snapshot(spark, path).domainMetadata
                  .contains("delta.clustering")) {
                trace += "optimizeClusterIncremental"
                PortableDelta.optimizeClusterIncremental(spark, path)
              } else {
                trace += "optimizeZOrder(first)"
                PortableDelta.optimizeZOrder(spark, path, Seq("id", "v"), 2)
              }
          }
        case 8 => // checkpoint — classic or v2 layout — then sometimes
          // truncate + GC superseded checkpoints + vacuum
          val useV2 = rnd.nextBoolean()
          val v = if (useV2) PortableDelta.checkpointV2(spark, path, addsPerSidecar = 4)
                  else PortableDelta.checkpoint(spark, path)
          val kind = if (useV2) "checkpointV2" else "checkpoint"
          if (rnd.nextBoolean()) {
            // alternate the vacuum shape: LITE reclaims from the log
            // (checkpoint-carried tombstones), full from the listing —
            // NEITHER may ever touch live state
            val lite = rnd.nextBoolean()
            trace += s"$kind($v)+cleanup+gc+vacuum${if (lite) "Lite" else ""}"
            PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
            PortableDelta.cleanupCheckpoints(spark, path)
            minRestorable = PortableDelta.snapshot(spark, path).version
            if (lite) PortableDelta.vacuumLite(spark, path, graceMillis = 0L)
            else PortableDelta.vacuum(spark, path, graceMillis = 0L)
          } else {
            // minor log compaction over the newest contiguous JSON run
            // (≤ 4 commits) — later replay/travel/restore must be
            // indistinguishable with the span present
            val jsons = new java.io.File(s"$path/_delta_log").listFiles()
              .filter(f => f.getName.matches("\\d{20}\\.json"))
              .map(_.getName.stripSuffix(".json").toLong).sorted
            val run = jsons.reverse.zipWithIndex
              .takeWhile { case (x, i) => x == jsons.max - i }
              .map(_._1).sorted
            if (run.size >= 2) {
              val s0 = run.takeRight(math.min(4, run.size)).head
              trace += s"$kind($v)+compact($s0,${run.last})"
              PortableDelta.compactLog(
                spark.sessionState.newHadoopConf(), path, s0, run.last)
            } else trace += s"$kind($v)"
          }
        case 9 => // RESTORE to a random reachable earlier version
          val candidates = history.keys.filter(_ >= minRestorable).toSeq.sorted
          val target = candidates(rnd.nextInt(candidates.size))
          trace += s"restore($target)"
          PortableDelta.restore(spark, path, target)
          model = history(target)
        case 10 => // shallow CLONE: switch the run onto a zero-copy snapshot
          cloneN += 1
          val dst = java.nio.file.Files
            .createTempDirectory(s"pfuzz$seed-c$cloneN").toString + "/tbl"
          trace += "cloneShallow"
          PortableDelta.cloneShallow(spark, path, dst)
          path = dst // all later ops run against the clone's log
          history.clear()
          history(0L) = model // clone v0 = the source's current state
          minRestorable = 0L
        case 11 => // constraint toggle: metaData-only commit (no row change;
          // every generated v is >= 0, so the gate never fires — what this
          // exercises is constraint metadata riding checkpoints, clones,
          // and RESTORE's metaData rollback)
          val key = PortableDelta.ConstraintPrefix + "v_nonneg"
          val has = PortableDelta.snapshot(spark, path).configuration.contains(key)
          trace += (if (has) "dropConstraint" else "addConstraint")
          if (has) PortableDelta.dropCheckConstraint(spark, path, "v_nonneg")
          else PortableDelta.addCheckConstraint(spark, path, "v_nonneg", "v >= 0")
        case 13 => // net-no-op rename pair: v -> v_tmp -> v. Leaves the
          // table COLUMN-MAPPED (mode=name, ids stamped from current
          // names, so physical == logical throughout) for every later
          // verb — appends/DML then stage through the physical path,
          // checkpoints carry mapping metadata, RESTORE rolls it back.
          // Schema and state end unchanged; the intermediate version is
          // not recorded, so the travel probe never visits it. Skipped
          // while the v_nonneg constraint is active (rename guards
          // constraint references by design).
          val mapped = PortableDelta.snapshot(spark, path)
          if (mapped.configuration.keys
              .exists(_.startsWith(PortableDelta.ConstraintPrefix))) {
            trace += "renamePairSkipped(constraint)"
          } else {
            trace += "renamePair"
            PortableDelta.renameColumn(spark, path, "v", "v_tmp")
            PortableDelta.renameColumn(spark, path, "v_tmp", "v")
          }
        case 12 => // enable row tracking: read-invisible (stable IDs are
          // writer bookkeeping) but it backfills every add, re-states
          // metaData, writes domainMetadata, and every LATER verb then
          // assigns/carries IDs — maximal interaction surface, zero
          // expected state change. Idempotent on re-draw.
          trace += "enableRowTracking"
          PortableDelta.enableRowTracking(spark, path)
        case 14 => // full-clause MERGE: conditional partial SET +
          // conditional insert (mergeInto — per-row semantics)
          val existing = model.keys.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(6)
          val fresh = freshRows(2, s"fi$step")
          val srcRows = existing.map(id =>
            (id, s"ms$step-$id", rnd.nextInt(1000).toLong)) ++ fresh
          trace += s"mergeInto(${existing.size}m+${fresh.size}f)"
          PortableDelta.mergeInto(spark, path, toDf(srcRows), Seq("id"),
            PortableDelta.MergeClauses(
              matchedCondition = Some(col("s.v") % 2 === 0),
              updateSet = Some(Map(
                "tag" -> col("s.tag"),
                "v" -> (col("t.v") + col("s.v")))),
              notMatchedCondition = Some(col("s.v") % 3 =!= 0)))
          srcRows.foreach { case (id, tag, v) =>
            model.get(id) match {
              case Some((_, oldV)) =>
                if (v % 2 == 0) model = model + (id -> ((tag, oldV + v)))
              case None =>
                if (v % 3 != 0) model = model + (id -> ((tag, v)))
            }
          }
        case 15 => // property toggle (round-10 verbs): a custom marker
          // property set/unset, and SOMETIMES the auto-checkpoint
          // cadence (delta.checkpointInterval=2) — every later commit
          // then interleaves cadence checkpoints with the fuzzed verbs,
          // the maximal maintenance-interaction surface. Zero expected
          // state change.
          val cfgNow = PortableDelta.snapshot(spark, path).configuration
          if (cfgNow.contains("fuzz.marker")) {
            trace += "unsetProperties"
            PortableDelta.unsetTableProperties(spark, path, Seq("fuzz.marker"))
          } else {
            val cadence = rnd.nextBoolean()
            val v2 = rnd.nextBoolean()
            trace += (if (cadence) s"setProperties+cadence(v2=$v2)"
                      else "setProperties")
            PortableDelta.setTableProperties(spark, path,
              Map("fuzz.marker" -> s"s$step") ++
                (if (cadence) Map("delta.checkpointInterval" -> "2",
                  "delta.checkpointPolicy" -> (if (v2) "v2" else "classic"))
                 else Map.empty))
          }
        case 16 => // net-no-op ADD/DROP COLUMN pair: the fresh field gets
          // a col-<uuid> physical name, the drop upgrades the table onto
          // column mapping — schema and state end unchanged, every later
          // verb stages physically. Skipped while a constraint is active
          // (drop guards constraint references by design).
          val cfg16 = PortableDelta.snapshot(spark, path).configuration
          if (cfg16.keys.exists(_.startsWith(PortableDelta.ConstraintPrefix))) {
            trace += "addDropPairSkipped(constraint)"
          } else {
            trace += "addDropPair"
            PortableDelta.addColumn(spark, path, s"w$step",
              org.apache.spark.sql.types.LongType)
            PortableDelta.dropColumn(spark, path, s"w$step")
          }
      }
      val v = syncVersion()
      val got = readBack(path)
      assert(got == model,
        s"$ctx step=$step v=$v: table != model\n extra=${(got.keySet -- model.keySet).toSeq.sorted.take(10)}" +
          s"\n missing=${(model.keySet -- got.keySet).toSeq.sorted.take(10)}" +
          s"\n changed=${got.keySet.intersect(model.keySet).filter(k => got(k) != model(k)).toSeq.sorted.take(10)}")
      // version-checksum probe: the incremental crc chain must match
      // independently recomputed state after EVERY fuzzed op — one
      // mis-folded add/remove size or a stale metaData body anywhere in
      // the verb set fails here with the drifted field named
      try PortableDelta.validateChecksum(spark, path)
      catch {
        case e: Throwable =>
          fail(s"$ctx step=$step trace=[${trace.mkString(" -> ")}]: " +
            e.getMessage)
      }
      // metadata-only COUNT probe: the log's per-file stats must
      // re-derive the model's cardinality after EVERY fuzzed op
      // (DV-subtracted exactly, no data file opened). Refusal is legal
      // only for the one named unsound case the fuzz can reach (column
      // mapping after a rename) — a refusal for any other reason, or a
      // wrong value, fails with the trace.
      try {
        val cnt = PortableDelta.aggregateFromStats(spark, path).head().getLong(0)
        assert(cnt == model.size.toLong,
          s"$ctx step=$step trace=[${trace.mkString(" -> ")}]: " +
            s"aggregateFromStats count $cnt != model ${model.size}")
      } catch {
        case e: IllegalStateException if e.getMessage.contains("column mapping") =>
          () // named refusal — never a silently wrong value
      }
      // format-read probe (round 14; refusal list emptied in round 15):
      // the DECLARATIVE surface must agree with readTable after EVERY
      // DML state — sampled every 3rd step (a relation build replays
      // the log). Column mapping and deletion vectors both read through
      // the format now (physical-name rewrite + row-index DV drop), so
      // ANY refusal, or a drifted value, fails with the trace.
      if (step % 3 == 0) {
        val viaFmt = spark.read.format("portable-delta").load(path)
          .collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
        assert(viaFmt == model,
          s"$ctx step=$step trace=[${trace.mkString(" -> ")}]: " +
            s"format(\"portable-delta\") read != model " +
            s"(extra=${(viaFmt.keySet -- model.keySet).size}, " +
            s"missing=${(model.keySet -- viaFmt.keySet).size})")
      }
      // CDF-vs-model-diff probe: with row tracking on, every DML
      // commit's reconstructed feed must equal the model's before/after
      // diff EXACTLY — update pairs for changed ids (MERGE included,
      // the round-10 ID carry-over), deletes/inserts for the rest.
      // Checked against the LIVE config: a RESTORE to a pre-tracking
      // version legally rolls the property back with the metaData, and
      // updates then read as delete+insert again.
      val rtNow = Set(3, 4, 5, 6, 14).contains(op) && v != lastV &&
        PortableDelta.snapshot(spark, path).configuration
          .get(PortableDelta.RowTrackingProp).contains("true")
      if (rtNow) {
        val changed = modelBefore.keySet.intersect(model.keySet)
          .filter(k => modelBefore(k) != model(k))
        val expected: Set[(Long, String, Long, String)] =
          changed.flatMap(id => Seq(
            (id, modelBefore(id)._1, modelBefore(id)._2, "update_preimage"),
            (id, model(id)._1, model(id)._2, "update_postimage"))) ++
          (modelBefore.keySet -- model.keySet).map(id =>
            (id, modelBefore(id)._1, modelBefore(id)._2, "delete")) ++
          (model.keySet -- modelBefore.keySet).map(id =>
            (id, model(id)._1, model(id)._2, "insert"))
        val gotCh = PortableDelta.readChanges(spark, path, v, v)
          .select(col("id"), col("tag"), col("v"), col("_change_type"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getString(3))).toSet
        assert(gotCh == expected,
          s"$ctx step=$step v=$v: CDF reconstruction != model diff\n" +
            s" spurious=${(gotCh -- expected).toSeq.take(6)}\n" +
            s" missing=${(expected -- gotCh).toSeq.take(6)}")
      }
      lastV = v
      // time travel to a random reachable recorded version
      val tv = {
        val cands = history.keys.filter(_ >= minRestorable).toSeq.sorted
        cands(rnd.nextInt(cands.size))
      }
      val tgot = PortableDelta.readTable(spark, path, tv).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(tgot == history(tv),
        s"$ctx step=$step: versionAsOf $tv != recorded model")
      // ...and the SAME version through timestampAsOf: the recorded
      // commit's ICT must resolve to exactly that version's state
      val tsOf = PortableDelta.history(
        spark.sessionState.newHadoopConf(), path)
        .map(h => h._1 -> h._3).toMap
      val tsGot = PortableDelta.readTableAtTimestamp(spark, path, tsOf(tv))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(tsGot == history(tv),
        s"$ctx step=$step: timestampAsOf(ict of $tv) != recorded model")
    }
  }

  test("seeded op-sequence fuzz: table state equals the model after every op (seed 11)") {
    runSeed(11, 14)
  }

  test("seeded op-sequence fuzz: table state equals the model after every op (seed 42)") {
    runSeed(42, 14)
  }

  test("seeded op-sequence fuzz: longer run mixing v2 checkpoints + GC (seed 7)") {
    runSeed(7, 18)
  }

  test("seeded op-sequence fuzz: round-9 verbs in the mix (seed 99)") {
    runSeed(99, 20)
  }

  test("seeded op-sequence fuzz: row-ID-preserving MERGE/OPTIMIZE + CDF probe (seed 123)") {
    runSeed(123, 20)
  }

  test("seeded op-sequence fuzz: round-10 verbs (mergeInto clauses, incremental clustering) (seed 2026)") {
    runSeed(2026, 22)
  }

  test("seeded op-sequence fuzz: long interaction run (seed 777, 30 ops)") {
    runSeed(777, 30)
  }

  test("seeded op-sequence fuzz: ALTER verbs + auto-checkpoint cadence (seed 1010, 26 ops)") {
    runSeed(1010, 26)
  }
}
