package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZE over the portable Delta log: bin-packing compaction (the
  * small-files maintenance pass) and multi-dimension Z-order clustering.
  * Contracts under test: rewrites commit with `dataChange=false` on both
  * action sides, old files stay on disk for time travel, DV-carrying
  * inputs are materialized (tombstones purged), the logical table is
  * value-identical across the rewrite, and after ZORDER BY the per-file
  * stats prune on EVERY listed dimension. */
class OptimizeSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("popt").toString + "/tbl"

  test("compaction bin-packs small files, purges DVs, commits dataChange=false") {
    val path = tmp()
    val s = spark; import s.implicits._
    // three single-file appends → 3 tiny files
    for (base <- Seq(0L, 100L, 200L))
      PortableDelta.write((base until base + 50L).map(i => (i, s"doc $i"))
        .toDF("id", "body").coalesce(1), path,
        mode = if (base == 0L) "error" else "append")
    // a DV on one file: compaction must materialize it away
    val del = PortableDelta.delete(spark, path, col("id") < 10L)
    assert(del.dvFiles == 1)
    val preVersion = PortableDelta.snapshot(spark, path).version
    val expect = PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet

    val opt = PortableDelta.optimizeCompact(spark, path)
    assert(opt.removedFiles == 3 && opt.addedFiles == 1 && opt.purgedDvRows == 10L,
      s"unexpected $opt")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == preVersion + 1)
    assert(snap.files.size == 1 && snap.files.forall(_.dv.isEmpty),
      "compaction output is one DV-free file")
    assert(snap.files.forall(_.stats.isDefined), "rewritten adds carry stats")
    // value-identity across the rewrite
    val got = PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // dataChange=false on BOTH sides of the rewrite commit
    val f = new java.io.File(s"$path/_delta_log/${"%020d".format(snap.version)}.json")
    val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty)
      .map(mapper.readTree).toSeq
    val rs = lines.filter(_.has("remove")).map(_.get("remove"))
    val as = lines.filter(_.has("add")).map(_.get("add"))
    assert(rs.size == 3 && as.size == 1)
    assert(rs.forall(!_.get("dataChange").asBoolean()) &&
      as.forall(!_.get("dataChange").asBoolean()),
      "OPTIMIZE must not signal a logical data change")
    // old files remain on disk: time travel to the pre-optimize version
    val pre = PortableDelta.readTable(spark, path, preVersion)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(pre == expect, "pre-optimize version must read through old files + DV")
    // idempotence: a second pass has nothing to do (single file ≥ no-op)
    val again = PortableDelta.optimizeCompact(spark, path)
    assert(again.removedFiles == 0 && again.version == snap.version)
  }

  test("zorder clusters so stats prune on BOTH dimensions") {
    val path = tmp()
    val s = spark; import s.implicits._
    // a 100×100 grid, hash-scattered so NO dimension can prune pre-zorder
    val grid = (0L until 10000L).map(i => (i, i % 100L, i / 100L))
      .toDF("id", "x", "y").repartition(8)
    PortableDelta.write(grid, path)
    val snap0 = PortableDelta.snapshot(spark, path)
    val condX = col("x") < 10L
    val condY = col("y") >= 90L
    val (_, prunedX0) = PortableDelta.statsPrune(spark, snap0, condX)
    val (_, prunedY0) = PortableDelta.statsPrune(spark, snap0, condY)
    assert(prunedX0 == 0 && prunedY0 == 0,
      "hash-scattered files span the full range in every dimension")

    val opt = PortableDelta.optimizeZOrder(spark, path, Seq("x", "y"), numFiles = 16)
    assert(opt.removedFiles == 8 && opt.addedFiles > 1)
    val snap1 = PortableDelta.snapshot(spark, path)
    val (keptX, prunedX) = PortableDelta.statsPrune(spark, snap1, condX)
    val (keptY, prunedY) = PortableDelta.statsPrune(spark, snap1, condY)
    assert(prunedX > 0 && prunedY > 0,
      s"z-order must enable pruning on both dims: x $prunedX, y $prunedY " +
        s"of ${snap1.files.size}")
    assert(keptX.nonEmpty && keptY.nonEmpty)
    // and the skipped reads stay value-correct
    for (cond <- Seq(condX, condY, condX && condY)) {
      val skipped = PortableDelta.readTableWhere(spark, path, cond)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val full = PortableDelta.readTable(spark, path).filter(cond)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(skipped == full, s"zorder+skipping changed the answer for $cond")
    }
    // the clustered-table bookkeeping rode the same commit: the
    // `clustering` writer feature plus the clustering columns in the
    // delta.clustering domain — and it survives checkpoint truncation
    assert(snap1.writerFeatures.contains("clustering") &&
      snap1.writerFeatures.contains("domainMetadata"),
      s"got ${snap1.writerFeatures}")
    assert(snap1.domainMetadata.get("delta.clustering")
      .exists(j => j.contains("\"x\"") && j.contains("\"y\"")),
      s"got ${snap1.domainMetadata}")
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    assert(PortableDelta.snapshot(spark, path).domainMetadata
      .contains("delta.clustering"))
  }

  test("OPTIMIZE WHERE compacts only the in-scope partition's files") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(
      (0L until 400L).map(i => (i, if (i % 2 == 0) "A" else "B"))
        .toDF("id", "part").repartition(8),
      path, partitionBy = Seq("part"))
    val snap0 = PortableDelta.snapshot(spark, path)
    val aFiles0 = snap0.files.count(_.partitionValues.get("part").contains("A"))
    val bFiles0 = snap0.files.count(_.partitionValues.get("part").contains("B"))
    assert(aFiles0 > 1 && bFiles0 > 1)
    val st = PortableDelta.optimizeCompact(spark, path,
      where = Some(col("part") === "A"))
    assert(st.removedFiles == aFiles0, s"got $st for $aFiles0 A-files")
    val snap1 = PortableDelta.snapshot(spark, path)
    // B's layout is untouched; A collapsed
    assert(snap1.files.count(_.partitionValues.get("part").contains("B")) ==
      bFiles0)
    assert(snap1.files.count(_.partitionValues.get("part").contains("A")) <
      aFiles0)
    assert(PortableDelta.readTable(spark, path).count() == 400L)
    // out-of-scope WHERE: no candidates, no commit
    val v = PortableDelta.snapshot(spark, path).version
    val st2 = PortableDelta.optimizeCompact(spark, path,
      where = Some(col("part") === "Z"))
    assert(st2.removedFiles == 0 && st2.addedFiles == 0)
    assert(PortableDelta.snapshot(spark, path).version == v)
  }

  test("incremental clustering rewrites ONLY new files; pruning holds table-wide") {
    val path = tmp()
    val s = spark; import s.implicits._
    // establish the clustered layout over the first half (y in [0,50))
    val half1 = (0L until 5000L).map(i => (i, i % 100L, i / 100L))
      .toDF("id", "x", "y").repartition(8)
    PortableDelta.write(half1, path)
    PortableDelta.optimizeZOrder(spark, path, Seq("x", "y"), numFiles = 8)
    val snapC = PortableDelta.snapshot(spark, path)
    assert(snapC.files.forall(_.clusteringProvider.contains(
      PortableDelta.ClusteringProviderName)),
      "zorder output must carry the clustering provider")
    val clusteredPaths = snapC.files.map(_.path).toSet
    // append the second half (y in [50,100)) hash-scattered: these adds
    // are provider-less — OUTSIDE the clustered layout
    val half2 = (5000L until 10000L).map(i => (i, i % 100L, i / 100L))
      .toDF("id", "x", "y").repartition(2)
    PortableDelta.write(half2, path, mode = "append")
    val snapA = PortableDelta.snapshot(spark, path)
    assert(snapA.files.count(_.clusteringProvider.isEmpty) == 2)

    // maintenance rewrites EXACTLY the 2 new files; the 8 clustered
    // originals are untouched (cost tracks new bytes, never the table).
    // Target sized to a quarter of the new bytes so the fresh cube
    // spans ~4 files — within-cube pruning must then be observable.
    val newBytes = snapA.files.filter(_.clusteringProvider.isEmpty)
      .map(_.size).sum
    val st = PortableDelta.optimizeClusterIncremental(spark, path,
      targetFileBytes = math.max(1L, newBytes / 4))
    assert(st.removedFiles == 2 && st.addedFiles >= 3, s"got $st")
    val snapM = PortableDelta.snapshot(spark, path)
    assert(clusteredPaths.subsetOf(snapM.files.map(_.path).toSet),
      "original clustered files must survive the incremental pass")
    assert(snapM.files.forall(_.clusteringProvider.isDefined),
      "everything is in the clustered layout after maintenance")

    // pruning on the published dims holds across BOTH z-cubes: a y
    // predicate inside the NEW half skips every old-cube file AND some
    // new-cube files (tight per-file stats in each cube — the full-
    // rewrite property on the touched dims)
    val condY = col("y") >= 90L
    val (keptY, prunedY) = PortableDelta.statsPrune(spark, snapM, condY)
    assert(prunedY >= 9, s"pruned only $prunedY of ${snapM.files.size}")
    assert(keptY.nonEmpty && keptY.forall(_.clusteringProvider.isDefined))
    val condX = col("x") < 10L
    val (_, prunedX) = PortableDelta.statsPrune(spark, snapM, condX)
    assert(prunedX > 0, "x pruning must hold inside the new cube too")
    // the skipped reads stay value-correct
    for (cond <- Seq(condY, condX, condX && condY)) {
      val skipped = PortableDelta.readTableWhere(spark, path, cond)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val full = PortableDelta.readTable(spark, path).filter(cond)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(skipped == full, s"maintenance+skipping changed $cond")
    }
    // a second pass finds nothing unclustered — no commit
    val v = PortableDelta.snapshot(spark, path).version
    val st2 = PortableDelta.optimizeClusterIncremental(spark, path)
    assert(st2.removedFiles == 0 && st2.addedFiles == 0)
    assert(PortableDelta.snapshot(spark, path).version == v)
    // provider provenance survives a DELETE's DV re-add AND checkpoint
    // replay — the victim key must stay durable across maintenance ops
    PortableDelta.delete(spark, path, col("id") === 123L)
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val snapZ = PortableDelta.snapshot(spark, path)
    assert(snapZ.files.forall(_.clusteringProvider.isDefined),
      "provider must ride DV re-adds and checkpoint replay")
    val st3 = PortableDelta.optimizeClusterIncremental(spark, path)
    assert(st3.removedFiles == 0, "nothing to re-cluster after a DELETE")
  }

  test("vacuum reclaims only files no reconstructable version references") {
    val path = tmp()
    val s = spark; import s.implicits._
    def mk(tag: String, n: Int) =
      (0L until 30L).map(i => (i, tag)).toDF("id", "tag").repartition(n)
    PortableDelta.write(mk("v0", 3), path)                      // 3 files
    PortableDelta.write(mk("v1", 2), path, mode = "overwrite")  // +2 files
    def parquetCount = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetCount == 5)
    // v0 is still replayable → its files are referenced → nothing to do
    assert(PortableDelta.vacuum(spark, path, graceMillis = 0L) == 0)
    // a foreign never-committed file is reclaimable garbage
    val junk = new java.io.File(path, "junk-not-committed.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    // truncate history: only the checkpointed tail stays reconstructable
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val got = PortableDelta.vacuum(spark, path, graceMillis = 0L)
    assert(got == 4, s"3 dead v0 files + 1 junk file, deleted $got")
    assert(parquetCount == 2)
    assert(PortableDelta.readTable(spark, path)
      .select(col("tag")).distinct().collect().map(_.getString(0)).toSeq == Seq("v1"))
    // default grace protects fresh files: nothing younger than 7 days dies
    PortableDelta.write(mk("v2", 1), path, mode = "overwrite")
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    assert(PortableDelta.vacuum(spark, path) == 0,
      "grace window must keep recently-written files")
  }

  test("ALTER CLUSTER BY declares dimensions; the incremental pass does the layout work") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 4000L).map(i => (i, i % 100L, i / 100L))
      .toDF("id", "x", "y").repartition(4), path)
    val v0Files = PortableDelta.snapshot(spark, path).files.map(_.path).toSet
    // declaration is metadata-only: no file moves, domain + feature land
    PortableDelta.alterClusterBy(spark, path, Seq("x", "y"))
    val snapD = PortableDelta.snapshot(spark, path)
    assert(snapD.files.map(_.path).toSet == v0Files, "CLUSTER BY moves no data")
    assert(snapD.writerFeatures.contains("clustering"))
    assert(snapD.domainMetadata("delta.clustering").contains("clusteringColumns"))
    // unknown column refuses by name
    val e = intercept[IllegalArgumentException] {
      PortableDelta.alterClusterBy(spark, path, Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
    // the first incremental pass clusters the WHOLE (provider-less)
    // table; pruning on the declared dims then holds
    val st = PortableDelta.optimizeClusterIncremental(spark, path,
      targetFileBytes = math.max(1L,
        snapD.files.map(_.size).sum / 4))
    assert(st.removedFiles == 4 && st.addedFiles >= 3, s"got $st")
    val snapC = PortableDelta.snapshot(spark, path)
    assert(snapC.files.forall(_.clusteringProvider.isDefined))
    val (kept, pruned) = PortableDelta.statsPrune(spark, snapC, col("y") >= 30L)
    assert(pruned > 0 && kept.nonEmpty, s"clustered pruning: $pruned pruned")
    assert(PortableDelta.readTableWhere(spark, path, col("y") >= 30L)
      .count() == 1000L)
    // CLUSTER BY NONE removes the domain; maintenance then refuses with
    // the establishment hint
    PortableDelta.alterClusterBy(spark, path, Nil)
    assert(!PortableDelta.snapshot(spark, path)
      .domainMetadata.contains("delta.clustering"))
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.optimizeClusterIncremental(spark, path)
    }
    assert(e2.getMessage.contains("delta.clustering"))
  }

  test("vacuum's default grace resolves delta.deletedFileRetentionDuration") {
    val path = tmp()
    val s = spark; import s.implicits._
    def mk(tag: String, n: Int) =
      (0L until 30L).map(i => (i, tag)).toDF("id", "tag").repartition(n)
    PortableDelta.write(mk("v0", 3), path, properties =
      Map("delta.deletedFileRetentionDuration" -> "interval 0 seconds"))
    PortableDelta.write(mk("v1", 2), path, mode = "overwrite")
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    // no explicit grace: the TABLE PROPERTY (0 s) applies, so the three
    // just-orphaned v0 files die — where the 7-day fallback kept them in
    // the leg above
    assert(PortableDelta.vacuum(spark, path) == 3)
    assert(PortableDelta.readTable(spark, path).count() == 30L)
  }

  test("vacuum walks hive-partitioned subdirs (executor-side listing)") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(
      (0L until 100L).map(i => (i, if (i % 2 == 0) "A" else "B"))
        .toDF("id", "part").repartition(4),
      path, partitionBy = Seq("part"))                              // v0
    // overwrite: v0's files under part=A/ and part=B/ become
    // unreferenced once the checkpoint truncates v0's JSON
    PortableDelta.write(
      (100L until 120L).map(i => (i, "A")).toDF("id", "part"),
      path, mode = "overwrite")                                     // v1
    val before = PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val n = PortableDelta.vacuum(spark, path, graceMillis = 0L)
    assert(n >= 4, s"v0's per-partition files must be reclaimed, got $n")
    // state intact; the stale hive dirs hold no stray parquet
    assert(PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet == before)
    val bDir = new java.io.File(path, "part=B")
    assert(!bDir.exists() || bDir.listFiles()
      .count(_.getName.endsWith(".parquet")) == 0,
      "part=B held only unreferenced files — all reclaimed")
  }

  test("vacuum keeps referenced DV packs, reclaims purged ones") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write((0L until 40L).map(i => (i, s"d$i")).toDF("id", "b")
      .repartition(2), path)
    PortableDelta.delete(spark, path, col("id") % 4 === 0L)
    def packCount = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("deletion_vector_"))
    assert(packCount == 1)
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    PortableDelta.vacuum(spark, path, graceMillis = 0L)
    assert(packCount == 1, "live adds still point at the DV pack")
    val expect = PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // compaction purges the DVs; after truncation the pack is garbage
    PortableDelta.optimizeCompact(spark, path)
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val n = PortableDelta.vacuum(spark, path, graceMillis = 0L)
    assert(packCount == 0, s"purged DV pack must be reclaimed (deleted $n files)")
    assert(PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet == expect)
  }
}
