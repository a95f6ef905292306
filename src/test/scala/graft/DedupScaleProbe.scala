package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rehearsal tooling (test scope): the d21 scale claim measured — a
  * SMALL ingest batch deduped against a BIG kept archive, indexed
  * (build-once [[graft.operators.NearDup.buildBandIndex]] + per-batch
  * [[graft.operators.NearDup.dedupAgainstHistoryIndexed]] probe) versus
  * the inline overload that re-shingles the archive per call. The
  * production claim is O(batch + candidates) per snapshot for the
  * indexed path vs O(archive) inline; at 100× corpus the gap is the
  * point of the operator.
  *
  * Run: sbt "Test/runMain graft.DedupScaleProbe <sfDir> [batchDocs] [repeats]".
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DedupScaleProbe <sfDir> [batchDocs] [repeats]")
    val dir = args(0)
    val batchDocs = if (args.length > 1) args(1).toLong else 500L
    val repeats = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-dedup-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", value = false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = Tables.t(spark, dir, "documents")
      val history = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
        .orderBy(col("doc_id")).limit(batchDocs.toInt)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] history ${history.count()} docs, batch ${batch.count()} docs")
      val idx = java.nio.file.Files.createTempDirectory("dedup_probe").toString + "/idx"
      val tb0 = System.nanoTime()
      graft.operators.NearDup.buildBandIndex(history, idx, files = 32)
      println(f"[probe] buildBandIndex (once per archive): ${(System.nanoTime() - tb0) / 1e9}%.2f s")
      (1 to repeats).foreach { i =>
        val t0 = System.nanoTime()
        val (_, flagged, release) = graft.operators.NearDup
          .dedupAgainstHistoryIndexed(spark, idx, batch, tau = 0.6)
        val n = flagged.count()
        release()
        println(f"[probe] INDEXED batch dedup pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n flagged)")
      }
      (1 to repeats).foreach { i =>
        val t0 = System.nanoTime()
        val (_, flagged, release) = graft.operators.NearDup
          .dedupAgainstHistory(history, batch, tau = 0.6)
        val n = flagged.count()
        release()
        println(f"[probe] INLINE batch dedup pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n flagged)")
      }
    } finally spark.stop()
  }
}
