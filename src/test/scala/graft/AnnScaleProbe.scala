package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rehearsal tooling (test scope): measure s12-shaped indexed ANN serving
  * with the PRODUCTION bucket dial instead of the gate's pinned one.
  *
  * The s12 gate builds its index with bits = 4 (16 buckets) because the
  * DuckDB oracle mirrors that dial symbolically — which makes the GATE's
  * serving cost grow with per-bucket density, i.e. quadratic-ish in
  * corpus rows (the hot 30×→50× bracket in BASELINE.md). The facade's
  * real dial is [[graft.operators.Ann.adaptiveBits]]: buckets scale with
  * the corpus so density stays ~constant. This probe times the SAME
  * serve path (buildIndex → annTopKIndexed, untimed build) at whatever
  * corpus it's pointed at, with the adaptive dial, so the trend table
  * can report the production number next to the pinned-dial one.
  *
  * Run: sbt "Test/runMain graft.AnnScaleProbe <sfDir> [repeats]".
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnScaleProbe <sfDir> [repeats]")
    val dir = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-ann-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", value = false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val corpus = Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val n = corpus.count()
      val bits = graft.operators.Ann.adaptiveBits(n)
      println(s"[probe] corpus $n rows → adaptive bits $bits (${1 << bits} buckets)")
      val path = java.nio.file.Files.createTempDirectory("ann_probe").toString + "/idx"
      graft.operators.Ann.buildIndex(corpus, path, bits = bits, files = 8)
      val queries = corpus.filter(col("vec_id") % 100 === 0)
      (1 to repeats).foreach { i =>
        val t0 = System.nanoTime()
        graft.operators.Ann.annTopKIndexed(spark, path, queries, k = 3, probes = 5)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] adaptive-dial serve pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // s14's production shape: IVF-PQ index with the ADAPTIVE cell dial
      // (the gate pins cells=16 so its DuckDB oracle can mirror the
      // centroids symbolically — per-cell density then grows linearly
      // with the corpus and ADC cost quadratically, the same pinned-dial
      // artifact as s12's bits; this measures the real dial instead)
      val cells = graft.operators.Ann.adaptiveCells(n)
      println(s"[probe] corpus $n rows → adaptive cells $cells")
      val path2 = java.nio.file.Files.createTempDirectory("ann_probe_pq").toString + "/idx"
      graft.operators.Ann.buildIvfPqIndex(corpus, path2, cells = cells, files = 8)
      (1 to repeats).foreach { i =>
        val t0 = System.nanoTime()
        graft.operators.Ann.ivfPqTopKIndexed(spark, path2, queries, k = 3, nprobe = 2)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] adaptive-dial ivfpq serve pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally spark.stop()
  }
}
