package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-repeat timing probe for d16 (test scope, diagnostic only): runs the
  * REAL gate body N times with `spark.catalog.clearCache()` between runs —
  * the r19 bench regime (warm JIT, cold data) — and times the construction
  * phase (driver-side: planning + the in-gate count/CC actions) separately
  * from the final funnel materialization.
  * Run: sbt "Test/runMain graft.D16Probe2 /root/testdata/sf0.1 [reps]".
  */
object D16Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("d16-probe2")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try {
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        val docs = Tables.t(spark, dir, "documents")
        val t0 = System.nanoTime()
        val (_, funnel, _) = queries.Pipeline.pretrainingPipeline(
          docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10))
        val t1 = System.nanoTime()
        funnel.orderBy(col("source"))
          .write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"[d16probe2] rep $rep construct ${(t1 - t0) / 1e9}%.2f s " +
          f"funnel ${(t2 - t1) / 1e9}%.2f s total ${(t2 - t0) / 1e9}%.2f s")
      }
    } finally spark.stop()
  }
}
