package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Action trace for stac50_metadata_only_agg (test scope, diagnostic
  * only): records every Spark JOB the gate body launches (description,
  * wall ms) so the "every action is semantic" claim is checkable.
  * Run: sbt "Test/runMain graft.Stac50Probe /root/testdata/sf0.1 [reps]".
  */
object Stac50Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("stac50-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    val starts = scala.collection.mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (js.time,
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          jobs += ((je.jobId, je.time - t0, d)); () }
    })
    try {
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        jobs.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries("stac50_metadata_only_agg")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkShim.drainListenerBus(spark)
        println(f"[stac50] rep $rep total $total%.2f s, ${jobs.size} jobs:")
        jobs.foreach { case (id, ms, d) =>
          println(f"[stac50]   job $id%3d ${ms / 1000.0}%6.2f s  ${d.take(90)}")
        }
      }
    } finally spark.stop()
  }
}
