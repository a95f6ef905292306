package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle-byte audit (test scope, diagnostic only): runs each named
  * query cold (cache cleared, prepare untimed) and reports total shuffle
  * read/write bytes and records from the stage metrics — the §2.3
  * "shuffle fewer bytes" evidence for the banded-candidate audits.
  * Run: sbt "Test/runMain graft.ShuffleBytesProbe <sfDir> <query...>".
  */
object ShuffleBytesProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShuffleBytesProbe <sfDir> <query...>")
    val dir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("shuffle-bytes-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    @volatile var read = 0L
    @volatile var written = 0L
    @volatile var recs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        read += m.shuffleReadMetrics.totalBytesRead
        written += m.shuffleWriteMetrics.bytesWritten
        recs += m.shuffleWriteMetrics.recordsWritten
      }
    })
    val byName = SparkEntry.specs.map(q => q.name -> q).toMap
    try {
      names.foreach { n =>
        spark.catalog.clearCache()
        byName(n).prepare.foreach(p => p(spark, dir))
        org.apache.spark.GraftSparkShim.drainListenerBus(spark)
        read = 0L; written = 0L; recs = 0L
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkShim.drainListenerBus(spark)
        println(f"[shufbytes] $n%-34s ${secs}%6.2f s  write ${written / 1024.0 / 1024.0}%8.2f MiB  read ${read / 1024.0 / 1024.0}%8.2f MiB  records $recs%10d")
      }
    } finally spark.stop()
  }
}
