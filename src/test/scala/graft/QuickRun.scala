package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query runner (test scope, not part of the driver contract):
  * times the named queries end-to-end through the noop sink.
  * Run: sbt "Test/runMain graft.QuickRun <sfDir> <query> [query ...]".
  */
object QuickRun {
  def main(args: Array[String]): Unit = {
    def known = SparkEntry.specs.map(_.name).sorted.mkString(", ")
    if (args.length < 2) {
      System.err.println(s"usage: QuickRun <sfDir> <query> [query ...]\nknown queries: $known")
      sys.exit(2)
    }
    val dir = args.head
    val names = args.tail
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\nknown queries: $known")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-quickrun")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      val byName = SparkEntry.specs.map(q => q.name -> q).toMap
      names.foreach { n =>
        byName(n).prepare.foreach(p => p(spark, dir)) // untimed, like Bench
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[quickrun] $n%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally spark.stop()
  }
}
