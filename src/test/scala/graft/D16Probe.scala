package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-level timing probe for d16_training_pipeline (test scope,
  * diagnostic only): times each pipeline stage separately so a drift in
  * the composed number can be attributed. Mirrors
  * `Pipeline.pretrainingPipeline` stage-for-stage.
  * Run: sbt "Test/runMain graft.D16Probe /root/testdata/sf0.1 [reps]".
  */
object D16Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("d16-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d16probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      (1 to reps).foreach { rep =>
        println(s"[d16probe] --- rep $rep ---")
        val docs = Tables.t(spark, dir, "documents")
        val corpus = docs.filter(col("doc_id") >= 10)
        val evalDocs = docs.filter(col("doc_id") < 10)
        val (s1raw, rel1) = time("s1:neardup.dedup") {
          val (a, b) = graft.operators.NearDup.dedup(corpus, 0.6)
          a.persist(StorageLevel.MEMORY_AND_DISK).count()
          (a, b)
        }
        val s1 = s1raw
        val s2 = time("s2:decontaminate") {
          val contaminated = graft.operators.NearDup
            .contaminationFraction(s1, evalDocs, 0.05)
            .filter(col("contaminated")).select(col("doc_id"))
          val f = s1.join(contaminated, Seq("doc_id"), "left_anti")
            .persist(StorageLevel.MEMORY_AND_DISK)
          f.count(); f
        }
        val (s3, rel3) = time("s3:lmQualityFilter") {
          val (a, b) = queries.Pipeline.lmQualityFilter(s2, 4, 3)
          val p = a.persist(StorageLevel.MEMORY_AND_DISK)
          p.count(); (p, b)
        }
        time("s4:funnel-agg") {
          def stage(df: org.apache.spark.sql.DataFrame, c: String) =
            df.select(col("doc_id")).withColumn(c, lit(true))
          corpus.select(col("source"), col("doc_id"))
            .join(stage(s1, "in1"), Seq("doc_id"), "left")
            .join(stage(s2, "in2"), Seq("doc_id"), "left")
            .join(stage(s3, "in3"), Seq("doc_id"), "left")
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs"),
              count(when(col("in1"), 1)).as("n_after_neardup"),
              count(when(col("in2"), 1)).as("n_after_decontam"),
              count(when(col("in3"), 1)).as("n_after_lm"),
              sum(when(col("in3"), col("doc_id"))).as("kept_id_sum"))
            .orderBy(col("source"))
            .write.format("noop").mode("overwrite").save()
        }
        rel1(); rel3(); s1.unpersist(); s2.unpersist(); s3.unpersist()
      }
    } finally spark.stop()
  }
}
