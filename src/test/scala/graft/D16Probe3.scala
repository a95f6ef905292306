package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sub-phase timing for the r19 pretrainingPipeline construction (test
  * scope, diagnostic only) — mirrors Pipeline.pretrainingPipeline phase
  * by phase so the construct-side cost can be attributed.
  * Run: sbt "Test/runMain graft.D16Probe3 /root/testdata/sf0.1 [reps]".
  */
object D16Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("d16-probe3")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import graft.operators.NearDup
    def anchor(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftSqlShim.replayableBatch(df)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d16p3] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        println(s"[d16p3] --- rep $rep ---")
        val docs = Tables.t(spark, dir, "documents")
        val corpus = docs.filter(col("doc_id") >= 10)
        val evalDocs = docs.filter(col("doc_id") < 10)
        val sg = NearDup.shingleSets(corpus).persist(StorageLevel.MEMORY_AND_DISK)
        val pairs0 = time("plan:pairs") {
          NearDup.verifiedPairsFromSets(sg, "doc_id")
            .persist(StorageLevel.MEMORY_AND_DISK)
        }
        val pairs = time("anchor:pairs")(anchor(pairs0))
        val pcount = time("action:pairs.count") {
          pairs.filter(col("jaccard") >= 0.6).count()
        }
        val drop0 = time("cc:clusters") {
          val d = NearDup.clusters(pairs, 0.6).filter(!col("is_kept"))
            .select(col("doc_id")).persist(StorageLevel.MEMORY_AND_DISK)
          d.count(); d
        }
        val drop = anchor(drop0)
        val s1p = corpus.join(drop, Seq("doc_id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val s1 = time("anchor:s1")(anchor(s1p))
        val contaminated = NearDup.contaminatedIdsFromSets(sg, evalDocs, 0.05)
        val s2p = s1.join(contaminated, Seq("doc_id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val s2 = time("anchor:s2")(anchor(s2p))
        val (s3raw, _) = time("plan:lm")(queries.Pipeline.lmQualityFilter(s2, 4, 3))
        val s3p = s3raw.persist(StorageLevel.MEMORY_AND_DISK)
        val s3 = time("anchor:s3")(anchor(s3p))
        def stage(df: DataFrame, c: String) =
          df.select(col("doc_id")).withColumn(c, lit(true))
        time("action:funnel") {
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
        println(s"[d16p3] pairs>=tau count = $pcount")
      }
    } finally spark.stop()
  }
}
