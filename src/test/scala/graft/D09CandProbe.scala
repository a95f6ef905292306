package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate-volume probe for d09's PPJoin length filter (test scope,
  * diagnostic only) — the r18 optimization moved min ≥ τ·max INTO the
  * prefix self-join; this measures what the filter actually drops:
  * raw prefix-join candidate pairs (pre-distinct) and distinct pairs,
  * with and without the length condition, plus verify survivors.
  * Run: sbt "Test/runMain graft.D09CandProbe <sfDir> [tau]".
  */
object D09CandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("d09-cand-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val sg = graft.operators.NearDup.shingleSets(
        Tables.t(spark, dir, "documents"))
      val hashed = sg.repartition(col("doc_id")).select(col("doc_id"),
          array_distinct(transform(col("g"),
            x => conv(substring(md5(x), 1, 15), 16, 10).cast("long"))).as("gh"))
        .withColumn("sz", size(col("gh")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val post = hashed.select(col("doc_id"), col("sz"), explode(col("gh")).as("h"))
      val dfreq = post.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val prefix = post.join(dfreq, "h")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
        .filter(col("rk") <= col("sz") - ceil(col("sz") * lit(tau)).cast("int") + 1)
        .select(col("doc_id"), col("h"), col("sz"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val b = prefix.select(col("doc_id").as("doc_b"), col("h").as("h_b"),
        col("sz").as("szb0"))
      val joinBase = col("h") === col("h_b") && col("doc_id") < col("doc_b")
      val lenOk = least(col("sz"), col("szb0")).cast("double") >=
        greatest(col("sz"), col("szb0")) * lit(tau)
      val rawNo = prefix.join(b, joinBase).count()
      val rawLen = prefix.join(b, joinBase && lenOk).count()
      val distNo = prefix.join(b, joinBase)
        .select(col("doc_id"), col("doc_b")).distinct().count()
      val distLen = prefix.join(b, joinBase && lenOk)
        .select(col("doc_id"), col("doc_b")).distinct().count()
      println(f"[d09cand] sf=$dir tau=$tau")
      println(f"[d09cand] raw prefix-join rows:     no-filter $rawNo%8d  with-length-filter $rawLen%8d  (${100.0 * (rawNo - rawLen) / math.max(1L, rawNo)}%.1f%% dropped)")
      println(f"[d09cand] distinct candidate pairs: no-filter $distNo%8d  with-length-filter $distLen%8d  (${100.0 * (distNo - distLen) / math.max(1L, distNo)}%.1f%% dropped)")
    } finally spark.stop()
  }
}
