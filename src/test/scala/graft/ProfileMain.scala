package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (test scope, not part of the driver contract):
  * times isolated fragments of a hotspot query so bench tuning targets the
  * real cost. Run: sbt "Test/runMain graft.ProfileMain <sfDir>".
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    try {
      def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      import graft.queries.{DedupOps, TextOps}
      val docs = Tables.t(spark, dir, "documents")
      time("read_docs")(docs)
      val ws = docs.select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      time("words")(ws)
      val sg = docs.select(col("doc_id"), array_distinct(DedupOps.shingles3(TextOps.words(col("text")))).as("g"))
      time("shingles_distinct")(sg)
      val ex = sg.select(col("doc_id"), explode(col("g")).as("sh"))
      time("explode")(ex)
      val seeded = ex.withColumn("seed", explode(lit((0 until 4).toArray)))
      time("seeded")(seeded)
      val hashed = seeded.select(col("doc_id"), col("seed"),
        md5(concat(col("seed").cast("string"), lit(":"), col("sh"))).as("hv"))
      time("md5")(hashed)
      val mh = hashed.groupBy(col("doc_id"), col("seed")).agg(min(col("hv")).as("mhv"))
      time("minhash_agg")(mh)
      println("[profile] rows: docs=" + docs.count() + " exploded=" + ex.count() +
        " seeded=" + seeded.count())
    } finally spark.stop()
  }
}
