package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the ANN family (r18 optimization round):
  * times isolated fragments of s13/s14 so tuning targets the real cost.
  * Run: sbt "Test/runMain graft.operators.AnnProfile <sfDir>".
  */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("ann-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.adaptive.enabled", value = true)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[annprof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      def noop(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
        time(name)(df.write.format("noop").mode("overwrite").save())

      val emb = graft.Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") % 100 === 0)
      noop("read_embeddings")(emb)
      println("[annprof] corpus rows = " + emb.count() + ", queries = " + q.count())

      // from-scratch IVF-PQ (the s13 body / s14 cross-check)
      (1 to 2).foreach { p =>
        noop(s"ivfPqTopK_full pass$p")(Ann.ivfPqTopK(
          emb, q, k = 3, cells = 16, nprobe = 2, subspaces = 8, codes = 16,
          shortlist = 32))
      }
      // components
      noop("int8Quantize")(Ann.int8Quantize(emb))
      val quant = Ann.int8Quantize(emb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      noop("quant_materialize")(quant)
      noop("pqEncode_from_cached")(Ann.pqEncode(quant, 8, 16))
      noop("assignCells16")(Ann.assignCells(emb, 16))
      noop("pqTopK_from_cached")(Ann.pqTopK(quant,
        quant.filter(col("vec_id") % 100 === 0), k = 3, subspaces = 8,
        codes = 16, shortlist = 32))
      quant.unpersist()
      // s14: serving + cross-check split
      val idx = java.nio.file.Files.createTempDirectory("annprof").toString + "/ivfpq"
      time("buildIvfPqIndex(prepare)")(Ann.buildIvfPqIndex(emb, idx, cells = 16))
      (1 to 2).foreach { p =>
        noop(s"ivfPqTopKIndexed pass$p")(Ann.ivfPqTopKIndexed(
          spark, idx, q, k = 3, nprobe = 2, shortlist = 32))
      }
      val out = Ann.ivfPqTopKIndexed(spark, idx, q, k = 3, nprobe = 2,
        shortlist = 32).persist()
      val scratch = Ann.ivfPqTopK(emb, q, k = 3, cells = 16, nprobe = 2,
        subspaces = 8, codes = 16, shortlist = 32).persist()
      time("except_leg1")(require(out.except(scratch).isEmpty))
      time("except_leg2")(require(scratch.except(out).isEmpty))
      out.unpersist(); scratch.unpersist()
    } finally spark.stop()
  }
}
