package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level wall-time split for stac50 (test scope, diagnostic only):
  * mirrors the gate body stage for stage with timers, so driver-side
  * costs (commits, footer I/O, DV serialization) can be attributed.
  * Run: sbt "Test/runMain graft.Stac50Probe2 /root/testdata/sf0.1 [reps]".
  */
object Stac50Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("stac50-probe2")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import graft.stac.PortableDelta
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stac50p2] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        println(s"[stac50p2] --- rep $rep ---")
        val s = spark
        val orders = Tables.t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .repartition(8, col("o_orderkey"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = java.nio.file.Files.createTempDirectory("stac50").toString + "/tbl"
        time("write-even") {
          PortableDelta.write(orders.filter(col("o_orderkey") % 2 === 0), out)
        }
        time("write-odd") {
          PortableDelta.write(orders.filter(col("o_orderkey") % 2 === 1), out,
            mode = "append")
        }
        orders.unpersist()
        val m = time("stats-agg") {
          PortableDelta.aggregateFromStats(s, out,
            Seq("o_orderkey", "o_totalprice", "o_orderstatus")).head()
        }
        val full = time("full-scan-agg") {
          PortableDelta.readTable(s, out)
            .agg(count(lit(1)).cast("long"), min("o_orderkey"), max("o_orderkey"),
              min("o_totalprice"), max("o_totalprice"),
              min("o_orderstatus"), max("o_orderstatus")).head()
        }
        require((0 until 7).forall(i => m.get(i) == full.get(i)))
        val d = time("dv-delete") {
          PortableDelta.delete(s, out, col("o_orderkey") % 10 === 3)
        }
        require(d.deletedRows > 0)
        val cntAfter = time("stats-agg-after-dv") {
          PortableDelta.aggregateFromStats(s, out).head().getLong(0)
        }
        val liveCnt = time("readTable-count") {
          PortableDelta.readTable(s, out).count()
        }
        require(cntAfter == liveCnt)
        time("minmax-refusal") {
          try { PortableDelta.aggregateFromStats(s, out, Seq("o_orderkey")); false }
          catch { case e: IllegalStateException =>
            e.getMessage.contains("deletion vector") }
        }
      }
    } finally spark.stop()
  }
}
