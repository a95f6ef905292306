package graft

import org.apache.spark.sql.SparkSession

/** Measures the per-query fixed overhead (plan+schedule+noop-write) with
  * AQE on vs off, on a trivial query. Run: sbt "Test/runMain graft.FloorProbe".
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for ((aqe, parts, sort) <- Seq((true, 32, true), (true, 32, false), (true, 4, true), (false, 4, false))) {
      val spark = SparkSession.builder()
        .master("local[32]").appName(s"floor-$aqe")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.ui.enabled", value = false)
        .getOrCreate()
      spark.range(100000).selectExpr("sum(id)").collect() // warm
      spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey").count()
        .write.format("noop").mode("overwrite").save()
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val base = spark.read.parquet(s"$dir/nation.parquet")
          .groupBy("n_regionkey").count()
        (if (sort) base.orderBy("n_regionkey") else base)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] aqe=$aqe parts=$parts sort=$sort times=${times.map(t => f"$t%.3f").mkString(",")}")
      // same floor with the RELATION resolved once (the r19 Tables.t memo):
      // isolates DataSource re-resolution (listing + footer) from the rest
      val rel = spark.read.parquet(s"$dir/nation.parquet")
      val timesMemo = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val base = rel.groupBy("n_regionkey").count()
        (if (sort) base.orderBy("n_regionkey") else base)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] aqe=$aqe parts=$parts sort=$sort MEMO  times=${timesMemo.map(t => f"$t%.3f").mkString(",")}")
      spark.stop()
    }
  }
}
