package graft.streaming

import org.apache.spark.sql.SparkSession

/** CLI surface for the streaming module: one incremental-sync pass
  * (Trigger.AvailableNow) from a source events dir to a parquet sink,
  * then prints total rows synced so far. Re-running picks up only new
  * files — the K6 `updated_after` pattern (`pgstac_reader.py:340-383`).
  *
  * Usage: StreamDemo <srcDir> <outDir> <checkpointDir>
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: StreamDemo <srcDir> <outDir> <checkpointDir>")
    val Array(src, out, ckpt) = args
    val spark = SparkSession.builder()
      .master(sys.env.get("SPARK_GRAFT_CPUS").fold("local[4]")(n => s"local[$n]"))
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    try {
      EventStream.incrementalSync(spark, src, out, ckpt).awaitTermination()
      println(s"[stream-demo] synced total=${spark.read.parquet(out).count()} rows in $out")
    } finally spark.stop()
  }
}
