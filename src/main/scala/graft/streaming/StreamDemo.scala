package graft.streaming

import org.apache.spark.sql.SparkSession

/** CLI surface for the streaming module: one incremental pass
  * (Trigger.AvailableNow) from a source dir to a parquet sink, then prints
  * total rows synced so far. Re-running picks up only new files — the K6
  * `updated_after` pattern (`pgstac_reader.py:340-383`).
  *
  * Usage: StreamDemo <srcDir> <outDir> <checkpointDir>          (events)
  *        StreamDemo --stac <srcDir> <outDir> <checkpointDir>   (STAC ndjson ingest)
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val stacMode = args.headOption.contains("--stac")
    val rest = if (stacMode) args.drop(1) else args
    require(rest.length == 3, "usage: StreamDemo [--stac] <srcDir> <outDir> <checkpointDir>")
    val Array(src, out, ckpt) = rest
    val spark = SparkSession.builder()
      .master(sys.env.get("SPARK_GRAFT_CPUS").fold("local[4]")(n => s"local[$n]"))
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    try {
      if (stacMode) {
        val sample = Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && !f.getName.startsWith(".")).map(_.getPath).take(1)
        require(sample.nonEmpty, s"no sample file in $src to infer the item schema from")
        val (schema, bboxDims) = StacStream.inferIngestSpec(spark, sample.toSeq)
        StacStream.ingest(spark, src, out, ckpt, schema, bboxDims).awaitTermination()
      } else EventStream.incrementalSync(spark, src, out, ckpt).awaitTermination()
      println(s"[stream-demo] synced total=${spark.read.parquet(out).count()} rows in $out")
    } finally spark.stop()
  }
}
