package graft

import graft.stac._
import org.apache.spark.sql.SparkSession

/** CLI surface for the STAC pipeline: read items (ndjson / JSON array /
  * FeatureCollection, auto-detected) → normalize → GeoParquet with footer
  * metadata → read back → ndjson.
  *
  * Usage: runMain graft.StacDemo <input.json> <outDir>
  */
object StacDemo {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: StacDemo <input.json> <outDir>")
      sys.exit(2)
    }
    val Array(input, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = IngestMetrics.install(spark)
    val t0 = System.nanoTime()

    val df = StacJsonReader.read(spark, Seq(input))
    val norm = Normalize(df)
    println(s"[stac-demo] read ${norm.count()} items; schema:")
    norm.printSchema()

    val pq = s"$outDir/geoparquet"
    GeoParquetWriter.write(norm, pq)
    val part = new java.io.File(pq).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val kv = GeoParquetWriter.readFooterMetadata(
      new org.apache.hadoop.conf.Configuration(), part.getAbsolutePath)
    println(s"[stac-demo] footer keys: ${kv.keys.toSeq.sorted.mkString(", ")}")
    println(s"[stac-demo] geo: ${kv.getOrElse("geo", "").take(120)}...")

    val back = spark.read.parquet(pq)
    Denormalize.writeNdjson(back, s"$outDir/ndjson")
    val lines = spark.read.text(s"$outDir/ndjson").count()
    println(s"[stac-demo] wrote $lines ndjson items to $outDir/ndjson")
    // memlog-parity counters (BASELINE.md "engine-side counters"); drain
    // the async listener bus so the read is deterministic
    org.apache.spark.GraftSparkShim.drainListenerBus(spark)
    println(s"[stac-demo] metrics: ${metrics.report((System.nanoTime() - t0) / 1e9)}")
    spark.stop()
  }
}
