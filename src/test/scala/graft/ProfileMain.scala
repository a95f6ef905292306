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
      // q01 decomposition
      val li = Tables.t(spark, dir, "lineitem")
      time("q01_scan_only")(li.select(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))
      time("q01_filter")(li.filter(col("l_shipdate") <= "2000-12-01").select(col("l_quantity")))
      def cents(c: org.apache.spark.sql.Column) = round(c * 100, 0).cast("long")
      def centsF(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5).cast("long")
      time("q01_cents_round")(li.select(cents(col("l_quantity")), cents(col("l_extendedprice")),
        cents(col("l_discount")), cents(col("l_tax"))))
      time("q01_cents_floor")(li.select(centsF(col("l_quantity")), centsF(col("l_extendedprice")),
        centsF(col("l_discount")), centsF(col("l_tax"))))
      val eq = li.select((centsF(col("l_quantity")) =!= cents(col("l_quantity"))).as("d1"),
        (centsF(col("l_extendedprice")) =!= cents(col("l_extendedprice"))).as("d2"))
      println("[profile] floor!=round rows: " + eq.filter(col("d1") || col("d2")).count())
      // stac05 decomposition
      locally {
        import graft.stac.{Normalize, StacJsonReader}
        import org.apache.spark.sql.Encoders
        val o = Tables.t(spark, dir, "orders")
        val x = (col("o_orderkey") % 360 - 180).cast("double") + 0.5
        val y = (col("o_orderkey") % 170 - 85).cast("double") + 0.25
        val itemJson = concat(
          lit("{\"type\":\"Feature\",\"id\":\"o"), col("o_orderkey"), lit("\","),
          lit("\"geometry\":{\"type\":\"Point\",\"coordinates\":["),
          x.cast("string"), lit(","), y.cast("string"), lit("]},"),
          lit("\"bbox\":["), (x - 0.5).cast("string"), lit(","), (y - 0.25).cast("string"),
          lit(","), (x + 0.5).cast("string"), lit(","), (y + 0.25).cast("string"), lit("],"),
          lit("\"properties\":{\"datetime\":\""),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'"), lit("\"},"),
          lit("\"links\":[],\"assets\":{}}"))
        val strs = o.select(itemJson.as("value")).as[String](Encoders.STRING)
        time("s05_build_json")(strs.toDF)
        val wkb = strs.map(StacJsonReader.geometryToWkbHex)(Encoders.STRING)
        time("s05_wkb_map")(wkb.toDF)
        val cached = wkb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached.count()
        val t0 = System.nanoTime(); val sch = spark.read.json(cached).schema
        println(f"[profile] s05_infer_cached              ${(System.nanoTime()-t0)/1e9}%.2f s")
        val df = spark.read.schema(sch).json(cached)
        time("s05_read_pass")(df)
        time("s05_norm")(Normalize(graft.stac.StacJsonReader.hexGeometryToBinary(df), bboxDims = Some(4)))
      }
      // d05 CC iteration count
      locally {
        val t0 = System.nanoTime()
        val d05 = graft.SparkEntry.queries("d05_dedup_clusters")(spark, dir)
        d05.write.format("noop").mode("overwrite").save()
        println(f"[profile] d05_total                    ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    } finally spark.stop()
  }
}
