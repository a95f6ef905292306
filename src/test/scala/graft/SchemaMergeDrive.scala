package graft

import org.apache.spark.sql.SparkSession

/** Package-boundary drive for the A1 schema-merge utility: two JSON chunks
  * with diverging schemas (int vs double, missing vs present fields, all-null
  * vs typed) are read separately, merged with StacSchema.mergeStructTypes,
  * and re-read under the unified schema — the reference's ChunksToDisk
  * unify step (`_api.py:128-155`). Run: sbt "Test/runMain graft.SchemaMergeDrive".
  */
object SchemaMergeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("merge-drive")
      .config("spark.ui.enabled", value = false).getOrCreate()
    import spark.implicits._
    try {
      val chunk1 = Seq("""{"id":"a","gsd":10,"proj:epsg":null}""",
        """{"id":"b","gsd":20,"proj:epsg":null}""").toDS()
      val chunk2 = Seq("""{"id":"c","gsd":0.5,"proj:epsg":32633,"platform":"s2"}""").toDS()
      val s1 = spark.read.json(chunk1).schema
      val s2 = spark.read.json(chunk2).schema
      val merged = graft.stac.StacSchema.mergeStructTypes(s1, s2)
      println(s"[merge-drive] s1=${s1.simpleString}")
      println(s"[merge-drive] s2=${s2.simpleString}")
      println(s"[merge-drive] merged=${merged.simpleString}")
      val all = spark.read.schema(merged).json(chunk1.union(chunk2))
      all.orderBy("id").collect().foreach(r => println(s"[merge-drive] row=$r"))
    } finally spark.stop()
  }
}
