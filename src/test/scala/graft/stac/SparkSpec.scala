package graft.stac

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[8, 3]: allow task re-attempts (production semantics) — the
      // streaming chaos spec injects first-attempt task failures and
      // asserts the retry converges to the exactly-once answer
      .master("local[8, 3]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def resource(name: String): String =
    getClass.getResource(name).getPath
}
