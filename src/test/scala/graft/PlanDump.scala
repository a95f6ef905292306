package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for every registered query to a file so the
  * plans can be audited for scale-readiness (pushdown, broadcast choices,
  * shuffle counts). Run: sbt "Test/runMain graft.PlanDump <sfDir> <out>".
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val spark = SparkSession.builder().master("local[8]").appName("graft-plans")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.adaptive.enabled", value = true)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pw = new PrintWriter(new File(out))
    try {
      SparkEntry.specs.filter(_.timed).foreach { spec =>
        pw.println(s"===== ${spec.name} =====")
        try {
          val df = spec.run(spark, dir)
          pw.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable => pw.println(s"ERROR: ${e.getMessage}") }
        pw.println()
      }
    } finally { pw.close(); spark.stop() }
    println(s"[plans] wrote $out")
  }
}
