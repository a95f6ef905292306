package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Partial correctness dump (test scope): like graft.Verify but only for
  * the named queries — fast iteration on a single gate row.
  * Run: sbt "Test/runMain graft.VerifySome <sfDir> <outDir> <query> [query ...]"
  * then: python3 tools/compare.py <sfDir> <outDir>
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        s"usage: VerifySome <sfDir> <outDir> <query> [query ...]\nknown: ${SparkEntry.specs.map(_.name).sorted.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; known: ${SparkEntry.specs.map(_.name).sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
