package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. The session
  * builder, dump loop, and oracle-JSON writer are shared with the
  * test-scope partial runner (graft.VerifySome) so the two can't drift. */
object Verify {

  /** The gate session. Every config here is part of the correctness
    * contract (UTC, nanos-as-long) — single definition for all runners. */
  def gateSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the documented deployment shape (spark.sql.extensions=
      // graft.GraftExtensions): native SQL functions + the SQL DML
      // rewrites over portable-delta tables — post-hoc resolution rules
      // cannot be armed at runtime, so the gate session carries them
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
      // default; read as epoch-ns Long (queries convert with `div 1000`).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Dump the named queries (all when `names` is None) as one parquet dir
    * each. `failSoft` logs per-query failures instead of aborting —
    * the full gate reports every row; the partial runner fails fast. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
           names: Option[Seq[String]] = None, failSoft: Boolean = true): Unit = {
    new java.io.File(outDir).mkdirs()
    val selected = names match {
      case Some(ns) => ns.map(n => n -> SparkEntry.queries(n))
      case None => SparkEntry.queries.toSeq
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch {
        case e: Throwable if failSoft =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    writeOracleJson(outDir, names)
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def writeOracleJson(outDir: String, names: Option[Seq[String]] = None): Unit = {
    val oracle = names match {
      case Some(ns) => SparkEntry.oracleSql.filter(kv => ns.contains(kv._1))
      case None => SparkEntry.oracleSql
    }
    val json = oracle
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = gateSession(cpus)
    dump(spark, sfDir, outDir)
    spark.stop()
  }
}
