package graft

/** Partial correctness dump (test scope): graft.Verify restricted to the
  * named queries — fast iteration on a single gate row. Shares the gate
  * session, dump loop, and oracle-JSON writer with Verify so the partial
  * run can't diverge from the full gate.
  * Run: sbt "Test/runMain graft.VerifySome <sfDir> <outDir> <query> [query ...]"
  * then: python3 tools/compare.py <sfDir> <outDir>
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    def known = SparkEntry.specs.map(_.name).sorted.mkString(", ")
    if (args.length < 3) {
      System.err.println(s"usage: VerifySome <sfDir> <outDir> <query> [query ...]\nknown: $known")
      sys.exit(2)
    }
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}; known: $known")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Verify.gateSession(cpus)
    Verify.dump(spark, sfDir, outDir, Some(names), failSoft = false)
    spark.stop()
  }
}
