package graft.operators

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Plan probe for the BPE trainer internals (r18 optimization evidence).
  *
  * t18/t19's DECLARED frames are a driver-built merge table and a
  * scratch-parquet read-back, so `PlanDump` shows nothing of the per-round
  * work. This dumps the plans that actually dominate the timed body: one
  * round's pair-count aggregation and one round's merge application over
  * the word-vocabulary symbol state, plus t19's full token-count frame.
  *
  * Run: sbt "Test/runMain graft.operators.BpeProbe <sfDir> <outFile>".
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/bpe_plans.txt")
    val spark = SparkSession.builder().master("local[8]").appName("bpe-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.adaptive.enabled", value = true)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, dir, "documents")
    val pw = new PrintWriter(new File(out))
    def explain(title: String, df: org.apache.spark.sql.DataFrame): Unit = {
      pw.println(s"===== $title =====")
      pw.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      pw.println()
    }
    try {
      val seqs = Bpe.initSyms(Bpe.wordVocab(docs))
      explain("round shape: pairCounts(initial symbol state)",
        Bpe.pairCounts(seqs))
      explain("round shape: applyMerge(one rule) over the symbol state",
        Bpe.applyMerge(seqs, "e", "</w>"))
      explain("round shape: pairCounts after one applied merge",
        Bpe.pairCounts(Bpe.applyMerge(seqs, "e", "</w>")))
      val merges = Bpe.train(docs, merges = 8)
      val (counts, release) = Bpe.tokenCounts(docs, merges)
      explain("t19 token-count frame (8 trained rules replayed)", counts)
      release()
    } finally { pw.close(); spark.stop() }
    println(s"[bpe-probe] wrote $out")
  }
}
