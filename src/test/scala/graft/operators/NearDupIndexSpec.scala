package graft.operators

import graft.stac.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized dedup-history band index ([[NearDup.buildBandIndex]] /
  * [[NearDup.dedupAgainstHistoryIndexed]]): served results must be
  * row-for-row the inline [[NearDup.dedupAgainstHistory]] path's, with or
  * without the In(bkey) pushdown, and the footer must round-trip the
  * build dials so serving never guesses them. */
class NearDupIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  // overlapping sentences so minhash bands actually collide across the
  // history/new split (ids 0,2,4.. = history; 1,3,5.. = new)
  private lazy val docs: DataFrame = {
    val s = spark; import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val rows = (0L until 40L).map { i =>
      val drift = if (i % 7 == 0) s" extra words $i here" else ""
      val text = if (i % 3 == 0) base + drift
                 else if (i % 3 == 1) base.replace("lazy", s"sleepy$i") + drift
                 else s"completely unrelated content block number $i with its own words"
      (i, text)
    }
    rows.toDF("doc_id", "text")
  }

  private def buildIdx(): String = {
    val path = java.nio.file.Files.createTempDirectory("ndidx").toString + "/idx"
    NearDup.buildBandIndex(docs.filter(col("doc_id") % 2 === 0), path,
      seeds = 4, shingleN = 3, files = 3)
    path
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.toString).toSeq

  test("indexed serving is row-for-row the inline path (flags AND keepers)") {
    val idx = buildIdx()
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val (keptI, flaggedI, relI) = NearDup.dedupAgainstHistory(hist, batch, tau = 0.5)
    val (keptX, flaggedX, relX) =
      NearDup.dedupAgainstHistoryIndexed(spark, idx, batch, tau = 0.5)
    assert(sortedRows(flaggedX) == sortedRows(flaggedI),
      "served flags must equal the inline path's")
    assert(sortedRows(keptX) == sortedRows(keptI),
      "served keepers must equal the inline path's")
    assert(flaggedI.count() > 0, "fixture must actually flag cross-corpus dups")
    assert(keptI.count() + flaggedI.count() == batch.count(),
      "kept + flagged partition the batch")
    relI(); relX()
  }

  test("pushdown-cap fallback (no In list) returns identical rows") {
    val idx = buildIdx()
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val (_, withPush, r1) =
      NearDup.dedupAgainstHistoryIndexed(spark, idx, batch, tau = 0.5)
    val (_, noPush, r2) = NearDup.dedupAgainstHistoryIndexed(spark, idx, batch,
      tau = 0.5, maxPushdownKeys = 0)
    assert(sortedRows(noPush) == sortedRows(withPush),
      "results must be independent of the pushdown dial")
    r1(); r2()
  }

  test("footer round-trips the build dials; a non-index dir refuses by name") {
    val idx = buildIdx()
    assert(NearDup.bandIndexParams(spark, idx) == ((4, 3)))
    val plain = java.nio.file.Files.createTempDirectory("notidx").toString + "/p"
    docs.select(col("doc_id").as("hist_id"), col("text"))
      .write.parquet(plain + "/bands")
    val e = intercept[IllegalArgumentException] {
      NearDup.bandIndexParams(spark, plain)
    }
    assert(e.getMessage.contains("buildBandIndex"))
  }
}
