package graft.operators

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused tests for the r19 optimization-round internals: cache-aware
  * memo revalidation, the CC loop's seed-count width derivation, the BPE
  * trainer's vocabulary-sized loop width, and the shared-shingle
  * contamination equivalence the d16 restructure relies on.
  */
class R19OptimizationSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  test("CachedMemo: same entry while cached, rebuilt after a cache clear") {
    val map = scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]
    var builds = 0
    def build() = {
      builds += 1
      spark.range(10).toDF("id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val key = (spark, "r19-memo-test")
    val a = graft.CachedMemo.get(map, key)(identity)(build())
    val b = graft.CachedMemo.get(map, key)(identity)(build())
    assert(builds == 1 && (a eq b), "cached entry must be reused as-is")
    spark.catalog.clearCache()
    val c = graft.CachedMemo.get(map, key)(identity)(build())
    assert(builds == 2 && !(c eq a),
      "a cleared cache must rebuild fresh persisted state")
    assert(c.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "the rebuilt entry must be persisted again")
    c.unpersist(); map.remove(key); ()
  }

  test("ConnectedComponents.autoWidth: identical components, width restored") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("src", "dst")
    val auto = ConnectedComponents.run(edges, autoWidth = true)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fixed = ConnectedComponents.run(edges, loopShuffleWidth = Some(3))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(auto.sameElements(fixed), "components must be width-invariant")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "the loop must restore the session shuffle width")
  }

  test("Bpe.train: vocabulary-width loop trains the identical merge table") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val docs = Seq((1L, "aa ab aa ab aa"), (2L, "ab ab ba"), (3L, "aa ba aa"))
      .toDF("doc_id", "text")
    val t1 = Bpe.train(docs, merges = 4).collect().map(_.toString).toSeq
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "train must restore the session shuffle width")
    // same corpus at a different session width → identical table
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val t2 = Bpe.train(docs, merges = 4).collect().map(_.toString).toSeq
      assert(t1 == t2, "merge table must be width-invariant")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("pretrainingPipeline funnel: a source losing every doc keeps " +
      "zero counts and a NULL kept_id_sum (the sum-FILTER semantics)") {
    // source "gone": two exact near-dup docs (dedup drops one), the
    // survivor shares every shingle with the eval doc (decontam drops it)
    // → s1 = 1, s2 = 0, s3 = 0, kept_id_sum NULL; source "ok" survives.
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (10L, text, "gone"), (11L, text, "gone"),
      (12L, "one two three four five six seven eight", "ok"),
      (13L, "nine ten eleven twelve thirteen fourteen fifteen", "ok"))
      .toDF("doc_id", "text", "source")
    val eval = Seq((1L, text)).toDF("doc_id", "text")
    val (_, funnel, release) =
      graft.queries.Pipeline.pretrainingPipeline(corpus, eval)
    val rows = funnel.orderBy("source").collect()
    release()
    val gone = rows.find(_.getString(0) == "gone").get
    assert(gone.getLong(1) == 2 && gone.getLong(2) == 1 &&
      gone.getLong(3) == 0 && gone.getLong(4) == 0,
      s"gone-source funnel counts wrong: $gone")
    assert(gone.isNullAt(5), s"empty kept set must sum to NULL: $gone")
    val ok = rows.find(_.getString(0) == "ok").get
    assert(ok.getLong(4) > 0 && !ok.isNullAt(5), s"ok source must keep docs: $ok")
  }

  test("contaminatedIdsFromSets ≡ contaminationFraction's contaminated ids") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six seven"),
      (12L, "alpha beta gamma nine ten"),
      (13L, "x")).toDF("doc_id", "text")
    val eval = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val viaFraction = NearDup.contaminationFraction(corpus, eval, tau = 0.3)
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val viaSets = NearDup.contaminatedIdsFromSets(
        NearDup.shingleSets(corpus), eval, tau = 0.3)
      .collect().map(_.getLong(0)).sorted
    assert(viaFraction.sameElements(viaSets),
      s"set-based contamination ids ${viaSets.toSeq} must equal the " +
        s"fraction operator's ${viaFraction.toSeq}")
    assert(viaSets.nonEmpty, "the fixture must actually contaminate something")
  }
}
