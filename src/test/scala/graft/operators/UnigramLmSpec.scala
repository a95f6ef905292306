package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[UnigramLm]] — hard-EM unigram tokenizer training. Contracts: the
  * Viterbi tie-break order (pieces ASC, sum DESC, length DESC) exactly,
  * unsegmentable None, seed-cap determinism, EM-round count
  * conservation (Σ piece counts ≡ Σ freq × pieces-per-word), encode
  * fallbacks, and run-to-run determinism. */
class UnigramLmSpec extends AnyFunSuite {

  private lazy val spark = graft.stac.SparkSpec.spark

  private def seg(w: String, m: Map[String, Long]) =
    UnigramLm.segment(w, m, maxPieceLen = 5)

  test("viterbi: fewer pieces wins") {
    val m = Map("ab" -> 1L, "a" -> 100L, "b" -> 100L)
    assert(seg("ab", m).get == ((1, 1L, List("ab"))))
  }

  test("viterbi: sum breaks piece-count ties") {
    val m = Map("ab" -> 5L, "c" -> 5L, "a" -> 5L, "bc" -> 6L)
    assert(seg("abc", m).get == ((2, 11L, List("a", "bc"))))
  }

  test("viterbi: longer piece at the position breaks exact (np, sum) ties") {
    val m = Map("aa" -> 2L, "a" -> 1L, "ab" -> 2L, "b" -> 1L)
    // aa+b = (2, 3) and a+ab = (2, 3): the longer first piece wins
    assert(seg("aab", m).get == ((2, 3L, List("aa", "b"))))
  }

  test("viterbi: greedy longest is NOT assumed — optimality beats greed") {
    val m = Map("ab" -> 10L, "cd" -> 10L, "abc" -> 10L, "a" -> 1L,
      "b" -> 1L, "c" -> 1L, "d" -> 1L)
    // greedy would take abc then d (2 pieces, sum 11); ab+cd also 2
    // pieces, sum 20 — the DP must find it
    assert(seg("abcd", m).get == ((2, 20L, List("ab", "cd"))))
  }

  test("viterbi: unsegmentable word is None") {
    assert(seg("axb", Map("a" -> 1L, "b" -> 1L)).isEmpty)
  }

  private def docsDf = {
    val s = spark; import s.implicits._
    Seq((1L, "spark spark scan"), (2L, "spark scan scan scan"),
      (3L, ""), (4L, "superlongword12345 spark"))
      .toDF("doc_id", "text")
  }

  test("train: count conservation and segmentability of the final vocab") {
    val s = spark; import s.implicits._
    val trained = UnigramLm.train(docsDf, rounds = 2, maxWordLen = 12)
    val pieces = trained.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pieces.nonEmpty && pieces.values.forall(_ > 0))
    // every trainable word segments under the final vocabulary, and the
    // total piece usage equals the piece-count table exactly
    val words = UnigramLm.wordVocab(docsDf, maxWordLen = 12)
      .as[(String, Long)].collect()
    assert(words.map(_._1).toSet ==
      Set("spark", "scan")) // the 18-char word is excluded by maxWordLen
    val usage = words.flatMap { case (w, f) =>
      val r = UnigramLm.segment(w, pieces, 5)
      assert(r.isDefined, s"final vocab must segment $w")
      r.get._3.map(_ -> f)
    }.groupBy(_._1).map { case (p, fs) => p -> fs.map(_._2).sum }
    assert(usage == pieces, s"$usage vs $pieces")
  }

  test("train: deterministic across runs") {
    val a = UnigramLm.train(docsDf, rounds = 2).orderBy("piece").collect().toSeq
    val b = UnigramLm.train(docsDf, rounds = 2).orderBy("piece").collect().toSeq
    assert(a == b)
  }

  test("topPieces: total order (cnt DESC, piece ASC) with rank") {
    val trained = UnigramLm.train(docsDf, rounds = 2)
    val top = UnigramLm.topPieces(trained, 3).collect()
    assert(top.map(_.getLong(0)).toSeq == (1L to top.length))
    val sorted = trained.orderBy(col("cnt").desc, col("piece").asc)
      .limit(3).select("piece").collect().map(_.getString(0)).toSeq
    assert(top.map(_.getString(1)).toSeq == sorted)
  }

  test("tokenCounts: trained counts + char fallback for over-length, 0 for empty docs") {
    val trained = UnigramLm.train(docsDf, rounds = 2, maxWordLen = 12)
    val pieces = trained.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = UnigramLm.tokenCounts(docsDf, trained)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def np(w: String) = UnigramLm.segment(w, pieces, 5).get._1.toLong
    assert(got(1L) == 2 * np("spark") + np("scan"))
    assert(got(2L) == np("spark") + 3 * np("scan"))
    assert(got(3L) == 0L, "empty doc still gets a 0 row")
    assert(got(4L) == "superlongword12345".length + np("spark"),
      "over-length word char-falls-back")
  }
}
