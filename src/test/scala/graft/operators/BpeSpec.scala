package graft.operators

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Bpe]] semantics pinned on hand-computed cases: pair counting with
  * overlapping occurrences, greedy-leftmost run merges, deterministic
  * tiebreaks, and the trained-vocab token counts the t09 packing hook
  * consumes. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def docs(texts: String*) = {
    val s = spark; import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("hand-computed merge sequence: overlapping pairs count, runs merge greedily") {
    // vocab: aaaa (freq 1), aa (freq 1)
    // seqs:  a a a a </w>  |  a a </w>
    // round 1 pairs: (a,a) = 3 + 1 = 4 (overlaps count); (a,</w>) = 2
    //   → merge 1 = (a, a, 4); greedy runs: aaaa → [aa, aa, </w>], aa → [aa, </w>]
    // round 2 pairs: (aa,aa) = 1; (aa,</w>) = 2 → merge 2 = (aa, </w>, 2)
    // round 3 pairs: (aa, aa</w>) = 1 → merge 3 = (aa, aa</w>, 1)
    val m = Bpe.train(docs("aaaa aa"), merges = 3).orderBy("step").collect()
    assert(m.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq((1, "a", "a", 4L), (2, "aa", "</w>", 2L), (3, "aa", "aa</w>", 1L)))
  }

  test("vocabulary exhaustion stops early with fewer rows than asked") {
    // single word "ab": merges (a,b) then (ab,</w>) then nothing left
    val m = Bpe.train(docs("ab"), merges = 10).collect()
    assert(m.length == 2)
  }

  test("argmax tiebreak is (count DESC, sym_a, sym_b) — total order") {
    // "cb" and "ba": pairs (c,b)=1, (b,a)=1, (b,</w>)=1, (a,</w>)=1 —
    // all tied at 1; (a,</w>) wins on sym_a then sym_b
    val m = Bpe.train(docs("cb ba"), merges = 1).collect()
    assert((m(0).getString(1), m(0).getString(2)) == (("a", "</w>")))
  }

  test("tokenCounts applies the trained merges; empty docs count zero") {
    val d = docs("aaaa aa", "aa", "")
    val merges = Bpe.train(d, merges = 3)
    val (counts, release) = Bpe.tokenCounts(d, merges)
    val got = counts.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // after (a,a), (aa,</w>), (aa,aa</w>): aaaa → [aa, aa</w>] → wait:
    // merge 3 joins (aa, aa</w>) → aaaa = ONE token; aa = [aa</w>] = one
    assert(got == Seq((0L, 2L), (1L, 1L), (2L, 0L)), got.toString)
    release()
  }
}
