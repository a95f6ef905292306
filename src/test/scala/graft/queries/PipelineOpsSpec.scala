package graft.queries

import graft.SparkEntry
import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Tests for the training-pipeline text ops the synthetic corpus cannot
  * exercise (it contains no PII), plus a property test that d09's prefix
  * filter is lossless — the exactness claim the gate relies on.
  */
class PipelineOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  /** Write a tiny documents.parquet so the REAL gate query runs over it. */
  private def miniCorpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-minicorpus").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---------- t10: PII scrub regexes on adversarial strings ----------

  test("t10 scrub: emails redact, counts pin, word boundaries hold") {
    val dir = miniCorpus(Seq(
      (1L, "contact bob.smith+spam@mail-host.example.org now"),
      (2L, "server at 10.0.255.3 and 192.168.1.1 replied"),
      (3L, "sparkle is not spark but spark is and vector too"),
      (4L, "a@b.co x 999.999.999.999 y 1.2.3.4.5"),
      (5L, "nothing to redact here")))
    val out = SparkEntry.queries("t10_pii_scrub")(spark, dir)
      .select("doc_id", "n_email", "n_ipv4", "n_blocked")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == ((1, 0, 0))) // full address incl. +tag and hyphenated host
    assert(out(2L) == ((0, 2, 0)))
    // \b keeps "sparkle" intact; the two bare "spark" + one "vector" redact
    assert(out(3L) == ((0, 0, 3)))
    // minimal email; 999.* is lexically an IPv4 literal (scrubber, not
    // validator); 1.2.3.4.5 still contains a 4-octet match
    assert(out(4L)._1 == 1 && out(4L)._2 >= 2)
    assert(out(5L) == ((0, 0, 0)))
  }

  test("t10 scrub: replacement text is the typed placeholder") {
    val cleaned = Seq((1L, "mail me@example.com at 1.2.3.4 about spark"))
      .toDF("doc_id", "text")
      .select(TextOps.scrub(col("text"))).head().getString(0)
    assert(cleaned == "mail [EMAIL] at [IP] about [TERM]")
  }

  // ---------- t11: segment dedup on a crafted corpus ----------

  test("t11 segment dedup: first occurrence kept, later repeats flagged") {
    val seg = (1 to 16).map(i => s"w$i").mkString(" ") // one exact 16-word segment
    val other = (1 to 16).map(i => s"x$i").mkString(" ")
    val dir = miniCorpus(Seq(
      (1L, s"$seg $other"),   // segs 0,1 — both first occurrences
      (2L, s"$other $seg"),   // both segments already seen in doc 1
      (3L, s"$seg tail words")))  // seg 0 repeated + a unique short tail
    val out = SparkEntry.queries("t11_segment_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 0L)))
    assert(out(2L) == ((2L, 2L)))
    assert(out(3L) == ((2L, 1L))) // the 2-word tail is its own (unique) segment
  }

  // ---------- d09: prefix filtering is lossless (property) ----------

  test("d09 prefix filter: equals brute force over random set families") {
    val rnd = new Random(7)
    for (trial <- 0 until 5; tau <- Seq(0.5, 0.75)) {
      // small universe forces heavy overlap — the adversarial case for a
      // candidate filter (many shared elements, many near-threshold pairs)
      val universe = (0 until 12).map(i => s"e$i")
      val docs = (0L until 40L).map { id =>
        id -> rnd.shuffle(universe).take(1 + rnd.nextInt(universe.size)).toSet
      }
      val expected = (for {
        (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= tau
      } yield (ia, ib, j)).toSet
      val sg = docs.map { case (id, s) => (id, s.toSeq) }.toDF("doc_id", "g")
      val got = DedupOps.jaccardSimilarityJoin(sg, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"trial=$trial tau=$tau")
    }
  }

  // ---------- q21/q22 shapes that the gate data can't stress ----------

  test("session caches: hit returns the same frame, release retires it") {
    val dir = java.nio.file.Files.createTempDirectory("cache_release").toString
    Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val first = DedupOps.jaccardPairs(spark, dir)
    assert(DedupOps.jaccardPairs(spark, dir) eq first) // cached identity
    DedupOps.releasePairs(spark, dir)
    assert(!(DedupOps.jaccardPairs(spark, dir) eq first)) // retired, rebuilt
    DedupOps.releasePairs(spark, dir)
    // unknown keys are safe no-ops
    DedupOps.releasePairs(spark, "/nonexistent")
    SimilarityOps.releaseQuantized(spark, "/nonexistent")
  }

  test("q21 json extract: malformed and missing keys become null, not errors") {
    val df = Seq("""{"k": 5}""", """{"other": 1}""", "not json", null)
      .toDF("props")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq ==
      Seq(Some(5L), None, None, None))
  }
}
