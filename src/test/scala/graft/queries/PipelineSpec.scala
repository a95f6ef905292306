package graft.queries

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public pipeline facade — each function must behave exactly like
  * the gate query that verifies its implementation. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  test("tokens/shingles/scrub compose on a frame") {
    val df = Seq((1L, "contact bob@example.com about the spark cluster at 10.0.0.1"))
      .toDF("doc_id", "text")
    val row = df.select(
      size(Pipeline.tokens(col("text"))).as("n"),
      Pipeline.shingles(col("text"), 3).as("sh"),
      Pipeline.scrubPii(col("text")).as("clean")).head()
    assert(row.getAs[Int]("n") == 8)
    assert(row.getSeq[String](row.fieldIndex("sh")).nonEmpty)
    assert(row.getAs[String]("clean") ==
      "contact [EMAIL] about the [TERM] cluster at [IP]")
  }

  test("exactDedupKeepers keeps the smallest id per duplicate group") {
    val df = Seq((5L, "same"), (2L, "same"), (9L, "other")).toDF("id", "text")
    val keepers = Pipeline.exactDedupKeepers(df, col("text"), col("id"))
      .select("keeper_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keepers == Seq(2L, 9L))
  }

  test("jaccardSimilarityJoin finds the known near-dup pair") {
    val sg = Seq(
      (1L, Seq("a b c", "b c d", "c d e", "d e f")),
      (2L, Seq("a b c", "b c d", "c d e", "x y z")),
      (3L, Seq("p q r", "q r s", "r s t", "s t u"))).toDF("doc_id", "g")
    val (pairsDf, release) = Pipeline.jaccardSimilarityJoin(sg, tau = 0.5)
    val pairs = pairsDf
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    release()
    assert(pairs == Seq((1L, 2L))) // |∩|=3, |∪|=5 → 0.6 ≥ τ; doc 3 disjoint
  }

  test("dedupAgainstHistory flags only cross-corpus pairs; within-batch dups survive") {
    // new doc 3 near-dups history doc 2 → flagged; new docs 5 and 7 are
    // near-dups of EACH OTHER but of nothing in history → both kept
    // (within-batch dedup is nearDupDedup's job, deliberately not this op's)
    val history = Seq((2L, "a b c d e f")).toDF("doc_id", "text")
    val newDocs = Seq(
      (3L, "a b c d e x"),
      (5L, "p q r s t u"),
      (7L, "p q r s t v")).toDF("doc_id", "text")
    val (kept, flagged, release) = Pipeline.dedupAgainstHistory(history, newDocs, tau = 0.5)
    val f = flagged.collect()
    assert(f.length == 1 && f.head.getLong(0) == 3L && f.head.getLong(1) == 2L)
    assert(f.head.getDouble(f.head.fieldIndex("jaccard")) == 0.6) // |∩|=3,|∪|=5
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 7L))
    release()
  }

  test("round-5 operators tolerate empty inputs") {
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Pipeline.semanticDedupVictims(emptyVecs, tau = 0.9, cells = 4).count() == 0)
    assert(Pipeline.contaminationFraction(emptyDocs, emptyDocs, tau = 0.5).count() == 0)
    val (sc, r1) = Pipeline.bigramLmScore(emptyDocs)
    assert(sc.count() == 0); r1()
    val (fn, r2) = Pipeline.nearDupFunnel(emptyDocs, tau = 0.6)
    assert(fn.count() == 0); r2()
    val (kept, funnel, r3) = Pipeline.pretrainingPipeline(emptyDocs, emptyDocs)
    assert(kept.count() == 0 && funnel.count() == 0); r3()
  }

  test("pretrainingPipeline: each stage drops its doc, funnel counts the stages") {
    // 11 near-dups 10 (jaccard 0.6) → dropped at dedup; 12 shares an eval
    // shingle (frac 0.25) → dropped at decontamination; 16 is the least
    // fluent of the 5 survivors → dropped by the ntile(4) tail (13/14/15
    // share the common "c1 c2" bigram, 10 and 16 tie at 1.0 with 10
    // winning the doc_id tiebreak into bucket 3)
    val corpus = Seq(
      (10L, "d1 d2 d3 d4 d5 d6", "web"),
      (11L, "d1 d2 d3 d4 d5 x11", "web"),
      (12L, "w1 w2 w3 q1 q2 q3", "web"),
      (13L, "c1 c2 x13 c1 c2", "web"),
      (14L, "c1 c2 x14 c1 c2", "web"),
      (15L, "c1 c2 x15 c1 c2", "web"),
      (16L, "r1 r2 r3 r4", "web")).toDF("doc_id", "text", "source")
    val evalDocs = Seq((1L, "w1 w2 w3 w4 w5", "eval")).toDF("doc_id", "text", "source")
    val (kept, funnel, release) = Pipeline.pretrainingPipeline(corpus, evalDocs)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val f = funnel.collect().head
    release()
    assert(keptIds == Seq(10L, 13L, 14L, 15L))
    def g(c: String) = f.getLong(f.fieldIndex(c))
    assert(g("n_docs") == 7 && g("n_after_neardup") == 6 &&
      g("n_after_decontam") == 5 && g("n_after_lm") == 4 &&
      g("kept_id_sum") == 52L)
  }

  test("decontamination contracts emit one row per doc — short docs are clean, kept") {
    val corpus = Seq((10L, "a b c d e f"), (11L, "hi")).toDF("doc_id", "text")
    val evalDocs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    // graded form: the 2-word doc rides as (0, 0, 0.0, false) — an inner
    // join on the flags must not drop it (even at tau = 0)
    val cf = Pipeline.contaminationFraction(corpus, evalDocs, tau = 0.0)
      .orderBy("doc_id").collect()
    assert(cf.length == 2)
    val short = cf(1)
    assert(short.getLong(short.fieldIndex("n_shingles")) == 0L &&
      short.getDouble(short.fieldIndex("overlap_frac")) == 0.0 &&
      !short.getBoolean(short.fieldIndex("contaminated")))
    // boolean form: same one-row-per-doc contract
    val dc = Pipeline.decontaminate(corpus, evalDocs).orderBy("doc_id").collect()
    assert(dc.length == 2 && !dc(1).getBoolean(1))
  }

  test("contaminationFraction: exact counts, boundary-inclusive threshold") {
    // corpus doc 10 shares 2 of its 4 shingles with the eval doc → frac
    // exactly 0.5; tau = 0.5 must flag it (>= is inclusive). Doc 11 is
    // disjoint → 0 hits, not flagged.
    val corpus = Seq((10L, "a b c d e f"), (11L, "u v w x y z")).toDF("doc_id", "text")
    val evalDocs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val rows = Pipeline.contaminationFraction(corpus, evalDocs, tau = 0.5)
      .orderBy("doc_id").collect()
    def g(i: Int, c: String) = rows(i).getLong(rows(i).fieldIndex(c))
    assert(g(0, "n_shingles") == 4 && g(0, "n_hit") == 2)
    assert(rows(0).getDouble(rows(0).fieldIndex("overlap_frac")) == 0.5)
    assert(rows(0).getBoolean(rows(0).fieldIndex("contaminated")))
    assert(g(1, "n_shingles") == 4 && g(1, "n_hit") == 0)
    assert(!rows(1).getBoolean(rows(1).fieldIndex("contaminated")))
  }

  test("lmQualityFilter keeps the fluent buckets, drops tail and unscorable docs") {
    // avg_freq: d1 = 19/5 = 3.8, d2 = 12/4 = 3.0, d3 = 1.0, d4 = 1.0
    // (tie broken by doc_id), d5 has <2 words → unscorable → dropped
    val docs = Seq(
      (1L, "a b a b a b", "web"),
      (2L, "a b c a b", "web"),
      (3L, "x y z w v u", "web"),
      (4L, "q r", "web"),
      (5L, "solo", "web")).toDF("doc_id", "text", "source")
    val (kept, release) = Pipeline.lmQualityFilter(docs, buckets = 2, keepMax = 1)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    release()
    assert(ids == Seq(1L, 2L)) // ntile(2) head = the two most fluent
    val err = intercept[IllegalArgumentException](
      Pipeline.lmQualityFilter(docs, buckets = 2, keepMax = 3))
    assert(err.getMessage.contains("keepMax"))
  }

  test("nearDupFunnel: per-source stage counts and survivor checksum") {
    // docs 1,2 are near-dups (share 3 of 4 shingles → jaccard 0.6 ≥ τ);
    // doc 3 is disjoint; doc 4 is a different source, no duplicates
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "web"),
      (2L, "alpha beta gamma delta epsilon eta", "web"),
      (3L, "one two three four five six", "web"),
      (4L, "seven eight nine ten eleven twelve", "books")).toDF("doc_id", "text", "source")
    val (funnel, release) = Pipeline.nearDupFunnel(docs, tau = 0.5)
    val rows = funnel.orderBy("source").collect()
    release()
    val books = rows(0); val web = rows(1)
    def g(r: org.apache.spark.sql.Row, c: String) = r.getLong(r.fieldIndex(c))
    assert(g(books, "n_docs") == 1 && g(books, "n_in_pairs") == 0 &&
      g(books, "n_dropped") == 0 && g(books, "n_kept") == 1 && g(books, "keep_id_sum") == 4L)
    assert(g(web, "n_docs") == 3 && g(web, "n_in_pairs") == 2 &&
      g(web, "n_dropped") == 1 && g(web, "n_kept") == 2 && g(web, "keep_id_sum") == 1L + 3L)
  }

  test("semanticDedupVictims: within-cell pruning, min-id keeper, cross-cell pairs ignored") {
    // cells=2 → centroids are vec 0 ([1,0,0,0]) and vec 1 ([0,1,0,0]).
    // 10 and 12 land in cell 0 at cos≈0.995 to vec 0 (and cos 1.0 to each
    // other); 20 lands in cell 1 at cos 0.866 to vec 1 — below tau.
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (10L, Seq(1f, 0.1f, 0f, 0f)),
      (12L, Seq(1f, 0.1f, 0f, 0f)),
      (20L, Seq(0.5f, 0.866f, 0f, 0f))).toDF("vec_id", "embedding")
    val v = Pipeline.semanticDedupVictims(vecs, tau = 0.99, cells = 2)
      .orderBy("vec_id").collect()
    assert(v.map(_.getLong(0)).toSeq == Seq(10L, 12L))
    assert(v.forall(_.getLong(v.head.fieldIndex("cell")) == 0L))
    // keeper of 12 is the MIN same-cell neighbor (0), not its identical
    // twin (10) — and the reported cos is the cosine TO THE KEEPER
    assert(v.forall(_.getLong(v.head.fieldIndex("keeper_id")) == 0L))
    val cs = v.map(r => r.getDouble(r.fieldIndex("cos")))
    assert(cs.forall(c => c > 0.99 && c < 1.0) && cs.distinct.length == 1)
  }

  test("bigramLmScore: hand-computed LM stats; short docs drop; release hook") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b"×2, "b a"×1
      (2L, "a b c"),   // bigrams: "a b"×1, "b c"×1
      (3L, "x")        // <2 words → no bigrams → no output row
    ).toDF("doc_id", "text")
    val (scored, release) = Pipeline.bigramLmScore(docs)
    val rows = scored.orderBy("doc_id").collect()
    release()
    // global model: c("a b")=3, c("b a")=1, c("b c")=1
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getLong(r1.fieldIndex("n_bigrams")) == 3L)
    assert(r1.getLong(r1.fieldIndex("hit_sum")) == 2 * 3 + 1 * 1) // 7
    assert(r1.getLong(r1.fieldIndex("n_rare")) == 1L)             // "b a"
    assert(r1.getDouble(r1.fieldIndex("avg_freq")) == 7.0 / 3.0)
    val r2 = rows(1)
    assert(r2.getLong(r2.fieldIndex("n_bigrams")) == 2L)
    assert(r2.getLong(r2.fieldIndex("hit_sum")) == 1 * 3 + 1 * 1) // 4
    assert(r2.getLong(r2.fieldIndex("n_rare")) == 1L)             // "b c"
    assert(r2.getDouble(r2.fieldIndex("avg_freq")) == 2.0)
  }

  test("int8Quantize persists with a release hook; ANN facade delegations run") {
    val c = spark.range(60).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (sin(col("id") * (d + 1) + d * 0.7) + 0.01f).cast("float")).as("embedding"))
    val (quant, release) = Pipeline.int8Quantize(c)
    assert(quant.count() == 60)
    assert(quant.storageLevel.useMemory) // materialized once, served many times
    val pq = Pipeline.pqTopK(quant, quant.filter(col("vec_id") % 20 === 0), k = 2)
    assert(pq.count() > 0)
    release()
    assert(quant.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(Pipeline.annTopK(c, c, k = 2, bits = 4, probes = 2).count() > 0)
    assert(Pipeline.ivfTopK(c, c.filter(col("vec_id") < 3), k = 2, cells = 4).count() > 0)
    assert(Pipeline.pqEncode(Pipeline.int8Quantize(c) match {
      case (q, rel) => { val r = q; rel(); r } // encode plans fine post-release
    }).count() == 60)
  }

  test("empty inputs flow through without errors") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Pipeline.exactDedupKeepers(emptyDocs, col("text"), col("id")).count() == 0)
    val emptySets = Seq.empty[(Long, Seq[String])].toDF("doc_id", "g")
    val (pairs, release) = Pipeline.jaccardSimilarityJoin(emptySets, 0.5)
    assert(pairs.count() == 0)
    release()
    assert(Pipeline.jaccardSimilarityJoinCached(emptySets, 0.5).count() == 0)
    val emptyCounts = Seq.empty[(String, Long)].toDF("source", "n_docs")
    assert(Pipeline.temperatureAllocation(emptyCounts, 1000L).count() == 0)
  }

  test("cleanCorpusFunnel counts each stage and dedups scrubbed text") {
    // doc 1/2: quality English; doc 3: same text as 1 → dedup; doc 4: no stopwords → langid reject
    val good = ("the a " * 12).trim
    val docs = Seq(
      (1L, "s", good), (2L, "s", good + " extra"), (3L, "s", good),
      (4L, "s", "x y z w v u t q r p o n m l k j i h g f"))
      .toDF("doc_id", "source", "text")
    val (funnel, release) = Pipeline.cleanCorpusFunnel(docs)
    val r = funnel.head()
    release()
    assert(r.getAs[Long]("n_input") == 4 && r.getAs[Long]("n_lang") == 3 &&
      r.getAs[Long]("n_clean") == 3 && r.getAs[Long]("n_unique") == 2 &&
      r.getAs[Long]("kept_id_sum") == 3L) // keepers: doc 1 (beats 3) + doc 2
  }

  test("exactKnn ranks by cosine, excludes self, caps at k") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val got = Pipeline.exactKnn(corpus, queries, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    assert(got.toSeq == Seq((1, 2L), (2, 3L))) // closest first; self (id 1) excluded
    intercept[IllegalArgumentException](Pipeline.exactKnn(corpus, queries, 0))
    // unrelated id spaces: the id coincidence must NOT suppress corpus
    // vector 1 (the query's true nearest neighbor)
    val cross = Pipeline.exactKnn(corpus, queries, k = 1, excludeSameId = false)
      .head()
    assert(cross.getAs[Long]("neighbor_id") == 1L && cross.getAs[Double]("cos") == 1.0)
    // zero-norm vectors are excluded, not NULL-scored
    val withZero = corpus.union(Seq((9L, Array(0f, 0f))).toDF("vec_id", "embedding"))
    val ids = Pipeline.exactKnn(withZero, queries, k = 10)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9L) && ids.nonEmpty)
  }

  test("nearDupPairs/Clusters/Dedup: LSH candidates, exact verify, min-id keepers") {
    // docs 1/2/3 are a near-dup chain (each adjacent pair shares most
    // 3-gram shingles); doc 4 is disjoint
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base + " one"), (2L, base + " two"), (3L, base + " three"),
      (4L, "completely different words about some other topic entirely here"))
      .toDF("doc_id", "text")
    val pairs = Pipeline.nearDupPairs(docs)
    val got = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && !got.exists(p => p._1 == 4L || p._2 == 4L))
    val clusters = Pipeline.nearDupClusters(pairs, tau = 0.5)
    val kept = clusters.filter(col("is_kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L)) // min id of the 1-2-3 cluster; 4 not clustered
    val (keepers, release) = Pipeline.nearDupDedup(docs, tau = 0.5)
    val ids = keepers.select("doc_id").collect().map(_.getLong(0)).toSet
    release()
    assert(ids == Set(1L, 4L)) // cluster keeper + the unclustered doc
  }

  test("decontaminate flags every doc sharing an eval shingle, no misses") {
    val evalDocs = Seq((100L, "the quick brown fox jumps over dogs")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox runs far away now"), // shares "the quick brown"
      (2L, "nothing in common with that sentence at all"),
      (3L, "zz yy xx the quick brown fox")) // shares a shingle mid-doc
      .toDF("doc_id", "text")
    val flags = Pipeline.decontaminate(corpus, evalDocs)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("repetitionStats: exact char-weighted dup fractions, hand-checked") {
    val s = spark; import s.implicits._
    val docs = Seq(
      // "a b" appears twice (c=2, len 3 → dup 6); grams "b a" once (3),
      // "b c" once (3): tot2 = 2*3+3+3 = 12, dup2 = 6 → frac2 = 0.5
      (1L, "a b a b c"),
      (2L, "w x y z"),   // all bigrams unique → dup2 = 0
      (3L, "q"),         // too short: no grams at all
      (4L, "r r r r r")) // total repetition: frac2 = frac3 = 1.0
      .toDF("doc_id", "text")
    val got = Pipeline.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(6), r.getBoolean(7)))).toMap
    assert(got(1L) == ((12L, 6L, 0.5, 0.0, true)), s"doc 1: ${got(1L)}")
    assert(got(2L)._2 == 0L && !got(2L)._5)
    assert(got(3L) == ((0L, 0L, 0.0, 0.0, false)), "no grams → clean by definition")
    assert(got(4L)._3 == 1.0 && got(4L)._4 == 1.0 && got(4L)._5)
    // the dials move the flag, results stay exact
    val lax = Pipeline.repetitionStats(docs, rate2 = 0.9, rate3 = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(!lax(1L) && lax(4L))
  }

  test("stratifiedKeep is deterministic and respects rate 0/100") {
    val df = (0L until 200L).toDF("id")
    assert(df.filter(Pipeline.stratifiedKeep(col("id"), lit(0))).count() == 0)
    assert(df.filter(Pipeline.stratifiedKeep(col("id"), lit(100))).count() == 200)
    val a = df.filter(Pipeline.stratifiedKeep(col("id"), lit(50))).collect().map(_.getLong(0)).toSet
    val b = df.filter(Pipeline.stratifiedKeep(col("id"), lit(50))).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < 200)
  }
}
