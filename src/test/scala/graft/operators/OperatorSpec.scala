package graft.operators

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the custom join operators. */
class OperatorSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  test("AsofJoin: inclusive <=, per-key isolation, null when nothing precedes") {
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p0"), (2L, 10L, "p2"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 100L, "r-at-100"), (1L, 60L, "r-at-60"), (2L, 20L, "r-late"))
      .toDF("k", "rt", "payload")
    val out = AsofJoin(left, right, "k", "t", "rt", Seq("payload"))
      .select("name", "asof_payload").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("p1") == "r-at-100") // equal time matches (inclusive)
    assert(out("p0") == null)      // nothing at or before 50
    assert(out("p2") == null)      // right row at 20 is after left 10; no cross-key leak
  }

  test("AsofJoin: ties among right rows resolve to greatest payload") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L)).toDF("k", "rt", "v")
    val out = AsofJoin(left, right, "k", "t", "rt", Seq("v")).select("asof_v").head().getLong(0)
    assert(out == 9L)
  }

  test("AsofJoin: right rows attach wholesale — no cross-row stitching through nulls") {
    val left = Seq((1L, 3L)).toDF("k", "t")
    val right = Seq(
      (1L, 1L, Option(10L), Option.empty[Long]), // r1: a=10, b=null
      (1L, 2L, Option.empty[Long], Option(20L))  // r2: a=null, b=20 (latest)
    ).toDF("k", "rt", "a", "b")
    val row = AsofJoin(left, right, "k", "t", "rt", Seq("a", "b"))
      .select("asof_a", "asof_b").head()
    // the matched row is r2 as a whole: a must be null, not r1's 10
    assert(row.isNullAt(0) && row.getLong(1) == 20L)
  }

  test("AsofJoin: null-timed right rows never match") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, Option.empty[Long], "ghost")).toDF("k", "rt", "v")
    assert(AsofJoin(left, right, "k", "t", "rt", Seq("v")).select("asof_v").head().isNullAt(0))
  }

  test("ConnectedComponents: empty edge list yields empty labels, no NPE") {
    val edges = Seq((1L, 2L)).toDF("a", "b").filter(col("a") > 100)
    assert(ConnectedComponents.run(edges).count() == 0)
  }

  test("RangeJoin: boundary semantics — lo inclusive, hi exclusive, bucket-edge intervals") {
    val points = Seq((1L, 0L, "at-lo"), (1L, 9L, "inside"), (1L, 10L, "at-hi"),
      (1L, 20L, "beyond"), (2L, 5L, "other-key")).toDF("k", "t", "name")
    val intervals = Seq((1L, 0L, 10L, "iv")).toDF("k", "lo", "hi", "ivname")
    for (bucket <- Seq(1L, 3L, 10L, 100L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi", bucket)
        .select("name").as[String].collect().sorted.toSeq
      assert(got == Seq("at-lo", "inside"), s"bucketWidth=$bucket")
    }
  }

  test("SkewJoin: salted join is row-identical to the plain equi-join") {
    val large = (0L until 1000L).map(i => (i % 3, i)).toDF("k", "v") // 3 hot keys
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "never")).toDF("k", "name")
    val salted = SkewJoin.saltedEquiJoin(large, small, "k", salts = 8)
      .orderBy("k", "v").collect().toSeq
    val plain = large.join(small, "k")
      .orderBy("k", "v").collect().toSeq
    assert(salted == plain)
    assert(salted.length == 1000) // key 9 never matches
  }

  test("SkewJoin: duplicate hot-key rows keep full multiplicity (and still spread)") {
    // every row of the hot key is byte-identical — a whole-row-hash salt
    // would collapse them onto one reducer; result multiplicity must hold
    val large = Seq.fill(500)((1L, "same")).toDF("k", "payload")
    val small = Seq((1L, "dim")).toDF("k", "name")
    assert(SkewJoin.saltedEquiJoin(large, small, "k", salts = 8).count() == 500)
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(large.withColumn("__salt", lit(0)), small, "k")
    }
    assert(e.getMessage.contains("__salt"))
  }

  test("RangeJoin: an interval spanning many buckets still matches every point once") {
    val points = (0L until 50L).map(t => (1L, t, t)).toDF("k", "t", "id")
    val intervals = Seq((1L, 5L, 45L, "wide")).toDF("k", "lo", "hi", "nm")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi", 7L)
    assert(got.count() == 40)                      // t in [5, 45)
    assert(got.select("id").distinct().count() == 40) // no duplicate matches
  }

  test("AllPairsTopK: blocked plan equals broadcast plan (every pair scored once)") {
    // 40 points on a line, score = -|a-b| so closest pairs are adjacent ids
    val rng = new scala.util.Random(7)
    val pts = (0L until 40L).map(i => (i, rng.nextDouble() * 100)).toDF("id", "x")
    def score(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      -abs(a("x") - b("x"))
    val blocked = AllPairsTopK.closestPairsBlocked(pts, "id", score, k = 15, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // force the broadcast plan via a huge threshold
    val bcast = AllPairsTopK.closestPairs(pts, "id", score, k = 15, broadcastThreshold = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(blocked == bcast)
    assert(blocked.forall { case (a, b, _) => a < b })
    assert(blocked.map(p => (p._1, p._2)).distinct.size == 15) // no dup pairs
  }

  test("TopK aggregate: equals the window ranking and partially aggregates") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(11)
    val scored = (0 until 2000).map { i =>
      (i.toLong % 7, rng.nextInt(50).toDouble, i.toLong)
    }.toDF("g", "score", "id").repartition(8) // ties guaranteed (50 buckets)
    val viaAgg = scored.groupBy("g")
      .agg(TopK.topK(5)(col("score"), col("id")).as("nbrs"))
      .select(col("g"), posexplode(col("nbrs")).as(Seq("pos", "n")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("n.id").as("id"), col("n.score").as("score"))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("g", "rank", "id", "score")
    assert(viaAgg.collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3))).sorted.toSeq ==
      viaWindow.collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3))).sorted.toSeq)
    // the plan must aggregate (partial top-k buffers), not window-sort
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan:\n$plan")
  }

  test("TopK aggregate: NaN scores rank first under desc, like the window it replaces") {
    import org.apache.spark.sql.expressions.Window
    val scored = Seq((1L, 0.9, 10L), (1L, Double.NaN, 11L), (1L, 0.8, 12L), (1L, Double.NaN, 9L))
      .toDF("g", "score", "id").repartition(3)
    val viaAgg = scored.groupBy("g")
      .agg(TopK.topK(3)(col("score"), col("id")).as("nbrs"))
      .select(posexplode(col("nbrs")).as(Seq("pos", "n")))
      .select(col("n.id")).collect().map(_.getLong(0)).toSeq
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = scored.withColumn("r", row_number().over(w)).filter(col("r") <= 3)
      .orderBy("r").select("id").collect().map(_.getLong(0)).toSeq
    assert(viaAgg == viaWindow) // NaN pair (ids 9, 11) first, then 0.9
    assert(viaAgg == Seq(9L, 11L, 10L))
  }

  test("AllPairsTopK: adaptive probe routes big inputs to the blocked plan; guard trips") {
    val pts = (0L until 30L).map(i => (i, i.toDouble)).toDF("id", "x")
    def score(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      -abs(a("x") - b("x"))
    // threshold below input size → blocked path; result must still be exact:
    // 29 adjacent pairs at distance 1 fill the top-29
    val got = AllPairsTopK.closestPairs(pts, "id", score, k = 29, broadcastThreshold = 10L)
      .collect()
    assert(got.length == 29 && got.forall(_.getDouble(2) == -1.0))
    val e = intercept[IllegalArgumentException] {
      AllPairsTopK.requireBroadcastable(pts, "test side", "route elsewhere", maxRows = 10L)
    }
    assert(e.getMessage.contains("route elsewhere"))
  }

  test("MisraGries: every term over the n/(k+1) bound survives any partitioning") {
    val rnd = new scala.util.Random(42)
    // skewed stream: a few heavy terms buried in a long uniform tail
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++ Seq.fill(120)("gamma")
    val tail = Seq.tabulate(1200)(i => s"t${rnd.nextInt(600)}")
    val stream = rnd.shuffle(heavy ++ tail)
    val n = stream.length
    val k = 15
    val agg = new MisraGriesAggregator(k)
    // exercise reduce AND merge across several random partitionings
    for (parts <- Seq(1, 3, 8)) {
      val groups = stream.grouped(math.max(1, n / parts)).toSeq
      val summaries = groups.map(g => g.foldLeft(agg.zero)(agg.reduce))
      summaries.foreach(s => assert(s.size <= k))
      val merged = summaries.reduce(agg.merge)
      assert(merged.size <= k)
      val out = agg.finish(merged).toSet
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      exact.collect { case (t, c) if c > n / (k + 1) => t }
        .foreach(t => assert(out.contains(t), s"lost heavy term $t at parts=$parts"))
    }
  }

  test("NearDup.semanticVictims equals brute force over random vector families") {
    val rnd = new scala.util.Random(7)
    var totalVictims = 0
    for (_ <- 1 to 3) {
      val n = 30; val d = 8; val cells = 4; val tau = 0.5
      val vecs = (0L until n.toLong).map(i => i -> Array.fill(d)(rnd.nextFloat() * 2 - 1))
      // brute force with the operator's exact arithmetic: double-accumulated
      // float products left-to-right (FloatDot), cosine tie toward lower cell
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
      }
      def cos(a: Array[Float], b: Array[Float]): Double =
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      val cents = vecs.take(cells)
      val cell = vecs.map { case (id, v) =>
        id -> cents.map { case (cid, c) => (cos(v, c), cid) }
          .sortBy { case (s, cid) => (-s, cid) }.head._2
      }.toMap
      val byId = vecs.toMap
      val expected = vecs.flatMap { case (id, v) =>
        val nbrs = vecs.filter { case (o, _) => o < id && cell(o) == cell(id) }
          .map { case (o, ov) => (o, cos(v, ov)) }
          .filter(_._2 >= tau)
        if (nbrs.isEmpty) None
        else {
          val (keeper, c) = nbrs.minBy(_._1)
          Some((id, cell(id), keeper,
            BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }.sortBy(_._1)
      val df = vecs.map { case (id, a) => (id, a.toSeq) }.toDF("vec_id", "embedding")
      val got = NearDup.semanticVictims(df, tau = tau, cells = cells)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == expected)
      totalVictims += got.length
    }
    assert(totalVictims > 0) // the trials must actually exercise pruning
  }

  test("NearDup.contaminationFraction equals brute force over random corpora") {
    val rnd = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d", "e", "f")
    def doc(len: Int) = (0 until len).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val corpus = (10L until 40L).map(i => (i, doc(3 + rnd.nextInt(8))))
    val evalDocs = (0L until 3L).map(i => (i, doc(6)))
    def sh3(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val vocab = evalDocs.flatMap(d => sh3(d._2)).toSet
    val expected = corpus.flatMap { case (id, t) =>
      val g = sh3(t)
      if (g.isEmpty) None
      else Some((id, g.size.toLong, g.count(vocab).toLong))
    }.sortBy(_._1)
    val got = NearDup.contaminationFraction(
        corpus.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"), tau = 0.3)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == expected)
    got.foreach { r =>
      val (nSh, nHit) = (r.getLong(1), r.getLong(2))
      assert(r.getBoolean(r.fieldIndex("contaminated")) == (nHit.toDouble >= 0.3 * nSh))
    }
  }

  test("MisraGries: distributed candidates + exact re-count equal the full groupBy") {
    val terms = (Seq.fill(300)("hot") ++ Seq.fill(90)("warm") ++
      (0 until 800).map(i => s"cold${i % 400}")).map(Tuple1(_))
    val df = terms.toDF("term").repartition(7)
    val mg = HeavyHitters.mgCandidates(32)
    val cands = df.agg(mg(col("term")).as("ts"))
      .select(explode(col("ts")).as("term"))
    val exactOverCands = df.join(cands, "term")
      .groupBy("term").count()
      .filter(col("count") * 10 >= terms.size) // threshold 10% > 1/33 bound
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = df.groupBy("term").count()
      .filter(col("count") * 10 >= terms.size)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exactOverCands == full && full.keySet == Set("hot"))
  }

  // near-dup docs: clusters of near-identical texts so band buckets are hot
  private def saltDocs = (0L until 60L).map { i =>
    val base = s"w${i % 5} alpha beta gamma delta epsilon zeta eta theta"
    (i, if (i % 3 == 0) base else base + s" tail${i % 7}")
  }.toDF("doc_id", "text")

  test("NearDup.verifiedPairs: salt > 1 is pair-identical to salt = 1") {
    def pairs(salt: Int) =
      NearDup.verifiedPairs(saltDocs, salt = salt)
        .orderBy("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val base = pairs(1)
    assert(base.nonEmpty, "fixture must produce candidate pairs")
    assert(pairs(5) == base) // hot-bucket split is lossless: every pair meets exactly once
  }

  test("NearDup.simhashPairs: salt > 1 is pair-identical to salt = 1") {
    def pairs(salt: Int) = {
      val (p, release) = NearDup.simhashPairs(saltDocs, salt = salt)
      val got = p.orderBy("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      release()
      got
    }
    val base = pairs(1)
    assert(base.nonEmpty, "fixture must produce Hamming-close pairs")
    assert(pairs(5) == base)
  }

  test("substringDupStats: any-alignment detection; within-doc repeats are not dups") {
    val w = 16
    val passage = "the quick brown fox jumps over it" // 33 chars
    val docs = Seq(
      // the shared passage at DIFFERENT offsets (an aligned-segment pass
      // would miss this); distinct prefixes/suffixes
      (1L, s"AAAA $passage and more tail text here"),
      (2L, s"completely different opening words $passage ZZ"),
      // a doc that repeats ITS OWN phrase twice but shares nothing
      // cross-doc: within-doc repeats must not count
      (3L, "unique self copy unique self copy unique self copy padd"),
      // clean doc, no shared windows
      (4L, "nothing in common with anything else whatsoever at all!"),
      // too short for any window: must simply be absent (not a crash)
      (5L, "tiny")
    ).toDF("doc_id", "text")
    val sd = graft.operators.NearDup.substringDupWindows(docs, w = w)
    val rows = graft.operators.NearDup.substringStatsFrom(sd)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(!rows.contains(5L), "sub-window doc must be excluded")
    // the maximal shared substring is the passage PLUS its flanking
    // spaces (both docs surround it with ' '): 35 chars → 35 - 16 + 1 =
    // 20 dup windows in each doc
    assert(rows(1L)._2 == 20, s"doc 1 dup windows: ${rows(1L)}")
    assert(rows(2L)._2 == 20, s"doc 2 dup windows: ${rows(2L)}")
    assert(rows(3L)._2 == 0, s"within-doc repeats must not count: ${rows(3L)}")
    assert(rows(4L)._2 == 0)
    // totals: len - w + 1
    assert(rows(4L)._1 ==
      "nothing in common with anything else whatsoever at all!".length - w + 1)
    // the span merge must coalesce the 20 overlapping dup windows per doc
    // into ONE maximal span covering the shared passage + flanking spaces
    // (35 chars), at the right 1-based offsets in each doc
    val spans = graft.operators.NearDup.substringSpansFrom(sd, w)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(spans.map(_._1).toSeq == Seq(1L, 2L), s"span docs: ${spans.toSeq}")
    val d1 = spans.find(_._1 == 1L).get._2
    val d2 = spans.find(_._1 == 2L).get._2
    // doc 1: "AAAA " is 5 chars → shared " passage " region starts at 5
    assert(d1 == ((5L, 39L, 35L)), s"doc 1 span: $d1")
    // doc 2: "completely different opening words" is 34 chars → starts at 35
    assert(d2 == ((35L, 69L, 35L)), s"doc 2 span: $d2")
    sd.release()
  }

  test("RollingHashes equals the per-window Horner brute force") {
    val w = 8
    val texts = Seq("abcdefghijklmnop", "ω unicode façade test", "exact", "")
    val got = texts.toDF("t")
      .select(graft.functions.TextFunctions.rollingHashes(col("t"), w).as("hs"))
      .collect().map(_.getSeq[Long](0).toSeq)
    def brute(s: String): Seq[Long] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - w).map { i =>
        cps.slice(i, i + w).foldLeft(0L)((a, c) => (a * 257 + c) % 2147483647L)
      }
    }
    texts.zip(got).foreach { case (t, hs) =>
      assert(hs == brute(t), s"rolling hash drift for '$t'")
    }
  }
}
