package graft.operators

import graft.stac.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The user-callable ANN operator surface (graft.operators.Ann) — the
  * engine the s03/s04/s08/s09/s10 gates value-check against DuckDB;
  * these specs pin the library-surface contracts the gates cannot see:
  * the adaptive dials, the salt-invariance proof, probe nesting, and
  * the guard messages. */
class AnnSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  /** Deterministic synthetic corpus: 64-dim embeddings with sign
    * structure driven by the id (NO RNG — reproducible membership). */
  private def corpus(n: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (sin(col("id") * (d + 1) + d * 0.7) + 0.01f).cast("float")).as("embedding"))

  private def collected(df: DataFrame): Seq[(Long, Int, Long, Double)] =
    df.select("query_id", "rank", "neighbor_id", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq.sorted

  test("adaptiveBits scales the bucket count with the corpus") {
    assert(Ann.adaptiveBits(0) == 4) // floor
    assert(Ann.adaptiveBits(1000, 1024) == 4)
    assert(Ann.adaptiveBits(1024 * 16, 1024) == 4)
    assert(Ann.adaptiveBits(1024 * 32, 1024) == 5)
    assert(Ann.adaptiveBits(1L << 40, 1024) == 30) // 2^30 buckets for 2^40 rows
    assert(Ann.adaptiveBits(Long.MaxValue) == 32)  // ceiling
    // monotone: more rows never means fewer buckets
    val bits = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L).map(Ann.adaptiveBits(_))
    assert(bits == bits.sorted)
  }

  test("adaptiveCells follows the ~sqrt(n) rule with clamps") {
    assert(Ann.adaptiveCells(0) == 16)
    assert(Ann.adaptiveCells(10000) == 100)
    assert(Ann.adaptiveCells(1000000) == 1000)
    assert(Ann.adaptiveCells(Long.MaxValue) == 65536)
  }

  test("annTopK finds bucket-mates and never the query itself") {
    val c = corpus(200)
    val got = Ann.annTopK(c, c, k = 3, bits = 4, probes = 1)
    val rows = collected(got)
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, _, n, _) => q != n })
    assert(rows.forall { case (_, r, _, _) => r >= 1 && r <= 3 })
    // per-query ranks are dense from 1 and cosines non-increasing
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Seq((_, _, _, a), (_, _, _, b)) => a >= b; case _ => true })
    }
  }

  test("salt > 1 returns IDENTICAL results to salt = 1 (hot-bucket split is lossless)") {
    val c = corpus(300)
    val base = collected(Ann.annTopK(c, c, k = 3, bits = 4, probes = 3, salt = 1))
    val split = collected(Ann.annTopK(c, c, k = 3, bits = 4, probes = 3, salt = 7))
    assert(base == split)
  }

  test("multiprobe candidates nest: more probes never lowers a query's best cosine") {
    val c = corpus(250)
    def best(df: DataFrame): Map[Long, Double] =
      collected(df).filter(_._2 == 1).map(t => t._1 -> t._4).toMap
    val p1 = best(Ann.annTopK(c, c, k = 1, bits = 5, probes = 1))
    val p4 = best(Ann.annTopK(c, c, k = 1, bits = 5, probes = 4))
    // probe sets nest (own bucket ⊂ own+flips), so every query seen at
    // p1 is seen at p4 with an equal-or-better top hit
    p1.foreach { case (q, cos1) => assert(p4(q) >= cos1 - 1e-12) }
    assert(p1.keySet.subsetOf(p4.keySet))
  }

  test("adaptive bits (bits=0) runs and respects the probe cap") {
    val c = corpus(120)
    val got = Ann.annTopK(c, c, k = 2, bits = 0, probes = 2)
    assert(collected(got).nonEmpty)
    val err = intercept[IllegalArgumentException](
      Ann.annTopK(c, c, k = 2, bits = 3, probes = 9))
    assert(err.getMessage.contains("probes"))
  }

  test("ivfTopK matches exactKnn when every cell is probed") {
    val c = corpus(80)
    val queries = c.filter(col("vec_id") % 20 === 0)
    // probing ALL cells makes IVF exhaustive — must equal brute force
    val ivf = collected(Ann.ivfTopK(c, queries, k = 3, cells = 4, nprobe = 4))
    val exact = graft.queries.Pipeline.exactKnn(c, queries, k = 3)
    val ex = collected(exact)
    assert(ivf == ex)
  }

  test("ivfPqTopK with all cells probed and a full shortlist equals pqTopK") {
    val c = corpus(80)
    val queries = c.filter(col("vec_id") % 20 === 0)
    // exhaustive dials: every cell probed, shortlist covers the corpus —
    // the IVF routing must then cost nothing and the exact re-rank must
    // agree with the un-routed PQ path (queries ⊂ corpus → same scale)
    def rows(df: DataFrame): Seq[(Long, Int, Long, Long)] =
      df.select("query_id", "rank", "neighbor_id", "dist2").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    val ivfpq = rows(Ann.ivfPqTopK(c, queries, k = 3,
      cells = 4, nprobe = 4, subspaces = 4, codes = 8, shortlist = 100))
    val quant = Ann.int8Quantize(c)
    val pq = rows(Ann.pqTopK(quant, quant.filter(col("vec_id") % 20 === 0),
      k = 3, subspaces = 4, codes = 8, shortlist = 100))
    assert(ivfpq == pq && ivfpq.nonEmpty)
  }

  test("pqTopK excludeSameId=false scores id-colliding vectors (unrelated id spaces)") {
    val c = corpus(40)
    val quant = Ann.int8Quantize(c)
    val q = quant.filter(col("vec_id") % 10 === 0)
    // with the exclusion off, a query that IS a corpus vector must rank
    // itself first at exact distance 0 — the behavior an external query
    // batch with its own id space relies on (ids colliding by accident)
    val withSelf = Ann.pqTopK(quant, q, k = 1, subspaces = 4, codes = 8,
        shortlist = 40, excludeSameId = false)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(withSelf.nonEmpty &&
      withSelf.forall { case (qid, nid, d2) => qid == nid && d2 == 0L })
    // default keeps the self-join convention
    val noSelf = Ann.pqTopK(quant, q, k = 1, subspaces = 4, codes = 8, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(noSelf.forall { case (qid, nid) => qid != nid })
  }

  test("bits beyond the embedding dimension fail fast; adaptive bits cap at it") {
    // 4-dim embeddings: explicit bits=8 would read dead sign positions
    val c = spark.range(40).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)),
        d => (sin(col("id") * (d + 1)) + 0.01f).cast("float")).as("embedding"))
    val err = intercept[IllegalArgumentException](
      Ann.annTopK(c, c, k = 2, bits = 8))
    assert(err.getMessage.contains("dim"))
    val errIdx = intercept[IllegalArgumentException](
      Ann.buildIndex(c, "/tmp/ann_dim_guard", bits = 8))
    assert(errIdx.getMessage.contains("dim"))
    // adaptive path caps at the dimension instead of erroring
    assert(Ann.annTopK(c, c, k = 2, bits = 0).count() > 0)
  }

  test("lloydRefineAssign: complete, deterministic, cells from the seed set") {
    val c = corpus(60)
    val a = Ann.lloydRefineAssign(c, cells = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 60)                       // every vector assigned once
    assert(a.values.toSet.subsetOf(Set(0L, 1L, 2L, 3L))) // cells = seed ids
    val again = Ann.lloydRefineAssign(c, cells = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == again)                         // exact-arithmetic determinism
  }

  test("ivfTopK guards a corpus-sized query set with routing advice") {
    val c = corpus(60)
    val err = intercept[IllegalArgumentException](
      AllPairsTopK.requireBroadcastable(c, "ivfTopK query set",
        "self-index corpus-sized query sets with annTopK", maxRows = 10L))
    assert(err.getMessage.contains("annTopK"))
  }

  test("int8Quantize: values in [-127,127], qsq/qnrm consistent, scale preserves argmax") {
    val c = corpus(50)
    val q = Ann.int8Quantize(c)
    val rows = q.select(col("vec_id"), col("qv"), col("qsq"), col("qnrm")).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val qv = r.getSeq[Long](1)
      assert(qv.forall(v => v >= -128 && v <= 128)) // ±1 from floor(+0.5) rounding
      assert(r.getLong(2) == qv.map(v => v * v).sum)
      assert(math.abs(r.getDouble(3) - math.sqrt(r.getLong(2).toDouble)) < 1e-9)
    }
    // the corpus max-|x| element maps to ±127 exactly
    val maxQ = rows.flatMap(_.getSeq[Long](1)).map(math.abs).max
    assert(maxQ == 127L)
  }

  test("pqEncode emits one code per subspace, codes within range") {
    val c = corpus(40)
    val quant = Ann.int8Quantize(c)
    val enc = Ann.pqEncode(quant, subspaces = 8, codes = 16)
    val rows = enc.select(col("vec_id"), col("pq_code")).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 8)
      assert(codes.forall(cd => cd >= 0 && cd < 16))
    }
    // a codebook vector encodes as itself in every subspace (distance 0)
    val self = rows.find(_.getLong(0) == 3L).get.getSeq[Int](1)
    assert(self == Seq.fill(8)(3))
  }

  test("pqTopK re-rank: full-shortlist PQ equals exact quantized search") {
    val c = corpus(60)
    val quant = Ann.int8Quantize(c)
    val queries = quant.filter(col("vec_id") % 15 === 0)
    // shortlist = whole corpus → the exact re-rank IS exact quantized-L2 top-k
    val pq = Ann.pqTopK(quant, queries, k = 3, subspaces = 8, codes = 16, shortlist = 59)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val exact = quant.as("a").join(quant.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .where(col("a.vec_id") % 15 === 0)
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        (col("a.qsq") - lit(2L) * graft.functions.VectorFunctions.longDot(col("a.qv"), col("b.qv"))
          + col("b.qsq")).as("d"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d").asc, col("neighbor_id").asc)))
      .filter(col("rank") <= 3)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(pq == exact)
  }

  test("indexed serving equals the inline path, with and without probe pushdown") {
    val c = corpus(200)
    val queries = c.filter(col("vec_id") % 40 === 0)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx").toString + "/idx"
    Ann.buildIndex(c, dir, bits = 5, files = 4)
    assert(Ann.indexBits(spark, dir) == 5) // footer round trip
    val inline = collected(Ann.annTopK(c, queries, k = 3, bits = 5, probes = 4))
    val served = collected(Ann.annTopKIndexed(spark, dir, queries, k = 3, probes = 4))
    assert(served == inline)
    // fallback (no In-filter) must serve the identical answer
    val noPush = collected(Ann.annTopKIndexed(spark, dir, queries, k = 3, probes = 4,
      maxPushdownProbes = 0))
    assert(noPush == inline)
    // salt composes with the index too
    val salted = collected(Ann.annTopKIndexed(spark, dir, queries, k = 3, probes = 4, salt = 3))
    assert(salted == inline)
  }

  test("annTopKIndexed rejects a non-index directory and over-probing") {
    val dir = java.nio.file.Files.createTempDirectory("not_idx").toString + "/t"
    corpus(10).write.parquet(dir) // plain parquet: no footer stamp
    val q = corpus(10)
    val e1 = intercept[IllegalArgumentException](
      Ann.annTopKIndexed(spark, dir, q, k = 1))
    assert(e1.getMessage.contains("buildIndex"))
    val idx = java.nio.file.Files.createTempDirectory("idx2").toString + "/idx"
    Ann.buildIndex(corpus(50), idx, bits = 3)
    val e2 = intercept[IllegalArgumentException](
      Ann.annTopKIndexed(spark, idx, q, k = 1, probes = 5))
    assert(e2.getMessage.contains("bits=3"))
  }

  test("pqTopK rejects a non-divisible subspace split and an undersized shortlist") {
    val c = corpus(30)
    val quant = Ann.int8Quantize(c)
    val q = quant.filter(col("vec_id") === 0)
    val e1 = intercept[IllegalArgumentException](Ann.pqTopK(quant, q, 3, subspaces = 7))
    assert(e1.getMessage.contains("divisible"))
    val e2 = intercept[IllegalArgumentException](Ann.pqTopK(quant, q, 5, shortlist = 3))
    assert(e2.getMessage.contains("shortlist"))
  }

  test("IVF-PQ indexed serving equals the from-scratch path, with and without pushdown") {
    val c = corpus(120)
    val queries = c.filter(col("vec_id") % 30 === 0)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString + "/idx"
    Ann.buildIvfPqIndex(c, dir, cells = 8, subspaces = 8, codes = 16, files = 2)
    def rows(df: DataFrame) = df.select("query_id", "rank", "neighbor_id", "dist2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    val scratch = rows(Ann.ivfPqTopK(c, queries, k = 3, cells = 8, nprobe = 2,
      subspaces = 8, codes = 16, shortlist = 16))
    val served = rows(Ann.ivfPqTopKIndexed(spark, dir, queries, k = 3, nprobe = 2,
      shortlist = 16))
    assert(served == scratch)
    // fallback (no In(cell) filter) must serve the identical answer
    val noPush = rows(Ann.ivfPqTopKIndexed(spark, dir, queries, k = 3, nprobe = 2,
      shortlist = 16, maxPushdownCells = 0))
    assert(noPush == scratch)
  }

  test("ivfPqTopKIndexed rejects a non-index directory and over-probing") {
    val dir = java.nio.file.Files.createTempDirectory("not_ivfpq").toString + "/t"
    corpus(10).write.parquet(dir + "/data")
    val q = corpus(10).filter(col("vec_id") === 0)
    val e1 = intercept[IllegalArgumentException](
      Ann.ivfPqTopKIndexed(spark, dir, q, k = 1))
    assert(e1.getMessage.contains("buildIvfPqIndex"))
    val good = java.nio.file.Files.createTempDirectory("ivfpq2").toString + "/idx"
    Ann.buildIvfPqIndex(corpus(20), good, cells = 4, subspaces = 8, codes = 8, files = 1)
    val e2 = intercept[IllegalArgumentException](
      Ann.ivfPqTopKIndexed(spark, good, q, k = 1, nprobe = 9))
    assert(e2.getMessage.contains("cells"))
  }
}
