package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (Array[Float], 64-dim).
  *
  * s01 is the brute-force baseline (cross join — quadratic, correct,
  * fine for a re-rank stage or small query sets). s02 is the scale path:
  * sign-bit LSH bucketing turns the O(n²) cross join into a per-bucket
  * join, the same shape an IVF index gives — at 100 TB the bucket id is
  * the shuffle key and each bucket fits an executor.
  *
  * Dot products fold sequentially in double precision — bit-identical to
  * DuckDB's list_sum over the same float32 inputs (verified empirically).
  */
object SimilarityOps {

  /** Codegen'd native dot product (graft.functions.FloatDot): left-to-right
    * double fold, bit-equal to DuckDB's list_sum, no per-element boxing and
    * no codegen barrier on the pair-join hot path. */
  def dotd(a: Column, b: Column): Column = graft.functions.VectorFunctions.floatDot(a, b)

  def norm(a: Column): Column = sqrt(dotd(a, a))

  /** DuckDB mirror of dotd/norm (identical fold order). */
  private[queries] def dotSql(a: String, b: String) =
    s"list_sum([CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) for i in generate_series(1, len($a))])"
  private[queries] def normSql(a: String) =
    s"sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in $a]))"

  /** Sign-bit LSH bucket from the first `bits` dimensions (axis-aligned
    * hyperplanes — deterministic, no stored model). */
  def signBucket(e: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(e, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def signBucketSql(e: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(CASE WHEN $e[${i + 1}] > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  val specs: Seq[QuerySpec] = Seq(

    // ----- brute-force cosine top-5 for a query set -----
    QuerySpec(
      "s01_knn_bruteforce",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
                   FROM embeddings),
             sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                           ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
                    FROM n q JOIN n c ON q.vec_id < 50 AND c.vec_id != q.vec_id),
             rk AS (SELECT query_id, neighbor_id, cos,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos DESC, neighbor_id ASC) AS rank
                    FROM sc)
        SELECT query_id, rank, neighbor_id, round(cos, 9) AS cos
        FROM rk WHERE rank <= 5
        ORDER BY query_id, rank"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        val q = e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
        val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("nrm").as("cn"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)
        q.join(broadcast(c), col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            (dotd(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 9).as("cos"))
          .orderBy(col("query_id"), col("rank"))
      }),

    // ----- global top-20 closest pairs (embedding near-dup detection) -----
    QuerySpec(
      "s02_neardup_pairs",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
                   FROM embeddings),
             sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                           ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
                    FROM n a JOIN n b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, round(sc.cos, 9) AS cos
        FROM sc
        -- qualified sc.cos: a bare cos binds to the rounded SELECT alias in
        -- DuckDB, which on near-ties could pick a different LIMIT-20
        -- membership than the Spark side (full-precision ordering)
        ORDER BY sc.cos DESC, id_a ASC, id_b ASC
        LIMIT 20"""),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("nrm").as("nb"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            (dotd(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
          .orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
          .limit(20)
          .select(col("id_a"), col("id_b"), round(col("cos"), 9).as("cos"))
      }),

    // ----- LSH-bucketed ANN: top-3 neighbors within each sign bucket -----
    QuerySpec(
      "s03_ann_lsh_bucketed",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
                          ${signBucketSql("embedding", 4)} AS bucket
                   FROM embeddings),
             sc AS (SELECT a.bucket, a.vec_id AS query_id, b.vec_id AS neighbor_id,
                           ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
                    FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
             rk AS (SELECT query_id, neighbor_id, cos,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos DESC, neighbor_id ASC) AS rank
                    FROM sc)
        SELECT query_id, rank, neighbor_id, round(cos, 9) AS cos
        FROM rk WHERE rank <= 3
        ORDER BY query_id, rank"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"),
            signBucket(col("embedding"), 4).as("bucket"))
        val a = e.select(col("bucket"), col("vec_id").as("query_id"),
          col("embedding").as("ea"), col("nrm").as("na"))
        val b = e.select(col("bucket").as("bucket_b"), col("vec_id").as("neighbor_id"),
          col("embedding").as("eb"), col("nrm").as("nb"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)
        a.join(b, col("bucket") === col("bucket_b") && col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            (dotd(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 9).as("cos"))
          .orderBy(col("query_id"), col("rank"))
      }),

    // ----- IVF ANN: coarse-quantize to centroid cells, probe top-2 cells -----
    // The scale path for billion-vector search: the 16 centroids broadcast
    // to every executor (the "trained codebook"), cell assignment is a
    // narrow map over the corpus, and the candidate search is an equi-join
    // on cell id — the only shuffle is corpus-sized, never pairs-sized.
    QuerySpec(
      "s04_ann_ivf",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
                   FROM embeddings),
             cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                      FROM n WHERE vec_id < 16),
             scored AS (SELECT v.vec_id, c.cent_id,
                               ${dotSql("v.embedding", "c.ce")} / (v.nrm * c.cn) AS ccos,
                               row_number() OVER (PARTITION BY v.vec_id
                                                  ORDER BY ${dotSql("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC,
                                                           c.cent_id ASC) AS crank
                        FROM n v JOIN cent c ON true),
             assign AS (SELECT vec_id, cent_id AS cell FROM scored WHERE crank = 1),
             probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM scored
                        WHERE crank <= 2 AND vec_id % 100 = 0),
             cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
                      FROM probes p JOIN assign a ON a.cell = p.cell
                      WHERE a.vec_id != p.query_id),
             sc AS (SELECT c.query_id, c.neighbor_id,
                           ${dotSql("q.embedding", "v.embedding")} / (q.nrm * v.nrm) AS cos
                    FROM cand c
                    JOIN n q ON q.vec_id = c.query_id
                    JOIN n v ON v.vec_id = c.neighbor_id),
             rk AS (SELECT query_id, neighbor_id, cos,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos DESC, neighbor_id ASC) AS rank
                    FROM sc)
        SELECT query_id, rank, neighbor_id, round(cos, 9) AS cos
        FROM rk WHERE rank <= 3
        ORDER BY query_id, rank"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        val cent = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("nrm").as("cn"))
        val ccos = (dotd(col("embedding"), col("ce")) / (col("nrm") * col("cn"))).as("ccos")
        // Cell assignment as a max_by hash-aggregate, not a window: partial
        // aggregation collapses the 16 centroid scores per vector map-side,
        // so the one corpus-wide shuffle carries one row per vector.
        // Tie-break (-cent_id) matches the oracle's `crank = 1` ordering.
        val assign = e.join(broadcast(cent))
          .select(col("vec_id"), col("cent_id"), col("embedding"), col("nrm"), ccos)
          .groupBy(col("vec_id"))
          .agg(max_by(col("cent_id"), struct(col("ccos"), -col("cent_id"))).as("cell"),
            first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
        // Probes restrict to the query set BEFORE scoring (row_number is
        // per-vec_id, so dropping other vectors cannot change the ranks),
        // then broadcast: the query set is tiny by construction.
        val cw = Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc, col("cent_id").asc)
        val probes = e.filter(col("vec_id") % 100 === 0)
          .join(broadcast(cent))
          .select(col("vec_id").as("query_id"), col("cent_id"),
            col("embedding").as("qe"), col("nrm").as("qn"), ccos)
          .withColumn("crank", row_number().over(cw))
          .filter(col("crank") <= 2)
          .select(col("query_id"), col("cent_id").as("cell"), col("qe"), col("qn"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)
        broadcast(probes).join(assign, "cell")
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            (dotd(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 9).as("cos"))
          .orderBy(col("query_id"), col("rank"))
      }),

    // ----- cross-modal validation: text near-dup pairs scored by embedding
    // cosine (documents.doc_id ≡ embeddings.vec_id in the corpus) — the
    // realistic dedup-pipeline check that a textual candidate pair is also
    // semantically close. Reuses the MinHash+Jaccard pair derivation and a
    // broadcast-able embeddings lookup. -----
    QuerySpec(
      "s05_text_embedding_crosscheck",
      Some(s"""
        WITH ${graft.queries.DedupOps.pairsCte},
             n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings)
        SELECT jp.doc_a, jp.doc_b,
               round(jp.jaccard, 9) AS jaccard,
               round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 9) AS cos
        FROM jp
        JOIN n a ON a.vec_id = jp.doc_a
        JOIN n b ON b.vec_id = jp.doc_b
        ORDER BY doc_a, doc_b"""),
      (s, dir) => {
        val pairs = graft.queries.DedupOps.jaccardPairs(s, dir)
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        val a = e.select(col("vec_id").as("doc_a"), col("embedding").as("ea"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("doc_b"), col("embedding").as("eb"), col("nrm").as("nb"))
        pairs.join(broadcast(a), "doc_a").join(broadcast(b), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            round(col("jaccard"), 9).as("jaccard"),
            round(dotd(col("ea"), col("eb")) / (col("na") * col("nb")), 9).as("cos"))
          .orderBy(col("doc_a"), col("doc_b"))
      })
  )
}
