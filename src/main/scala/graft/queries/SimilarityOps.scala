package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (Array[Float], 64-dim).
  *
  * Memory-safety at scale (nothing here broadcasts a corpus):
  *   - s01 (exact k-NN) broadcasts only the QUERY set — guarded by
  *     [[graft.operators.AllPairsTopK.requireBroadcastable]] — and streams
  *     the corpus past it: linear in corpus size, O(queries) memory. Large
  *     query sets route to s03/s04 (the guard's error message says so).
  *   - s02 (exact global closest pairs) uses block-pair partitioning
  *     ([[graft.operators.AllPairsTopK]]): per-executor memory O(n/blocks),
  *     no broadcast; compute stays the inherent O(n²) of an exact answer.
  *   - s03/s04 are the sub-quadratic approximate paths (LSH buckets / IVF
  *     cells as the only shuffle keys).
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

  /** The int8-quantized corpus (vec_id, qv: array<bigint>, qnrm), memoized
    * and persisted per (session, dataset) — materializing the quantized
    * table once IS the point of quantization (production stores it and
    * serves every search from it); without the cache s08's probe, corpus
    * side, and query side would each replay the global max-|x| aggregate
    * and the per-row quantization. Same contract as the d03 pair cache. */
  private val quantCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def quantizedEmbeddings(s: SparkSession, dir: String): DataFrame =
    graft.CachedMemo.get(quantCache, (s, dir))(identity)(
      // the quantization itself is the facade operator (graft.operators
      // .Ann.int8Quantize — one global-scale broadcast, exact integer
      // values + cached self-dots); only the persist is gate-level policy
      graft.operators.Ann.int8Quantize(
          Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** s12's one-time materialized LSH index layout per (session, dataset)
    * — the production shape: the O(n) bucket-clustered build runs once
    * (untimed prepare, like the bucketed tables and the ndjson corpus),
    * every query batch after it serves from the layout. */
  private val annIndexDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[queries] def annIndex(s: SparkSession, dir: String): String =
    annIndexDirs.getOrElseUpdate((s, dir), {
      val path = java.nio.file.Files.createTempDirectory("ann_index").toString + "/idx"
      graft.operators.Ann.buildIndex(
        Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        path, bits = 4, files = 8)
      path
    })

  /** s14's one-time materialized IVF-PQ layout per (session, dataset) —
    * same build-once discipline as [[annIndex]], with s13's dials so the
    * served answer is comparable row-for-row to the from-scratch path. */
  private val ivfPqIndexDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[queries] def ivfPqIndex(s: SparkSession, dir: String): String =
    ivfPqIndexDirs.getOrElseUpdate((s, dir), {
      val path = java.nio.file.Files.createTempDirectory("ivfpq_index").toString + "/idx"
      graft.operators.Ann.buildIvfPqIndex(
        Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        path, cells = 16, subspaces = 8, codes = 16, files = 4)
      path
    })

  /** Unpersist + drop the (session, dir) quantized-corpus cache entry —
    * the release hook mirroring `jaccardSimilarityJoinReleasable`: the
    * run-once gate never needs it, but a long-lived session re-pointing
    * at new datasets must release retired entries. */
  def releaseQuantized(s: SparkSession, dir: String): Unit =
    quantCache.remove((s, dir)).foreach { df => df.unpersist(); () }

  private[queries] val materializeQuantized: Option[(SparkSession, String) => Unit] =
    Some((s, dir) => { quantizedEmbeddings(s, dir).count(); () })

  /** Sign-bit LSH bucket — delegates to the facade operator
    * ([[graft.operators.Ann.signBucket]]), kept here for source and SQL
    * compatibility with earlier rounds. */
  def signBucket(e: Column, bits: Int): Column =
    graft.operators.Ann.signBucket(e, bits)

  private[queries] def signBucketSql(e: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(CASE WHEN $e[${i + 1}] > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Exact k-NN: guarded broadcast of the (small) query set, corpus
    * streamed past it, and per-query top-k via the bounded-buffer
    * aggregate (graft.operators.TopK) — the shuffle carries k-element
    * buffers per query per map task, never the n·q scored rows a window
    * would move. Output: (query_id, rank, neighbor_id, cos·1e-9-rounded). */
  /** @param excludeSameId drop candidate pairs whose ids match — the
    *   self-join convention (s01: corpus and queries are the same table);
    *   pass false when the two frames have unrelated id spaces, where an
    *   id coincidence must NOT suppress a true neighbor */
  private[queries] def exactKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                                excludeSameId: Boolean = true): DataFrame = {
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val c0 = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("nrm").as("cn"))
    // the broadcast nested-loop streams the corpus, so its partition count
    // IS the scoring parallelism: spread an under-partitioned input (the
    // toy single-row-group case — all n·q dot products would land in one
    // task); at 100 TB the file count provides this and no shuffle is paid
    val width = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val c = if (c0.rdd.getNumPartitions * 2 >= width) c0
            else c0.repartition(col("neighbor_id"))
    val topk = graft.operators.TopK.topK(k)
    val cond = if (excludeSameId) col("neighbor_id") =!= col("query_id") else lit(true)
    c.join(broadcast(q), cond)
      .select(col("query_id"), col("neighbor_id"),
        (dotd(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
      .groupBy(col("query_id"))
      .agg(topk(col("cos"), col("neighbor_id")).as("nbrs"))
      .select(col("query_id"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nbr.id").as("neighbor_id"), round(col("nbr.score"), 9).as("cos"))
  }

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
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        // broadcast the QUERY side only (small by construction, and guarded
        // so a fat query set fails with routing advice instead of an
        // executor OOM); the corpus streams past it — linear at any scale
        val q = graft.operators.AllPairsTopK.requireBroadcastable(
          e.filter(col("vec_id") < 50),
          what = "s01 exact k-NN query set",
          route = "use s03_ann_lsh_bucketed or s04_ann_ivf for corpus-sized query sets")
        exactKnn(q, e, k = 5).orderBy(col("query_id"), col("rank"))
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
        // exact answer with NO broadcast: block-pair partitioning keeps
        // per-executor memory at O(corpus/blocks) while every unordered
        // pair is scored exactly once (see AllPairsTopK scaladoc)
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        graft.operators.AllPairsTopK.closestPairs(
            e, idCol = "vec_id",
            score = (a, b) => dotd(a("embedding"), b("embedding")) / (a("nrm") * b("nrm")),
            k = 20)
          .select(col("id_a"), col("id_b"), round(col("score"), 9).as("cos"))
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
        // the facade operator, pinned to the oracle's dials (bits=4,
        // single probe, self-index); at production scale bits=0 derives
        // the bucket count from the corpus size instead
        val e = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        graft.operators.Ann.annTopK(e, e, k = 3, bits = 4, probes = 1)
          .orderBy(col("query_id"), col("rank"))
      }),

    // ----- multiprobe LSH: widen candidates WITHOUT more tables -----
    // s03's recall/cost dial turned the standard way (Lv et al., VLDB
    // '07): each QUERY probes its own sign bucket plus every Hamming-1
    // neighbor bucket (5 probes at 4 bits) — the corpus side is
    // untouched (one bucket per vector, same single table as s03; only
    // the query side fans out ×5), so candidate volume grows linearly
    // in probes while recall approaches multi-table LSH. Probe values
    // are distinct and a vector lives in ONE bucket, so no (query,
    // neighbor) pair can duplicate — no distinct needed. Oracle replays
    // probe generation, scoring, and ranking; results are value-checked
    // row-for-row like s03 (whose candidates these strictly contain).
    QuerySpec(
      "s10_multiprobe_lsh",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
                          ${signBucketSql("embedding", 4)} AS bucket
                   FROM embeddings),
             p AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn,
                          unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                                  xor(bucket, 4), xor(bucket, 8)]) AS probe
                   FROM n),
             sc AS (SELECT p.query_id, b.vec_id AS neighbor_id,
                           ${dotSql("p.qe", "b.embedding")} / (p.qn * b.nrm) AS cos
                    FROM p JOIN n b ON b.bucket = p.probe AND b.vec_id != p.query_id),
             rk AS (SELECT query_id, neighbor_id, cos,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos DESC, neighbor_id ASC) AS rank
                    FROM sc)
        SELECT query_id, rank, neighbor_id, round(cos, 9) AS cos
        FROM rk WHERE rank <= 3
        ORDER BY query_id, rank"""),
      (s, dir) => {
        // probes=5 = own bucket + the full Hamming-1 ring at bits=4 —
        // the facade's multiprobe dial at the oracle's pinned settings
        val e = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        graft.operators.Ann.annTopK(e, e, k = 3, bits = 4, probes = 5)
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
        // the facade operator at the oracle's pinned dials (16 static
        // cells, 2 probes); cells=0 derives ~√n cells at production scale
        val e = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        graft.operators.Ann.ivfTopK(e, e.filter(col("vec_id") % 100 === 0),
            k = 3, cells = 16, nprobe = 2)
          .orderBy(col("query_id"), col("rank"))
      }),

    // ----- FILTERED vector search: predicate + ANN in one pass -----
    // The production retrieval shape (tenant / shard / freshness
    // filters over one shared index): the IVF index is built on the
    // FULL corpus — centroids and cell assignment identical to s04's —
    // and the metadata predicate prunes candidates BEFORE any dot
    // product, so the filter costs nothing at scoring time and the
    // same index serves every filter. Here the predicate admits one
    // vec_id in three; the oracle recomputes the identical derivation
    // (same codebook, same probes, filtered candidates), so a filter
    // applied at the wrong stage — before assignment (different
    // centroids) or after top-k (missing neighbors) — fails the hash.
    QuerySpec(
      "s15_ann_filtered",
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
                      WHERE a.vec_id != p.query_id AND a.vec_id % 3 = 0),
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
        val e = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        graft.operators.Ann.ivfTopK(e, e.filter(col("vec_id") % 100 === 0),
            k = 3, cells = 16, nprobe = 2,
            candidateFilter = col("vec_id") % 3 === 0)
          .orderBy(col("query_id"), col("rank"))
      }),

    // ----- ANN quality gate: recall@3 of the approximate paths (s03 LSH
    // buckets, s04 IVF 2-probe) against exact brute-force ground truth for
    // the same query set. The recall NUMBERS are value-checked (both
    // engines recompute the full derivation); the *_ok booleans are
    // pinned `true` in the oracle, so recall dropping below the floor
    // FAILS the hash check — a regression tripwire for the bucketing
    // logic. Floors are calibrated to the synthetic corpus: uniform random
    // embeddings have no cluster structure, which bounds achievable recall
    // for any sub-linear index (LSH 4-bit ≈ 0.13, IVF 2/16-probe ≈ 0.33
    // at sf0.01); on real embedding distributions the same operators do
    // far better, but the tripwire (recall collapsing to ~0 on a bucketing
    // bug) is scale-independent. -----
    QuerySpec(
      "s06_ann_recall",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
                          ${signBucketSql("embedding", 4)} AS bucket
                   FROM embeddings),
             q AS (SELECT * FROM n WHERE vec_id % 100 = 0),
             ex AS (SELECT query_id, neighbor_id FROM (
                      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                             row_number() OVER (PARTITION BY q.vec_id
                               ORDER BY ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC,
                                        c.vec_id ASC) AS rank
                      FROM q JOIN n c ON c.vec_id != q.vec_id)
                    WHERE rank <= 3),
             lsh AS (SELECT query_id, neighbor_id FROM (
                       SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                              row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) DESC,
                                         b.vec_id ASC) AS rank
                       FROM q a JOIN n b ON a.bucket = b.bucket AND a.vec_id != b.vec_id)
                     WHERE rank <= 3),
             cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                      FROM n WHERE vec_id < 16),
             scored AS (SELECT v.vec_id, c.cent_id,
                               row_number() OVER (PARTITION BY v.vec_id
                                 ORDER BY ${dotSql("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC,
                                          c.cent_id ASC) AS crank
                        FROM n v JOIN cent c ON true),
             assign AS (SELECT vec_id, cent_id AS cell FROM scored WHERE crank = 1),
             probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM scored
                        WHERE crank <= 2 AND vec_id % 100 = 0),
             ivf AS (SELECT query_id, neighbor_id FROM (
                       SELECT p.query_id, a.vec_id AS neighbor_id,
                              row_number() OVER (PARTITION BY p.query_id
                                ORDER BY ${dotSql("qq.embedding", "vv.embedding")} / (qq.nrm * vv.nrm) DESC,
                                         a.vec_id ASC) AS rank
                       FROM probes p
                       JOIN assign a ON a.cell = p.cell AND a.vec_id != p.query_id
                       JOIN n qq ON qq.vec_id = p.query_id
                       JOIN n vv ON vv.vec_id = a.vec_id)
                     WHERE rank <= 3)
        , mp AS (SELECT query_id, neighbor_id FROM (
                 SELECT p.query_id, b.vec_id AS neighbor_id,
                        row_number() OVER (PARTITION BY p.query_id
                          ORDER BY ${dotSql("p.qe", "b.embedding")} / (p.qn * b.nrm) DESC,
                                   b.vec_id ASC) AS rank
                 FROM (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn,
                              unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                                      xor(bucket, 4), xor(bucket, 8)]) AS probe
                       FROM q) p
                 JOIN n b ON b.bucket = p.probe AND b.vec_id != p.query_id)
               WHERE rank <= 3)
        SELECT nq AS n_queries, hl AS hits_lsh, hi AS hits_ivf, hm AS hits_mp,
               CAST(hl AS DOUBLE)/(3*nq) AS recall_lsh,
               CAST(hi AS DOUBLE)/(3*nq) AS recall_ivf,
               CAST(hm AS DOUBLE)/(3*nq) AS recall_mp,
               true AS lsh_ok, true AS ivf_ok, true AS mp_ok, true AS mp_ge_lsh
        FROM (SELECT (SELECT count(*) FROM q) AS nq,
                     (SELECT count(*) FROM ex JOIN lsh USING (query_id, neighbor_id)) AS hl,
                     (SELECT count(*) FROM ex JOIN ivf USING (query_id, neighbor_id)) AS hi,
                     (SELECT count(*) FROM ex JOIN mp USING (query_id, neighbor_id)) AS hm)"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // candidate sets come from the REAL s03/s04 pipelines (specs looked
        // up lazily at run time), restricted to the s04 query set
        def pairsOf(name: String) = specs.find(_.name == name).get.run(s, dir)
          .filter(col("query_id") % 100 === 0)
          .select(col("query_id"), col("neighbor_id"))
        val lsh = pairsOf("s03_ann_lsh_bucketed")
        val ivf = pairsOf("s04_ann_ivf")
        val mp = pairsOf("s10_multiprobe_lsh")
        // exact ground truth: the s01 shape (guarded query broadcast,
        // streamed corpus, bounded top-k aggregate)
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        val q = graft.operators.AllPairsTopK.requireBroadcastable(
          e.filter(col("vec_id") % 100 === 0),
          what = "s06 recall query set",
          route = "recall audits should sample a bounded query set")
        val exact = exactKnn(q, e, k = 3)
          .select(col("query_id"), col("neighbor_id"))
        val nq = q.agg(count(lit(1)).as("nq"))
        val hl = exact.join(lsh, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("hl"))
        val hi = exact.join(ivf, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("hi"))
        val hm = exact.join(mp, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("hm"))
        nq.crossJoin(hl).crossJoin(hi).crossJoin(hm)
          .select(col("nq").as("n_queries"), col("hl").as("hits_lsh"),
            col("hi").as("hits_ivf"), col("hm").as("hits_mp"),
            (col("hl").cast("double") / (lit(3) * col("nq"))).as("recall_lsh"),
            (col("hi").cast("double") / (lit(3) * col("nq"))).as("recall_ivf"),
            (col("hm").cast("double") / (lit(3) * col("nq"))).as("recall_mp"),
            (col("hl").cast("double") / (lit(3) * col("nq")) >= 0.10).as("lsh_ok"),
            (col("hi").cast("double") / (lit(3) * col("nq")) >= 0.30).as("ivf_ok"),
            // all four booleans are PINNED true in the oracle, so a recall
            // collapse or an ordering violation FAILS the hash: mp_ge_lsh
            // is provable (multiprobe candidates ⊇ single-bucket ones and
            // ground-truth members beat every other candidate, so hits are
            // |G ∩ C|, monotone under inclusion) — the pin makes even a
            // mirrored conceptual bug in both engines trip the gate
            (col("hm").cast("double") / (lit(3) * col("nq")) >= 0.40).as("mp_ok"),
            (col("hm") >= col("hl")).as("mp_ge_lsh"))
      }),

    // ----- materialized-index serving: build once, probe row groups -----
    // The deployment shape of the LSH path at 100 TB: Ann.buildIndex
    // lays the corpus out ONCE, range-clustered by bucket with the
    // bucket width stamped in the parquet footer (born-with via the
    // geoparquet format), and every query batch after it serves through
    // Ann.annTopKIndexed — probe values push into the scan as an
    // In(bucket, …) filter, so row-group min/max stats prune the
    // non-probed corpus instead of re-reading and re-bucketing it per
    // batch. The gate asserts the pushdown actually reached the scan
    // (stac13 discipline) and value-checks the served results
    // row-for-row against the oracle's from-scratch multiprobe
    // derivation — layout, footer round trip, probe generation, and
    // ranking must all agree with the inline path to stay green.
    QuerySpec(
      "s12_ann_indexed",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
                          ${signBucketSql("embedding", 4)} AS bucket
                   FROM embeddings),
             p AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn,
                          unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                                  xor(bucket, 4), xor(bucket, 8)]) AS probe
                   FROM n WHERE vec_id % 100 = 0),
             sc AS (SELECT p.query_id, b.vec_id AS neighbor_id,
                           ${dotSql("p.qe", "b.embedding")} / (p.qn * b.nrm) AS cos
                    FROM p JOIN n b ON b.bucket = p.probe AND b.vec_id != p.query_id),
             rk AS (SELECT query_id, neighbor_id, cos,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos DESC, neighbor_id ASC) AS rank
                    FROM sc)
        SELECT query_id, rank, neighbor_id, round(cos, 9) AS cos
        FROM rk WHERE rank <= 3
        ORDER BY query_id, rank"""),
      (s, dir) => {
        val queries = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") % 100 === 0)
        val out = graft.operators.Ann.annTopKIndexed(s, annIndex(s, dir),
            queries, k = 3, probes = 5)
          .orderBy(col("query_id"), col("rank"))
        // the probed buckets must prune at the SCAN, not post-read: find
        // the index scan and pin its pushed In(bucket, …) filter
        val pushed = out.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metadata.getOrElse("PushedFilters", "")
        }
        require(pushed.exists(p => p.contains("In(bucket")),
          s"index serving must push probe buckets into the scan, got: $pushed")
        out
      },
      prepare = Some((s, dir) => { annIndex(s, dir); () })),

    // ----- bucket-width dial audit: annTopK at 8 bits vs 4 bits -----
    // The facade's `bits` parameter is THE dial that keeps LSH candidate
    // generation sub-quadratic (buckets scale with the corpus, per the
    // adaptiveBits discipline); this gate proves turning it does not
    // change semantics: both widths run through the same facade code,
    // both recalls are value-checked against exact ground truth, and the
    // ordering recall(4) ≥ recall(8) is PINNED in the oracle — provable,
    // because agreeing on the first 8 signs implies agreeing on the
    // first 4, so candidates(8 bits) ⊆ candidates(4 bits), and hits are
    // |G ∩ C| (ground-truth members outrank every other candidate),
    // monotone under candidate inclusion. A facade change that broke
    // bucket nesting or scoring at EITHER width fails the hash.
    QuerySpec(
      "s11_ann_bits_scaling",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
                          ${signBucketSql("embedding", 4)} AS b4,
                          ${signBucketSql("embedding", 8)} AS b8
                   FROM embeddings),
             q AS (SELECT * FROM n WHERE vec_id % 100 = 0),
             ex AS (SELECT query_id, neighbor_id FROM (
                      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                             row_number() OVER (PARTITION BY q.vec_id
                               ORDER BY ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC,
                                        c.vec_id ASC) AS rank
                      FROM q JOIN n c ON c.vec_id != q.vec_id)
                    WHERE rank <= 3),
             w4 AS (SELECT query_id, neighbor_id FROM (
                      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                             row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) DESC,
                                        b.vec_id ASC) AS rank
                      FROM q a JOIN n b ON a.b4 = b.b4 AND a.vec_id != b.vec_id)
                    WHERE rank <= 3),
             w8 AS (SELECT query_id, neighbor_id FROM (
                      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                             row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) DESC,
                                        b.vec_id ASC) AS rank
                      FROM q a JOIN n b ON a.b8 = b.b8 AND a.vec_id != b.vec_id)
                    WHERE rank <= 3)
        SELECT nq AS n_queries, h4 AS hits_b4, h8 AS hits_b8,
               CAST(h4 AS DOUBLE)/(3*nq) AS recall_b4,
               CAST(h8 AS DOUBLE)/(3*nq) AS recall_b8,
               true AS b4_ok, true AS b4_ge_b8
        FROM (SELECT (SELECT count(*) FROM q) AS nq,
                     (SELECT count(*) FROM ex JOIN w4 USING (query_id, neighbor_id)) AS h4,
                     (SELECT count(*) FROM ex JOIN w8 USING (query_id, neighbor_id)) AS h8)"""),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val queries = e.filter(col("vec_id") % 100 === 0)
        def pairsAt(bits: Int) =
          graft.operators.Ann.annTopK(e, queries, k = 3, bits = bits, probes = 1)
            .select(col("query_id"), col("neighbor_id"))
        val w4 = pairsAt(4)
        val w8 = pairsAt(8)
        val en = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        val q = graft.operators.AllPairsTopK.requireBroadcastable(
          en.filter(col("vec_id") % 100 === 0),
          what = "s11 recall query set",
          route = "recall audits should sample a bounded query set")
        val exact = exactKnn(q, en, k = 3).select(col("query_id"), col("neighbor_id"))
        val nq = q.agg(count(lit(1)).as("nq"))
        val h4 = exact.join(w4, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("h4"))
        val h8 = exact.join(w8, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("h8"))
        nq.crossJoin(h4).crossJoin(h8)
          .select(col("nq").as("n_queries"), col("h4").as("hits_b4"), col("h8").as("hits_b8"),
            (col("h4").cast("double") / (lit(3) * col("nq"))).as("recall_b4"),
            (col("h8").cast("double") / (lit(3) * col("nq"))).as("recall_b8"),
            // both booleans PINNED true in the oracle: a recall collapse
            // at the s06-calibrated floor, or a nesting violation
            // (possible only through a facade bucketing bug), fails the
            // hash even if mirrored conceptually in both engines
            (col("h4").cast("double") / (lit(3) * col("nq")) >= 0.10).as("b4_ok"),
            (col("h4") >= col("h8")).as("b4_ge_b8"))
      }),

    // ----- trained coarse quantizer: one Lloyd refinement of the IVF
    // codebook (the "training" step s04's static first-16 codebook skips).
    // Determinism discipline so DuckDB reproduces it bit-for-bit:
    //   - embeddings quantize to exact integers (floor(x·2^20 + 0.5));
    //   - round-1 assignment distances are PURE INTEGER sums (≤2^48);
    //   - refined centroids stay exact rationals (per-dim integer sum +
    //     count; never a double mean);
    //   - round-2 distances compare Σ(n·q_d − s_d)² / n² as per-row
    //     scalar double folds (left-to-right in both engines) — doubles
    //     never pass through an order-dependent aggregation;
    //   - ties break toward the lower cell id via min_by struct ordering.
    // Scale shape: k centroids broadcast; assignments are narrow maps +
    // one integer hash-agg per refinement — the k-means iteration cost is
    // linear per pass, the same shuffle story as s04. -----
    QuerySpec(
      "s07_kmeans_refine",
      Some(s"""
        WITH q AS (SELECT vec_id,
                          [CAST(floor(CAST(x AS DOUBLE)*1048576 + 0.5) AS BIGINT) for x in embedding] AS qv
                   FROM embeddings),
             c0 AS (SELECT vec_id AS cell, qv AS qc FROM q WHERE vec_id < 8),
             d1 AS (SELECT q.vec_id, c0.cell,
                           list_sum([(q.qv[i]-c0.qc[i])*(q.qv[i]-c0.qc[i])
                                     for i in generate_series(1, len(q.qv))]) AS dist2
                    FROM q CROSS JOIN c0),
             a1 AS (SELECT vec_id, cell FROM (
                      SELECT vec_id, cell,
                             row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
                      FROM d1) WHERE rn = 1),
             mem AS (SELECT a1.cell, q.vec_id, q.qv FROM a1 JOIN q USING (vec_id)),
             dims AS (SELECT cell, i.pos, CAST(sum(qv[i.pos]) AS BIGINT) AS s
                      FROM mem, (SELECT unnest(generate_series(1, 64)) AS pos) i
                      GROUP BY cell, i.pos),
             c1 AS (SELECT cell, list(s ORDER BY pos) AS sv,
                           (SELECT count(*) FROM mem m WHERE m.cell = dims.cell) AS n
                    FROM dims GROUP BY cell),
             d2 AS (SELECT q.vec_id, c1.cell,
                           list_sum([(CAST(c1.n*q.qv[i] - c1.sv[i] AS DOUBLE))*(CAST(c1.n*q.qv[i] - c1.sv[i] AS DOUBLE))
                                     for i in generate_series(1, len(q.qv))]) / (CAST(c1.n AS DOUBLE)*c1.n) AS dist2
                    FROM q CROSS JOIN c1),
             a2 AS (SELECT vec_id, cell FROM (
                      SELECT vec_id, cell,
                             row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
                      FROM d2) WHERE rn = 1)
        SELECT cell, count(*) AS n_members,
               CAST(min(vec_id) AS BIGINT) AS min_member,
               CAST(max(vec_id) AS BIGINT) AS max_member,
               CAST(sum(vec_id) AS BIGINT) AS member_id_sum
        FROM a2
        GROUP BY cell
        ORDER BY cell"""),
      (s, dir) => {
        // the facade operator at the oracle's pinned dial (8 seed cells);
        // round-5 lift — gate and Ann.lloydRefineAssign share one body
        val a2 = graft.operators.Ann.lloydRefineAssign(
          Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
          cells = 8)
        a2.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_members"),
            min(col("vec_id")).as("min_member"),
            max(col("vec_id")).as("max_member"),
            sum(col("vec_id")).as("member_id_sum"))
          .orderBy(col("cell"))
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
        // NO broadcast hints: the embeddings corpus must never be forced
        // into executor memory. Cost-based planning (with AQE) broadcasts
        // whichever side is actually small — at toy scale either works; at
        // 100 TB the candidate-pair set is the only broadcastable side and
        // past that the join degrades safely to a shuffle join on vec_id.
        pairs.join(a, "doc_a").join(b, "doc_b")
          .select(col("doc_a"), col("doc_b"),
            round(col("jaccard"), 9).as("jaccard"),
            round(dotd(col("ea"), col("eb")) / (col("na") * col("nb")), 9).as("cos"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      prepare = graft.queries.DedupOps.materializePairs),

    // ----- int8 embedding quantization + recall/error gate -----
    // The storage-compression leg of a 100-TB embedding store: symmetric
    // int8 quantization (one global scale from the corpus max-|x|, a
    // one-row broadcast) shrinks vectors 4× and turns the scoring hot
    // loop into integer multiply-adds. The gate runs exact top-3 search
    // on the QUANTIZED vectors and audits it against the float ground
    // truth: recall@3 plus the max |cos_int8 − cos_float| over the
    // returned pairs, both floored in the oracle so a quantizer
    // regression fails the hash. Determinism discipline: quantized values
    // are exact integers via floor(x·scale + 0.5) (identical semantics in
    // both engines — never round(), whose half-cases differ); integer
    // dots are exact BIGINTs; each cosine is one double division.
    QuerySpec(
      "s08_int8_quantization",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
                   FROM embeddings),
             ma AS (SELECT max(list_max([abs(CAST(x AS DOUBLE)) for x in embedding])) AS m
                    FROM embeddings),
             qd AS (SELECT vec_id,
                           [CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma.m + 0.5) AS BIGINT)
                            for x in embedding] AS qv
                    FROM embeddings, ma),
             qn AS (SELECT vec_id, qv,
                           sqrt(CAST(list_sum([v*v for v in qv]) AS DOUBLE)) AS qnrm
                    FROM qd),
             q AS (SELECT * FROM n WHERE vec_id % 100 = 0),
             ex AS (SELECT query_id, neighbor_id FROM (
                      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                             row_number() OVER (PARTITION BY q.vec_id
                               ORDER BY ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC,
                                        c.vec_id ASC) AS rank
                      FROM q JOIN n c ON c.vec_id != q.vec_id)
                    WHERE rank <= 3),
             i8 AS (SELECT query_id, neighbor_id, cos8 FROM (
                      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                             CAST(list_sum([a.qv[i]*b.qv[i] for i in generate_series(1, len(a.qv))]) AS DOUBLE)
                               / (a.qnrm * b.qnrm) AS cos8,
                             row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY CAST(list_sum([a.qv[i]*b.qv[i] for i in generate_series(1, len(a.qv))]) AS DOUBLE)
                                          / (a.qnrm * b.qnrm) DESC,
                                        b.vec_id ASC) AS rank
                      FROM qn a JOIN qn b ON a.vec_id % 100 = 0 AND b.vec_id != a.vec_id)
                    WHERE rank <= 3),
             err AS (SELECT max(abs(i8.cos8 -
                       ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm))) AS e
                     FROM i8 JOIN n a ON a.vec_id = i8.query_id
                             JOIN n b ON b.vec_id = i8.neighbor_id)
        SELECT nq AS n_queries, h AS hits_int8,
               CAST(h AS DOUBLE)/(3*nq) AS recall_int8,
               true AS recall_ok, true AS err_ok
        FROM (SELECT (SELECT count(*) FROM q) AS nq,
                     (SELECT count(*) FROM ex JOIN i8 USING (query_id, neighbor_id)) AS h,
                     (SELECT e FROM err) AS e)"""),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        val quant = quantizedEmbeddings(s, dir)
        // codegen'd native integer dot (graft.functions.LongDot) — the
        // zip_with/aggregate lambda form costs interpreted per-element
        // calls on the pairs×dims hot loop
        def intDot(a: Column, b: Column): Column =
          graft.functions.VectorFunctions.longDot(a, b)
        // exact top-3 over the QUANTIZED corpus: same scale-correct shape
        // as s01 — guarded query broadcast, streamed corpus, bounded top-k
        val qq = graft.operators.AllPairsTopK.requireBroadcastable(
          quant.filter(col("vec_id") % 100 === 0),
          what = "s08 int8 query set",
          route = "route corpus-sized query sets to s03/s04 over quantized vectors")
        val topk = graft.operators.TopK.topK(3)
        val i8 = quant
          .select(col("vec_id").as("neighbor_id"), col("qv").as("cv"), col("qnrm").as("cn"))
          .join(broadcast(qq.select(col("vec_id").as("query_id"),
            col("qv").as("qqv"), col("qnrm").as("qn"))),
            col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            (intDot(col("qqv"), col("cv")).cast("double") / (col("qn") * col("cn"))).as("cos8"))
          .groupBy(col("query_id"))
          .agg(topk(col("cos8"), col("neighbor_id")).as("nbrs"))
          .select(col("query_id"), explode(col("nbrs")).as("nbr"))
          .select(col("query_id"), col("nbr.id").as("neighbor_id"), col("nbr.score").as("cos8"))
        // float ground truth (s01 shape) + the two audit scalars
        val fq = graft.operators.AllPairsTopK.requireBroadcastable(
          e.filter(col("vec_id") % 100 === 0),
          what = "s08 float reference query set",
          route = "recall audits should sample a bounded query set")
        val exact = exactKnn(fq, e, k = 3).select(col("query_id"), col("neighbor_id"))
        val a = e.select(col("vec_id").as("query_id"), col("embedding").as("ea"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"), col("nrm").as("nb"))
        val err = i8.join(a, "query_id").join(b, "neighbor_id")
          .agg(max(abs(col("cos8") - dotd(col("ea"), col("eb")) / (col("na") * col("nb")))).as("e"))
        val nq = fq.agg(count(lit(1)).as("nq"))
        val hits = exact.join(i8, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("h"))
        nq.crossJoin(hits).crossJoin(err)
          .select(col("nq").as("n_queries"), col("h").as("hits_int8"),
            (col("h").cast("double") / (lit(3) * col("nq"))).as("recall_int8"),
            (col("h").cast("double") / (lit(3) * col("nq")) >= 0.65).as("recall_ok"),
            (col("e") <= 0.01).as("err_ok"))
      },
      prepare = materializeQuantized),

    // ----- product quantization + ADC lookup scoring -----
    // The deep-compression leg of the ANN stack (IVF in s04/s07, int8 in
    // s08, PQ here): the 64-dim int8 vector splits into 8 subspaces of 8
    // dims; each subvector is coded as the nearest of 16 per-subspace
    // centroids (the static first-16 codebook, like s04's coarse one), so
    // a vector stores as 8 code bytes — 32× smaller than float32. Queries
    // score by Asymmetric Distance Computation: a per-query 8×16 lookup
    // table of partial squared distances (tiny, broadcast), and each
    // corpus vector's approximate distance is the sum of 8 LUT entries —
    // no per-pair vector arithmetic at all. Everything is exact integer
    // math over the s08 quantization, so the oracle replays it
    // bit-for-bit; the gate pins recall@3 of ADC against the exact
    // quantized-L2 ground truth.
    QuerySpec(
      "s09_pq_adc",
      Some(s"""
        WITH ma AS (SELECT max(list_max([abs(CAST(x AS DOUBLE)) for x in embedding])) AS m
                    FROM embeddings),
             qd AS (SELECT vec_id,
                           [CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma.m + 0.5) AS BIGINT)
                            for x in embedding] AS qv
                    FROM embeddings, ma),
             js AS (SELECT unnest(generate_series(0, 7)) AS j),
             sub AS (SELECT qd.vec_id, js.j,
                            [qd.qv[js.j*8 + i] for i in generate_series(1, 8)] AS sv
                     FROM qd, js),
             cent AS (SELECT j, vec_id AS c, sv AS cv FROM sub WHERE vec_id < 16),
             enc AS (SELECT vec_id, j, c AS code FROM (
                       SELECT s.vec_id, s.j, ct.c,
                              row_number() OVER (PARTITION BY s.vec_id, s.j
                                ORDER BY list_sum([(s.sv[i]-ct.cv[i])*(s.sv[i]-ct.cv[i])
                                                   for i in generate_series(1, 8)]) ASC,
                                         ct.c ASC) AS rk
                       FROM sub s JOIN cent ct ON ct.j = s.j)
                     WHERE rk = 1),
             lut AS (SELECT s.vec_id AS query_id, ct.j, ct.c,
                            CAST(list_sum([(s.sv[i]-ct.cv[i])*(s.sv[i]-ct.cv[i])
                                           for i in generate_series(1, 8)]) AS BIGINT) AS pd
                     FROM sub s JOIN cent ct ON ct.j = s.j
                     WHERE s.vec_id % 100 = 0),
             adc AS (SELECT l.query_id, e.vec_id AS neighbor_id, CAST(sum(l.pd) AS BIGINT) AS adist
                     FROM enc e JOIN lut l ON l.j = e.j AND l.c = e.code
                     WHERE e.vec_id != l.query_id
                     GROUP BY 1, 2),
             short AS (SELECT query_id, neighbor_id FROM (
                         SELECT query_id, neighbor_id,
                                row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist ASC, neighbor_id ASC) AS rk
                         FROM adc) WHERE rk <= 64),
             rr AS (SELECT query_id, neighbor_id FROM (
                      SELECT sh.query_id, sh.neighbor_id,
                             row_number() OVER (PARTITION BY sh.query_id
                               ORDER BY list_sum([(a.qv[i]-b.qv[i])*(a.qv[i]-b.qv[i])
                                                  for i in generate_series(1, len(a.qv))]) ASC,
                                        sh.neighbor_id ASC) AS rk
                      FROM short sh
                      JOIN qd a ON a.vec_id = sh.query_id
                      JOIN qd b ON b.vec_id = sh.neighbor_id)
                    WHERE rk <= 3),
             ex AS (SELECT query_id, neighbor_id FROM (
                      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                             row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY list_sum([(a.qv[i]-b.qv[i])*(a.qv[i]-b.qv[i])
                                                  for i in generate_series(1, len(a.qv))]) ASC,
                                        b.vec_id ASC) AS rk
                      FROM qd a JOIN qd b ON a.vec_id % 100 = 0 AND b.vec_id != a.vec_id)
                    WHERE rk <= 3)
        SELECT nq AS n_queries, h AS hits_pq,
               CAST(h AS DOUBLE)/(3*nq) AS recall_pq,
               true AS recall_ok
        FROM (SELECT (SELECT count(*) FROM qd WHERE vec_id % 100 = 0) AS nq,
                     (SELECT count(*) FROM ex JOIN rr USING (query_id, neighbor_id)) AS h)"""),
      (s, dir) => {
        val longDot = graft.functions.VectorFunctions.longDot _
        // exact ||a-b||² via qsq_a − 2·a·b + qsq_b with PRE-COMPUTED self
        // dots: one codegen'd dot per pair on the hot loops, not three
        // (the self dots are per-row constants, cached on each side)
        def sqDist(aSq: Column, a: Column, b: Column, bSq: Column): Column =
          aSq - lit(2L) * longDot(a, b) + bSq
        val quant = quantizedEmbeddings(s, dir)
        // guarded query set, then the facade operator at the oracle's
        // pinned dials (8 subspaces × 16 codes, 64-candidate shortlist)
        val qq = graft.operators.AllPairsTopK.requireBroadcastable(
          quant.filter(col("vec_id") % 100 === 0),
          what = "s09 PQ query set",
          route = "recall audits should sample a bounded query set")
        val approx = graft.operators.Ann.pqTopK(quant, qq, k = 3,
            subspaces = 8, codes = 16, shortlist = 64)
          .select(col("query_id"), col("neighbor_id"))
        // exact ground truth on the same quantized vectors: guarded query
        // broadcast + bounded top-k, L2 by the same cached-self-dot identity
        val topk = graft.operators.TopK.topK(3)
        val exact = quant
          .select(col("vec_id").as("neighbor_id"), col("qv").as("cqv"), col("qsq").as("csq2"))
          .join(broadcast(qq.select(col("vec_id").as("query_id"),
            col("qv").as("qqv"), col("qsq").as("qsq2"))),
            col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            (sqDist(col("qsq2"), col("qqv"), col("cqv"), col("csq2")) * -1L)
              .cast("double").as("nd"))
          .groupBy(col("query_id"))
          .agg(topk(col("nd"), col("neighbor_id")).as("nbrs"))
          .select(col("query_id"), explode(col("nbrs.id")).as("neighbor_id"))
        val nq = qq.agg(count(lit(1)).as("nq"))
        val hits = exact.join(approx, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("h"))
        nq.crossJoin(hits)
          .select(col("nq").as("n_queries"), col("h").as("hits_pq"),
            (col("h").cast("double") / (lit(3) * col("nq"))).as("recall_pq"),
            (col("h").cast("double") / (lit(3) * col("nq")) >= 0.30).as("recall_ok"))
      },
      prepare = materializeQuantized),

    // ----- IVF-PQ: the full production composition (FAISS IVFPQ shape) -----
    // s04 bounds WHICH vectors are scored (coarse cells, nprobe probe);
    // s09 bounds HOW MUCH each scoring costs (8 LUT lookups per pair).
    // This gate runs them COMPOSED through Ann.ivfPqTopK: candidates come
    // only from the query's 2 nearest cells (Θ(nprobe·n/C) per query —
    // n_candidates is value-checked to pin that volume), ADC shortlists
    // them, an exact integer re-rank finishes. Both sides quantize at the
    // corpus scale, so the whole derivation is exact integer math after
    // the (fold-order-identical) cosine cell routing — the oracle replays
    // it bit-for-bit. recall@3 vs the exact quantized ground truth is
    // value-checked with the floor PINNED (measured ~0.33 at sf0.01 —
    // cells are the binding constraint, matching s06's IVF numbers).
    QuerySpec(
      "s13_ann_ivfpq",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
                   FROM embeddings),
             ccent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                       FROM n WHERE vec_id < 16),
             cscored AS (SELECT v.vec_id, c.cent_id,
                                row_number() OVER (PARTITION BY v.vec_id
                                                   ORDER BY ${dotSql("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC,
                                                            c.cent_id ASC) AS crank
                         FROM n v JOIN ccent c ON true),
             assign AS (SELECT vec_id, cent_id AS cell FROM cscored WHERE crank = 1),
             probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM cscored
                        WHERE crank <= 2 AND vec_id % 100 = 0),
             cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
                      FROM probes p JOIN assign a ON a.cell = p.cell
                      WHERE a.vec_id != p.query_id),
             ma AS (SELECT max(list_max([abs(CAST(x AS DOUBLE)) for x in embedding])) AS m
                    FROM embeddings),
             qd AS (SELECT vec_id,
                           [CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma.m + 0.5) AS BIGINT)
                            for x in embedding] AS qv
                    FROM embeddings, ma),
             js AS (SELECT unnest(generate_series(0, 7)) AS j),
             sub AS (SELECT qd.vec_id, js.j,
                            [qd.qv[js.j*8 + i] for i in generate_series(1, 8)] AS sv
                     FROM qd, js),
             pcent AS (SELECT j, vec_id AS c, sv AS cv FROM sub WHERE vec_id < 16),
             enc AS (SELECT vec_id, j, c AS code FROM (
                       SELECT s.vec_id, s.j, ct.c,
                              row_number() OVER (PARTITION BY s.vec_id, s.j
                                ORDER BY list_sum([(s.sv[i]-ct.cv[i])*(s.sv[i]-ct.cv[i])
                                                   for i in generate_series(1, 8)]) ASC,
                                         ct.c ASC) AS rk
                       FROM sub s JOIN pcent ct ON ct.j = s.j)
                     WHERE rk = 1),
             lut AS (SELECT s.vec_id AS query_id, ct.j, ct.c,
                            CAST(list_sum([(s.sv[i]-ct.cv[i])*(s.sv[i]-ct.cv[i])
                                           for i in generate_series(1, 8)]) AS BIGINT) AS pd
                     FROM sub s JOIN pcent ct ON ct.j = s.j
                     WHERE s.vec_id % 100 = 0),
             adc AS (SELECT c.query_id, c.neighbor_id, CAST(sum(l.pd) AS BIGINT) AS adist
                     FROM cand c
                     JOIN enc e ON e.vec_id = c.neighbor_id
                     JOIN lut l ON l.query_id = c.query_id AND l.j = e.j AND l.c = e.code
                     GROUP BY 1, 2),
             short AS (SELECT query_id, neighbor_id FROM (
                         SELECT query_id, neighbor_id,
                                row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist ASC, neighbor_id ASC) AS rk
                         FROM adc) WHERE rk <= 32),
             rr AS (SELECT query_id, neighbor_id FROM (
                      SELECT sh.query_id, sh.neighbor_id,
                             row_number() OVER (PARTITION BY sh.query_id
                               ORDER BY list_sum([(a.qv[i]-b.qv[i])*(a.qv[i]-b.qv[i])
                                                  for i in generate_series(1, len(a.qv))]) ASC,
                                        sh.neighbor_id ASC) AS rk
                      FROM short sh
                      JOIN qd a ON a.vec_id = sh.query_id
                      JOIN qd b ON b.vec_id = sh.neighbor_id)
                    WHERE rk <= 3),
             ex AS (SELECT query_id, neighbor_id FROM (
                      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                             row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY list_sum([(a.qv[i]-b.qv[i])*(a.qv[i]-b.qv[i])
                                                  for i in generate_series(1, len(a.qv))]) ASC,
                                        b.vec_id ASC) AS rk
                      FROM qd a JOIN qd b ON a.vec_id % 100 = 0 AND b.vec_id != a.vec_id)
                    WHERE rk <= 3)
        SELECT nq AS n_queries,
               nc AS n_candidates,
               h AS hits_ivfpq,
               CAST(h AS DOUBLE)/(3*nq) AS recall_ivfpq,
               true AS recall_ok
        FROM (SELECT (SELECT count(*) FROM qd WHERE vec_id % 100 = 0) AS nq,
                     (SELECT CAST(count(*) AS BIGINT) FROM cand) AS nc,
                     (SELECT count(*) FROM ex JOIN rr USING (query_id, neighbor_id)) AS h)"""),
      (s, dir) => {
        val longDot = graft.functions.VectorFunctions.longDot _
        def sqDist(aSq: Column, a: Column, b: Column, bSq: Column): Column =
          aSq - lit(2L) * longDot(a, b) + bSq
        val e = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val q = e.filter(col("vec_id") % 100 === 0)
        val approx = graft.operators.Ann.ivfPqTopK(e, q, k = 3,
            cells = 16, nprobe = 2, subspaces = 8, codes = 16, shortlist = 32)
          .select(col("query_id"), col("neighbor_id"))
        // candidate volume: replay the cell routing to count what the
        // operator scored — pins the Θ(nprobe·n/C) claim as a VALUE
        val en = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        val cent = en.orderBy(col("vec_id")).limit(16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("nrm").as("cn"))
        val ccos = (dotd(col("embedding"), col("ce")) / (col("nrm") * col("cn"))).as("ccos")
        val scored = en.join(broadcast(cent))
          .select(col("vec_id"), col("cent_id"), ccos)
          .withColumn("crank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
              .orderBy(col("ccos").desc, col("cent_id").asc)))
        val assign = scored.filter(col("crank") === 1)
          .select(col("vec_id"), col("cent_id").as("cell"))
        val probes = scored.filter(col("crank") <= 2 && col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("cent_id").as("cell"))
        val nCand = broadcast(probes).join(assign, "cell")
          .filter(col("vec_id") =!= col("query_id"))
          .agg(count(lit(1)).as("nc"))
        // exact quantized ground truth (s09's shape)
        val quant = quantizedEmbeddings(s, dir)
        val qq = graft.operators.AllPairsTopK.requireBroadcastable(
          quant.filter(col("vec_id") % 100 === 0),
          what = "s13 IVF-PQ query set",
          route = "recall audits should sample a bounded query set")
        val topk = graft.operators.TopK.topK(3)
        val exact = quant
          .select(col("vec_id").as("neighbor_id"), col("qv").as("cqv"), col("qsq").as("csq2"))
          .join(broadcast(qq.select(col("vec_id").as("query_id"),
            col("qv").as("qqv"), col("qsq").as("qsq2"))),
            col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            (sqDist(col("qsq2"), col("qqv"), col("cqv"), col("csq2")) * -1L)
              .cast("double").as("nd"))
          .groupBy(col("query_id"))
          .agg(topk(col("nd"), col("neighbor_id")).as("nbrs"))
          .select(col("query_id"), explode(col("nbrs.id")).as("neighbor_id"))
        val nq = qq.agg(count(lit(1)).as("nq"))
        val hits = exact.join(approx, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("h"))
        nq.crossJoin(nCand).crossJoin(hits)
          .select(col("nq").as("n_queries"), col("nc").as("n_candidates"),
            col("h").as("hits_ivfpq"),
            (col("h").cast("double") / (lit(3) * col("nq"))).as("recall_ivfpq"),
            // pinned true in the oracle — a recall collapse fails the hash
            (col("h").cast("double") / (lit(3) * col("nq")) >= 0.10).as("recall_ok"))
      },
      prepare = materializeQuantized),

    // ----- IVF-PQ served from the MATERIALIZED index (the production shape) -----
    // s12 serves sign-LSH from storage; this is the billion-vector form:
    // Ann.buildIvfPqIndex lays the corpus down ONCE as cell-clustered
    // (vec_id, cell, int8 qv, qsq, pq codes) with centroid/codebook
    // sidecars and every dial + the quantization scale in the parquet
    // footer — then ivfPqTopKIndexed probes the stored centroids, pushes
    // the probed cells into the scan as In(cell, …) (asserted on the
    // FileSourceScan below), ADC-scores the stored code bytes, and
    // exact-reranks the stored int8 rows. The answer must equal the
    // from-scratch Ann.ivfPqTopK ROW FOR ROW (required in-gate, both
    // directions) — the index is a layout change, never a semantics
    // change. The oracle replays the whole derivation (s13's CTE chain)
    // to the ranked rows themselves: (query_id, rank, neighbor_id,
    // exact quantized dist2), all integer math, bit-identical
    // cross-engine.
    QuerySpec(
      "s14_ann_ivfpq_indexed",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
                   FROM embeddings),
             ccent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                       FROM n WHERE vec_id < 16),
             cscored AS (SELECT v.vec_id, c.cent_id,
                                row_number() OVER (PARTITION BY v.vec_id
                                                   ORDER BY ${dotSql("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC,
                                                            c.cent_id ASC) AS crank
                         FROM n v JOIN ccent c ON true),
             assign AS (SELECT vec_id, cent_id AS cell FROM cscored WHERE crank = 1),
             probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM cscored
                        WHERE crank <= 2 AND vec_id % 100 = 0),
             cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
                      FROM probes p JOIN assign a ON a.cell = p.cell
                      WHERE a.vec_id != p.query_id),
             ma AS (SELECT max(list_max([abs(CAST(x AS DOUBLE)) for x in embedding])) AS m
                    FROM embeddings),
             qd AS (SELECT vec_id,
                           [CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma.m + 0.5) AS BIGINT)
                            for x in embedding] AS qv
                    FROM embeddings, ma),
             js AS (SELECT unnest(generate_series(0, 7)) AS j),
             sub AS (SELECT qd.vec_id, js.j,
                            [qd.qv[js.j*8 + i] for i in generate_series(1, 8)] AS sv
                     FROM qd, js),
             pcent AS (SELECT j, vec_id AS c, sv AS cv FROM sub WHERE vec_id < 16),
             enc AS (SELECT vec_id, j, c AS code FROM (
                       SELECT s.vec_id, s.j, ct.c,
                              row_number() OVER (PARTITION BY s.vec_id, s.j
                                ORDER BY list_sum([(s.sv[i]-ct.cv[i])*(s.sv[i]-ct.cv[i])
                                                   for i in generate_series(1, 8)]) ASC,
                                         ct.c ASC) AS rk
                       FROM sub s JOIN pcent ct ON ct.j = s.j)
                     WHERE rk = 1),
             lut AS (SELECT s.vec_id AS query_id, ct.j, ct.c,
                            CAST(list_sum([(s.sv[i]-ct.cv[i])*(s.sv[i]-ct.cv[i])
                                           for i in generate_series(1, 8)]) AS BIGINT) AS pd
                     FROM sub s JOIN pcent ct ON ct.j = s.j
                     WHERE s.vec_id % 100 = 0),
             adc AS (SELECT c.query_id, c.neighbor_id, CAST(sum(l.pd) AS BIGINT) AS adist
                     FROM cand c
                     JOIN enc e ON e.vec_id = c.neighbor_id
                     JOIN lut l ON l.query_id = c.query_id AND l.j = e.j AND l.c = e.code
                     GROUP BY 1, 2),
             short AS (SELECT query_id, neighbor_id FROM (
                         SELECT query_id, neighbor_id,
                                row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist ASC, neighbor_id ASC) AS rk
                         FROM adc) WHERE rk <= 32)
        SELECT query_id, CAST(rk AS INT) AS rank, neighbor_id,
               CAST(d2 AS BIGINT) AS dist2
        FROM (SELECT sh.query_id, sh.neighbor_id,
                     list_sum([(a.qv[i]-b.qv[i])*(a.qv[i]-b.qv[i])
                               for i in generate_series(1, len(a.qv))]) AS d2,
                     row_number() OVER (PARTITION BY sh.query_id
                       ORDER BY list_sum([(a.qv[i]-b.qv[i])*(a.qv[i]-b.qv[i])
                                          for i in generate_series(1, len(a.qv))]) ASC,
                                sh.neighbor_id ASC) AS rk
              FROM short sh
              JOIN qd a ON a.vec_id = sh.query_id
              JOIN qd b ON b.vec_id = sh.neighbor_id)
        WHERE rk <= 3
        ORDER BY query_id, rank"""),
      (s, dir) => {
        val q = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") % 100 === 0)
        // persisted: the two except legs and the harness materialization
        // each consume `out`/`scratch` — uncached, the whole serving and
        // from-scratch pipelines would re-run per consumer
        val out = graft.operators.Ann.ivfPqTopKIndexed(s, ivfPqIndex(s, dir),
            q, k = 3, nprobe = 2, shortlist = 32)
          .orderBy(col("query_id"), col("rank"))
        // probed cells must prune at the SCAN of the stored layout.
        // Forced BEFORE persist(): once the frame is registered with the
        // cache manager, its own sparkPlan is substituted by an
        // InMemoryRelation root and the file scans become unreachable to
        // collect — the assert would see zero scans, not the pushdown.
        val pushed = out.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metadata.getOrElse("PushedFilters", "")
        }
        require(pushed.exists(p => p.contains("In(cell")),
          s"IVF-PQ index serving must push probed cells into the scan, got: $pushed")
        out.persist()
        // layout change, not semantics change: equal to from-scratch,
        // both directions. ONE multiset-equality action (tag the side,
        // one hash-agg, any per-value count imbalance is a violation) in
        // place of the former two except legs — except is distinct+anti
        // (two shuffles) per DIRECTION plus an extra materialization of
        // both caches; since (query_id, rank) is unique per side, set
        // and multiset equality coincide, so the checked property is
        // unchanged.
        val scratch = graft.operators.Ann.ivfPqTopK(
          Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
          q, k = 3, cells = 16, nprobe = 2, subspaces = 8, codes = 16,
          shortlist = 32)
        val valueCols = out.columns.map(col)
        val mismatch = out.withColumn("side", lit(1))
          .unionByName(scratch.withColumn("side", lit(2)))
          .groupBy(valueCols: _*)
          .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_idx"),
            sum(when(col("side") === 2, 1L).otherwise(0L)).as("n_scr"))
          .filter(col("n_idx") =!= col("n_scr"))
          .limit(1).collect()
        require(mismatch.isEmpty,
          s"indexed IVF-PQ must equal the from-scratch ivfPqTopK row for row, first diff: ${mismatch.mkString}")
        out // stays cached for the harness materialization
      },
      prepare = Some((s, dir) => { ivfPqIndex(s, dir); () }))
  )
}
