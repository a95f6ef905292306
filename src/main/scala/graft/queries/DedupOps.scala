package graft.queries

import graft.{CachedMemo, QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators (exact, fingerprint, MinHash+LSH, SimHash).
  *
  * Scale design: every variant is groupBy/join on a deterministic hash key
  * — a single hash-partitioned shuffle that scales linearly with input.
  * Nothing does an all-pairs comparison: MinHash/LSH reduces the candidate
  * space to same-bucket pairs before the (cheap) verify step, which is the
  * 100-TB path; SimHash emits a per-doc 32-bit signature groupable/joinable
  * by prefix. Hashing is md5 (same bytes in Spark and DuckDB), bit math is
  * integer-only, ratios are a single final double division.
  */
object DedupOps {

  import TextOps.words

  /** Word 3-gram shingles (guarded for <3 tokens — Spark's sequence()
    * would run descending; DuckDB's generate_series is naturally empty). */
  /** Deterministic 0–99 hash bucket per id (md5 — identical bytes in
    * both engines): the ONE definition of d06's membership rule, shared
    * with `Pipeline.stratifiedKeep` so the facade cannot drift from the
    * gate-verified semantics. */
  private[queries] def hashBucket100(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

  def shingles3(ws: Column): Column =
    when(size(ws) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))

  private val nSeeds = 4

  /** doc_id + distinct word-3-gram shingle set (native one-pass expression;
    * the interpreted `transform(sequence(...))` + `array_distinct` form costs
    * ~10× more per row — see graft.functions.WordShingles). */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), graft.functions.TextFunctions.wordShingles(col("text"), 3).as("g"))

  // (minhash signature derivation moved to graft.operators.NearDup in the
  // round-5 facade lift: signatures are computed per document inside the
  // scan stage, so the only rows that ever shuffle are `seeds × docs`;
  // empty docs yield null minhashes, which the candidate equi-join drops —
  // same as the oracle's NULL list_aggregate over an empty shingle list.)

  /** DuckDB CTE for the distinct word-3-gram shingle sets (`sg`). */
  private[queries] def sgCte: String = s"""
    sg AS (SELECT doc_id,
                  list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2]
                                 for i in generate_series(1, len(ws)-2)]) AS g
           FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents))"""

  /** Shared CTE: LSH candidates verified with exact n-gram Jaccard (`jp`). */
  private[queries] def pairsCte: String = s"""
    $sgCte,
    mh AS (SELECT doc_id, s.seed AS seed,
                  list_aggregate(list_transform(g, x -> md5(s.seed||':'||x)), 'min') AS mhv
           FROM sg, (SELECT unnest(generate_series(0, ${nSeeds - 1})) AS seed) s),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM mh a JOIN mh b ON a.seed = b.seed AND a.mhv = b.mhv
                                AND a.doc_id < b.doc_id),
    jp AS (SELECT c.doc_a, c.doc_b,
                  CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
                    / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) AS jaccard
           FROM cand c
           JOIN sg ga ON ga.doc_id = c.doc_a
           JOIN sg gb ON gb.doc_id = c.doc_b)"""

  /** Spark side of `jp`: (doc_a, doc_b, jaccard) candidate pairs.
    *
    * Memoized + persisted per (session, dataset): the derivation is shared
    * by three pipeline stages (d03 candidate listing, d05 clustering, s05
    * cross-modal scoring) and recomputing the minhash self-join for each
    * would triple the most expensive shuffle in the dedup suite. The
    * materialized pair set is tiny relative to the corpus (candidates
    * only, never all-pairs), so MEMORY_AND_DISK persistence is safe at
    * scale — this is the "materialize the candidate table once" step a
    * production dedup pipeline does explicitly. */
  private val pairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[queries] def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    CachedMemo.get(pairsCache, (s, dir))(identity)(
      computeJaccardPairs(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Bench prepare hook: force the shared candidate materialization BEFORE
    * the timer, so whichever of d03/d05/s05 runs first isn't charged for
    * the one-time ingest the other two then read from cache — the same
    * amortization contract as the bucketed tables and the ndjson corpus. */
  private[queries] val materializePairs: Option[(SparkSession, String) => Unit] =
    Some((s, dir) => { jaccardPairs(s, dir).count(); () })

  /** Unpersist + drop the (session, dir) candidate-pair cache entry — the
    * release hook mirroring [[SimilarityOps.releaseQuantized]]: run-once
    * gates never need it, but a long-lived session re-pointing at new
    * datasets must release retired entries. */
  def releasePairs(s: SparkSession, dir: String): Unit =
    pairsCache.remove((s, dir)).foreach { df => df.unpersist(); () }

  /** d08's simhash pair set, memoized per (session, dataset) like
    * [[jaccardPairs]]: `NearDup.simhashPairs` persists its signature frame
    * and hands back a release hook — calling it fresh per gate invocation
    * and discarding the hook stacked a new cached copy on every
    * QuickRun/VerifySome repeat in one session. One entry per (session,
    * dir), released via [[releaseSimhash]]. */
  /** d21's one-time materialized band-index layout per (session, dataset)
    * — history = even doc_ids (the d17 partition), built once untimed
    * (the s12/s14 index discipline). */
  private val bandIndexDirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[queries] def bandIndex(s: SparkSession, dir: String): String =
    bandIndexDirs.getOrElseUpdate((s, dir), {
      val path = java.nio.file.Files.createTempDirectory("band_index").toString + "/idx"
      graft.operators.NearDup.buildBandIndex(
        Tables.t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        path, seeds = nSeeds, shingleN = 3, files = 8)
      path
    })

  private val simhashCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, DataFrame, () => Unit)]

  private[queries] def simhashPairsMemo(s: SparkSession, dir: String): DataFrame =
    CachedMemo.get(simhashCache, (s, dir))(_._2)(
      graft.operators.NearDup.simhashPairsState(
        Tables.t(s, dir, "documents"), maxHamming = 3))._1

  def releaseSimhash(s: SparkSession, dir: String): Unit =
    simhashCache.remove((s, dir)).foreach { case (_, _, release) => release() }

  /** d18/d19's shared substring-window state (Karp–Rabin windows + verified
    * dup positions), memoized per (session, dataset) like [[simhashCache]]:
    * `NearDup.substringDupWindows` persists two frames and hands back a
    * release hook; the round-7 advice flagged the original per-call form
    * stacking fresh cached copies across interleaved bench passes. d18's
    * stats and d19's span merge both read the one cached dup-position set. */
  private val substringCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.operators.NearDup.SubstringDups]

  private[queries] val substringW = 64

  private[queries] def substringMemo(s: SparkSession, dir: String)
      : graft.operators.NearDup.SubstringDups =
    CachedMemo.get(substringCache, (s, dir))(_.win)(
      graft.operators.NearDup.substringDupWindows(
        Tables.t(s, dir, "documents"), w = substringW))

  def releaseSubstring(s: SparkSession, dir: String): Unit =
    substringCache.remove((s, dir)).foreach(_.release())

  /** Delegates to the user-callable operator (round-5 lift): the gate and
    * `Pipeline.nearDupPairs` run the SAME code, so the facade cannot drift
    * from the value-checked semantics. */
  private def computeJaccardPairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.NearDup.verifiedPairs(
      Tables.t(s, dir, "documents"), seeds = nSeeds)

  /** DuckDB mirror of graft.functions.SimHashSig: bit b of the signature is
    * the sign of sum(±1 of token-hash bit b) over per-token md5-prefix
    * hashes (32-bit prefixes for the 32-bit signature, 60-bit for 60). */
  /** d10/d13's constructed near-dup population over the embeddings table:
    * every 5th vector gets a variant (vec_id + 1,000,000) with ~1/4 of its
    * dimensions HALVED, dims chosen by md5(vec_id:pos). Halving a float is
    * exact in float32 and float64 (exponent decrement — no mantissa
    * rounding), so both engines see bit-identical values; see d10's spec
    * comment for why this also preserves sign-LSH buckets. */
  private[queries] val variantCorpusCte: String = """base AS (SELECT vec_id, embedding FROM embeddings),
             var AS (SELECT vec_id + 1000000 AS vec_id,
                            CAST([CASE WHEN CAST(('0x'||substr(md5(vec_id||':'||i),1,2)) AS INTEGER) < 64
                                       THEN embedding[i]*0.5 ELSE embedding[i] END
                                  for i in generate_series(1, 64)] AS FLOAT[]) AS embedding
                     FROM base WHERE vec_id % 5 = 0),
             corpus AS (SELECT vec_id, embedding FROM base
                        UNION ALL SELECT vec_id, embedding FROM var)"""

  /** Spark side of [[variantCorpusCte]] — (vec_id, embedding).
    * NOTE: the variant embedding must be derived BEFORE the id is renamed —
    * in a single select the later transform would resolve `vec_id` to the
    * earlier `vec_id + 1000000` alias (lateral column alias resolution),
    * silently keying md5 off the wrong id. */
  private[queries] def variantCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val variants = base.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(conv(substring(md5(concat(col("vec_id").cast("string"), lit(":"),
                   (i + 1).cast("string"))), 1, 2), 16, 10)
                 .cast("int") < 64, x * lit(0.5f))
            .otherwise(x)).as("embedding"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    base.unionByName(variants)
  }

  private[queries] def simhashSql(bits: Int = 32): String = {
    val terms = (0 until bits).map { b =>
      s"(CASE WHEN CAST(list_sum(list_transform(xs, x -> ((x >> $b) & 1)*2 - 1)) AS BIGINT) > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"($terms)"
  }

  val specs: Seq[QuerySpec] = Seq(

    // ----- exact dedup: corpus-level stats via hash-groupBy -----
    QuerySpec(
      "d01_dedup_exact",
      Some("""
        SELECT CAST(sum(c) AS BIGINT) AS total_docs,
               count(*) AS distinct_texts,
               CAST(count(*) FILTER (c > 1) AS BIGINT) AS dup_groups,
               CAST(sum(c - 1) AS BIGINT) AS docs_removed
        FROM (SELECT md5(text) AS k, count(*) AS c FROM documents GROUP BY 1)"""),
      (s, dir) =>
        Tables.t(s, dir, "documents")
          .groupBy(md5(col("text")).as("k"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(col("c")).as("total_docs"),
            count(lit(1)).as("distinct_texts"),
            count(when(col("c") > 1, 1)).as("dup_groups"),
            sum(col("c") - 1).as("docs_removed"))),

    // ----- near-exact dedup on 3-word-prefix fingerprint: keeps min id -----
    QuerySpec(
      "d02_dedup_prefix",
      Some("""
        SELECT md5(array_to_string((string_split(text,' '))[1:3], ' ')) AS prefix_fp,
               CAST(min(doc_id) AS BIGINT) AS keep_id,
               count(*) AS group_size
        FROM documents
        GROUP BY 1 HAVING count(*) > 1
        ORDER BY keep_id"""),
      (s, dir) => {
        val ws = words(col("text"))
        Tables.t(s, dir, "documents")
          .groupBy(md5(concat_ws(" ", element_at(ws, 1), element_at(ws, 2), element_at(ws, 3))).as("prefix_fp"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))
          .filter(col("group_size") > 1)
          .orderBy(col("keep_id"))
      }),

    // ----- MinHash + LSH candidate pairs, verified with n-gram Jaccard -----
    // Bucket join on (seed, minhash) — candidates only, never all-pairs —
    // then exact Jaccard on the distinct shingle sets of the candidates.
    QuerySpec(
      "d03_minhash_lsh_jaccard",
      Some(s"""
        WITH $pairsCte
        SELECT doc_a, doc_b, jaccard FROM jp
        ORDER BY doc_a, doc_b"""),
      (s, dir) => jaccardPairs(s, dir).orderBy(col("doc_a"), col("doc_b")),
      prepare = materializePairs),

    // ----- SimHash signatures (32-bit), native per-document expression -----
    QuerySpec(
      "d04_simhash",
      Some(s"""
        SELECT doc_id, ${simhashSql()} AS simhash
        FROM (SELECT doc_id,
                     list_transform(string_split(text,' '),
                                    w -> CAST(('0x'||substr(md5(w),1,8)) AS BIGINT)) AS xs
              FROM documents)
        ORDER BY doc_id"""),
      (s, dir) =>
        Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.simhashSig(col("text")).as("simhash"))
          .orderBy(col("doc_id"))),

    // ----- SimHash near-dup pairs: banded candidates + Hamming verify -----
    // d04 computes the signatures; this DEDUPS with them, the same
    // bucket-join discipline as MinHash/LSH (d03): the WIDE (60-bit)
    // signature splits into 4 bands of 15 bits, candidate pairs share ANY
    // band value (an equi-join on (band, value) — never all-pairs), and
    // candidates verify by exact Hamming distance ≤ 3. The banding is
    // EXACT for this threshold by pigeonhole: ≤3 differing bits damage at
    // most 3 of the 4 bands, so every qualifying pair shares an intact
    // band and is found — approximate candidate generation, provably
    // lossless recall. The signature is 60-bit (not d04's 32) for BUCKET
    // CARDINALITY: 15-bit bands give 32768 values per band, so candidate
    // volume stays near-linear far longer than 8-bit bands' 256 buckets;
    // hot band values split via NearDup.simhashPairs' `salt` dial
    // (identity-proved in OperatorSpec — same answer at any salt).
    // The token hash stays md5 DELIBERATELY: the oracle must recompute
    // bit-identical signatures, and md5 is the only cheap hash Spark and
    // DuckDB both evaluate exactly (DuckDB has no xxhash64; its hash()
    // is engine-internal). The steady cost lives in the persist: the
    // signature frame feeds the band explode and both verify sides, so
    // without it projection collapsing re-runs the per-word digest per
    // consumer (the m09 lesson).
    QuerySpec(
      "d08_simhash_dedup",
      Some(s"""
        WITH s AS (SELECT doc_id, ${simhashSql(60)} AS sig
                   FROM (SELECT doc_id,
                                list_transform(string_split(text,' '),
                                               w -> CAST(('0x'||substr(md5(w),1,15)) AS BIGINT)) AS xs
                         FROM documents)),
             bands AS (SELECT doc_id, sig, b, (sig >> (15*b)) & 32767 AS bv
                       FROM s, (SELECT unnest([0, 1, 2, 3]) AS b)),
             cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM bands a JOIN bands b
                        ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
        SELECT c.doc_a, c.doc_b,
               CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
        FROM cand c
        JOIN s sa ON sa.doc_id = c.doc_a
        JOIN s sb ON sb.doc_id = c.doc_b
        WHERE bit_count(xor(sa.sig, sb.sig)) <= 3
        ORDER BY doc_a, doc_b"""),
      (s, dir) => simhashPairsMemo(s, dir).orderBy(col("doc_a"), col("doc_b"))),

    // ----- duplicate clusters: connected components over verified pairs -----
    // The end-to-end dedup decision: near-dup pairs (jaccard ≥ 0.6) →
    // min-label clusters (graft.operators.ConnectedComponents, one shuffle
    // per iteration) → keep the min doc_id per cluster. The oracle computes
    // the same closure with a recursive CTE.
    QuerySpec(
      "d05_dedup_clusters",
      Some(s"""
        WITH RECURSIVE $pairsCte,
             p AS (SELECT doc_a, doc_b FROM jp WHERE jaccard >= 0.6),
             e AS (SELECT doc_a AS x, doc_b AS y FROM p
                   UNION ALL SELECT doc_b, doc_a FROM p),
             reach(doc, lbl) AS (
               SELECT x, x FROM e
               UNION
               SELECT e.x, r.lbl FROM e JOIN reach r ON r.doc = e.y),
             lab AS (SELECT doc, min(lbl) AS root FROM reach GROUP BY doc),
             siz AS (SELECT root, count(*) AS n FROM lab GROUP BY root)
        SELECT lab.doc AS doc_id, lab.root AS cluster_root,
               siz.n AS cluster_size, lab.doc = lab.root AS is_kept
        FROM lab JOIN siz ON lab.root = siz.root
        ORDER BY doc_id"""),
      (s, dir) =>
        // delegates to the user-callable operator (round-5 lift): the loop
        // shuffle width is derived from the pair count inside clusters()
        // (≤ 2 vertices per verified pair — a tiny fraction of the corpus),
        // and the count is a cheap action on the already-persisted pair
        // cache this gate shares with d03/s05.
        graft.operators.NearDup.clusters(jaccardPairs(s, dir), tau = 0.6)
          .orderBy(col("doc_id")),
      prepare = materializePairs),

    // ----- benchmark decontamination (n-gram overlap vs an eval set) -----
    // The pretraining decontamination step: flag corpus documents sharing
    // any word-3-gram with a (small) held-out benchmark set. The eval
    // shingle vocabulary broadcasts — the corpus side is one narrow
    // explode + broadcast hash join + hash-agg, linear in corpus size and
    // never joined corpus×corpus. Here the "benchmark" is doc_id < 10.
    QuerySpec(
      "d07_contamination",
      Some(s"""
        WITH $sgCte,
             ev AS (SELECT DISTINCT unnest(g) AS sh FROM sg WHERE doc_id < 10),
             ds AS (SELECT doc_id, unnest(g) AS sh FROM sg WHERE doc_id >= 10)
        SELECT ds.doc_id, count(DISTINCT ds.sh) AS n_shared
        FROM ds JOIN ev ON ds.sh = ev.sh
        GROUP BY ds.doc_id
        ORDER BY ds.doc_id"""),
      (s, dir) => {
        val sg = docShingles(s, dir)
        // the eval vocabulary is small only by assumption — guard the
        // broadcast like every other derived-small-side in this repo
        val ev = graft.operators.AllPairsTopK.requireBroadcastable(
          sg.filter(col("doc_id") < 10)
            .select(explode(col("g")).as("sh")).distinct(),
          what = "d07 eval-set shingle vocabulary",
          route = "shuffle-join the vocabularies (equi-join on sh) for benchmark sets past broadcast size")
        val ds = sg.filter(col("doc_id") >= 10)
          .select(col("doc_id"), explode(col("g")).as("sh"))
        ds.join(broadcast(ev), "sh")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("sh")).as("n_shared"))
          .orderBy(col("doc_id"))
      }),

    // ----- deterministic stratified sampling (corpus mixture control) -----
    // The domain-mixing op of a training-data pipeline: downsample each
    // source to a target rate with a DETERMINISTIC hash bucket per doc
    // (md5 — identical bytes in both engines), so the sample is
    // reproducible run-to-run and machine-to-machine, unlike rand()-based
    // sampling. Narrow scan + one hash-agg; the kept-id checksum
    // value-checks the exact membership, not just the counts.
    QuerySpec(
      "d06_stratified_sample",
      Some("""
        WITH s AS (SELECT source, doc_id,
                          CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4)) AS BIGINT) % 100 AS bucket,
                          CASE source WHEN 'src0' THEN 10 WHEN 'src1' THEN 50 ELSE 90 END AS rate
                   FROM documents)
        SELECT source, count(*) AS n_total,
               CAST(count(*) FILTER (bucket < rate) AS BIGINT) AS n_kept,
               CAST(coalesce(sum(doc_id) FILTER (bucket < rate), 0) AS BIGINT) AS kept_id_sum
        FROM s
        GROUP BY source
        ORDER BY source"""),
      (s, dir) => {
        val rate = when(col("source") === "src0", 10)
          .when(col("source") === "src1", 50).otherwise(90)
        Tables.t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            (hashBucket100(col("doc_id")) < rate).as("kept"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_total"),
            count(when(col("kept"), 1)).as("n_kept"),
            coalesce(sum(when(col("kept"), col("doc_id"))), lit(0L)).as("kept_id_sum"))
          .orderBy(col("source"))
      }),

    // ----- EXACT n-gram Jaccard similarity join (AllPairs prefix filter) -----
    // The third candidate-generation discipline alongside MinHash bands
    // (d03) and SimHash bands (d08) — and unlike those, EXACT by
    // construction: prefix filtering (Bayardo et al. "Scaling Up All
    // Pairs", Xiao et al. PPJoin) guarantees every pair with Jaccard ≥ τ
    // is generated. Each document keeps only the first
    // |A| − ⌈τ·|A|⌉ + 1 of its shingles under a global rarity order
    // (document frequency asc, shingle asc): if two sets shared no prefix
    // element, their intersection would fit inside the suffix,
    // |A∩B| ≤ ⌈τ|A|⌉ − 1 < τ|A| ≤ τ|A∪B| — contradiction. Candidates are
    // an equi-join on PREFIX shingles only (rare tokens → small posting
    // lists → no hot keys), then exact Jaccard verifies on the full sets.
    // Sets are carried as 60-bit md5-prefix hashes, not strings: the
    // postings/window/join keys are fixed-width longs and the verify
    // intersects long arrays (~2.5× narrower rows, no per-element string
    // hashing). BOTH engines hash with the same md5 prefix, so even a
    // collision collapses identically on both sides — the compare stays
    // exact unconditionally. The oracle deliberately uses the NAIVE
    // inverted index (all shared shingles) — if the prefix filter dropped
    // a qualifying pair, the hash compare would fail. τ = 0.5.
    QuerySpec(
      "d09_ngram_jaccard",
      Some(s"""
        WITH $sgCte,
             sgh AS (SELECT doc_id,
                            list_distinct(list_transform(g,
                              x -> CAST(('0x'||substr(md5(x),1,15)) AS BIGINT))) AS gh
                     FROM sg),
             post AS (SELECT doc_id, unnest(gh) AS h FROM sgh),
             cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM post a JOIN post b
                        ON a.h = b.h AND a.doc_id < b.doc_id),
             jp AS (SELECT doc_a, doc_b,
                           CAST(len(list_intersect(ga.gh, gb.gh)) AS DOUBLE)
                             / (len(ga.gh) + len(gb.gh) - len(list_intersect(ga.gh, gb.gh))) AS jaccard
                    FROM cand
                    JOIN sgh ga ON ga.doc_id = doc_a
                    JOIN sgh gb ON gb.doc_id = doc_b)
        SELECT doc_a, doc_b, jaccard FROM jp
        WHERE jaccard >= 0.5
        ORDER BY doc_a, doc_b"""),
      (s, dir) =>
        jaccardSimilarityJoin(docShingles(s, dir), tau = 0.5)
          .orderBy(col("doc_a"), col("doc_b"))),

    // ----- embedding-cosine near-dup (the vector-space dedup family member) -----
    // The synthetic embeddings are near-orthogonal (max pairwise cosine
    // ~0.51), so the near-dup population is CONSTRUCTED deterministically:
    // every 5th vector gets a variant (vec_id + 1,000,000) with ~1/4 of
    // its dimensions halved, the dims chosen by md5(vec_id:pos). Halving a
    // float is EXACT in both float32 and float64 arithmetic (exponent
    // decrement, no mantissa rounding), so Spark's float path and DuckDB's
    // double path see bit-identical values — and halving preserves SIGN,
    // so a variant lands in the same sign-LSH bucket as its source in
    // every band: the banded candidate generation provably reaches recall
    // 1.0 on the true pairs. Candidates = same (band, bucket) equi-join
    // over 4 bands × 8 sign bits (dims 1–32; P[collision] = 1/256 per band
    // for random vectors — the quadratic term is damped 256×), then exact
    // cosine ≥ 0.9 verifies via the codegen'd float_dot. The oracle replays
    // the same derivation, banding, and verify in SQL — a dropped true
    // pair or a phantom candidate fails the hash.
    QuerySpec(
      "d10_embedding_neardup",
      Some(s"""
        WITH $variantCorpusCte,
             bands AS (SELECT vec_id, b.band AS band,
                              list_sum([CASE WHEN embedding[b.band*8 + k + 1] > 0
                                             THEN CAST(2**k AS BIGINT) ELSE 0 END
                                        for k in generate_series(0, 7)]) AS bucket
                       FROM corpus, (SELECT unnest(generate_series(0, 3)) AS band) b),
             cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                      FROM bands a JOIN bands b
                        ON a.band = b.band AND a.bucket = b.bucket
                       AND a.vec_id < b.vec_id),
             n AS (SELECT vec_id, embedding,
                          ${SimilarityOps.normSql("embedding")} AS nrm
                   FROM corpus),
             scored AS (SELECT vec_a, vec_b,
                               ${SimilarityOps.dotSql("na.embedding", "nb.embedding")}
                                 /(na.nrm*nb.nrm) AS c
                        FROM cand JOIN n na ON na.vec_id = vec_a
                                  JOIN n nb ON nb.vec_id = vec_b)
        SELECT vec_a, vec_b, round(c, 9) AS cos
        FROM scored WHERE c >= 0.9
        ORDER BY vec_a, vec_b"""),
      (s, dir) => {
        import graft.functions.VectorFunctions.floatDot
        val corpus = variantCorpus(s, dir)
        def bandBucket(e: Column, band: Int): Column =
          (0 until 8).map { k =>
            when(element_at(e, band * 8 + k + 1) > 0f, lit(1L << k)).otherwise(lit(0L))
          }.reduce(_ + _)
        val bands = corpus.select(col("vec_id"),
          posexplode(array((0 until 4).map(j => bandBucket(col("embedding"), j)): _*))
            .as(Seq("band", "bucket")))
        val cand = bands.join(
            bands.select(col("vec_id").as("vec_b"), col("band").as("band_b"),
              col("bucket").as("bucket_b")),
            col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
              col("vec_id") < col("vec_b"))
          .select(col("vec_id").as("vec_a"), col("vec_b")).distinct()
        val n = corpus.select(col("vec_id"), col("embedding"),
          sqrt(floatDot(col("embedding"), col("embedding"))).as("nrm"))
        val cos = floatDot(col("ea"), col("eb")) / (col("na") * col("nb"))
        cand
          .join(n.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na")), "vec_a")
          .join(n.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb")), "vec_b")
          .filter(cos >= 0.9)
          .select(col("vec_a"), col("vec_b"), round(cos, 9).as("cos"))
          .orderBy(col("vec_a"), col("vec_b"))
      }),

    // ----- SemDeDup: semantic dedup via IVF-cell clustering -----
    // The embedding-space analogue of d03's LSH banding, following the
    // SemDeDup recipe (Abbas et al.): cluster the corpus into semantic
    // cells (nearest-centroid cosine assignment — exactly s04's IVF
    // codebook), then prune near-duplicates WITHIN each cell with the
    // min-id-keeper rule. Candidates are bounded by cell occupancy —
    // Θ(Σ n_c²) with `cells` the scale dial — never all-pairs. The
    // constructed d10 variant population provides the true near-dups;
    // the recall floor (fraction of variants caught despite the cell
    // boundary cutting some source/variant pairs apart) is computed in
    // both engines and PINNED ≥0.5 in the oracle: a cell-assignment or
    // pruning regression fails the hash even though the operator is
    // approximate by design (measured: 0.80 at sf0.01, 0.775 at sf0.1).
    QuerySpec(
      "d13_semantic_dedup",
      Some(s"""
        WITH $variantCorpusCte,
             n AS (SELECT vec_id, embedding, ${SimilarityOps.normSql("embedding")} AS nrm
                   FROM corpus),
             cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                      FROM n WHERE vec_id < 16),
             scored AS (SELECT v.vec_id, c.cent_id,
                               row_number() OVER (PARTITION BY v.vec_id
                                                  ORDER BY ${SimilarityOps.dotSql("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC,
                                                           c.cent_id ASC) AS crank
                        FROM n v JOIN cent c ON true),
             assign AS (SELECT vec_id, cent_id AS cell FROM scored WHERE crank = 1),
             pr AS (SELECT b.vec_id, a.cell, a.vec_id AS keeper_cand,
                           ${SimilarityOps.dotSql("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS pcos
                    FROM assign a
                    JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
                    JOIN n na ON na.vec_id = a.vec_id
                    JOIN n nb ON nb.vec_id = b.vec_id),
             victims AS (SELECT vec_id, cell,
                                CAST(min(keeper_cand) AS BIGINT) AS keeper_id,
                                min_by(pcos, keeper_cand) AS vcos
                         FROM pr WHERE pcos >= 0.9
                         GROUP BY vec_id, cell)
        SELECT v.vec_id, v.cell, v.keeper_id, round(v.vcos, 9) AS cos,
               (SELECT CAST(count(*) AS BIGINT) FROM var) AS n_variants,
               (SELECT CAST(count(*) AS BIGINT) FROM victims WHERE vec_id >= 1000000) AS n_var_victims,
               true AS recall_ok
        FROM victims v
        ORDER BY v.vec_id"""),
      (s, dir) => {
        val corpus = variantCorpus(s, dir)
        val victims = graft.operators.NearDup.semanticVictims(corpus, tau = 0.9, cells = 16)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // run-once gate: two branches below
        val nVar = corpus.filter(col("vec_id") >= 1000000L)
          .agg(count(lit(1)).as("n_variants"))
        val nVict = victims.filter(col("vec_id") >= 1000000L)
          .agg(count(lit(1)).as("n_var_victims"))
        victims.crossJoin(broadcast(nVar)).crossJoin(broadcast(nVict))
          .select(col("vec_id"), col("cell"), col("keeper_id"), col("cos"),
            col("n_variants"), col("n_var_victims"),
            // pinned true in the oracle: recall collapse fails the hash
            (col("n_var_victims").cast("double") / col("n_variants") >= 0.5).as("recall_ok"))
          .orderBy(col("vec_id"))
      }),

    // ----- the composed fuzzy-dedup funnel (Dolma/RedPajama shape) -----
    // d03 verifies pairs, d05 clusters them; this gate runs the WHOLE
    // near-dup pipeline through the one user-callable composition
    // (Pipeline.nearDupFunnel): shingle → MinHash-LSH candidates →
    // exact-Jaccard verify → min-label clusters → min-id keepers, with
    // per-source funnel counts and a survivor-id checksum — the
    // t13-for-near-dup. The oracle replays every stage (the shared
    // pairsCte + d05's recursive components) so a drift anywhere in the
    // composed pipeline fails the hash. Corpus-sized work is only the
    // banded candidate generation (one persisted pass feeding both the
    // pair filter and the clustering loop — the operator's release
    // hook); the funnel itself is narrow id joins + one hash-agg.
    QuerySpec(
      "d14_neardup_funnel",
      Some(s"""
        WITH RECURSIVE $pairsCte,
             p AS (SELECT doc_a, doc_b FROM jp WHERE jaccard >= 0.6),
             e AS (SELECT doc_a AS x, doc_b AS y FROM p
                   UNION ALL SELECT doc_b, doc_a FROM p),
             reach(doc, lbl) AS (
               SELECT x, x FROM e
               UNION
               SELECT e.x, r.lbl FROM e JOIN reach r ON r.doc = e.y),
             lab AS (SELECT doc, min(lbl) AS root FROM reach GROUP BY doc),
             drops AS (SELECT doc FROM lab WHERE doc != root),
             inpair AS (SELECT DISTINCT x AS doc FROM e)
        SELECT d.source,
               count(*) AS n_docs,
               CAST(count(*) FILTER (d.doc_id IN (SELECT doc FROM inpair)) AS BIGINT) AS n_in_pairs,
               CAST(count(*) FILTER (d.doc_id IN (SELECT doc FROM drops)) AS BIGINT) AS n_dropped,
               CAST(count(*) FILTER (d.doc_id NOT IN (SELECT doc FROM drops)) AS BIGINT) AS n_kept,
               CAST(sum(d.doc_id) FILTER (d.doc_id NOT IN (SELECT doc FROM drops)) AS BIGINT) AS keep_id_sum
        FROM documents d
        GROUP BY d.source
        ORDER BY d.source"""),
      (s, dir) => {
        val (funnel, _) = Pipeline.nearDupFunnel(
          Tables.t(s, dir, "documents"), tau = 0.6)
        funnel.orderBy(col("source")) // gate leaves the cache (run-once)
      }),

    // ----- bloom-filter decontamination (the no-join membership path) -----
    // d07 decontaminates by JOINING corpus shingles to the eval
    // vocabulary; at fleet scale the filter is often shipped instead of
    // the set — a serialized bloom sketch is a few hundred KB regardless
    // of corpus size and needs no shuffle on the probe side at all. This
    // row builds Spark's own runtime-filter sketch (BloomFilterAggregate,
    // exposed via graft's bloom_filter_agg) over the eval 3-gram
    // vocabulary and probes every corpus shingle with bloom_might_contain:
    // one aggregate producing ONE row, then a scan-stage predicate.
    // Correctness contract, all deterministic (the bitset is an OR — no
    // order dependence; xxhash64 is seed-fixed): a bloom filter has NO
    // false negatives, so recall_ok (every exactly-contaminated doc is
    // bloom-flagged) is provably true; fp_ok pins the measured
    // false-positive docs under 1% of the corpus + 1 (sized 2^20 bits for
    // ~2.5k keys → per-probe fp is ~0). The oracle recomputes the EXACT
    // side in SQL and pins the two booleans — a bloom miss, a broken
    // merge, or an fp blow-up all fail the hash.
    QuerySpec(
      "d11_bloom_decontaminate",
      Some(s"""
        WITH $sgCte,
             ev AS (SELECT DISTINCT unnest(g) AS sh FROM sg WHERE doc_id < 10),
             ex AS (SELECT DISTINCT sg.doc_id
                    FROM (SELECT doc_id, unnest(g) AS sh FROM sg WHERE doc_id >= 10) sg
                    JOIN ev ON sg.sh = ev.sh)
        SELECT d.source, count(*) AS n_docs,
               CAST(count(*) FILTER (d.doc_id IN (SELECT doc_id FROM ex)) AS BIGINT) AS n_exact,
               true AS recall_ok, true AS fp_ok
        FROM documents d WHERE d.doc_id >= 10
        GROUP BY d.source
        ORDER BY d.source"""),
      (s, dir) => {
        // analysis requires the bloom side of might_contain to be foldable
        // or a scalar subquery — the sketch rides the plan as a
        // non-correlated scalar subquery (built once, ~128 KB, shipped to
        // every probe task like Spark's own runtime filters)
        graft.GraftFunctions.register(s)
        val sg = docShingles(s, dir)
        sg.filter(col("doc_id") < 10)
          .select(explode(col("g")).as("sh")).distinct()
          .createOrReplaceTempView("d11_ev")
        // repartition before the explode: the toy corpus is one row group
        // (single task otherwise); at 100 TB file count gives this free
        sg.filter(col("doc_id") >= 10)
          .repartition(col("doc_id"))
          .select(col("doc_id"), explode(col("g")).as("sh"))
          .createOrReplaceTempView("d11_corpus")
        Tables.t(s, dir, "documents").filter(col("doc_id") >= 10)
          .select(col("source"), col("doc_id"))
          .createOrReplaceTempView("d11_docs")
        s.sql("""
          WITH perdoc AS (
            SELECT c.doc_id,
                   max(bloom_might_contain(
                     (SELECT bloom_filter_agg(sh, 4096, 1048576) FROM d11_ev),
                     c.sh)) AS bloom_hit,
                   max(e.sh IS NOT NULL) AS exact_hit
            FROM d11_corpus c LEFT JOIN d11_ev e ON c.sh = e.sh
            GROUP BY c.doc_id)
          SELECT d.source,
                 count(*) AS n_docs,
                 count(IF(p.exact_hit, 1, NULL)) AS n_exact,
                 count(IF(p.exact_hit AND NOT p.bloom_hit, 1, NULL)) = 0 AS recall_ok,
                 count(IF(p.bloom_hit AND NOT p.exact_hit, 1, NULL)) <= count(*) div 100 + 1 AS fp_ok
          FROM d11_docs d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
          GROUP BY d.source
          ORDER BY d.source""")
      }),

    // ----- contamination fraction (the graded decontamination rule) -----
    // d07/d11 flag membership; real decontamination policies GRADE the
    // overlap (the Llama-style rule: drop when the fraction of a doc's
    // n-grams seen in the eval set crosses a threshold). Counts are exact
    // integers with one final division; the threshold compare runs on
    // identical IEEE ops in both engines, so the per-doc flag is
    // VALUE-checked, not pinned. tau = 0.05 flags ~11% of the corpus at
    // sf0.01 — a live decision boundary, not a degenerate one.
    QuerySpec(
      "d15_contamination_fraction",
      Some(s"""
        WITH $sgCte,
             ev AS (SELECT DISTINCT unnest(g) AS sh FROM sg WHERE doc_id < 10),
             c AS (SELECT doc_id, unnest(g) AS sh FROM sg WHERE doc_id >= 10),
             pd AS (SELECT c.doc_id, count(*) AS n_shingles, count(ev.sh) AS n_hit
                    FROM c LEFT JOIN ev ON c.sh = ev.sh
                    GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(pd.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(coalesce(pd.n_hit, 0) AS BIGINT) AS n_hit,
               CASE WHEN coalesce(pd.n_shingles, 0) = 0 THEN 0.0
                    ELSE round(CAST(pd.n_hit AS DOUBLE) / pd.n_shingles, 9) END AS overlap_frac,
               coalesce(pd.n_shingles, 0) > 0
                 AND CAST(pd.n_hit AS DOUBLE) >= 0.05 * pd.n_shingles AS contaminated
        FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
        WHERE d.doc_id >= 10
        ORDER BY d.doc_id"""),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        graft.operators.NearDup.contaminationFraction(
            docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
            tau = 0.05)
          .orderBy(col("doc_id"))
      }),

    // ----- incremental dedup against history (the snapshot-ingest shape) -----
    // Production corpora dedup each NEW crawl snapshot against everything
    // already kept — history always wins, and the cost must scale with
    // the new batch, not the archive. The operator joins only new×history
    // minhash bands (never new×new, never history×history). History =
    // even doc_ids, new batch = odd; the oracle derives the same flags
    // from the full pairsCte restricted to cross-parity pairs (band
    // candidates within a partition pair equal the full-corpus candidates
    // restricted to it — same argument as d16's subset restriction).
    QuerySpec(
      "d17_incremental_dedup",
      Some(s"""
        WITH $pairsCte,
             x AS (SELECT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS new_id,
                          CASE WHEN doc_a % 2 = 1 THEN doc_b ELSE doc_a END AS hist_id,
                          jaccard
                   FROM jp
                   WHERE jaccard >= 0.6 AND (doc_a % 2) != (doc_b % 2))
        SELECT new_id AS doc_id,
               CAST(min(hist_id) AS BIGINT) AS hist_id,
               round(min_by(jaccard, hist_id), 9) AS jaccard
        FROM x
        GROUP BY new_id
        ORDER BY doc_id"""),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val (_, flagged, _) = graft.operators.NearDup.dedupAgainstHistory(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), tau = 0.6)
        flagged.orderBy(col("doc_id"))
      }),

    // ----- incremental dedup served from the MATERIALIZED band index -----
    // d17's production shape: the archive's minhash bands + shingle sets
    // are laid out ONCE (NearDup.buildBandIndex, untimed prepare — the
    // s12/s14 index discipline), and each snapshot probes the layout with
    // its own band keys pushed into the scan as In(bkey, …) — per-batch
    // cost is O(new batch + candidates), never an archive re-scan. Same
    // oracle as d17: served flags must be row-for-row the inline path's.
    QuerySpec(
      "d21_incremental_dedup_indexed",
      Some(s"""
        WITH $pairsCte,
             x AS (SELECT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS new_id,
                          CASE WHEN doc_a % 2 = 1 THEN doc_b ELSE doc_a END AS hist_id,
                          jaccard
                   FROM jp
                   WHERE jaccard >= 0.6 AND (doc_a % 2) != (doc_b % 2))
        SELECT new_id AS doc_id,
               CAST(min(hist_id) AS BIGINT) AS hist_id,
               round(min_by(jaccard, hist_id), 9) AS jaccard
        FROM x
        GROUP BY new_id
        ORDER BY doc_id"""),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        // gate dial: the sf0.1 batch (~2.5k docs × 4 seeds) carries ~10k
        // distinct band keys — above the production default's In-list
        // cap, below this gate's (the gate exists to pin the pushdown
        // MECHANISM; the cap-overflow fallback identity is spec-proven
        // in NearDupIndexSpec)
        val (_, flagged, _) = graft.operators.NearDup.dedupAgainstHistoryIndexed(
          s, bandIndex(s, dir), docs.filter(col("doc_id") % 2 === 1), tau = 0.6,
          maxPushdownKeys = 65536)
        val out = flagged.orderBy(col("doc_id"))
        // the batch's band keys must prune at the SCAN, not post-read
        // (asserted before any caller persist — the s14 lesson): find the
        // bands-layout scan and pin its pushed In(bkey, …) filter
        val pushed = out.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.metadata.getOrElse("Location", "").contains("bands") =>
            f.metadata.getOrElse("PushedFilters", "")
        }
        require(pushed.nonEmpty && pushed.forall(_.contains("In(bkey")),
          s"indexed dedup must push batch band keys into the bands scan, got: $pushed")
        out
      },
      prepare = Some((s, dir) => { bandIndex(s, dir); () })),

    // ----- the end-to-end pretraining pipeline (the marquee composition) -----
    // Every stage above, composed the way a real corpus build runs them
    // and value-checked as ONE derivation: near-dup dedup (d03/d05, over
    // the corpus partition only — LSH candidates within a subset equal
    // the full-corpus candidates restricted to it, so the oracle filters
    // pairsCte) → graded decontamination (d15's τ·n rule vs the eval
    // partition) → CCNet LM filter (t15, the bigram model trained on the
    // SURVIVING set — the oracle's lmScoreCteFor('s2')). Per-source
    // stage counts and the survivor checksum are all value-checked; any
    // stage drifting, reordering, or leaking dropped docs into a later
    // model fails the hash.
    QuerySpec(
      "d16_training_pipeline",
      Some(s"""
        WITH RECURSIVE $pairsCte,
             p AS (SELECT doc_a, doc_b FROM jp
                   WHERE jaccard >= 0.6 AND doc_a >= 10 AND doc_b >= 10),
             e AS (SELECT doc_a AS x, doc_b AS y FROM p
                   UNION ALL SELECT doc_b, doc_a FROM p),
             reach(doc, lbl) AS (
               SELECT x, x FROM e
               UNION
               SELECT e.x, r.lbl FROM e JOIN reach r ON r.doc = e.y),
             lab AS (SELECT doc, min(lbl) AS root FROM reach GROUP BY doc),
             drops AS (SELECT doc FROM lab WHERE doc != root),
             s1 AS (SELECT d.doc_id, d.text, d.source FROM documents d
                    WHERE d.doc_id >= 10
                      AND d.doc_id NOT IN (SELECT doc FROM drops)),
             ev AS (SELECT DISTINCT unnest(g) AS sh FROM sg WHERE doc_id < 10),
             cf AS (SELECT c.doc_id, count(*) AS n_sh, count(ev.sh) AS n_hit
                    FROM (SELECT sg.doc_id, unnest(sg.g) AS sh FROM sg
                          JOIN s1 ON s1.doc_id = sg.doc_id) c
                    LEFT JOIN ev ON c.sh = ev.sh
                    GROUP BY 1),
             s2 AS (SELECT s1.* FROM s1 LEFT JOIN cf ON cf.doc_id = s1.doc_id
                    WHERE cf.doc_id IS NULL
                       OR CAST(cf.n_hit AS DOUBLE) < 0.05 * cf.n_sh),
             ${graft.queries.TextOps.lmScoreCteFor("s2")},
             b AS (SELECT s2.source, sc.doc_id,
                          ntile(4) OVER (PARTITION BY s2.source
                                         ORDER BY sc.avg_freq DESC, sc.doc_id) AS bucket
                   FROM sc JOIN s2 ON s2.doc_id = sc.doc_id),
             s3 AS (SELECT doc_id FROM b WHERE bucket <= 3)
        SELECT d.source,
               count(*) AS n_docs,
               CAST(count(*) FILTER (d.doc_id IN (SELECT doc_id FROM s1)) AS BIGINT) AS n_after_neardup,
               CAST(count(*) FILTER (d.doc_id IN (SELECT doc_id FROM s2)) AS BIGINT) AS n_after_decontam,
               CAST(count(*) FILTER (d.doc_id IN (SELECT doc_id FROM s3)) AS BIGINT) AS n_after_lm,
               CAST(sum(d.doc_id) FILTER (d.doc_id IN (SELECT doc_id FROM s3)) AS BIGINT) AS kept_id_sum
        FROM documents d
        WHERE d.doc_id >= 10
        GROUP BY d.source
        ORDER BY d.source"""),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val (_, funnel, _) = Pipeline.pretrainingPipeline(
          docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10))
        funnel.orderBy(col("source")) // gate leaves the caches (run-once)
      }),

    // ----- temperature-weighted corpus mixing (the sampling schedule) -----
    // The pretraining mixture step d06 samples FROM: given per-source doc
    // counts, allocate a fixed budget proportionally to n^α (α = 0.5 —
    // sqrt damping upweights small sources, the standard multilingual/
    // multi-domain temperature trick) with EXACT integer largest-remainder
    // rounding, so the allocations sum to the budget precisely and every
    // engine computes the identical schedule. Determinism: sqrt is an
    // IEEE-exact basic op (unlike ln/pow), weights quantize through
    // floor(·×10^6) into BIGINTs, and everything after is integer
    // arithmetic + a total-order tiebreak. The corpus-sized work is one
    // hash-agg; the allocation itself runs on the per-source frame
    // (source cardinality is bounded — double-digit even at 100 TB), so
    // the single-partition windows over it are free.
    QuerySpec(
      "d12_temperature_mixing",
      Some("""
        WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
             w AS (SELECT source, n_docs,
                          CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS wt
                   FROM c),
             a AS (SELECT source, n_docs, wt,
                          (1000000 * wt) // sum(wt) OVER () AS base,
                          (1000000 * wt) % sum(wt) OVER () AS rem
                   FROM w),
             r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
                          1000000 - sum(base) OVER () AS leftover
                   FROM a)
        SELECT source, n_docs, wt,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM r
        ORDER BY source"""),
      (s, dir) =>
        temperatureAllocation(
          Tables.t(s, dir, "documents")
            .groupBy(col("source")).agg(count(lit(1)).as("n_docs")),
          budget = 1000000L)
          .orderBy(col("source"))),

    // ----- EXACT-substring (passage-level) dedup, any alignment -----
    // Lee et al. 2022's dedup granularity: 64-char sliding windows at
    // EVERY position. t11's aligned 16-word segments miss an offset
    // copy; this catches a duplicated passage wherever it starts. The
    // Spark side routes candidates through 8-byte scan-stage rolling
    // hashes (shuffle carries hash+id, never window text) and verifies
    // on the re-extracted TEXT, so hash collisions cannot change the
    // answer; the oracle recomputes the whole thing from substr/text
    // equality alone — if the hash routing dropped or invented a
    // candidate, a per-doc count would drift. dup_frac is ONE double
    // division of two exact integers.
    QuerySpec(
      "d18_substring_dedup",
      Some("""
        WITH e AS (SELECT doc_id, text FROM documents WHERE length(text) >= 64),
             w AS (SELECT doc_id, u.i AS pos, substr(text, u.i, 64) AS wt
                   FROM e, unnest(generate_series(1, length(text) - 63)) AS u(i)),
             d AS (SELECT wt FROM w GROUP BY wt HAVING count(DISTINCT doc_id) >= 2),
             m AS (SELECT w.doc_id, CASE WHEN d.wt IS NULL THEN 0 ELSE 1 END AS isd
                   FROM w LEFT JOIN d ON w.wt = d.wt)
        SELECT doc_id,
               count(*) AS n_windows,
               CAST(sum(isd) AS BIGINT) AS n_dup,
               CAST(sum(isd) AS DOUBLE) / count(*) AS dup_frac
        FROM m GROUP BY doc_id ORDER BY doc_id"""),
      (s, dir) => {
        val out = graft.operators.NearDup
          .substringStatsFrom(substringMemo(s, dir))
          .withColumn("dup_frac", col("n_dup").cast("double") / col("n_windows"))
          .orderBy(col("doc_id"))
          .persist()
        // the duplicated-passage population must be non-empty and proper
        // (some docs clean, some contaminated) or the verify layer and
        // the per-doc split prove nothing
        val chk = out.agg(
          sum(col("n_dup")).as("nd"),
          count(when(col("n_dup") > 0, 1)).as("docs_dup"),
          count(when(col("n_dup") === 0, 1)).as("docs_clean")).head()
        require(chk.getLong(0) > 0 && chk.getLong(1) > 0 && chk.getLong(2) > 0,
          s"degenerate substring-dup population: $chk")
        out
      }),

    // ----- MAXIMAL duplicated spans (suffix-window merge of d18) -----
    // Lee et al. 2022 remove *maximal* duplicated substrings ≥ w, not
    // fixed windows: adjacent/overlapping dup windows in one doc
    // coalesce into a span (gaps-and-islands over the verified dup
    // positions — per-doc window state, never corpus-shaped). The gate
    // reports per-doc span stats; the oracle recomputes the windows,
    // the dup decision, AND the island merge from substr/text equality
    // alone, so a span boundary off by one character breaks the hash.
    // Shares d18's memoized window state — the expensive rolling-hash
    // pass runs once for both.
    QuerySpec(
      "d19_substring_spans",
      Some("""
        WITH e AS (SELECT doc_id, text FROM documents WHERE length(text) >= 64),
             w AS (SELECT doc_id, u.i AS pos, substr(text, u.i, 64) AS wt
                   FROM e, unnest(generate_series(1, length(text) - 63)) AS u(i)),
             d AS (SELECT wt FROM w GROUP BY wt HAVING count(DISTINCT doc_id) >= 2),
             p AS (SELECT w.doc_id, w.pos FROM w JOIN d ON w.wt = d.wt),
             g AS (SELECT doc_id, pos,
                          CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 64
                               THEN 1 ELSE 0 END AS brk
                   FROM p),
             i AS (SELECT doc_id, pos,
                          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
                   FROM g),
             sp AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 63 AS span_end
                    FROM i GROUP BY doc_id, span_id)
        SELECT doc_id,
               count(*) AS n_spans,
               CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_chars,
               CAST(max(span_end - span_start + 1) AS BIGINT) AS max_span_chars
        FROM sp GROUP BY doc_id ORDER BY doc_id"""),
      (s, dir) =>
        graft.operators.NearDup
          .substringSpansFrom(substringMemo(s, dir), w = substringW)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(col("span_chars")).as("dup_chars"),
            max(col("span_chars")).as("max_span_chars"))
          .orderBy(col("doc_id"))),

    // ----- deterministic global corpus shuffle + re-shard -----
    // The pretraining step AFTER cleaning/dedup: the corpus must be
    // globally shuffled into training shards, and the permutation must
    // be DETERMINISTIC (seeded) so a restarted run re-reads the same
    // order and a changed corpus re-shuffles reproducibly. Key = 48-bit
    // md5 prefix of (doc_id, seed) — a cross-engine-recomputable
    // pseudorandom draw (the d06 discipline); shard = key mod nShards
    // (content-addressed, balanced in expectation); within-shard order =
    // (key, doc_id). The plan is ONE exchange on the shard id plus a
    // within-shard sort — exactly the distributed-shuffle shape that
    // scales: at 100 TB, nShards grows with corpus/target-shard-size and
    // the sort never leaves the shard's partition. The oracle recomputes
    // the permutation INCLUDING order: sum(pos * doc_id) is
    // order-sensitive, so a single transposed pair anywhere in any
    // shard breaks the hash; head_doc pins each shard's first row.
    QuerySpec(
      "d20_corpus_shuffle",
      Some("""
        WITH k AS (SELECT doc_id,
                          CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'s8'),1,12)) AS BIGINT) AS k
                   FROM documents),
             s AS (SELECT doc_id, k, k % 8 AS shard,
                          CAST(row_number() OVER (PARTITION BY k % 8 ORDER BY k, doc_id) AS BIGINT) AS pos
                   FROM k)
        SELECT shard, count(*) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               CAST(max(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS head_doc,
               CAST(sum(pos * doc_id) AS BIGINT) AS order_check
        FROM s GROUP BY shard ORDER BY shard"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val key = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit("s8"))), 1, 12), 16, 10)
          .cast("long")
        val byShard = Window.partitionBy(col("shard"))
          .orderBy(col("k"), col("doc_id"))
        Tables.t(s, dir, "documents").select(col("doc_id"))
          .withColumn("k", key)
          .withColumn("shard", (col("k") % 8).cast("long"))
          .withColumn("pos", row_number().over(byShard).cast("long"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_sum"),
            max(when(col("pos") === 1, col("doc_id"))).as("head_doc"),
            sum(col("pos") * col("doc_id")).as("order_check"))
          .orderBy(col("shard"))
      })
  )

  /** d12's allocation engine, separated so MixingSpec can fuzz it: split
    * `budget` across the (source, n_docs) rows proportionally to
    * sqrt(n_docs), exact largest-remainder rounding (allocations sum to
    * the budget precisely; each is the floor or ceiling of its exact
    * rational share). All integer arithmetic after the sqrt quantization;
    * runs on the bounded per-source frame. */
  private[queries] def temperatureAllocation(counts: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val whole = Window.partitionBy()
    counts
      .withColumn("wt", floor(sqrt(col("n_docs")) * 1000000).cast("long"))
      .withColumn("w_total", sum(col("wt")).over(whole))
      .withColumn("base", expr(s"($budget * wt) div w_total"))
      .withColumn("rem", expr(s"($budget * wt) % w_total"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(whole))
      .select(col("source"), col("n_docs"), col("wt"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L)).as("alloc"))
  }

  /** Prefix-filtered EXACT Jaccard similarity self-join (d09's engine).
    *
    * The element sets are re-keyed to 60-bit md5-prefix hashes up front:
    * every downstream stage (document-frequency agg, prefix window,
    * candidate equi-join, verify intersect) then works on fixed-width
    * longs instead of ~20-char strings — narrower shuffles and no
    * per-element string hashing in the hot verify loop. The hashed set
    * table is tiny (one row per doc) and feeds FOUR plan branches, so it
    * is persisted: one scan + one shingle pass instead of four.
    *
    * @param sg  (doc_id, g) rows, g = the distinct element set (array)
    * @param tau Jaccard threshold; keep τ a dyadic rational (k/2^m) so
    *            ⌈τ·sz⌉ computed through doubles is the mathematical
    *            ceiling for every set size
    * @return (doc_a, doc_b, jaccard), doc_a < doc_b, jaccard ≥ τ over the
    *         hashed sets — provably ALL such pairs (prefix filtering
    *         loses none) */
  private[queries] def jaccardSimilarityJoin(sg: DataFrame, tau: Double): DataFrame =
    jaccardSimilarityJoinReleasable(sg, tau)._1

  /** As [[jaccardSimilarityJoin]], plus a release hook that unpersists
    * the intermediate hashed-sets cache: the run-once gate never needs
    * it, but a long-lived session calling the join repeatedly (the
    * Pipeline facade's use case) must release each call's cache after
    * materializing the result or dead entries accumulate. */
  private[queries] def jaccardSimilarityJoinReleasable(
      sg: DataFrame, tau: Double): (DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    // repartition before the per-shingle md5/conv projection: the toy
    // corpus is one parquet row group, so without the exchange the whole
    // hashing pass (and the persisted partitioning every downstream branch
    // inherits) would run in a single task — at 100 TB the file count
    // provides this parallelism for free and the exchange is a no-op cost
    val hashed = sg.repartition(col("doc_id")).select(col("doc_id"),
        array_distinct(transform(col("g"),
          x => conv(substring(md5(x), 1, 15), 16, 10).cast("long"))).as("gh"))
      .withColumn("sz", size(col("gh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val post = hashed.select(col("doc_id"), col("sz"), explode(col("gh")).as("h"))
    val dfreq = post.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // prefix length: sz − ⌈τ·sz⌉ + 1 under the global (df asc, h asc) order
    val prefix = post.join(dfreq, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .filter(col("rk") <= col("sz") - ceil(col("sz") * lit(tau)).cast("int") + 1)
      .select(col("doc_id"), col("h"), col("sz"))
    // PPJoin length filter AT the candidate join (r18): jaccard ≥ τ
    // forces min(|A|,|B|) ≥ τ·max, and both sizes already ride the
    // prefix rows — candidates failing it drop BEFORE the distinct and
    // before either O(set)-sized hash array is attached for the verify
    // (guide §3.2: shrink the join volume ahead of the heavy attach)
    val cand = prefix.join(
        prefix.select(col("doc_id").as("doc_b"), col("h").as("h_b"),
          col("sz").as("szb0")),
        col("h") === col("h_b") && col("doc_id") < col("doc_b") &&
          least(col("sz"), col("szb0")).cast("double") >=
            greatest(col("sz"), col("szb0")) * lit(tau))
      .select(col("doc_id").as("doc_a"), col("doc_b")).distinct()
    val ga = hashed.select(col("doc_id").as("doc_a"), col("gh").as("ga"), col("sz").as("sza"))
    val gb = hashed.select(col("doc_id").as("doc_b"), col("gh").as("gb"), col("sz").as("szb"))
    val inter = size(array_intersect(col("ga"), col("gb")))
    val out = cand.join(ga, "doc_a").join(gb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / (col("sza") + col("szb") - inter)).as("jaccard"))
      .filter(col("jaccard") >= tau)
    (out, () => { hashed.unpersist(); () })
  }
}
