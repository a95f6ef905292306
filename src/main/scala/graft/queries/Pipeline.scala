package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public facade over the training-data-pipeline operators the gate
  * queries exercise — the pipeline-side analogue of `graft.stac.Stac`:
  * a user of the library calls these directly on their own frames
  * instead of reading the gate specs for the recipe. Each function is
  * the exact implementation its gate query verifies (d01/d09/d12/t10/
  * t13 …), so the DuckDB-checked semantics carry over. The native
  * expression surface (`word_shingles`, `minhash_sig`, `simhash_sig`,
  * `float_dot`, `bloom_filter_agg`, …) lives in
  * [[graft.functions.TextFunctions]], [[graft.functions.VectorFunctions]],
  * [[graft.functions.BloomFunctions]] and the SQL registry
  * [[graft.GraftFunctions]]; whole-frame join/top-k operators in
  * `graft.operators` (SpatialJoin, AsofJoin, RangeJoin, SkewJoin,
  * AllPairsTopK, TopK, ConnectedComponents, HeavyHitters).
  */
object Pipeline {

  /** Whitespace tokens (the corpus convention all t-ops share). */
  def tokens(text: Column): Column = TextOps.words(text)

  /** Distinct word n-gram shingles via the native one-pass expression. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextFunctions.wordShingles(text, n)

  /** PII scrub: email → [EMAIL], IPv4 → [IP], blocklist → [TERM], in
    * that fixed order (t10's verified redaction chain). */
  def scrubPii(text: Column): Column = TextOps.scrub(text)

  /** Exact dedup: one hash-agg, no window — the first-occurrence-wins
    * convention of the d02/t13 gates (smallest `idCol` per duplicate
    * group). Returns one row per distinct `keyCol` value: its md5
    * fingerprint `fp` and the surviving `keeper_id`. */
  def exactDedupKeepers(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(md5(keyCol.cast("string")).as("fp"))
      .agg(min(idCol).as("keeper_id"))

  /** EXACT Jaccard similarity self-join via AllPairs/PPJoin prefix
    * filtering (d09's engine — provably lossless at `tau`). The engine
    * persists an intermediate hashed-sets frame shared by four plan
    * branches, so the primary form returns a `release()` hook alongside
    * the pairs — call it AFTER materializing the (lazy) result, exactly
    * like [[cleanCorpusFunnel]]; a loop that skips release accumulates
    * dead MEMORY_AND_DISK entries for the life of the session.
    * @param sg (doc_id, g) rows; g = the distinct element set */
  def jaccardSimilarityJoin(sg: DataFrame, tau: Double): (DataFrame, () => Unit) =
    DedupOps.jaccardSimilarityJoinReleasable(sg, tau)

  /** As [[jaccardSimilarityJoin]] but deliberately leaves the
    * intermediate cached for the session — ONLY for run-once callers
    * (the d09 gate's shape) where the cache dies with the session. */
  def jaccardSimilarityJoinCached(sg: DataFrame, tau: Double): DataFrame =
    DedupOps.jaccardSimilarityJoin(sg, tau)

  /** Self-trained bigram-LM fluency score (the t14 gate's engine): per
    * doc (n_bigrams, hit_sum, n_rare, avg_freq) — the CCNet/KenLM-style
    * quality signal with exact-integer math (no ln/exp). Returns the
    * scored frame plus a `release()` hook for the collapsed
    * (doc, bigram, m) intermediate (call after materializing). */
  def bigramLmScore(docs: DataFrame): (DataFrame, () => Unit) =
    TextOps.bigramLmScoreReleasable(docs)

  /** CCNet-style LM quality filter (the t15 gate's engine): score docs
    * with the self-trained bigram LM, bucket per source by fluency
    * (ntile over avg_freq DESC with doc_id tiebreak — deterministic),
    * and keep buckets ≤ `keepMax` (1 = most fluent). Unscorable docs
    * (<2 words) are dropped. Returns (kept docs, release). */
  def lmQualityFilter(docs: DataFrame, buckets: Int = 4,
                      keepMax: Int = 3): (DataFrame, () => Unit) = {
    require(keepMax >= 1 && keepMax <= buckets,
      s"keepMax must be in [1, $buckets], got $keepMax")
    val (bucketed, release) = TextOps.lmQualityBucketsReleasable(docs, buckets)
    val keep = bucketed.filter(col("bucket") <= keepMax).select(col("doc_id"))
    (docs.join(keep, "doc_id"), release)
  }

  /** The END-TO-END pretraining data pipeline (the d16 gate's engine),
    * composed from the gate-verified stages over (doc_id, text, source)
    * frames: near-dup dedup (MinHash-LSH + clusters, min-id keepers at
    * `dedupTau`) → benchmark decontamination (drop docs whose eval
    * n-gram overlap fraction ≥ `contamTau`) → LM quality filter (keep
    * the `keepMax` most fluent of `buckets` per-source fluency buckets,
    * model TRAINED ON THE SURVIVING SET — the CCNet ordering). Returns
    * (kept docs, per-source funnel frame with stage counts + survivor
    * checksum, release hook for every persisted intermediate). */
  def pretrainingPipeline(corpus: DataFrame, evalDocs: DataFrame,
                          dedupTau: Double = 0.6, contamTau: Double = 0.05,
                          buckets: Int = 4, keepMax: Int = 3): (DataFrame, DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel
    import graft.operators.NearDup
    // Stage-boundary lineage truncation (the CC-loop discipline applied to
    // the pipeline): each persisted stage is re-anchored as a LogicalRDD
    // over its own physical plan (internal rows — no Row ser/deser), so a
    // downstream stage's LOGICAL plan references a one-node leaf instead of
    // the whole upstream join pyramid. Without this the funnel's plan
    // chained every stage (~390 Exchange nodes at r19 open) and Catalyst
    // re-analyzed the full tree on every action — the d16 analyzer cost the
    // CC loop already solved for its rounds. Fault tolerance is unchanged:
    // the anchored RDD recomputes through the stage's cache on loss.
    def anchor(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftSqlShim.replayableBatch(df)
    // ONE persisted shingle-set pass shared by candidate generation, the
    // exact-Jaccard verify, AND the contamination stage (previously the
    // surviving corpus was re-shingled from text for decontamination)
    val sg = NearDup.shingleSets(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    val pairs0 = NearDup.verifiedPairsFromSets(sg, "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = anchor(pairs0)
    // the non-keeper set is tiny (duplicate-cluster members only) and feeds
    // BOTH the survivor anti-join and the shingle-set anti-join below —
    // persisted so the cluster-size join does not rerun per consumer
    val drop0 = NearDup.clusters(pairs, dedupTau).filter(!col("is_kept"))
      .select(col("doc_id")).persist(StorageLevel.MEMORY_AND_DISK)
    val drop = anchor(drop0)
    val s1p = corpus.join(drop, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val s1 = anchor(s1p)
    // contamination over the PERSISTED full-corpus sets — no re-shingle, no
    // survivor anti-join on the shingle frame: an id flagged here that was
    // already dropped at stage 1 is simply absent from s1, so the left_anti
    // below yields the identical s2 (per-doc overlap is independent of
    // other docs, so restricting to survivors first changes nothing)
    val contaminated = NearDup.contaminatedIdsFromSets(sg, evalDocs, contamTau)
    val s2p = s1.join(contaminated, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val s2 = anchor(s2p)
    val (s3raw, rel3) = lmQualityFilter(s2, buckets, keepMax)
    // s3 feeds BOTH the returned kept-docs frame and the funnel agg:
    // unpersisted, materializing each would re-run the LM score join +
    // per-source quality window twice
    val s3p = s3raw.persist(StorageLevel.MEMORY_AND_DISK)
    val s3 = anchor(s3p)
    // Per-source funnel counts from the STAGE frames directly: each stage
    // is a subset of `corpus` (unique doc_id) still carrying `source`, so
    // count-members-per-source ≡ the corpus-side "count FILTER (doc_id IN
    // stage)" — four narrow per-source aggregates + joins on the tiny
    // source key, instead of three row-level corpus joins (r19; the left
    // joins preserve the empty-stage semantics: counts coalesce to 0,
    // kept_id_sum stays NULL exactly like sum-FILTER over no rows)
    val f0 = corpus.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val f1 = s1.groupBy(col("source")).agg(count(lit(1)).as("c1"))
    val f2 = s2.groupBy(col("source")).agg(count(lit(1)).as("c2"))
    val f3 = s3.groupBy(col("source"))
      .agg(count(lit(1)).as("c3"), sum(col("doc_id")).as("kept_id_sum"))
    val funnel = f0
      .join(f1, Seq("source"), "left")
      .join(f2, Seq("source"), "left")
      .join(f3, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("c1"), lit(0L)).as("n_after_neardup"),
        coalesce(col("c2"), lit(0L)).as("n_after_decontam"),
        coalesce(col("c3"), lit(0L)).as("n_after_lm"),
        col("kept_id_sum"))
    (s3, funnel,
      () => { rel3(); pairs0.unpersist(); sg.unpersist(); drop0.unpersist()
        s1p.unpersist(); s2p.unpersist(); s3p.unpersist(); () })
  }

  /** MinHash-LSH near-duplicate candidate pairs verified with exact
    * n-gram Jaccard (the d03 gate's engine, shared code): (doc_a, doc_b,
    * jaccard), doc_a < doc_b. Candidate generation is a banded equi-join
    * on (seed, minhash) — never all-pairs; signatures are computed in the
    * scan stage so only `seeds × docs` rows shuffle. */
  def nearDupPairs(docs: DataFrame, idName: String = "doc_id",
                   textName: String = "text", seeds: Int = 4,
                   shingleN: Int = 3): DataFrame =
    graft.operators.NearDup.verifiedPairs(docs, idName, textName, seeds, shingleN)

  /** Duplicate clusters over verified pairs at threshold `tau` (the d05
    * gate's engine): min-label connected components, loop shuffle width
    * derived from the pair count. Persist `pairs` first if it is
    * expensive — both the width derivation and the loop consume it. */
  def nearDupClusters(pairs: DataFrame, tau: Double): DataFrame =
    graft.operators.NearDup.clusters(pairs, tau)

  /** End-to-end near-dup dedup: `docs` minus non-minimal cluster members
    * at `tau`, plus a `release()` hook for the shared candidate-pair
    * intermediate (call after materializing the result — the
    * [[cleanCorpusFunnel]] contract). */
  def nearDupDedup(docs: DataFrame, tau: Double, idName: String = "doc_id",
                   textName: String = "text", seeds: Int = 4,
                   shingleN: Int = 3): (DataFrame, () => Unit) =
    graft.operators.NearDup.dedup(docs, tau, idName, textName, seeds, shingleN)

  /** The full fuzzy-dedup funnel (the d14 gate's engine): per-source
    * counts through shingle → MinHash-LSH → exact-Jaccard verify →
    * cluster → min-id keepers, with a survivor-id checksum. Returns
    * (funnel, release) — the [[cleanCorpusFunnel]] contract. */
  def nearDupFunnel(docs: DataFrame, tau: Double, idName: String = "doc_id",
                    textName: String = "text", sourceName: String = "source",
                    seeds: Int = 4, shingleN: Int = 3): (DataFrame, () => Unit) =
    graft.operators.NearDup.funnel(docs, tau, idName, textName, sourceName, seeds, shingleN)

  /** Incremental near-dup filtering of a new batch against an existing
    * history corpus (the d17 gate's engine — history always wins):
    * returns (kept, flagged, release) — call `release()` after
    * materializing to drop the shared shingle intermediates. Candidates
    * come only from the cross new×history band join, so per-snapshot
    * cost scales with the new batch. Compose with [[nearDupDedup]] for
    * within-batch dedup. */
  def dedupAgainstHistory(history: DataFrame, newDocs: DataFrame, tau: Double,
                          idName: String = "doc_id", textName: String = "text",
                          seeds: Int = 4, shingleN: Int = 3)
      : (DataFrame, DataFrame, () => Unit) =
    graft.operators.NearDup.dedupAgainstHistory(
      history, newDocs, tau, idName, textName, seeds, shingleN)

  /** SemDeDup-style semantic dedup victims (the d13 gate's engine):
    * (vec_id, cell, keeper_id, cos) for every vector with a smaller-id
    * neighbor at cosine ≥ `tau` in its IVF semantic cell; absent rows
    * are keepers. Candidates are bounded per cell — `cells` is the
    * scale dial (0 derives ~√n). */
  def semanticDedupVictims(embeddings: DataFrame, tau: Double,
                           cells: Int = 0): DataFrame =
    graft.operators.NearDup.semanticVictims(embeddings, tau, cells)

  /** Benchmark decontamination (the d11 gate's shape, callable): per-doc
    * contamination flag from ONE mergeable bloom sketch over the eval
    * set's shingle vocabulary — no false negatives by construction; size
    * `numBits` ~10× the expected distinct eval shingles to keep false
    * positives ≈ 0. The sketch rides to probe tasks as a one-row
    * broadcast; the corpus side is a linear scan-stage probe. Returns
    * (idName, contaminated). */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame,
                    idName: String = "doc_id", textName: String = "text",
                    shingleN: Int = 3, expectedItems: Long = 4096,
                    numBits: Long = 1L << 20): DataFrame =
    graft.operators.NearDup.decontaminate(
      corpus, evalDocs, idName, textName, shingleN, expectedItems, numBits)

  /** Contamination fraction per doc (the d15 gate's engine — the graded
    * Llama-style overlap rule): (idName, n_shingles, n_hit,
    * overlap_frac, contaminated) with contaminated = n_hit ≥
    * tau·n_shingles. Exact integer counts, one final division. */
  def contaminationFraction(corpus: DataFrame, evalDocs: DataFrame, tau: Double,
                            idName: String = "doc_id", textName: String = "text",
                            shingleN: Int = 3): DataFrame =
    graft.operators.NearDup.contaminationFraction(
      corpus, evalDocs, tau, idName, textName, shingleN)

  /** Temperature-weighted mixture allocation (d12): split `budget`
    * across (source, n_docs) rows ∝ sqrt(n_docs) with exact integer
    * largest-remainder rounding — allocations sum to `budget` exactly. */
  def temperatureAllocation(counts: DataFrame, budget: Long): DataFrame =
    DedupOps.temperatureAllocation(counts, budget)

  /** Deterministic stratified sample flag: keep a row iff its md5
    * bucket (0–99) falls under `ratePercent` — delegates to the SAME
    * bucket expression the d06 gate verifies (reproducible membership:
    * same rows on every engine, every run). */
  def stratifiedKeep(idCol: Column, ratePercent: Column): Column =
    DedupOps.hashBucket100(idCol) < ratePercent

  /** Train a BPE merge vocabulary over the corpus (t18's gate-verified
    * derivation): (step, sym_a, sym_b, pair_count) in training order. */
  def trainBpeVocab(docs: DataFrame, merges: Int,
                    textName: String = "text"): DataFrame =
    graft.operators.Bpe.train(docs, merges, textName)

  /** Per-doc token counts under a TRAINED BPE vocabulary — the t09
    * packing hook: feed (idName, n_tokens) to the packing/offset
    * derivations in place of whitespace counts, so sequence bins fill
    * by the tokens the trainer will actually see. Returns
    * (counts, release). */
  def bpeTokenCounts(docs: DataFrame, mergeTable: DataFrame,
                     idName: String = "doc_id",
                     textName: String = "text"): (DataFrame, () => Unit) =
    graft.operators.Bpe.tokenCounts(docs, mergeTable, idName, textName)

  /** The composed C4-style cleaning funnel (t13's engine): langid gate →
    * quality floor → PII scrub → exact dedup of scrubbed text over a
    * (source, doc_id, text) frame; returns per-source (n_input, n_lang,
    * n_clean, n_unique, kept_id_sum) plus a `release()` hook for the
    * persisted intermediate (call after materializing the result). */
  def cleanCorpusFunnel(docs: DataFrame): (DataFrame, () => Unit) =
    TextOps.cleanFunnelReleasable(docs)

  /** Gopher-style within-document repetition stats (the t17 gate's
    * engine): per doc, exact char-weighted duplicate-n-gram fractions
    * for n ∈ {2,3} plus a `repetitive` flag past the rate dials — the
    * boilerplate / keyword-stuffing filter of the Gopher (MassiveText)
    * pipeline. Purely per-document (no cross-doc join): embarrassingly
    * parallel at any corpus size. */
  def repetitionStats(docs: DataFrame, rate2: Double = 0.10,
                      rate3: Double = 0.02): DataFrame =
    TextOps.repetitionStats(docs, rate2, rate3)

  /** Exact cosine k-NN (s01's engine): guarded broadcast of the QUERY
    * set only — the corpus streams past it, and per-query top-k is the
    * bounded-buffer aggregate (`graft.operators.TopK`), so the shuffle
    * carries k-element buffers, never n·q scored rows. Both frames:
    * (vec_id, embedding: Array[Float]). Errors with routing advice when
    * the query set exceeds broadcast size (the sub-quadratic routes are
    * the LSH/IVF gates and `AllPairsTopK`). Zero-norm vectors have no
    * defined cosine and are EXCLUDED from both sides. Output:
    * (query_id, rank, neighbor_id, cos), cos rounded to 1e-9 for
    * cross-engine comparability.
    * @param excludeSameId drop candidates whose vec_id equals the
    *   query's — the self-join convention when corpus and queries are
    *   the same table (the default); pass false for unrelated id
    *   spaces, where an id coincidence must not suppress a true
    *   neighbor */
  def exactKnn(corpus: DataFrame, queries: DataFrame, k: Int,
               excludeSameId: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def withNorm(df: DataFrame) = df.select(col("vec_id"), col("embedding"),
        SimilarityOps.norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0) // cos undefined; a NULL score would poison top-k
    val q = graft.operators.AllPairsTopK.requireBroadcastable(withNorm(queries),
      what = "exact k-NN query set",
      route = "bucket the queries (the LSH/IVF paths) or block-partition with AllPairsTopK for query sets past broadcast size")
    SimilarityOps.exactKnn(q, withNorm(corpus), k, excludeSameId)
  }

  /** Sign-LSH ANN top-k with multiprobe — the sub-quadratic similarity
    * search the s03/s10 gates verify, with the scale dials as arguments:
    * `bits=0` derives the bucket count from corpus size (target bucket
    * occupancy), `probes` widens recall linearly, `salt` splits hot
    * buckets without changing results. See [[graft.operators.Ann]]. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 0,
              probes: Int = 1, salt: Int = 1,
              excludeSameId: Boolean = true): DataFrame =
    graft.operators.Ann.annTopK(corpus, queries, k, bits, probes, salt, excludeSameId)

  /** One-time materialized LSH index build + bounded-batch serving with
    * probe pushdown (the s12 gate's engine) — see
    * [[graft.operators.Ann.buildIndex]] / `annTopKIndexed`. */
  def buildAnnIndex(corpus: DataFrame, path: String, bits: Int, files: Int = 64): Unit =
    graft.operators.Ann.buildIndex(corpus, path, bits, files)

  def annTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, probes: Int = 1,
                     salt: Int = 1, excludeSameId: Boolean = true,
                     maxPushdownProbes: Int = 1024): DataFrame =
    graft.operators.Ann.annTopKIndexed(spark, path, queries, k, probes, salt,
      excludeSameId, maxPushdownProbes)

  /** IVF ANN top-k — the billion-vector scale path the s04 gate
    * verifies; `cells=0` derives ~√n cells, `nprobe` is the recall/cost
    * dial. Query side must be bounded (guarded broadcast).
    * `candidateFilter` (the s15 gate's engine) is the production
    * FILTERED-search shape: a predicate over the candidate columns
    * pruned before any scoring, served by the same full-corpus index. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, cells: Int = 0,
              nprobe: Int = 2, excludeSameId: Boolean = true,
              candidateFilter: Column = lit(true)): DataFrame =
    graft.operators.Ann.ivfTopK(corpus, queries, k, cells, nprobe,
      excludeSameId, candidateFilter)

  /** Symmetric int8 corpus quantization (the s08 gate's storage format:
    * 4× smaller, integer scoring, exact cached self-dots) — persisted,
    * with a `release()` hook: materializing the quantized table once and
    * serving every search from it IS the point; release it when the
    * corpus is retired. */
  def int8Quantize(embeddings: DataFrame): (DataFrame, () => Unit) = {
    val q = graft.operators.Ann.int8Quantize(embeddings)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (q, () => { q.unpersist(); () })
  }

  /** Product-quantization codes for an int8-quantized corpus
    * ([[int8Quantize]] output): `subspaces` code bytes per vector —
    * the 32×-compressed storage format behind [[pqTopK]]. */
  def pqEncode(quant: DataFrame, subspaces: Int = 8, codes: Int = 16): DataFrame =
    graft.operators.Ann.pqEncode(quant, subspaces, codes)

  /** PQ + ADC top-k over int8-quantized frames — LUT scoring plus exact
    * shortlist re-rank, the s09 gate's engine. */
  def pqTopK(quantCorpus: DataFrame, quantQueries: DataFrame, k: Int,
             subspaces: Int = 8, codes: Int = 16, shortlist: Int = 64,
             excludeSameId: Boolean = true): DataFrame =
    graft.operators.Ann.pqTopK(quantCorpus, quantQueries, k, subspaces, codes,
      shortlist, excludeSameId)

  /** Trained IVF cell assignment (the s07 gate's engine): one Lloyd
    * refinement of the static codebook in exact integer/rational
    * arithmetic — (vec_id, cell), deterministic on every engine and
    * partitioning. The assignment a production IVF index would store. */
  def lloydRefineAssign(corpus: DataFrame, cells: Int = 0): DataFrame =
    graft.operators.Ann.lloydRefineAssign(corpus, cells)

  /** IVF-PQ top-k over RAW embedding frames (the s13 gate's engine —
    * the FAISS IVFPQ composition): coarse cells bound which vectors are
    * scored, ADC bounds what each scoring costs, exact re-rank
    * finishes. Both sides quantize at the corpus scale internally. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                cells: Int = 0, nprobe: Int = 2, subspaces: Int = 8,
                codes: Int = 16, shortlist: Int = 64,
                excludeSameId: Boolean = true): DataFrame =
    graft.operators.Ann.ivfPqTopK(corpus, queries, k, cells, nprobe,
      subspaces, codes, shortlist, excludeSameId)
}
