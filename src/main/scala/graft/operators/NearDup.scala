package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Near-duplicate detection and decontamination over a document corpus —
  * the user-callable form of the gate-verified d03/d05/d07/d11 machinery
  * (reference scope: stac-geoparquet has no analytics surface; this is the
  * LLM-pipeline extension mandated by the builder brief).
  *
  * Scale design (100 TB):
  *   - Candidate generation is ALWAYS bucketed: a MinHash-band equi-join on
  *     (seed, minhash) — candidates only, never all-pairs. Signatures are
  *     computed per document inside the scan stage
  *     ([[graft.functions.TextFunctions.minhashSig]]), so the only rows that
  *     shuffle are `seeds × docs`, independent of document length.
  *   - The exact-Jaccard verify joins shingle sets for CANDIDATE pairs only;
  *     the quadratic tail never materializes.
  *   - Clustering iterates over the candidate-VERTEX set (orders of magnitude
  *     smaller than the corpus) with a loop shuffle width derived from that
  *     state, not the session's corpus width.
  *   - Decontamination folds the eval vocabulary into ONE mergeable bloom
  *     sketch (~128 KB) that rides to every probe task; the corpus side is a
  *     linear scan-stage probe. Nothing corpus-sized moves.
  */
object NearDup {

  /** (id, g): distinct word-n-gram shingle sets, computed one-pass in the
    * scan stage. `idName` must not collide with "g". */
  def shingleSets(docs: DataFrame, idName: String = "doc_id",
                  textName: String = "text", shingleN: Int = 3): DataFrame =
    docs.select(col(idName),
      graft.functions.TextFunctions.wordShingles(col(textName), shingleN).as("g"))

  /** LSH candidate pairs verified with exact n-gram Jaccard:
    * (doc_a, doc_b, jaccard), doc_a < doc_b, one row per candidate pair.
    *
    * This IS the d03 gate body (value-checked against the DuckDB oracle at
    * every scale factor); the gate delegates here so facade and gate cannot
    * drift. More seeds = more bands = higher recall at proportionally more
    * shuffle rows; 4 seeds ~ the reference dedup literature's default for
    * word-3-gram near-dup at τ ≥ 0.6.
    *
    * `salt` is the hot-bucket dial (the Ann.bucketTopK pattern, identical
    * identity proof in OperatorSpec): a pathological band value holding m
    * docs costs one task m² join state; at salt > 1 the doc_b side
    * scatters over `salt` sub-buckets by id hash and the doc_a side
    * replicates across all of them, so every (a, b) pair still meets
    * EXACTLY once — identical results, ×salt smaller per-task state at
    * ×salt more doc_a-side rows. */
  def verifiedPairs(docs: DataFrame, idName: String = "doc_id",
                    textName: String = "text", seeds: Int = 4,
                    shingleN: Int = 3, salt: Int = 1): DataFrame =
    verifiedPairsFromSets(shingleSets(docs, idName, textName, shingleN),
      idName, seeds, salt)

  /** [[verifiedPairs]] over a PREBUILT shingle-set frame (`(idName, g)`,
    * the [[shingleSets]] shape) — `sg` feeds the minhash band explode AND
    * both exact-verify sides, so a caller that persists it first turns
    * three corpus passes into one (the composed-pipeline shape; [[dedup]]
    * and [[funnel]] do exactly that). */
  private[graft] def verifiedPairsFromSets(sg: DataFrame, idName: String,
                                           seeds: Int = 4,
                                           salt: Int = 1): DataFrame = {
    require(seeds >= 1, s"seeds must be >= 1, got $seeds")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val mh = sg.select(col(idName),
      posexplode(graft.functions.TextFunctions.minhashSig(col("g"), seeds))
        .as(Seq("seed", "mhv")))
    val a0 = mh.select(col("seed"), col("mhv"), col(idName).as("doc_a"))
    val b0 = mh.select(col("seed").as("seed_b"), col("mhv").as("mhv_b"),
      col(idName).as("doc_b"))
    val (a, b, saltCond) =
      if (salt <= 1) (a0, b0, lit(true))
      else (a0.withColumn("__sa", explode(array((0 until salt).map(lit): _*))),
        b0.withColumn("__sb", pmod(xxhash64(col("doc_b")), lit(salt)).cast("int")),
        col("__sa") === col("__sb"))
    val cand = a.join(b,
        a("seed") === b("seed_b") && a("mhv") === b("mhv_b") &&
          col("doc_a") < col("doc_b") && saltCond)
      .select(col("doc_a"), col("doc_b")).distinct()
    val ga = sg.select(col(idName).as("doc_a"), col("g").as("ga"))
    val gb = sg.select(col(idName).as("doc_b"), col("g").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb")))
    cand.join(ga, "doc_a").join(gb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / (size(col("ga")) + size(col("gb")) - inter))
          .as("jaccard"))
  }

  /** SimHash near-duplicate pairs by banded Hamming search — the d08 gate's
    * engine: (doc_a, doc_b, hamming), doc_a < doc_b, exact Hamming ≤
    * `maxHamming` over 60-bit signatures, candidates from an equi-join on
    * 4×15-bit band values. EXACT for maxHamming ≤ 3 by pigeonhole: ≤3
    * differing bits damage at most 3 of the 4 bands, so every qualifying
    * pair shares an intact band — approximate candidate generation,
    * provably lossless recall. Returns (pairs, release): the signature
    * frame is persisted (per-word md5 over the corpus is the expensive op
    * — it feeds the band explode AND both verify sides; unpersisted,
    * projection collapsing re-runs it per consumer, the m09 lesson) —
    * call `release()` after materializing.
    *
    * `salt` splits hot band values exactly as [[verifiedPairs]] (identity
    * proof in OperatorSpec): results are independent of the dial. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idName: String = "doc_id", textName: String = "text",
                   salt: Int = 1): (DataFrame, () => Unit) = {
    val (pairs, _, release) =
      simhashPairsState(docs, maxHamming, idName, textName, salt)
    (pairs, release)
  }

  /** [[simhashPairs]] plus the PERSISTED signature frame (memo callers
    * probe its storage level to detect a cleared session cache). */
  private[graft] def simhashPairsState(docs: DataFrame, maxHamming: Int = 3,
                                       idName: String = "doc_id",
                                       textName: String = "text",
                                       salt: Int = 1)
      : (DataFrame, DataFrame, () => Unit) = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banding is lossless only for maxHamming <= 3 (4 bands), got $maxHamming")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val sigs = docs.select(col(idName),
      graft.functions.TextFunctions.simhashSig(col(textName), bits = 60).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bands = sigs.select(col(idName), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), 15 * b).bitwiseAND(lit(32767L))): _*)).as(Seq("b", "bv")))
    val a0 = bands.select(col(idName).as("doc_a"), col("sig").as("sig_a"),
      col("b").as("ba"), col("bv").as("bva"))
    val b0 = bands.select(col(idName).as("doc_b"), col("sig").as("sig_b"),
      col("b").as("bb"), col("bv").as("bvb"))
    val (a, b, saltCond) =
      if (salt <= 1) (a0, b0, lit(true))
      else (a0.withColumn("__sa", explode(array((0 until salt).map(lit): _*))),
        b0.withColumn("__sb", pmod(xxhash64(col("doc_b")), lit(salt)).cast("int")),
        col("__sa") === col("__sb"))
    val pairs = a.join(b, col("ba") === col("bb") && col("bva") === col("bvb") &&
        col("doc_a") < col("doc_b") && saltCond)
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    (pairs, sigs, () => { sigs.unpersist(); () })
  }

  /** Duplicate clusters from verified pairs: (doc_id, cluster_root,
    * cluster_size, is_kept) — min-label connected components over pairs with
    * jaccard ≥ tau, keeping the minimum id per cluster. Docs in no cluster
    * are not returned (they are all keepers by definition).
    *
    * The iteration shuffle width is derived from the pair count (≤ 2
    * vertices per pair, ~2M labels per partition, floored at 8, capped at
    * the session width) — the d05 gate discipline. `pairs` should be
    * persisted by the caller if it is expensive to recompute (the count
    * here and the CC loop both consume it). */
  def clusters(pairs: DataFrame, tau: Double): DataFrame = {
    val p = pairs.filter(col("jaccard") >= tau).select(col("doc_a"), col("doc_b"))
    // loop width derives from the SEED's vertex count inside the CC loop
    // (autoWidth) — the former separate pair-count action paid one extra
    // pass per clustering just to size the loop shuffles
    val cc = ConnectedComponents.run(p, autoWidth = true)
    val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "component")
      .select(col("id").as("doc_id"), col("component").as("cluster_root"),
        col("cluster_size"), (col("id") === col("component")).as("is_kept"))
  }

  /** End-to-end near-dup dedup: returns (keepers, release) where `keepers`
    * is `docs` minus non-minimal cluster members at threshold `tau`, and
    * `release()` unpersists the candidate-pair intermediate (shared by the
    * pair derivation and the clustering loop — without the persist the most
    * expensive shuffle in the pipeline would run twice). */
  def dedup(docs: DataFrame, tau: Double, idName: String = "doc_id",
            textName: String = "text", seeds: Int = 4,
            shingleN: Int = 3): (DataFrame, () => Unit) = {
    val sg = shingleSets(docs, idName, textName, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs0 = verifiedPairsFromSets(sg, idName, seeds)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // lineage truncation at the persisted boundary (the d16/CC discipline)
    val pairs = org.apache.spark.sql.GraftSqlShim.replayableBatch(pairs0)
    val drop = clusters(pairs, tau).filter(!col("is_kept"))
      .select(col("doc_id").as(idName))
    (docs.join(drop, Seq(idName), "left_anti"),
      () => { pairs0.unpersist(); sg.unpersist(); () })
  }

  /** Incremental near-dup filtering of a NEW batch against an existing
    * HISTORY corpus — the production ingestion shape (each crawl
    * snapshot dedups against everything already kept, history always
    * wins): returns (kept, flagged) where `flagged` is (idName,
    * hist_id, jaccard) for every new doc with a verified cross-corpus
    * pair at jaccard ≥ `tau` (hist_id = the minimum matching history
    * id), and `kept` = newDocs minus flagged, plus a `release()` hook
    * for the shingle-set intermediates (each side feeds BOTH the band
    * candidate join and the exact-Jaccard verify join — call after
    * materializing, the [[dedup]]/[[funnel]] contract). Candidates come
    * ONLY from the cross minhash-band join (new × history on (seed,
    * band value)) — never new×new (within-batch dedup is [[dedup]]'s
    * job, composable before or after) and never history×history.
    *
    * Scale shape: THIS overload takes raw history documents and
    * re-shingles + re-bands the archive side on every call — right for
    * one-shot jobs, linear in history size per batch. The production
    * ingestion loop (daily snapshots against a 100-TB kept archive) must
    * NOT pay an archive re-scan per snapshot: build the signature
    * layout once with [[buildBandIndex]] and probe it per batch with
    * [[dedupAgainstHistoryIndexed]], whose per-snapshot cost is
    * O(new batch + candidate rows) — band probes push into the index
    * scan, so unprobed archive row groups are never read. The two paths
    * return identical rows (spec-proven both directions). */
  def dedupAgainstHistory(history: DataFrame, newDocs: DataFrame, tau: Double,
                          idName: String = "doc_id", textName: String = "text",
                          seeds: Int = 4, shingleN: Int = 3)
      : (DataFrame, DataFrame, () => Unit) = {
    require(seeds >= 1, s"seeds must be >= 1, got $seeds")
    val sgH = shingleSets(history, idName, textName, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sgN = shingleSets(newDocs, idName, textName, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    def bands(sg: DataFrame, as: String) = sg.select(col(idName).as(as),
      posexplode(graft.functions.TextFunctions.minhashSig(col("g"), seeds))
        .as(Seq("seed", "mhv")))
    val cand = bands(sgN, "new_id").join(
        bands(sgH, "hist_id")
          .withColumnRenamed("seed", "seed_h").withColumnRenamed("mhv", "mhv_h"),
        col("seed") === col("seed_h") && col("mhv") === col("mhv_h"))
      .select(col("new_id"), col("hist_id")).distinct()
    val inter = size(array_intersect(col("gn"), col("gh")))
    val flagged = cand
      .join(sgN.select(col(idName).as("new_id"), col("g").as("gn")), "new_id")
      .join(sgH.select(col(idName).as("hist_id"), col("g").as("gh")), "hist_id")
      .select(col("new_id"), col("hist_id"),
        (inter.cast("double") / (size(col("gn")) + size(col("gh")) - inter))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
      .groupBy(col("new_id"))
      .agg(min(col("hist_id")).as("hist_id"),
        round(min_by(col("jaccard"), col("hist_id")), 9).as("jaccard"))
      .withColumnRenamed("new_id", idName)
    (newDocs.join(flagged.select(col(idName)), Seq(idName), "left_anti"), flagged,
      () => { sgH.unpersist(); sgN.unpersist(); () })
  }

  private val BandIndexMetaKey = "graft.neardup.band_index"

  /** Materialize the dedup-history SIGNATURE INDEX at `path` — the
    * build-once layout that makes incremental dedup O(batch) per
    * snapshot instead of an archive re-scan (the [[Ann.buildIndex]]
    * discipline). Two co-located parquet layouts under one root:
    *
    *   - `bands/`: one row per (seed, minhash band value, hist_id),
    *     plus `bkey` = xxhash64(seed, mhv) — range-clustered by bkey so
    *     every row group covers a narrow key interval and a probe
    *     batch's `In(bkey, …)` pushdown prunes everything else;
    *   - `shingles/`: the (hist_id, g) shingle-set frame, hist_id-
    *     clustered, read only for verified-candidate archive docs.
    *
    * `seeds`/`shingleN` are stamped into the parquet footer (born-with
    * via the geoparquet format) so serving never guesses build dials.
    * Rebuild (or extend with a fresh snapshot's keepers) per archive
    * version; the layout pass is one linear scan of the archive.
    * @param files output file count per layout (range-partitioned — not
    *   one dir per band value, which would melt the file listing) */
  def buildBandIndex(history: DataFrame, path: String,
                     idName: String = "doc_id", textName: String = "text",
                     seeds: Int = 4, shingleN: Int = 3,
                     files: Int = 64): Unit = {
    require(seeds >= 1, s"seeds must be >= 1, got $seeds")
    require(files >= 1, s"files must be >= 1, got $files")
    val sg = shingleSets(history, idName, textName, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val meta = s"""{"seeds":$seeds,"shingleN":$shingleN}"""
      sg.select(col(idName).as("hist_id"),
          posexplode(graft.functions.TextFunctions.minhashSig(col("g"), seeds))
            .as(Seq("seed", "mhv")))
        .withColumn("bkey", xxhash64(col("seed"), col("mhv")))
        .repartitionByRange(files, col("bkey"))
        .sortWithinPartitions(col("bkey"), col("hist_id"))
        .write.mode("overwrite").format("geoparquet")
        .option(graft.stac.GeoParquetFileFormat.OptionPrefix + BandIndexMetaKey, meta)
        .save(s"$path/bands")
      sg.select(col(idName).as("hist_id"), col("g"))
        .repartitionByRange(files, col("hist_id"))
        .sortWithinPartitions(col("hist_id"))
        .write.mode("overwrite").format("geoparquet")
        .option(graft.stac.GeoParquetFileFormat.OptionPrefix + BandIndexMetaKey, meta)
        .save(s"$path/shingles")
    } finally { sg.unpersist(); () }
  }

  /** Read (seeds, shingleN) back from a [[buildBandIndex]] footer. */
  def bandIndexParams(spark: org.apache.spark.sql.SparkSession,
                      path: String): (Int, Int) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$path/bands")
    val fs = p.getFileSystem(hconf)
    val it = fs.listFiles(p, true)
    var part: Option[String] = None
    while (part.isEmpty && it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet") && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_")) part = Some(f.toString)
    }
    val meta = part.flatMap(f =>
      graft.stac.GeoParquetWriter.readFooterMetadata(
        new org.apache.hadoop.conf.Configuration(hconf), f).get(BandIndexMetaKey))
    def intOf(key: String) = meta.flatMap(m =>
      ("\"" + key + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(m)).map(_.group(1).toInt)
    (intOf("seeds"), intOf("shingleN")) match {
      case (Some(s), Some(n)) => (s, n)
      case _ => throw new IllegalArgumentException(
        s"$path is not a dedup band index (no $BandIndexMetaKey footer " +
          "entry) — build it with NearDup.buildBandIndex")
    }
  }

  /** [[dedupAgainstHistory]] served from a materialized
    * [[buildBandIndex]] layout — the production incremental-ingest
    * path: per-snapshot cost scales with the NEW batch, not the
    * archive. Row-for-row identical to the inline overload (same band
    * candidates, same exact-Jaccard verify, same min-id flag rule).
    *
    * Scale shape (100 TB archive): the batch's distinct band keys —
    * bounded by batch_docs × seeds — push into the bands scan as an
    * `In(bkey, …)` filter, so row-group min/max stats on the range-
    * clustered layout prune every unprobed archive row group; the
    * shingle verify reads only candidate hist_ids the same way. Past
    * `maxPushdownKeys` distinct values the In list is skipped (a giant
    * filter costs more than it saves) and the equi-join alone routes —
    * results are identical either way, the [[Ann.annTopKIndexed]]
    * contract. Returns (kept, flagged, release) exactly like the inline
    * overload. */
  def dedupAgainstHistoryIndexed(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, newDocs: DataFrame,
                                 tau: Double, idName: String = "doc_id",
                                 textName: String = "text",
                                 maxPushdownKeys: Int = 4096)
      : (DataFrame, DataFrame, () => Unit) = {
    val (seeds, shingleN) = bandIndexParams(spark, indexPath)
    val sgN = shingleSets(newDocs, idName, textName, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bandsN = sgN.select(col(idName).as("new_id"),
        posexplode(graft.functions.TextFunctions.minhashSig(col("g"), seeds))
          .as(Seq("seed", "mhv")))
      .withColumn("bkey", xxhash64(col("seed"), col("mhv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bounded by the cap: ≤ batch_docs × seeds values, collected once
    val probeKeys = bandsN.select(col("bkey")).distinct()
      .limit(maxPushdownKeys + 1).collect().map(_.getLong(0))
    val bands0 = spark.read.format("geoparquet").load(s"$indexPath/bands")
    val bands = if (probeKeys.length <= maxPushdownKeys)
      bands0.filter(col("bkey").isin(probeKeys: _*)) else bands0
    // join on the REAL key pair (bkey only prunes): candidate generation
    // must equal the inline band join exactly. NOT persisted — the gate
    // asserts the In(bkey) pushdown on the returned frame's plan, and a
    // persist here would swap the scan for an InMemoryRelation (the s14
    // lesson); the candidate join runs twice (hist_id discovery + the
    // verify), both passes bkey-pruned O(batch) scans
    val cand = bandsN.join(
        bands.select(col("seed").as("seed_h"), col("mhv").as("mhv_h"),
          col("hist_id")),
        col("seed") === col("seed_h") && col("mhv") === col("mhv_h"))
      .select(col("new_id"), col("hist_id")).distinct()
    val histIds = cand.select(col("hist_id")).distinct()
      .limit(maxPushdownKeys + 1).collect().map(_.get(0))
    val sh0 = spark.read.format("geoparquet").load(s"$indexPath/shingles")
    val shH = if (histIds.length <= maxPushdownKeys)
      sh0.filter(col("hist_id").isin(histIds: _*)) else sh0
    val inter = size(array_intersect(col("gn"), col("gh")))
    val flagged = cand
      .join(sgN.select(col(idName).as("new_id"), col("g").as("gn")), "new_id")
      .join(shH.select(col("hist_id"), col("g").as("gh")), "hist_id")
      .select(col("new_id"), col("hist_id"),
        (inter.cast("double") / (size(col("gn")) + size(col("gh")) - inter))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
      .groupBy(col("new_id"))
      .agg(min(col("hist_id")).as("hist_id"),
        round(min_by(col("jaccard"), col("hist_id")), 9).as("jaccard"))
      .withColumnRenamed("new_id", idName)
    (newDocs.join(flagged.select(col(idName)), Seq(idName), "left_anti"), flagged,
      () => { bandsN.unpersist(); sgN.unpersist(); () })
  }

  /** The full fuzzy-dedup funnel (the Dolma/RedPajama shape) as one
    * call: per-source counts through the near-dup pipeline —
    * (source, n_docs, n_in_pairs, n_dropped, n_kept, keep_id_sum) —
    * where n_in_pairs counts docs bound by any verified pair at
    * jaccard ≥ `tau`, n_dropped the non-minimal cluster members, and
    * keep_id_sum checksums the surviving ids. Returns the funnel frame
    * plus a `release()` hook for the shared candidate-pair intermediate
    * (consumed by the pair filter AND the clustering loop — call after
    * materializing). Scale shape: the only corpus-sized work is
    * [[verifiedPairs]]' banded candidate generation; the funnel itself
    * is narrow left joins on the doc id plus one per-source hash-agg. */
  def funnel(docs: DataFrame, tau: Double, idName: String = "doc_id",
             textName: String = "text", sourceName: String = "source",
             seeds: Int = 4, shingleN: Int = 3): (DataFrame, () => Unit) = {
    val sg = shingleSets(docs, idName, textName, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs0 = verifiedPairsFromSets(sg, idName, seeds)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // lineage truncation at the persisted boundary (the d16/CC discipline):
    // the funnel agg, the in-pair derivation, AND the clustering loop all
    // chain from the candidate-pair pyramid otherwise, and Catalyst
    // re-analyzes that whole tree per action
    val pairs = org.apache.spark.sql.GraftSqlShim.replayableBatch(pairs0)
    val p = pairs.filter(col("jaccard") >= tau)
    val inPair = p.select(col("doc_a").as(idName))
      .unionByName(p.select(col("doc_b").as(idName)))
      .distinct().withColumn("in_pair", lit(true))
    val drops = clusters(pairs, tau).filter(!col("is_kept"))
      .select(col("doc_id").as(idName)).withColumn("dropped", lit(true))
    val out = docs.select(col(sourceName), col(idName))
      .join(inPair, Seq(idName), "left")
      .join(drops, Seq(idName), "left")
      .groupBy(col(sourceName))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("in_pair"), 1)).as("n_in_pairs"),
        count(when(col("dropped"), 1)).as("n_dropped"),
        count(when(col("dropped").isNull, 1)).as("n_kept"),
        sum(when(col("dropped").isNull, col(idName))).as("keep_id_sum"))
    (out, () => { pairs0.unpersist(); sg.unpersist(); () })
  }

  /** SemDeDup-style semantic dedup victims over an embedding corpus:
    * (vec_id, cell, keeper_id, cos) — one row per vector that has a
    * SMALLER-id neighbor in its semantic cell with cosine ≥ `tau`
    * (keeper_id = the minimum such neighbor, cos = cosine to it,
    * rounded to 9 places). Rows absent from the result are keepers.
    *
    * Candidate generation is the IVF cell (Abbas et al.'s SemDeDup
    * recipe: cluster, then prune near-dups within each cluster) — an
    * equi-join on `cell`, never all-pairs. Per-cell work is (n/C)², so
    * `cells` is the scale dial: size it ∝ corpus/target-occupancy
    * (`cells=0` derives ~√n via [[Ann.adaptiveCells]], making the
    * expected per-cell candidate volume ~n·√n/occupancy, not n²). The
    * min-id-keeper rule is deterministic, so results are partitioning-
    * invariant and cross-engine reproducible. */
  def semanticVictims(embeddings: DataFrame, tau: Double,
                      cells: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions.floatDot
    val assign = Ann.assignCells(embeddings, cells)
    val a = assign.select(col("cell"), col("vec_id").as("keeper_cand"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assign.select(col("cell").as("cell_b"), col("vec_id"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val cos = floatDot(col("ea"), col("eb")) / (col("na") * col("nb"))
    // within-cell pairs: a shuffle equi-join on the cell key (both sides
    // corpus-sized — NEVER broadcast); the a<b inequality rides the join
    a.join(b, col("cell") === col("cell_b") && col("keeper_cand") < col("vec_id"))
      .select(col("vec_id"), col("cell"), col("keeper_cand"), cos.as("cos"))
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"), col("cell"))
      .agg(min(col("keeper_cand")).as("keeper_id"),
        round(min_by(col("cos"), col("keeper_cand")), 9).as("cos"))
  }

  /** Contamination FRACTION per corpus document — the graded form of
    * [[decontaminate]]'s boolean (the Llama-style overlap-fraction
    * decision rule): (id, n_shingles, n_hit, overlap_frac, contaminated)
    * where n_hit counts the doc's distinct shingles present in the eval
    * vocabulary and contaminated = n_hit ≥ tau·n_shingles. Counts are
    * exact integers (one final division for the reported fraction), so
    * results are engine- and partitioning-invariant. The eval vocabulary
    * joins as the small side (eval sets are bounded by construction);
    * the corpus side is one explode + one hash-agg — linear. */
  def contaminationFraction(corpus: DataFrame, evalDocs: DataFrame, tau: Double,
                            idName: String = "doc_id", textName: String = "text",
                            shingleN: Int = 3): DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, s"tau must be in [0,1], got $tau")
    val evalSh = shingleSets(evalDocs, idName, textName, shingleN)
      .select(explode(col("g")).as("sh")).distinct()
      .withColumn("hit", lit(true))
    // repartition by id before the explode — single-row-group toy inputs
    // would serialize the probe; at 100 TB file count provides this
    val corpusSh = shingleSets(corpus, idName, textName, shingleN)
      .repartition(col(idName))
      .select(col(idName), explode(col("g")).as("sh"))
    val perDoc = corpusSh.join(evalSh, Seq("sh"), "left")
      .groupBy(col(idName))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("hit"), 1)).as("n_hit"))
    // contract: ONE row per corpus doc. Too-short docs carry (0, 0, 0.0,
    // false) — no shingles is no evidence, never contamination (even at
    // tau = 0, where the raw ≥ compare would vacuously flag them).
    corpus.select(col(idName))
      .join(perDoc, Seq(idName), "left")
      .select(col(idName),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .select(col(idName), col("n_shingles"), col("n_hit"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_hit").cast("double") / col("n_shingles"), 9))
          .as("overlap_frac"),
        (col("n_shingles") > 0 &&
          col("n_hit").cast("double") >= lit(tau) * col("n_shingles")).as("contaminated"))
  }

  /** Contaminated-id set from a PREBUILT corpus shingle-set frame (the
    * [[shingleSets]] shape) — the composed-pipeline form of
    * [[contaminationFraction]]: returns just (idName) for every doc whose
    * eval-overlap crosses `tau`. Equivalent to
    * `contaminationFraction(corpus, …).filter(col("contaminated"))
    * .select(idName)` because a doc absent from the exploded set frame has
    * n_shingles = 0 and can never be contaminated, and for present docs the
    * flag is the identical `n_hit >= tau * n_shingles` IEEE compare over the
    * identical exact integer counts. Passing the pipeline's already-persisted
    * sets avoids re-running the wordShingles scan over the surviving corpus
    * (d16 paid a full re-shingle per run). `corpusSets` should already be
    * spread (a cached/joined frame is); no repartition is added here. */
  private[graft] def contaminatedIdsFromSets(corpusSets: DataFrame,
                                             evalDocs: DataFrame, tau: Double,
                                             idName: String = "doc_id",
                                             textName: String = "text",
                                             shingleN: Int = 3): DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, s"tau must be in [0,1], got $tau")
    val evalSh = shingleSets(evalDocs, idName, textName, shingleN)
      .select(explode(col("g")).as("sh")).distinct()
      .withColumn("hit", lit(true))
    corpusSets.select(col(idName), explode(col("g")).as("sh"))
      .join(evalSh, Seq("sh"), "left")
      .groupBy(col(idName))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("hit"), 1)).as("n_hit"))
      .filter(col("n_hit").cast("double") >= lit(tau) * col("n_shingles"))
      .select(col(idName))
  }

  /** Benchmark decontamination: per-corpus-doc contamination flag from ONE
    * bloom sketch over the eval set's shingle vocabulary.
    *
    * Returns (id, contaminated). A bloom filter has no false negatives, so
    * every document sharing a shingle with the eval set is flagged;
    * false-positive rate follows from `numBits` vs the vocabulary size
    * (default 2^20 bits ≈ 0 fp for ~4k keys — size numBits ~ 10× expected
    * distinct shingles). The sketch is mergeable (map-side partials), rides
    * to probe tasks as a one-row broadcast, and the corpus side is a linear
    * scan-stage probe — the d11 gate shape, callable. */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame,
                    idName: String = "doc_id", textName: String = "text",
                    shingleN: Int = 3, expectedItems: Long = 4096,
                    numBits: Long = 1L << 20): DataFrame = {
    import graft.functions.BloomFunctions
    val evalSh = shingleSets(evalDocs, idName, textName, shingleN)
      .select(explode(col("g")).as("sh")).distinct()
    // might_contain requires its sketch side CONSTANT (or a scalar
    // subquery — the d11 gate's SQL form). The facade builds the sketch
    // eagerly — one action over the (small) eval set, merged map-side —
    // and embeds the ~numBits/8 bytes as a literal, which the driver then
    // ships to every probe task exactly once: the same build-once
    // contract as Spark's own DataFrameStatFunctions.bloomFilter.
    val sketchBytes = evalSh.agg(
        BloomFunctions.bloomFilterAgg(col("sh"), expectedItems, numBits).as("sketch"))
      .head().getAs[Array[Byte]]("sketch")
    // repartition by id before the explode: a few dense input files would
    // otherwise serialize the probe; at 100 TB file count provides this
    val corpusSh = shingleSets(corpus, idName, textName, shingleN)
      .repartition(col(idName))
      .select(col(idName), explode(col("g")).as("sh"))
    val hit = // empty eval set → empty sketch aggregate (null): nothing contaminates
      if (sketchBytes == null) lit(false)
      else BloomFunctions.mightContain(lit(sketchBytes), col("sh"))
    // contract: ONE row per corpus doc — a doc too short to shingle has
    // no probe rows but is still (id, false), so an inner join on the
    // flags cannot silently drop clean short docs
    corpus.select(col(idName))
      .join(corpusSh.groupBy(col(idName)).agg(max(hit).as("contaminated")),
        Seq(idName), "left")
      .select(col(idName), coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** The shared substring-dedup state: `win` = every (id, pos, hash)
    * sliding window (persisted — it feeds the candidate aggregate AND
    * the per-doc totals), `dupPositions` = (id, pos) for every window
    * position whose TEXT occurs in ≥ 2 distinct docs (persisted —
    * [[substringDupStats]] and [[substringDupSpans]] both consume it),
    * `release()` unpersists both. The candidate-text intermediate is
    * materialized and released INSIDE [[substringDupWindows]] — it never
    * outlives the call (the round-7 advice: stacked MEMORY_AND_DISK
    * copies per invocation skewed interleaved bench passes). */
  final case class SubstringDups(win: DataFrame, dupPositions: DataFrame,
                                 release: () => Unit)

  /** EXACT-substring (passage-level) duplicate-window detection — the
    * granularity of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"): for every `w`-codepoint sliding window at
    * EVERY position (stride 1, so copies at any alignment are caught —
    * the aligned-segment pass t11 runs misses an offset-by-one-word
    * copy), find the positions whose window text also occurs in at
    * least one OTHER document.
    *
    * Scale shape (100 TB): the corpus-wide shuffle carries (hash, id)
    * pairs only — 8-byte rolling Karp–Rabin hashes computed scan-stage
    * by the native [[graft.functions.RollingHashes]] expression (w/8×
    * fewer shuffle bytes than shipping window texts; suffix arrays, the
    * paper's single-node structure, don't distribute). Only hash buckets
    * with ≥ 2 distinct docs re-extract their window text, and the final
    * dup decision groups on the TEXT itself — hash collisions are
    * routing noise the verify eliminates, so the answer is defined by
    * text equality alone. Within-doc repeats do NOT count as dups (the
    * distinct-doc bound), matching the cross-document contamination
    * question. */
  def substringDupWindows(docs: DataFrame, w: Int = 64,
                          idName: String = "doc_id",
                          textName: String = "text"): SubstringDups = {
    require(w >= 2, s"window must be >= 2, got $w")
    val eligible = docs.filter(length(col(textName)) >= w)
      .select(col(idName), col(textName))
    // toy inputs are single row groups: spread the per-row hash pass
    // (file count provides this parallelism at 100 TB)
    val win = eligible.repartition(col(idName))
      .select(col(idName),
        posexplode(graft.functions.TextFunctions.rollingHashes(col(textName), w))
          .as(Seq("pos", "h")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // "≥ 2 distinct docs" ⟺ min(id) ≠ max(id): the same predicate without
    // countDistinct's expand + per-(h, id) partial-distinct shuffle —
    // min/max partials collapse map-side to one row per hash (guide §2.3)
    val cand = win.groupBy(col("h"))
      .agg(min(col(idName)).as("d_lo"), max(col(idName)).as("d_hi"))
      .filter(col("d_lo") =!= col("d_hi"))
      .select(col("h"))
    // candidates only: re-extract the window text for the exact verify.
    // Persisted for the two consumers below, materialized eagerly, and
    // unpersisted before returning — only win + dupPositions stay cached.
    val candText = win.join(cand, "h")
      .join(eligible, idName)
      .select(col(idName), col("pos"), col("h"),
        expr(s"substring($textName, pos + 1, $w)").as("wtext"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val trueDup = candText.groupBy(col("h"), col("wtext"))
      .agg(min(col(idName)).as("d_lo"), max(col(idName)).as("d_hi"))
      .filter(col("d_lo") =!= col("d_hi")) // ≥ 2 distinct docs, no expand
      .select(col("h"), col("wtext"))
    val dupPositions = candText.join(trueDup, Seq("h", "wtext"))
      .select(col(idName), col("pos"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    dupPositions.count() // materialize, then drop the candidate texts
    candText.unpersist()
    SubstringDups(win, dupPositions,
      () => { win.unpersist(); dupPositions.unpersist(); () })
  }

  /** Per-doc duplicated-window counts from [[substringDupWindows]] state:
    * one row per eligible doc (length ≥ w): (id, n_windows, n_dup). */
  def substringStatsFrom(sd: SubstringDups, idName: String = "doc_id"): DataFrame = {
    val dupPerDoc = sd.dupPositions.groupBy(col(idName))
      .agg(count(lit(1)).as("n_dup"))
    sd.win.groupBy(col(idName)).agg(count(lit(1)).as("n_windows"))
      .join(dupPerDoc, Seq(idName), "left")
      .select(col(idName), col("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
  }

  /** Per-doc substring-dup stats in one call: returns the (id,
    * n_windows, n_dup) frame plus the release hook for the cached
    * intermediates — call after materializing (the simhashPairs
    * contract). */
  def substringDupStats(docs: DataFrame, w: Int = 64,
                        idName: String = "doc_id",
                        textName: String = "text"): (DataFrame, () => Unit) = {
    val sd = substringDupWindows(docs, w, idName, textName)
    (substringStatsFrom(sd, idName), sd.release)
  }

  /** MAXIMAL duplicated spans from [[substringDupWindows]] state — the
    * merge step Lee et al. 2022 apply after window detection: adjacent
    * or overlapping duplicated `w`-windows in one document coalesce into
    * a single span (two windows at positions p ≤ q belong to the same
    * span iff q ≤ p + w, i.e. their character ranges touch or overlap).
    * Returns one row per span: (id, span_start, span_end, span_chars),
    * positions 1-based inclusive character coordinates (the SQL substr
    * convention; a span covers substring(text, span_start, span_chars)).
    *
    * The merge is a classic gaps-and-islands pass: per-doc window over
    * the dup positions (lag + running break-sum). The window partitions
    * by doc id, so at 100 TB the state per task is one document's dup
    * positions — bounded by doc length, never corpus-shaped. */
  def substringSpansFrom(sd: SubstringDups, w: Int,
                         idName: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col(idName)).orderBy(col("pos"))
    // brk = 1 when this window's range does not touch the previous one's;
    // lag is null on the first row → otherwise-branch 0 (same as the SQL
    // CASE the oracle uses)
    val brk = when(col("pos") > lag(col("pos"), 1).over(byDoc) + w, 1).otherwise(0)
    sd.dupPositions
      .withColumn("brk", brk)
      .withColumn("span_id", sum(col("brk")).over(byDoc))
      .groupBy(col(idName), col("span_id"))
      .agg((min(col("pos")) + 1).cast("long").as("span_start"),
        (max(col("pos")).cast("long") + w).as("span_end"))
      .select(col(idName), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_chars"))
  }

  /** Maximal duplicated spans in one call: (spans, release). */
  def substringDupSpans(docs: DataFrame, w: Int = 64,
                        idName: String = "doc_id",
                        textName: String = "text"): (DataFrame, () => Unit) = {
    val sd = substringDupWindows(docs, w, idName, textName)
    (substringSpansFrom(sd, w, idName), sd.release)
  }
}
