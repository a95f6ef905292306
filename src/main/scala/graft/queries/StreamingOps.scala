package graft.queries

import graft.{QuerySpec, Tables}
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming operators under the value-checked gate: the streaming job runs
  * to completion (Trigger.AvailableNow → memory sink) inside the query
  * function and the materialized result is compared against the batch
  * oracle — proving the watermarked streaming pipeline computes exactly
  * the batch answer, not just "some rows".
  */
object StreamingOps {

  /** Stage the events file as a streaming source dir, run `build` on the
    * stream to completion (AvailableNow -> memory sink), return the
    * materialized table. The bounded wait makes a wedged micro-batch fail
    * the gate row like any other query error instead of hanging the whole
    * Verify run. */
  private def runToMemoryTable(s: SparkSession, dir: String, prefix: String,
                               mode: String, copies: Int = 1)(
                               build: DataFrame => DataFrame): DataFrame =
    runStagedToMemoryTable(s, dir, "events", prefix, mode, copies)(
      src => build(EventStream.readEvents(s, src)))

  /** As [[runToMemoryTable]] but for any source table: stages
    * `dir/<table>.parquet` into a fresh stream dir `copies` times and
    * hands the dir to `build` (which owns the readStream). */
  private def runStagedToMemoryTable(s: SparkSession, dir: String, table: String,
                                     prefix: String, mode: String, copies: Int)(
                                     build: String => DataFrame): DataFrame = {
    val src = stageSource(dir, table, prefix, copies)
    val name = s"${prefix}_${System.nanoTime()}"
    val q = build(src)
      .writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    awaitBounded(q, prefix)
    s.table(name)
  }

  /** Copy `dir/<table>.parquet` into a fresh stream-source dir `copies`
    * times; returns the dir path. */
  private def stageSource(dir: String, table: String, prefix: String,
                          copies: Int): String = {
    val src = java.nio.file.Files.createTempDirectory(prefix)
    src.toFile.deleteOnExit()
    (1 to copies).foreach { i =>
      val staged = src.resolve(s"${table}_$i.parquet")
      staged.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/$table.parquet"), staged)
    }
    src.toString
  }

  private def awaitBounded(q: org.apache.spark.sql.streaming.StreamingQuery,
                           prefix: String): Unit =
    if (!q.awaitTermination(300000)) {
      q.stop()
      throw new RuntimeException(s"$prefix streaming job did not finish within 300s")
    }

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "st01_streaming_hourly",
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%dT%H:%M:%SZ') AS hour,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2"""),
      (s, dir) => {
        runToMemoryTable(s, dir, "st01", "complete")(EventStream.hourlyAgg)
          .select(date_format(col("hour"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("hour"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      timed = false),

    // ----- session windows, value-checked against gaps-and-islands -----
    // Spark's session_window (30-min gap) MERGES touching windows: an
    // event at exactly last_ts + gap still extends the session, so a new
    // session starts only when the gap is STRICTLY greater than 30 min.
    // The oracle replays that boundary (`>`), with end = last_ts + gap.
    // Everything in integer µs so both engines do identical arithmetic on
    // the nanos-precision source.
    QuerySpec(
      "st02_streaming_sessions",
      Some("""
        WITH e AS (SELECT user_id,
                          CAST(epoch_ns(ts)//1000 AS BIGINT) AS us,
                          CAST(round(value*100,0) AS BIGINT) AS cents
                   FROM events),
             m AS (SELECT user_id, us, cents,
                          CASE WHEN lag(us) OVER w IS NULL
                                 OR us - lag(us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS new_sess
                   FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
             g AS (SELECT user_id, us, cents,
                          sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                                              ROWS UNBOUNDED PRECEDING) AS sid
                   FROM m)
        SELECT strftime(make_timestamp(min(us)), '%Y-%m-%dT%H:%M:%SZ') AS session_start,
               strftime(make_timestamp(max(us) + 30*60*1000000), '%Y-%m-%dT%H:%M:%SZ') AS session_end,
               user_id, count(*) AS n_events,
               CAST(sum(cents) AS BIGINT) AS value_cents
        FROM g
        GROUP BY user_id, sid
        ORDER BY session_start, user_id"""),
      (s, dir) => {
        runToMemoryTable(s, dir, "st02", "complete")(EventStream.sessions)
          .select(date_format(col("session_start"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("session_start"),
            date_format(col("session_end"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("session_end"),
            col("user_id"), col("n_events"), col("value_cents"))
          .orderBy(col("session_start"), col("user_id"))
      },
      timed = false),

    // ----- stream-stream interval join, value-checked vs batch range join -----
    // Both sides watermarked so the join state is bounded (rows age out
    // past watermark + interval). Gate interval = 60 minutes (denser
    // membership than the operator's 10-minute default); the oracle is
    // the same [pts, pts+60min) per-user range join in integer µs — the
    // streaming answer must equal the batch answer exactly.
    QuerySpec(
      "st03_streaming_interval_join",
      Some("""
        WITH e AS (SELECT event_id, user_id, event_type,
                          CAST(epoch_ns(ts)//1000 AS BIGINT) AS us
                   FROM events),
             p AS (SELECT event_id AS purchase_id, user_id, us AS pus FROM e WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS click_id, user_id, us AS cus FROM e WHERE event_type = 'click')
        SELECT p.purchase_id, c.click_id, p.user_id
        FROM p JOIN c ON p.user_id = c.user_id
                     AND c.cus >= p.pus AND c.cus < p.pus + 3600000000
        ORDER BY purchase_id, click_id"""),
      (s, dir) => {
        runToMemoryTable(s, dir, "st03", "append")(
          EventStream.purchaseClickJoin(_, intervalMinutes = 60))
          .select(col("purchase_id"), col("click_id"), col("user_id"))
          .orderBy(col("purchase_id"), col("click_id"))
      },
      timed = false),

    // ----- arbitrary stateful processing, value-checked vs batch -----
    // The flatMapGroupsWithState state machine (per-user running totals)
    // run to completion under AvailableNow in Update mode: the memory
    // sink receives every per-batch update, and the FINAL state per user
    // (n_events is strictly increasing, so max-struct selects it) must
    // equal the batch aggregate exactly — proving the hand-rolled state
    // fold neither drops nor double-counts events across micro-batches.
    QuerySpec(
      "st04_streaming_stateful",
      Some("""
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
               max(CAST(epoch_ns(ts)//1000 AS BIGINT)) AS last_us
        FROM events
        GROUP BY user_id
        ORDER BY user_id"""),
      (s, dir) => {
        val updates = runToMemoryTable(s, dir, "st04", "update")(
          EventStream.userRunningStats(_).toDF())
        updates.groupBy(col("user_id"))
          .agg(max(struct(col("n_events"), col("value_cents"), col("last_us"))).as("f"))
          .select(col("user_id"), col("f.n_events").as("n_events"),
            col("f.value_cents").as("value_cents"), col("f.last_us").as("last_us"))
          .orderBy(col("user_id"))
      },
      timed = false),

    // ----- streaming dedup, value-checked against the clean set -----
    // The source dir is staged with TWO copies of the events file, so the
    // stream delivers every event exactly twice; the watermarked
    // dropDuplicates must emit each exactly once. Correct under either
    // micro-batching: duplicates in the same batch dedup against each
    // other; a copy arriving after its original either matches live state
    // (ts ≥ watermark) or is dropped as late (ts < watermark) — both paths
    // reduce to the distinct set. The oracle is the single-copy events
    // table row-for-row, so a dropped original OR a surviving duplicate
    // fails both the row count and the hash.
    QuerySpec(
      "st05_streaming_dedup",
      Some("""
        SELECT event_id, user_id, CAST(epoch_ns(ts)//1000 AS BIGINT) AS us
        FROM events
        ORDER BY event_id"""),
      (s, dir) => {
        runToMemoryTable(s, dir, "st05", "append", copies = 2)(EventStream.dedup)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .orderBy(col("event_id"))
      },
      timed = false),

    // ----- sliding windows, value-checked vs the two-window expansion -----
    // 1-hour windows every 30 minutes: each event lands in exactly TWO
    // windows (the one starting at its floor-to-30min mark and the one
    // 30 minutes earlier). The oracle materializes that membership
    // directly — unnest both window starts per event and aggregate — so
    // a wrong window assignment or a dropped overlap fails the hash.
    QuerySpec(
      "st08_streaming_sliding",
      Some("""
        WITH e AS (SELECT event_type,
                          CAST(epoch_ns(ts)//1000 AS BIGINT) AS us
                   FROM events),
             w AS (SELECT event_type,
                          unnest([us - us % 1800000000,
                                  us - us % 1800000000 - 1800000000]) AS win_us
                   FROM e)
        SELECT strftime(make_timestamp(win_us), '%Y-%m-%dT%H:%M:%SZ') AS win_start,
               event_type, count(*) AS n
        FROM w
        GROUP BY win_us, event_type
        ORDER BY win_start, event_type"""),
      (s, dir) => {
        runToMemoryTable(s, dir, "st08", "complete")(EventStream.slidingAgg)
          .select(date_format(col("win_start"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("win_start"),
            col("event_type"), col("n"))
          .orderBy(col("win_start"), col("event_type"))
      },
      timed = false),

    // ----- stream-static enrichment join, value-checked vs batch -----
    // The event stream joins the STATIC customer dimension (broadcast per
    // micro-batch, stateless — the remaining join family after st03's
    // stream-stream case) and aggregates per market segment in complete
    // mode; the streaming answer must equal the batch join + aggregate
    // exactly.
    QuerySpec(
      "st06_stream_static_join",
      Some("""
        SELECT c_mktsegment AS segment, count(*) AS n,
               CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1
        ORDER BY 1"""),
      (s, dir) => {
        val dim = graft.Tables.t(s, dir, "customer")
        runToMemoryTable(s, dir, "st06", "complete")(
          EventStream.staticEnrichedAgg(_, dim, "c_custkey", "c_mktsegment"))
          .select(col("segment"), col("n"), col("value_cents"))
          .orderBy(col("segment"))
      },
      timed = false),

    // ----- streaming NEAR-dup dedup over the document stream -----
    // Continuous-ingest near-duplicate detection: each arriving document's
    // 60-bit SimHash signature (d04/d08's gate-verified expression)
    // computes IN THE SCAN STAGE, and the streaming state is the
    // per-SIGNATURE dedup ledger (keep_id = min doc_id, n_seen) — state
    // scales with distinct signatures, never with raw documents, which is
    // the signature-directory pattern a 100-TB ingest pipeline keeps
    // (bound it further with a TTL watermark or periodic batch compaction
    // when the signature space itself outgrows memory). The source is
    // staged with TWO copies of every document, so the ledger must count
    // each exactly twice while the keeper stays the minimum id —
    // re-delivery cannot change the dedup decision. The oracle recomputes
    // the signatures and the ledger from the single-copy table: a dropped
    // batch, a double-counted group, or a signature drift all fail the
    // hash. (Order-dependence is designed out: min/count are
    // arrival-order-invariant, unlike first-wins dropDuplicates.)
    QuerySpec(
      "st09_streaming_neardup",
      Some(s"""
        WITH s AS (SELECT doc_id, ${DedupOps.simhashSql(60)} AS sig
                   FROM (SELECT doc_id,
                                list_transform(string_split(text,' '),
                                               w -> CAST(('0x'||substr(md5(w),1,15)) AS BIGINT)) AS xs
                         FROM documents))
        SELECT sig, CAST(min(doc_id) AS BIGINT) AS keep_id,
               CAST(2*count(*) AS BIGINT) AS n_seen
        FROM s GROUP BY sig
        ORDER BY keep_id"""),
      (s, dir) => {
        val docsSchema = graft.Tables.t(s, dir, "documents").schema
        runStagedToMemoryTable(s, dir, "documents", "st09", "complete", copies = 2)(
          src => s.readStream.schema(docsSchema).parquet(src)
            .select(col("doc_id"),
              graft.functions.TextFunctions.simhashSig(col("text"), bits = 60).as("sig"))
            .groupBy(col("sig"))
            .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_seen")))
          .orderBy(col("keep_id"))
      },
      timed = false),

    // ----- streaming decontamination, value-checked vs the batch join -----
    // The production shape of "filter incoming crawl against eval
    // benchmarks IN-FLIGHT": the eval vocabulary folds to one ~128 KB
    // bloom sketch BATCH-side (d11's build), which rides into the
    // streaming query as a literal — shipped to every micro-batch task
    // once, like Spark's own runtime filters; the probe is a scan-stage
    // expression, so per-batch state is only the per-doc flag aggregate.
    // The source stages every document TWICE: max(flag) is delivery-
    // invariant, and n_shingle_rows (value-checked = 2× the distinct
    // shingle count) proves both copies actually flowed through the
    // probe. recall_ok (bloom ⊇ exact — no false negatives, a sketch
    // property DuckDB cannot replay) and fp_ok (measured fp ≤ 1% + 1)
    // are computed from the streamed flags and PINNED in the oracle;
    // n_docs / n_exact are value-checked against the batch join.
    QuerySpec(
      "st10_streaming_decontaminate",
      Some(s"""
        WITH ${DedupOps.sgCte},
             ev AS (SELECT DISTINCT unnest(g) AS sh FROM sg WHERE doc_id < 10),
             ex AS (SELECT DISTINCT c.doc_id
                    FROM (SELECT doc_id, unnest(g) AS sh FROM sg WHERE doc_id >= 10) c
                    JOIN ev ON c.sh = ev.sh)
        SELECT d.source, count(*) AS n_docs,
               CAST(count(*) FILTER (d.doc_id IN (SELECT doc_id FROM ex)) AS BIGINT) AS n_exact,
               CAST(coalesce(sum(2*sg2.nsh), 0) AS BIGINT) AS n_shingle_rows,
               true AS recall_ok, true AS fp_ok
        FROM documents d
        LEFT JOIN (SELECT doc_id, len(g) AS nsh FROM sg WHERE len(g) > 0) sg2
               ON sg2.doc_id = d.doc_id
        WHERE d.doc_id >= 10
        GROUP BY d.source
        ORDER BY d.source"""),
      (s, dir) => {
        import graft.functions.BloomFunctions
        val docsB = graft.Tables.t(s, dir, "documents")
        val sg = graft.operators.NearDup.shingleSets(docsB)
        val evalSh = sg.filter(col("doc_id") < 10)
          .select(explode(col("g")).as("sh")).distinct()
        // batch-built sketch (one small-side action, map-side merged)
        val sketchBytes = evalSh
          .agg(BloomFunctions.bloomFilterAgg(col("sh"), 4096, 1L << 20).as("sk"))
          .head().getAs[Array[Byte]]("sk")
        val perDoc = runStagedToMemoryTable(s, dir, "documents", "st10", "complete", copies = 2)(
          src => s.readStream.schema(docsB.schema).parquet(src)
            .filter(col("doc_id") >= 10)
            .select(col("doc_id"),
              explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("sh"))
            .groupBy(col("doc_id"))
            .agg(max(BloomFunctions.mightContain(lit(sketchBytes), col("sh"))).as("bloom_hit"),
              count(lit(1)).as("n_sh_rows")))
        // batch legs: exact contamination + per-source summary
        val ex = sg.filter(col("doc_id") >= 10)
          .select(col("doc_id"), explode(col("g")).as("sh"))
          .join(evalSh, "sh").select(col("doc_id")).distinct()
          .withColumn("exact_hit", lit(true))
        val bloomHit = coalesce(col("bloom_hit"), lit(false))
        docsB.filter(col("doc_id") >= 10).select(col("source"), col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .join(ex, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("exact_hit"), 1)).as("n_exact"),
            coalesce(sum(col("n_sh_rows")), lit(0L)).as("n_shingle_rows"),
            // pinned true in the oracle: a false negative (impossible for
            // a correct sketch) or an fp blow-up fails the hash
            (count(when(col("exact_hit") && !bloomHit, 1)) === 0).as("recall_ok"),
            (count(when(bloomHit && col("exact_hit").isNull, 1)) <=
              (count(lit(1)) / 100).cast("long") + 1).as("fp_ok"))
          .orderBy(col("source"))
      },
      timed = false),

    // ----- streaming ANN serving from the materialized index -----
    // The query-side production loop: a STREAM of search requests served
    // micro-batch by micro-batch against the static s12 index layout
    // (bits from the footer, probe values pushed into the scan). The
    // serving call needs a bounded batch and a driver-side probe-value
    // collection, so the composition is `foreachBatch` — the standard
    // seam for batch operators inside a stream — writing each batch's
    // answers to an append sink. The source stages every query TWICE
    // (arriving in the same or different batches — the gate must not
    // depend on which): queries dedup within a batch before serving, and
    // identical re-served answers collapse in the final distinct because
    // the whole derivation is deterministic to the bit. The oracle is
    // s12's full SQL replay — the streamed serving must give exactly the
    // one-shot batch answer.
    QuerySpec(
      "st11_streaming_ann_serving",
      Some(s"""
        WITH n AS (SELECT vec_id, embedding, ${SimilarityOps.normSql("embedding")} AS nrm,
                          ${SimilarityOps.signBucketSql("embedding", 4)} AS bucket
                   FROM embeddings),
             p AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn,
                          unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                                  xor(bucket, 4), xor(bucket, 8)]) AS probe
                   FROM n WHERE vec_id % 100 = 0),
             sc AS (SELECT p.query_id, b.vec_id AS neighbor_id,
                           ${SimilarityOps.dotSql("p.qe", "b.embedding")} / (p.qn * b.nrm) AS cos
                    FROM p JOIN n b ON b.bucket = p.probe AND b.vec_id != p.query_id),
             rk AS (SELECT query_id, neighbor_id, cos,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos DESC, neighbor_id ASC) AS rank
                    FROM sc)
        SELECT query_id, rank, neighbor_id, round(cos, 9) AS cos
        FROM rk WHERE rank <= 3
        ORDER BY query_id, rank"""),
      (s, dir) => {
        val idxPath = SimilarityOps.annIndex(s, dir)
        val emb = graft.Tables.t(s, dir, "embeddings")
        val src = stageSource(dir, "embeddings", "st11", copies = 2)
        val outDir = java.nio.file.Files.createTempDirectory("st11_out").toString
        val q = s.readStream.schema(emb.schema).parquet(src)
          .filter(col("vec_id") % 100 === 0)
          .select(col("vec_id"), col("embedding"))
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            // re-delivery within one batch must not double candidates
            val queries = batch.dropDuplicates("vec_id")
            if (!queries.isEmpty) {
              graft.operators.Ann.annTopKIndexed(s, idxPath, queries, k = 3, probes = 5)
                .write.mode("append").parquet(outDir)
            }
            ()
          }
          .trigger(Trigger.AvailableNow()).start()
        awaitBounded(q, "st11")
        s.read.parquet(outDir).distinct()
          .orderBy(col("query_id"), col("rank"))
      },
      timed = false,
      prepare = Some((s, dir) => { SimilarityOps.annIndex(s, dir); () })),

    // ----- streaming incremental dedup vs a static history (d17's form) -----
    // The streaming face of the snapshot-ingest shape: NEW documents
    // arrive as a stream and near-dup-check against the STATIC kept
    // archive via two stateless stream-static joins per micro-batch
    // (bands for candidates, shingle sets for the exact verify) — no
    // growing state beyond the per-doc flag aggregate, since history is
    // a static frame re-read per batch exactly like st06's dimension.
    // Every new doc is staged TWICE: min/min_by make the flag delivery-
    // invariant. The oracle is d17's batch derivation verbatim — the
    // streamed flags must equal the one-shot batch answer row-for-row.
    QuerySpec(
      "st12_streaming_incremental_dedup",
      Some(s"""
        WITH ${DedupOps.pairsCte},
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
        import graft.functions.TextFunctions
        val docsB = graft.Tables.t(s, dir, "documents")
        val sgH = graft.operators.NearDup.shingleSets(docsB.filter(col("doc_id") % 2 === 0))
        val histBands = sgH.select(col("doc_id").as("hist_id"),
          posexplode(TextFunctions.minhashSig(col("g"), 4)).as(Seq("seed_h", "mhv_h")))
        val histSets = sgH.select(col("doc_id").as("hist_id"), col("g").as("gh"))
        runStagedToMemoryTable(s, dir, "documents", "st12", "complete", copies = 2)(
          src => {
            val newSg = s.readStream.schema(docsB.schema).parquet(src)
              .filter(col("doc_id") % 2 === 1)
              .select(col("doc_id"),
                TextFunctions.wordShingles(col("text"), 3).as("gn"))
            val inter = size(array_intersect(col("gn"), col("gh")))
            newSg
              .select(col("doc_id"), col("gn"),
                posexplode(TextFunctions.minhashSig(col("gn"), 4)).as(Seq("seed", "mhv")))
              .join(histBands,
                col("seed") === col("seed_h") && col("mhv") === col("mhv_h"))
              // no candidate dedup: multi-seed matches (and the staged
              // double delivery) only multiply rows into a min/min_by
              // aggregate, which is multiplicity-invariant — and a
              // streaming dropDuplicates would add cross-batch state
              .select(col("doc_id"), col("gn"), col("hist_id"))
              .join(histSets, "hist_id")
              .select(col("doc_id"), col("hist_id"),
                (inter.cast("double") / (size(col("gn")) + size(col("gh")) - inter))
                  .as("jaccard"))
              .filter(col("jaccard") >= 0.6)
              .groupBy(col("doc_id"))
              .agg(min(col("hist_id")).as("hist_id"),
                round(min_by(col("jaccard"), col("hist_id")), 9).as("jaccard"))
          })
          .orderBy(col("doc_id"))
      },
      timed = false),

    // ----- streaming incremental dedup served from the BAND INDEX -----
    // st12's production form (the d21 relationship replayed streaming):
    // each micro-batch of new documents probes the MATERIALIZED archive
    // band index (built once, untimed prepare) through
    // NearDup.dedupAgainstHistoryIndexed inside foreachBatch — per-batch
    // cost is O(batch + candidates) with the batch's band keys pushed
    // into the index scan (asserted for a real batch), never the
    // st12-inline shape that re-derives history bands every trigger.
    // Double delivery collapses in the final min/min_by aggregate (the
    // st12 invariance argument). Oracle = d17's batch derivation: the
    // streamed, indexed flags must equal the one-shot inline answer.
    QuerySpec(
      "st20_streaming_incremental_dedup_indexed",
      Some(s"""
        WITH ${DedupOps.pairsCte},
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
        val idxPath = DedupOps.bandIndex(s, dir)
        val docsB = graft.Tables.t(s, dir, "documents")
        val src = stageSource(dir, "documents", "st20", copies = 2)
        val outDir = java.nio.file.Files.createTempDirectory("st20_out").toString
        val pushed = new java.util.concurrent.atomic.AtomicBoolean(false)
        val q = s.readStream.schema(docsB.schema).parquet(src)
          .filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text"))
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            if (!batch.isEmpty) {
              val (_, flagged, release) = graft.operators.NearDup
                .dedupAgainstHistoryIndexed(s, idxPath, batch, tau = 0.6,
                  maxPushdownKeys = 65536)
              // the batch's band keys must prune the index SCAN (the d21
              // in-gate discipline, checked on a live micro-batch plan)
              val scans = flagged.queryExecution.sparkPlan.collect {
                case f: org.apache.spark.sql.execution.FileSourceScanExec
                    if f.metadata.getOrElse("Location", "").contains("bands") =>
                  f.metadata.getOrElse("PushedFilters", "")
              }
              if (scans.nonEmpty && scans.forall(_.contains("In(bkey")))
                pushed.set(true)
              flagged.write.mode("append").parquet(outDir)
              release()
            }
            ()
          }
          .trigger(Trigger.AvailableNow()).start()
        awaitBounded(q, "st20")
        require(pushed.get(),
          "streaming indexed dedup must push batch band keys into the bands scan")
        s.read.parquet(outDir)
          .groupBy(col("doc_id"))
          .agg(min(col("hist_id")).as("hist_id"),
            round(min_by(col("jaccard"), col("hist_id")), 9).as("jaccard"))
          .orderBy(col("doc_id"))
      },
      timed = false,
      prepare = Some((s, dir) => { DedupOps.bandIndex(s, dir); () })),

    // ----- the DECLARATIVE sink: writeStream.format("portable-delta") -----
    // st13's exactly-once contract through the round-14 DECLARATIVE
    // route, composed with the declarative read: two arrival waves
    // stream through writeStream.format("portable-delta") under ONE
    // checkpoint (the second wave is a genuine RESTART — new files in
    // the same source dir, same checkpoint, so recovery + incremental
    // delivery are exercised, not just one run), the txn watermark in
    // the LOG keys by the checkpoint location, an empty third restart
    // commits nothing, and the value check reads back through
    // spark.read.format("portable-delta") — sink and source surfaces
    // verified against each other and against DuckDB in one gate.
    QuerySpec(
      "st21_streaming_format_sink",
      Some("""
        SELECT event_type,
               CAST(2 * count(*) AS BIGINT) AS n_rows,
               CAST(2 * CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS BIGINT)
                 AS value_cents,
               true AS restart_exact
        FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        val src = stageSource(dir, "events", "st21", copies = 1)
        val tbl = java.nio.file.Files.createTempDirectory("st21_delta").toString + "/tbl"
        val ck = java.nio.file.Files.createTempDirectory("st21_ck").toString
        val fileSchema = s.read.parquet(src).schema
        def run(): Unit = awaitBounded(
          s.readStream.schema(fileSchema)
            .option("maxFilesPerTrigger", "1").parquet(src)
            .select(col("event_id"), col("event_type"), col("value"))
            .writeStream.format("portable-delta")
            .option("path", tbl)
            .option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start(), "st21")
        run() // wave 1
        val nWave1 = PortableDelta.readTable(s, tbl).count()
        // wave 2 arrives; SAME checkpoint → a restart delivers ONLY it
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          java.nio.file.Paths.get(src, "events_2.parquet"))
        run()
        val conf = s.sessionState.newHadoopConf()
        val snap = PortableDelta.snapshot(conf, tbl)
        require(snap.txns.get(ck).contains(1L),
          s"txn watermark must key by the checkpoint location at batch 1: ${snap.txns}")
        require(PortableDelta.readTable(s, tbl).count() == 2 * nWave1,
          "the restart must deliver exactly the second wave")
        run() // nothing new: no commit at all
        require(PortableDelta.snapshot(conf, tbl).version == snap.version,
          "an empty restart must not commit")
        val back = s.read.format("portable-delta").load(tbl)
        back.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
          .withColumn("restart_exact", lit(true))
          .orderBy(col("event_type"))
      },
      timed = false),

    // ----- the DECLARATIVE source: readStream.format("portable-delta") -----
    // st22 (round 15): the declarative READ to match st21's declarative
    // sink — a V1 StreamSourceProvider whose offsets live in SPARK'S
    // checkpoint (no engine-side watermark file). Three runs over ONE
    // checkpoint: run 1 delivers the table's initial snapshot; two
    // appends land; run 2 restarts, delivers EXACTLY ONE commit per
    // trigger (maxVersionsPerTrigger=1, st18's one-version discipline,
    // asserted from the batch count) and is STOPPED after the first
    // batch — a genuine mid-stream kill; run 3 restarts from the offset
    // log alone and delivers exactly the remaining commit. The in-gate
    // requires pin the offset tokens in the checkpoint (plain "v"
    // grammar) and the no-dupe/no-loss composition; the value check
    // aggregates everything delivered (3 legitimate deliveries of the
    // events batch) against DuckDB. At 100 TB: the per-trigger poll is
    // a small-state version read, each batch one bounded scan plan.
    QuerySpec(
      "st22_streaming_format_source",
      Some("""
        SELECT event_type,
               CAST(3 * count(*) AS BIGINT) AS n_rows,
               CAST(3 * CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS BIGINT)
                 AS value_cents,
               true AS restart_exact
        FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        val tbl = java.nio.file.Files.createTempDirectory("st22_delta").toString + "/tbl"
        val out = java.nio.file.Files.createTempDirectory("st22_out").toString + "/rows"
        val ck = java.nio.file.Files.createTempDirectory("st22_ck").toString
        val batch = s.read.parquet(s"$dir/events.parquet")
          .select(col("event_id"), col("event_type"), col("value"))
        PortableDelta.write(batch, tbl)                       // v0
        // the consumer is IDEMPOTENT PER BATCH-ID (overwrite into
        // out/e<epoch>): a crash-replayed epoch overwrites itself —
        // the split of labor Spark's foreachBatch contract assigns
        val kill = new java.util.concurrent.atomic.AtomicBoolean(false)
        def stream() = s.readStream.format("portable-delta")
          .option("maxVersionsPerTrigger", "1").load(tbl)
          .writeStream.option("checkpointLocation", ck)
          .foreachBatch { (b: DataFrame, epoch: Long) =>
            if (!b.isEmpty) {
              b.write.mode("overwrite").parquet(s"$out/e$epoch")
              if (kill.compareAndSet(true, false))
                throw new RuntimeException("st22 injected mid-stream kill")
            }
            ()
          }
        def epochs() = {
          val d = new java.io.File(out)
          if (!d.isDirectory) Seq.empty[String]
          else d.listFiles().filter(_.getName.startsWith("e")).map(_.getName).toSeq
        }
        // run 1: the initial snapshot joins as the first batch
        val q1 = stream().start()
        try q1.processAllAvailable() finally q1.stop()
        require(epochs() == Seq("e0"), s"snapshot must be ONE batch, got ${epochs()}")
        val nSnap = s.read.parquet(s"$out/e0").count()
        PortableDelta.write(batch, tbl, mode = "append")      // v1
        PortableDelta.write(batch, tbl, mode = "append")      // v2
        // run 2: restart; KILLED inside the first batch AFTER its data
        // landed but BEFORE the commit log records it — the genuine
        // crash window Structured Streaming replays from
        kill.set(true)
        val q2 = stream().start()
        try { q2.awaitTermination(300000); () }
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        require(epochs().sorted == Seq("e0", "e1"),
          s"run 2 must die inside its first one-version batch, got ${epochs()}")
        // run 3: the offset log alone REPLAYS the uncommitted epoch 1
        // (idempotent overwrite), then delivers v2 — no dupes, no loss
        val q3 = stream().start()
        try q3.processAllAvailable() finally q3.stop()
        require(epochs().sorted == Seq("e0", "e1", "e2"),
          s"one-version triggers: expected epochs e0..e2, got ${epochs()}")
        require(s.read.parquet(s"$out/e1").count() == nSnap &&
          s.read.parquet(s"$out/e2").count() == nSnap,
          "each append commit must arrive as exactly one one-version batch")
        require(s.read.parquet(s"$out/e0", s"$out/e1", s"$out/e2").count() == 3 * nSnap,
          "restart composition must deliver each commit exactly once")
        // the checkpoint's offsets are the human-readable version grammar
        val offs = new java.io.File(ck, "offsets").listFiles()
          .filter(_.getName.forall(_.isDigit)).map { f =>
            new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
              .linesIterator.toSeq.last
          }.toSeq
        require(offs.nonEmpty && offs.forall(_.forall(_.isDigit)),
          s"expected plain version offsets in the checkpoint, got $offs")
        s.read.parquet(s"$out/e0", s"$out/e1", s"$out/e2")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
          .withColumn("restart_exact", lit(true))
          .orderBy(col("event_type"))
      },
      timed = false),

    // ----- the DECLARATIVE upsert sink: Update mode + mergeKeys -----
    // st23 (round 15): writeStream.format("portable-delta")
    // .outputMode("update").option("mergeKeys","event_id") — each
    // micro-batch MERGEs on the key (update matched, insert new) with
    // the {appId, batchId} txn action. Wave A streams the SAME events
    // file twice (maxFilesPerTrigger=1 → two batches with identical
    // keys): the table must end with ONE copy — the second batch
    // updated, not appended. Wave B streams a value-shifted copy under
    // the same checkpoint: a genuine restart whose batch matches every
    // key — counts unchanged, values updated. The oracle recomputes the
    // final upsert state from the source table.
    QuerySpec(
      "st23_streaming_merge_sink",
      Some("""
        SELECT event_type,
               count(*) AS n_rows,
               CAST(sum(CAST(floor((value + 1000) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               true AS upsert_exact
        FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        val src = stageSource(dir, "events", "st23", copies = 2)
        val tbl = java.nio.file.Files.createTempDirectory("st23_delta").toString + "/tbl"
        val ck = java.nio.file.Files.createTempDirectory("st23_ck").toString
        val fileSchema = s.read.parquet(src).schema
        def run(): Unit = awaitBounded(
          s.readStream.schema(fileSchema)
            .option("maxFilesPerTrigger", "1").parquet(src)
            .select(col("event_id"), col("event_type"), col("value"))
            .writeStream.format("portable-delta")
            .outputMode("update")
            .option("path", tbl)
            .option("checkpointLocation", ck)
            .option("mergeKeys", "event_id")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start(), "st23")
        run() // wave A: two identical batches — upsert, never append
        val nEvents = s.read.parquet(s"$dir/events.parquet").count()
        require(PortableDelta.readTable(s, tbl).count() == nEvents,
          "identical re-delivered keys must UPDATE, not append")
        val snapA = PortableDelta.snapshot(s, tbl)
        require(snapA.txns.get(ck).contains(1L),
          s"per-batch txns must reach batchId 1: ${snapA.txns}")
        // wave B: every value shifted — same keys, new values
        s.read.parquet(s"$dir/events.parquet")
          .select(col("event_id"), col("event_type"),
            (col("value") + 1000).as("value"))
          .coalesce(1).write.mode("overwrite").parquet(s"$src/.wave-b")
        val part = new java.io.File(s"$src/.wave-b").listFiles()
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
        java.nio.file.Files.move(part.toPath,
          new java.io.File(src, "events_b.parquet").toPath)
        run() // restart under the same checkpoint
        require(PortableDelta.readTable(s, tbl).count() == nEvents,
          "a full-match wave must leave the key set unchanged")
        require(PortableDelta.snapshot(s, tbl).version > snapA.version,
          "the matched wave must still commit (values changed)")
        PortableDelta.readTable(s, tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
          .withColumn("upsert_exact", lit(true))
          .orderBy(col("event_type"))
      },
      timed = false),

    // ----- streaming → Delta sink, EXACTLY-once via per-batch txn -----
    // Composes the two round-6/7 pieces: foreachBatch +
    // PortableDelta.write(append) where every micro-batch commits
    // atomically WITH its {appId, batchId} transaction action
    // (EventStream.deltaSink). Two staged copies stream as TWO
    // micro-batches (maxFilesPerTrigger=1), so the table legitimately
    // holds every event twice — then the gate re-delivers an
    // already-committed batchId (the post-crash replay Spark's
    // foreachBatch contract allows) and requires the log version, file
    // set, and row count unchanged: the txn gate skipped it before any
    // data landed. Unlike st11/st12's effectively-once (append sink +
    // distinct on read), a Delta reader of this table needs NO dedup
    // pass — exactly-once lives in the log itself. The oracle doubles
    // the batch aggregate (two legitimate deliveries), exact-cents
    // convention.
    QuerySpec(
      "st13_streaming_delta_exactly_once",
      Some("""
        SELECT event_type,
               CAST(2 * count(*) AS BIGINT) AS n_rows,
               CAST(2 * CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS BIGINT)
                 AS value_cents
        FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        val src = stageSource(dir, "events", "st13", copies = 2)
        val tbl = java.nio.file.Files.createTempDirectory("st13_delta").toString + "/tbl"
        val ck = java.nio.file.Files.createTempDirectory("st13_ck").toString
        val fileSchema = s.read.parquet(src).schema
        val stream = s.readStream.schema(fileSchema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .select(col("event_id"), col("event_type"), col("value"))
        awaitBounded(EventStream.deltaSink(stream, tbl, "st13", ck), "st13")
        val conf = s.sessionState.newHadoopConf()
        val before = PortableDelta.snapshot(conf, tbl)
        // two files → two micro-batches → the txn watermark must be 1
        require(before.txns.get("st13").contains(1L),
          s"expected per-batch txns up to batchId 1, got ${before.txns}")
        val nBefore = PortableDelta.readTable(s, tbl).count()
        // crash-replay simulation: re-deliver an already-committed
        // batchId — the txn gate must skip BEFORE anything lands
        val replayedV = PortableDelta.write(
          s.read.parquet(src).select(col("event_id"), col("event_type"), col("value")),
          tbl, mode = "append", txn = Some(("st13", 1L)))
        val after = PortableDelta.snapshot(conf, tbl)
        require(replayedV == before.version && after.version == before.version &&
          after.files.map(_.path).toSet == before.files.map(_.path).toSet &&
          PortableDelta.readTable(s, tbl).count() == nBefore,
          "re-delivered batch must be a no-op: version/files/rows changed")
        PortableDelta.readTable(s, tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
          .orderBy(col("event_type"))
      },
      timed = false),

    // ----- CDF-driven incremental sync: the downstream never re-reads -----
    // The consumer side of the Change Data Feed: a downstream aggregate
    // (count + cents per event_type) is maintained ONLY from
    // readChanges deltas — inserts add, deletes subtract — across three
    // commits (two appends, then a DELETE). At 100 TB this is the
    // difference between a sync job re-scanning the table per cycle and
    // one that reads exactly the changed files of the changed commits.
    // The in-gate require proves the incremental state equals a direct
    // recompute of the final table IN BOTH DIRECTIONS (except() both
    // ways); the oracle recomputes the final state from the source
    // table. A CDF bug that leaked v2's deletes into the insert stream
    // — or re-reported prior versions — fails the equality and the hash.
    QuerySpec(
      "st14_delta_cdf_sync",
      Some("""
        SELECT event_type,
               count(*) AS n_rows,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               true AS sync_ok
        FROM events
        WHERE event_id % 5 <> 0
        GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        val ev = Tables.t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val tbl = java.nio.file.Files.createTempDirectory("st14").toString + "/tbl"
        val cents = floor(col("value") * 100 + 0.5).cast("long")
        var downstream: org.apache.spark.sql.DataFrame = null
        var lastSeen = -1L
        def sync(): Unit = {
          val cur = PortableDelta.snapshot(s, tbl).version
          val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
          val delta = PortableDelta.readChanges(s, tbl, lastSeen + 1, cur)
            .groupBy(col("event_type"))
            .agg(sum(sign).as("n_rows"), sum(cents * sign).as("value_cents"))
          val merged =
            if (downstream == null) delta
            else downstream.unionByName(delta).groupBy(col("event_type"))
              .agg(sum(col("n_rows")).as("n_rows"),
                sum(col("value_cents")).as("value_cents"))
          val next = merged.filter(col("n_rows") > 0).persist()
          next.count() // materialize before the next round's changes land
          if (downstream != null) downstream.unpersist()
          downstream = next
          lastSeen = cur
        }
        PortableDelta.write(ev.filter(col("event_id") % 2 === 0)
          .repartition(4), tbl)                                        // v0
        sync()
        PortableDelta.write(ev.filter(col("event_id") % 2 === 1)
          .repartition(4), tbl, mode = "append")                       // v1
        sync()
        PortableDelta.delete(s, tbl, col("event_id") % 5 === 0)        // v2
        sync()
        val direct = PortableDelta.readTable(s, tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(cents).as("value_cents"))
        require(downstream.except(direct).isEmpty &&
          direct.except(downstream).isEmpty,
          "incremental CDF state must equal the direct recompute exactly")
        downstream
          .withColumn("sync_ok", lit(true))
          .orderBy(col("event_type"))
      },
      timed = false),

    // ----- streaming CDC UPSERT → Delta MERGE, exactly-once -----
    // The real change-data-capture sink shape: every micro-batch MERGEs
    // on the key (DV-era upsert — matched rows die by deletion vector,
    // inserts append) committing atomically WITH its {appId, batchId}
    // txn action. The staged double delivery makes batch 1 re-apply
    // every key of batch 0 — so the final table holds each event ONCE
    // (st13's append sink legitimately holds it twice), proving
    // merge-dedup; then the gate re-delivers an already-committed
    // batchId and requires version/rows unchanged — the txn gate
    // skipped it before any position scan or staging. Re-delivery of a
    // MERGE is the dangerous replay (an append replays rows; a merge
    // replays row MUTATIONS), which is why the idempotence lives in
    // the DML verb itself. Oracle = the single-copy batch aggregate.
    QuerySpec(
      "st15_streaming_delta_merge",
      Some("""
        SELECT event_type,
               count(*) AS n_rows,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               true AS merge_ok
        FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        val src = stageSource(dir, "events", "st15", copies = 2)
        val tbl = java.nio.file.Files.createTempDirectory("st15_delta").toString + "/tbl"
        val ck = java.nio.file.Files.createTempDirectory("st15_ck").toString
        val fileSchema = s.read.parquet(src).schema
        val stream = s.readStream.schema(fileSchema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .select(col("event_id"), col("event_type"), col("value"))
        awaitBounded(EventStream.deltaMergeSink(
          stream, tbl, Seq("event_id"), "st15", ck), "st15")
        val conf = s.sessionState.newHadoopConf()
        val before = PortableDelta.snapshot(conf, tbl)
        require(before.txns.get("st15").contains(1L),
          s"expected per-batch txns up to batchId 1, got ${before.txns}")
        val single = Tables.t(s, dir, "events").count()
        val nBefore = PortableDelta.readTable(s, tbl).count()
        require(nBefore == single,
          s"MERGE sink must hold each event ONCE: $nBefore != $single")
        // crash-replay: re-deliver batchId 1 as a MERGE — must be a no-op
        val st = PortableDelta.merge(s, tbl,
          s.read.parquet(src)
            .select(col("event_id"), col("event_type"), col("value"))
            .dropDuplicates("event_id"),
          Seq("event_id"), txn = Some(("st15", 1L)))
        val after = PortableDelta.snapshot(conf, tbl)
        require(st.version == before.version && after.version == before.version &&
          st.updatedRows == 0 && st.insertedRows == 0 &&
          PortableDelta.readTable(s, tbl).count() == nBefore,
          "re-delivered MERGE batch must be a no-op")
        PortableDelta.readTable(s, tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
          .withColumn("merge_ok", lit(true))
          .orderBy(col("event_type"))
      },
      timed = false),

    // ----- incremental sync fed by ROW-TRACKING update pairs (no cdc) -----
    // st14's consumer, upgraded to UPDATE semantics WITHOUT change-data
    // files: the table never sets delta.enableChangeDataFeed (the gate
    // pins that _change_data does not exist), yet the downstream
    // aggregate updates exactly — readChanges reconstructs each UPDATE
    // commit as update_preimage/update_postimage PAIRS by stable row ID
    // (delta.enableRowTracking), and the consumer applies them as
    // -pre/+post. At 100 TB this is incremental maintenance of a
    // derived table from file actions alone: no feed storage, no
    // re-scan, work bounded by each commit's changed files.
    QuerySpec(
      "st16_delta_rowtracking_sync",
      Some("""
        WITH fin AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS price
          FROM orders WHERE o_orderkey % 11 <> 0
        )
        SELECT o_orderstatus AS status, count(*) AS n_rows,
               CAST(sum(CAST(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS price_cents,
               true AS sync_ok
        FROM fin GROUP BY 1 ORDER BY status"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        val orders = Tables.t(s, dir, "orders")
          .select(col("o_orderkey").as("okey"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").as("price"))
        val tbl = java.nio.file.Files.createTempDirectory("st16").toString + "/tbl"
        val cents = floor(col("price") * 100 + 0.5).cast("long")
        var downstream: org.apache.spark.sql.DataFrame = null
        var lastSeen = -1L
        def sync(): Unit = {
          val cur = PortableDelta.snapshot(s, tbl).version
          val sign = when(col("_change_type").isin("insert", "update_postimage"),
            1L).otherwise(-1L)
          val delta = PortableDelta.readChanges(s, tbl, lastSeen + 1, cur)
            .groupBy(col("status"))
            .agg(sum(sign).as("n_rows"), sum(cents * sign).as("price_cents"))
          val merged =
            if (downstream == null) delta
            else downstream.unionByName(delta).groupBy(col("status"))
              .agg(sum(col("n_rows")).as("n_rows"),
                sum(col("price_cents")).as("price_cents"))
          val next = merged.filter(col("n_rows") > 0).persist()
          next.count() // materialize before the next round's changes land
          if (downstream != null) downstream.unpersist()
          downstream = next
          lastSeen = cur
        }
        PortableDelta.write(orders.repartition(6), tbl)                // v0
        sync()
        PortableDelta.enableRowTracking(s, tbl)                        // v1
        sync() // backfill is dataChange=false: contributes NOTHING
        val us = PortableDelta.update(s, tbl, col("okey") % 7L === 0L,
          Map("price" -> (col("price") * 2)))                          // v2
        require(us.updatedRows > 0, "gate needs the update to bite")
        sync() // consumed as -preimage/+postimage pairs
        PortableDelta.delete(s, tbl, col("okey") % 11L === 0L)         // v3
        sync()
        require(!new java.io.File(s"$tbl/_change_data").exists(),
          "the pairs must come from file actions, never cdc files")
        val direct = PortableDelta.readTable(s, tbl)
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_rows"), sum(cents).as("price_cents"))
        require(downstream.except(direct).isEmpty &&
          direct.except(downstream).isEmpty,
          "incremental row-tracking state must equal the direct recompute")
        downstream
          .withColumn("sync_ok", lit(true))
          .orderBy(col("status"))
      },
      timed = false),

    // ----- streaming CDF SOURCE: watermark checkpoint, restart-exact -----
    // st14/st16 re-derived their version windows by hand; this is the
    // packaged source ([[graft.streaming.DeltaCdfSource]]): per-trigger
    // reads bounded by maxVersionsPerTrigger, a PERSISTENT version
    // watermark that advances only after the batch commits, and
    // AvailableNow drain semantics. The gate maintains a signed
    // aggregate purely from the source across five commits (append,
    // append, row-tracked UPDATE, row-ID-preserving MERGE, DELETE)
    // with maxVersionsPerTrigger=1
    // — ≥3 real triggers — RESTARTS the consumer mid-stream from the
    // checkpoint (a fresh instance resumes at the stored watermark,
    // nothing re-delivered, nothing skipped), and pins that a
    // caught-up source returns no batch. Equality vs direct recompute
    // in both except() directions; oracle recomputes the final state.
    QuerySpec(
      "st17_delta_cdf_source",
      Some("""
        WITH s1 AS (
          SELECT event_id, event_type,
                 CASE WHEN event_id % 7 = 0 THEN value * 2
                      ELSE value END AS v
          FROM events
        ), fin AS (
          SELECT event_type,
                 CASE WHEN event_id % 13 = 0 THEN v * 3 ELSE v END AS v
          FROM s1 WHERE event_id % 5 <> 0
        )
        SELECT event_type, count(*) AS n_rows,
               CAST(sum(CAST(floor(v * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               true AS stream_ok
        FROM fin GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        import graft.streaming.DeltaCdfSource
        val ev = Tables.t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val tbl = java.nio.file.Files.createTempDirectory("st17").toString + "/tbl"
        val ck = java.nio.file.Files.createTempDirectory("st17_ck").toString
        val cents = floor(col("value") * 100 + 0.5).cast("long")
        var downstream: org.apache.spark.sql.DataFrame = null
        def apply(changes: org.apache.spark.sql.DataFrame, to: Long): Unit = {
          val sign = when(col("_change_type")
            .isin("insert", "update_postimage"), 1L).otherwise(-1L)
          val delta = changes.groupBy(col("event_type"))
            .agg(sum(sign).as("n_rows"), sum(cents * sign).as("value_cents"))
          val merged =
            if (downstream == null) delta
            else downstream.unionByName(delta).groupBy(col("event_type"))
              .agg(sum(col("n_rows")).as("n_rows"),
                sum(col("value_cents")).as("value_cents"))
          val next = merged.filter(col("n_rows") > 0).persist()
          next.count() // durable before the watermark may advance
          if (downstream != null) downstream.unpersist()
          downstream = next
        }
        // four commits land BEFORE the consumer starts — the source
        // must window them itself
        PortableDelta.write(ev.filter(col("event_id") % 2 === 0)
          .repartition(4), tbl)                                        // v0
        PortableDelta.write(ev.filter(col("event_id") % 2 === 1)
          .repartition(4), tbl, mode = "append")                       // v1
        PortableDelta.enableRowTracking(s, tbl)                        // v2
        PortableDelta.update(s, tbl, col("event_id") % 7 === 0,
          Map("value" -> (col("value") * 2)))                          // v3
        // a MERGE commit feeds the same pairs path: matched rows keep
        // their target row IDs (the round-10 carry-over), so the source
        // sees update pairs for a MERGE too — never delete+insert
        PortableDelta.merge(s, tbl,
          PortableDelta.readTable(s, tbl)
            .filter(col("event_id") % 13 === 0)
            .withColumn("value", col("value") * 3),
          keys = Seq("event_id"), insertNotMatched = false)            // v4
        PortableDelta.delete(s, tbl, col("event_id") % 5 === 0)        // v5
        // consumer 1 processes exactly two 1-version triggers, then
        // "crashes" (is dropped) with its watermark at v1
        val src1 = new DeltaCdfSource(s, tbl, ck, maxVersionsPerTrigger = 1)
        var triggers = 0
        for (_ <- 0 until 2) src1.readAvailable().foreach { case (df, to) =>
          apply(df, to.version); src1.commitProgress(to); triggers += 1
        }
        require(triggers == 2 && src1.watermark == 1L,
          s"expected 2 one-version triggers, watermark 1, got $triggers/" +
            s"${src1.watermark}")
        // consumer 2 restarts from the CHECKPOINT and drains the rest
        // (v2's backfill is dataChange=false: a real trigger, zero rows)
        val src2 = new DeltaCdfSource(s, tbl, ck, maxVersionsPerTrigger = 1)
        triggers += src2.runAvailableNow(apply)
        require(triggers == 6 && src2.watermark == 5L,
          s"restart must resume at the stored watermark: $triggers triggers, " +
            s"watermark ${src2.watermark}")
        // caught up: a third instance sees nothing (no re-delivery)
        require(new DeltaCdfSource(s, tbl, ck).readAvailable().isEmpty,
          "a caught-up source must return no batch")
        require(!new java.io.File(s"$tbl/_change_data").exists(),
          "the update pairs must come from file actions, never cdc files")
        val direct = PortableDelta.readTable(s, tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(cents).as("value_cents"))
        require(downstream.except(direct).isEmpty &&
          direct.except(downstream).isEmpty,
          "source-fed state must equal the direct recompute exactly")
        downstream
          .withColumn("stream_ok", lit(true))
          .orderBy(col("event_type"))
      },
      timed = false),

    // ----- PLAIN delta streaming source (append stream, no CDF) -----
    // delta-spark's `readStream.format("delta")` shape over the
    // portable log ([[graft.streaming.DeltaTableSource]]): per-trigger
    // version windows of APPENDED rows, dataChange=false commits
    // (OPTIMIZE) contributing zero rows, restart-exact watermark, and
    // the initial-snapshot mode a second consumer uses to join late.
    // The gate replays a 3-append history one version per trigger
    // (restarting mid-stream), pins the OPTIMIZE trigger at zero rows,
    // equals the aggregate against direct recompute in both except()
    // directions, then has a snapshot-mode consumer reproduce the same
    // state in one batch. Oracle recomputes the final aggregate.
    QuerySpec(
      "st18_delta_table_source",
      Some("""
        SELECT event_type, count(*) AS n_rows,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               true AS stream_ok
        FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        import graft.streaming.DeltaTableSource
        val ev = Tables.t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val tbl = java.nio.file.Files.createTempDirectory("st18").toString + "/tbl"
        val ck = java.nio.file.Files.createTempDirectory("st18_ck").toString
        val cents = floor(col("value") * 100 + 0.5).cast("long")
        var downstream: org.apache.spark.sql.DataFrame = null
        var cached: org.apache.spark.sql.DataFrame = null
        def apply(rows: org.apache.spark.sql.DataFrame, to: Long): Unit = {
          val delta = rows.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_rows"), sum(cents).as("value_cents"))
          val merged =
            if (downstream == null) delta
            else downstream.unionByName(delta).groupBy(col("event_type"))
              .agg(sum(col("n_rows")).as("n_rows"),
                sum(col("value_cents")).as("value_cents"))
          val next = merged.persist()
          next.count() // durable before the watermark may advance
          if (cached != null) cached.unpersist()
          cached = next
          // TRUNCATE lineage per round (CLAUDE.md iterative-loop rule):
          // the state frame reads the round's cache through a fresh plan
          // root, so trigger N never re-analyzes a chain of N-1 unions
          downstream = s.createDataFrame(next.rdd, next.schema)
        }
        // three appends + one compaction land BEFORE the consumer starts
        PortableDelta.write(ev.filter(col("event_id") % 3 === 0)
          .repartition(2), tbl)                                      // v0
        PortableDelta.write(ev.filter(col("event_id") % 3 === 1)
          .repartition(2), tbl, mode = "append")                     // v1
        val os = PortableDelta.optimizeCompact(s, tbl)               // v2
        require(os.removedFiles >= 2,
          "gate needs the compaction to rewrite files")
        PortableDelta.write(ev.filter(col("event_id") % 3 === 2)
          .repartition(2), tbl, mode = "append")                     // v3
        // consumer 1: full-history replay, one version per trigger;
        // processes two triggers then "crashes"
        val src1 = new DeltaTableSource(s, tbl, ck,
          maxVersionsPerTrigger = 1, startingVersion = Some(0L))
        var triggers = 0
        for (_ <- 0 until 2) src1.readAvailable().foreach { case (df, off) =>
          apply(df, off.version); src1.commitProgress(off); triggers += 1
        }
        require(triggers == 2 && src1.watermark.contains(1L),
          s"expected 2 one-version triggers, got $triggers/${src1.watermark}")
        // consumer 1': restarts from the checkpoint; drains v2 (the
        // OPTIMIZE — must be a real trigger with ZERO rows) and v3
        val src2 = new DeltaTableSource(s, tbl, ck,
          maxVersionsPerTrigger = 1, startingVersion = Some(0L))
        val counted = Seq.newBuilder[(Long, Long)]
        triggers += src2.runAvailableNow { (df, to) =>
          counted += ((to, df.count())); apply(df, to)
        }
        require(triggers == 4 && src2.watermark.contains(3L),
          s"restart must resume at the watermark: $triggers, ${src2.watermark}")
        require(counted.result().exists(t => t._1 == 2L && t._2 == 0L),
          "the dataChange=false OPTIMIZE version must deliver zero rows")
        require(new DeltaTableSource(s, tbl, ck).readAvailable().isEmpty,
          "a caught-up source must return no batch")
        val direct = PortableDelta.readTable(s, tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(cents).as("value_cents"))
        require(downstream.except(direct).isEmpty &&
          direct.except(downstream).isEmpty,
          "append-stream state must equal the direct recompute exactly")
        // a LATE consumer joins via the initial-snapshot batch and
        // reaches the same state in one trigger
        val ck2 = java.nio.file.Files.createTempDirectory("st18_ck2").toString
        val late = new DeltaTableSource(s, tbl, ck2)
        val Some((snapRows, off2)) = late.readAvailable()
        val lateAgg = snapRows.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(cents).as("value_cents"))
        require(off2.version == 3L && lateAgg.except(direct).isEmpty &&
          direct.except(lateAgg).isEmpty,
          "the snapshot batch must equal the direct read")
        downstream
          .withColumn("stream_ok", lit(true))
          .orderBy(col("event_type"))
      },
      timed = false),

    // ----- Rate-limited INITIAL-SNAPSHOT slicing (Sv:k offsets) -----
    // The 100-TB late-joiner path (round 11 offsets, round 12 executor-
    // side slicing): a consumer with no offset under maxFilesPerTrigger
    // drains the pinned snapshot SLICE-WISE in deterministic file order
    // — the pinned ordering is a persisted range sort over the
    // checkpoint's add rows; only each slice's files reach the driver.
    // The gate pins: ≥4 slice triggers over a checkpoint-seeded table,
    // a mid-drain crash/restart resuming at the Sv:k offset with no
    // duplicate or lost rows, a RACING APPEND excluded from the pinned
    // snapshot but delivered as the follow-up append window, and the
    // final state equal to the direct read. Oracle recomputes the
    // aggregate over events (the racing slice is % 7 = 3 of % 7 <= 3).
    QuerySpec(
      "st19_snapshot_slice_drain",
      Some("""
        SELECT event_type, count(*) AS n_rows,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               true AS slice_ok
        FROM events
        WHERE event_id % 7 <= 3
        GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        import graft.stac.PortableDelta
        import graft.streaming.DeltaTableSource
        val ev = Tables.t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val tbl = java.nio.file.Files.createTempDirectory("st19").toString + "/tbl"
        val ck = java.nio.file.Files.createTempDirectory("st19_ck").toString
        val cents = floor(col("value") * 100 + 0.5).cast("long")
        // the big pre-existing table: 12 files, checkpoint-seeded, log
        // truncated — slicing must run off the checkpoint's add frame
        PortableDelta.write(ev.filter(col("event_id") % 7 <= 2)
          .repartition(12), tbl)                                     // v0
        PortableDelta.checkpoint(s, tbl)
        PortableDelta.cleanupLog(s.sessionState.newHadoopConf(), tbl)
        var rows = 0L
        var slices = 0
        var downstream: org.apache.spark.sql.DataFrame = null
        var cached: org.apache.spark.sql.DataFrame = null
        def apply(df: org.apache.spark.sql.DataFrame): Unit = {
          val delta = df.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_rows"), sum(cents).as("value_cents"))
          val merged =
            if (downstream == null) delta
            else downstream.unionByName(delta).groupBy(col("event_type"))
              .agg(sum(col("n_rows")).as("n_rows"),
                sum(col("value_cents")).as("value_cents"))
          val next = merged.persist()
          next.count()
          if (cached != null) cached.unpersist()
          cached = next
          // TRUNCATE lineage per round (CLAUDE.md iterative-loop rule)
          downstream = s.createDataFrame(next.rdd, next.schema)
        }
        // consumer: no offset, 3 files per trigger → snapshot slices;
        // two slices then a "crash"
        val src1 = new DeltaTableSource(s, tbl, ck, maxFilesPerTrigger = Some(3))
        for (_ <- 0 until 2) src1.readAvailable().foreach { case (df, off) =>
          require(off.snapshot && !off.complete && off.version == 0L,
            s"mid-drain offsets must be Sv:k at the pinned version: $off")
          rows += df.count(); apply(df); src1.commitProgress(off); slices += 1
        }
        require(slices == 2 && src1.offset.exists(o =>
          o.snapshot && o.filesConsumed == 6),
          s"expected 2×3-file slices consumed: ${src1.offset}")
        // a commit RACES the drain: pinned at v0, the snapshot must not
        // see it; it arrives after the drain as an append window
        PortableDelta.write(ev.filter(col("event_id") % 7 === 3)
          .repartition(2), tbl, mode = "append")                     // v1
        // restart: a fresh source resumes at the Sv:k offset — the
        // remaining slices + the racing append, nothing re-delivered
        val src2 = new DeltaTableSource(s, tbl, ck, maxFilesPerTrigger = Some(3))
        val offs = Seq.newBuilder[String]
        val n2 = src2.runAvailableNow { (df, _) =>
          rows += df.count(); apply(df)
          offs += src2.offset.map(_.token).getOrElse("")
        }
        slices += n2
        // offset tokens observed entering each resumed batch (the
        // callback runs before commitProgress): the restart point S0:6,
        // the next slice's S0:9, the completed snapshot's plain version;
        // the racing append commits last — serialization regressions
        // fail BY TOKEN
        require(offs.result() == Seq("S0:6", "S0:9", "0") &&
          src2.offset.map(_.token).contains("1"),
          s"expected S0:6 → S0:9 → 0 → 1 offsets, got ${offs.result()} " +
            s"then ${src2.offset.map(_.token)}")
        val snapTotal = ev.filter(col("event_id") % 7 <= 2).count()
        val raceTotal = ev.filter(col("event_id") % 7 === 3).count()
        require(rows == snapTotal + raceTotal,
          s"slice-wise drain must deliver exactly once: $rows of " +
            s"${snapTotal + raceTotal}")
        require(slices >= 5,
          s"a 12-file snapshot at 3 files/trigger must take ≥4 slices + " +
            s"the append window, got $slices")
        val direct = PortableDelta.readTable(s, tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(cents).as("value_cents"))
        require(downstream.except(direct).isEmpty &&
          direct.except(downstream).isEmpty,
          "sliced state must equal the direct read exactly")
        require(new DeltaTableSource(s, tbl, ck,
          maxFilesPerTrigger = Some(3)).readAvailable().isEmpty,
          "a caught-up slicing source must return no batch")
        downstream
          .withColumn("slice_ok", lit(true))
          .orderBy(col("event_type"))
      },
      timed = false)
  )
}
