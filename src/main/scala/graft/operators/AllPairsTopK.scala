package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global top-k over all unordered row pairs ("closest pairs")
  * WITHOUT broadcasting either side — the memory-safe exact path for
  * embedding near-dup detection (reference capability class: the dedup /
  * similarity pipeline stage; no reference counterpart — the reference
  * delegates analytics to the stored format).
  *
  * Shape: triangle (block-pair) partitioning. Rows hash into `blocks`
  * blocks; each unordered block pair (i ≤ j) is one shuffle key. A row in
  * block x is replicated to the pairs where x is the lesser block (role a)
  * and to the pairs where x is the greater block (role b), so every
  * unordered row pair meets in EXACTLY one task:
  *   - cross-block pair (p < q): a-copy of the p row joins the b-copy of
  *     the q row under key (p,q) — counted once by construction;
  *   - same-block pair: only under the diagonal key (p,p), ordered by id.
  *
  * Cost model at scale: replication is ~blocks/2 copies per row, each task
  * holds 2·n/blocks rows, so executor memory is O(n/blocks) — tunable —
  * while compute stays the inherent O(n²) of an EXACT all-pairs answer.
  * For sub-quadratic compute, accept approximation and route to the
  * LSH-bucketed / IVF paths (SimilarityOps s03/s04).
  *
  * Per-task top-k runs on the join's existing hash(bp) partitioning (no
  * extra exchange), then the global top-k is a TakeOrdered over
  * k·blocks²/2 survivors.
  *
  * `score` must be SYMMETRIC in its two payload arguments (cross-block
  * pairs may present the rows in either order; ids are re-ordered with
  * least/greatest on output).
  */
object AllPairsTopK {

  /** Adaptive physical choice (the AQE idea at operator granularity): a
    * cheap limit-bounded count probe picks between
    *   - a broadcast nested-loop plan when one copy of the input fits an
    *     executor comfortably (≤ broadcastThreshold rows) — one stage, no
    *     replication, the fast plan for re-rank-sized inputs; and
    *   - the block-pair plan above for anything larger — never broadcasts,
    *     executor memory O(n/blocks).
    * Both produce the identical exact answer.
    *
    * @param df      input; `idCol` plus any payload columns
    * @param idCol   unique id column (output pairs ordered id_a < id_b)
    * @param k       global number of pairs to keep
    * @param score   symmetric scorer over two payload structs (higher = closer)
    * @param blocks  block count; executor memory scales as n/blocks
    * @param broadcastThreshold row count under which the broadcast plan wins
    * @return (id_a, id_b, score) — exact top-k by (score desc, id_a, id_b)
    */
  def closestPairs(df: DataFrame, idCol: String,
                   score: (Column, Column) => Column,
                   k: Int, blocks: Int = 8,
                   broadcastThreshold: Long = 100000L): DataFrame = {
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    // clamp BEFORE adding 1: threshold+1 can overflow Long, and a probe
    // capped at Int.MaxValue rows cannot distinguish larger inputs — any
    // threshold at/above the cap routes to the blocked plan unprobed
    val capped = math.min(broadcastThreshold, Int.MaxValue - 1L)
    if (broadcastThreshold > capped) closestPairsBlocked(df, idCol, score, k, blocks)
    else {
      val probe = df.select(col(idCol)).limit((capped + 1).toInt).count()
      if (probe <= broadcastThreshold) closestPairsBroadcast(df, idCol, score, k)
      else closestPairsBlocked(df, idCol, score, k, blocks)
    }
  }

  /** Broadcast nested-loop exact closest pairs — small inputs only (the
    * caller guards size). */
  private def closestPairsBroadcast(df: DataFrame, idCol: String,
                                    score: (Column, Column) => Column, k: Int): DataFrame = {
    val payload = df.columns.filterNot(_ == idCol)
    val base = df.select(col(idCol).as("_id"), struct(payload.map(col): _*).as("_p"))
    val a0 = base.select(col("_id").as("id_a"), col("_p").as("_pa"))
    // the broadcast nested-loop streams this side, so its partition count
    // IS the scoring parallelism: spread an under-partitioned input (the
    // toy single-row-group case — n·k/2 dot products would run in one
    // task); an already-wide input keeps its partitioning (the shuffle
    // would buy nothing). ≤ broadcastThreshold rows move — always cheap.
    val width = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val a = if (a0.rdd.getNumPartitions * 2 >= width) a0
            else a0.repartition(col("id_a"))
    val b = base.select(col("_id").as("id_b"), col("_p").as("_pb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), score(col("_pa"), col("_pb")).as("score"))
      .orderBy(col("score").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Block-pair exact closest pairs — the no-broadcast scale plan. */
  def closestPairsBlocked(df: DataFrame, idCol: String,
                          score: (Column, Column) => Column,
                          k: Int, blocks: Int = 8): DataFrame = {
    val b = blocks
    val payload = df.columns.filterNot(_ == idCol)
    val base = df.select(col(idCol).as("_id"), struct(payload.map(col): _*).as("_p"))
      .withColumn("_blk", pmod(hash(col("_id")), lit(b)))
    val sideA = base
      .withColumn("_j", explode(sequence(col("_blk"), lit(b - 1))))
      .select((col("_blk") * b + col("_j")).as("_bp"), col("_blk").as("_blka"),
        col("_id").as("_ida"), col("_p").as("_pa"))
    val sideB = base
      .withColumn("_i", explode(sequence(lit(0), col("_blk"))))
      .select((col("_i") * b + col("_blk")).as("_bpb"), col("_blk").as("_blkb"),
        col("_id").as("_idb"), col("_p").as("_pb"))
    // blka <= blkb holds by construction; the diagonal key orders by id so
    // same-block pairs appear once
    val pairs = sideA.join(sideB, col("_bp") === col("_bpb") &&
        (col("_blka") =!= col("_blkb") || col("_ida") < col("_idb")))
      .select(col("_bp"),
        least(col("_ida"), col("_idb")).as("id_a"),
        greatest(col("_ida"), col("_idb")).as("id_b"),
        score(col("_pa"), col("_pb")).as("score"))
    val w = Window.partitionBy(col("_bp"))
      .orderBy(col("score").desc, col("id_a"), col("id_b"))
    pairs.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k)
      .select(col("id_a"), col("id_b"), col("score"))
      .orderBy(col("score").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Guard for a side that is about to be broadcast/collected: hard-errors
    * past `maxRows` with the documented routing instead of OOMing an
    * executor. The probe reads at most maxRows+1 rows (limit-pushdown). */
  def requireBroadcastable(df: DataFrame, what: String, route: String,
                           maxRows: Long = 100000L): DataFrame = {
    val capped = math.min(maxRows, Int.MaxValue - 1L)
    require(maxRows == capped,
      s"maxRows=$maxRows exceeds the probe's Int.MaxValue row cap — a guard that can't probe that many rows can't enforce the bound")
    val n = df.limit((capped + 1).toInt).count()
    require(n <= maxRows,
      s"$what has >$maxRows rows — too large to broadcast; $route")
    df
  }
}
