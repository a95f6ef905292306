package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Min-label propagation connected components over an edge list — the
  * clustering step of near-duplicate deduplication (candidate pairs →
  * duplicate clusters → keep one representative per cluster).
  *
  * Each iteration is one shuffle (join labels to undirected edges + min
  * aggregate); iterations = cluster diameter, which for dup clusters
  * (near-cliques out of LSH) is small. Labels persist per round and the
  * previous round unpersists — lineage stays O(1) deep, so the loop is
  * stable at any scale.
  *
  * Job economy (the local-mode cost is per-action scheduling, and at
  * cluster scale every extra action is an extra pass over the labels):
  *   - the seed IS the first propagation hop: `min(id, min(neighbors))`
  *     per vertex, fusing the vertex-distinct and hop 1 into one shuffle;
  *   - each iteration carries the previous label through the min-aggregate
  *     (null-tagged on the propagated rows — min ignores nulls, so the
  *     carry is exact for ANY orderable label type, not just numeric), so
  *     the exact changed-vertex count comes out of the SAME aggregate that
  *     materializes the round — one action per round, with convergence
  *     detected by a direct per-vertex label comparison rather than a
  *     label-sum proxy that relies on strict monotonic decrease.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (src, dst), any orientation
    * @param loopShuffleWidth shuffle-partition count scoped to the
    *   iteration loop. The iteration state is the candidate-VERTEX set —
    *   orders of magnitude smaller than the corpus the pairs came from —
    *   so running each round at the session's corpus-sized shuffle width
    *   schedules mostly-empty tasks every iteration. Size this to the
    *   label state (rows / a few million per partition), not to the
    *   session default; None keeps the session width.
    * @param autoWidth derive the loop width from the SEED's vertex count
    *   (~2M labels per partition, floored at 8, capped at the session
    *   width) — the same sizing rule callers used to pay a separate
    *   edge-count action for, now read from the seed materialization the
    *   loop runs anyway (one fewer action per clustering; results are
    *   width-invariant either way). Ignored when loopShuffleWidth is set.
    * @return (id, component) — component = min id reachable */
  def run(edges: DataFrame, maxIter: Int = 25,
          loopShuffleWidth: Option[Int] = None,
          autoWidth: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions")
    loopShuffleWidth.foreach(w => spark.conf.set("spark.sql.shuffle.partitions", w))
    try runLoop(edges, maxIter, autoWidth && loopShuffleWidth.isEmpty)
    finally spark.conf.set("spark.sql.shuffle.partitions", sessionWidth)
  }

  private def runLoop(edges: DataFrame, maxIter: Int,
                      autoWidth: Boolean): DataFrame = {
    val spark = edges.sparkSession
    val src = edges.columns(0)
    val dst = edges.columns(1)
    // persist the input FIRST: the undirected union references it twice,
    // and without the cache each branch would recompute the (possibly
    // expensive) edge derivation
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val und = e.select(col(src).as("x"), col(dst).as("y"))
      .union(e.select(col(dst).as("x"), col(src).as("y")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Each round ends in a SQL-LINEAGE TRUNCATION (createDataFrame over
    // the round's RDD): the persist alone bounds recomputation, but the
    // LOGICAL plan would still chain every round's joins, and Catalyst
    // re-analyzes the whole tree on every downstream action — composed
    // pipelines over the CC output (d16) paid minutes of analyzer time
    // for microseconds of data. The truncated frame's plan is a one-node
    // LogicalRDD whose RDD scans the round's cache (partition loss
    // recomputes through the cached round — fault tolerance keeps the
    // RDD-lineage path).
    def truncate(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)

    // seed = hop 1: component(v) = min(v, min(neighbors(v)))
    var cached = und.groupBy("x")
      .agg(min("y").as("mn"))
      .select(col("x").as("id"), least(col("x"), col("mn")).as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (autoWidth) {
      // the seed count IS the loop state size; the count action also
      // materializes e/und/seed before the first round (the seed itself
      // ran at the session width — one exchange, width immaterial there)
      val nVertices = cached.count()
      val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val width = math.max(8, math.min(sessionWidth,
        (nVertices / 2000000L).toInt + 1))
      spark.conf.set("spark.sql.shuffle.partitions", width)
    }
    var labels = truncate(cached)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // null sentinel (not a numeric max): min(prev) over {old_label, null…}
      // is the old label for any label type — a typed max sentinel would
      // coerce string labels and make the change-check lexicographic
      val labelType = labels.schema("component").dataType
      val prop = und.join(labels.withColumnRenamed("id", "y"), "y")
        .select(col("x").as("id"), col("component"), lit(null).cast(labelType).as("prev"))
      val next = labels
        .select(col("id"), col("component"), col("component").as("prev"))
        .unionByName(prop)
        .groupBy("id")
        .agg(min("component").as("component"), min("prev").as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // single action: materializes the round's cache AND yields the exact
      // number of vertices whose label improved this round
      val changed = next
        .agg(count(when(col("component") < col("prev"), 1)).as("c"))
        .head().getLong(0)
      cached.unpersist()
      cached = next
      labels = truncate(next)
      converged = changed == 0L
      iter += 1
    }
    und.unpersist()
    e.unpersist()
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] converged after $iter iterations")
    labels.select("id", "component")
  }
}
