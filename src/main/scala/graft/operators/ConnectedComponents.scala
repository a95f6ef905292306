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
  * stable at any scale. Convergence is an exact driver-side check of a
  * single aggregate (sum of labels strictly decreases until fixpoint).
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (src, dst), any orientation
    * @return (id, component) — component = min id reachable */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val src = edges.columns(0)
    val dst = edges.columns(1)
    // persist the input FIRST: the undirected union references it twice,
    // and without the cache each branch would recompute the (possibly
    // expensive) edge derivation
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val und = e.select(col(src).as("x"), col(dst).as("y"))
      .union(e.select(col(dst).as("x"), col(src).as("y")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = und.select(col("x").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum("component"), lit(0L))).head().getLong(0)
    // sentinel: the first iteration must run regardless, so don't pay a
    // separate job just to materialize the starting sum
    var prevSum = -1L

    while (!converged && iter < maxIter) {
      val prop = und.join(labels.withColumnRenamed("id", "y"), "y")
        .select(col("x").as("id"), col("component"))
      val next = labels.union(prop)
        .groupBy("id").agg(min("component").as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    und.unpersist()
    e.unpersist()
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] converged after $iter iterations")
    labels
  }
}
