package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match points to the intervals containing them —
  * `p.key = i.key AND i.lo <= p.t AND p.t < i.hi`.
  *
  * Catalyst plans a raw range predicate as BroadcastNestedLoop (or a
  * key-equi join followed by a filter, which explodes when keys are hot).
  * This operator buckets time: each interval is exploded to the buckets it
  * overlaps, points map to their single bucket, and the join becomes an
  * equi-join on (key, bucket) followed by the exact containment filter —
  * the shuffle carries `intervals × ceil(span/bucket)` + `points` rows, and
  * bucket width tunes the replication/selectivity trade-off (pick it near
  * the median interval span so replication is O(1) per interval).
  *
  * @param points      point rows
  * @param intervals   interval rows
  * @param key         equi-key column name on both sides
  * @param t           point time column (integral type)
  * @param lo,hi       interval bound columns (integral; lo inclusive, hi exclusive)
  * @param bucketWidth bucket size in the time unit
  */
object RangeJoin {

  /** Times must be non-negative (epoch-style); `div` truncation and floor
    * agree there, keeping Spark and SQL oracles bucket-aligned. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      t: String, lo: String, hi: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // hi is exclusive: an interval touching a bucket boundary at hi does not
    // occupy that bucket — hence (hi - 1) div b. Integer `div`, not `/`
    // (which is double division on longs and drifts past 2^53).
    val expanded = intervals
      .withColumn("__bucket", explode(sequence(
        expr(s"CAST(`$lo` AS BIGINT) div $bucketWidth"),
        expr(s"(CAST(`$hi` AS BIGINT) - 1) div $bucketWidth"))))
    val bucketed = points.withColumn("__bucket",
      expr(s"CAST(`$t` AS BIGINT) div $bucketWidth"))
    bucketed.join(expanded, Seq(key, "__bucket"))
      .filter(col(lo) <= col(t) && col(t) < col(hi))
      .drop("__bucket")
  }
}
