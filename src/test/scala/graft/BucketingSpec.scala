package graft

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the pre-shuffle strategy for repeated
  * fact-fact joins at scale: both tables bucketed by the join key at write
  * time join without any Exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without a shuffle on either side") {
    val db = "graft_buckets"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.li_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.ord_b")
    // a previously-interrupted run can leave the managed location behind
    // without a catalog entry; Spark then refuses to recreate the table
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("li_b", "ord_b").foreach { t =>
      val dir = java.nio.file.Paths.get(wh, s"$db.db", t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable(s"$db.li_b")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable(s"$db.ord_b")

    // at sf0.001 the small side would auto-broadcast and bypass the
    // bucketed path entirely; disable broadcast to plan the co-located
    // sort-merge join a fact-fact join gets at scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    val joined = spark.table(s"$db.li_b")
      .join(spark.table(s"$db.ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()

    // compare against the plain (shuffling) join for correctness
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)

    // the join itself must not exchange either side: with both tables
    // bucketed by the key into the same bucket count, neither join key is
    // ever hash-partitioned — the only exchange is the groupBy's
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join over bucketed tables:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join should read co-located buckets with no join-key shuffle:\n$plan")
    assert(plan.contains("Bucketed: true") && plan.contains("SelectedBucketsCount"),
      "scans should be bucketed")

    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
