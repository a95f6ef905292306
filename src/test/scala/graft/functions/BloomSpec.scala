package graft.functions

import graft.GraftFunctions
import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bloom sketch surface (d11's engine): Spark's runtime-filter
  * expressions exposed as SQL functions and as the Column API in
  * [[BloomFunctions]]. Pins the two properties gate oracles rely on:
  * zero false negatives, and bit-for-bit determinism across independent
  * builds (the bitset is an OR — partitioning and merge order can't
  * change it). */
class BloomSpec extends AnyFunSuite {

  test("no false negatives, deterministic bits, sane false positives") {
    val spark = SparkSpec.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    (0 until 500).map(i => s"key_$i").toDF("k").createOrReplaceTempView("bloom_keys")
    // member probes: every inserted key must hit
    val hits = spark.sql("""
      SELECT count(IF(bloom_might_contain(
               (SELECT bloom_filter_agg(k, 1024, 65536) FROM bloom_keys), k), 1, NULL)) AS n
      FROM bloom_keys""").collect()(0).getLong(0)
    assert(hits == 500L, "bloom filters must have no false negatives")
    // two independent builds (different partitioning) → identical bytes
    val a = spark.table("bloom_keys").repartition(7)
      .agg(BloomFunctions.bloomFilterAgg(col("k"), 1024L, 65536L).as("bf"))
      .head().getAs[Array[Byte]](0)
    val b = spark.table("bloom_keys").repartition(3)
      .agg(BloomFunctions.bloomFilterAgg(col("k"), 1024L, 65536L).as("bf"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b), "bloom bits must not depend on partitioning")
    // non-member probes via the Column API with the materialized sketch
    // (the bloom side of might_contain must be foldable or a subquery —
    // a shipped sketch is the foldable form)
    val fps = (1000 until 2000).map(i => s"other_$i").toDF("k")
      .filter(BloomFunctions.mightContain(lit(a), col("k")))
      .count()
    assert(fps <= 30, s"fp count $fps way past the sizing's expectation")
  }

  test("SQL arity errors") {
    val spark = SparkSpec.spark
    GraftFunctions.register(spark)
    intercept[Exception](spark.sql("SELECT bloom_filter_agg('x')").collect())
    intercept[Exception](spark.sql("SELECT bloom_might_contain(CAST(NULL AS BINARY))").collect())
  }
}
