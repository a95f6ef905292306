package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType

/** Column surface over Spark's built-in bloom-filter sketch machinery
  * (`org.apache.spark.util.sketch.BloomFilter` behind the
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions that
  * power Spark's own runtime join filters — InjectRuntimeFilter builds
  * exactly this pair). Spark registers neither as a SQL function, so this
  * module exposes them, hashed the same way the runtime-filter path does
  * (XxHash64 with the default seed).
  *
  * Determinism: a Bloom filter is an OR of bit positions — insertion
  * order, partitioning, and merge order cannot change the final bitset,
  * and XxHash64 is seed-fixed, so `mightContain` results are exactly
  * reproducible run-over-run for the same key set and parameters (no
  * false negatives ever; false positives deterministic). Gate queries can
  * therefore pin bloom-derived booleans in their oracles.
  *
  * Scale: the aggregate is a TypedImperativeAggregate with partial
  * aggregation — each map task builds a local filter and only the
  * `numBits`-sized buffers shuffle, never the keys; the built filter is a
  * single row that broadcasts to the probe side.
  */
object BloomFunctions {

  /** Aggregate: build a bloom filter over the (xxhash64-hashed) values of
    * `c`. `expectedItems` sizes the hash count; `numBits` the bitset. */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftSqlShim.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftSqlShim.expression(c))),
        Literal(expectedItems, LongType),
        Literal(numBits, LongType)).toAggregateExpression())

  /** Predicate: does the filter (built by [[bloomFilterAgg]]) possibly
    * contain `c`? No false negatives; deterministic false positives. */
  def mightContain(bloom: Column, c: Column): Column =
    GraftSqlShim.column(
      BloomFilterMightContain(
        GraftSqlShim.expression(bloom),
        new XxHash64(Seq(GraftSqlShim.expression(c)))))
}
