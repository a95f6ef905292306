package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing through [[TopKAggregator]]. */
final case class Scored(score: Double, id: Long)

/** Bounded per-group top-k as a typed aggregate with PARTIAL aggregation —
  * the scale-correct alternative to `row_number().over(partitionBy(g))`
  * for top-k-per-group: a window must shuffle EVERY scored row to the
  * group's reducer before ranking, while an aggregate keeps a k-element
  * buffer per group per map task and shuffles only those buffers
  * (ObjectHashAggregate partial → merge). For exact k-NN over a corpus of
  * n rows and q queries, the shuffle drops from n·q scored rows to
  * q·partitions k-element buffers.
  *
  * Determinism: the comparator (score desc, id asc) is a total order, so
  * the surviving set and its order are independent of partitioning and
  * merge order.
  */
final class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k >= 1, s"k must be >= 1, got $k")

  /** true when a ranks strictly better than b. java.lang.Double.compare
    * gives Spark's sort semantics for the score — NaN greater than every
    * value and equal to itself — so a NaN score ranks FIRST under
    * descending order, exactly like the `row_number().over(orderBy(desc))`
    * window this aggregate replaces (raw `>`/`==` would instead rank NaN
    * last and silently diverge). */
  private def better(a: Scored, b: Scored): Boolean = {
    // -0.0 folds to 0.0 first: Spark normalizes signed zeros before sort
    // (NormalizeFloatingNumbers), Double.compare orders them
    def n(x: Double) = if (x == 0.0) 0.0 else x
    val c = java.lang.Double.compare(n(a.score), n(b.score))
    c > 0 || (c == 0 && a.id < b.id)
  }

  /** buffer invariant: sorted best-first, length <= k. */
  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.length >= k && !better(x, buf.last)) buf
    else {
      val (pre, post) = buf.span(e => better(e, x))
      (pre ++ (x +: post)).take(k)
    }

  override def zero: Seq[Scored] = Vector.empty
  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = insert(buf, in)
  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = b.foldLeft(a)(insert)
  override def finish(r: Seq[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** Column function: `topK(k)(scoreCol, idCol)` aggregates to the sorted
    * top-k Seq[Scored] for the group. */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAggregator(k), ExpressionEncoder[Scored]())
    (score, id) => f(score, id)
  }
}
