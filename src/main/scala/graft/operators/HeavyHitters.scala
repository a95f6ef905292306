package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

import scala.collection.mutable

/** Bounded-memory frequent-items candidates (Misra–Gries) as a typed
  * aggregate with PARTIAL aggregation — the scale-correct first pass of
  * exact heavy-hitters over a corpus whose term domain is too large to
  * groupBy: the full `groupBy(term)` shuffles every distinct term; this
  * aggregate keeps a k-entry summary per map task and shuffles ONLY those
  * summaries (ObjectHashAggregate partial → merge).
  *
  * Guarantee (Misra–Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS '12): after reducing n items, each summary entry
  * undercounts its term by at most n/(k+1), and every term with true
  * frequency > n/(k+1) is PRESENT in the summary. The merge subtracts the
  * (k+1)-th largest count when the union overflows k entries, which
  * preserves the same total-error bound — so the guarantee holds across
  * partitions and AQE re-plans.
  *
  * The candidate SET depends on arrival order (any MG run does); callers
  * must therefore re-verify candidates exactly (a candidate-filtered
  * count) before emitting results — the verified output is then
  * deterministic and independent of partitioning, which is what the d/t
  * gate queries rely on.
  *
  * The buffer is a MUTABLE hash map updated in place (the Aggregator
  * contract allows returning the mutated buffer): with ObjectHashAggregate
  * the buffer lives as a JVM object between arrivals, so the hot path is
  * one hash probe + counter bump with zero allocation, and the Kryo
  * buffer encoder only runs at the partial/merge shuffle boundary.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** Classic MG step: hit → increment; room → insert at 1; full → decrement
    * every counter (the arrival itself is absorbed by the decrement). The
    * O(k) decrement sweep triggers at most once per k arrivals in
    * aggregate, so the amortized cost stays O(1) per item. */
  override def reduce(
      buf: mutable.HashMap[String, Long], t: String): mutable.HashMap[String, Long] = {
    buf.get(t) match {
      case Some(c)              => buf.update(t, c + 1)
      case None if buf.size < k => buf.update(t, 1L)
      case None                 =>
        buf.filterInPlace((_, c) => c > 1).mapValuesInPlace((_, c) => c - 1)
    }
    buf
  }

  /** Mergeable-summaries merge: sum counts, then if over capacity subtract
    * the (k+1)-th largest count from everything and drop the non-positive
    * remainder — the summed error bounds add, keeping error ≤ n/(k+1). */
  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      val kth = a.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      a.filterInPlace((_, c) => c > kth).mapValuesInPlace((_, c) => c - kth)
    }
    a
  }

  /** Sorted for a stable display; consumers treat this as a SET. */
  override def finish(r: mutable.HashMap[String, Long]): Seq[String] =
    r.keys.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

object HeavyHitters {
  /** Column function: `mgCandidates(k)(termCol)` aggregates the group's
    * terms to the ≤ k Misra–Gries survivors — a guaranteed superset of
    * every term with relative frequency above 1/(k+1). */
  def mgCandidates(k: Int): Column => Column = {
    val f = org.apache.spark.sql.functions.udaf(
      new MisraGriesAggregator(k), ExpressionEncoder[String]())
    term => f(term)
  }
}
