package graft.queries

import graft.stac.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Largest-remainder invariants of d12's temperature allocation, fuzzed:
  * whatever the per-source counts, the integer allocations must sum to
  * the budget EXACTLY, and each allocation must be the floor or ceiling
  * of its exact rational share (the defining property of the method —
  * no source can be off by a whole unit from proportionality). */
class MixingSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  test("property: allocations sum to the budget and stay within one of the exact share") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val nSources = 2 + rnd.nextInt(30)
      val counts = (0 until nSources)
        .map(i => (f"src$i%02d", 1L + rnd.nextInt(100000)))
        .toDF("source", "n_docs")
      val budget = 1L + rnd.nextInt(10000000)
      val rows = DedupOps.temperatureAllocation(counts, budget)
        .select("source", "wt", "alloc").collect()
      assert(rows.map(_.getLong(2)).sum == budget, s"seed=$seed: sum != budget")
      val wTotal = rows.map(_.getLong(1)).sum
      rows.foreach { r =>
        // exact rational share in BigInt space: floor(budget*wt/W)
        val fl = (BigInt(budget) * r.getLong(1) / wTotal).toLong
        assert(r.getLong(2) == fl || r.getLong(2) == fl + 1,
          s"seed=$seed ${r.getString(0)}: alloc ${r.getLong(2)} not in {$fl, ${fl + 1}}")
      }
    }
  }
}
