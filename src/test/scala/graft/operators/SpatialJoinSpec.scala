package graft.operators

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The grid join must be EXACTLY the brute-force cross join on every
  * input — the property the stac12 oracle checks on one dataset, here
  * fuzzed over random boxes (boundary-aligned edges, negative coords,
  * degenerate zero-area boxes) and several cell sizes, plus the
  * reference-point dedup invariant (each pair exactly once). */
class SpatialJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  private def randomBoxes(seed: Long, n: Int, prefix: String) = {
    val rnd = new scala.util.Random(seed)
    // quarter-unit grid keeps doubles exact; spans 0 (degenerate) to 12
    val rows = (0 until n).map { i =>
      val x = (rnd.nextInt(160) - 80) * 0.25
      val y = (rnd.nextInt(160) - 80) * 0.25
      (i.toLong, x, y, x + rnd.nextInt(49) * 0.25, y + rnd.nextInt(49) * 0.25)
    }
    rows.toDF(s"${prefix}id", s"${prefix}x0", s"${prefix}y0", s"${prefix}x1", s"${prefix}y1")
  }

  test("property: grid join ≡ brute force over random boxes and cell sizes") {
    for (seed <- 1 to 3; cell <- Seq(1.0, 4.0, 10.0)) {
      val a = randomBoxes(seed, 60, "a")
      val b = randomBoxes(seed + 100, 80, "b")
      val grid = SpatialJoin.bboxJoin(a, b, cell,
          Seq("ax0", "ay0", "ax1", "ay1"), Seq("bx0", "by0", "bx1", "by1"))
        .select(col("aid"), col("bid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = a.crossJoin(b)
        .filter(col("ax0") <= col("bx1") && col("ax1") >= col("bx0") &&
          col("ay0") <= col("by1") && col("ay1") >= col("by0"))
        .select(col("aid"), col("bid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(grid.length == grid.distinct.length,
        s"seed=$seed cell=$cell: reference-point dedup emitted a pair twice")
      assert(grid.sorted.toSeq == brute.sorted.toSeq,
        s"seed=$seed cell=$cell: grid join diverged from brute force")
      assert(brute.nonEmpty, s"seed=$seed: degenerate fixture, no overlaps")
    }
  }

  test("boundary-exact edges: touching boxes intersect, cell-aligned corners dedup once") {
    val a = Seq((1L, 0.0, 0.0, 10.0, 10.0)).toDF("aid", "ax0", "ay0", "ax1", "ay1")
    val b = Seq(
      (1L, 10.0, 10.0, 12.0, 12.0),  // touches at the single corner point (10,10)
      (2L, 10.0, 0.0, 14.0, 4.0),    // shares the x=10 edge
      (3L, -5.0, -5.0, 0.0, 0.0),    // touches at (0,0), negative coords
      (4L, 20.0, 20.0, 30.0, 30.0))  // disjoint
      .toDF("bid", "bx0", "by0", "bx1", "by1")
    val got = SpatialJoin.bboxJoin(a, b, cell = 10.0,
        Seq("ax0", "ay0", "ax1", "ay1"), Seq("bx0", "by0", "bx1", "by1"))
      .select("bid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("empty sides produce an empty result, not an error") {
    val a = Seq((1L, 0.0, 0.0, 10.0, 10.0)).toDF("aid", "ax0", "ay0", "ax1", "ay1")
    val none = Seq.empty[(Long, Double, Double, Double, Double)]
      .toDF("bid", "bx0", "by0", "bx1", "by1")
    assert(SpatialJoin.bboxJoin(a, none, 10.0,
      Seq("ax0", "ay0", "ax1", "ay1"), Seq("bx0", "by0", "bx1", "by1")).count() == 0)
  }

  test("input validation: bad cell, arity, colliding names") {
    val df = Seq((1L, 0.0, 0.0, 1.0, 1.0)).toDF("id", "x0", "y0", "x1", "y1")
    intercept[IllegalArgumentException](
      SpatialJoin.bboxJoin(df, df, 0.0, Seq("x0", "y0", "x1", "y1"), Seq("x0", "y0", "x1", "y1")))
    intercept[IllegalArgumentException](
      SpatialJoin.bboxJoin(df, df, 1.0, Seq("x0"), Seq("x0", "y0", "x1", "y1")))
    intercept[IllegalArgumentException](
      SpatialJoin.bboxJoin(df, df, 1.0, Seq("x0", "y0", "x1", "y1"), Seq("x0", "y0", "x1", "y1")))
  }
}
