package graft.plans

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BboxIntersectsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def boxes = Seq(
    (1L, Some((0.0, 0.0, 2.0, 2.0))),   // overlaps query box
    (2L, Some((5.0, 5.0, 6.0, 6.0))),   // disjoint
    (3L, Some((3.0, 0.0, 4.0, 1.0))),   // touches query xmax edge
    (4L, None)                          // null bbox
  ).toDF("id", "t")
    .select(col("id"), when(col("t").isNotNull,
      struct(col("t._1").as("xmin"), col("t._2").as("ymin"),
        col("t._3").as("xmax"), col("t._4").as("ymax"))).as("bbox"))

  test("expression semantics: overlap, disjoint, edge-touch inclusive, null") {
    val got = boxes
      .select(col("id"), BboxFunctions.bboxIntersects(col("bbox"), 1.0, 1.0, 3.0, 3.0).as("hit"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(got(1L) == true)   // overlaps
    assert(got(2L) == false)  // disjoint
    assert(got(3L) == true)   // xmin == query xmax: touching counts (<=)
    assert(got(4L) == null)   // null bbox → null, filter drops it
  }

  test("rewrite rule opens the predicate into pushed bbox.* bounds on parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("bbx").toString
    boxes.filter(col("bbox").isNotNull).write.mode("overwrite").parquet(tmp)
    BboxFunctions.armRewrite(spark)
    val q = spark.read.parquet(tmp)
      .filter(BboxFunctions.bboxIntersects(col("bbox"), 1.0, 1.0, 3.0, 3.0))
      .select("id")
    val plan = q.queryExecution.executedPlan.toString
    // the rendered PushedFilters list truncates, so assert the leading
    // bounds only — DataFilters above it shows all four conjuncts
    assert(plan.contains("PushedFilters: [LessThanOrEqual(bbox.xmin") &&
      plan.contains("GreaterThanOrEqual(bbox.xmax"),
      s"expected pushed bbox bounds:\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("rewritten filter equals direct evaluation on every row") {
    // the rule only rewrites Filter conditions, so the select path below
    // is genuine expression eval even on an armed session — the two
    // paths' agreement is a real rewrite≡eval check
    val direct = boxes
      .select(col("id"), BboxFunctions.bboxIntersects(col("bbox"), 1.0, 1.0, 3.0, 3.0).as("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    BboxFunctions.armRewrite(spark)
    val filtered = boxes
      .filter(BboxFunctions.bboxIntersects(col("bbox"), 1.0, 1.0, 3.0, 3.0))
      .collect().map(_.getLong(0)).toSet
    assert(filtered == direct.collect { case (id, true) => id }.toSet)
  }

  test("projection context keeps eval's null-on-null-field semantics (no rewrite)") {
    // a disjoint x-range with a NULL ymin: the 4-conjunct form would give
    // FALSE (false AND null), eval gives NULL — the rule must not rewrite
    // outside Filter, so the select sees NULL either way
    BboxFunctions.armRewrite(spark)
    val row = Seq(5L).toDF("id")
      .select(col("id"), struct(lit(0.0).as("xmin"), lit(null).cast("double").as("ymin"),
        lit(0.5).as("xmax"), lit(2.0).as("ymax")).as("bbox"))
      .select(BboxFunctions.bboxIntersects(col("bbox"), 10.0, 1.0, 20.0, 3.0).as("h"))
      .collect()(0)
    assert(row.isNullAt(0))
  }

  test("SQL surface: bbox_intersects registers and rewrites") {
    graft.GraftFunctions.register(spark)
    BboxFunctions.armRewrite(spark)
    boxes.createOrReplaceTempView("bbx_view")
    // plain int and decimal literals must coerce (the registration casts
    // the bounds to double)
    val ids = spark.sql(
      "SELECT id FROM bbx_view WHERE bbox_intersects(bbox, 1, 1.0, 3, 3.0)")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L))
  }
}
