package graft.plans

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BboxIntersectsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** A session armed with [[graft.GraftExtensions]] (post-hoc covering
    * rewrite) on the SAME SparkContext — extensions only apply at
    * session construction, so the shared session can't be retrofitted.
    * The shared default/active session is restored immediately. */
  private lazy val armedSession: org.apache.spark.sql.SparkSession = {
    val base = spark // force the shared session first
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8, 3]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(base)
    org.apache.spark.sql.SparkSession.setActiveSession(base)
    s
  }

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

  test("foreign covering: the footer-declared bounds columns push; results equal exact eval") {
    import graft.stac.{GeoFunctions, GeoParquetCovering, GeoParquetFileFormat}
    // a FOREIGN GeoParquet shape: geometry column "geom", covering
    // struct "bounds" with minx/miny/maxx/maxy — none of this engine's
    // own bbox conventions
    val rows = Seq(
      (1L, (0.0, 0.0, 2.0, 2.0)),  // overlaps the query rect
      (2L, (5.0, 5.0, 6.0, 6.0)),  // disjoint
      (3L, (3.0, 0.0, 4.0, 1.0)))  // touches the query xmax edge
    val df = rows.toDF("id", "t").select(col("id"),
      graft.stac.GeoFunctions.bbox_polygon_wkb(col("t._1"), col("t._2"),
        col("t._3"), col("t._4")).as("geom"),
      struct(col("t._1").as("minx"), col("t._2").as("miny"),
        col("t._3").as("maxx"), col("t._4").as("maxy")).as("bounds"))
    val geoJson =
      """{"version":"1.1.0","primary_column":"geom","columns":{"geom":{
        |"encoding":"WKB","covering":{"bbox":{
        |"xmin":["bounds","minx"],"ymin":["bounds","miny"],
        |"xmax":["bounds","maxx"],"ymax":["bounds","maxy"]}}}}}"""
        .stripMargin.replace("\n", "")
    val tmp = java.nio.file.Files.createTempDirectory("foreigngpq").toString + "/t"
    df.write.format("geoparquet")
      .option(GeoParquetFileFormat.OptionPrefix + "geo", geoJson).save(tmp)
    val armed = armedSession
    val back = GeoParquetCovering.read(armed, tmp)
    val q = back.filter(
        GeoParquetCovering.stIntersectsRect(col("geom"), 1.0, 1.0, 3.0, 3.0))
      .select("id")
    val plan = q.queryExecution.executedPlan.toString
    // the rendered PushedFilters list truncates (the original-test
    // lesson) — the IsNotNull guards lead it; the bound compares show in
    // the un-truncated Filter condition over the same bounds fields
    assert(plan.contains("PushedFilters: [IsNotNull(bounds.minx") &&
      plan.contains(".minx <= 3.0") && plan.contains(".maxx >= 1.0") &&
      plan.contains(".miny <= 3.0") && plan.contains(".maxy >= 1.0"),
      s"expected the DECLARED covering bounds pushed:\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // same answer as raw exact evaluation with no covering metadata
    val raw = spark.read.parquet(tmp)
      .filter(GeoParquetCovering.stIntersectsRect(col("geom"), 1.0, 1.0, 3.0, 3.0))
      .collect().map(_.getLong(0)).toSet
    assert(raw == Set(1L, 3L))
  }

  test("no covering declared: read passes through; the exact filter still works") {
    import graft.stac.GeoParquetCovering
    val tmp = java.nio.file.Files.createTempDirectory("plaingpq").toString + "/t"
    Seq((1L, (0.0, 0.0, 2.0, 2.0)), (2L, (5.0, 5.0, 6.0, 6.0))).toDF("id", "t")
      .select(col("id"), graft.stac.GeoFunctions.bbox_polygon_wkb(
        col("t._1"), col("t._2"), col("t._3"), col("t._4")).as("geom"))
      .write.parquet(tmp)
    val got = GeoParquetCovering.read(armedSession, tmp)
      .filter(GeoParquetCovering.stIntersectsRect(col("geom"), 1.0, 1.0, 3.0, 3.0))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("SQL surface: st_intersects_rect registers; covering rewrite fires on the armed session") {
    import graft.stac.{GeoParquetCovering, GeoParquetFileFormat}
    val armed = armedSession
    val rows = Seq((1L, (0.0, 0.0, 2.0, 2.0)), (2L, (5.0, 5.0, 6.0, 6.0)))
    val df = rows.toDF("id", "t").select(col("id"),
      graft.stac.GeoFunctions.bbox_polygon_wkb(col("t._1"), col("t._2"),
        col("t._3"), col("t._4")).as("geom"),
      struct(col("t._1").as("minx"), col("t._2").as("miny"),
        col("t._3").as("maxx"), col("t._4").as("maxy")).as("bounds"))
    val geoJson =
      """{"version":"1.1.0","primary_column":"geom","columns":{"geom":{
        |"encoding":"WKB","covering":{"bbox":{
        |"xmin":["bounds","minx"],"ymin":["bounds","miny"],
        |"xmax":["bounds","maxx"],"ymax":["bounds","maxy"]}}}}}"""
        .stripMargin.replace("\n", "")
    val tmp = java.nio.file.Files.createTempDirectory("sqlgpq").toString + "/t"
    df.write.format("geoparquet")
      .option(GeoParquetFileFormat.OptionPrefix + "geo", geoJson).save(tmp)
    GeoParquetCovering.read(armed, tmp).createOrReplaceTempView("covered_view")
    // int and decimal literals coerce (the registration casts to double)
    val got = armed.sql(
      "SELECT id FROM covered_view WHERE st_intersects_rect(geom, 1, 1.0, 3, 3.0)")
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(bounds.minx"),
      s"SQL path must get the covering pushdown too:\n$plan")
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
