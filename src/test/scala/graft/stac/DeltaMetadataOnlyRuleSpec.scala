package graft.stac

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[OptimizeDeltaMetadataOnlyAgg]] — the implicit COUNT/MIN/MAX-from-
  * log-stats rewrite over portable-delta relations. Contracts: fires
  * only on the sound shapes (global agg, bare relation), replaces the
  * scan with a one-row LocalRelation whose values are bit-identical to
  * the full scan, and FALLS BACK (never errors) on filters, unsupported
  * aggregates, DV-carrying tables (min/max), and the conf kill switch. */
class DeltaMetadataOnlyRuleSpec extends AnyFunSuite {

  private lazy val spark = { val s = SparkSpec.spark
    OptimizeDeltaMetadataOnlyAgg.arm(s); s }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pdmeta").toString + "/tbl"

  private def mkTable(): String = {
    val s = spark; import s.implicits._
    val path = tmp()
    val df = (0L until 200L)
      .map(i => (i, i * 1.5, s"s${i % 7}", (i % 360 - 180).toDouble))
      .toDF("id", "price", "tag", "x")
      .withColumn("bbox", struct(col("x").as("xmin"), (col("x") + 1).as("xmax")))
      .drop("x")
      .repartitionByRange(5, col("id"))
    PortableDelta.write(df.filter(col("id") < 120), path)
    PortableDelta.write(df.filter(col("id") >= 120), path, mode = "append")
    path
  }

  private def hasScan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }.nonEmpty

  private def isMetadataOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    !hasScan(df) && df.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l }.nonEmpty

  test("count/min/max (incl. nested leaf) answer from stats — no scan") {
    val path = mkTable()
    val rel = spark.read.format("portable-delta").load(path)
    val q = rel.agg(count(lit(1)).as("cnt"),
      min("id").as("min_id"), max("id").as("max_id"),
      min("price").as("min_p"), max("tag").as("max_t"),
      min(col("bbox.xmin")).as("min_x"))
    assert(isMetadataOnly(q), q.queryExecution.optimizedPlan.toString)
    val full = spark.conf
    full.set(OptimizeDeltaMetadataOnlyAgg.ConfKey, "false")
    val scan = try {
      val f = rel.agg(count(lit(1)).as("cnt"),
        min("id").as("min_id"), max("id").as("max_id"),
        min("price").as("min_p"), max("tag").as("max_t"),
        min(col("bbox.xmin")).as("min_x"))
      assert(hasScan(f), "kill switch must restore the scan")
      f.head()
    } finally full.unset(OptimizeDeltaMetadataOnlyAgg.ConfKey)
    assert(q.head() == scan, s"${q.head()} vs $scan")
  }

  test("SQL route: SELECT count(*), min(...) over a created table") {
    val path = mkTable()
    spark.sql("DROP TABLE IF EXISTS pd_meta_t")
    spark.sql(s"CREATE TABLE pd_meta_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      val q = spark.sql(
        "SELECT count(*) AS cnt, min(id) AS mn, max(id) AS mx FROM pd_meta_t")
      assert(isMetadataOnly(q), q.queryExecution.optimizedPlan.toString)
      assert(q.head() == org.apache.spark.sql.Row(200L, 0L, 199L))
    } finally spark.sql("DROP TABLE IF EXISTS pd_meta_t")
  }

  test("fallback: WHERE keeps the scan, grouped agg keeps the scan") {
    val path = mkTable()
    val rel = spark.read.format("portable-delta").load(path)
    val filtered = rel.filter(col("id") >= 100).agg(count(lit(1)).as("cnt"))
    assert(hasScan(filtered))
    assert(filtered.head().getLong(0) == 100L)
    val grouped = rel.groupBy("tag").agg(count(lit(1)))
    assert(hasScan(grouped))
    val distinctAgg = rel.agg(countDistinct("tag").as("n"))
    assert(hasScan(distinctAgg) && distinctAgg.head().getLong(0) == 7L)
    val avgAgg = rel.agg(avg("price").as("a"))
    assert(hasScan(avgAgg))
  }

  test("DV table: count stays metadata-only (cardinality-exact); min/max falls back to the refusing scan") {
    val path = mkTable()
    val res = PortableDelta.delete(spark, path, col("id") % 4 === 0)
    assert(res.deletedRows == 50 && res.removedFiles == 0)
    val rel = spark.read.format("portable-delta").load(path)
    val cnt = rel.agg(count(lit(1)).as("cnt"))
    assert(isMetadataOnly(cnt), "COUNT under DVs is exact from cardinality")
    assert(cnt.head().getLong(0) == 150L)
    // min/max is NOT answerable from stats under DVs; the fallback is the
    // scan, and the portable-delta scan itself refuses DVs by name
    val mn = rel.agg(min("id").as("mn"))
    assert(hasScan(mn))
    val e = intercept[Exception](mn.head())
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // the full API answers both
    assert(PortableDelta.readTable(spark, path).agg(min("id")).head().getLong(0) == 1L)
  }

  test("empty table: count 0, min/max null") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(Seq((1L, "a")).toDF("id", "v"), path)
    PortableDelta.delete(spark, path, lit(true))
    // the delete rewrites/removes files (no DV needed for full-file kill)
    val rel = spark.read.format("portable-delta").load(path)
    val q = rel.agg(count(lit(1)).as("cnt"), min("id").as("mn"))
    if (isMetadataOnly(q)) {
      val r = q.head()
      assert(r.getLong(0) == 0L && r.isNullAt(1))
    } else {
      // acceptable fallback (e.g. DV route): value must still be right
      val r = PortableDelta.readTable(spark, path)
        .agg(count(lit(1)), min("id")).head()
      assert(r.getLong(0) == 0L && r.isNullAt(1))
    }
  }
}
