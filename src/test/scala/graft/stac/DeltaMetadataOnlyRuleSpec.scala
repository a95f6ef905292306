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

  test("partition-only filter: COUNT/MIN/MAX answer scan-free, bit-identical to the scan") {
    val s = spark; import s.implicits._
    val path = tmp()
    val df = (0L until 300L)
      .map(i => (i, s"d$i", 1990 + (i % 6).toInt, s"g${i % 4}"))
      .toDF("id", "body", "yr", "grp")
    PortableDelta.write(df, path, partitionBy = Seq("yr", "grp"))
    val rel = spark.read.format("portable-delta").load(path)
    def q(r: org.apache.spark.sql.DataFrame) =
      r.filter(col("yr") === 1995 && col("grp") =!= "g2")
        .agg(count(lit(1)).as("cnt"), min("id").as("mn"), max("id").as("mx"))
    val meta = q(rel)
    assert(isMetadataOnly(meta),
      meta.queryExecution.optimizedPlan.toString)
    // kill switch restores the scan; values must be bit-identical
    spark.conf.set(OptimizeDeltaMetadataOnlyAgg.ConfKey, "false")
    val viaScan = try { val f = q(rel); assert(hasScan(f)); f.head() }
      finally spark.conf.unset(OptimizeDeltaMetadataOnlyAgg.ConfKey)
    assert(meta.head() == viaScan, s"${meta.head()} vs $viaScan")
    // SQL route with a WHERE over partition columns only
    spark.sql("DROP TABLE IF EXISTS pd_meta_p")
    spark.sql(s"CREATE TABLE pd_meta_p USING `portable-delta` OPTIONS (path '$path')")
    try {
      val sq = spark.sql(
        "SELECT count(*) AS cnt, max(id) AS mx FROM pd_meta_p WHERE yr = 1995")
      assert(isMetadataOnly(sq), sq.queryExecution.optimizedPlan.toString)
      assert(sq.head() == org.apache.spark.sql.Row(50L, 299L))
      // a predicate matching NOTHING: count 0, null extrema, scan-free
      val none = spark.sql(
        "SELECT count(*) AS cnt, min(id) AS mn FROM pd_meta_p WHERE yr = 2099")
      assert(isMetadataOnly(none))
      assert(none.head() == org.apache.spark.sql.Row(0L, null))
    } finally spark.sql("DROP TABLE IF EXISTS pd_meta_p")
  }

  test("fallback: WHERE keeps the scan, grouped agg keeps the scan") {
    val path = mkTable()
    val rel = spark.read.format("portable-delta").load(path)
    // a DATA-column predicate must keep the scan (stats pruning is
    // conservative — a metadata COUNT under it would over-count)
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

  test("DV table: count stays metadata-only (cardinality-exact); min/max falls back to the DV-aware scan") {
    val path = mkTable()
    val res = PortableDelta.delete(spark, path, col("id") % 4 === 0)
    assert(res.deletedRows == 50 && res.removedFiles == 0)
    val rel = spark.read.format("portable-delta").load(path)
    val cnt = rel.agg(count(lit(1)).as("cnt"))
    assert(isMetadataOnly(cnt), "COUNT under DVs is exact from cardinality")
    assert(cnt.head().getLong(0) == 150L)
    // min/max is NOT answerable from stats under DVs (a deleted row may
    // hold the extremum); the fallback is the scan — which since round
    // 15 drops the DV-dead rows itself (row-index probe), so the value
    // is RIGHT, not a refusal
    val mn = rel.agg(min("id").as("mn"))
    assert(hasScan(mn))
    assert(mn.head().getLong(0) == 1L, "id 0 is DV-dead; min must be 1")
    // parity with the full API
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
