package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All verifiable queries, grouped by domain. */
  def specs: Seq[QuerySpec] =
    _root_.graft.queries.Relational.specs ++
      _root_.graft.queries.BucketedOps.specs ++
      _root_.graft.queries.TextOps.specs ++
      _root_.graft.queries.DedupOps.specs ++
      _root_.graft.queries.SimilarityOps.specs ++
      _root_.graft.queries.StacOps.specs ++
      _root_.graft.queries.MultimodalOps.specs ++
      _root_.graft.queries.StreamingOps.specs

  /** Flagship: the full STAC ingest pipeline (G1 → inference → P1-P4) on
    * sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("stac05_full_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
