package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (optionally) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Determinism contract (so the driver's hash compare passes):
  *   - every query ends in a total ORDER BY (unique tiebreak key);
  *   - money/double aggregation goes through exact integer-cents math
  *     (`round(x*100)::long`) so Spark and DuckDB sums are bit-identical;
  *   - ratios are a SINGLE double division of two exact integers;
  *   - timestamps in output are formatted to strings.
  */
/** @param timed false for specs whose run function executes a job itself
  *              (e.g. a streaming query materialized to a sink) — they stay
  *              in the correctness gate but are excluded from Bench timing
  *              and PlanDump (their returned frame is the already-computed
  *              result, not the pipeline).
  * @param prepare one-time harness prep (fixture materialization: writing
  *              the ndjson corpus, bucketing the fact tables) run by Bench
  *              BEFORE the timer starts — the amortized ingest cost of a
  *              strategy, not per-query work. Implementations must be
  *              idempotent per session (the run function also invokes them
  *              lazily, so correctness never depends on prepare being
  *              called first). */
final case class QuerySpec(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame,
    timed: Boolean = true,
    prepare: Option[(SparkSession, String) => Unit] = None)

/** Memo for session-scoped PERSISTED state keyed by (session, dataset):
  * `getOrElseUpdate` plus a cache-liveness check. Bench clears the SQL
  * cache at pass boundaries (r19 metric hygiene), which drops every
  * persist registration; a memo that kept handing out the unpersisted
  * frame would silently recompute it once per CONSUMER (the m09
  * projection-collapse trap) — neither pass-1's build-once economics nor
  * a fair cold measurement. `probe` selects the frame whose persistence
  * proves the entry is live; on a dropped cache the entry rebuilds,
  * re-persisting fresh state — pass-1 economics restored (the rebuild
  * itself lands in the prepare hook for specs that have one). */
private[graft] object CachedMemo {
  def get[V](map: scala.collection.concurrent.TrieMap[(SparkSession, String), V],
             key: (SparkSession, String))(probe: V => DataFrame)(build: => V): V = {
    val v = map.getOrElseUpdate(key, build)
    if (probe(v).storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      val fresh = build
      map.update(key, fresh)
      fresh
    } else v
  }
}

object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation memo per (session, dir, table): `spark.read.parquet`
    * re-resolves the DataSource on every call — file listing plus a footer
    * read for schema inference — and the bench pays that driver-side cost
    * per query (~112 queries × 2–3 tables). The base tables are immutable
    * inputs, so the ANALYZED PLAN is reused for the life of the session
    * (plan-level reuse only — no data is cached; every action still scans
    * parquet). Keyed by the session instance so a session with different
    * confs (e.g. nanosAsLong) never sees another session's resolution. */
  private val relationMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  /** Parquet scan — filters/column pruning push down via the vectorized
    * reader; at cluster scale this is the 100-TB entry point. Only the
    * fixed base tables memoize (arbitrary paths may be rewritten between
    * calls; these never are). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (all.contains(name))
      relationMemo.getOrElseUpdate((spark, dir, name),
        spark.read.parquet(s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Exact table row count from parquet FOOTERS — the catalog statistic,
    * not a scan: every row group records its row count in the file
    * metadata, so this is O(files) driver-side reads instead of a
    * cluster job over the data (identical value to `df.count()`; parquet
    * metadata is authoritative). Listing goes through the Hadoop
    * FileSystem of the path (works on hdfs://, s3a://, …, not just
    * file://), recurses into partitioned layouts, and applies Spark's
    * hidden-file rule (skip '_'- and '.'-prefixed names) so the visible
    * set matches what a scan would read. */
  def footerRowCount(dir: String, name: String): Long = {
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"no such table: $root")
    def collect(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.Path] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter { c =>
            val n = c.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }
          .flatMap(collect)
      else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
      else Nil
    collect(fs.getFileStatus(root)).map { p =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally r.close()
    }.sum
  }

  /** events.parquet's `ts` arrives in one of two physical shapes depending
    * on how the generator wrote it: TIMESTAMP(NANOS) (scans as epoch-ns
    * Long under spark.sql.legacy.parquet.nanosAsLong=true) or
    * TIMESTAMP(MICROS) (scans as TimestampType/TimestampNTZType). Expose
    * ONE logical contract either way: integer epoch-µs (`us`, exact —
    * matches DuckDB's epoch_ns(ts)//1000, which is total over both
    * physical types) and a µs TimestampType `ts`. All arithmetic stays
    * integral (a double division would lose precision above 2^53 ns);
    * the NTZ→timestamp cast is exact under the gate's UTC session
    * contract (Verify.gateSession). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("us")))
      case _ =>
        raw.withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts", timestamp_micros(col("us")))
    }
  }
}
