package graft.stac

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5/S6/K6: pgstac (PostgreSQL) export path
  * (`stac_geoparquet/pgstac_reader.py:156-383`).
  *
  * The reference streams rows through a server-side cursor; the Spark
  * mapping is a partitioned JDBC scan — `partitionColumn=datetime` splits
  * the read across executors, and the three query forms (all items /
  * collection / collection+datetime range) push down as WHERE clauses.
  * A CQL2 JSON filter delegates to pgstac's `search()` SQL function as a
  * literal subquery (F2), exactly like the reference.
  *
  * No live Postgres exists in this environment (the reference uses
  * Docker); the query-building logic is pure and unit-tested, and the
  * full JDBC execution path — partitioned read, WHERE pushdown,
  * hydration — runs for real against a DuckDB stand-in in
  * `graft.stac.PgstacLiveSpec`.
  */
object PgstacReader {

  /** The items query (`pgstac_reader.py:178-199`). */
  def itemsSql(
      collection: Option[String] = None,
      startDatetime: Option[String] = None,
      endDatetime: Option[String] = None,
      cql2Json: Option[String] = None): String = cql2Json match {
    case Some(filter) =>
      // F2: delegate filtering to pgstac's search(). Columns must be
      // items-qualified: the search results also carry `id`, and an
      // unqualified list is a binder error on any engine — caught the
      // first time this statement actually EXECUTED (PgstacLiveSpec's
      // vendored search_query), not by the earlier string pins.
      s"""SELECT items.id, items.geometry, items.collection,
          items.datetime, items.end_datetime, items.content
          FROM search_query('${filter.replace("'", "''")}') AS s
          JOIN items ON items.id = s.id""".stripMargin
    case None =>
      val base = "SELECT id, geometry, collection, datetime, end_datetime, content FROM items"
      def q(s: String) = s.replace("'", "''")
      (collection, startDatetime, endDatetime) match {
        case (Some(c), Some(a), Some(b)) =>
          s"$base WHERE collection = '${q(c)}' AND datetime >= '${q(a)}' AND datetime < '${q(b)}'"
        case (Some(c), _, _) => s"$base WHERE collection = '${q(c)}'"
        case _ => base
      }
  }

  /** The partitions query, mirroring `pgstac_reader.py:312-333` exactly:
    * the output FILENAME derives from `partition_dtrange` (the partition's
    * constraint range; infinite bounds collapse to plain 'items.parquet'),
    * while the read-slice bounds come from `dtrange` (the actual data
    * range) with upper+1µs — Postgres's minimum timestamptz resolution —
    * so the inclusive range upper bound works with the exclusive
    * `datetime <` in the items query (S5). Postgres-flavored SQL by
    * design (to_char/format/interval-string); PgstacLiveSpec maps those
    * three functions to DuckDB equivalents to execute the same statement
    * over live JDBC. */
  def partitionsSql(updatedAfter: Option[String] = None): String = {
    val where = updatedAfter.map(ts => s" WHERE last_updated >= '$ts'").getOrElse("")
    s"""SELECT collection,
        CASE WHEN lower(partition_dtrange) = '-infinity' OR upper(partition_dtrange) = 'infinity' THEN
            'items.parquet'
        ELSE
            format('items_%s_%s.parquet',
                to_char(lower(partition_dtrange),'YYYYMMDD'),
                to_char(upper(partition_dtrange),'YYYYMMDD'))
        END AS partition,
        lower(dtrange) AS start,
        upper(dtrange) + '.000001 seconds' AS "end",
        last_updated
        FROM partitions_view$where ORDER BY last_updated asc"""
  }

  /** Partitioned JDBC scan of pgstac items. `numPartitions`/`fetchsize`
    * replace the reference's server-side cursor (itersize=10000,
    * `pgstac_reader.py:163`). Spark's JDBC source requires
    * partitionColumn + lowerBound + upperBound + numPartitions all-or-none,
    * so the scan parallelizes only when the datetime range is known
    * (it always is on the K6 sync path — partition ranges come from S6);
    * otherwise it falls back to a single-partition read. */
  /** @param cql2Json a CQL2 JSON filter to DELEGATE to pgstac's
    *   `search_query()` SQL function (F2) — when set, the server's own
    *   CQL2 engine resolves the predicate and the other filter args are
    *   ignored (the delegated subquery subsumes them), exactly the
    *   reference's split of labor; datetime-range partitioning still
    *   applies when both bounds are given */
  /** @param cql2Text the same delegation in the TEXT encoding (the STAC
    *   API GET default) — parsed by [[Cql2Text]] and delegated as JSON,
    *   since `search_query()` consumes cql2-json; mutually exclusive
    *   with `cql2Json` */
  /** @param jdbcOptions extra JDBC reader options (user/password/driver/
    *   connection properties) merged in AFTER the computed ones
    * @param configure a final hook over the assembled reader — the
    *   analog of the reference 0.8.1 user-supplied connection factory
    *   (`pgstac_reader.py:117-131`): callers that need full control of
    *   how the connection is made (custom driver registration, wrapped
    *   credentials) intercept here */
  def readItems(
      spark: SparkSession,
      jdbcUrl: String,
      collection: Option[String] = None,
      startDatetime: Option[String] = None,
      endDatetime: Option[String] = None,
      numPartitions: Int = 16,
      cql2Json: Option[String] = None,
      fetchsize: Int = 10000,
      cql2Text: Option[String] = None,
      jdbcOptions: Map[String, String] = Map.empty,
      configure: org.apache.spark.sql.DataFrameReader =>
        org.apache.spark.sql.DataFrameReader = identity): DataFrame = {
    require(fetchsize >= 1, s"fetchsize must be >= 1, got $fetchsize")
    require(cql2Json.isEmpty || cql2Text.isEmpty,
      "pass the CQL2 filter in ONE encoding (cql2Json or cql2Text), not both")
    val effJson = cql2Json.orElse(cql2Text.map(Cql2.textToJson))
    val base = spark.read.format("jdbc")
      .option("url", jdbcUrl)
      .option("dbtable", s"(${itemsSql(collection, startDatetime, endDatetime, effJson)}) q")
      .option("fetchsize", fetchsize)
    val partitioned = (startDatetime, endDatetime) match {
      case (Some(lo), Some(hi)) =>
        base.option("partitionColumn", "datetime")
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case _ => base
    }
    configure(jdbcOptions.foldLeft(partitioned) { case (b, (k, v)) =>
      b.option(k, v)
    }).load()
  }

  /** The reference's named-cursor streaming protocol VERBATIM
    * (`pgstac_reader.py:200-209` — psycopg's server-side cursor with
    * `itersize`): inside ONE transaction, `DECLARE <name> NO SCROLL
    * CURSOR FOR <sql>`, `FETCH FORWARD <itersize>` until a short/empty
    * batch, `CLOSE <name>`, COMMIT. This is the per-slice drain for
    * bounded reads (a K6 sync partition, a probe, a schema peek) where
    * the partitioned JDBC scan's executor fan-out isn't wanted — memory
    * stays bounded by one batch, and the SERVER streams instead of
    * buffering the whole result (the reason pgstac exports use named
    * cursors at all). Corpus-scale scans stay on [[readItems]]; at
    * 100 TB each executor task may run this drain over its own bounded
    * slice. Restores autocommit and always closes the connection. */
  def cursorDrain[A](jdbcUrl: String, sql: String, itersize: Int = 10000,
                     props: java.util.Properties = new java.util.Properties(),
                     cursorName: String = "graft_items")(
                     row: java.sql.ResultSet => A): Vector[A] = {
    require(itersize >= 1, s"itersize must be >= 1, got $itersize")
    require(cursorName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"cursor name must be a plain identifier, got '$cursorName'")
    val conn = java.sql.DriverManager.getConnection(jdbcUrl, props)
    try {
      val prevAuto = conn.getAutoCommit
      conn.setAutoCommit(false) // a named cursor lives inside a transaction
      try {
        val st = conn.createStatement()
        try {
          st.execute(s"""DECLARE "$cursorName" NO SCROLL CURSOR FOR $sql""")
          val out = Vector.newBuilder[A]
          var more = true
          while (more) {
            val rs = st.executeQuery(
              s"""FETCH FORWARD $itersize FROM "$cursorName"""")
            var n = 0
            try while (rs.next()) { out += row(rs); n += 1 }
            finally rs.close()
            more = n == itersize // a short batch means the cursor is dry
          }
          st.execute(s"""CLOSE "$cursorName"""")
          conn.commit()
          out.result()
        } finally st.close()
      } finally conn.setAutoCommit(prevAuto)
    } finally conn.close()
  }

  /** K6: incremental sync — read changed partitions (S6) and export each
    * through the normalize→GeoParquet pipeline into
    * `<out>/<collection>/items_<start>_<end>.parquet`
    * (`pgstac_reader.py:340-383`). The partition list is a tiny driver-side
    * read; each partition export is a distributed job. Driver-side twin of
    * the filename CASE inside [[partitionsSql]]: an unbounded partition
    * collapses to plain 'items.parquet', like the reference's
    * '-infinity'/'infinity' branch. */
  def partitionFileName(start: Option[String], end: Option[String]): String = {
    def fmt(s: Option[String]) = s.map(_.replaceAll("[-:TZ ]", "").take(8))
    (fmt(start), fmt(end)) match {
      case (Some(a), Some(b)) => s"items_${a}_$b.parquet"
      case _                  => "items.parquet"
    }
  }

  /** One row of the S6 partition listing ([[partitionsSql]]'s shape):
    * collection, datetime range, and the partition's `last_updated`
    * watermark. */
  final case class PgPartition(collection: String,
                               start: Option[String], end: Option[String],
                               lastUpdated: String)

  /** Outcome of a [[syncPartitions]] pass: relative paths written,
    * partitions skipped by the watermark, and the new watermark (max
    * `last_updated` among EXPORTED partitions — the value the next
    * incremental pass passes back as `updatedAfter`). */
  final case class SyncStats(exported: Seq[String], skipped: Int,
                             newWatermark: Option[String])

  /** K6 end-to-end: export every partition whose `last_updated` is at
    * or past `updatedAfter` into
    * `<out>/<collection>/<partitionFileName(start, end)>` — ONE parquet
    * file per partition, the reference's on-disk layout
    * (`pgstac_reader.py:340-383`: list changed partitions, re-export
    * each as a single arrow→parquet file, leave the rest untouched).
    * Partitions BEHIND the watermark are skipped without reading a row
    * — the no-reprocess contract that makes the pass incremental.
    *
    * `readPartition` supplies each partition's items frame (the JDBC
    * [[readItems]] against live pgstac; any stand-in under test) — the
    * partition LIST is a tiny driver-side read, each export a
    * distributed job whose single-file shape is the reference's
    * contract, not a scale choice: a million-partition sync runs one
    * bounded job per CHANGED partition, and unchanged history costs
    * nothing. Export is atomic per partition (staging dir + rename), so
    * a crashed pass never leaves a torn partition file; re-running with
    * the same watermark simply re-exports the same changed set
    * (idempotent overwrite, the reference's at-least-once semantics). */
  /** @param maxConcurrent partition exports running at once: each is
    *   an independent bounded Spark job, so a wide changed set drives
    *   the cluster from several scheduler threads instead of one
    *   job-at-a-time (Spark's fair/FIFO scheduler interleaves them);
    *   the returned `exported` order and the watermark are unchanged */
  def syncPartitions(spark: SparkSession, parts: Seq[PgPartition],
                     updatedAfter: Option[String], out: String,
                     readPartition: PgPartition => DataFrame,
                     maxConcurrent: Int = 1): SyncStats = {
    import org.apache.hadoop.fs.Path
    require(maxConcurrent >= 1, s"maxConcurrent must be >= 1, got $maxConcurrent")
    val conf = spark.sessionState.newHadoopConf()
    val outP = new Path(out)
    val fs = outP.getFileSystem(conf)
    val (changed, skipped) = parts.partition(p =>
      updatedAfter.forall(w => p.lastUpdated >= w))
    def exportOne(p: PgPartition): String = {
      val rel = s"${p.collection}/${partitionFileName(p.start, p.end)}"
      val dest = new Path(outP, rel)
      fs.mkdirs(dest.getParent)
      val tmp = new Path(outP, s".sync-tmp-${java.util.UUID.randomUUID()}")
      readPartition(p).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(q => q.getName.endsWith(".parquet") && !q.getName.startsWith("_"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      // overwrite-rename (FileContext honors Options.Rename.OVERWRITE):
      // the previously-synced file is replaced ATOMICALLY — a crash
      // mid-pass leaves either the old or the new partition file, never
      // neither (a delete-then-rename pair has a lost-file window)
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, conf)
      fc.rename(part, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      fs.delete(tmp, true)
      rel
    }
    val exported: Seq[String] =
      if (maxConcurrent == 1 || changed.size <= 1) changed.map(exportOne)
      else {
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(math.min(maxConcurrent, changed.size))
        try {
          val futs = changed.map(p => pool.submit(
            new java.util.concurrent.Callable[String] {
              def call(): String = exportOne(p)
            }))
          futs.map(_.get()) // input order preserved; first failure throws
        } finally pool.shutdown()
      }
    SyncStats(exported, skipped.size,
      changed.map(_.lastUpdated).maxOption)
  }
}
