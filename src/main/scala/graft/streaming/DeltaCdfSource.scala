package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import graft.stac.PortableDelta

/** Incremental (AvailableNow-style) STREAMING SOURCE over a portable
  * Delta table's Change Data Feed: each trigger returns the row-level
  * changes of the commits past a persistent VERSION WATERMARK, bounded
  * by `maxVersionsPerTrigger`, and the watermark advances only AFTER
  * the caller's batch commits — the two-phase contract Structured
  * Streaming sources keep (offsets move on commit, not on read). A
  * crash between read and commit re-delivers the same version window
  * (at-least-once); an idempotent consumer — a txn-tagged Delta sink,
  * or a deterministic merge like the st17 gate's signed aggregate —
  * upgrades that to exactly-once, the same split of labor as Spark's
  * own file/Kafka sources.
  *
  * Reference scope: stac-geoparquet has no streaming surface; this is
  * the natural consumer seam over [[PortableDelta.readChanges]] —
  * delta-spark's `readStream.option("readChangeFeed", true)` shape,
  * re-expressed over the portable log. Scale: the per-trigger poll is
  * a SMALL-state version read (never the add list); each window read
  * is bounded by the changed files of its ≤ `maxVersionsPerTrigger`
  * commits and reuses readChanges' lineage-truncated chunked assembly,
  * so a consumer that fell 10k commits behind catches up in bounded
  * per-trigger plans instead of one unanalyzable union.
  *
  * Stream start follows the delta CDF source's two modes:
  *   - `initialSnapshot = false` (default): changes replay from
  *     version 0 on — delta-spark's `startingVersion = 0`; the JSON
  *     commits must still exist (checkpoint-truncated versions fail by
  *     name).
  *   - `initialSnapshot = true`: a LATE JOINER's start — the FIRST
  *     batches surface the table's current snapshot (pinned at the
  *     poll's version) as `insert` change rows stamped with that
  *     version and its commit time, then row-level changes from the
  *     pinned version on. Under a rate limit the snapshot drains
  *     SLICE-WISE in deterministic file order through the same
  *     `pinnedSliceState` the table source uses (`Sv:k` offsets,
  *     restart-exact mid-snapshot) — a 100-TB table never joins as one
  *     batch, and the early history may be checkpoint-truncated.
  *
  * Rate limits (`maxFilesPerTrigger` / `maxBytesPerTrigger`, either or
  * both) pack WHOLE versions per trigger against the commits' changed
  * file/byte load — a commit's change feed is its atomic unit (pre/
  * post-image pairing cannot split), so unlike [[DeltaTableSource]]
  * there is no mid-COMMIT offset; at least one commit always admits,
  * so a single oversized commit cannot stall the stream. The initial
  * snapshot is the one exception: it is file-granular by construction
  * (DVs apply per file, slices compose to exactly the snapshot). */
final class DeltaCdfSource(spark: SparkSession, tablePath: String,
                           checkpointDir: String,
                           maxVersionsPerTrigger: Int = 32,
                           maxFilesPerTrigger: Option[Int] = None,
                           maxBytesPerTrigger: Option[Long] = None,
                           initialSnapshot: Boolean = false) {
  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")
  maxFilesPerTrigger.foreach(n => require(n >= 1,
    s"maxFilesPerTrigger must be >= 1, got $n"))
  maxBytesPerTrigger.foreach(n => require(n >= 1L,
    s"maxBytesPerTrigger must be >= 1, got $n"))

  private val conf = spark.sessionState.newHadoopConf()
  private val ckPath = new Path(checkpointDir, "cdf-version-watermark")
  private val fs = ckPath.getFileSystem(conf)
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** The consumer's durable offset: a fully processed `version`, or a
    * mid-INITIAL-SNAPSHOT position. Serialized as `v` (plain watermark,
    * back-compatible) or `Sv:k` (snapshot pinned at v, k live files
    * delivered in path order). */
  final case class Offset(version: Long, filesConsumed: Int,
                          snapshot: Boolean = false) {
    def token: String =
      if (snapshot) s"S$version:$filesConsumed" else version.toString
  }

  private def parseOffset(s: String): Offset =
    if (s.startsWith("S")) s.stripPrefix("S").split(':') match {
      case Array(v, k) => Offset(v.toLong, k.toInt, snapshot = true)
    }
    else Offset(s.toLong, -1)

  /** One commit's CHANGE LOAD — (changed files, changed bytes) counted
    * over its file actions (add + cdc + remove): the admission weight
    * the rate limits pack against. A driver-side JSON read of exactly
    * the commits under consideration (the window is bounded, and a CDF
    * read of these versions parses the same files anyway). */
  private def commitLoad(v: Long): (Int, Long) = {
    val p = new Path(new Path(tablePath, "_delta_log"), f"$v%020d.json")
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    var files = 0; var bytes = 0L
    lines.filter(_.nonEmpty).map(mapper.readTree).foreach { n =>
      Seq("add", "cdc", "remove").foreach { k =>
        if (n.has(k)) {
          files += 1
          val sz = n.get(k).get("size")
          if (sz != null && sz.isNumber) bytes += sz.asLong()
        }
      }
    }
    (files, bytes)
  }

  /** The stored offset, or None before the first committed batch. */
  def offset: Option[Offset] =
    if (!fs.exists(ckPath)) None
    else {
      val in = fs.open(ckPath)
      try Some(parseOffset(
        scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim))
      finally in.close()
    }

  /** The last PROCESSED version (-1 before the first commit, and while
    * an initial snapshot is still draining — no version's CHANGES have
    * been processed yet): restored from the checkpoint file, so a
    * restarted consumer resumes exactly where its last committed batch
    * ended. */
  def watermark: Long = offset match {
    case Some(o) if !o.snapshot => o.version
    case _ => -1L
  }

  /** One rate-limited slice of the initial snapshot pinned at `v`,
    * shaped as CDF `insert` rows (the delta CDF initial-snapshot
    * contract: _commit_version = the pinned version, _commit_timestamp
    * = its commit time). */
  private def snapshotSlice(v: Long, fromFile: Int): (DataFrame, Offset) = {
    val (df, end, complete) = PortableDelta.readSnapshotSlice(
      spark, tablePath, v, fromFile,
      maxFiles = maxFilesPerTrigger.getOrElse(Int.MaxValue),
      maxBytes = maxBytesPerTrigger.getOrElse(Long.MaxValue))
    val tsMs = PortableDelta.history(conf, tablePath)
      .find(_._1 == v).map(_._3).getOrElse(throw new IllegalStateException(
        s"no commit time for version $v of $tablePath (history truncated " +
          "past the sidecar?)"))
    val out = df.withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(v))
      .withColumn("_commit_timestamp",
        (lit(tsMs) / 1000L).cast("timestamp"))
    (out, if (complete) Offset(v, -1) else Offset(v, end, snapshot = true))
  }

  /** One trigger's read, or None when the consumer is caught up. Does
    * NOT advance the offset — call [[commitProgress]] after the batch
    * lands. A fresh `initialSnapshot` consumer first drains the pinned
    * snapshot (slice-wise under rate limits), then consumes changes
    * from the pinned version on. */
  def readAvailable(): Option[(DataFrame, Offset)] = {
    val cur = PortableDelta.currentVersion(spark, tablePath)
    offset match {
      case None if initialSnapshot => Some(snapshotSlice(cur, 0))
      case Some(o) if o.snapshot =>
        // resume the in-flight snapshot AT ITS PINNED VERSION — commits
        // racing past it arrive later as changes
        Some(snapshotSlice(o.version, o.filesConsumed))
      case o =>
        val from = o.map(_.version).getOrElse(-1L) + 1
        if (from > cur) None
        else {
          val cap = math.min(cur, from + maxVersionsPerTrigger - 1)
          // rate limits pack WHOLE versions (a commit's change feed is
          // its atomic unit — pre/post-image pairing cannot split):
          // admit commits while the cumulative changed-file/byte load
          // fits, and always admit at least one so the stream
          // progresses past any single oversized commit
          val to = (maxFilesPerTrigger, maxBytesPerTrigger) match {
            case (None, None) => cap
            case (mf, mb) =>
              val maxF = mf.getOrElse(Int.MaxValue)
              val maxB = mb.getOrElse(Long.MaxValue)
              var v = from
              var files = 0; var bytes = 0L
              var end = from
              var fits = true
              while (fits && v <= cap) {
                val (f, b) = commitLoad(v)
                if (v == from || (files + f <= maxF && bytes + b <= maxB)) {
                  files += f; bytes += b; end = v; v += 1
                } else fits = false
              }
              end
          }
          Some((PortableDelta.readChanges(spark, tablePath, from, to),
            Offset(to, -1)))
        }
    }
  }

  /** Advance the offset — atomic overwrite-rename, so a crash leaves
    * either the old or the new mark, never a torn file. Must be called
    * only after the batch's effects are durable. */
  def commitProgress(off: Offset): Unit = {
    fs.mkdirs(ckPath.getParent)
    val tmp = new Path(ckPath.getParent,
      s".wm-tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(off.token.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(fs.getUri, conf)
    fc.rename(tmp, ckPath, Options.Rename.OVERWRITE)
  }

  /** Version-granular convenience (the plain-watermark path). */
  def commitProgress(endVersion: Long): Unit =
    commitProgress(Offset(endVersion, -1))

  /** Trigger.AvailableNow drain: process every pending window (read →
    * process → commit) until caught up with the table AS OF the drain's
    * start-ish — each loop re-polls, so commits landing mid-drain are
    * picked up too. The callback receives the window's end VERSION;
    * snapshot slices invoke it once per slice with the pinned version.
    * Returns the number of batches processed. */
  def runAvailableNow(process: (DataFrame, Long) => Unit): Int = {
    var n = 0
    var more = true
    while (more) readAvailable() match {
      case Some((changes, off)) =>
        process(changes, off.version)
        commitProgress(off)
        n += 1
      case None => more = false
    }
    n
  }
}
