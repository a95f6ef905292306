package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.stac.PortableDelta

/** Incremental (AvailableNow-style) STREAMING SOURCE over a portable
  * Delta table's rows — delta-spark's plain `readStream.format
  * ("delta")`, the append-stream sibling of [[DeltaCdfSource]]. Each
  * trigger returns the rows appended by the commits past a persistent
  * VERSION WATERMARK (bounded by `maxVersionsPerTrigger`), and the
  * watermark advances only AFTER the caller's batch commits — offsets
  * move on commit, not on read, so a crash between the two re-delivers
  * the same window (at-least-once; an idempotent consumer upgrades it).
  *
  * Stream start follows the delta source's two modes:
  *   - default (`startingVersion = None`): the FIRST batch is the
  *     table's full current snapshot (read as of a pinned version —
  *     commits racing past the poll wait for the next trigger), then
  *     incremental appends. This is how a consumer joins a table whose
  *     early history may be checkpoint-truncated.
  *   - `startingVersion = Some(v)`: no snapshot batch; appends are
  *     consumed from version v on (v = 0 replays the full history; the
  *     JSON commits must still exist).
  *
  * `ignoreDeletes` / `skipChangeCommits` pass through to
  * [[PortableDelta.readAppends]]: an append stream refuses
  * row-changing commits by version unless told to skip them.
  *
  * Scale: the per-trigger poll is a small-state version read, each
  * window is one bounded scan plan over its born files, and the
  * snapshot batch is the same plan a batch read costs — nothing here
  * holds the add list on the driver beyond the window's own commits. */
final class DeltaTableSource(spark: SparkSession, tablePath: String,
                             checkpointDir: String,
                             maxVersionsPerTrigger: Int = 32,
                             startingVersion: Option[Long] = None,
                             ignoreDeletes: Boolean = false,
                             skipChangeCommits: Boolean = false) {
  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")
  startingVersion.foreach(v => require(v >= 0,
    s"startingVersion must be >= 0, got $v"))

  private val conf = spark.sessionState.newHadoopConf()
  private val ckPath = new Path(checkpointDir, "table-version-watermark")
  private val fs = ckPath.getFileSystem(conf)

  /** The last PROCESSED version, or None before the first committed
    * batch (restored from the checkpoint — a restarted consumer resumes
    * exactly where its last committed batch ended, never re-running the
    * snapshot batch). */
  def watermark: Option[Long] =
    if (!fs.exists(ckPath)) None
    else {
      val in = fs.open(ckPath)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }

  /** One trigger's read, or None when caught up. Does NOT advance the
    * watermark — call [[commitProgress]] after the batch lands. */
  def readAvailable(): Option[(DataFrame, Long)] = {
    val cur = PortableDelta.currentVersion(spark, tablePath)
    watermark match {
      case None =>
        startingVersion match {
          case None =>
            // initial snapshot batch, pinned at the poll's version
            Some((PortableDelta.readTable(spark, tablePath, cur), cur))
          case Some(v0) =>
            if (v0 > cur) None
            else {
              val to = math.min(cur, v0 + maxVersionsPerTrigger - 1)
              Some((PortableDelta.readAppends(spark, tablePath, v0, to,
                ignoreDeletes, skipChangeCommits), to))
            }
        }
      case Some(wm) =>
        val from = wm + 1
        if (from > cur) None
        else {
          val to = math.min(cur, from + maxVersionsPerTrigger - 1)
          Some((PortableDelta.readAppends(spark, tablePath, from, to,
            ignoreDeletes, skipChangeCommits), to))
        }
    }
  }

  /** Advance the watermark to `endVersion` — atomic overwrite-rename;
    * call only after the batch's effects are durable. */
  def commitProgress(endVersion: Long): Unit = {
    fs.mkdirs(ckPath.getParent)
    val tmp = new Path(ckPath.getParent,
      s".wm-tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(endVersion.toString.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(fs.getUri, conf)
    fc.rename(tmp, ckPath, Options.Rename.OVERWRITE)
  }

  /** Trigger.AvailableNow drain: read → process → commit until caught
    * up (commits landing mid-drain are picked up too). Returns the
    * number of batches processed. */
  def runAvailableNow(process: (DataFrame, Long) => Unit): Int = {
    var n = 0
    var more = true
    while (more) readAvailable() match {
      case Some((rows, to)) =>
        process(rows, to)
        commitProgress(to)
        n += 1
      case None => more = false
    }
    n
  }
}
