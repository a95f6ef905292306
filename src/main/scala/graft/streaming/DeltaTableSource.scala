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
  *     table's current snapshot (read as of a pinned version — commits
  *     racing past the poll wait for the next trigger), then
  *     incremental appends. This is how a consumer joins a table whose
  *     early history may be checkpoint-truncated. Under a rate limit
  *     the snapshot drains SLICE-WISE in deterministic file order
  *     (`Sv:k` offsets, restart-exact at the pinned version) — a
  *     100-TB table never arrives as one batch.
  *   - `startingVersion = Some(v)`: no snapshot batch; appends are
  *     consumed from version v on (v = 0 replays the full history; the
  *     JSON commits must still exist).
  *   - `startingTimestamp = Some(ms)`: the delta source's third mode —
  *     resolves (once, at first read, against the ICT-aware commit
  *     history) to the FIRST version whose commit time is at/after the
  *     instant, then behaves as `startingVersion`. An instant past the
  *     last commit refuses naming the available window (the delta
  *     behavior — a typo'd future date should not silently mean "from
  *     now on"). Mutually exclusive with `startingVersion`.
  *
  * `ignoreDeletes` / `skipChangeCommits` pass through to
  * [[PortableDelta.readAppends]]: an append stream refuses
  * row-changing commits by version unless told to skip them.
  *
  * Rate limits: `maxFilesPerTrigger` (file-granular windows, splits
  * oversized commits) and `maxBytesPerTrigger` (soft byte budget from
  * the adds' logged sizes — overshoot ≤ one file, ≥ one file per
  * trigger so the stream always progresses) compose; either alone
  * activates the file-granular offset path.
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
                             skipChangeCommits: Boolean = false,
                             maxFilesPerTrigger: Option[Int] = None,
                             maxBytesPerTrigger: Option[Long] = None,
                             startingTimestamp: Option[Long] = None) {
  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")
  startingVersion.foreach(v => require(v >= 0,
    s"startingVersion must be >= 0, got $v"))
  maxFilesPerTrigger.foreach(n => require(n >= 1,
    s"maxFilesPerTrigger must be >= 1, got $n"))
  maxBytesPerTrigger.foreach(n => require(n >= 1L,
    s"maxBytesPerTrigger must be >= 1, got $n"))
  require(startingVersion.isEmpty || startingTimestamp.isEmpty,
    "startingVersion and startingTimestamp are mutually exclusive")

  private val conf = spark.sessionState.newHadoopConf()
  private val ckPath = new Path(checkpointDir, "table-version-watermark")
  private val fs = ckPath.getFileSystem(conf)

  /** The consumer's durable offset: `version` with `filesConsumed` of
    * its append files delivered (`complete` = the whole commit is).
    * Serialized as `v` (complete — back-compatible with the plain
    * version watermark), `v:k` (mid-commit, under rate limits), or
    * `Sv:k` (mid INITIAL SNAPSHOT pinned at version v, k of its live
    * files delivered in path order). */
  final case class Offset(version: Long, filesConsumed: Int,
                          complete: Boolean, snapshot: Boolean = false) {
    def token: String =
      if (complete) version.toString
      else if (snapshot) s"S$version:$filesConsumed"
      else s"$version:$filesConsumed"
  }

  private def parseOffset(s: String): Offset =
    if (s.startsWith("S")) s.stripPrefix("S").split(':') match {
      case Array(v, k) => Offset(v.toLong, k.toInt, complete = false,
        snapshot = true)
    }
    else s.split(':') match {
      case Array(v) => Offset(v.toLong, -1, complete = true)
      case Array(v, k) => Offset(v.toLong, k.toInt, complete = false)
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

  /** The last FULLY processed version, or None before the first
    * committed batch (mid-commit offsets report the previous version —
    * the version itself has undelivered files; an in-flight initial
    * snapshot has processed no version at all). */
  def watermark: Option[Long] = offset.flatMap(o =>
    if (o.complete) Some(o.version)
    else if (o.snapshot) None
    else Some(o.version - 1))

  /** `startingTimestamp` resolved to its starting version — once, at
    * the first read that needs it (ICT-aware history; the sidecar keeps
    * it answerable after log cleanup). */
  private var resolvedStartTs: Option[Long] = None
  private def startVersionForTimestamp(ts: Long): Long = {
    if (resolvedStartTs.isEmpty) {
      val hist = PortableDelta.history(conf, tablePath)
      val atOrAfter = hist.filter(_._3 >= ts).map(_._1)
      require(atOrAfter.nonEmpty,
        s"startingTimestamp $ts is after the last commit of $tablePath " +
          s"(commit times span ${hist.map(_._3).min}..${hist.map(_._3).max})")
      resolvedStartTs = Some(atOrAfter.min)
    }
    resolvedStartTs.get
  }

  /** One trigger's read, or None when caught up. Does NOT advance the
    * offset — call [[commitProgress]] after the batch lands. */
  /** One rate-limited slice of the initial snapshot pinned at `v`. */
  private def snapshotSlice(v: Long, fromFile: Int): (DataFrame, Offset) = {
    val (df, end, complete) = PortableDelta.readSnapshotSlice(
      spark, tablePath, v, fromFile,
      maxFiles = maxFilesPerTrigger.getOrElse(Int.MaxValue),
      maxBytes = maxBytesPerTrigger.getOrElse(Long.MaxValue))
    (df, if (complete) Offset(v, -1, complete = true)
         else Offset(v, end, complete = false, snapshot = true))
  }

  def readAvailable(): Option[(DataFrame, Offset)] = {
    val cur = PortableDelta.currentVersion(spark, tablePath)
    val start: Option[(Long, Int)] = offset match {
      case None =>
        (startingVersion, startingTimestamp) match {
          case (None, None) =>
            // initial snapshot pinned at the poll's version — under a
            // rate limit it drains slice-wise (a 100-TB table must not
            // join as ONE batch); unlimited keeps the single batch
            if (maxFilesPerTrigger.isDefined || maxBytesPerTrigger.isDefined)
              return Some(snapshotSlice(cur, 0))
            return Some((PortableDelta.readTable(spark, tablePath, cur),
              Offset(cur, -1, complete = true)))
          case (Some(v0), _) => if (v0 > cur) None else Some((v0, 0))
          case (None, Some(ts)) =>
            val v0 = startVersionForTimestamp(ts)
            if (v0 > cur) None else Some((v0, 0))
        }
      case Some(o) if o.snapshot =>
        // resume the in-flight snapshot AT ITS PINNED VERSION — commits
        // racing past it arrive later as appends; absent rate limits the
        // remainder drains in one slice
        return Some(snapshotSlice(o.version, o.filesConsumed))
      case Some(o) =>
        if (o.complete) {
          if (o.version + 1 > cur) None else Some((o.version + 1, 0))
        } else Some((o.version, o.filesConsumed))
    }
    start.map { case (fromV, fromOff) =>
      (maxFilesPerTrigger, maxBytesPerTrigger) match {
        // A mid-commit offset ("v:k", written under a rate limit that is
        // no longer configured) still has k consumed files to skip —
        // route through the file-granular window or the prefix would be
        // re-delivered (duplicate rows) on restart.
        case (None, None) if fromOff <= 0 =>
          val to = math.min(cur, fromV + maxVersionsPerTrigger - 1)
          (PortableDelta.readAppends(spark, tablePath, fromV, to,
            ignoreDeletes, skipChangeCommits), Offset(to, -1, complete = true))
        case (mf, mb) =>
          val (df, endV, endOff, endComplete) =
            PortableDelta.readAppendsWindow(spark, tablePath, fromV, fromOff,
              cur, maxVersionsPerTrigger, mf.getOrElse(Int.MaxValue),
              ignoreDeletes, skipChangeCommits,
              maxBytes = mb.getOrElse(Long.MaxValue))
          (df, Offset(endV, endOff, endComplete))
      }
    }
  }

  /** Advance the durable offset — atomic overwrite-rename; call only
    * after the batch's effects are durable. */
  def commitProgress(off: Offset): Unit = {
    fs.mkdirs(ckPath.getParent)
    val tmp = new Path(ckPath.getParent,
      s".wm-tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(off.token.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(fs.getUri, conf)
    fc.rename(tmp, ckPath, Options.Rename.OVERWRITE)
  }

  /** Version-granular convenience (the common no-rate-limit path). */
  def commitProgress(endVersion: Long): Unit =
    commitProgress(Offset(endVersion, -1, complete = true))

  /** Trigger.AvailableNow drain: read → process → commit until caught
    * up (commits landing mid-drain are picked up too). The callback
    * receives the window's end VERSION; under `maxFilesPerTrigger` a
    * split commit invokes it once per slice with the same version.
    * Returns the number of batches processed. */
  def runAvailableNow(process: (DataFrame, Long) => Unit): Int = {
    var n = 0
    var more = true
    while (more) readAvailable() match {
      case Some((rows, off)) =>
        process(rows, off.version)
        commitProgress(off)
        n += 1
      case None => more = false
    }
    n
  }
}
