package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * Rate limits (`maxFilesPerTrigger` / `maxBytesPerTrigger`, either or
  * both) pack WHOLE versions per trigger against the commits' changed
  * file/byte load — a commit's change feed is its atomic unit (pre/
  * post-image pairing cannot split), so unlike [[DeltaTableSource]]
  * there is no mid-commit offset; at least one commit always admits,
  * so a single oversized commit cannot stall the stream. */
final class DeltaCdfSource(spark: SparkSession, tablePath: String,
                           checkpointDir: String,
                           maxVersionsPerTrigger: Int = 32,
                           maxFilesPerTrigger: Option[Int] = None,
                           maxBytesPerTrigger: Option[Long] = None) {
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

  /** The last PROCESSED version (-1 before the first commit): restored
    * from the checkpoint file, so a restarted consumer resumes exactly
    * where its last committed batch ended. */
  def watermark: Long =
    if (!fs.exists(ckPath)) -1L
    else {
      val in = fs.open(ckPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }

  /** One trigger's read: the changes of versions
    * `(watermark, min(current, watermark + maxVersionsPerTrigger)]`,
    * or None when the consumer is caught up. Does NOT advance the
    * watermark — call [[commitProgress]] after the batch lands. */
  def readAvailable(): Option[(DataFrame, Long)] = {
    val cur = PortableDelta.currentVersion(spark, tablePath)
    val from = watermark + 1
    if (from > cur) None
    else {
      val cap = math.min(cur, from + maxVersionsPerTrigger - 1)
      // rate limits pack WHOLE versions (a commit's change feed is its
      // atomic unit — pre/post-image pairing cannot split): admit
      // commits while the cumulative changed-file/byte load fits, and
      // always admit at least one so the stream progresses past any
      // single oversized commit
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
      Some((PortableDelta.readChanges(spark, tablePath, from, to), to))
    }
  }

  /** Advance the watermark to `endVersion` — atomic overwrite-rename,
    * so a crash leaves either the old or the new mark, never a torn
    * file. Must be called only after the batch's effects are durable. */
  def commitProgress(endVersion: Long): Unit = {
    fs.mkdirs(ckPath.getParent)
    val tmp = new Path(ckPath.getParent,
      s".wm-tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(endVersion.toString.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(fs.getUri, conf)
    fc.rename(tmp, ckPath, Options.Rename.OVERWRITE)
  }

  /** Trigger.AvailableNow drain: process every pending window (read →
    * process → commit) until caught up with the table AS OF the drain's
    * start-ish — each loop re-polls, so commits landing mid-drain are
    * picked up too. Returns the number of batches processed. */
  def runAvailableNow(process: (DataFrame, Long) => Unit): Int = {
    var n = 0
    var more = true
    while (more) readAvailable() match {
      case Some((changes, to)) =>
        process(changes, to)
        commitProgress(to)
        n += 1
      case None => more = false
    }
    n
  }
}
