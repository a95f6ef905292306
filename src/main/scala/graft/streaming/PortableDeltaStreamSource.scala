package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.stac.PortableDelta

/** Offset of [[PortableDeltaStreamSource]] — the token grammar the
  * Scala-API sources already persist ("v" = all of version v consumed;
  * "v:k" = k append files of v consumed, under a rate limit; "Sv:k" =
  * mid INITIAL SNAPSHOT pinned at v, k live files delivered in path
  * order). The raw token IS the json: Spark's offset log stores it
  * verbatim, and a human can read the checkpoint. */
private[graft] final case class PortableDeltaSourceOffset(token: String)
    extends OffsetV1 {
  override def json: String = token
}

/** `spark.readStream.format("portable-delta")` — the V1 streaming
  * SOURCE over a portable Delta table, the declarative read to match
  * the round-14 declarative sink: appends by default, row-level
  * changes under `option("readChangeFeed", "true")`. Spark's own
  * checkpoint (the offset/commit logs) owns progress — unlike
  * [[DeltaTableSource]]/[[DeltaCdfSource]] (the pull-style AvailableNow
  * harnesses with their own watermark file), this source never writes
  * its own state; `getBatch(start, end)` reconstructs any logged window
  * EXACTLY from the two offsets, so a restart — even one that changed
  * the rate-limit options — replays the in-flight batch bit-identically
  * ([[PortableDelta.readAppendsRange]]).
  *
  * Stream start (the delta source's modes): default = the table's
  * current snapshot as the first batch(es) — under `maxFilesPerTrigger`
  * / `maxBytesPerTrigger` the snapshot drains SLICE-WISE in
  * deterministic file order (`Sv:k` offsets, the 100-TB join rule) —
  * then incremental appends; `startingVersion` skips the snapshot;
  * `startingTimestamp` resolves against the ICT-aware commit history.
  * CDF mode mirrors delta-spark: default = snapshot as `insert` rows
  * stamped with the pinned version, then changes; `startingVersion`
  * replays the feed.
  *
  * Scale: the per-trigger poll is a SMALL-state version read (never the
  * add list); `getOffset` plans the next window from the JSON commits
  * it admits (bounded by the trigger's own size) or two cheap
  * executor passes over the pinned slice ordering; each batch is ONE
  * bounded scan plan. Restart resumes from Spark's offset log alone.
  *
  * Reference scope: stac-geoparquet has no streaming surface; this
  * completes the engine's declarative streaming story (st22). */
final class PortableDeltaStreamSource(
    spark: SparkSession,
    tablePath: String,
    cdf: Boolean,
    maxVersionsPerTrigger: Int,
    maxFilesPerTrigger: Option[Int],
    maxBytesPerTrigger: Option[Long],
    startingVersion: Option[Long],
    startingTimestamp: Option[Long],
    ignoreDeletes: Boolean,
    skipChangeCommits: Boolean) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")
  maxFilesPerTrigger.foreach(n => require(n >= 1,
    s"maxFilesPerTrigger must be >= 1, got $n"))
  maxBytesPerTrigger.foreach(n => require(n >= 1L,
    s"maxBytesPerTrigger must be >= 1, got $n"))
  require(startingVersion.isEmpty || startingTimestamp.isEmpty,
    "startingVersion and startingTimestamp are mutually exclusive")

  private val conf = spark.sessionState.newHadoopConf()
  private val rateLimited =
    maxFilesPerTrigger.isDefined || maxBytesPerTrigger.isDefined
  private val mf = maxFilesPerTrigger.getOrElse(Int.MaxValue)
  private val mb = maxBytesPerTrigger.getOrElse(Long.MaxValue)

  override val schema: StructType =
    PortableDeltaStreamSource.schemaFor(spark, tablePath, cdf)

  // ---- offsets ----------------------------------------------------

  private case class Tok(version: Long, k: Int, complete: Boolean,
                         snapshot: Boolean = false) {
    def token: String =
      if (complete) version.toString
      else if (snapshot) s"S$version:$k"
      else s"$version:$k"
  }

  private def parse(json: String): Tok =
    if (json.startsWith("S")) json.stripPrefix("S").split(':') match {
      case Array(v, k) => Tok(v.toLong, k.toInt, complete = false,
        snapshot = true)
      case _ => throw new IllegalArgumentException(s"bad offset: $json")
    }
    else json.split(':') match {
      case Array(v) => Tok(v.toLong, -1, complete = true)
      case Array(v, k) => Tok(v.toLong, k.toInt, complete = false)
      case _ => throw new IllegalArgumentException(s"bad offset: $json")
    }

  /** The source's position: seeded by the engine's restart-init
    * `getBatch` call (MicroBatchExecution replays the last logged batch
    * before asking for new offsets), advanced by `getOffset`. */
  private var lastEnd: Option[Tok] = None

  /** `startingTimestamp` resolved once against the ICT-aware history. */
  private lazy val resolvedStart: Option[Long] =
    startingVersion.orElse(startingTimestamp.map { ts =>
      val hist = PortableDelta.history(conf, tablePath)
      val atOrAfter = hist.filter(_._3 >= ts).map(_._1)
      require(atOrAfter.nonEmpty,
        s"startingTimestamp $ts is after the last commit of $tablePath " +
          s"(commit times span ${hist.map(_._3).min}..${hist.map(_._3).max})")
      atOrAfter.min
    })

  private def sliceEndTok(v: Long, from: Int): Tok = {
    val (end, complete) = PortableDelta.snapshotSliceEnd(
      spark, tablePath, v, from, mf, mb)
    if (complete) Tok(v, -1, complete = true)
    else Tok(v, end, complete = false, snapshot = true)
  }

  private def appendsEndTok(fromV: Long, fromOff: Int, cur: Long): Tok =
    if (!rateLimited && fromOff <= 0)
      Tok(math.min(cur, fromV + maxVersionsPerTrigger - 1), -1,
        complete = true)
    else {
      val (v, off, complete) = PortableDelta.appendsWindowEnd(spark,
        tablePath, fromV, math.max(fromOff, 0), cur, maxVersionsPerTrigger,
        mf, ignoreDeletes, skipChangeCommits, mb)
      Tok(v, off, complete)
    }

  /** CDF windows pack WHOLE versions (a commit's change feed is its
    * atomic unit) — the [[DeltaCdfSource]] admission rule. */
  private def cdfEndTok(fromV: Long, cur: Long): Tok = {
    val cap = math.min(cur, fromV + maxVersionsPerTrigger - 1)
    val to = if (!rateLimited) cap else {
      var v = fromV
      var files = 0; var bytes = 0L
      var end = fromV
      var fits = true
      while (fits && v <= cap) {
        val (f, b) = PortableDelta.cdfCommitLoad(conf, tablePath, v)
        if (v == fromV || (files + f <= mf && bytes + b <= mb)) {
          files += f; bytes += b; end = v; v += 1
        } else fits = false
      }
      end
    }
    Tok(to, -1, complete = true)
  }

  /** Trigger.AvailableNow: the drain's frozen target version. The
    * engine calls [[prepareForTriggerAvailableNow]] once at start;
    * every window then caps at this version and the drain ends when
    * the stream reaches it — commits racing in DURING the drain wait
    * for the next run, the AvailableNow contract. */
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(PortableDelta.currentVersion(spark, tablePath))

  /** The admission-control form of [[getOffset]] — STATELESS: the
    * engine hands the previous batch's end, so restarts need no seam
    * at all on this path. Implementing [[org.apache.spark.sql.connector
    * .read.streaming.SupportsAdmissionControl]] routes ALL triggers
    * here (checked before the plain-Source branch); plain [[getOffset]]
    * stays for completeness. Returns `start` itself when caught up
    * (same offset ⇒ no new batch), null when nothing is available at
    * all. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    // a null start is NOT always a fresh stream: after a restart whose
    // last batch was uncommitted, the engine replays it through
    // getBatch (seeding lastEnd) and may then ask for the next offset
    // without a start — trusting null here would re-pin a NEW snapshot
    // and re-deliver the table. The passed start wins when present;
    // the seeded position covers the replay window.
    val s = Option(start).map(o => parse(o.json())).orElse(lastEnd)
    val next = nextEnd(s)
    next.foreach(t => lastEnd = Some(t))
    next.map(t => PortableDeltaSourceOffset(t.token): org.apache.spark.sql
      .connector.read.streaming.Offset).getOrElse(start)
  }

  private def nextEnd(last: Option[Tok]): Option[Tok] = {
    val cur0 = PortableDelta.currentVersion(spark, tablePath)
    val cur = availableNowTarget.fold(cur0)(math.min(cur0, _))
    last match {
      case None => resolvedStart match {
        case Some(v0) =>
          if (v0 > cur) None
          else Some(if (cdf) cdfEndTok(v0, cur) else appendsEndTok(v0, 0, cur))
        case None =>
          // initial snapshot pinned at the poll's version; under a rate
          // limit it drains slice-wise (a 100-TB table must not join as
          // ONE batch)
          if (rateLimited) Some(sliceEndTok(cur, 0))
          else Some(Tok(cur, -1, complete = true))
      }
      case Some(t) if t.snapshot => Some(sliceEndTok(t.version, t.k))
      case Some(t) if t.complete =>
        if (t.version + 1 > cur) None
        else Some(if (cdf) cdfEndTok(t.version + 1, cur)
                  else appendsEndTok(t.version + 1, 0, cur))
      case Some(t) => // mid-commit (appends only)
        Some(appendsEndTok(t.version, t.k, cur))
    }
  }

  override def getOffset: Option[OffsetV1] = {
    val next = nextEnd(lastEnd)
    next.foreach(t => lastEnd = Some(t))
    next.orElse(lastEnd).map(t => PortableDeltaSourceOffset(t.token))
  }

  // ---- batches ----------------------------------------------------

  /** Commit timestamps resolved per version, cached for the drain: a
    * rate-limited initial snapshot calls [[insertShaped]] once per
    * SLICE with the same pinned version — without the cache each
    * trigger would pay a log read; with it the whole drain pays one
    * O(1) single-version read ([[PortableDelta.commitTimestampAt]],
    * never the full history walk). */
  @transient private lazy val commitTsCache =
    scala.collection.mutable.Map.empty[Long, Long]

  private def insertShaped(df: DataFrame, v: Long): DataFrame = {
    val tsMs = commitTsCache.getOrElseUpdate(v,
      PortableDelta.commitTimestampAt(conf, tablePath, v))
    df.withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(v))
      .withColumn("_commit_timestamp", (lit(tsMs) / 1000L).cast("timestamp"))
  }

  private def snapshotSliceExact(v: Long, from: Int, to: Int): DataFrame = {
    require(to > from, s"empty snapshot slice [$from, $to) of $tablePath@$v")
    val (df, got, _) = PortableDelta.readSnapshotSlice(
      spark, tablePath, v, from, maxFiles = to - from)
    require(got == to, s"snapshot slice of $tablePath@$v landed at file " +
      s"$got, offset log says $to — the pinned ordering must be stable")
    df
  }

  private def snapshotRemainder(v: Long, from: Int): DataFrame =
    PortableDelta.readSnapshotSlice(spark, tablePath, v, from,
      maxFiles = Int.MaxValue)._1

  private def batchAppends(s: Option[Tok], e: Tok): DataFrame = (s, e) match {
    case (so, Tok(v, k, false, true)) => // end mid-snapshot
      val from = so match {
        case None => 0
        case Some(t) if t.snapshot && t.version == v => t.k
        case other => throw new IllegalStateException(
          s"offset log pairs mid-snapshot end S$v:$k with $other")
      }
      snapshotSliceExact(v, from, k)
    case (None, Tok(v, _, true, _)) => resolvedStart match {
      case None => PortableDelta.readTable(spark, tablePath, v) // full snapshot
      case Some(v0) => PortableDelta.readAppendsRange(spark, tablePath,
        v0, 0, v, None, ignoreDeletes, skipChangeCommits)
    }
    case (Some(t), Tok(v, _, true, _)) if t.snapshot =>
      require(t.version == v, s"snapshot pinned at ${t.version} cannot " +
        s"complete at version $v")
      snapshotRemainder(v, t.k)
    case (Some(t), Tok(v, k, complete, _)) =>
      val (fromV, fromOff) =
        if (t.complete) (t.version + 1, 0) else (t.version, t.k)
      PortableDelta.readAppendsRange(spark, tablePath, fromV, fromOff, v,
        if (complete) None else Some(k), ignoreDeletes, skipChangeCommits)
    case (None, Tok(v, k, false, _)) => resolvedStart match {
      case Some(v0) => PortableDelta.readAppendsRange(spark, tablePath,
        v0, 0, v, Some(k), ignoreDeletes, skipChangeCommits)
      case None => throw new IllegalStateException(
        s"offset log starts mid-commit at $v:$k with no starting version")
    }
  }

  private def batchCdf(s: Option[Tok], e: Tok): DataFrame = (s, e) match {
    case (so, Tok(v, k, false, true)) =>
      val from = so match {
        case None => 0
        case Some(t) if t.snapshot && t.version == v => t.k
        case other => throw new IllegalStateException(
          s"offset log pairs mid-snapshot end S$v:$k with $other")
      }
      insertShaped(snapshotSliceExact(v, from, k), v)
    case (None, Tok(v, _, true, _)) => resolvedStart match {
      case None => insertShaped(PortableDelta.readTable(spark, tablePath, v), v)
      case Some(v0) => PortableDelta.readChanges(spark, tablePath, v0, v)
    }
    case (Some(t), Tok(v, _, true, _)) if t.snapshot =>
      require(t.version == v, s"snapshot pinned at ${t.version} cannot " +
        s"complete at version $v")
      insertShaped(snapshotRemainder(v, t.k), v)
    case (Some(t), Tok(v, _, true, _)) =>
      PortableDelta.readChanges(spark, tablePath, t.version + 1, v)
    case (_, other) => throw new IllegalStateException(
      s"CDF offsets are version-granular; got $other")
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val s = start.map(o => parse(o.json))
    val e = parse(end.json)
    // seed/advance position — the engine replays the last logged batch
    // on restart before asking for new offsets (the V1 contract)
    lastEnd = Some(e)
    if (s.contains(e))
      return org.apache.spark.sql.GraftSqlShim.emptyStreamingBatch(spark, schema)
    val df = if (cdf) batchCdf(s, e) else batchAppends(s, e)
    require(df.schema.fieldNames.sameElements(schema.fieldNames),
      s"schema of $tablePath changed mid-stream " +
        s"(${df.schema.fieldNames.mkString(",")} vs pinned " +
        s"${schema.fieldNames.mkString(",")}) — restart the stream to " +
        "pick up the evolved schema")
    org.apache.spark.sql.GraftSqlShim.streamingBatch(df, schema)
  }

  override def commit(end: OffsetV1): Unit = () // Spark's checkpoint owns progress

  override def stop(): Unit = ()

  override def toString: String =
    s"PortableDeltaStreamSource[$tablePath${if (cdf) ", cdf" else ""}]"
}

private[graft] object PortableDeltaStreamSource {

  /** The stream's pinned schema: the table's logical schema,
    * deep-nullable (the readTable read contract), plus the CDF columns
    * in change-feed mode. A SMALL-state read — never the add list. */
  def schemaFor(spark: SparkSession, tablePath: String,
                cdf: Boolean): StructType = {
    val snap = PortableDelta.smallSnapshot(spark, tablePath)
    val base = StructType(snap.schema.fields.map(f => f.copy(
      dataType = PortableDelta.deepNullable(f.dataType), nullable = true)))
    if (!cdf) base
    else StructType(base.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType),
      StructField("_commit_timestamp", TimestampType)))
  }
}
