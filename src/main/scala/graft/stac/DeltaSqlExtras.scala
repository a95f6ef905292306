package graft.stac

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Spark's native time-travel SYNTAX over portable-delta tables:
  *
  *   SELECT * FROM pd_table VERSION AS OF 3
  *   SELECT * FROM pd_table TIMESTAMP AS OF '2024-01-02 03:04:05'
  *   SELECT * FROM `portable-delta`.`/data/tbl` VERSION AS OF 3
  *
  * The parser produces [[RelationTimeTravel]]; Spark's own resolution
  * supports it only for v2 catalogs (a V1 session-catalog table throws
  * UNSUPPORTED_FEATURE.TIME_TRAVEL DURING resolution — before any
  * post-hoc rule could run). So this rule injects at the HINT
  * RESOLUTION seam, the batch that runs BEFORE Resolution: a
  * RelationTimeTravel whose target is a portable-delta catalog table
  * (or the `portable-delta`.`path` two-part form) rewrites directly to
  * the relation built with the existing `versionAsOf`/`timestampAsOf`
  * reader options — the exact code path the options already gate-test,
  * including the parse-timestamps-in-UTC rule. Non-portable-delta
  * targets pass through untouched (Spark's own error stands). */
class ResolveDeltaTimeTravel(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, tsOpt, vOpt) =>
      pdPath(u.multipartIdentifier) match {
        case None => tt
        case Some(path) =>
          val opts: Map[String, String] = (vOpt, tsOpt) match {
            case (Some(v), None) => Map("versionAsOf" -> v)
            case (None, Some(ts)) => Map("timestampAsOf" -> tsString(ts, path))
            case _ => throw new IllegalArgumentException(
              s"time travel over $path: specify VERSION AS OF or " +
                "TIMESTAMP AS OF, exactly one")
          }
          LogicalRelation(PortableDeltaRelation(spark, path, opts))
      }
  }

  /** `TIMESTAMP AS OF <expr>` → the reader option's string form: a
    * string literal passes through (parsed in explicit UTC by the
    * relation — the documented rule), a timestamp literal converts to
    * epoch millis. Anything non-literal refuses by name. */
  private def tsString(e: Expression, path: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case Literal(us: Long, TimestampType) => (us / 1000L).toString
    case other => throw new UnsupportedOperationException(
      s"TIMESTAMP AS OF over portable-delta table $path takes a literal " +
        s"string or timestamp, got $other — computed instants are not " +
        "supported; evaluate the expression and pass the literal")
  }

  /** Resolve a time-travel target to a portable-delta table path:
    * `portable-delta`.`<path>` directly, or a session-catalog table
    * whose provider is portable-delta (path from its storage
    * properties). None = not ours. */
  private def pdPath(parts: Seq[String]): Option[String] = parts match {
    case Seq(fmt, p) if fmt.equalsIgnoreCase("portable-delta") ||
        fmt.equalsIgnoreCase("portable_delta") => Some(p)
    case _ =>
      val cat = spark.sessionState.catalog
      val identOpt = parts match {
        case Seq(t) => Some(TableIdentifier(t))
        case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
        case Seq(c, db, t) if c.equalsIgnoreCase("spark_catalog") =>
          Some(TableIdentifier(t, Some(db)))
        case _ => None
      }
      identOpt
        .filterNot(_ => cat.isTempView(parts))
        .filter(cat.tableExists)
        .flatMap { i =>
          val meta = cat.getTableMetadata(i)
          if (meta.provider.exists(_.equalsIgnoreCase("portable-delta")))
            meta.storage.properties.get("path")
              .orElse(meta.storage.locationUri.map(u => new Path(u).toString))
          else None
        }
  }
}

/** SQL maintenance statements over portable-delta tables — the
  * delta-spark statements Spark's parser lacks, as a PARSER extension
  * (`injectParser`; a TVF with side effects would hide a write behind
  * a read — not acceptable):
  *
  *   OPTIMIZE '<path>'|table [WHERE <predicate>] [ZORDER BY (c1, c2)]
  *   VACUUM   '<path>'|table [LITE] [RETAIN <n> HOURS]
  *   RESTORE  [TABLE] '<path>'|table TO VERSION AS OF <v>
  *   RESTORE  [TABLE] '<path>'|table TO TIMESTAMP AS OF '<ts>'
  *
  * Each routes to the existing verb ([[PortableDelta.optimizeCompact]]
  * / [[PortableDelta.optimizeZOrder]] / [[PortableDelta.vacuum]] /
  * [[PortableDelta.vacuumLite]] / [[PortableDelta.restore]]) and
  * surfaces the verb's operation metrics as the result rows
  * (delta-spark's shape). Anything that does not match the grammar
  * falls through to the delegate parser untouched — including
  * OPTIMIZE/VACUUM/RESTORE over non-portable-delta tables, which keep
  * Spark's stock parse error. */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maybeParse(spark, delegate, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // the statement grammars — case-insensitive, whitespace-tolerant;
  // the target is a single-quoted path, a backquoted path, or a
  // (possibly db-qualified) table identifier resolved via the catalog
  private val Optimize =
    ("""(?is)^\s*OPTIMIZE\s+('[^']*'|`[^`]*`|\S+)""" +
      """(?:\s+WHERE\s+(.+?))?""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val Vacuum =
    ("""(?is)^\s*VACUUM\s+('[^']*'|`[^`]*`|\S+)""" +
      """(\s+LITE)?(?:\s+RETAIN\s+(\d+)\s+HOURS)?(\s+LITE)?\s*;?\s*$""").r
  private val Restore =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?('[^']*'|`[^`]*`|\S+)\s+TO\s+""" +
      """(VERSION|TIMESTAMP)\s+AS\s+OF\s+(.+?)\s*;?\s*$""").r

  private[stac] def maybeParse(spark: SparkSession, delegate: ParserInterface,
                               sql: String): Option[LogicalPlan] = sql match {
    case Optimize(target, whereS, zorderS) =>
      resolveTarget(spark, target).map { path =>
        val zCols = Option(zorderS).map(_.split(',').map(_.trim)
          .map(stripQuotes).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        val whereE = Option(whereS).map(delegate.parseExpression)
        if (zCols.nonEmpty && whereE.isDefined)
          throw new UnsupportedOperationException(
            s"OPTIMIZE $path: ZORDER BY with WHERE is not supported — " +
              "z-order the whole table, or compact the WHERE scope without " +
              "ZORDER")
        PortableDeltaOptimizeCommand(path, zCols,
          DmlExprs(whereE.toSeq: _*), hasWhere = whereE.isDefined)
      }
    case Vacuum(target, lite1, retainS, lite2) =>
      resolveTarget(spark, target).map { path =>
        PortableDeltaVacuumCommand(path,
          retainHours = Option(retainS).map(_.toLong),
          lite = lite1 != null || lite2 != null)
      }
    case Restore(target, kind, value) =>
      resolveTarget(spark, target).map { path =>
        if (kind.equalsIgnoreCase("VERSION"))
          PortableDeltaRestoreCommand(path,
            version = Some(value.trim.toLong), tsMillis = None)
        else {
          val v = stripQuotes(value.trim)
          val ms = scala.util.Try(v.toLong).getOrElse(
            PortableDeltaRelation.parseUtcMillis(v))
          PortableDeltaRestoreCommand(path, version = None,
            tsMillis = Some(ms))
        }
      }
    case _ => None
  }

  private def stripQuotes(s: String): String =
    if ((s.startsWith("'") && s.endsWith("'")) ||
        (s.startsWith("`") && s.endsWith("`"))) s.substring(1, s.length - 1)
    else s

  /** The statement's target as a portable-delta table path: a quoted
    * path directly; an identifier through the catalog when it names a
    * portable-delta table. None = not ours, fall through to the
    * delegate parser (Spark's stock error). */
  private def resolveTarget(spark: SparkSession, raw: String): Option[String] = {
    if (raw.startsWith("'") || raw.startsWith("`")) Some(stripQuotes(raw))
    else {
      val cat = spark.sessionState.catalog
      val identOpt = raw.split('.').toSeq match {
        case Seq(t) => Some(TableIdentifier(t))
        case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
        case _ => None
      }
      identOpt.filter(i => scala.util.Try(cat.tableExists(i)).getOrElse(false))
        .flatMap { i =>
          val meta = cat.getTableMetadata(i)
          if (meta.provider.exists(_.equalsIgnoreCase("portable-delta")))
            meta.storage.properties.get("path")
              .orElse(meta.storage.locationUri.map(u => new Path(u).toString))
          else None
        }
    }
  }
}

/** Planned `OPTIMIZE` — compaction ([[PortableDelta.optimizeCompact]],
  * optionally scoped by WHERE) or z-order ([[PortableDelta
  * .optimizeZOrder]], bin count from live bytes / 128 MB target).
  * Result row mirrors the verb's operation metrics. */
private[stac] final case class PortableDeltaOptimizeCommand(
    tablePath: String, zorderBy: Seq[String], whereExpr: DmlExprs,
    hasWhere: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_removed_files", IntegerType, nullable = false)(),
    AttributeReference("num_added_files", IntegerType, nullable = false)(),
    AttributeReference("purged_dv_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val st =
      if (zorderBy.nonEmpty) {
        val live = PortableDelta.snapshot(spark, tablePath)
        val bins = math.max(1L,
          (live.files.map(_.size).sum + (128L << 20) - 1) / (128L << 20)).toInt
        PortableDelta.optimizeZOrder(spark, tablePath, zorderBy, bins)
      } else PortableDelta.optimizeCompact(spark, tablePath,
        where = if (hasWhere)
          Some(org.apache.spark.sql.GraftSqlShim.column(whereExpr.es.head))
        else None)
    DmlCacheDrop(spark, tablePath)
    Seq(Row(tablePath, st.version, st.removedFiles, st.addedFiles,
      st.purgedDvRows))
  }
}

/** Planned `VACUUM` — full-tree listing reclaim or the LITE
  * (log-tombstone-driven) variant; `RETAIN n HOURS` maps to the grace
  * window, default the verb's retention floor. */
private[stac] final case class PortableDeltaVacuumCommand(
    tablePath: String, retainHours: Option[Long], lite: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("num_files_deleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val grace = retainHours.map(_ * 3600L * 1000L).getOrElse(-1L)
    val n =
      if (lite) PortableDelta.vacuumLite(spark, tablePath, graceMillis = grace)
      else PortableDelta.vacuum(spark, tablePath, graceMillis = grace)
    Seq(Row(tablePath, n.toLong))
  }
}

/** Planned `RESTORE TABLE … TO VERSION|TIMESTAMP AS OF …` — pure log
  * surgery via [[PortableDelta.restore]]; result row mirrors
  * RestoreStats. */
private[stac] final case class PortableDeltaRestoreCommand(
    tablePath: String, version: Option[Long], tsMillis: Option[Long])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("num_restored_files", IntegerType, nullable = false)(),
    AttributeReference("num_removed_files", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val st = version match {
      case Some(v) => PortableDelta.restore(spark, tablePath, v)
      case None => PortableDelta.restoreAtTimestamp(spark, tablePath,
        tsMillis.getOrElse(throw new IllegalStateException(
          "RESTORE needs a version or a timestamp")))
    }
    DmlCacheDrop(spark, tablePath)
    Seq(Row(tablePath, st.version, st.restoredVersion, st.addedFiles,
      st.removedFiles))
  }
}
