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

/** SQL maintenance + ALTER statements over portable-delta tables —
  * the delta-spark statements Spark's parser lacks (or accepts only
  * for catalog-native tables), as a PARSER extension (`injectParser`;
  * a TVF with side effects would hide a write behind a read — not
  * acceptable):
  *
  *   OPTIMIZE '<path>'|table [WHERE <predicate>] [ZORDER BY (c1, c2)]
  *   VACUUM   '<path>'|table [LITE] [RETAIN <n> HOURS]
  *   RESTORE  [TABLE] '<path>'|table TO VERSION AS OF <v>
  *   RESTORE  [TABLE] '<path>'|table TO TIMESTAMP AS OF '<ts>'
  *   ALTER TABLE t ADD COLUMN(S) (name type [COMMENT '…'], …)
  *   ALTER TABLE t ALTER|CHANGE COLUMN c TYPE <widerType>
  *   ALTER TABLE t SET TBLPROPERTIES ('k'='v', …)
  *   ALTER TABLE t UNSET TBLPROPERTIES ('k', …)
  *   ALTER TABLE t RENAME COLUMN a TO b  |  DROP COLUMN(S) a, b
  *   ALTER TABLE t ADD CONSTRAINT name CHECK (expr)  |  DROP CONSTRAINT name
  *   ALTER TABLE t CLUSTER BY (c1, c2)  |  CLUSTER BY NONE
  *   ALTER TABLE t DROP FEATURE name [TRUNCATE HISTORY]
  *   CONVERT TO DELTA parquet.`<path>` [PARTITIONED BY (col type, …)]
  *   CREATE TABLE '<dst path>' SHALLOW CLONE t [VERSION|TIMESTAMP AS OF …]
  *   DESCRIBE HISTORY t  |  DESCRIBE DETAIL t
  *   SHOW TBLPROPERTIES t [('key')]       (answers from the LOG)
  *   FSCK REPAIR TABLE t [DRY RUN]
  *   GENERATE symlink_format_manifest FOR TABLE t
  *
  * Each routes to the existing verb ([[PortableDelta.optimizeCompact]]
  * / [[PortableDelta.optimizeZOrder]] / [[PortableDelta.vacuum]] /
  * [[PortableDelta.vacuumLite]] / [[PortableDelta.restore]] / the
  * [[DeltaAlter]] family) and surfaces the verb's operation metrics as
  * the result rows (delta-spark's shape); every verb refusal surfaces
  * unchanged, and the SQL `VACUUM … RETAIN` adds delta-spark's
  * retention-floor check. Anything that does not match the grammar —
  * including any statement over a non-portable-delta table — falls
  * through to the delegate parser untouched (Spark's stock behavior,
  * asserted in the specs). */
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
  // ALTER TABLE statements (round 17): SQL-only users could not evolve
  // a table — every form routes to the existing DeltaAlter verb,
  // refusals preserved; non-portable-delta targets fall through to the
  // stock parser untouched
  private val AlterTarget = """('[^']*'|`[^`]*`|\S+)"""
  private val AlterAddConstraint =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+ADD\\s+CONSTRAINT\\s+""" +
      """(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*$""").r
  private val AlterDropConstraint =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+DROP\\s+CONSTRAINT\\s+""" +
      """(\w+)\s*;?\s*$""").r
  private val AlterAddCols =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+ADD\\s+COLUMNS?\\s*""" +
      """\((.+)\)\s*;?\s*$""").r
  private val AlterAddColBare =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+ADD\\s+COLUMNS?\\s+""" +
      """([^(].*?)\s*;?\s*$""").r
  private val AlterSetProps =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+SET\\s+TBLPROPERTIES\\s*""" +
      """\((.+)\)\s*;?\s*$""").r
  private val AlterUnsetProps =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+UNSET\\s+TBLPROPERTIES\\s*""" +
      """\((.+)\)\s*;?\s*$""").r
  private val AlterRenameCol =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+RENAME\\s+COLUMN\\s+""" +
      """(`[^`]*`|\w+)\s+TO\s+(`[^`]*`|\w+)\s*;?\s*$""").r
  private val AlterDropCols =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+DROP\\s+COLUMNS?\\s+""" +
      """\(?\s*((?:`[^`]*`|\w+)(?:\s*,\s*(?:`[^`]*`|\w+))*)\s*\)?\s*;?\s*$""").r
  private val AlterColType =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+(?:ALTER|CHANGE)\\s+""" +
      """COLUMN\s+(`[^`]*`|\w+)\s+TYPE\s+(.+?)\s*;?\s*$""").r
  private val AlterClusterBy =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+CLUSTER\\s+BY\\s+""" +
      """(?:\(([^)]+)\)|(NONE))\s*;?\s*$""").r
  private val AlterDropFeature =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$AlterTarget\\s+DROP\\s+FEATURE\\s+""" +
      """(`[^`]*`|\S+?)(\s+TRUNCATE\s+HISTORY)?\s*;?\s*$""").r
  // TBLPROPERTIES entries: 'k'='v' / "k"="v" / bare.key = bareValue
  private val PropPair =
    """('[^']*'|"[^"]*"|[\w.\-]+)\s*=\s*('[^']*'|"[^"]*"|[\w.\-]+)""".r
  private val PropKey = """('[^']*'|"[^"]*"|[\w.\-]+)""".r
  // CONVERT TO DELTA parquet.`/path` [PARTITIONED BY (col type, ...)]
  // — the target is a PATH (there is no catalog entry yet); identifier
  // targets fall through to the stock parse error
  private val ConvertToDelta =
    ("""(?is)^\s*CONVERT\s+TO\s+DELTA\s+(?:parquet\s*\.\s*)?""" +
      """('[^']*'|`[^`]*`)(?:\s+PARTITIONED\s+BY\s*\((.+)\))?\s*;?\s*$""").r
  // DESCRIBE HISTORY / DESCRIBE DETAIL — delta-spark's statements (the
  // TVFs remain; the statements are the documented delta syntax)
  private val DescHistory =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$AlterTarget\\s*;?\\s*$$""".r
  private val DescDetail =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$AlterTarget\\s*;?\\s*$$""".r
  // SHOW TBLPROPERTIES over a portable-delta target answers from the
  // LOG's configuration (delta-spark behavior) — the catalog copy only
  // carries creation-time options
  private val ShowProps =
    (s"""(?is)^\\s*SHOW\\s+TBLPROPERTIES\\s+$AlterTarget""" +
      """(?:\s*\(\s*('[^']*'|"[^"]*"|[\w.\-]+)\s*\))?\s*;?\s*$""").r
  private val Fsck =
    (s"""(?is)^\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$AlterTarget""" +
      """(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val GenManifest =
    ("""(?is)^\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+""" +
      s"""$AlterTarget\\s*;?\\s*$$""").r
  // CREATE TABLE '<dst path>' SHALLOW CLONE <src> [VERSION|TIMESTAMP AS OF …]
  // — the destination is a PATH (no catalog management here); the
  // source may be a catalog table or a path
  private val ShallowClone =
    ("""(?is)^\s*CREATE\s+TABLE\s+('[^']*'|`[^`]*`)\s+SHALLOW\s+CLONE\s+""" +
      s"""$AlterTarget(?:\\s+(VERSION|TIMESTAMP)\\s+AS\\s+OF\\s+(.+?))?""" +
      """\s*;?\s*$""").r

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
    case AlterAddConstraint(target, name, expr) =>
      alterCmd(spark, target, s"ADD CONSTRAINT $name") { (s, path) =>
        PortableDelta.addCheckConstraint(s, path, name, expr.trim)
      }
    case AlterDropConstraint(target, name) =>
      alterCmd(spark, target, s"DROP CONSTRAINT $name") { (s, path) =>
        PortableDelta.dropCheckConstraint(s, path, name)
      }
    case AlterSetProps(target, pairs) =>
      val props = PropPair.findAllMatchIn(pairs).map(m =>
        stripQuotes(m.group(1)) -> stripQuotes(m.group(2))).toMap
      if (props.isEmpty) None
      else alterCmd(spark, target, "SET TBLPROPERTIES") { (s, path) =>
        PortableDelta.setTableProperties(s, path, props)
      }
    case AlterUnsetProps(target, keysS) =>
      val keys = PropKey.findAllMatchIn(keysS).map(m =>
        stripQuotes(m.group(1))).toSeq
      if (keys.isEmpty) None
      else alterCmd(spark, target, "UNSET TBLPROPERTIES") { (s, path) =>
        PortableDelta.unsetTableProperties(s, path, keys)
      }
    case AlterRenameCol(target, from, to) =>
      alterCmd(spark, target, s"RENAME COLUMN $from") { (s, path) =>
        PortableDelta.renameColumn(s, path, stripQuotes(from), stripQuotes(to))
      }
    case AlterColType(target, colName, typeS) =>
      alterCmd(spark, target, s"ALTER COLUMN $colName TYPE") { (s, path) =>
        PortableDelta.widenColumnType(s, path, stripQuotes(colName),
          delegate.parseDataType(typeS.trim))
      }
    case AlterClusterBy(target, colsS, none) =>
      val cols =
        if (none != null) Nil
        else colsS.split(',').map(c => stripQuotes(c.trim)).filter(_.nonEmpty).toSeq
      alterCmd(spark, target, "CLUSTER BY") { (s, path) =>
        PortableDelta.alterClusterBy(s, path, cols)
      }
    case AlterDropFeature(target, name, trunc) =>
      alterCmd(spark, target, s"DROP FEATURE $name") { (s, path) =>
        PortableDelta.dropFeatureSupport(s, path, stripQuotes(name),
          truncateHistory = trunc != null)
      }
    case AlterAddCols(target, colDefs) =>
      alterAddColumns(spark, delegate, target, colDefs)
    case AlterAddColBare(target, colDef)
        // not a keyword form this grammar doesn't own (ADD CONSTRAINT
        // is matched above; IF NOT EXISTS stays with the stock parser)
        if !colDef.trim.toUpperCase(java.util.Locale.ROOT)
          .startsWith("IF ") =>
      alterAddColumns(spark, delegate, target, colDef)
    case AlterDropCols(target, colsS) =>
      val cols = """`[^`]*`|\w+""".r.findAllIn(colsS).map(stripQuotes).toSeq
      alterCmd(spark, target, s"DROP COLUMN ${cols.mkString(",")}") { (s, path) =>
        cols.map(c => PortableDelta.dropColumn(s, path, c)).last
      }
    case ConvertToDelta(target, partS) =>
      val ps = Option(partS).map(delegate.parseTableSchema)
      Some(PortableDeltaConvertCommand(stripQuotes(target), ps))
    case DescHistory(target) =>
      resolveTarget(spark, target).map(PortableDeltaHistoryCommand(_))
    case DescDetail(target) =>
      resolveTarget(spark, target).map(PortableDeltaDetailCommand(_))
    case ShowProps(target, keyS) =>
      resolveTarget(spark, target).map(p =>
        PortableDeltaShowPropsCommand(p, Option(keyS).map(stripQuotes)))
    case Fsck(target, dry) =>
      resolveTarget(spark, target).map(p =>
        PortableDeltaFsckCommand(p, dryRun = dry != null))
    case GenManifest(target) =>
      resolveTarget(spark, target).map(PortableDeltaGenManifestCommand(_))
    case ShallowClone(dst, srcT, kind, value) =>
      resolveTarget(spark, srcT).map { src =>
        // the clone destination is a PATH literal; a backquoted
        // destination is delta-spark's catalog-identifier syntax, and
        // silently treating `t2` as a relative directory named t2 is the
        // wrong-shape hazard — refuse by name until catalog-managed
        // clone targets exist
        if (dst.startsWith("`")) throw new UnsupportedOperationException(
          s"CREATE TABLE $dst SHALLOW CLONE: catalog-identifier " +
            "destinations are not supported — pass a single-quoted " +
            "destination path ('/path/to/table')")
        val (v, ts) = Option(kind) match {
          case None => (None, None)
          case Some(k) if k.equalsIgnoreCase("VERSION") =>
            (Some(value.trim.toLong), None)
          case Some(_) =>
            // parseTsMillis owns the all-digit grammar on EVERY surface:
            // 11-17 digits = epoch millis, compact dates like 20240102
            // refuse by name (never silently ~1970)
            (None, Some(PortableDeltaRelation.parseTsMillis(
              stripQuotes(value.trim), "SHALLOW CLONE ... TIMESTAMP AS OF")))
        }
        PortableDeltaCloneCommand(src, stripQuotes(dst), v, ts)
      }
    case Restore(target, kind, value) =>
      resolveTarget(spark, target).map { path =>
        if (kind.equalsIgnoreCase("VERSION"))
          PortableDeltaRestoreCommand(path,
            version = Some(value.trim.toLong), tsMillis = None)
        else {
          // parseTsMillis owns the all-digit grammar on EVERY surface
          // (quoted or not): 11-17 digits = epoch millis, compact dates
          // like 20240102 refuse by name — never silently ~1970
          val ms = PortableDeltaRelation.parseTsMillis(
            stripQuotes(value.trim), "RESTORE ... TO TIMESTAMP AS OF")
          PortableDeltaRestoreCommand(path, version = None,
            tsMillis = Some(ms))
        }
      }
    case _ => None
  }

  private def stripQuotes(s: String): String =
    if ((s.startsWith("'") && s.endsWith("'")) ||
        (s.startsWith("\"") && s.endsWith("\"")) ||
        (s.startsWith("`") && s.endsWith("`"))) s.substring(1, s.length - 1)
    else s

  /** Build an ALTER command over a portable-delta target, or None (fall
    * through to the stock parser) when the target is not ours. The
    * catalog identifier (when the target was a table name) rides along
    * so the command can sync the catalog's stored schema after a
    * schema-changing verb — V1 table resolution validates the relation
    * schema against the catalog's copy. */
  private def alterCmd(spark: SparkSession, target: String, desc: String)(
      exec: (SparkSession, String) => Long): Option[LogicalPlan] =
    resolveTargetIdent(spark, target).map { case (path, ident) =>
      PortableDeltaAlterCommand(path, ident, desc, exec)
    }

  /** ADD COLUMN(S): the column list parses through the DELEGATE's
    * colTypeList grammar (nested STRUCT<...> commas, COMMENT clauses) —
    * but only AFTER the target resolves to a portable-delta table, so a
    * malformed list on a foreign table keeps the stock parse error.
    * ONE [[PortableDelta.addColumns]] commit for the whole list
    * (delta-spark parity). */
  private def alterAddColumns(spark: SparkSession, delegate: ParserInterface,
                              target: String, colDefs: String): Option[LogicalPlan] =
    resolveTargetIdent(spark, target).map { case (path, ident) =>
      PortableDeltaAlterCommand(path, ident, "ADD COLUMNS",
        (s: SparkSession, p: String) => {
          val cols = delegate.parseTableSchema(colDefs)
          PortableDelta.addColumns(s, p, cols.fields.toSeq.map(f =>
            (f.name, f.dataType, f.getComment())))
        })
    }

  /** The statement's target as a portable-delta table path: a quoted
    * path directly; an identifier through the catalog when it names a
    * portable-delta table. None = not ours, fall through to the
    * delegate parser (Spark's stock error). */
  private def resolveTarget(spark: SparkSession, raw: String): Option[String] =
    resolveTargetIdent(spark, raw).map(_._1)

  /** [[resolveTarget]] keeping the catalog identifier when the target
    * was a table NAME (None for direct-path targets) — ALTER commands
    * need it to sync the catalog's stored schema. */
  private def resolveTargetIdent(spark: SparkSession,
      raw: String): Option[(String, Option[TableIdentifier])] = {
    if (raw.startsWith("'") || raw.startsWith("`"))
      Some((stripQuotes(raw), None))
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
              .map(p => (p, Some(i)))
          else None
        }
    }
  }
}

/** Planned `ALTER TABLE` over a portable-delta target — one statement
  * form per [[GraftSqlParser]] grammar case, each routing to its
  * existing [[DeltaAlter]]/[[DeltaMaintenance]] verb (every verb
  * refusal — guarded properties, non-widening types, constraint
  * violations, feature obligations — surfaces unchanged). After the
  * commit, catalog-NAMED targets sync the catalog's stored schema to
  * the relation's (V1 resolution validates the relation against the
  * catalog copy — a stale copy would fail every later SELECT) and
  * cached plans drop. Result row: (path, version). */
private[stac] final case class PortableDeltaAlterCommand(
    tablePath: String, catalogIdent: Option[TableIdentifier],
    verb: String, exec: (SparkSession, String) => Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val version = exec(spark, tablePath)
    DmlCacheDrop(spark, tablePath)
    catalogIdent.foreach { ident =>
      val rel = PortableDeltaRelation(spark, tablePath,
        Map("path" -> tablePath))
      // replace the WHOLE CatalogTable schema: alterTableDataSchema
      // throws dropNonExistentColumnsNotSupportedError whenever an old
      // column is absent from the new schema — exactly what RENAME and
      // DROP COLUMN produce — and a silently-stale catalog schema fails
      // every later name-based SELECT (V1 resolution hands it to the
      // relation as userSpecifiedSchema). Partition columns keep their
      // catalog position (data columns first).
      try {
        val catalog = spark.sessionState.catalog
        val meta = catalog.getTableMetadata(ident)
        // partition columns come from the LOG's post-commit metaData, not
        // the old CatalogTable: RENAME COLUMN on a partition column maps
        // the log's partitionColumns through the rename, and the stale
        // catalog names would class the renamed column as data and leave
        // partitionColumnNames pointing at the dead name (r18 ADVICE)
        val pcolSeq =
          PortableDelta.smallSnapshot(spark, tablePath).partitionColumns
        val pcols = pcolSeq.toSet
        val (parts, data) = rel.schema.fields.partition(f => pcols(f.name))
        catalog.alterTable(meta.copy(
          schema = org.apache.spark.sql.types.StructType(data ++ parts),
          partitionColumnNames = pcolSeq))
      } catch { case scala.util.control.NonFatal(e) =>
        // the LOG commit already succeeded; a failed catalog sync must
        // be visible, not swallowed — the stale-schema hazard is real
        System.err.println(
          s"[portable-delta] WARNING: catalog schema sync failed for " +
            s"$ident after $verb: ${e.getMessage}")
      }
    }
    Seq(Row(tablePath, version))
  }

  override def toString: String =
    s"PortableDeltaAlterCommand[$tablePath, $verb]"
}

/** Planned `SHOW TBLPROPERTIES` over a portable-delta target — answers
  * from the LOG's configuration (the delta-spark semantics; the
  * catalog copy only ever carries creation-time options). A named key
  * returns its row alone; a missing named key errors by name (the
  * stock SHOW behavior). */
private[stac] final case class PortableDeltaShowPropsCommand(
    tablePath: String, key: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cfg = PortableDelta.smallSnapshot(spark, tablePath).configuration
    key match {
      case Some(k) =>
        val v = cfg.getOrElse(k, throw new IllegalArgumentException(
          s"table property $k is not set on $tablePath"))
        Seq(Row(k, v))
      case None => cfg.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

/** Planned `FSCK REPAIR TABLE … [DRY RUN]` — drop log references to
  * vanished data files ([[PortableDelta.fsckRepair]]); DRY RUN lists
  * without committing. One row per broken file (delta-spark's shape). */
private[stac] final case class PortableDeltaFsckCommand(
    tablePath: String, dryRun: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("removed", org.apache.spark.sql.types.BooleanType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = PortableDelta.fsckRepair(spark, tablePath, dryRun = dryRun)
    if (!dryRun) DmlCacheDrop(spark, tablePath)
    dropped.sorted.map(Row(_, !dryRun))
  }
}

/** Planned `GENERATE symlink_format_manifest FOR TABLE …` — one row per
  * manifest directory written ([[PortableDelta.generateSymlinkManifest]]). */
private[stac] final case class PortableDeltaGenManifestCommand(
    tablePath: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifest_dir", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    PortableDelta.generateSymlinkManifest(spark, tablePath)
      .sorted.map(Row(_))
}

/** Planned `CREATE TABLE '<dst>' SHALLOW CLONE <src> [VERSION|
  * TIMESTAMP AS OF …]` — zero-copy snapshot via absolute-path adds
  * ([[PortableDelta.cloneShallow]]; the stac35 contract: no data bytes
  * move, the clone is independently writable, the source is never
  * touched). Result row: (source, target, version). */
private[stac] final case class PortableDeltaCloneCommand(
    sourcePath: String, targetPath: String,
    versionAsOf: Option[Long], tsMillis: Option[Long])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("target", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = tsMillis match {
      case Some(ms) =>
        PortableDelta.cloneShallowAtTimestamp(spark, sourcePath, targetPath, ms)
      case None =>
        PortableDelta.cloneShallow(spark, sourcePath, targetPath, versionAsOf)
    }
    Seq(Row(sourcePath, targetPath, v))
  }
}

/** Planned `CONVERT TO DELTA [parquet.]'<path>' [PARTITIONED BY …]` —
  * adopt an existing parquet directory into the portable Delta log in
  * place ([[PortableDelta.convertToDelta]]: one v0 commit referencing
  * the files, footer-collected stats, zero data movement). Result row:
  * (path, version, num_converted_files). */
private[stac] final case class PortableDeltaConvertCommand(
    tablePath: String, partitionSchema: Option[StructType])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_converted_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = PortableDelta.convertToDelta(spark, tablePath, partitionSchema)
    val n = PortableDelta.snapshot(spark, tablePath).files.size.toLong
    Seq(Row(tablePath, v, n))
  }
}

/** Planned `DESCRIBE HISTORY` — the commit record (ICT-aware,
  * truncation-surviving), the statement form of the
  * `portable_delta_history` TVF. */
private[stac] final case class PortableDeltaHistoryCommand(tablePath: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("timestamp",
      org.apache.spark.sql.types.TimestampType)())

  override def run(spark: SparkSession): Seq[Row] =
    PortableDelta.history(spark.sessionState.newHadoopConf(), tablePath)
      .sortBy(-_._1)
      .map { case (v, op, tsMs) =>
        Row(v, op, new java.sql.Timestamp(tsMs))
      }
}

/** Planned `DESCRIBE DETAIL` — delta-spark's column set
  * ([[PortableDelta.describeDetail]]; numFiles/sizeInBytes O(1) from
  * the version checksum when present), the statement form of the
  * `portable_delta_detail` TVF. */
private[stac] final case class PortableDeltaDetailCommand(tablePath: String)
    extends LeafRunnableCommand {

  import org.apache.spark.sql.types.{ArrayType, IntegerType => IntT, MapType, TimestampType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType)(),
    AttributeReference("id", StringType)(),
    AttributeReference("location", StringType)(),
    AttributeReference("createdAt", TimestampType)(),
    AttributeReference("lastModified", TimestampType)(),
    AttributeReference("partitionColumns",
      ArrayType(StringType, containsNull = false))(),
    AttributeReference("clusteringColumns",
      ArrayType(StringType, containsNull = false))(),
    AttributeReference("numFiles", LongType, nullable = false)(),
    AttributeReference("sizeInBytes", LongType, nullable = false)(),
    AttributeReference("properties",
      MapType(StringType, StringType, valueContainsNull = false))(),
    AttributeReference("minReaderVersion", IntT, nullable = false)(),
    AttributeReference("minWriterVersion", IntT, nullable = false)(),
    AttributeReference("tableFeatures",
      ArrayType(StringType, containsNull = false))())

  override def run(spark: SparkSession): Seq[Row] = {
    val d = PortableDelta.describeDetail(spark, tablePath)
    Seq(Row(d.format, d.id, d.location,
      d.createdAt.map(ms => new java.sql.Timestamp(ms)).orNull,
      d.lastModified.map(ms => new java.sql.Timestamp(ms)).orNull,
      d.partitionColumns, d.clusteringColumns, d.numFiles, d.sizeInBytes,
      d.properties, d.minReaderVersion, d.minWriterVersion, d.tableFeatures))
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
  * window, default the verb's retention floor. A RETAIN below the
  * table's `delta.deletedFileRetentionDuration` (7-day default)
  * REFUSES by name (delta-spark's retentionDurationCheck: `RETAIN 0
  * HOURS` would reclaim every unreferenced file, breaking time travel,
  * RESTORE, and in-flight CDF/streaming readers of older versions)
  * unless [[PortableDeltaVacuumCommand.RetentionCheckKey]] is
  * explicitly set false for the session. */
private[stac] final case class PortableDeltaVacuumCommand(
    tablePath: String, retainHours: Option[Long], lite: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("num_files_deleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val grace = retainHours.map(_ * 3600L * 1000L).getOrElse(-1L)
    if (grace >= 0 && spark.conf.getOption(
        PortableDeltaVacuumCommand.RetentionCheckKey).forall(_.toBoolean)) {
      val floor = PortableDelta.smallSnapshot(spark, tablePath)
        .configuration.get("delta.deletedFileRetentionDuration")
        .flatMap(PortableDelta.parseInterval)
        .getOrElse(7L * 24 * 3600 * 1000)
      require(grace >= floor,
        s"VACUUM $tablePath RETAIN ${retainHours.get} HOURS is below the " +
          s"table's deleted-file retention floor (${floor / 3600000L} " +
          "hours from delta.deletedFileRetentionDuration, default 7 days)" +
          " — reclaiming that early breaks time travel, RESTORE, and " +
          "in-flight CDF/streaming readers of older versions. Raise " +
          "RETAIN, lower the table property, or explicitly set " +
          s"${PortableDeltaVacuumCommand.RetentionCheckKey}=false")
    }
    val n =
      if (lite) PortableDelta.vacuumLite(spark, tablePath, graceMillis = grace)
      else PortableDelta.vacuum(spark, tablePath, graceMillis = grace)
    Seq(Row(tablePath, n.toLong))
  }
}

private[stac] object PortableDeltaVacuumCommand {
  /** Session dial disabling the SQL RETAIN floor (delta-spark's
    * retentionDurationCheck analog). Default ON. */
  val RetentionCheckKey = "spark.graft.delta.retentionDurationCheck.enabled"
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
