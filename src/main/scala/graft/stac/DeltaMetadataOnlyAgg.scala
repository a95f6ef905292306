package graft.stac

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The IMPLICIT metadata-only aggregate: `SELECT count(*), min(x),
  * max(x) FROM portable_delta_table` answered from the log's per-file
  * stats with NO data-file scan — delta-spark's
  * OptimizeMetadataOnlyQuery analog, and at 100 TB the difference
  * between O(log) and a full pass for the most common dashboard query.
  * [[PortableDelta.aggregateFromStats]] is the explicit form (stac50);
  * this rule gives the same answer to users who just write SQL against
  * a [[PortableDeltaDataSource]] relation.
  *
  * Fires ONLY when provably sound, and FALLS BACK to the scan (never
  * errors) otherwise:
  *   - global aggregate (no GROUP BY), no FILTER clause, no DISTINCT;
  *   - every aggregate is COUNT(literal) (= COUNT(*)), MIN(col) or
  *     MAX(col) over a relation column (nested struct leaves included);
  *   - the child is the relation under alias / attribute-only
  *     projections and (since round 15) FILTERS whose references are
  *     all non-timestamp PARTITION columns — evaluated exactly per
  *     file against the log's partitionValues, delta-spark's
  *     OptimizeMetadataOnlyQuery shape; a data-column filter, join, or
  *     computed projection disables the rewrite;
  *   - the stats fold itself refuses — missing numRecords, a DV of
  *     unknown cardinality, a DV under MIN/MAX, missing min/max on a
  *     non-all-null file, timestamp-typed partition values — and the
  *     refusal is caught here as "keep the scan".
  *
  * The answer computes from the relation's PINNED snapshot state
  * ([[PortableDeltaFileIndex]]), executor-side over the add frame
  * ([[PortableDelta.aggregateFromState]]) — one aggregated row reaches
  * the driver, the readTableWhere discipline.
  *
  * Injected as a plain optimizer rule (extensions path in
  * [[graft.GraftExtensions]]; runtime arming via [[arm]]): unlike the
  * covering rewrite, nothing this rule matches on is erased by
  * pushdown or pruning — the Aggregate node itself is the match. The
  * rewrite replaces the whole Aggregate with a one-row LocalRelation
  * carrying the ORIGINAL output attribute ids, so nothing upstream
  * re-resolves. */
object OptimizeDeltaMetadataOnlyAgg extends Rule[LogicalPlan] {

  /** Session dial (default on) — the delta-spark
    * `optimizeMetadataQuery.enabled` analog. */
  val ConfKey = "spark.graft.delta.optimizeMetadataQuery.enabled"

  /** Arm an existing session with the rewrite (idempotent). The
    * extensions path (`GraftExtensions`) injects it at session build. */
  def arm(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(OptimizeDeltaMetadataOnlyAgg))
      spark.experimental.extraOptimizations = cur :+ OptimizeDeltaMetadataOnlyAgg
  }

  private sealed trait Need
  private case object NeedCount extends Need
  private final case class NeedMin(col: String) extends Need
  private final case class NeedMax(col: String) extends Need

  /** Backquote-quoted dotted path of a column reference —
    * [[DeltaStats.nameParts]]' exact inverse, so a field name that
    * literally contains a dot or backquote round-trips. */
  private def quotePart(p: String): String = "`" + p.replace("`", "``") + "`"

  /** Name a column reference, resolving THROUGH projection aliases
    * (`subst`): nested-column extraction rewrites `min(bbox.xmin)` into
    * `min(_extract_xmin)` over `Project [bbox.xmin AS _extract_xmin]` —
    * the alias map leads back to the relation's struct path. */
  private def dottedName(e: Expression,
                         subst: Map[ExprId, Expression]): Option[String] = e match {
    case a: AttributeReference => subst.get(a.exprId) match {
      case Some(inner) => dottedName(inner, subst)
      case None => Some(quotePart(a.name))
    }
    case g: GetStructField =>
      dottedName(g.child, subst).map(_ + "." + quotePart(g.extractFieldName))
    case _ => None
  }

  private def isColumnPath(e: Expression): Boolean = e match {
    case _: AttributeReference => true
    case g: GetStructField => isColumnPath(g.child)
    case _ => false
  }

  /** Peel aliases, COLUMN-ONLY projections (attributes and struct-path
    * aliases — what pruning/extraction inserts) and FILTERS, collecting
    * the alias substitutions and the filter conditions; anything else
    * keeps the scan. Whether the collected conditions are usable
    * (partition-only) is decided by [[partitionOnlyPred]]. */
  @scala.annotation.tailrec
  private def strip(p: LogicalPlan, subst: Map[ExprId, Expression],
      conds: Seq[Expression])
      : (LogicalPlan, Map[ExprId, Expression], Seq[Expression]) =
    p match {
      case s: SubqueryAlias => strip(s.child, subst, conds)
      case Project(list, child) if list.forall {
          case _: AttributeReference => true
          case a: Alias => isColumnPath(a.child)
          case _ => false } =>
        strip(child, subst ++ list.collect {
          case a: Alias => a.exprId -> a.child }, conds)
      case Filter(cond, child) => strip(child, subst, conds :+ cond)
      case other => (other, subst, conds)
    }

  /** The delta-spark OptimizeMetadataOnlyQuery extension: a filter
    * whose every reference is a PARTITION column evaluates EXACTLY per
    * file (all rows of a file share its partitionValues), so the stats
    * fold may simply restrict to the matching files. Returns the
    * combined predicate when sound: deterministic, subquery-free,
    * references only non-timestamp partition columns (the hive string
    * encoding of timestamps is timezone-ambiguous). None keeps the
    * scan. */
  private def partitionOnlyPred(conds: Seq[Expression],
      subst: Map[ExprId, Expression],
      index: PortableDeltaFileIndex): Option[Expression] = {
    if (conds.isEmpty) return Some(Literal.TrueLiteral)
    val pred = conds.reduce(And).transformUp {
      case a: AttributeReference => subst.getOrElse(a.exprId, a)
    }
    val pFields = index.partitionSchema.fields
    def isPartitionAttr(a: Attribute): Boolean =
      pFields.exists(f => f.name.equalsIgnoreCase(a.name) &&
        f.dataType != org.apache.spark.sql.types.TimestampType &&
        f.dataType != org.apache.spark.sql.types.TimestampNTZType)
    val sound = pred.deterministic &&
      pred.references.forall(isPartitionAttr) &&
      !pred.exists(_.isInstanceOf[PlanExpression[_]])
    if (sound) Some(pred) else None
  }

  /** Evaluate the partition predicate against one file's
    * partitionValues: hive strings decode through the SAME UTC cast the
    * FileIndex uses, substitute as literals, fold the predicate. A null
    * / undecodable / missing value follows SQL filter semantics (null
    * ⇒ the file is excluded — its rows would not pass the row filter
    * either). Runs on EXECUTORS over the add frame. */
  private def evalOnFile(pred: Expression,
      pFields: Array[org.apache.spark.sql.types.StructField],
      pv: Map[String, String]): Boolean = {
    val bound = pred.transform {
      case a: AttributeReference =>
        val f = pFields.find(_.name.equalsIgnoreCase(a.name)).getOrElse(
          throw new IllegalStateException(s"unreachable: ${a.name}"))
        val raw = pv.get(f.name).orElse(
          pv.collectFirst { case (k, v) if k.equalsIgnoreCase(f.name) => v })
        raw match {
          case None | Some(null) | Some("__HIVE_DEFAULT_PARTITION__") =>
            Literal(null, a.dataType)
          case Some(v) =>
            val decoded = try org.apache.spark.sql.catalyst.expressions.Cast(
              Literal(org.apache.spark.unsafe.types.UTF8String.fromString(v),
                org.apache.spark.sql.types.StringType),
              a.dataType, Option("UTC")).eval(null)
            catch { case scala.util.control.NonFatal(_) => null }
            Literal(decoded, a.dataType)
        }
    }
    bound.eval(InternalRow.empty) == true
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transform {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        strip(child, Map.empty, Nil) match {
          case (LogicalRelation(fs: HadoopFsRelation, _, _, _, _), subst, conds)
              if fs.location.isInstanceOf[PortableDeltaFileIndex] =>
            val index = fs.location.asInstanceOf[PortableDeltaFileIndex]
            partitionOnlyPred(conds, subst, index)
              .flatMap(rewrite(agg, subst, index, _)).getOrElse(agg)
          case _ => agg
        }
    }
  }

  private def parse(ne: NamedExpression,
                    subst: Map[ExprId, Expression]): Option[Need] = ne match {
    case Alias(AggregateExpression(fn, Complete, false, None, _), _) => fn match {
      case Count(Seq(Literal(v, _))) if v != null => Some(NeedCount)
      case Min(e) => dottedName(e, subst).map(NeedMin)
      case Max(e) => dottedName(e, subst).map(NeedMax)
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, subst: Map[ExprId, Expression],
                      index: PortableDeltaFileIndex,
                      filePred: Expression): Option[LogicalPlan] = {
    val needs = agg.aggregateExpressions.map(parse(_, subst))
    if (needs.exists(_.isEmpty)) return None
    val flat = needs.flatten
    val cols = flat.collect {
      case NeedMin(c) => c
      case NeedMax(c) => c
    }.distinct
    // restrict the fold to the files the partition predicate admits —
    // exact, not conservative: every row of a file shares its
    // partitionValues, and evalOnFile nulls follow SQL filter semantics
    val pFields = index.partitionSchema.fields
    val adds = filePred match {
      case Literal.TrueLiteral => index.adds
      case p => index.adds.filter { (r: org.apache.spark.sql.Row) =>
        val pv = if (r.isNullAt(9)) Map.empty[String, String]
                 else r.getMap[String, String](9).toMap
        evalOnFile(p, pFields, pv)
      }
    }
    val row = try PortableDelta.aggregateFromState(index.session, index.path,
        index.snapBase, adds, cols).head()
      catch { case scala.util.control.NonFatal(_) => return None }
    val values = flat.zip(agg.aggregateExpressions).map { case (need, ne) =>
      val v = need match {
        case NeedCount => row.getLong(0)
        case NeedMin(c) => row.get(row.fieldIndex(s"min_$c"))
        case NeedMax(c) => row.get(row.fieldIndex(s"max_$c"))
      }
      CatalystTypeConverters.createToCatalystConverter(ne.dataType)(v)
    }
    logInfo(s"answering aggregate over ${index.path} from log stats " +
      s"(no data-file scan): ${agg.aggregateExpressions.map(_.name).mkString(", ")}")
    Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
  }
}
