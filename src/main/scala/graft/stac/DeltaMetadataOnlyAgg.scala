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
  *   - the child is the BARE relation (alias / attribute-only
  *     projections stripped; any Filter, join, or computed projection
  *     disables the rewrite);
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

  /** Peel aliases and COLUMN-ONLY projections (attributes and
    * struct-path aliases — what pruning/extraction inserts), collecting
    * the alias substitutions; anything else (Filter above all) keeps
    * the scan. */
  @scala.annotation.tailrec
  private def strip(p: LogicalPlan,
      subst: Map[ExprId, Expression]): (LogicalPlan, Map[ExprId, Expression]) =
    p match {
      case s: SubqueryAlias => strip(s.child, subst)
      case Project(list, child) if list.forall {
          case _: AttributeReference => true
          case a: Alias => isColumnPath(a.child)
          case _ => false } =>
        strip(child, subst ++ list.collect {
          case a: Alias => a.exprId -> a.child })
      case other => (other, subst)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transform {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        strip(child, Map.empty) match {
          case (LogicalRelation(fs: HadoopFsRelation, _, _, _, _), subst)
              if fs.location.isInstanceOf[PortableDeltaFileIndex] =>
            rewrite(agg, subst,
              fs.location.asInstanceOf[PortableDeltaFileIndex]).getOrElse(agg)
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
                      index: PortableDeltaFileIndex): Option[LogicalPlan] = {
    val needs = agg.aggregateExpressions.map(parse(_, subst))
    if (needs.exists(_.isEmpty)) return None
    val flat = needs.flatten
    val cols = flat.collect {
      case NeedMin(c) => c
      case NeedMax(c) => c
    }.distinct
    val row = try PortableDelta.aggregateFromState(index.session, index.path,
        index.snapBase, index.adds, cols).head()
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
