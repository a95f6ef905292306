package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, Expression, GetStructField, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StructType}

/** `bbox_intersects(bbox, qxmin, qymin, qxmax, qymax)` — 2-D intersection
  * test between a STAC-GeoParquet bbox struct and a query rectangle.
  *
  * The expression is fully evaluable on its own (interpreted, row-at-a-
  * time), but its real purpose is to be REWRITTEN by
  * [[RewriteBboxIntersects]] into the four-conjunct form
  * `bbox.xmin <= qxmax AND bbox.xmax >= qxmin AND bbox.ymin <= qymax AND
  * bbox.ymax >= qymin`, which Catalyst pushes into the parquet scan as
  * nested-column predicates — exactly the row-group min/max pruning the
  * STAC-GeoParquet spec's struct bbox + `covering` metadata exist to
  * enable (`_to_arrow.py:124-130`: "the motivation for the struct bbox").
  * Opaque UDF-style predicates never reach `PushedFilters`; the rewrite is
  * what turns an ergonomic spatial filter into an I/O-pruning one at
  * 100 TB.
  *
  * Works for 2-D and 3-D bboxes (only the x/y bounds participate, like a
  * planar intersects).
  */
case class BboxIntersects(bbox: Expression, qxmin: Expression, qymin: Expression,
                          qxmax: Expression, qymax: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(bbox, qxmin, qymin, qxmax, qymax)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bbox_intersects"

  override def checkInputDataTypes(): TypeCheckResult = bbox.dataType match {
    case st: StructType
        if Seq("xmin", "ymin", "xmax", "ymax").forall(f =>
          st.fieldNames.contains(f) && st(f).dataType == DoubleType) =>
      if (children.tail.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("query bounds must be doubles")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bbox_intersects requires a bbox struct with double xmin/ymin/xmax/ymax, got ${other.sql}")
  }

  private lazy val st = bbox.dataType.asInstanceOf[StructType]
  private lazy val ix = Seq("xmin", "ymin", "xmax", "ymax").map(st.fieldIndex)

  override def eval(input: InternalRow): Any = {
    val row = bbox.eval(input)
    if (row == null) return null
    val r = row.asInstanceOf[InternalRow]
    if (ix.exists(r.isNullAt)) return null
    val Seq(bxmin, bymin, bxmax, bymax) = ix.map(r.getDouble)
    val (x0, y0, x1, y1) = (qxmin.eval(input), qymin.eval(input),
      qxmax.eval(input), qymax.eval(input))
    if (x0 == null || y0 == null || x1 == null || y1 == null) return null
    bxmin <= x1.asInstanceOf[Double] && bxmax >= x0.asInstanceOf[Double] &&
      bymin <= y1.asInstanceOf[Double] && bymax >= y0.asInstanceOf[Double]
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BboxIntersects =
    copy(bbox = c(0), qxmin = c(1), qymin = c(2), qxmax = c(3), qymax = c(4))
}

/** Optimizer rule: open [[BboxIntersects]] into its four pushable
  * conjuncts — ONLY inside Filter conditions, where null and false
  * coincide (a row is dropped either way). In a projection context the
  * conjunction could differ from the expression's eval when individual
  * bbox FIELDS are null (false AND null = false, while eval nulls out on
  * any null field), so SELECTed occurrences are left for the expression
  * itself to evaluate. Runs anywhere in optimization: physical planning
  * extracts data-source filters from the optimized Filter condition, so
  * the conjuncts land in `PushedFilters` whether the rule ran in an
  * injected batch or in `experimental.extraOptimizations`. */
object RewriteBboxIntersects extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      f.copy(condition = f.condition.transform {
        case BboxIntersects(bbox, x0, y0, x1, y1) if bbox.resolved =>
          val st = bbox.dataType.asInstanceOf[StructType]
          def fld(name: String) = GetStructField(bbox, st.fieldIndex(name), Some(name))
          And(
            And(LessThanOrEqual(fld("xmin"), x1), GreaterThanOrEqual(fld("xmax"), x0)),
            And(LessThanOrEqual(fld("ymin"), y1), GreaterThanOrEqual(fld("ymax"), y0)))
      })
  }
}

object BboxFunctions {
  import org.apache.spark.sql.{Column, GraftSqlShim}

  /** Column builder; bounds as literal doubles. */
  def bboxIntersects(bbox: Column, xmin: Double, ymin: Double,
                     xmax: Double, ymax: Double): Column =
    GraftSqlShim.column(BboxIntersects(GraftSqlShim.expression(bbox),
      Literal(xmin), Literal(ymin), Literal(xmax), Literal(ymax)))

  /** Arm an existing session with the rewrite (idempotent). The
    * extensions path (`GraftExtensions`) injects it at session build. */
  def armRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RewriteBboxIntersects))
      spark.experimental.extraOptimizations = cur :+ RewriteBboxIntersects
  }
}
