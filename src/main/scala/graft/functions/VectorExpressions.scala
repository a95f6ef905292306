package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Double-precision dot product of two float32 vectors as a native Catalyst
  * expression with whole-stage codegen.
  *
  * This is the hot inner loop of every similarity operator (SURVEY §7's
  * north-star extensions): on an all-pairs or per-bucket join the dot runs
  * O(pairs · dim) times, and a Scala UDF pays per-element boxing plus a
  * codegen barrier on every call. This expression reads the unboxed
  * `ArrayData` float slots directly inside the generated Java loop, keeping
  * the join + score + top-k pipeline in a single WholeStageCodegen stage.
  *
  * Accumulation is a strict left-to-right double fold — bit-identical to
  * DuckDB's `list_sum` over the same float32 inputs (the oracle relies on
  * this).
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot requires array<float> inputs, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  // a null ELEMENT poisons the product: the result is null, never a
  // silent 0.0 contribution (ArrayData.getFloat on a null slot returns 0)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** `float_dot(a, b)` as a Column — stays inside whole-stage codegen. */
  def floatDot(a: Column, b: Column): Column =
    GraftSqlShim.column(FloatDot(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
