package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two vector columns (`array<float>` or
  * `array<double>` on either side, widened to double).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: higher-order
  * functions do not participate in whole-stage codegen — every element
  * goes through interpreted lambda dispatch with boxing. This kernel is
  * the innermost loop of every similarity query (3 evaluations per
  * candidate pair: dot + two norms; plus one per LSH plane during
  * bucketing), so it earns the one custom `doGenCode` in the engine: a
  * tight primitive loop, no allocation.
  *
  * Arithmetic contract (oracle-compatibility): ascending-index left fold
  * of `(double)a[i] * (double)b[i]` — bit-identical to the previous HOF
  * form and to the DuckDB oracle's `list_reduce` twin. Widen-then-multiply
  * order matters; do not "optimize" to float accumulation.
  *
  * Null contract: null array → null result; elements are assumed
  * non-null (embedding vectors), matching the HOF form which would
  * null-poison the whole fold anyway.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = elem(left.dataType).contains(FloatType)
    val yf = elem(right.dataType).contains(FloatType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      def get(v: String, dt: DataType, i: String) =
        if (elem(dt).contains(FloatType)) s"(double)$v.getFloat($i)"
        else s"$v.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(x, left.dataType, i)} * ${get(y, right.dataType, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
