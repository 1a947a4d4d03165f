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

  /** ONE static call per dot, not an inlined loop. PQ encode evaluates 64
    * dots in a single projection; inlining a ~140-bytecode loop per dot
    * pushed the fused whole-stage method past HotSpot's 8000-byte
    * `DontCompileHugeMethods` limit, so the entire stage ran in the
    * BYTECODE INTERPRETER (measured: the q80 ADC scan spent ~7 s of its
    * 9 s there). A static helper keeps the call site ~10 bytes; the helper
    * itself is small, hot, and JITs.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val lf = elem(left.dataType).contains(FloatType)
      val rf = elem(right.dataType).contains(FloatType)
      val m = (if (lf) "F" else "D") + (if (rf) "F" else "D")
      s"${ev.value} = graft.expressions.VecDot.dot$m($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Static kernels invoked from generated code (see [[VecDot.doGenCode]]).
  * Same arithmetic contract as [[VecDot.nullSafeEval]]: ascending-index
  * fold of widened products. Four monomorphic variants instead of one
  * branching loop so the JIT sees branch-free element loads.
  */
object VecDot {
  def dotDD(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }
  def dotDF(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
    acc
  }
  def dotFD(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
    acc
  }
  def dotFF(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }
}
