package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Whole-vector product quantization in ONE call:
  * `pq_quantize(vec, codebook, norms, sub)` returns the packed code word
  * (4 bits per subspace, little-endian — subspace s in bits [4s, 4s+4)).
  *
  * Per subspace s the code is the index of the L2-nearest codebook entry
  * via the `‖cb‖² − 2⟨x_s, cb⟩` reduction (‖x_s‖² is constant within a
  * subspace so the argmin drops it); ties take the LOWEST code id — the
  * same first-minimum rule as the SQL twin's `row_number() ORDER BY
  * dist, c`. Arithmetic contract (oracle-compatibility): the dot is an
  * ascending-index fold of `cb[i] · (double)x[i]` and the distance is
  * `norm − 2.0·dot` — bit-identical to composing [[VecDot]] with the
  * printed constants.
  *
  * Why one expression and not 4×16 `vec_dot` columns + `array_min` /
  * `array_position`: that form generated ~10 KB of fused whole-stage code
  * for the encode projection alone, past HotSpot's 8000-byte
  * `DontCompileHugeMethods` limit — the stage ran in the bytecode
  * interpreter and the q80 ADC scan spent ~7 of its 9 seconds there. This
  * expression compiles to one static call; the kernel itself is small,
  * hot, and JITs.
  *
  * Children: (vec `array<float|double>`, codebook `array<array<double>>`
  * flattened to sub·k entries of subDim each, norms `array<double>` of
  * sub·k, sub `int`). Codebook/norms/sub are foldable constants in every
  * caller ([[graft.operators.Similarity.pqEncode]]). Null vec → null.
  */
case class PqQuantize(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  private def vecFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk && cbOk && third.dataType == ArrayType(DoubleType, false) &&
        fourth.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_quantize requires (array<float|double>, array<array<double>>, " +
        s"array<double>, int), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}, " +
        s"${fourth.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_quantize"

  override protected def nullSafeEval(vec: Any, cb: Any, norms: Any,
                                      sub: Any): Any =
    PqQuantize.quantize(vec.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      norms.asInstanceOf[ArrayData], sub.asInstanceOf[Int], vecFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (vec, cb, norms, sub) =>
      s"graft.expressions.PqQuantize.quantize($vec, $cb, $norms, $sub, $vecFloat)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PqQuantize =
    copy(newFirst, newSecond, newThird, newFourth)
}

object PqQuantize {
  /** Static kernel invoked from generated code AND the interpreted path —
    * one definition, one arithmetic. k is derived (`norms.length / sub`),
    * subDim from the first codebook entry.
    */
  def quantize(vec: ArrayData, cb: ArrayData, norms: ArrayData,
               sub: Int, vecF: Boolean): Long = {
    val k = norms.numElements() / sub
    // nibble-packing contract: 4 bits per code, 16 subspaces per long —
    // a larger codebook would silently bleed bits into the neighbor's
    // nibble (and 4·s ≥ 64 would wrap the shift). Fail loudly; the JIT
    // hoists the constant check out of the row loop.
    if (k < 1 || k > 16 || sub < 1 || sub > 16)
      throw new IllegalArgumentException(
        s"pq_quantize packs 4-bit codes: need 1 <= k <= 16 (got $k) and " +
          s"1 <= sub <= 16 (got $sub)")
    // The subspace layout reads vec[s·subDim + i] with subDim taken from
    // the codebook — an undersized vector would otherwise read past its
    // UnsafeArrayData bounds SILENTLY (Platform.getDouble has no bounds
    // check) and emit garbage codes. Fail loudly like the k/sub guard;
    // all entries share one subDim by construction (pqCodebook), so the
    // first entry's length bounds every access.
    val subDim0 = cb.getArray(0).numElements()
    if (vec.numElements() < sub * subDim0)
      throw new IllegalArgumentException(
        s"pq_quantize: vector has ${vec.numElements()} elements but the " +
          s"codebook expects at least ${sub * subDim0} ($sub subspaces x " +
          s"$subDim0 dims)")
    var packed = 0L
    var s = 0
    while (s < sub) {
      var best = Double.PositiveInfinity
      var idx = 0
      var c = 0
      while (c < k) {
        val entry = cb.getArray(s * k + c)
        val subDim = entry.numElements()
        val base = s * subDim
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val v = if (vecF) vec.getFloat(base + i).toDouble
                  else vec.getDouble(base + i)
          acc += entry.getDouble(i) * v
          i += 1
        }
        val d = norms.getDouble(s * k + c) - 2.0 * acc
        // strict < keeps the FIRST index among equal minima — the tie rule.
        if (d < best) { best = d; idx = c }
        c += 1
      }
      packed |= idx.toLong << (4 * s)
      s += 1
    }
    packed
  }
}
