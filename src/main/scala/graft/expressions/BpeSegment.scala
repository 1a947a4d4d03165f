package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-word BPE segmentation in ONE call:
  * `bpe_segment(w, ls, rs)` returns `struct(pieces string, n_pieces bigint)`
  * — the word split to characters, then each ordered merge rule
  * (ls[i], rs[i]) applied as one greedy left-to-right pass.
  *
  * Semantics are EXACTLY [[graft.operators.Bpe]]'s window algebra (the
  * trained-tokenizer ENCODE contract): per rule, match positions form
  * maximal runs and greedy-left-to-right keeps the alternating positions
  * of each run — which is precisely what a sequential scan with skip
  * computes, per word, with no shuffle at all. BpeSpec pins the
  * equivalence property over randomized words and rules.
  *
  * Why an expression and not the window form for application: each window
  * pass is a full Spark job (two window functions + two joins over the
  * whole vocabulary), so segmenting with an 8-rule table costs 8
  * sequential job barriers — at sf0.1 that was ~3.7 s of nearly pure
  * scheduling overhead (q106). Segmentation is per-word pure, so it
  * belongs IN the row pipeline: this expression runs inside whole-stage
  * codegen, turning the whole operation into one shuffle-free projection
  * over the distinct vocabulary. The window algebra remains the TRAINING
  * implementation (training must count pairs ACROSS words per iteration —
  * genuinely relational work) and the cross-checked twin for this kernel.
  *
  * Characters are CODE POINTS (the window form splits with Spark's
  * `substring`, which counts code points — a surrogate pair is one
  * symbol on both paths). Null word → null; empty word → ("", 0), though
  * [[graft.operators.Bpe.applyMerges]] filters empties out before the
  * expression, matching the window form's explode-nothing behavior.
  */
case class BpeSegment(first: Expression, second: Expression,
                      third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def strArr(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (first.dataType == StringType && strArr(second.dataType) &&
        strArr(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_segment requires (string, array<string>, array<string>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", StringType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))
  override def prettyName: String = "bpe_segment"

  override protected def nullSafeEval(w: Any, ls: Any, rs: Any): Any =
    BpeSegment.segment(w.asInstanceOf[UTF8String],
      ls.asInstanceOf[ArrayData], rs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, ls, rs) =>
      s"graft.expressions.BpeSegment.segment($w, $ls, $rs)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeSegment =
    copy(newFirst, newSecond, newThird)
}

object BpeSegment {

  /** Static kernel invoked from generated code AND the interpreted path.
    * One greedy pass per rule: scan the symbol list once, merging each
    * (l, r) adjacency and skipping its consumed right half — the
    * alternating-run-position rule of the relational form, sequentially.
    */
  def segment(w: UTF8String, ls: ArrayData, rs: ArrayData): InternalRow = {
    val nRules = ls.numElements()
    if (rs.numElements() != nRules)
      throw new IllegalArgumentException(
        s"bpe_segment: rule arrays disagree (${nRules} left vs " +
          s"${rs.numElements()} right halves)")
    val s = w.toString
    // split to code points — one symbol per code point, like substring()
    var syms = new java.util.ArrayList[String](s.length)
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(s.substring(ci, ci + n))
      ci += n
    }
    var k = 0
    while (k < nRules && syms.size > 1) {
      val l = ls.getUTF8String(k).toString
      val r = rs.getUTF8String(k).toString
      val out = new java.util.ArrayList[String](syms.size)
      var i = 0
      val n = syms.size
      while (i < n) {
        if (i + 1 < n && syms.get(i) == l && syms.get(i + 1) == r) {
          out.add(l + r); i += 2
        } else {
          out.add(syms.get(i)); i += 1
        }
      }
      syms = out
      k += 1
    }
    val joined = String.join(" ", syms)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(joined), syms.size.toLong))
  }
}
