package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

class PqQuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pq_quantize rejects an undersized vector loudly (no silent OOB read)") {
    // 64-dim codebook (4 subspaces x 16 dims) against an 8-element vector:
    // without the guard this reads past the UnsafeArrayData bounds and
    // returns garbage codes instead of failing.
    val short = Seq(Seq.fill(8)(0.5f)).toDF("embedding")
    val ex = intercept[Exception] {
      short.select(call_function("pq_quantize", col("embedding"),
        typedlit(Similarity.pqCodebook.flatten.map(_.toSeq).toSeq),
        typedlit(Similarity.pqCbNorm2.flatten.toSeq),
        lit(Similarity.PqSub))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pq_quantize: vector has 8 elements")), ex)
  }

  test("pq_quantize accepts an exactly-sized vector") {
    val ok = Seq(Seq.fill(Similarity.PqDims)(0.5f)).toDF("embedding")
      .select(call_function("pq_quantize", col("embedding"),
        typedlit(Similarity.pqCodebook.flatten.map(_.toSeq).toSeq),
        typedlit(Similarity.pqCbNorm2.flatten.toSeq),
        lit(Similarity.PqSub)).as("w"))
      .as[Long].head()
    assert(ok >= 0L && ok < (1L << (4 * Similarity.PqSub)))
  }
}
