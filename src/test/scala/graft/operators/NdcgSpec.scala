package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NdcgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Int)], k: Int = 5) =
    TermStats.gradedNdcg(rows.toDF("q_id", "rank", "rel"),
        "q_id", "rank", "rel", k)
      .select($"q", $"n_ret", $"dcg_pm", $"idcg_pm", $"ndcg_pm")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

  test("discount table pins floor(1e6/log2(1+r)) — the oracle shares these") {
    assert((1 to 5).map(TermStats.ndcgWeightPm) ===
      Seq(1000000L, 630929L, 500000L, 430676L, 386852L))
    intercept[IllegalArgumentException] { TermStats.ndcgWeightPm(0) }
  }

  test("ideal ordering scores exactly 1e6") {
    // rels already descending → dcg == idcg
    val out = run(Seq((1L, 1L, 3), (1L, 2L, 2), (1L, 3L, 1)))
    assert(out === Seq((1L, 3L,
      7L * 1000000 + 3L * 630929 + 1L * 500000,
      7L * 1000000 + 3L * 630929 + 1L * 500000, 1000000L)))
  }

  test("hand-computed inversion: exact integer dcg/idcg/ndcg") {
    // gains 1 (rel 1) at rank 1, 7 (rel 3) at rank 2
    val dcg = 1L * 1000000 + 7L * 630929
    val idcg = 7L * 1000000 + 1L * 630929
    val out = run(Seq((1L, 1L, 1), (1L, 2L, 3)))
    assert(out === Seq((1L, 2L, dcg, idcg, 1000000L * dcg / idcg)))
  }

  test("equal-gain permutations cannot change the score") {
    val a = run(Seq((1L, 1L, 2), (1L, 2L, 2), (1L, 3L, 1)))
    val b = run(Seq((1L, 1L, 2), (1L, 2L, 1), (1L, 3L, 2)))
    assert(a.head._4 === b.head._4) // same idcg (same gain multiset)
  }

  test("all-zero grades read as a well-typed zero, not a crash") {
    val out = run(Seq((1L, 1L, 0), (1L, 2L, 0)))
    assert(out === Seq((1L, 2L, 0L, 0L, 0L)))
  }

  test("rows past k are ignored; queries aggregate independently") {
    val out = run(Seq((1L, 1L, 2), (1L, 2L, 1), (2L, 1L, 1)), k = 1)
    assert(out.map(r => (r._1, r._2)) === Seq((1L, 1L), (2L, 1L)))
    assert(out.forall(_._5 === 1000000L)) // a 1-list is always ideal
  }

  test("k bounds are enforced") {
    intercept[IllegalArgumentException] {
      TermStats.gradedNdcg(Seq((1L, 1L, 1)).toDF("q", "rank", "rel"),
        "q", "rank", "rel", k = 0)
    }
  }

  test("nDCG@100 is valid — the shift bound caps the grade, not the depth (r15 advice)") {
    val rows = (1L to 100L).map(r => (1L, r, if (r >= 98) 1 else 0))
    val out = run(rows, k = 100)
    assert(out.head._2 == 100L, "all 100 retrieved rows must count")
    assert(out.head._5 < 1000000L, "relevant docs at the bottom => below ideal")
  }

  test("an out-of-range grade fails loudly instead of silent garbage gains") {
    for (bad <- Seq(-1, 63)) {
      val e = intercept[Exception] {
        run(Seq((1L, 1L, bad)), k = 5)
      }
      assert(e.getMessage.contains("outside [0, 62]"),
        s"rel=$bad: expected the in-plan raise_error, got ${e.getMessage}")
    }
  }
}
