package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RrfFuseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leg(rows: (Long, Long, Long)*) =
    rows.toDF("q", "doc", "rank")

  test("hand-computed fusion: integer contributions sum across legs") {
    // leg A: doc 1 rank 1, doc 2 rank 2; leg B: doc 2 rank 1, doc 3 rank 2.
    // rrf(r) = 1e6 div (60+r): r1 -> 16393, r2 -> 16129.
    // doc 2: 16129 + 16393 = 32522 (2 legs) beats doc 1 (16393, 1 leg).
    val out = TermStats.rrfFuse(
        Seq(leg((9L, 1L, 1L), (9L, 2L, 2L)), leg((9L, 2L, 1L), (9L, 3L, 2L))),
        k = 3)
      .select($"q", $"doc", $"rrf_pm", $"n_legs", $"rank")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._5)
    assert(out.toSeq === Seq(
      (9L, 2L, 32522L, 2L, 1L),
      (9L, 1L, 16393L, 1L, 2L),
      (9L, 3L, 16129L, 1L, 3L)))
  }

  test("equal fused scores tie-break by doc id ascending") {
    val out = TermStats.rrfFuse(Seq(leg((1L, 7L, 1L), (1L, 3L, 1L))), k = 2)
      .select($"doc", $"rank").as[(Long, Long)].collect().sortBy(_._2)
    // both docs at rank 1 in one leg: same rrf_pm, doc 3 wins the tie
    assert(out.toSeq === Seq((3L, 1L), (7L, 2L)))
  }

  test("k truncates per query; guards reject bad arguments") {
    val out = TermStats.rrfFuse(
      Seq(leg((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))), k = 2)
    assert(out.count() === 2)
    intercept[IllegalArgumentException] { TermStats.rrfFuse(Seq(), k = 1) }
    intercept[IllegalArgumentException] {
      TermStats.rrfFuse(Seq(leg((1L, 1L, 1L))), k = 0)
    }
    intercept[IllegalArgumentException] {
      TermStats.rrfFuse(Seq(leg((1L, 1L, 1L))), k = 1, kRrf = -1)
    }
  }

  test("bm25TopK excludeSelf drops the self hit before ranking") {
    val docs = Seq((10L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val qs = Seq((10L, Seq("a"))).toDF("q_id", "qt")
    val incl = TermStats.bm25TopK(docs, qs, "doc_id", "text", "q_id", "qt",
      k = 1).select($"doc").as[Long].collect()
    val excl = TermStats.bm25TopK(docs, qs, "doc_id", "text", "q_id", "qt",
      k = 1, excludeSelf = true).select($"doc").as[Long].collect()
    assert(incl.toSeq === Seq(10L)) // self-retrieval wins when allowed
    assert(excl.toSeq === Seq(2L))  // excluded pre-rank, next doc fills k
  }

  test("fusion is invariant under leg order and duplicate-free per query") {
    val l1 = leg((1L, 10L, 1L), (1L, 11L, 2L), (2L, 10L, 1L))
    val l2 = leg((1L, 11L, 1L), (1L, 12L, 2L))
    val l3 = leg((2L, 12L, 1L), (1L, 10L, 3L))
    def fused(legs: Seq[org.apache.spark.sql.DataFrame]) =
      TermStats.rrfFuse(legs, k = 5)
        .select($"q", $"doc", $"rrf_pm", $"n_legs", $"rank")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
        .toSeq
    val base = fused(Seq(l1, l2, l3))
    assert(fused(Seq(l3, l1, l2)) === base)
    assert(fused(Seq(l2, l3, l1)) === base)
    // per query, each doc appears exactly once in the fused list
    base.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).distinct.size == rows.size)
    }
  }
}
