package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Budget = 100L

  private def pack(rows: Seq[(Long, Long)]) =
    Packing.packByBudget(rows.toDF("id", "cost"), "id", "cost",
        Budget, shards = 4, salt = "t")
      .select("id", "cost", "shard", "pack", "offset_in_pack", "n_chunks")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  private val corpus = (1L to 300L).map(i => (i, 1L + (i * 37 % 90)))

  test("each shard is one gapless stream: packs fill completely before the next starts") {
    val out = pack(corpus)
    out.groupBy(_._3).foreach { case (_, rows) =>
      // stream order = absolute start position
      val stream = rows.sortBy(r => r._4 * Budget + r._5)
      var cum = 0L
      stream.foreach { case (_, cost, _, p, off, chunks) =>
        assert(p == cum / Budget, "pack = floor(start/budget)")
        assert(off == cum % Budget, "offset continues the stream with no gap")
        assert(chunks == (cum + cost - 1) / Budget - cum / Budget + 1,
          "n_chunks counts the packs the doc touches")
        cum += cost
      }
    }
  }

  test("offsets stay inside the budget and every doc is assigned") {
    val out = pack(corpus)
    assert(out.size == corpus.size)
    assert(out.forall(r => r._5 >= 0 && r._5 < Budget))
    assert(out.forall(_._6 >= 1))
  }

  test("assignment is deterministic under shuffled input order") {
    val a = pack(corpus).toSet
    val b = pack(scala.util.Random.shuffle(corpus)).toSet
    assert(a == b)
  }

  test("a doc larger than the budget spans ceil(cost/budget)±1 packs") {
    val out = pack(Seq((1L, 350L)))
    val r = out.head
    // 350 over budget 100 starting at offset 0 → packs 0..3 → 4 chunks
    assert(r._5 == 0L && r._6 == 4L)
  }
}
