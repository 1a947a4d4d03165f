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

  private def padded(rows: Seq[(Long, Long)], width: Long, batch: Int = 4) =
    Packing.paddedBatches(rows.toDF("id", "len"), "id", "len", batch,
        shards = 2, salt = "t", bucketWidth = width)
      .select("shard", "bucket", "batch", "n_rows", "batch_max", "n_tokens",
        "n_pad")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("paddedBatches: batches hold batchSize rows except the last per group") {
    val out = padded(corpus, width = 0L)
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.init.forall(_._4 == 4L))
      assert(sorted.last._4 >= 1L && sorted.last._4 <= 4L)
      assert(sorted.map(_._3) == sorted.indices.map(_.toLong))
    }
    assert(out.map(_._4).sum == corpus.size.toLong)
  }

  test("paddedBatches: pad accounting is exact (n_rows*max - sum)") {
    val out = padded(Seq((1L, 10L), (2L, 7L), (3L, 10L), (4L, 2L)), 0L, 4)
    // all four land in deterministic shards; check the invariant per batch
    out.foreach { r => assert(r._7 == r._4 * r._5 - r._6 && r._7 >= 0L) }
  }

  test("paddedBatches: bucketing by width 1 makes every batch pad-free") {
    assert(padded(corpus, width = 1L).forall(_._7 == 0L))
  }

  test("paddedBatches: bucketing never increases total padding on this corpus") {
    val waste0 = padded(corpus, 0L).map(_._7).sum
    val waste8 = padded(corpus, 8L).map(_._7).sum
    assert(waste8 <= waste0)
  }

  private def packNS(rows: Seq[(Long, Long)], budget: Long = Budget) =
    Packing.packNoStraddle(rows.toDF("id", "cost"), "id", "cost",
        budget, shards = 4, salt = "t")
      .select("id", "cost", "shard", "pack", "offset_in_pack", "oversize")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq

  test("packNoStraddle ≡ the naive per-shard greedy fold; no pack exceeds budget unless oversize-alone") {
    val out = packNS(corpus :+ (1000L, 150L)) // one oversize doc
    out.groupBy(_._3).foreach { case (_, rows) =>
      // replay the greedy next-fit over the same deterministic order
      val ordered = rows.sortBy(r => (r._4, r._5, r._1))
      var pack = 0L; var fill = 0L
      ordered.foreach { case (_, cost, _, p, off, oversize) =>
        if (fill > 0 && fill + cost > Budget) { pack += 1; fill = 0 }
        assert((p, off) === ((pack, fill)))
        assert(oversize === (cost > Budget))
        fill += cost
      }
      // the no-straddle contract: a pack over budget holds ONE oversize doc
      rows.groupBy(_._4).foreach { case (_, members) =>
        val used = members.map(_._2).sum
        assert(used <= Budget ||
          (members.size == 1 && members.head._6), members.toString)
      }
    }
    // every doc appears exactly once
    assert(out.map(_._1).sorted === (corpus.map(_._1) :+ 1000L).sorted)
  }

  test("packNoStraddle is deterministic across runs and repartitions") {
    val a = packNS(corpus).toSet
    val b = packNS(corpus.reverse).toSet // input order must not matter
    assert(a === b)
  }
}
