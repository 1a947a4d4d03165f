package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PreferencePairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]) =
    LlmPipelines.preferencePairs(
        rows.toDF("doc_id", "cluster", "quality_milli"))
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap

  test("chosen = best quality (ties lowest id), rejected = worst (ties highest id)") {
    val out = run(Seq(
      (1L, 1L, 500L), (2L, 1L, 900L), (3L, 1L, 100L), // clear extremes
      (10L, 10L, 700L), (11L, 10L, 700L),             // 2-member all-equal
      (20L, 20L, 300L), (21L, 20L, 300L), (22L, 20L, 300L), // 3-member all-equal
      (30L, 30L, 400L)))                              // singleton: dropped
    // (cluster, chosen, rejected, margin, n_members, zero_margin)
    assert(out(1L) === ((1L, 2L, 3L, 800L, 3L, false)))
    // all-equal: chosen ≠ rejected is GUARANTEED by the opposed tiebreaks
    assert(out(10L) === ((10L, 10L, 11L, 0L, 2L, true)))
    assert(out(20L) === ((20L, 20L, 22L, 0L, 3L, true)))
    assert(!out.contains(30L), "singleton clusters emit no pair")
    out.values.foreach { case (_, chosen, rejected, margin, _, zm) =>
      assert(chosen != rejected)
      assert(margin >= 0L && (zm == (margin == 0L)))
    }
  }
}
