package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Dsir]] semantics: occurrence features (unigrams + bigrams), the
  * exact-integer arithmetic likelihood ratio, target-likeness ordering,
  * and the physical contract (broadcast probability join, top-N without a
  * global sort).
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("feature occurrences: n unigrams + (n-1) bigrams, occurrences not distinct") {
    val docs = Seq((1L, "a a a"), (2L, "x"), (3L, "p q")).toDF("doc_id", "text")
    val counts = Dsir.featureBuckets(docs, "doc_id", "text", 1024)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 5L, 2L -> 1L, 3L -> 3L)) // 3+2, 1+0, 2+1
  }

  test("a target-lookalike outranks an off-target doc; scores are exact integers") {
    val target = Seq((100L, "solar panel efficiency report"),
      (101L, "solar panel installation")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "solar panel efficiency"), // target-like
      (2L, "cat video compilation"), // off-target
      (3L, "solar panel installation report")) // target-like
      .toDF("doc_id", "text")
    val scored = Dsir.importanceScores(raw, target, "doc_id", "text", 1024)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(scored.keySet == Set(1L, 2L, 3L))
    assert(scored(1L)._3 > scored(2L)._3 && scored(3L)._3 > scored(2L)._3,
      s"target-lookalikes must outrank: $scored")
    // hand-check doc 2: none of its features appear in the target, and no
    // other raw doc shares them, so every bucket has ct=0, cr=1 (modulo
    // hash collisions — none among these 11 distinct features at B=1024):
    // score = 1e6 * (5*1) / (5*2) = 500000
    assert(scored(2L)._3 == 500000L)
    val picked = Dsir.select(raw, target, "doc_id", "text", 1024, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == Set(1L, 3L))
  }

  test("physical plan: probability join broadcasts, selection is TakeOrdered not Sort") {
    val docs = (1L to 200L).map(i => (i, s"w$i common token ${i % 7}"))
      .toDF("doc_id", "text")
    val plan = Dsir.select(docs.filter(col("doc_id") > 20),
        docs.filter(col("doc_id") <= 20), "doc_id", "text", 256, 10)
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"),
      "bucket-stats join must broadcast the bounded table")
    assert(s.contains("TakeOrderedAndProject"),
      "resample must be TakeOrderedAndProject")
    assert(!s.contains("SortMergeJoin"),
      "no shuffle join anywhere in the scoring path")
  }

  test("deterministic across runs (the md5 tiebreak does the Gumbel's job reproducibly)") {
    val docs = (1L to 50L).map(i => (i, "same text for every doc"))
      .toDF("doc_id", "text")
    val pick = () => Dsir.select(docs.filter(col("doc_id") > 10),
        docs.filter(col("doc_id") <= 10), "doc_id", "text", 64, 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(pick() == pick())
  }
}
