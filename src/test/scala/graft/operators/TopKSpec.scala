package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("agrees exactly with the window form on random data, including ties") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 3000L).map(i =>
      (i % 7, i, rnd.nextLong(50))) // small score range → plenty of ties
    val df = rows.toDF("g", "id", "score")
    val viaAgg = TopK.topKByScore(df, col("g"), col("id"), col("score"), 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaWindow = Dedup.keepFirstK(df, Seq(col("g")),
        Seq(col("score").desc, col("id").asc), 4, "rank")
      .select(col("g").as("group"), col("id"), col("score"), col("rank"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k emit all their rows, ranked") {
    val df = Seq((1L, 10L, 5L), (1L, 11L, 9L)).toDF("g", "id", "score")
    val out = TopK.topKByScore(df, col("g"), col("id"), col("score"), 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 11L, 9L, 1L), (1L, 10L, 5L, 2L)))
  }

  test("the plan is a partial+final aggregate, not a window sort") {
    val df = (1L to 100L).map(i => (i % 3, i, i * 7 % 31)).toDF("g", "id", "score")
    val plan = TopK.topKByScore(df, col("g"), col("id"), col("score"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(plan.contains("partial_topkbyscore") || plan.contains("partial_"),
      s"no partial aggregation in plan:\n$plan")
    assert(!plan.contains("Window"))
  }
}
