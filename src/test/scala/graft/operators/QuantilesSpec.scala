package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("byRank returns the value at rank ceil(p*n)") {
    val df = (1L to 10L).map(i => ("g", i, i * 10L)).toDF("g", "id", "v")
    val r = Quantiles.byRank(df, Seq(col("g")), col("v"), col("id"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0))
      .select("g", "n", "q_p50", "q_p90", "q_p100")
      .as[(String, Long, Long, Long, Long)].collect().head
    // n=10: p50 → rank 5 → 50; p90 → rank 9 → 90; p100 → rank 10 → 100
    assert(r == ("g", 10L, 50L, 90L, 100L))
  }

  test("byRank handles multiple groups and n=1 groups") {
    val df = Seq(("a", 1L, 7L), ("b", 2L, 1L), ("b", 3L, 3L), ("b", 4L, 5L))
      .toDF("g", "id", "v")
    val r = Quantiles.byRank(df, Seq(col("g")), col("v"), col("id"),
        Seq("p50" -> 0.5))
      .select("g", "n", "q_p50").as[(String, Long, Long)].collect().toSet
    // a: rank ceil(0.5)=1 → 7; b: rank ceil(1.5)=2 → 3
    assert(r == Set(("a", 1L, 7L), ("b", 3L, 3L)))
  }

  test("rank arithmetic is integer-exact where double ceil is off by one") {
    // 0.07 * 100 = 7.000000000000001 in doubles → ceil gives 8; the
    // semantics promise rank 7 (value 70).
    val df = (1L to 100L).map(i => ("g", i, i * 10L)).toDF("g", "id", "v")
    val r = Quantiles.byRank(df, Seq(col("g")), col("v"), col("id"),
        Seq("p07" -> 0.07, "p14" -> 0.14, "p55" -> 0.55))
      .select("q_p07", "q_p14", "q_p55").as[(Long, Long, Long)].collect().head
    assert(r == ((70L, 140L, 550L)))
  }

  test("equal values rank deterministically by tiebreak") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L), ("g", 4L, 9L))
      .toDF("g", "id", "v")
    val r = Quantiles.byRank(df, Seq(col("g")), col("v"), col("id"),
        Seq("p75" -> 0.75))
      .select("q_p75").as[Long].collect().head
    assert(r == 5L) // rank 3 of [5,5,5,9]
  }
}
