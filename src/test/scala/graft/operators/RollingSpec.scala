package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RollingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("overRange sums the trailing window, inclusive at both bounds") {
    val df = Seq((1L, 0L, 1L), (1L, 50L, 2L), (1L, 100L, 4L), (1L, 151L, 8L))
      .toDF("k", "t", "v")
    val got = Rolling.overRange(df, Seq(col("k")), col("t"), col("v"), 100L)
      .select("t", "roll_sum", "roll_cnt").as[(Long, Long, Long)]
      .collect().map { case (t, s, c) => t -> ((s, c)) }.toMap
    assert(got(0L) == ((1L, 1L)))
    assert(got(100L) == ((7L, 3L)))  // t=0 exactly lookback back: included
    assert(got(151L) == ((12L, 2L))) // frame [51,151]: t=0 and t=50 are out
  }

  test("duplicate timestamps all see the identical frame (deterministic, no tiebreak)") {
    val df = Seq((1L, 10L, 1L), (1L, 10L, 2L), (1L, 10L, 4L)).toDF("k", "t", "v")
    val got = Rolling.overRange(df, Seq(col("k")), col("t"), col("v"), 5L)
      .select("v", "roll_sum", "roll_cnt").as[(Long, Long, Long)].collect().toSet
    // RANGE frame: every tied row sees all three
    assert(got == Set((1L, 7L, 3L), (2L, 7L, 3L), (4L, 7L, 3L)))
  }

  test("keys are independent") {
    val df = Seq((1L, 0L, 1L), (2L, 1L, 100L), (1L, 2L, 2L)).toDF("k", "t", "v")
    val got = Rolling.overRange(df, Seq(col("k")), col("t"), col("v"), 10L)
      .select("k", "t", "roll_sum").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 1L), (2L, 1L, 100L), (1L, 2L, 3L)))
  }

  test("decayedSum: exact shift weights, future rows undecayed, floor after 20 halvings") {
    // asOf=100, halfLife=10: elapsed 0→w=1e6, 25→2 halvings→250k,
    // future (t=110)→0 elapsed→1e6, ancient (t=-150)→25 halvings→0
    val df = Seq(
      ("u", 100L, 7L), ("u", 75L, 8L), ("u", 110L, 5L), ("u", -150L, 9L))
      .toDF("k", "t", "v")
    val r = Rolling.decayedSum(df, Seq(col("k")), col("t"), col("v"),
        asOf = 100L, halfLife = 10L)
      .select("decayed_ppm", "raw_sum", "n").as[(Long, Long, Long)]
      .collect().head
    assert(r == ((7L * 1000000 + 8L * 250000 + 5L * 1000000 + 0L, 29L, 4L)))
  }

  test("decayedSum is partitioning-invariant (partial agg, no window)") {
    val rows = (1 to 500).map(i => ("u" + i % 7, i.toLong * 3, i.toLong))
    val a = Rolling.decayedSum(rows.toDF("k", "t", "v").repartition(1),
      Seq(col("k")), col("t"), col("v"), 1500L, 100L)
      .as[(String, Long, Long, Long)].collect().toSet
    val b = Rolling.decayedSum(rows.toDF("k", "t", "v").repartition(13),
      Seq(col("k")), col("t"), col("v"), 1500L, 100L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
