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
}
