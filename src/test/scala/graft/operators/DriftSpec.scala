package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tvdOf(rows: Seq[(String, Long, String)]): Map[String, Long] =
    Drift.tvd(rows.toDF("g", "bin", "split"), Seq("g"), "bin", "split", "a", "b")
      .select($"g", $"tvd_pm").as[(String, Long)].collect().toMap

  test("identical distributions have TVD 0, disjoint have TVD 1e6") {
    val same = (1L to 4L).flatMap(b => Seq(("g1", b, "a"), ("g1", b, "b")))
    val disjoint = Seq(("g2", 1L, "a"), ("g2", 1L, "a"), ("g2", 2L, "b"))
    val out = tvdOf(same ++ disjoint)
    assert(out("g1") == 0L)
    assert(out("g2") == 1000000L)
  }

  test("hand-computed case: p=(3/4,1/4) vs q=(1/4,3/4) gives TVD 1/2 exactly") {
    // ½·(|3/4−1/4| + |1/4−3/4|) = 1/2 → 500000 pm, integer-exact.
    val rows = Seq.fill(3)(("g", 1L, "a")) ++ Seq(("g", 2L, "a")) ++
      Seq(("g", 1L, "b")) ++ Seq.fill(3)(("g", 2L, "b"))
    assert(tvdOf(rows)("g") == 500000L)
  }

  test("unequal side sizes normalize: (2,0) vs (2,2) is TVD 1/2") {
    // p=(1,0), q=(1/2,1/2) → ½·(1/2 + 1/2·0… ) = ½·(|1−1/2|+|0−1/2|) = 1/2.
    val rows = Seq(("g", 1L, "a"), ("g", 1L, "a"),
      ("g", 1L, "b"), ("g", 1L, "b"), ("g", 2L, "b"), ("g", 2L, "b"))
    assert(tvdOf(rows)("g") == 500000L)
  }

  test("a side with no rows at all reads as full drift, not a crash") {
    val rows = Seq(("g", 1L, "a"), ("g", 2L, "a"))
    assert(tvdOf(rows)("g") == 1000000L)
  }

  test("rows outside the two named splits are ignored") {
    val rows = Seq(("g", 1L, "a"), ("g", 1L, "b"), ("g", 9L, "junk"))
    assert(tvdOf(rows)("g") == 0L)
  }

  test("registry form is equivalent to the two-split batch form") {
    val ref = Seq(("g", 1L), ("g", 1L), ("g", 2L)).toDF("g", "bin")
    val bat = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 3L)).toDF("g", "bin")
    val viaSplit = Drift.tvd(
      ref.withColumn("split", lit("a"))
        .unionByName(bat.withColumn("split", lit("b"))),
      Seq("g"), "bin", "split", "a", "b")
    val viaReg = Drift.tvdAgainstRegistry(
      Drift.binnedCounts(ref, Seq("g"), "bin"), bat, Seq("g"), "bin")
    assert(viaReg.columns.toSeq === viaSplit.columns.toSeq)
    assert(viaReg.collect().map(_.toSeq).toSeq ===
      viaSplit.collect().map(_.toSeq).toSeq)
  }

  test("registry groups absent from the batch read as full drift") {
    val reg = Drift.binnedCounts(
      Seq(("g1", 1L), ("g2", 2L)).toDF("g", "bin"), Seq("g"), "bin")
    val out = Drift.tvdAgainstRegistry(reg,
        Seq(("g1", 1L)).toDF("g", "bin"), Seq("g"), "bin")
      .select($"g", $"tvd_pm").as[(String, Long)].collect().toMap
    assert(out("g1") == 0L)
    assert(out("g2") == 1000000L)
  }

  test("overflow guard fails loudly past MaxCrossProduct instead of wrapping") {
    // Force the guard branch with literal giant sides: n·n > Long.Max/2e6.
    val big = spark.range(4).select(lit("g").as("g"),
      (col("id") % 2 + 1).as("bin"),
      when(col("id") < 2, "a").otherwise("b").as("split"))
    val giant = Drift.tvd(big, Seq("g"), "bin", "split", "a", "b")
      .withColumn("na", lit(3000000000L)) // not used — guard is on real na/nb
    // Real check: synthesize counts via the public API with weights is not
    // possible without 3e9 rows, so pin the constant's own arithmetic:
    assert(Drift.MaxCrossProduct == Long.MaxValue / 2000000L)
    assert(BigInt(2) * BigInt(Drift.MaxCrossProduct) * 1000000 <= BigInt(Long.MaxValue))
    giant.collect() // small frame still evaluates fine under the guard
  }
}
