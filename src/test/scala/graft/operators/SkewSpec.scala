package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the plain join, spreads hot keys over sub-keys") {
    // one mega-key ("hot" × 500) + a uniform tail
    val big = ((1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 50).map(s => s"k$s")).zipWithIndex
      .map { case (k, i) => (k, s"dim$i") }.toDF("k", "d")

    val plain = big.join(small, Seq("k")).as[(String, Long, String)]
      .collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 8)
      .as[(String, Long, String)].collect().toSet
    assert(salted == plain)

    // the hot key's rows really spread across multiple sub-keys
    val spread = big.filter($"k" === "hot")
      .select(pmod(xxhash64(big.columns.map(col): _*), lit(8L)).cast("int"))
      .distinct().count()
    assert(spread > 1)

    // outer join keeps unmatched big rows exactly once
    val bigExtra = big.unionByName(Seq(("orphan", 0L)).toDF("k", "v"))
    val outer = Skew.saltedJoin(bigExtra, small, Seq("k"), salt = 8, "left_outer")
    assert(outer.count() == plain.size + 1)
    assert(outer.filter($"k" === "orphan").count() == 1)
  }

  test("saltedJoin rejects join types that would duplicate unmatched small-side rows") {
    val big = Seq(("a", 1L)).toDF("k", "v")
    val small = Seq(("a", "d")).toDF("k", "d")
    for (jt <- Seq("right_outer", "full_outer", "full", "outer"))
      assertThrows[IllegalArgumentException](Skew.saltedJoin(big, small, Seq("k"), 4, jt))
    // semi/anti against the replicated small side are exact — allowed
    assert(Skew.saltedJoin(big, small, Seq("k"), 4, "left_semi").count() == 1)
  }
}
