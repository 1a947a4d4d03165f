package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def diff(prev: Seq[(Long, String, String)],
                   cur: Seq[(Long, String, String)]) =
    SnapshotDiff.diffCounts(prev.toDF("k", "c", "g"), cur.toDF("k", "c", "g"),
        "k", "c", "g")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("all four statuses counted per group") {
    val prev = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s1"))
    val cur = Seq((1L, "a", "s1"), (2L, "B", "s1"), (4L, "d", "s1"))
    // 1 unchanged, 2 changed, 3 removed, 4 added
    assert(diff(prev, cur) === Map("s1" -> ((1L, 1L, 1L, 1L))))
  }

  test("a key that moves group is attributed to the NEW side's group") {
    val prev = Seq((1L, "a", "s1"))
    val cur = Seq((1L, "a", "s2"))
    assert(diff(prev, cur) === Map("s2" -> ((0L, 0L, 0L, 1L))))
  }

  test("null contents compare null-safely (null == null is unchanged)") {
    val prev = Seq((1L, null: String, "s1"), (2L, "x", "s1"))
    val cur = Seq((1L, null: String, "s1"), (2L, null: String, "s1"))
    assert(diff(prev, cur) === Map("s1" -> ((0L, 0L, 1L, 1L))))
  }

  test("disjoint snapshots: everything added plus everything removed") {
    val prev = Seq((1L, "a", "s1"), (2L, "b", "s2"))
    val cur = Seq((3L, "c", "s1"))
    assert(diff(prev, cur) ===
      Map("s1" -> ((1L, 1L, 0L, 0L)), "s2" -> ((0L, 1L, 0L, 0L))))
  }
}
