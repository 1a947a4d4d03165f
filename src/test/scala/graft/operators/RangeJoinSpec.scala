package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def join(points: Seq[(Long, Long)], intervals: Seq[(Long, Long, Long)],
                   binWidth: Long) =
    RangeJoin.pointInInterval(
        points.toDF("pid", "t"), "t",
        intervals.toDF("iid", "lo", "hi"), "lo", "hi", binWidth)
      .select("pid", "iid").as[(Long, Long)].collect().toList

  test("half-open bounds: lo matches, hi does not") {
    val got = join(Seq((1L, 10L), (2L, 20L), (3L, 15L)),
      Seq((9L, 10L, 20L)), binWidth = 7L)
    assert(got.toSet == Set((1L, 9L), (3L, 9L)))
  }

  test("an interval spanning many bins matches each point exactly once") {
    // interval [0, 100) with binWidth 10 explodes to 10 bins; every point
    // appears once, never per-bin
    val points = (0L until 100L by 9L).map(t => (t, t))
    val got = join(points, Seq((1L, 0L, 100L)), binWidth = 10L)
    assert(got.size == points.size && got.distinct.size == points.size)
  }

  test("overlapping intervals each match; empty intervals match nothing") {
    val got = join(Seq((1L, 5L)),
      Seq((10L, 0L, 10L), (11L, 5L, 6L), (12L, 5L, 5L), (13L, 7L, 3L)),
      binWidth = 4L)
    assert(got.toSet == Set((1L, 10L), (1L, 11L)))
  }

  test("matches agree with the naive predicate on random data") {
    val rnd = new scala.util.Random(7)
    val points = (1L to 200L).map(i => (i, rnd.nextLong(1000)))
    val intervals = (1L to 50L).map { i =>
      val lo = rnd.nextLong(1000); (i, lo, lo + rnd.nextLong(80))
    }
    val expected = (for {
      (pid, t) <- points; (iid, lo, hi) <- intervals
      if t >= lo && t < hi
    } yield (pid, iid)).toSet
    assert(join(points, intervals, binWidth = 64L).toSet == expected)
  }

  test("intervalOverlap agrees with the naive predicate and emits each pair once") {
    val rnd = new scala.util.Random(17)
    def intervals(n: Int, tag: String) = (1L to n.toLong).map { i =>
      val lo = rnd.nextLong(500); (i, lo, lo + 1 + rnd.nextLong(120))
    }
    val as = intervals(60, "a")
    val bs = intervals(60, "b")
    val expected = (for {
      (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
      if alo < bhi && blo < ahi
    } yield (ai, bi)).toList.sorted
    val got = RangeJoin.intervalOverlap(
        as.toDF("ai", "alo", "ahi"), "alo", "ahi",
        bs.toDF("bi", "blo", "bhi"), "blo", "bhi", binWidth = 64L)
      .select("ai", "bi").as[(Long, Long)].collect().toList.sorted
    assert(got == expected) // sorted lists: equality also proves exactly-once
  }

  test("intervalOverlap half-open bounds: touching intervals do not overlap") {
    val got = RangeJoin.intervalOverlap(
        Seq((1L, 0L, 10L)).toDF("ai", "alo", "ahi"), "alo", "ahi",
        Seq((2L, 10L, 20L), (3L, 9L, 10L), (4L, 0L, 1L)).toDF("bi", "blo", "bhi"),
        "blo", "bhi", binWidth = 8L)
      .select("bi").as[Long].collect().toSet
    assert(got == Set(3L, 4L)) // [10,20) touches at 10 → no overlap
  }

  test("column collisions across sides are rejected") {
    assertThrows[IllegalArgumentException](
      RangeJoin.pointInInterval(Seq((1L, 2L)).toDF("x", "t"), "t",
        Seq((1L, 2L, 3L)).toDF("x", "lo", "hi"), "lo", "hi", 10L))
  }
}
