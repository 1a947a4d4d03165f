package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // left: (id, key, t); right: (key, t, rid, rv)
  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long, Long)],
                  maxAge: Option[Long] = None) = {
    val l = left.toDF("id", "k", "ts")
    val r = right.toDF("k", "ts", "rid", "rv")
    AsOf.backward(l, r, Seq("k"), "ts", "rid", Seq("rid", "rv"), maxAge = maxAge)
      .select("id", "asof_rid", "asof_rv", "asof_age")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSet
  }

  test("picks the latest right row at or before the left time, per key") {
    val got = run(
      left = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 8L, 100L)),
      right = Seq((7L, 50L, 11L, 500L), (7L, 200L, 12L, 600L), (8L, 300L, 13L, 700L)))
    assert(got == Set(
      (1L, Some(11L), Some(500L), Some(50L)),   // only t=50 precedes 100
      (2L, Some(12L), Some(600L), Some(50L)),   // t=200 supersedes t=50
      (3L, None, None, None)))                  // key 8's row is in the future
  }

  test("equal timestamps match (inclusive bound) and resolve ties to the greatest tiebreak") {
    val got = run(
      left = Seq((1L, 7L, 100L)),
      right = Seq((7L, 100L, 11L, 500L), (7L, 100L, 12L, 600L)))
    assert(got == Set((1L, Some(12L), Some(600L), Some(0L))))
  }

  test("maxAge tolerance nulls out stale matches") {
    val got = run(
      left = Seq((1L, 7L, 100L), (2L, 7L, 500L)),
      right = Seq((7L, 90L, 11L, 500L)),
      maxAge = Some(50L))
    assert(got == Set(
      (1L, Some(11L), Some(500L), Some(10L)),
      (2L, None, None, None))) // age 410 > 50
  }

  test("agrees with the naive per-row maximum on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1L to 150L).map(i => (i, rnd.nextLong(5), rnd.nextLong(200)))
    val right = (1L to 200L).map(i => (rnd.nextLong(5), rnd.nextLong(200), i, i * 3))
    val expected = left.map { case (id, k, t) =>
      val cand = right.filter(r => r._1 == k && r._2 <= t)
      if (cand.isEmpty) (id, None, None, None)
      else {
        val best = cand.maxBy(r => (r._2, r._3)) // latest ts, ties to max rid
        (id, Some(best._3), Some(best._4), Some(t - best._2))
      }
    }.toSet
    assert(run(left, right) == expected)
  }

  test("nearest picks the closer side, ties to backward, maxAge bounds both directions") {
    val l = Seq((1L, 7L, 100L), (2L, 7L, 190L), (3L, 7L, 150L), (4L, 7L, 500L))
      .toDF("id", "k", "ts")
    val r = Seq((7L, 90L, 11L, 1L), (7L, 210L, 12L, 2L)).toDF("k", "ts", "rid", "rv")
    val got = AsOf.nearest(l, r, Seq("k"), "ts", "rid", Seq("rid"))
      .select("id", "asof_rid", "asof_age")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, Some(11L), Some(10L)),   // 90 at distance 10 beats 210 at 110
      (2L, Some(12L), Some(20L)),   // 210 at 20 beats 90 at 100
      (3L, Some(11L), Some(60L)),   // equidistant (60/60) → backward wins
      (4L, Some(12L), Some(290L)))) // only past rows → backward fallback
    val capped = AsOf.nearest(l, r, Seq("k"), "ts", "rid", Seq("rid"),
        maxAge = Some(30L))
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toSet
    assert(capped == Set((1L, Some(11L)), (2L, Some(12L)), (3L, None), (4L, None)))
  }

  test("nearest agrees with the naive closest-row scan on random data") {
    val rnd = new scala.util.Random(13)
    val left = (1L to 120L).map(i => (i, rnd.nextLong(4), rnd.nextLong(300)))
    val right = (1L to 150L).map(i => (rnd.nextLong(4), rnd.nextLong(300), i, i * 2))
    val expected = left.map { case (id, k, t) =>
      val cand = right.filter(_._1 == k)
      // backward: max t then max rid; forward: min t then max rid
      val back = cand.filter(_._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(r => (r._3, t - r._2))
      val fwd = cand.filter(_._2 >= t)
        .sortBy(r => (r._2, -r._3)).headOption.map(r => (r._3, r._2 - t))
      (back, fwd) match {
        case (Some((bi, ba)), Some((_, fa))) if ba <= fa => (id, Some(bi), Some(ba))
        case (_, Some((fi, fa))) => (id, Some(fi), Some(fa))
        case (Some((bi, ba)), None) => (id, Some(bi), Some(ba))
        case _ => (id, None, None)
      }
    }.toSet
    val got = AsOf.nearest(left.toDF("id", "k", "ts"),
        right.toDF("k", "ts", "rid", "rv"), Seq("k"), "ts", "rid", Seq("rid"))
      .select("id", "asof_rid", "asof_age")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == expected)
  }

  test("forward picks the earliest right row at or after the left time") {
    val l = Seq((1L, 7L, 100L), (2L, 7L, 250L)).toDF("id", "k", "ts")
    val r = Seq((7L, 150L, 11L, 500L), (7L, 200L, 12L, 600L)).toDF("k", "ts", "rid", "rv")
    val got = AsOf.forward(l, r, Seq("k"), "ts", "rid", Seq("rid", "rv"))
      .select("id", "ts", "asof_rid", "asof_age")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 100L, Some(11L), Some(50L)), // earliest future row, age = rt - lt
      (2L, 250L, None, None)))          // nothing at or after 250
  }

  test("result is order-insensitive (deterministic under shuffled input)") {
    val left = (1L to 40L).map(i => (i, i % 3, i * 7 % 101))
    val right = (1L to 60L).map(i => (i % 3, i * 13 % 101, i, i * 2))
    val a = run(left, right)
    val b = run(scala.util.Random.shuffle(left), scala.util.Random.shuffle(right))
    assert(a == b)
  }
}
