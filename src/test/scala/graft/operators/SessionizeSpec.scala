package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // user 1: gaps 5, 100 (break), 5; user 2: single event.
  private val events = Seq(
    (1L, 10L, 0L, 2L), (1L, 11L, 5L, 1L), (1L, 12L, 105L, 4L),
    (1L, 13L, 110L, 8L), (2L, 20L, 50L, 16L)
  ).toDF("user", "id", "t", "v")

  test("assign breaks sessions strictly past maxGap") {
    val got = Sessionize.assign(events, Seq(col("user")), col("t"), col("id"),
        maxGap = 10L)
      .select("user", "id", "session_seq").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L),
      (1L, 13L, 2L), (2L, 20L, 1L)))
  }

  test("a gap of exactly maxGap stays in-session") {
    val got = Sessionize.assign(events, Seq(col("user")), col("t"), col("id"),
        maxGap = 100L)
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L)) // 100 == maxGap → no break anywhere
  }

  test("rollup emits per-session counts, bounds, duration, and metric sum") {
    val got = Sessionize.rollup(events, Seq(col("user")), col("t"), col("id"),
        maxGap = 10L, metric = col("v"))
      .select("user", "session_seq", "n_events", "session_start", "session_end",
        "duration", "sum_metric")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 2L, 0L, 5L, 5L, 3L),
      (1L, 2L, 2L, 105L, 110L, 5L, 12L),
      (2L, 1L, 1L, 50L, 50L, 0L, 16L)))
  }

  test("session ids are deterministic under input order") {
    val shuffled = events.orderBy(rand(42))
    val a = Sessionize.assign(events, Seq(col("user")), col("t"), col("id"), 10L)
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    val b = Sessionize.assign(shuffled, Seq(col("user")), col("t"), col("id"), 10L)
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
