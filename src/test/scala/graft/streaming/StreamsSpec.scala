package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.Streams._

class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("newestWinsState: late and duplicate receipts never regress the edge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WitnessObs]
    val query = newestWinsState(input.toDS())
      .writeStream.format("memory").queryName("witness_state")
      .outputMode("update").start()
    try {
      input.addData(
        WitnessObs("a|b", 10L, 1.0, isValid = true),
        WitnessObs("a|c", 5L, 2.0, isValid = true))
      query.processAllAvailable()
      input.addData(
        WitnessObs("a|b", 20L, 9.0, isValid = false), // newer → wins
        WitnessObs("a|c", 3L, 7.0, isValid = false))  // older → ignored
      query.processAllAvailable()
      val state = spark.table("witness_state")
        .groupBy("key").agg(max(struct(col("time"), col("snr"))).as("s"))
        .select(col("key"), col("s.time"), col("s.snr"))
        .as[(String, Long, Double)].collect()
        .map { case (k, t, s) => k -> ((t, s)) }.toMap
      assert(state("a|b") == ((20L, 9.0))) // updated across micro-batches
      assert(state("a|c") == ((5L, 2.0)))  // late data ignored (T6)
    } finally query.stop()
  }

  test("windowedRewards: event-time windows aggregate per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)] // (ts_us, user_id, value)
    val day = 86400000000L
    val stream = windowedRewards(
      input.toDF().toDF("ts_us", "user_id", "value"), "1 day", "0 seconds")
    val query = stream.writeStream.format("memory").queryName("rewards")
      .outputMode("complete").start()
    try {
      input.addData((0L, 1L, 1.0), (day / 2, 1L, 2.0), (day + 1, 1L, 4.0),
        (day / 2, 2L, 8.0))
      query.processAllAvailable()
      val rows = spark.table("rewards")
        .select(col("user_id"), col("rewards_c"), col("cnt"))
        .as[(Long, Long, Long)].collect().toSet
      // user 1: day-0 window 100+200 cents over 2 events, day-1 window 400
      assert(rows == Set((1L, 300L, 2L), (1L, 400L, 1L), (2L, 800L, 1L)))
    } finally query.stop()
  }

  test("asofEnrichState: lefts enrich from newest at-or-before right state; late lefts degrade to no match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TemporalEvent]
    val query = asofEnrichState(input.toDS())
      .writeStream.format("memory").queryName("asof_state")
      .outputMode("append").start()
    try {
      input.addData(
        TemporalEvent("k", 10L, isRight = true, 1.0),
        TemporalEvent("k", 10L, isRight = false, 100.0), // tie: right visible
        TemporalEvent("k", 5L, isRight = false, 50.0))   // before any right
      query.processAllAvailable()
      input.addData(
        TemporalEvent("k", 30L, isRight = true, 3.0),
        TemporalEvent("k", 40L, isRight = false, 400.0), // matches t=30 state
        TemporalEvent("k", 20L, isRight = false, 200.0)) // in-batch: sorted before the t=30 right → t=10 state
      query.processAllAvailable()
      input.addData(
        TemporalEvent("k", 25L, isRight = false, 250.0)) // late: state is t=30 (future) → no match
      query.processAllAvailable()
      val rows = spark.table("asof_state")
        .as[Enriched].collect().map(e => e.time -> ((e.asofTime, e.asofValue))).toMap
      assert(rows(5L) == ((None, None)))
      assert(rows(10L) == ((Some(10L), Some(1.0))))
      assert(rows(20L) == ((Some(10L), Some(1.0))))
      assert(rows(40L) == ((Some(30L), Some(3.0))))
      assert(rows(25L) == ((None, None)))
    } finally query.stop()
  }

  test("dedupByContentKey: duplicate keys within the watermark collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)] // (ts_us, _key, value)
    val stream = dedupByContentKey(
      input.toDF().toDF("ts_us", "_key", "value"), "_key", "1 hour")
    val query = stream.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData((1000L, "k1", 1.0), (1000L, "k1", 1.0), (2000L, "k2", 2.0))
      query.processAllAvailable()
      input.addData((1000L, "k1", 1.0)) // replayed duplicate (same key+ts)
      query.processAllAvailable()
      val keys = spark.table("dedup").select("_key").as[String].collect().toSeq
      assert(keys.sorted == Seq("k1", "k2"))
    } finally query.stop()
  }

  test("sessionized: native session windows close at the gap; an exact-gap event stays in-session (batch parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)] // (ts_us, user_id, value)
    val sec = 1000000L
    val stream = sessionized(
      input.toDF().toDF("ts_us", "user_id", "value"), 30 * sec, "0 seconds")
    val query = stream.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 0s and 5s (same 30s-gap session); user 2: single
      input.addData((0L, 1L, 1.0), (5 * sec, 1L, 2.0), (10 * sec, 2L, 8.0))
      query.processAllAvailable()
      // 35s is EXACTLY gap after 5s — the batch operator's strict `>` keeps
      // it in-session, and so must the stream (the +1µs widening; without
      // it session_window would cut a new session here)
      input.addData((35 * sec, 1L, 4.0))
      query.processAllAvailable()
      // much-later events advance the watermark → earlier sessions close
      input.addData((2000 * sec, 1L, 0.5), (2000 * sec, 2L, 1.0))
      query.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user_id", "n_events", "session_start", "session_end",
          "duration", "sum_value_c")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(rows == Set(
        (1L, 3L, 0L, 35 * sec, 35 * sec, 700L),
        (2L, 1L, 10 * sec, 10 * sec, 0L, 800L)))
    } finally query.stop()
  }
}
