package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600L // "1h" in plain units

  // (event_id, user, ts, type)
  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "user_id", "ts", "event_type")

  private def run3(df: org.apache.spark.sql.DataFrame) =
    Funnel.funnelN(df, "user_id", "ts", "event_id",
      steps = Seq(col("event_type") === "a", col("event_type") === "b",
        col("event_type") === "c"),
      windows = Seq(10 * H, H))

  test("full chain resolves each hop to the latest in-window prior step") {
    val out = run3(ev(
      (1L, 1L, 0L, "a"), (2L, 1L, H, "a"),      // two a's: latest wins
      (3L, 1L, 2 * H, "b"),
      (4L, 1L, 2 * H + 100, "c")))
      .select("step3_id", "step1_id", "step2_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq((4L, Some(2L), Some(3L))))
  }

  test("atomic carry: a step keeps its OWN upstream chain, no reach-back") {
    // b@5H has no in-window a (a@0 is 5H old > 10H? no — make it out of
    // window: a at -11H). An OLDER b@2H has a valid a. c matches b@5H
    // (nearest) and must see step1 = null, NOT the older b's a.
    val out = run3(ev(
      (1L, 1L, 0L, "a"),
      (2L, 1L, 2 * H, "b"),          // has a (2H ≤ 10H)
      (3L, 1L, 13 * H, "b"),         // a is 13H old > 10H → chain broken
      (4L, 1L, 13 * H + 10, "c")))   // matches b=3 within 1h
      .select("step3_id", "step2_id", "step1_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq((4L, Some(3L), None)))
  }

  test("per-hop windows gate independently; unmatched finals still emit") {
    val out = run3(ev(
      (1L, 2L, 0L, "b"),              // b with no a at all
      (2L, 2L, H / 2, "c"),           // in window of b → step2 set, step1 null
      (3L, 3L, 0L, "c")))             // lone c → both null
      .select("step3_id", "step2_id", "step1_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(out == Set((2L, Some(1L), None), (3L, None, None)))
  }

  test("funnelN(3 steps) ≡ the hand-chained two-as-of form on random data (q119 re-expression)") {
    val rnd = new Random(42)
    val rows = (1L to 400L).map { i =>
      (i, (i % 7) + 1, rnd.nextInt(100000).toLong,
        Seq("a", "b", "c", "x")(rnd.nextInt(4)))
    }
    val df = ev(rows: _*)
    val viaFold = run3(df)
      .select("user_id", "ts", "step3_id", "step2_id", "step1_id")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    // the pre-q122 hand-chained form, verbatim
    val as = df.filter(col("event_type") === "a")
      .select(col("user_id"), col("ts"), col("event_id").as("v_id"))
    val bs = df.filter(col("event_type") === "b")
      .select(col("user_id"), col("ts"), col("event_id").as("c_id"))
    val cs = df.filter(col("event_type") === "c")
      .select(col("event_id"), col("user_id"), col("ts"))
    val bE = AsOf.backward(bs, as, Seq("user_id"), "ts", tiebreak = "v_id",
      carry = Seq("v_id"), prefix = "s1_", maxAge = Some(10 * H))
    val viaHand = AsOf.backward(cs,
        bE.select(col("user_id"), col("ts"), col("c_id"), col("s1_v_id")),
        Seq("user_id"), "ts", tiebreak = "c_id",
        carry = Seq("c_id", "s1_v_id"), prefix = "m_", maxAge = Some(H))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("m_c_id"), col("m_s1_v_id"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5)).toSet
    assert(viaFold == viaHand)
    assert(viaFold.nonEmpty)
  }

  test("4-step fold: a purchase chain straddling all hops") {
    val out = Funnel.funnelN(ev(
        (1L, 9L, 0L, "s"), (2L, 9L, H, "a"), (3L, 9L, 2 * H, "b"),
        (4L, 9L, 2 * H + 60, "c"),
        (5L, 8L, 0L, "a"), (6L, 8L, H, "b"), (7L, 8L, H + 30, "c")),
        "user_id", "ts", "event_id",
        steps = Seq(col("event_type") === "s", col("event_type") === "a",
          col("event_type") === "b", col("event_type") === "c"),
        windows = Seq(24 * H, 10 * H, H))
      .select("user_id", "step4_id", "step3_id", "step2_id", "step1_id")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    assert(out == Set(
      (9L, 4L, Some(3L), Some(2L), Some(1L)),   // full chain
      (8L, 7L, Some(6L), Some(5L), None)))      // no signup → step1 null
  }

  test("argument validation") {
    val df = ev((1L, 1L, 0L, "a"))
    intercept[IllegalArgumentException] {
      Funnel.funnelN(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnelN(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b"),
        Seq(1L, 2L))
    }
    // a non-integral id must be rejected by type, not silently cast to
    // null inside the hop tiebreak (the as-of compares it as a long)
    val strId = df.withColumn("event_id", col("event_id").cast("string"))
    val e = intercept[IllegalArgumentException] {
      Funnel.funnelN(strId, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b"), Seq(1L))
    }
    assert(e.getMessage.contains("integral"))
  }
}
