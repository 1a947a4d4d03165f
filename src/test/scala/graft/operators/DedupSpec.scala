package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events = Seq(
    // (key, time, tiebreak, payload)
    ("a", 10L, 1L, "a-old"),
    ("a", 20L, 2L, "a-new"),
    ("b", 5L, 3L, "b-only"),
    ("c", 7L, 4L, "c-1"),
    ("c", 7L, 5L, "c-2") // same time: tiebreak decides
  ).toDF("k", "t", "id", "v")

  test("newestWins keeps latest time per key, ties broken by id desc") {
    val out = Dedup.newestWins(events, Seq(col("k")), col("t"), col("id"))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a-new", "b" -> "b-only", "c" -> "c-2"))
  }

  test("firstWins keeps earliest under ascending order") {
    val out = Dedup.firstWins(events, Seq(col("k")), Seq(col("t").asc, col("id").asc))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a-old", "b" -> "b-only", "c" -> "c-1"))
  }

  test("keepFirst is safe when input already has a __rn0 column") {
    val in = events.withColumn("__rn0", lit(99))
    val out = Dedup.keepFirst(in, Seq(col("k")), Seq(col("t").desc, col("id").desc))
    assert(out.columns.contains("__rn0")) // user column preserved
    assert(out.filter(col("__rn0") =!= 99).count() == 0)
    assert(out.count() == 3)
  }

  test("exactByContent collapses identical payloads and counts dups") {
    val docs = Seq((1L, "x", "p"), (2L, "x", "p"), (3L, "y", "p"))
      .toDF("id", "a", "b")
    val out = Dedup.exactByContent(docs, Seq("a", "b"), "id")
      .select("a", "representative", "n_dups").as[(String, Long, Long)]
      .collect().toSet
    assert(out == Set(("x", 1L, 2L), ("y", 3L, 1L)))
  }

  test("property: newestWins is idempotent and order-insensitive (fixes the D4 race)") {
    val rowGen = for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4")
      t <- Gen.chooseNum(0L, 50L)
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (k, t, id)
    val prop = Prop.forAll(Gen.listOfN(40, rowGen)) { rows =>
      val distinct = rows.distinct
      val df = distinct.toDF("k", "t", "id")
      val once = Dedup.newestWins(df, Seq(col("k")), col("t"), col("id"))
      val twice = Dedup.newestWins(once, Seq(col("k")), col("t"), col("id"))
      val shuffled = Dedup.newestWins(
        scala.util.Random.shuffle(distinct).toDF("k", "t", "id"),
        Seq(col("k")), col("t"), col("id"))
      val agg = Dedup.newestWinsAgg(df, Seq(col("k")), col("t"), col("id"))
      val a = once.collect().toSet
      a == twice.collect().toSet && a == shuffled.collect().toSet &&
        a == agg.collect().toSet // window and partial-agg forms agree
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("newestWinsAgg rejects frames with duplicate column names (struct(*) would be ambiguous)") {
    val dup = Seq((1L, 10L)).toDF("k", "t").select(col("k"), col("k"), col("t"))
    assertThrows[IllegalArgumentException](
      Dedup.newestWinsAgg(dup, Seq(col("t")), col("t"), lit(0)))
  }

  test("newestWinsAgg rejects case-colliding column names (Spark resolves case-insensitively)") {
    val dup = Seq((1L, 2L, 10L)).toDF("K", "k", "t")
    assertThrows[IllegalArgumentException](
      Dedup.newestWinsAgg(dup, Seq(col("t")), col("t"), lit(0)))
  }
}
