package graft.operators

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // sims are given once per unordered pair and mirrored here — the
  // operator contract wants both directions present.
  private def run(cands: Seq[(Long, Long, Long)],
                  sims: Seq[(Long, Long, Long, Long)], k: Int) =
    Similarity.mmrDiversify(cands.toDF("qid", "cid", "rel_pm"),
        (sims ++ sims.map(s => (s._1, s._3, s._2, s._4)))
          .toDF("qid", "a", "b", "sim_pm"), k)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))

  test("diversity demotes the near-duplicate runner-up") {
    // c2 is nearly as relevant as c1 but a near-dup of it; c3 is less
    // relevant but diverse. Plain top-3: c1, c2, c3. MMR: c1, c3, c2.
    val out = run(
      Seq((1L, 1L, 1000000L), (1L, 2L, 990000L), (1L, 3L, 500000L)),
      Seq((1L, 1L, 2L, 980000L), (1L, 1L, 3L, 100000L),
        (1L, 2L, 3L, 100000L)), k = 3)
    assert(out === Seq(
      (1L, 1L, 1L, 1000000L, 0L, 1000000L),
      (1L, 2L, 3L, 500000L, 100000L, 400000L),
      (1L, 3L, 2L, 990000L, 980000L, 10000L)))
  }

  test("maxsim is the max over ALL selected docs, not the last one") {
    // c4 is far from c1 but close to c3 (selected second): its step-3
    // maxsim must read the c3 similarity.
    val out = run(
      Seq((1L, 1L, 1000000L), (1L, 3L, 900000L), (1L, 4L, 800000L)),
      Seq((1L, 1L, 3L, 0L), (1L, 1L, 4L, 50000L), (1L, 3L, 4L, 700000L)),
      k = 3)
    assert(out(2) === (1L, 3L, 4L, 800000L, 700000L, 100000L))
  }

  test("score ties select the smallest cid") {
    val out = run(
      Seq((1L, 5L, 700000L), (1L, 2L, 700000L)),
      Seq((1L, 2L, 5L, 0L)), k = 1)
    assert(out === Seq((1L, 1L, 2L, 700000L, 0L, 700000L)))
  }

  test("k beyond the candidate list emits every candidate once") {
    val out = run(
      Seq((1L, 1L, 900000L), (1L, 2L, 800000L)),
      Seq((1L, 1L, 2L, 10000L)), k = 10)
    assert(out.map(_._3).toSeq === Seq(1L, 2L))
    assert(out.map(_._2).toSeq === Seq(1L, 2L))
  }

  test("queries diversify independently") {
    val out = run(
      Seq((1L, 1L, 900000L), (2L, 7L, 600000L)),
      Seq(), k = 2)
    assert(out === Seq((1L, 1L, 1L, 900000L, 0L, 900000L),
      (2L, 1L, 7L, 600000L, 0L, 600000L)))
  }

  test("a missing candidate pair fails loudly, never scores as 0") {
    val ex = intercept[SparkException] {
      Similarity.mmrDiversify(
        Seq((1L, 1L, 900000L), (1L, 2L, 800000L))
          .toDF("qid", "cid", "rel_pm"),
        Seq.empty[(Long, Long, Long, Long)].toDF("qid", "a", "b", "sim_pm"),
        k = 2).collect()
    }
    assert(ex.getCause.toString.contains("NoSuchElement") ||
      ex.toString.contains("NoSuchElement"))
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] {
      Similarity.mmrDiversify(
        Seq((1L, 1L, 1L)).toDF("qid", "cid", "rel_pm"),
        Seq((1L, 1L, 2L, 0L)).toDF("qid", "a", "b", "sim_pm"), k = 0)
    }
  }
}
