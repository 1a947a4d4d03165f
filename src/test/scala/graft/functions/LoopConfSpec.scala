package graft.functions

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

/** The r16 conf-leak regression suite: `withLoopConf` must restore the
  * session's loop-conf pair exactly — under sequential nesting, under
  * exceptions, and under every concurrent interleaving. The r16 defect:
  * per-site save/set/restore let thread B snapshot thread A's in-loop
  * `shuffle.partitions=1` as its "previous" and restore it LAST, leaving
  * the shared session serialized for everything after (11 untouched bench
  * queries regressed 1.5–4×; q115 2.8 → 12.5 s, reproduced in the r17
  * attribution A/B).
  */
class LoopConfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val AqeKey = "spark.sql.adaptive.enabled"
  private val PartsKey = "spark.sql.shuffle.partitions"

  private def snapshot(): (String, String) =
    (spark.conf.get(AqeKey), spark.conf.get(PartsKey))

  test("withLoopConf sets the pair inside and restores exactly on exit") {
    val before = snapshot()
    Cols.withLoopConf(spark, 3) {
      assert(spark.conf.get(AqeKey) == "false")
      assert(spark.conf.get(PartsKey) == "3")
    }
    assert(snapshot() == before)
  }

  test("withLoopAqeOff leaves partitions untouched and restores AQE") {
    val before = snapshot()
    Cols.withLoopAqeOff(spark) {
      assert(spark.conf.get(AqeKey) == "false")
      assert(spark.conf.get(PartsKey) == before._2)
    }
    assert(snapshot() == before)
  }

  test("an exception inside the scope still restores") {
    val before = snapshot()
    intercept[RuntimeException] {
      Cols.withLoopConf(spark, 2) { throw new RuntimeException("boom") }
    }
    assert(snapshot() == before)
  }

  test("nested scopes: inner exit re-applies the outer request") {
    val before = snapshot()
    Cols.withLoopConf(spark, 7) {
      Cols.withLoopConf(spark, 3) {
        assert(spark.conf.get(PartsKey) == "3")
      }
      assert(spark.conf.get(PartsKey) == "7",
        "inner exit must hand the conf back to the outer scope")
      Cols.withLoopAqeOff(spark) {
        assert(spark.conf.get(PartsKey) == "7",
          "an AQE-only inner scope must not move partitions")
      }
      assert(spark.conf.get(PartsKey) == "7")
    }
    assert(snapshot() == before)
  }

  test("Conf→AqeOff→Conf nesting: the innermost Conf exit restores the " +
    "NEAREST ENCLOSING Some, not the pre-scope session value (r17 advice)") {
    val before = snapshot()
    Cols.withLoopConf(spark, 7) {
      Cols.withLoopAqeOff(spark) {
        Cols.withLoopConf(spark, 3) {
          assert(spark.conf.get(PartsKey) == "3")
        }
        // pre-fix: the hand-off read only the new innermost entry (the
        // AqeOff's None) and fell back to the SESSION value, silently
        // un-scoping the still-live outer Conf(7)
        assert(spark.conf.get(PartsKey) == "7",
          "exit through an AqeOff layer must restore the enclosing Conf")
      }
      assert(spark.conf.get(PartsKey) == "7")
    }
    assert(snapshot() == before)
  }

  test("the exact r16 interleaving: A enters, B enters, A exits, B exits " +
    "=> original conf restored (per-site save/restore left B's snapshot " +
    "of A's in-loop value)") {
    val before = snapshot()
    val aEntered = new CountDownLatch(1)
    val bDone = new CountDownLatch(1)
    var aFailure: Option[Throwable] = None
    val a = new Thread(() =>
      try Cols.withLoopConf(spark, 1) {
        aEntered.countDown()
        assert(bDone.await(30, java.util.concurrent.TimeUnit.SECONDS),
          "B never finished")
      } catch { case t: Throwable => aFailure = Some(t) })
    a.start()
    assert(aEntered.await(30, java.util.concurrent.TimeUnit.SECONDS))
    Cols.withLoopConf(spark, 8) {
      assert(spark.conf.get(PartsKey) == "8")
    }
    // B has exited while A still holds its scope: the session must NOT
    // have been "restored" out from under A
    assert(spark.conf.get(AqeKey) == "false")
    bDone.countDown()
    a.join(30000)
    assert(!a.isAlive, "thread A wedged")
    aFailure.foreach(throw _)
    assert(snapshot() == before,
      "last scope out must restore the PRE-loop conf, not a peer's value")
  }

  test("stress: 16 concurrent scopes with jittered bodies restore exactly") {
    val before = snapshot()
    for (_ <- 1 to 5) {
      // failures inside foreign threads must FAIL the test, not vanish
      // into a stack trace on stderr
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (0 until 16).map { i =>
        new Thread(() =>
          try Cols.withLoopConf(spark, (i % 7) + 1) {
            assert(spark.conf.get(AqeKey) == "false")
            Thread.sleep((i * 3) % 11L)
          } catch { case t: Throwable => failures.add(t); () })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(30000))
      assert(threads.forall(!_.isAlive))
      if (!failures.isEmpty) throw failures.peek()
      assert(snapshot() == before,
        "conf drifted after a concurrent round — the r16 leak shape")
    }
  }

  test("trainPqCodebooks (concurrent kmeansRefine futures) leaves session " +
    "conf byte-identical — the r16 leak's production entry point") {
    val before = snapshot()
    // 64-dim corpus, PqK=16 seed rows (ids 0..15), 8 extra member rows
    val rows = (0L until 24L).map { i =>
      (i, Seq.tabulate(Similarity.PqDims)(d =>
        (((i * 31 + d * 7) % 13).toFloat - 6f) / 6f))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cb = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding",
      col("vec_id") < Similarity.PqK, iters = 2)
    assert(cb.length == Similarity.PqSub)
    assert(cb.forall(_.length == Similarity.PqK))
    assert(snapshot() == before,
      "trainPqCodebooks leaked loop conf onto the shared session")
  }

  test("loopParts: Long-safe clamp (web-scale row counts must saturate to " +
    "defaultParallelism, not wrap to 1)") {
    val df = Seq(1).toDF("x")
    val par = spark.sparkContext.defaultParallelism
    assert(Cols.loopParts(df, 0L) == 1)
    assert(Cols.loopParts(df, 64000L * par * 10) == par)
    // 2e14 rows: (rows/64000).toInt used to wrap negative => clamp read 1
    assert(Cols.loopParts(df, 200000000000000L) == par)
    assert(Cols.loopParts(df, Long.MaxValue) == par)
  }
}
