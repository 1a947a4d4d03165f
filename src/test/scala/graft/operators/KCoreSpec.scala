package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], k: Int,
                  maxRounds: Int = 24) =
    KCore.kCore(edges.toDF("src", "dst"), "src", "dst", k, maxRounds)
      .as[(String, Long)].collect().sortBy(_._1)

  test("pendant tail peels away; the triangle is the 2-core") {
    val out = run(Seq("t1" -> "t2", "t2" -> "t3", "t3" -> "t1",
      "t3" -> "p"), k = 2)
    assert(out.toSeq === Seq("t1" -> 2L, "t2" -> 2L, "t3" -> 2L))
  }

  test("a chain has an empty 2-core") {
    assert(run(Seq("a" -> "b", "b" -> "c", "c" -> "d"), k = 2).isEmpty)
  }

  test("cascading peel: removing the tail lowers its anchor below k") {
    // square with a 2-edge tail: d-e-f. e has degree 2 UNTIL f peels;
    // a one-pass degree filter would wrongly keep e.
    val out = run(Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a",
      "d" -> "e", "e" -> "f"), k = 2)
    assert(out.map(_._1).toSeq === Seq("a", "b", "c", "d"))
    assert(out.forall(_._2 === 2L))
  }

  test("self-loops never count toward degree") {
    val out = run(Seq("a" -> "a", "a" -> "b"), k = 2)
    assert(out.isEmpty)
  }

  test("duplicate and reverse edges collapse to one undirected edge") {
    val once = run(Seq("t1" -> "t2", "t2" -> "t3", "t3" -> "t1"), k = 2)
    val noisy = run(Seq("t1" -> "t2", "t2" -> "t1", "t1" -> "t2",
      "t2" -> "t3", "t3" -> "t1"), k = 2)
    assert(once.toSeq === noisy.toSeq)
    // and the duplicates cannot fake a 3-core
    assert(run(Seq("t1" -> "t2", "t2" -> "t1", "t1" -> "t2",
      "t2" -> "t3", "t3" -> "t1"), k = 3).isEmpty)
  }

  test("k=3 keeps the 4-clique and drops the triangle") {
    val clique = for {
      Seq(x, y) <- Seq("q1", "q2", "q3", "q4").combinations(2).toSeq
    } yield (x, y)
    val out = run(clique ++ Seq("t1" -> "t2", "t2" -> "t3", "t3" -> "t1"),
      k = 3)
    assert(out.toSeq === Seq("q1" -> 3L, "q2" -> 3L, "q3" -> 3L, "q4" -> 3L))
  }

  test("non-convergence within maxRounds fails loudly (never half-peeled)") {
    // the path peels ONE node per round toward the triangle anchor
    val edges = Seq("p1" -> "p2", "p2" -> "p3", "p3" -> "p4", "p4" -> "t1",
      "t1" -> "t2", "t2" -> "t3", "t3" -> "t1")
    val ok = run(edges, k = 2) // default bound: converges to the triangle
    assert(ok.map(_._1).toSeq === Seq("t1", "t2", "t3"))
    intercept[IllegalArgumentException] { run(edges, k = 2, maxRounds = 2) }
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] { run(Seq("a" -> "b"), k = 0) }
    intercept[IllegalArgumentException] {
      run(Seq("a" -> "b"), k = 1, maxRounds = 0)
    }
  }

  test("loop restores the session AQE setting") {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    run(Seq("t1" -> "t2", "t2" -> "t3", "t3" -> "t1"), k = 2)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === before)
  }
}
