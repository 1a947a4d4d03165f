package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WalksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def walks(edges: Seq[(String, String)], wpn: Int = 1,
                    length: Int = 3, seed: Int = 7) =
    Walks.randomWalks(edges.toDF("s", "d"), "s", "d", wpn, length, seed)
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))

  test("deg-1 chain: walks bounce deterministically, every index forced") {
    // single edge a-b: each step has exactly one neighbor, so the corpus
    // is fully forced: a#0 = a,b,a,b and b#0 = b,a,b,a.
    val out = walks(Seq("a" -> "b"))
    assert(out.toSeq === Seq(
      ("a#0", 0L, "a"), ("a#0", 1L, "b"), ("a#0", 2L, "a"), ("a#0", 3L, "b"),
      ("b#0", 0L, "b"), ("b#0", 1L, "a"), ("b#0", 2L, "b"), ("b#0", 3L, "a")))
  }

  test("every step follows an edge; walk count and length are exact") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
    val out = walks(edges, wpn = 2, length = 5)
    val sym = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }.toSet
    assert(out.length === 4 * 2 * 6) // 4 nodes x 2 walks x (length+1)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { w =>
        assert(sym.contains(w(0) -> w(1)), s"step ${w(0)}->${w(1)} is not an edge")
      }
    }
  }

  test("the corpus is a pure function of (graph, seed); seeds diverge") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    assert(walks(edges, seed = 7).toSeq === walks(edges, seed = 7).toSeq)
    // on the 4-cycle every node has degree 2, so an 8-walk x 3-step
    // corpus has 24 binary choices; seeds 7 and 8 diverging somewhere is
    // a fixed deterministic fact, pinned here.
    assert(walks(edges, seed = 7).toSeq !== walks(edges, seed = 8).toSeq)
  }

  test("self-loops and duplicate edges are dropped; isolated starts excluded") {
    // a-a self loop contributes nothing; only a-b remains, so the walk
    // set is exactly the deg-1 chain corpus.
    val out = walks(Seq("a" -> "a", "a" -> "b", "b" -> "a"))
    assert(out.map(_._1).distinct.toSeq.sorted === Seq("a#0", "b#0"))
    assert(out.length === 8)
  }

  private def wl(edges: Seq[(String, String)], k: Int) =
    Walks.wlLabels(edges.toDF("s", "d"), "s", "d", k)
      .as[(String, Long, String)].collect().sortBy(_._1)

  test("WL labels: structurally equivalent nodes share labels, others split") {
    // path a-b-c-d-e: after 2 rounds {a,e} (ends), {b,d} (next-to-ends),
    // and {c} are the orbit classes — exactly 3 distinct labels, with the
    // symmetric pairs matching.
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val out = wl(path, 2)
    val m = out.map(r => r._1 -> r._3).toMap
    assert(m("a") === m("e") && m("b") === m("d"))
    assert(Set(m("a"), m("b"), m("c")).size === 3)
  }

  test("WL labels: round 1 separates same-degree nodes with different neighborhoods") {
    // star center + triangle: all of b,c,d have deg 2 in this graph, but
    // b,c (triangle members adjacent to each other) differ from d after
    // one round only via their neighbors' degrees.
    val g = Seq("a" -> "b", "a" -> "c", "b" -> "c", "a" -> "d", "d" -> "e")
    val out = wl(g, 1).map(r => r._1 -> r._3).toMap
    assert(out("b") === out("c"))
    assert(out("b") !== out("d"), "deg-2 nodes with different contexts must split")
  }

  test("WL labels: refinement is deterministic and direction-insensitive") {
    val g = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
    assert(wl(g, 3).toSeq === wl(g.map(_.swap), 3).toSeq)
  }

  test("wlKernel: dot product of label-count vectors; df cap drops ubiquitous labels") {
    val labels = Seq(("n1", "x"), ("n2", "x"), ("n3", "y"),
      ("n4", "x"), ("n5", "y"), ("n6", "z")).toDF("node", "wl")
    val groups = Seq(("n1", 1), ("n2", 1), ("n3", 1),
      ("n4", 2), ("n5", 2), ("n6", 2)).toDF("node", "g")
    // g1: {x:2, y:1}; g2: {x:1, y:1, z:1} → K(1,2) = 2·1 + 1·1 = 3,
    // K(1,1) = 4+1 = 5, K(2,2) = 1+1+1 = 3.
    val out = Walks.wlKernel(labels, "node", "wl", groups, "node", "g", 20)
      .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq((1, 1, 5L), (1, 2, 3L), (2, 2, 3L)))
    // add a third group carrying x: x's df rises to 3, so cap 2 drops it
    // as a structure-stopword — kernels keep only y/z mass.
    val groups3 = groups.unionByName(Seq(("n7", 3)).toDF("node", "g"))
    val labels3 = labels.unionByName(Seq(("n7", "x")).toDF("node", "wl"))
    val capped = Walks.wlKernel(labels3, "node", "wl", groups3, "node", "g", 2)
      .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // g1 {y:1}, g2 {y:1, z:1}, g3 {} → (1,1,1), (1,2,1), (2,2,2); g3
    // has no kept labels, so it contributes no rows at all.
    assert(capped.toSeq === Seq((1, 1, 1L), (1, 2, 1L), (2, 2, 2L)))
  }

  test("walkDocs reassembles sentences in step order") {
    val docs = Walks.walkDocs(
        Seq(("w1", 1L, "b"), ("w1", 0L, "a"), ("w1", 2L, "c"),
          ("w2", 0L, "x")).toDF("walk", "step", "node"))
      .as[(String, String)].collect().sortBy(_._1)
    assert(docs.toSeq === Seq(("w1", "a b c"), ("w2", "x")))
  }
}
