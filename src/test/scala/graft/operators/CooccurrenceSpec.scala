package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CooccurrenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def proj(edges: Seq[(String, String)], cap: Long = 32) =
    Cooccurrence.project(edges.toDF("l", "r"), "l", "r", cap)
      .as[(String, String, Long)].collect().sortBy(p => (p._1, p._2))

  private def tri(edges: Seq[(String, String)]) =
    Cooccurrence.triangleStats(edges.toDF("u", "v"), "u", "v")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)

  test("projection counts shared left-neighbors, pairs ordered a < b") {
    val out = proj(Seq("c1" -> "s1", "c1" -> "s2", "c2" -> "s1",
      "c2" -> "s2", "c3" -> "s2", "c3" -> "s3"))
    assert(out.toSeq === Seq(("s1", "s2", 2L), ("s2", "s3", 1L)))
  }

  test("hub left nodes are excluded entirely, not truncated") {
    // c9 connects all three suppliers; with cap 2 its pairs vanish and
    // only c1's survive.
    val edges = Seq("c9" -> "s1", "c9" -> "s2", "c9" -> "s3",
      "c1" -> "s1", "c1" -> "s2")
    assert(proj(edges, cap = 2).toSeq === Seq(("s1", "s2", 1L)))
    assert(proj(edges, cap = 3).toSeq ===
      Seq(("s1", "s2", 2L), ("s1", "s3", 1L), ("s2", "s3", 1L)))
  }

  test("duplicate bipartite edges count once; cap must be >= 2") {
    assert(proj(Seq("c1" -> "s1", "c1" -> "s1", "c1" -> "s2")).toSeq ===
      Seq(("s1", "s2", 1L)))
    intercept[IllegalArgumentException] {
      Cooccurrence.project(Seq(("c1", "s1")).toDF("l", "r"), "l", "r", 1)
    }
  }

  private def foldAll(batches: Seq[Seq[(String, String)]], cap: Long) =
    batches.tail.foldLeft(
        Cooccurrence.project(batches.head.toDF("l", "r"), "l", "r", cap)) {
        (reg, b) =>
      Cooccurrence.projectFold(reg, b.toDF("l", "r"), "l", "r", cap)
    }.as[(String, String, Long)].collect().sortBy(p => (p._1, p._2)).toSeq

  test("entity-complete batch folds rebuild the projection exactly") {
    val edges = Seq("c1" -> "s1", "c1" -> "s2", "c2" -> "s1", "c2" -> "s2",
      "c3" -> "s2", "c3" -> "s3", "c4" -> "s1", "c4" -> "s3")
    val full = proj(edges).toSeq
    // any entity-complete partition folds to the same registry
    assert(foldAll(Seq(edges.filter(_._1 == "c1"),
      edges.filterNot(_._1 == "c1")), cap = 32) === full)
    assert(foldAll(edges.groupBy(_._1).values.toSeq.sortBy(_.head._1),
      cap = 32) === full)
  }

  test("the hub cap holds across folds for entity-complete batches") {
    // c9 (degree 3 > cap 2) is excluded whether it arrives alone or with
    // company — per-entity semantics survive the fold.
    val edges = Seq("c9" -> "s1", "c9" -> "s2", "c9" -> "s3",
      "c1" -> "s1", "c1" -> "s2")
    assert(foldAll(Seq(edges.filter(_._1 == "c9"),
      edges.filter(_._1 == "c1")), cap = 2) === Seq(("s1", "s2", 1L)))
  }

  test("splitting an entity across batches VIOLATES the contract, visibly") {
    // c1's three edges split 2/1: the cross-batch pair (s1,s3)/(s2,s3)
    // never forms and the cap sees partial degrees — the fold does NOT
    // repair this, by documented design (left-entity-complete batches).
    val edges = Seq("c1" -> "s1", "c1" -> "s2", "c1" -> "s3")
    val full = proj(edges).toSeq
    val split = foldAll(Seq(edges.take(2), edges.drop(2)), cap = 32)
    assert(full !== split)
    assert(split === Seq(("s1", "s2", 1L))) // only the same-batch pair
  }

  test("jaccardProject: margins counted over the SAME kept edges as the pairs") {
    // s1 neighbors {c1, c2}, s2 {c1, c2, c3}: shared 2, union 3 →
    // jacc_pm = 2e6 div 3 = 666666. s3 {c3}: shares c3 with s2 → 1e6/3.
    val out = Cooccurrence.jaccardProject(
      Seq("c1" -> "s1", "c1" -> "s2", "c2" -> "s1", "c2" -> "s2",
        "c3" -> "s2", "c3" -> "s3").toDF("l", "r"), "l", "r", 32)
      .as[(String, String, Long, Long)].collect().sortBy(p => (p._1, p._2))
    assert(out.toSeq === Seq(("s1", "s2", 2L, 666666L),
      ("s2", "s3", 1L, 333333L)))
  }

  test("jaccardProject: a hub-excluded neighbor leaves numerator AND denominator") {
    // c9 (deg 3 > cap 2) vanishes: s1/s2 margins drop to 1 (just c1),
    // so jacc stays a true set ratio over the kept universe — 1/1.
    val out = Cooccurrence.jaccardProject(
      Seq("c9" -> "s1", "c9" -> "s2", "c9" -> "s3",
        "c1" -> "s1", "c1" -> "s2").toDF("l", "r"), "l", "r", 2)
      .as[(String, String, Long, Long)].collect()
    assert(out.toSeq === Seq(("s1", "s2", 1L, 1000000L)))
  }

  private def assoc(docs: Seq[(Long, String)], window: Int, minC: Long = 1) = {
    val df = docs.toDF("doc_id", "text")
    Cooccurrence.associationScores(
        Cooccurrence.termPairCounts(df, "text", window),
        Cooccurrence.termOccurrences(df, "text"), minC)
      .as[(String, String, Long, Long)].collect().sortBy(p => (p._1, p._2))
  }

  test("termPairCounts: forward window, canonical pairs, self-pairs dropped") {
    // "x y z y": window 2 pairs = (x,y),(x,z),(y,z),(y,y)→drop,(y,z) →
    // c(x,y)=1, c(x,z)=1, c(y,z)=2. n_tok=4, c_x=1, c_y=2, c_z=1.
    val out = assoc(Seq(1L -> "x y z y"), window = 2)
    assert(out.toSeq === Seq(
      ("x", "y", 1L, 1000000L * 1 * 4 / (1 * 2)),
      ("x", "z", 1L, 1000000L * 1 * 4 / (1 * 1)),
      ("y", "z", 2L, 1000000L * 2 * 4 / (2 * 1))))
  }

  test("windows never cross documents; minPairCount gates before scoring") {
    // the (a,b) pair appears once per doc — two docs, c_ab=2; the pair
    // (b,a') across the doc boundary never forms.
    val docs = Seq(1L -> "a b", 2L -> "a b")
    assert(assoc(docs, window = 5).map(r => (r._1, r._2, r._3)).toSeq ===
      Seq(("a", "b", 2L)))
    assert(assoc(docs, window = 5, minC = 3).isEmpty)
  }

  test("association counts fold exactly over ANY doc partition") {
    val docs = Seq(1L -> "a b c a", 2L -> "b c d", 3L -> "a d a b")
    val full = assoc(docs, window = 3).toSeq
    // fold per-doc batches in arbitrary grouping
    def counts(b: Seq[(Long, String)]) = {
      val df = b.toDF("doc_id", "text")
      (Cooccurrence.termPairCounts(df, "text", 3),
        Cooccurrence.termOccurrences(df, "text"))
    }
    val (p0, t0) = counts(Seq(docs(1)))
    val (p1, t1) = counts(Seq(docs(0), docs(2)))
    val folded = Cooccurrence.associationScores(
        Cooccurrence.countsFold(p0, p1, Seq("a", "b"), "c_ab"),
        Cooccurrence.countsFold(t0, t1, Seq("w"), "c_w"), 1)
      .as[(String, String, Long, Long)].collect().sortBy(p => (p._1, p._2))
    assert(folded.toSeq === full)
  }

  private def lp(edges: Seq[(String, String)], cap: Long = 64) =
    Cooccurrence.linkPrediction(edges.toDF("s", "d"), "s", "d", cap)
      .as[(String, String, Long, Long)].collect().sortBy(p => (p._1, p._2))

  test("linkPrediction: distance-2 pairs scored by summed 1e6/deg(mid)") {
    // path a-b-c: only candidate (a,c) via b (deg 2) → cn 1, ra 500000.
    assert(lp(Seq("a" -> "b", "b" -> "c")).toSeq ===
      Seq(("a", "c", 1L, 500000L)))
    // square a-b-c-d: (a,c) via b and d → cn 2, ra 1e6; same for (b,d).
    assert(lp(Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")).toSeq ===
      Seq(("a", "c", 2L, 1000000L), ("b", "d", 2L, 1000000L)))
  }

  test("linkPrediction: existing edges are excluded; the mid cap drops hub paths") {
    // triangle a-b-c plus pendant c-d: (a,d)/(b,d) via c survive; the
    // adjacent pairs never appear even though they share mids.
    val tri = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
    assert(lp(tri).toSeq ===
      Seq(("a", "d", 1L, 333333L), ("b", "d", 1L, 333333L)))
    // cap 2 excludes mid c (deg 3): no candidates remain.
    assert(lp(tri, cap = 2).isEmpty)
  }

  test("triangle + pendant: exact counts and integer lcc") {
    val out = tri(Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d"))
    // a,b: deg 2, 1 triangle, lcc = 2·1·1e6 div 2 = 1e6
    // c: deg 3, 1 triangle, lcc = 2e6 div 6 = 333333; d: deg 1 → 0
    assert(out.toSeq === Seq(("a", 2L, 1L, 1000000L), ("b", 2L, 1L, 1000000L),
      ("c", 3L, 1L, 333333L), ("d", 1L, 0L, 0L)))
  }

  test("a square has no triangles; every node still reports") {
    val out = tri(Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a"))
    assert(out.length === 4)
    assert(out.forall(r => r._3 === 0L && r._4 === 0L))
  }

  test("two triangles sharing an edge: shared nodes count both") {
    val out = tri(Seq("a" -> "b", "b" -> "c", "c" -> "a",
      "b" -> "d", "c" -> "d"))
    val m = out.map(r => r._1 -> r._3).toMap
    assert(m === Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("direction, duplicates, and self-loops do not change counts") {
    val clean = tri(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    val noisy = tri(Seq("b" -> "a", "a" -> "b", "b" -> "c", "c" -> "a",
      "a" -> "a"))
    assert(clean.toSeq === noisy.toSeq)
  }

  test("4-clique: every node in 3 triangles, lcc exactly 1e6") {
    val edges = for {
      Seq(x, y) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (x, y)
    val out = tri(edges)
    assert(out.forall(r => r._2 === 3L && r._3 === 3L && r._4 === 1000000L))
  }
}
