package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], qs: Seq[(Long, Seq[String])],
                  k: Int = 5) =
    TermStats.bm25TopK(docs.toDF("doc_id", "text"),
        qs.toDF("q_id", "qt"), "doc_id", "text", "q_id", "qt", k)
      .select($"q", $"doc", $"n_terms", $"score_pm", $"rank")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))

  test("hand-computed corpus: exact integer scores and ranking") {
    // N=3 docs, A=5 tokens; df(a)=2 so idf_pm = 3e6 div 2 = 1500000.
    // d2 (tf=2): (1500000*2*44*5) div (20*5*2 + 6*5 + 18*3*2) = 1952662
    // d1 (tf=1): (1500000*1*44*5) div (20*5*1 + 6*5 + 18*3*2) = 1386554
    val out = run(Seq(1L -> "a b", 2L -> "a a", 3L -> "c"),
      Seq(10L -> Seq("a")))
    assert(out.toSeq === Seq((10L, 2L, 1L, 1952662L, 1L),
      (10L, 1L, 1L, 1386554L, 2L)))
  }

  test("score ties rank by doc id ascending") {
    val out = run(Seq(1L -> "x", 2L -> "c", 3L -> "c"), Seq(10L -> Seq("c")))
    assert(out.map(r => (r._2, r._5)).toSeq === Seq((2L, 1L), (3L, 2L)))
  }

  test("query-term multiplicity is ignored; multi-term scores add") {
    val once = run(Seq(1L -> "a b c", 2L -> "a x y"), Seq(10L -> Seq("a", "b")))
    val twice = run(Seq(1L -> "a b c", 2L -> "a x y"),
      Seq(10L -> Seq("a", "a", "b", "b")))
    assert(once.toSeq === twice.toSeq)
    assert(once.find(_._2 == 1L).get._3 === 2L) // doc 1 matches both terms
    assert(once.find(_._2 == 2L).get._3 === 1L)
  }

  test("k truncates per query and must be positive") {
    val out = run(Seq(1L -> "a", 2L -> "a", 3L -> "a"), Seq(10L -> Seq("a")), k = 2)
    assert(out.length === 2)
    intercept[IllegalArgumentException] {
      TermStats.bm25TopK(Seq((1L, "a")).toDF("doc_id", "text"),
        Seq((1L, Seq("a"))).toDF("q_id", "qt"), "doc_id", "text", "q_id",
        "qt", k = 0)
    }
  }

  test("postings-registry union serves identically to a full rebuild") {
    val docs = Seq(1L -> "a b a", 2L -> "a a", 3L -> "c b", 4L -> "b a c")
    val qs = Seq(10L -> Seq("a", "c"))
    val full = run(docs, qs)
    val served = TermStats.bm25TopKFromPostings(
        TermStats.bm25Postings(
            docs.filter(_._1 % 2 == 0).toDF("doc_id", "text"), "doc_id", "text")
          .unionByName(TermStats.bm25Postings(
            docs.filter(_._1 % 2 == 1).toDF("doc_id", "text"), "doc_id", "text")),
        qs.toDF("q_id", "qt"), "q_id", "qt", k = 5)
      .select($"q", $"doc", $"n_terms", $"score_pm", $"rank")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
    assert(served.toSeq === full.toSeq)
  }

  test("fully-materialized index (postings + stats) serves identically to a rebuild") {
    val docs = Seq(1L -> "a b a", 2L -> "a a", 3L -> "c b", 4L -> "b a c")
    val qs = Seq(10L -> Seq("a", "c"))
    val postings = TermStats.bm25Postings(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val (dfq, dl, corp) = TermStats.bm25Stats(postings)
    val served = TermStats.bm25TopKFromIndex(postings, dfq, dl, corp,
        qs.toDF("q_id", "qt"), "q_id", "qt", k = 5)
      .select($"q", $"doc", $"n_terms", $"score_pm", $"rank")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
    assert(served.toSeq === run(docs, qs).toSeq)
  }

  test("pruned serve with an all-inclusive cap equals exact; all-head queries degrade to exact, never empty") {
    val docs = Seq(1L -> "a b a", 2L -> "a a", 3L -> "c b", 4L -> "b a c",
      5L -> "a b")
    val qs = Seq(10L -> Seq("a", "c"), 11L -> Seq("a"))
    val postings = TermStats.bm25Postings(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val (dfq, dl, corp) = TermStats.bm25Stats(postings)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select($"q", $"doc", $"n_terms", $"score_pm", $"rank")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
    val exact = collect(TermStats.bm25TopKFromIndex(postings, dfq, dl, corp,
      qs.toDF("q_id", "qt"), "q_id", "qt", k = 5))
    // cap 100% of docs: every term is "rare" — must be exact verbatim
    val full = collect(TermStats.bm25TopKPruned(postings, dfq, dl, corp,
      qs.toDF("q_id", "qt"), "q_id", "qt", k = 5, capSharePm = 1000000L))
    assert(full.toSeq === exact.toSeq)
    // q11's only term 'a' has df 4/5 > 40%: NO rare term — the fallback
    // must serve the exact list, not an empty one. q10's 'c' (df 2/5)
    // stays under the cap, so its candidates come from 'c' alone but
    // every candidate is rescored against BOTH terms (exact scores).
    val pruned = collect(TermStats.bm25TopKPruned(postings, dfq, dl, corp,
      qs.toDF("q_id", "qt"), "q_id", "qt", k = 5, capSharePm = 400000L))
    assert(pruned.filter(_._1 == 11L).toSeq === exact.filter(_._1 == 11L).toSeq,
      "an all-head query must degrade to full scoring")
    val prunedQ10 = pruned.filter(_._1 == 10L)
    assert(prunedQ10.forall(r => exact.filter(_._1 == 10L).contains(r)),
      "every pruned row must carry the exact score and relative rank" +
        " is preserved among survivors")
    assert(prunedQ10.map(_._2).toSet === Set(3L, 4L),
      "candidates restricted to docs containing the rare term 'c'")
  }

  test("impact serve with m >= max df equals exact; tiny m keeps exact scores for survivors") {
    val docs = Seq(1L -> "a b a", 2L -> "a a", 3L -> "c b", 4L -> "b a c")
    val qs = Seq(10L -> Seq("a", "b"))
    val postings = TermStats.bm25Postings(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val (dfq, dl, corp) = TermStats.bm25Stats(postings)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select($"q", $"doc", $"n_terms", $"score_pm", $"rank")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
    val exact = collect(TermStats.bm25TopKFromIndex(postings, dfq, dl, corp,
      qs.toDF("q_id", "qt"), "q_id", "qt", k = 5))
    val full = collect(TermStats.bm25TopKImpact(
      TermStats.bm25ImpactIndex(postings, dl, m = 100), postings, dfq, dl,
      corp, qs.toDF("q_id", "qt"), "q_id", "qt", k = 5))
    assert(full.toSeq === exact.toSeq,
      "an untruncated impact index must serve exactly")
    val tiny = collect(TermStats.bm25TopKImpact(
      TermStats.bm25ImpactIndex(postings, dl, m = 1), postings, dfq, dl,
      corp, qs.toDF("q_id", "qt"), "q_id", "qt", k = 5))
    assert(tiny.nonEmpty && tiny.forall(r =>
        exact.exists(e => e._1 == r._1 && e._2 == r._2 &&
          e._3 == r._3 && e._4 == r._4)),
      "every served row must carry the exact score of that (q, doc)")
  }

  test("impact index keeps the top-m by (tf desc, dl asc, doc asc) per term") {
    // term 'a': (d1 tf=2 dl=3), (d2 tf=2 dl=2), (d4 tf=1) — m=2 keeps
    // d2 (shorter doc wins the tf tie) then d1
    val postings = TermStats.bm25Postings(
      Seq(1L -> "a b a", 2L -> "a a", 3L -> "c b", 4L -> "b a c")
        .toDF("doc_id", "text"), "doc_id", "text")
    val dl = postings.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
    val kept = TermStats.bm25ImpactIndex(postings, dl, m = 2)
      .filter($"term" === "a").select($"doc").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
    val kept1 = TermStats.bm25ImpactIndex(postings, dl, m = 1)
      .filter($"term" === "a").select($"doc").as[Long].collect().toSet
    assert(kept1 === Set(2L), "tf tie must break to the shorter doc")
  }

  test("the rank filter plans as a WindowGroupLimit (map-side top-k)") {
    val df = TermStats.bm25TopK(Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text"),
      Seq((1L, Seq("a"))).toDF("q_id", "qt"), "doc_id", "text", "q_id", "qt", 5)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "expected the rank<=k filter to trigger WindowGroupLimit pruning")
  }
}
