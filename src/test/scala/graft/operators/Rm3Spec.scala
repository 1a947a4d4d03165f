package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Rm3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def expansion(docs: Seq[(Long, String)], qs: Seq[(Long, Seq[String])],
                        m: Int, k: Int = 5) = {
    val docsDf = docs.toDF("doc_id", "text")
    val postings = TermStats.bm25Postings(docsDf, "doc_id", "text")
    val (dfq, _, corp) = TermStats.bm25Stats(postings)
    val base = TermStats.bm25TopKFromPostings(postings,
      qs.toDF("q_id", "qt"), "q_id", "qt", k)
    val orig = qs.toDF("q_id", "qt")
      .select($"q_id".as("q"), explode($"qt").as("term")).distinct()
    TermStats.rm3ExpansionTerms(base, postings, dfq, corp, orig, m)
      .select($"q", $"term", $"fb_tf", $"fb_w", $"erank")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
  }

  test("feedback terms come from retrieved docs; original terms excluded") {
    // query "a" retrieves only doc 1 ("a b b"); its vocabulary is {a, b};
    // a is the original term, so the expansion is exactly [b] with tf 2
    // and fb_w = 2 · (3e6 div 1) (b appears in 1 of 3 docs).
    val out = expansion(Seq(1L -> "a b b", 2L -> "c d", 3L -> "d e"),
      Seq(10L -> Seq("a")), m = 3)
    assert(out.toSeq === Seq((10L, "b", 2L, 6000000L, 1L)))
  }

  test("top-m by idf-tilted feedback mass, term-asc on ties") {
    // query "a" retrieves docs 1+2; tf masses x=3, y=2, z=2 all with
    // df=2 (idf_pm = 1500000) → m=2 keeps x then y (y/z tie broken by
    // term asc).
    val out = expansion(Seq(1L -> "a x x y z", 2L -> "a x y z", 3L -> "q r"),
      Seq(10L -> Seq("a")), m = 2)
    assert(out.toSeq === Seq((10L, "x", 3L, 4500000L, 1L),
      (10L, "y", 2L, 3000000L, 2L)))
  }

  test("the idf tilt demotes a corpus-wide term below a rarer one") {
    // "s" has the bigger feedback tf (3) but appears in EVERY doc
    // (idf_pm = 1e6); "r" appears only in the feedback doc (idf_pm =
    // 4e6): fb_w picks r (8e6) over s (3e6) — raw tf mass would elect
    // the stopword.
    val out = expansion(
      Seq(1L -> "a s s s r r", 2L -> "s c", 3L -> "s d", 4L -> "s e"),
      Seq(10L -> Seq("a")), m = 1)
    assert(out.toSeq === Seq((10L, "r", 2L, 8000000L, 1L)))
  }

  test("expanded rerun retrieves feedback-vocabulary docs pass 1 missed") {
    // pass 1 for "a": only doc 1 matches. Its vocabulary adds b; the
    // expanded query {a, b} now retrieves doc 2 ("b c") too — the RM3
    // story end to end on the same index.
    val docs = Seq(1L -> "a b", 2L -> "b c", 3L -> "c d").toDF("doc_id", "text")
    val postings = TermStats.bm25Postings(docs, "doc_id", "text")
    val qs = Seq(10L -> Seq("a")).toDF("q_id", "qt")
    val base = TermStats.bm25TopKFromPostings(postings, qs, "q_id", "qt", 5)
    assert(base.select($"doc").as[Long].collect().toSet === Set(1L))
    val orig = qs.select($"q_id".as("q"), explode($"qt").as("term")).distinct()
    val (dfq, _, corp) = TermStats.bm25Stats(postings)
    val exp = TermStats.rm3ExpansionTerms(base, postings, dfq, corp,
      orig, m = 3)
    val eqt = orig.unionByName(exp.select($"q", $"term"))
      .groupBy($"q").agg(collect_list($"term").as("qt"))
      .select($"q".as("q_id"), $"qt")
    val rerun = TermStats.bm25TopKFromPostings(postings, eqt, "q_id", "qt", 5)
    assert(rerun.select($"doc").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("m must be positive") {
    intercept[IllegalArgumentException] {
      TermStats.rm3ExpansionTerms(
        Seq((1L, 1L)).toDF("q", "doc"),
        Seq((1L, "a", 1L)).toDF("doc", "term", "tf"),
        Seq(("a", 1L)).toDF("term", "df"),
        Seq((1L, 5L)).toDF("n_docs", "a_tok"),
        Seq((1L, "a")).toDF("q", "term"), m = 0)
    }
  }
}
