package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TermStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a rare"),   // "rare" appears only here
    (2L, "a b b b"),
    (3L, "a c c")
  ).toDF("doc_id", "text")

  test("tfidf: tf counts, corpus df, and integer idf") {
    val rows = TermStats.tfidf(docs, "doc_id", "text")
      .select("doc", "term", "tf", "df", "score")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // "a" in every doc: idf_micro = 3e6 div 3 = 1e6
    assert(rows((1L, "a")) == (1L, "a", 2L, 3L, 2000000L))
    // "rare" df=1: idf_micro = 3e6
    assert(rows((1L, "rare")) == (1L, "rare", 1L, 1L, 3000000L))
    // "b" df=2: idf_micro = 1500000
    assert(rows((2L, "b")) == (2L, "b", 3L, 2L, 4500000L))
  }

  test("lmFluency: hand-computed bigram model, vocab counts ALL tokens") {
    // corpus: d1 = a b a b, d2 = a b c, d3 = z (no bigrams, but z ∈ vocab)
    // bigrams: d1 (a,b)(b,a)(a,b); d2 (a,b)(b,c)
    // c2: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2; V = |{a,b,c,z}| = 4
    // p(a,b) = 1e6·4 div 7 = 571428; p(b,a) = p(b,c) = 1e6·2 div 6 = 333333
    val corpus = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TermStats.lmFluency(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, (571428L + 333333L + 571428L) / 3)))
    assert(out(2L) == ((2L, 2L, (571428L + 333333L) / 2)))
    assert(!out.contains(3L)) // no bigrams → no score row
  }

  test("topTermPerDoc picks max score with term-asc tiebreak") {
    val top = TermStats.topTermPerDoc(docs, "doc_id", "text")
      .select("doc", "term").as[(Long, String)].collect().toMap
    assert(top(1L) == "rare") // 3e6 beats a's 2e6
    assert(top(2L) == "b")    // 4.5e6
    assert(top(3L) == "c")    // tf 2 · idf 3e6 = 6e6 beats a's 1e6
  }

  test("repetitionSignals: token and bigram concentration") {
    val r = TermStats.repetitionSignals(
        Seq((1L, "x x x y")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // 4 tokens, 2 distinct → 500000; top token x: 3/4 → 750000;
    // bigrams: [x x, x x, x y] → top 2/3 → 666667
    assert(r == (1L, 4L, 500000L, 750000L, 666667L))
  }

  test("repetitionSignals: single-token doc reports 0 bigram share") {
    val r = TermStats.repetitionSignals(
        Seq((1L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == (1L, 1L, 1000000L, 1000000L, 0L))
  }

  test("boilerplateFraction flags shingles above the df cap") {
    // "x y z" in all 3 docs (df=3 > maxDf=2); the others are unique.
    val d = Seq(
      (1L, "x y z a b c"), (2L, "x y z d e f"), (3L, "x y z g h i")
    ).toDF("doc_id", "text")
    val r = TermStats.boilerplateFraction(d, "doc_id", "text", k = 3, maxDf = 2)
      .select("doc", "n_shingles", "n_boiler", "boiler_pm")
      .as[(Long, Long, Long, Long)].collect().toSet
    // each doc: 4 distinct shingles, 1 boilerplate → 250000
    assert(r == Set((1L, 4L, 1L, 250000L), (2L, 4L, 1L, 250000L),
      (3L, 4L, 1L, 250000L)))
  }

  test("noveltyFraction: first occurrence wins, later copies score low") {
    val d = Seq(
      (1L, "a b c d"),       // shingles {a b c, b c d} — both first here
      (2L, "a b c d"),       // exact copy → novelty 0
      (3L, "a b c x y z")    // {a b c, b c x, c x y, x y z}: 3 of 4 novel
    ).toDF("doc_id", "text")
    val got = TermStats.noveltyFraction(d, "doc_id", "text", k = 3)
      .select("doc", "n_shingles", "n_novel", "novelty_pm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L, 1000000L), (2L, 2L, 0L, 0L),
      (3L, 4L, 3L, 750000L)))
  }

  test("noveltyAgainst: only incoming docs score, against the existing shingle set") {
    val existing = Seq((10L, "a b c d")).toDF("doc_id", "text") // {a b c, b c d}
    val incoming = Seq(
      (1L, "a b c d"),      // both shingles seen → 0
      (2L, "a b c x y z")   // {a b c seen, b c x, c x y, x y z unseen} → 3/4
    ).toDF("doc_id", "text")
    val got = TermStats.noveltyAgainst(incoming, existing, "doc_id", "text", 3)
      .select("doc", "n_shingles", "n_unseen", "unseen_pm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 0L, 0L), (2L, 4L, 3L, 750000L)))
  }

  test("oovRate: tokens outside the top-N vocabulary, tf-weighted") {
    // corpus tf: a=4, b=3, c=2, z=1 → vocab(2) = {a, b}
    val d = Seq((1L, "a a b z"), (2L, "a a b b c c")).toDF("doc_id", "text")
    val got = TermStats.oovRate(d, "doc_id", "text", vocabSize = 2)
      .select("doc", "n_tokens", "n_oov", "oov_pm")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: 4 tokens, z oov → 250000; doc 2: 6 tokens, c c oov → 333333
    assert(got == Set((1L, 4L, 1L, 250000L), (2L, 6L, 2L, 333333L)))
  }

  test("boilerplateFraction drops docs with no shingles") {
    val d = Seq((1L, "too short"), (2L, "one two three")).toDF("doc_id", "text")
    val got = TermStats.boilerplateFraction(d, "doc_id", "text", 3, 10)
      .select("doc").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("lmFluencyBackoff: each backoff level scores by the Brants rule") {
    // train "a b c a b d": c3(abc,bca,cab,abd)=1 each; c2: ab=2, bc/ca/bd=1;
    // c1: a=2, b=2, c=1, d=1; N=6
    val train = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b c"), // trigram hit:  (1e6·1) div c2(ab)=2 -> 500000
      (2L, "c a b"), // trigram hit:  (1e6·1) div c2(ca)=1 -> 1000000
      (3L, "x b d"), // bigram backoff: (4e5·c2(bd)=1) div c1(b)=2 -> 200000
      (4L, "x y d"), // unigram backoff: (1.6e5·c1(d)=1) div 6 -> 26666
      (5L, "x y z") // OOV -> 0
    ).toDF("doc_id", "text")
    val got = TermStats.lmFluencyBackoff(train, eval, "doc_id", "text")
      .select("doc_id", "n_trigrams", "n_tri_hits", "n_bi_backoffs",
        "n_uni_backoffs", "fluency_pm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 1L, 1L, 0L, 0L, 500000L),
      (2L, 1L, 1L, 0L, 0L, 1000000L),
      (3L, 1L, 0L, 1L, 0L, 200000L),
      (4L, 1L, 0L, 0L, 1L, 26666L),
      (5L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("impactM: floor, exact integer ceiling, calibration points, overflow") {
    assert(TermStats.impactM(0L) == 64)            // empty corpus floors
    assert(TermStats.impactM(40000L) == 64)        // 4x ladder point
    assert(TermStats.impactM(40001L) == 65)        // ceil, not floor-div
    assert(TermStats.impactM(160000L) == 256)      // 16x ladder point
    assert(TermStats.impactM(1000000L) == 1600)
    // Long-safe: a web-scale count must saturate, never wrap — including
    // the additive-ceil overflow shape ((n + slot - 1) wraps negative)
    assert(TermStats.impactM(Long.MaxValue, docsPerSlot = 1L) == Int.MaxValue)
    assert(TermStats.impactM(Long.MaxValue, docsPerSlot = 2L) == Int.MaxValue)
    assert(TermStats.impactM(Long.MaxValue - 1L, docsPerSlot = 3L) == Int.MaxValue)
    assert(TermStats.impactM(10L, docsPerSlot = 1L, mMin = 2) == 10)
    intercept[IllegalArgumentException](TermStats.impactM(-1L))
    intercept[IllegalArgumentException](TermStats.impactM(10L, docsPerSlot = 0L))
    intercept[IllegalArgumentException](TermStats.impactM(10L, mMin = 0))
  }

  test("property: impact-index monotone merge ≡ full truncation for ANY " +
    "append-only split and depth (the q205/streamingImpactIndex theorem)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = for {
      id <- Gen.chooseNum(0L, 120L)
      nTok <- Gen.chooseNum(1, 8)
      toks <- Gen.listOfN(nTok, Gen.chooseNum(0, 6))
    } yield (id, toks.map(t => s"t$t").mkString(" "))
    val prop = Prop.forAll(
      Gen.listOfN(25, docGen), Gen.chooseNum(1, 5)) { (docs0, m) =>
      // one text per doc id (append-only semantics: a doc never re-lands)
      val docs = docs0.distinctBy(_._1)
      val (standing0, batch0) = docs.partition(_._1 % 2 == 0)
      def postDl(rows: Seq[(Long, String)]) = {
        val p = TermStats.bm25Postings(rows.toDF("doc_id", "text"),
          "doc_id", "text")
        (p, p.groupBy(col("doc")).agg(sum(col("tf")).as("dl")))
      }
      val (ps, dls) = postDl(standing0)
      val (pb, dlb) = postDl(batch0)
      val merged = TermStats.impactIndexMerge(
          TermStats.bm25ImpactIndexWithDl(ps, dls, m),
          pb.join(dlb, "doc")
            .select(col("doc"), col("term"), col("tf"), col("dl")), m)
        .as[(Long, String, Long, Long)].collect().toSet
      val (pf, dlf) = postDl(docs)
      val full = TermStats.bm25ImpactIndexWithDl(pf, dlf, m)
        .as[(Long, String, Long, Long)].collect().toSet
      merged == full
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
