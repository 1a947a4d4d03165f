package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  ).toDF("doc_id", "text")

  test("ngramJaccardPairs: exact dup scores 1.0, disjoint docs pair never appears") {
    val pairs = TextDedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0L)
      .select("doc_a", "doc_b", "jac_pm").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 4L)) == 1000000L)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((3L, 4L)))
    assert(pairs((1L, 2L)) > 500000L && pairs((1L, 2L)) < 1000000L)
  }

  test("minhash: exact dups share full signatures; LSH surfaces them as candidates") {
    val sigs = TextDedup.minhashSignatures(corpus, "doc_id", "text", 3, 16)
    val byDoc = sigs.as[(Long, Seq[Long])].collect().toMap
    assert(byDoc(1L) == byDoc(4L)) // identical content → identical signature
    assert(byDoc.values.forall(_.length == 16))
    val cands = TextDedup.lshCandidatePairs(sigs, 16, 4)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(cands((1L, 4L)) == 16L) // all components agree
    assert(!cands.contains((1L, 3L))) // dissimilar docs never band-collide here
  }

  test("spanDedup: global first-wins by (doc, pos), rebuild, zero-survivor row kept") {
    // k=2 blocks: doc 1 = ["a b","c d","e f"], doc 2 = ["c d","a b","x"],
    // doc 3 = ["a b","c d","e f"] (full dup of 1).
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "c d a b x"),
      (3L, "a b c d e f")
    ).toDF("doc_id", "text")
    val out = TextDedup.spanDedup(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 3L, "a b c d e f"))) // first occurrences all win
    // doc 2: "c d" and "a b" already seen in doc 1; only the short tail "x"
    // survives, in original position order.
    assert(out(2L) == ((2L, 3L, 1L, "x")))
    // doc 3 loses every block but keeps its row.
    assert(out(3L) == ((3L, 3L, 0L, "")))
  }

  test("spanDedup: within-doc repeats collapse to the earliest position") {
    val docs = Seq((7L, "p q p q p")).toDF("doc_id", "text")
    // k=2 → blocks ["p q","p q","p"]: second "p q" is removed, tail "p" stays.
    val out = TextDedup.spanDedup(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, Long, String)].collect()
    assert(out.toSeq == Seq((7L, 3L, 2L, "p q p")))
  }

  test("spanDedupAgainst chains: batch-vs-registry ≡ the batch's slice of a global dedup") {
    // A = low ids (existing corpus), B = high ids (incoming). Global
    // first-wins orders every A occurrence before any B occurrence, so
    // dedup(A∪B) restricted to B must equal B deduped against A's
    // distinct block registry — the contract that lets batches chain.
    val a = Seq((1L, "a b c d e f"), (2L, "c d a b x")).toDF("doc_id", "text")
    val b = Seq((10L, "a b q r c d"), (11L, "q r s")).toDF("doc_id", "text")
    val registry = a.select(explode(graft.functions.Text.blocks(
      graft.functions.Text.tokens(col("text")), 2)).as("blk")).distinct()
    val incremental = TextDedup.spanDedupAgainst(b, registry, "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val global = TextDedup.spanDedup(a.unionByName(b), "doc_id", "text", 2)
      .filter(col("doc_id") >= 10L)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(incremental == global)
    // spot-check: doc 10's "a b" and "c d" are registry hits; "q r"
    // survives (its global first occurrence is in the batch).
    assert(incremental.head == ((10L, 3L, 1L, "q r")))
  }

  test("df-cap drops hot shingles from the inverted index") {
    // every doc shares the hot shingle "x y z"; with maxDf=2 it is dropped
    val docs = Seq((1L, "x y z a b c"), (2L, "x y z d e f"), (3L, "x y z g h i"))
      .toDF("doc_id", "text")
    val without = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0L)
      .count()
    val withCap = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0L, maxDf = 2L)
      .count()
    assert(without == 3L) // all pairs share "x y z"
    assert(withCap == 0L) // hot shingle capped → no candidates
  }

  test("property: planted exact dups always surface as full-agreement LSH candidates") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docGen = Gen.listOfN(8, word).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      // plant an exact dup of every doc: ids i and i+100
      val rows = texts.zipWithIndex.flatMap { case (t, i) =>
        Seq((i.toLong, t), (i + 100L, t))
      }
      val sigs = TextDedup.minhashSignatures(rows.toDF("doc_id", "text"),
        "doc_id", "text", 3, 16)
      val cands = TextDedup.lshCandidatePairs(sigs, 16, 4)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      texts.indices.forall { i =>
        cands.get((i.toLong, i + 100L)).contains(16L)
      }
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(10))
    assert(res.passed, res.status.toString)
  }

  test("dupClusters: multi-hop components get the min-id label and right sizes") {
    // path 1-2-3 (needs 2 propagation hops) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val expected = Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L))
    val fast = TextDedup.dupClusters(pairs, "doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().toSet
    assert(fast == expected)
    // force the distributed iterative path; must agree exactly
    val iterative = TextDedup.dupClusters(pairs, "doc_a", "doc_b",
        localThreshold = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(iterative == expected)
  }

  test("property: union-find fast path and iterative propagation agree on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val prop = Prop.forAll(Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)))) { rawPairs =>
      val pairs = rawPairs.filter { case (a, b) => a != b }
      pairs.nonEmpty ==> {
        val df = pairs.toDF("doc_a", "doc_b")
        val fast = TextDedup.dupClusters(df, "doc_a", "doc_b")
          .as[(Long, Long, Long)].collect().toSet
        val iterative = TextDedup.dupClusters(df, "doc_a", "doc_b",
            localThreshold = 0L)
          .as[(Long, Long, Long)].collect().toSet
        fast == iterative
      }
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(10))
    assert(res.passed, res.status.toString)
  }

  test("iterative path with pointer jumping converges on a high-diameter chain within default maxIter") {
    // A 200-node path has diameter 200: plain min-label propagation would
    // need 200 rounds and throw at maxIter=20; path doubling converges in
    // O(log 200) ≈ 8 — the default bound must now suffice.
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = TextDedup.dupClusters(chain, "doc_a", "doc_b",
        localThreshold = 0L)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 200)
    assert(out.forall { case (_, c, s) => c == 0L && s == 200L })
  }

  test("2k-node chain: union-find and pointer-jump paths agree label-for-label") {
    // the ccdiam probe verifies ROW COUNTS at 320k; this pins exact label
    // equality at a size where the iterative path needs ~11 jump rounds
    val chain = spark.range(1999L)
      .select(col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
    val fast = TextDedup.dupClusters(chain, "doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().toSet
    val iter = TextDedup.dupClusters(chain, "doc_a", "doc_b",
        localThreshold = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(fast == iter)
    assert(fast.size == 2000 && fast.forall { case (_, c, s) => c == 0L && s == 2000L })
  }

  test("lshCandidatePairs maxBucket drops hot-band buckets, keeps organic near-dup pairs") {
    // 30 identical boilerplate docs (ids 100-129) + the corpus's organic
    // dup pair (1, 4). Uncapped: the boilerplate cluster emits 435 pairs.
    // Capped at 8: every boilerplate band bucket holds 30 > 8 docs and is
    // dropped; (1, 4) sits in small buckets and must survive untouched.
    val boiler = (100L until 130L)
      .map(i => (i, "all rights reserved terms of use apply"))
      .toDF("doc_id", "text")
    val docs = corpus.union(boiler)
    val sigs = TextDedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
    val uncapped = TextDedup.lshCandidatePairs(sigs, 16, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped.count { case (a, b, _) => a >= 100L && b >= 100L } == 435)
    val capped = TextDedup.lshCandidatePairs(sigs, 16, 4, maxBucket = 8L)
      .as[(Long, Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b, _) => a >= 100L && b >= 100L })
    assert(capped.exists { case (a, b, n) => Set(a, b) == Set(1L, 4L) && n == 16L })
    assert(capped == uncapped.filterNot { case (a, b, _) => a >= 100L && b >= 100L })
  }

  test("lshCandidatePairsAgainst: cross-corpus pairs only, equal to the filtered self-join") {
    val docs = corpus.union(Seq(
      (5L, "the quick brown fox jumps over the lazy dog"), // dup of 1 and 4
      (6L, "completely different words entirely here now") // dup of 3
    ).toDF("doc_id", "text"))
    val sigs = TextDedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
    // incoming = odd ids, existing = even ids
    val cross = TextDedup.lshCandidatePairsAgainst(
        sigs.filter($"doc" % 2 === 1), sigs.filter($"doc" % 2 === 0), 16, 4)
      .as[(Long, Long, Long)].collect().toSet
    val self = TextDedup.lshCandidatePairs(sigs, 16, 4)
      .as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => a % 2 != b % 2 }.toSet
    assert(cross == self)
    assert(cross.exists { case (a, b, n) => Set(a, b) == Set(4L, 5L) && n == 16L })
    // never an existing×existing pair
    assert(cross.forall { case (a, b, _) => a % 2 != b % 2 })
  }

  test("hammingPairs maxBucket drops identical-fingerprint clusters, keeps near pairs") {
    // 20 identical fingerprints (ids 100-119) + one near pair (1, 2).
    val sigs = ((100L until 120L).map(i => (i, 0x0ABCDEF012L)) ++
      Seq((1L, 0x1111111111L), (2L, 0x1111111113L)))
      .toDF("doc", "dhash")
    val uncapped = TextDedup.hammingPairs(sigs, "doc", "dhash", 56, 2, 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped.count { case (a, b, _) => a >= 100L && b >= 100L } == 190)
    val capped = TextDedup.hammingPairs(sigs, "doc", "dhash", 56, 2, 8,
        maxBucket = 8L)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 1L)))
  }

  test("hammingPairsAgainst: incoming×existing only, equal to the filtered self-join") {
    // 64-bit-ish fingerprints in the 56-bit domain: clusters at distance
    // 0/1/2 plus far-away outliers.
    val sigs = Seq(
      (1L, 0x00FFAA5500L), (2L, 0x00FFAA5501L), // d=1
      (3L, 0x00FFAA5500L),                      // d=0 vs 1
      (4L, 0x123456789AL), (5L, 0x123456789AL ^ 3L), // d=2
      (6L, 0x0F0F0F0F0FL)                       // far from all
    ).toDF("doc", "dhash")
    val incoming = sigs.filter($"doc" % 2 === 1)
    val existing = sigs.filter($"doc" % 2 === 0)
    val cross = TextDedup.hammingPairsAgainst(incoming, existing,
        "doc", "dhash", bits = 56, maxHamming = 2, bands = 8)
      .as[(Long, Long, Long)].collect().toSet
    val self = TextDedup.hammingPairs(sigs, "doc", "dhash", 56, 2, 8)
      .as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => a % 2 != b % 2 }
      .map { case (a, b, h) => if (a % 2 == 1) (a, b, h) else (b, a, h) }.toSet
    assert(cross == self)
    assert(cross == Set((1L, 2L, 1L), (3L, 2L, 1L), (5L, 4L, 2L)))
    // never existing×existing (2,?) as doc_a, never incoming×incoming
    assert(cross.forall { case (a, b, _) => a % 2 == 1 && b % 2 == 0 })
  }

  test("simhash: identical docs identical, fingerprints fit in 32 bits") {
    val out = TextDedup.simhash(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(4L))
    assert(out.values.forall(v => v >= 0 && v < (1L << 32)))
    assert(out(1L) != out(3L)) // different content → different fingerprint
  }

  test("simhashNearDupPairs: banded join equals the all-pairs scan (exact recall)") {
    val docs = corpus.union(Seq(
      (5L, "the quick brown fox jumps over the lazy cat") // 1 word off doc 1
    ).toDF("doc_id", "text"))
    val sigs = TextDedup.simhash(docs, "doc_id", "text")
    val banded = TextDedup.simhashNearDupPairs(sigs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    // naive all-pairs over the collected fingerprints
    val fp = sigs.as[(Long, Long)].collect().toMap
    val naive = (for {
      a <- fp.keys; b <- fp.keys if a < b
      h = java.lang.Long.bitCount(fp(a) ^ fp(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded == naive)
    assert(banded.contains((1L, 4L, 0L))) // identical docs: hamming 0
  }

  test("simhashNearDupPairs rejects a maxHamming the banding can't guarantee") {
    val sigs = TextDedup.simhash(corpus, "doc_id", "text")
    assertThrows[IllegalArgumentException](
      TextDedup.simhashNearDupPairs(sigs, maxHamming = 4, bands = 4))
  }

  test("contaminationAgainst: shingle-level overlap counts, clean probes absent") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "alpha beta gamma zeta eta")
    ).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "alpha beta gamma delta unrelated"), // shares shingles with both
      (2L, "totally clean text here now")       // clean
    ).toDF("doc_id", "text")
    val got = TextDedup.contaminationAgainst(probe, train, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // probe 1 shingles: {a b g, b g d, g d u}; "a b g" hits both train docs,
    // "b g d" hits train 10 → 2 contaminated of 3, 2 corpus docs
    assert(got == Set((1L, 3L, 2L, 2L)))
  }

  test("contaminationAgainst maxDf drops hot shingles before the join") {
    val train = Seq(
      (10L, "x y z one"), (11L, "x y z two"), (12L, "x y z three")
    ).toDF("doc_id", "text")
    val probe = Seq((1L, "x y z probe")).toDF("doc_id", "text")
    // "x y z" has train df=3; cap at 2 → it can't testify → probe is clean
    val capped = TextDedup.contaminationAgainst(probe, train, "doc_id", "text",
      k = 3, maxDf = 2)
    assert(capped.count() == 0)
    val uncapped = TextDedup.contaminationAgainst(probe, train, "doc_id", "text", 3)
    assert(uncapped.count() == 1)
  }

  test("substringExcise: cross-doc repeat loses its tail, full dup dies, short docs untouched") {
    // Hand-derived under L=6 / first-wins:
    //  doc 1: the source run a1..a8 — first occurrence everywhere, intact.
    //  doc 2: unique prefix u1 u2 + the run. Unique straddling grams
    //    (u1 u2 a1..a4 / u2 a1..a5) vouch for positions 1–7; positions
    //    8–10 are covered ONLY by duplicated grams → excised.
    //  doc 3: verbatim copy of doc 1 — every position covered only by
    //    dup grams whose first occurrence is doc 1 → dies entirely.
    //  doc 4: shorter than L — no grams, untouched.
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, "u1 u2 a1 a2 a3 a4 a5 a6 a7 a8"),
      (3L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (4L, "s1 s2")).toDF("doc_id", "text")
    val out = TextDedup.substringExcise(docs, "doc_id", "text", minLen = 6)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 8L, 0L, "a1 a2 a3 a4 a5 a6 a7 a8")))
    assert(out(2L) == ((2L, 10L, 3L, "u1 u2 a1 a2 a3 a4 a5")))
    assert(out(3L) == ((3L, 8L, 8L, "")))
    assert(out(4L) == ((4L, 2L, 0L, "s1 s2")))
  }

  test("substringExciseAgainst chains: batch-vs-registry ≡ the global form's batch slice") {
    // corpus ids < batch ids — the q102 ordering contract
    val corpus = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, "b1 b2 b3 b4 b5 b6 b7")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "u1 u2 a1 a2 a3 a4 a5 a6 a7 a8"), // repeats corpus run
      (11L, "n1 n2 n3 n4 n5 n6 n7"),          // all novel
      (12L, "n1 n2 n3 n4 n5 n6 n7"),          // batch-internal dup of 11
      (13L, "b1 b2 b3 b4 b5 b6 b7")).toDF("doc_id", "text") // verbatim corpus doc
    val registry = corpus
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.Text.shingles(
          graft.functions.Text.tokens($"text"), 6)).as("gram"))
      .distinct()
    val incremental = TextDedup.substringExciseAgainst(
        batch, registry, "doc_id", "text", minLen = 6)
      .as[(Long, Long, Long, String)].collect().toSet
    val global = TextDedup.substringExcise(
        corpus.unionByName(batch), "doc_id", "text", minLen = 6)
      .filter($"doc_id" >= 10L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(incremental == global)
    // sanity on content: novel doc 11 intact, its batch dup 12 dies,
    // the corpus verbatim copy 13 dies
    val m = incremental.map(r => r._1 -> r).toMap
    assert(m(11L)._3 == 0L && m(12L)._4 == "" && m(13L)._4 == "")
  }

  test("substringExcise ≡ independent naive reference on randomized corpora") {
    // The DuckDB oracle mirrors the same relational algebra, so this is
    // the INDEPENDENT check: a direct Scala-collections transliteration
    // of the rule (gram occurrences → counts + global first → coverage →
    // survival), compared on random small-alphabet corpora where repeats
    // are dense.
    def naive(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long, String)] = {
      val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
      case class Occ(doc: Long, pos: Int, gram: String)
      val occs = toks.flatMap { case (id, tk) =>
        (1 to tk.length - L + 1).map(p =>
          Occ(id, p, tk.slice(p - 1, p - 1 + L).mkString(" ")))
      }
      val byGram = occs.groupBy(_.gram)
      val keep: Map[(Long, Int), Boolean] = occs.map { o =>
        val g = byGram(o.gram)
        val first = g.minBy(x => (x.doc, x.pos))
        (o.doc, o.pos) -> (g.size == 1 || (first.doc == o.doc && first.pos == o.pos))
      }.toMap
      toks.map { case (id, tk) =>
        val survive = (1 to tk.length).map { p =>
          val covering = (math.max(1, p - L + 1) to p)
            .flatMap(s => keep.get((id, s)))
          covering.isEmpty || covering.exists(identity)
        }
        val keptToks = tk.zip(survive).collect { case (t, true) => t }
        (id, tk.length.toLong, survive.count(!_).toLong, keptToks.mkString(" "))
      }.toSet
    }
    val rnd = new scala.util.Random(97)
    for (round <- 1 to 4) {
      val L = 2 + rnd.nextInt(3) // 2..4
      val docs = (1L to 30L).map { id =>
        val n = 1 + rnd.nextInt(14)
        (id, (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar.toString).mkString(" "))
      }
      val got = TextDedup.substringExcise(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen = L)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == naive(docs, L), s"round $round (L=$L) diverged")
    }
  }

  test("substringExcise: periodic self-repeat keeps boundary-straddling content (granularity fuzz, pinned)") {
    // "r1..r6 r1..r6": the second copy's interior is vouched for by the
    // UNIQUE wrap-around grams (r2..r6 r1 etc.), so only the final token
    // — covered solely by the duplicated r1..r6 gram — dies. This is the
    // documented L-granularity fuzz on periodic text (why the published
    // recipe uses L=50, where wrap-around grams are vanishingly rare).
    val docs = Seq((1L, "r1 r2 r3 r4 r5 r6 r1 r2 r3 r4 r5 r6"))
      .toDF("doc_id", "text")
    val out = TextDedup.substringExcise(docs, "doc_id", "text", minLen = 6)
      .as[(Long, Long, Long, String)].head()
    assert(out == ((1L, 12L, 1L, "r1 r2 r3 r4 r5 r6 r1 r2 r3 r4 r5")))
  }
}
