package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(Similarity.cosineScaledPm(col("a"), col("b"))).as[Long].head()

  test("cosineScaledPm: identical 1e6, orthogonal 0, opposite -1e6") {
    assert(cos(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) == 1000000L)
    assert(cos(Seq(1f, 0f), Seq(0f, 1f)) == 0L)
    assert(cos(Seq(1f, 1f), Seq(-1f, -1f)) == -1000000L)
  }

  test("kmeansRefine: separated clusters converge to exact member means, emptied cells survive") {
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), // seeds
      (10L, Seq(0.9f, 0.1f)),               // → cell 0
      (11L, Seq(0.1f, 0.9f)),               // → cell 1
      (12L, Seq(0.6f, 0.8f))                // cos favors (0,1) → cell 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansRefine(emb, emb.filter($"vec_id" < 2),
        "vec_id", "embedding", iters = 2)
      .as[(Long, Seq[Double], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // exact double arithmetic, same fold order as the operator
    def mean(xs: Seq[Float]) = xs.foldLeft(0.0)(_ + _) / xs.size
    assert(out(0L)._2 == 2L && out(1L)._2 == 3L)
    assert(out(0L)._1 == Seq(mean(Seq(1f, 0.9f)), mean(Seq(0f, 0.1f))))
    assert(out(1L)._1 == Seq(mean(Seq(0f, 0.1f, 0.6f)), mean(Seq(1f, 0.9f, 0.8f))))
    // a centroid no corpus vector prefers keeps its seed value, 0 members
    // (seeds need not be corpus members)
    val far = Seq((0L, Seq(1f, 0f)), (1L, Seq(-1f, 0f)), (10L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.kmeansRefine(far.filter($"vec_id" =!= 1L),
        far.filter($"vec_id" < 2), "vec_id", "embedding", iters = 1)
      .as[(Long, Seq[Double], Long)].collect().map(r => r._1 -> r._3).toMap
    assert(kept(1L) == 0L) // emptied cell survives with its seed centroid
  }

  test("kmeansRefine: big-cell sum/count path agrees with the ordered fold") {
    // Integer-valued components: double addition of integers is exact in
    // any order, so the partial-agg sum path must be BIT-identical to the
    // ordered fold — pinning path agreement without FP tolerance.
    val rnd = new scala.util.Random(17)
    val emb = (0L until 60L).map(i =>
        (i, Seq.fill(6)(rnd.nextInt(2001).toFloat - 1000f)))
      .toDF("vec_id", "embedding")
    val seeds = emb.filter($"vec_id" < 4)
    def run(maxFold: Long) =
      Similarity.kmeansRefine(emb, seeds, "vec_id", "embedding", iters = 3,
          maxFoldMembers = maxFold)
        .as[(Long, Seq[Double], Long)].collect().sortBy(_._1).toSeq
    val fold = run(Long.MaxValue) // every cell on the collect_list fold
    val sums = run(0L)            // every cell on the sum/count path
    assert(fold == sums)
    assert(fold.map(_._3).sum == 60L) // all members assigned in both paths
  }

  test("kmeansRefine: a cell emptied in one iteration recaptures members safely") {
    // B's seed attracts nothing in iteration 1 (tie goes to A); after A
    // recenters on its members, p13 flips to B in iteration 2. B's prior
    // population is 0, so its new rows must route through the bounded
    // sum/count path (the when-clause maps zero/unknown prior counts to
    // bound+1) — the fold path is never entered without a known nonzero
    // prior population. All coordinates are exact binary fractions, so
    // both paths are bit-identical and the bounded run must equal the
    // unbounded one exactly.
    val seeds = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, -1f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(1f, 0f)), (11L, Seq(1f, 0.5f)), (12L, Seq(0.5f, 1f)),
      (13L, Seq(0.5f, -0.5f)) // ties A/B at seed time → A; flips to B later
    ).toDF("vec_id", "embedding")
    def run(maxFold: Long) =
      Similarity.kmeansRefine(corpus, seeds, "vec_id", "embedding",
          iters = 2, maxFoldMembers = maxFold)
        .as[(Long, Seq[Double], Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val bounded = run(2L) // A's 4 members exceed the bound in iteration 1
    assert(bounded(0L) == ((Seq((1.0 + 1.0 + 0.5) / 3, (0.0 + 0.5 + 1.0) / 3), 3L)))
    assert(bounded(1L) == ((Seq(0.5, -0.5), 1L))) // recaptured from empty
    assert(bounded == run(Long.MaxValue))
  }

  test("annTopKMultiTable: one table equals plain LSH; more tables never lose a best hit") {
    val rnd = new scala.util.Random(9)
    val emb = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = $"vec_id" < 5L
    val single = Similarity.annTopK(emb, "vec_id", "embedding", queries,
        planes = 3, dims = 8, k = 3)
      .select("qid", "cid", "cos_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val oneTable = Similarity.annTopKMultiTable(emb, "vec_id", "embedding",
        queries, planes = 3, tables = 1, dims = 8, k = 3)
      .select("qid", "cid", "cos_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(oneTable == single)
    // OR-amplification: per query, the best cosine found can only improve
    val two = Similarity.annTopKMultiTable(emb, "vec_id", "embedding",
        queries, planes = 3, tables = 2, dims = 8, k = 3)
      .select("qid", "cos_pm").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val one = single.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    one.foreach { case (q, best) => assert(two.getOrElse(q, Long.MinValue) >= best) }
  }

  test("ivfTopKProbe: probing every cell reproduces brute force exactly") {
    val rnd = new scala.util.Random(5)
    val emb = (0L until 24L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val seeds = emb.filter($"vec_id" < 3)
    val queries = $"vec_id" >= 20L
    val probed = Similarity.ivfTopKProbe(emb, seeds, "vec_id", "embedding",
        queries, k = 4, nprobe = 3)
      .select("qid", "cid", "cos_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, emb.filter(queries),
        "vec_id", "embedding", k = 4)
      .select("qid", "cid", "cos_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(probed == brute)
    // nprobe=1 candidates are a subset of the nprobe=3 result's quality:
    // every nprobe=1 hit is ranked no better in the wider search
    val single = Similarity.ivfTopKProbe(emb, seeds, "vec_id", "embedding",
        queries, k = 4, nprobe = 1)
      .select("qid", "cos_pm").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val wide = probed.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    single.foreach { case (q, best) => assert(wide(q) >= best) }
  }

  test("bruteForceTopK ranks by scaled cosine with id tie-break, excludes self") {
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0.01f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0f, 1f)), (4L, Seq(1f, 0f)) // 4 ties 0 exactly (same direction)
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 3)
      .select("cid", "rank").as[(Long, Long)].collect().toMap
    assert(out(4L) == 1L) // cos=1e6, beats 1 (also high) — exact match first
    assert(out(1L) == 2L)
    assert(out(2L) == 3L)
    assert(!out.contains(0L)) // self excluded
  }

  test("rpLshBucket is deterministic and within 2^planes; ANN stays in-bucket") {
    val emb = (0L until 40L).map { i =>
      (i, (0 until 8).map(j => ((i * 31 + j * 7) % 13).toFloat - 6f))
    }.toDF("vec_id", "embedding")
    val buckets = emb.select(col("vec_id"),
        Similarity.rpLshBucket(col("embedding"), planes = 4, dims = 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(buckets.values.forall(b => b >= 0 && b < 16))
    val again = emb.select(col("vec_id"),
        Similarity.rpLshBucket(col("embedding"), planes = 4, dims = 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(buckets == again)
    val ann = Similarity.annTopK(emb, "vec_id", "embedding",
      col("vec_id") < 5, planes = 4, dims = 8, k = 3)
      .select("qid", "cid", "bucket").as[(Long, Long, Long)].collect()
    ann.foreach { case (q, c, b) =>
      assert(buckets(q) == b && buckets(c) == b) // candidates share the bucket
    }
  }

  test("annTopKAdaptive: huge cap degenerates to plain LSH; tight cap refines within base bucket") {
    val emb = (0L until 40L).map { i =>
      (i, (0 until 8).map(j => ((i * 31 + j * 7) % 13).toFloat - 6f))
    }.toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "cos_pm", "rank")
        .as[(Long, Long, Long, Long)].collect().toSet
    // cap above corpus size → no bucket splits → identical neighbor sets
    val plain = rows(Similarity.annTopK(emb, "vec_id", "embedding",
      col("vec_id") < 5, planes = 4, dims = 8, k = 3))
    val lazyCap = rows(Similarity.annTopKAdaptive(emb, "vec_id", "embedding",
      col("vec_id") < 5, planes = 4, extraPlanes = 3, dims = 8, k = 3,
      cap = 1000L))
    assert(lazyCap == plain)
    // cap=1 splits every bucket; every candidate pair must still share the
    // BASE bucket (refinement only subdivides, never merges)
    val buckets = emb.select(col("vec_id"),
        Similarity.rpLshBucket(col("embedding"), planes = 4, dims = 8).as("b"))
      .as[(Long, Long)].collect().toMap
    val tight = Similarity.annTopKAdaptive(emb, "vec_id", "embedding",
      col("vec_id") < 5, planes = 4, extraPlanes = 3, dims = 8, k = 3,
      cap = 1L)
      .select("qid", "cid").as[(Long, Long)].collect()
    assert(tight.nonEmpty)
    tight.foreach { case (q, c) => assert(buckets(q) == buckets(c)) }
  }

  test("pqEncode: codes are the per-subspace L2 argmin, lowest id on ties, packed word consistent") {
    val rnd = new scala.util.Random(23)
    val emb = (0L until 50L).map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val out = Similarity.pqEncode(emb.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .select("vec_id", "code0", "code1", "code2", "code3", "pq_code")
      .as[(Long, Int, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    // independent re-derivation with the operator's exact arithmetic:
    // dist = ‖cb‖² − 2·Σᵢ cb[i]·(double)x[i], ascending fold, argmin with
    // lowest code id on ties
    def expectedCode(v: Seq[Float], s: Int): Int = {
      val ds = (0 until Similarity.PqK).map { c =>
        val cb = Similarity.pqCodebook(s)(c)
        val dot = (0 until Similarity.PqSubDim).foldLeft(0.0)((a, i) =>
          a + cb(i) * v(s * Similarity.PqSubDim + i).toDouble)
        Similarity.pqCbNorm2(s)(c) - 2.0 * dot
      }
      ds.indexOf(ds.min)
    }
    emb.foreach { case (id, v) =>
      val (_, c0, c1, c2, c3, packed) = out(id)
      assert(Seq(c0, c1, c2, c3) == (0 until 4).map(expectedCode(v, _)))
      assert(Seq(c0, c1, c2, c3).forall(c => c >= 0 && c < Similarity.PqK))
      assert(packed == c0 + c1 * 16L + c2 * 256L + c3 * 4096L)
    }
  }

  test("pqAdcTopK ranks by the codebook-lookup inner product with id tie-break") {
    val rnd = new scala.util.Random(29)
    val emb = (0L until 40L).map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val got = Similarity.pqAdcTopK(emb.toDF("vec_id", "embedding"),
        "vec_id", "embedding", col("vec_id") < 4, k = 3)
      .select("qid", "cid", "adc_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    // expected: exact same fold arithmetic, ranked (-adc, cid)
    def code(v: Seq[Float], s: Int): Int = {
      val ds = (0 until Similarity.PqK).map { c =>
        val cb = Similarity.pqCodebook(s)(c)
        Similarity.pqCbNorm2(s)(c) - 2.0 * (0 until Similarity.PqSubDim)
          .foldLeft(0.0)((a, i) => a + cb(i) * v(s * Similarity.PqSubDim + i).toDouble)
      }
      ds.indexOf(ds.min)
    }
    def adcPm(q: Seq[Float], c: Seq[Float]): Long = {
      val adc = (0 until Similarity.PqSub).foldLeft(0.0) { (acc, s) =>
        val cb = Similarity.pqCodebook(s)(code(c, s))
        acc + (0 until Similarity.PqSubDim).foldLeft(0.0)((a, i) =>
          a + q(s * Similarity.PqSubDim + i).toDouble * cb(i))
      }
      math.round(1000000.0 * adc)
    }
    val expected = (for {
      (qid, qv) <- emb.filter(_._1 < 4)
      (cid, cv) <- emb if cid != qid
    } yield (qid, cid, adcPm(qv, cv)))
      .groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy { case (_, c, s) => (-s, c) }.take(3).zipWithIndex
          .map { case ((q, c, s), r) => (q, c, s, r + 1L) }
      }.toSet
    assert(got == expected)
  }

  test("ivfPqTopK: one cell degenerates to pqAdcTopK; candidates share the query's cell") {
    val rnd = new scala.util.Random(31)
    val emb = (0L until 40L).map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = $"vec_id" < 4
    // a single centroid puts everything in one cell → pruning is a no-op
    // and the ranking must be exactly the plain ADC scan's
    val one = Similarity.ivfPqTopK(emb, emb.filter($"vec_id" === 0),
        "vec_id", "embedding", queries, k = 3)
      .select("qid", "cid", "adc_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val plain = Similarity.pqAdcTopK(emb, "vec_id", "embedding", queries, k = 3)
      .select("qid", "cid", "adc_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(one == plain)
    // with real cells, every candidate pair must share the query's cell
    val seeds = emb.filter($"vec_id" < 3)
    val cells = Similarity.ivfAssign(emb, seeds, "vec_id", "embedding")
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val multi = Similarity.ivfPqTopK(emb, seeds, "vec_id", "embedding",
        queries, k = 3)
      .select("qid", "cid", "cell").as[(Long, Long, Long)].collect()
    assert(multi.nonEmpty)
    multi.foreach { case (q, c, cell) =>
      assert(cells(q) == cell && cells(c) == cell)
    }
  }

  test("hardNegatives: same-bucket different-label candidates only, ranked like annTopK") {
    val emb = (0L until 40L).map { i =>
      (i, (0 until 8).map(j => ((i * 31 + j * 7) % 13).toFloat - 6f), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val neg = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        col("vec_id") < 5, planes = 2, dims = 8, k = 3)
      .select("qid", "q_label", "cid", "c_label")
      .as[(Long, Int, Long, Int)].collect()
    assert(neg.nonEmpty)
    neg.foreach { case (q, ql, c, cl) =>
      assert(q != c)
      assert(ql != cl, s"negative $c shares label $cl with anchor $q")
      assert(ql == (q % 3) && cl == (c % 3))
    }
    // must be exactly the label-filtered annTopK candidate ranking:
    // re-rank annTopK's full per-bucket pairs by hand with the label filter
    val all = Similarity.annTopK(emb, "vec_id", "embedding",
        col("vec_id") < 5, planes = 2, dims = 8, k = 1000)
      .select("qid", "cid", "cos_pm").as[(Long, Long, Long)].collect()
    val expected = all.filter { case (q, c, _) => q % 3 != c % 3 }
      .groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy { case (_, c, s) => (-s, c) }.take(3).toSeq
      }.map { case (q, c, _) => (q, c) }.toSet
    assert(neg.map { case (q, _, c, _) => (q, c) }.toSet == expected)
  }

  test("trainPqCodebooks: right shape, deterministic, encode stays valid") {
    // 64-dim corpus: 20 deterministic vectors (same generator family the
    // fixtures use — index-derived, no RNG)
    val emb = (0 until 20).map { v =>
      (v.toLong, (0 until Similarity.PqDims).map(i =>
        math.sin(v * 31 + i * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      col("vec_id") < Similarity.PqK, iters = 2)
    assert(cb.length == Similarity.PqSub)
    assert(cb.forall(_.length == Similarity.PqK))
    assert(cb.forall(_.forall(_.length == Similarity.PqSubDim)))
    // deterministic: a second training is bit-identical
    val cb2 = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      col("vec_id") < Similarity.PqK, iters = 2)
    assert(cb == cb2)
    // trained constants differ from the md5 defaults, and the SAME encode
    // kernel accepts them (codes in range, packed word consistent)
    assert(cb != Similarity.pqCodebook)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", codebook = cb)
      .select("code0", "code1", "code2", "code3", "pq_code")
      .as[(Int, Int, Int, Int, Long)].collect()
    codes.foreach { case (c0, c1, c2, c3, w) =>
      Seq(c0, c1, c2, c3).foreach(c => assert(c >= 0 && c < Similarity.PqK))
      assert(w == c0 + c1 * 16L + c2 * 256L + c3 * 4096L)
    }
  }

  test("ivfPqTopKIndexed over a prebuilt index equals the end-to-end form") {
    import spark.implicits._
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
    val qp = col("vec_id") >= 20 && col("vec_id") < 30
    val direct = Similarity.ivfPqTopK(emb, cents, "vec_id", "embedding",
        qp, k = 3)
      .select("qid", "cid", "adc_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val index = Similarity.buildIvfPqIndex(emb, cents, "vec_id", "embedding")
    val qAssigned = Similarity.ivfAssign(emb.filter(qp), cents, "vec_id", "embedding")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("cell"))
    val indexed = Similarity.ivfPqTopKIndexed(index, qAssigned, k = 3)
      .select("qid", "cid", "adc_pm", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(indexed == direct)
    assert(direct.nonEmpty)
  }

  test("recallAudit: integer-exact per-probe recall, missing probes get 0, div not divide") {
    import org.apache.spark.sql.functions.col
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
                    (2L, 20L), (2L, 21L), (2L, 22L),
                    (3L, 30L), (3L, 31L), (3L, 32L)).toDF("qid", "cid")
    // probe 1: 2/3 hits; probe 2: 0 hits; probe 3: all 3
    val ann = Seq((1L, 10L), (1L, 11L), (1L, 99L),
                  (2L, 98L), (2L, 97L), (2L, 96L),
                  (3L, 30L), (3L, 31L), (3L, 32L)).toDF("qid", "cid")
    val out = Similarity.recallAudit(exact, ann, k = 3)
      .select(col("qid"), col("hits"), col("recall_pm"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 666666L), (2L, 0L, 0L), (3L, 3L, 1000000L)))
    // the column must be integral — a Divide would make it double and
    // break the oracle's BIGINT contract
    val schema = Similarity.recallAudit(exact, ann, k = 3).schema
    assert(schema("recall_pm").dataType ==
      org.apache.spark.sql.types.LongType)
    intercept[IllegalArgumentException] {
      Similarity.recallAudit(exact, ann, k = 0)
    }
  }
}
