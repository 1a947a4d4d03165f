package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------- CMS

  private def exactCounts(keys: Seq[String]): Map[String, Long] =
    keys.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("CMS never undercounts, and is exact when width clears the corpus") {
    val keys = (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
    val df = keys.toDF("k")
    val exact = exactCounts(keys)
    // width 4096 over 40 keys: collisions in all 4 rows are practically
    // impossible, so every estimate is exact.
    val sk = Sketches.cmsSketch(df, col("k"), lit(1L), 4, 4096)
    val est = Sketches.cmsEstimate(sk, df, col("k"), 4, 4096)
      .as[(String, Long)].collect().toMap
    assert(est == exact)
    // width 8 forces collisions: estimates may overcount, never under.
    val sk8 = Sketches.cmsSketch(df, col("k"), lit(1L), 4, 8)
    val est8 = Sketches.cmsEstimate(sk8, df, col("k"), 4, 8)
      .as[(String, Long)].collect().toMap
    assert(est8.keySet == exact.keySet)
    exact.foreach { case (k, n) => assert(est8(k) >= n, s"undercount at $k") }
  }

  test("CMS merge of per-group sketches equals the direct global sketch") {
    val df = (1 to 200).map(i => (s"k${i % 23}", s"g${i % 7}")).toDF("k", "g")
    val direct = Sketches.cmsSketch(df, col("k"), lit(1L), 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.cmsMerge(
        Sketches.cmsSketch(df, col("k"), lit(1L), 4, 64, groups = Seq("g")))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == direct)
  }

  test("CMS estimate is 0 for never-seen keys") {
    val sk = Sketches.cmsSketch(Seq("a", "b").toDF("k"), col("k"), lit(1L), 4, 64)
    val est = Sketches.cmsEstimate(sk, Seq("zzz-unseen").toDF("k"), col("k"), 4, 64)
      .as[(String, Long)].collect().toMap
    // 0 unless 'zzz-unseen' collides with a seen key in all 4 rows (it
    // does not, pinned by this test passing).
    assert(est("zzz-unseen") == 0L)
  }

  test("CMS property: estimates dominate true counts (any multiset, tight width)") {
    val gen = Gen.listOfN(60, Gen.chooseNum(0, 15).map(i => s"k$i"))
    val prop = Prop.forAll(gen) { keys =>
      val df = keys.toDF("k")
      val est = Sketches.cmsEstimate(
          Sketches.cmsSketch(df, col("k"), lit(1L), 3, 4),
          df, col("k"), 3, 4)
        .as[(String, Long)].collect().toMap
      val exact = exactCounts(keys)
      exact.forall { case (k, n) => est(k) >= n } &&
        est.values.forall(_ <= keys.size) // bounded by the corpus size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("histQuantiles property: one-value bins ≡ exact byRank on random integer data") {
    val gen = Gen.listOfN(80, Gen.chooseNum(0L, 49L))
    val ps = Seq("p10" -> 0.1, "p50" -> 0.5, "p97" -> 0.97)
    val prop = Prop.forAll(gen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
        .toDF("g", "id", "v")
      val exact = Quantiles.byRank(df, Seq(col("g")), col("v"), col("id"), ps)
        .select("q_p10", "q_p50", "q_p97")
        .as[(Long, Long, Long)].collect().head
      val hist = Sketches.histQuantiles(df, Seq("g"), col("v"), 0L, 50L, 50, ps)
        .select("q_p10", "q_p50", "q_p97")
        .as[(Long, Long, Long)].collect().head
      hist == exact
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  // ---------------------------------------------------------------- KMV

  test("KmvMins unit: merge of split buffers equals single fold (mergeability)") {
    val agg = new Sketches.KmvMins(8)
    val prop = Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 40L))) { hs =>
      val whole = hs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = hs.splitAt(hs.size / 2)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      // merge ≡ single fold, and the buffer is the k smallest DISTINCT
      // values in sorted order
      merged == whole && whole == hs.distinct.sorted.take(8)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("KMV is exact below k and within the estimator's band beyond") {
    // group "small": 10 distinct ids → exact path. group "big": 500
    // distinct ids → estimator path; with k=32 the deterministic md5
    // draw lands well inside ±3σ ≈ ±55% (observed ~7% on this fixture —
    // pinned loosely so the test survives salt changes only if the
    // estimator stays sane).
    val rows = (1 to 10).map(i => ("small", s"u$i")) ++
      (1 to 500).map(i => ("big", s"u$i"))
    val df = rows.toDF("g", "u")
    val rr = Sketches.kmvDistinct(df, Seq("g"), col("u"), 32)
      .select(col("g"), col("n_mins"), col("est_distinct"))
      .as[(String, Long, Double)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap
    assert(rr("small") == ((10L, 10.0)))
    val (nBig, estBig) = rr("big")
    assert(nBig == 32L)
    assert(estBig > 250.0 && estBig < 1000.0,
      s"KMV estimate $estBig implausible for 500 distinct")
  }

  test("KMV estimate is invariant to partitioning (partial-agg merge path)") {
    val df = (1 to 300).map(i => ("g", s"u${i % 97}")).toDF("g", "u")
    val one = Sketches.kmvDistinct(df.repartition(1), Seq("g"), col("u"), 16)
      .select("n_mins", "est_distinct").as[(Long, Double)].collect().head
    val many = Sketches.kmvDistinct(df.repartition(16), Seq("g"), col("u"), 16)
      .select("n_mins", "est_distinct").as[(Long, Double)].collect().head
    assert(one == many)
  }

  // ---------------------------------------------------- histogram quantiles

  test("histQuantiles with one-value bins equals exact byRank on integer data") {
    val df = (0 until 50).map(i => ("g", i.toLong, (i * 7 % 50).toLong))
      .toDF("g", "id", "v")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99)
    val exact = Quantiles.byRank(df, Seq(col("g")), col("v"), col("id"), ps)
      .select("n", "q_p25", "q_p50", "q_p99")
      .as[(Long, Long, Long, Long)].collect().head
    val hist = Sketches.histQuantiles(df, Seq("g"), col("v"), 0L, 50L, 50, ps)
      .select("n", "q_p25", "q_p50", "q_p99")
      .as[(Long, Long, Long, Long)].collect().head
    assert(hist == exact)
  }

  test("histQuantiles error is bounded by one bin width") {
    val df = (1 to 1000).map(i => ("g", i.toLong, i.toLong)).toDF("g", "id", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)
    val exact = Quantiles.byRank(df, Seq(col("g")), col("v"), col("id"), ps)
      .select("q_p50", "q_p90").as[(Long, Long)].collect().head
    val hist = Sketches.histQuantiles(df, Seq("g"), col("v"), 0L, 1024L, 16, ps)
      .select("q_p50", "q_p90").as[(Long, Long)].collect().head
    val binWidth = 1024L / 16
    assert(math.abs(hist._1 - exact._1) <= binWidth)
    assert(math.abs(hist._2 - exact._2) <= binWidth)
  }

  test("histQuantiles clamps values outside [lo, hi)") {
    val df = Seq(("g", 1L, -5L), ("g", 2L, 3L), ("g", 3L, 99L), ("g", 4L, 1000L))
      .toDF("g", "id", "v")
    val r = Sketches.histQuantiles(df, Seq("g"), col("v"), 0L, 100L, 10,
        Seq("p01" -> 0.01, "p100" -> 1.0))
      .select("n", "q_p01", "q_p100").as[(Long, Long, Long)].collect().head
    // -5 clamps to bin 0 (edge 0); 1000 clamps to bin 9 (edge 90)
    assert(r == ((4L, 0L, 90L)))
    // overflow regression: a stray ns-scale value must clamp to the TOP
    // bin, not wrap (v-lo)*bins negative and land in bin 0
    val big = Seq(("g", 1L, 3L), ("g", 2L, 1700000000000000000L))
      .toDF("g", "id", "v")
    val rb = Sketches.histQuantiles(big, Seq("g"), col("v"), 0L, 100L, 10,
        Seq("p100" -> 1.0))
      .select("q_p100").as[Long].collect().head
    assert(rb == 90L, s"ns-scale value landed at edge $rb, expected top bin 90")
  }
}
