package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Text

class RanksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int, groups: Int) =
    (0 until n).map(i => (i.toLong, s"g${i % groups}")).toDF("id", "g")

  test("shuffleRank equals the naive single-partition window, per group") {
    val df = docs(200, 3)
    val got = Ranks.shuffleRank(df, Seq("g"), "id", "s1", nBuckets = 8)
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy(
          Text.baseHash32(concat(lit("s1:"), $"id")).asc, $"id".asc)))
      .select($"id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
    assert(got === naive)
  }

  test("shuffleRank with no groups = exact global shuffle order") {
    val df = docs(150, 1).drop("g")
    val got = Ranks.shuffleRank(df, Seq.empty, "id", "s2", nBuckets = 4)
      .select($"id", $"rn").as[(Long, Long)].collect()
    assert(got.map(_._2).sorted.toSeq === (1L to 150L))
    val naive = df.withColumn("rn", row_number().over(
        Window.orderBy(
          Text.baseHash32(concat(lit("s2:"), $"id")).asc, $"id".asc)))
      .select($"id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
    assert(got.toMap === naive)
  }

  test("shuffleRank: property — any group skew, any bucket count") {
    val gen = for {
      n <- Gen.choose(1, 120)
      groups <- Gen.choose(1, 5)
      logB <- Gen.choose(1, 6)
      salt <- Gen.identifier.map(_.take(6))
      // skewed membership: group j gets ~2^j of the mass
      ms <- Gen.listOfN(n, Gen.frequency(
        (1, Gen.const(0)), (2, Gen.const(1)), (4, Gen.const(2)),
        (8, Gen.const(3)), (16, Gen.const(4))))
    } yield (ms.take(n).zipWithIndex.map { case (m, i) =>
      (i.toLong, s"g${m % groups}") }, 1 << logB, salt)
    val prop = Prop.forAll(gen) { case (rows, buckets, salt) =>
      val df = rows.toDF("id", "g")
      val got = Ranks.shuffleRank(df, Seq("g"), "id", salt, buckets)
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      val naive = df.withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy(
            Text.baseHash32(concat(lit(s"$salt:"), $"id")).asc, $"id".asc)))
        .select($"id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
      got == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("orderedRank: property — arbitrary long keys (ties, negatives, clumps) match the naive window") {
    val gen = for {
      n <- Gen.choose(1, 120)
      buckets <- Gen.choose(2, 40)
      groups <- Gen.choose(1, 3)
      keys <- Gen.listOfN(n, Gen.oneOf(Gen.choose(-50L, 50L),
        Gen.const(7L), Gen.choose(1000000L, 1000010L)))
    } yield (keys.zipWithIndex.map { case (key, i) =>
      (i.toLong, s"g${i % groups}", key) }, buckets)
    val prop = Prop.forAll(gen) { case (rows, buckets) =>
      val df = rows.toDF("id", "g", "k")
      val got = Ranks.orderedRank(df, Seq("g"), "k", "id", buckets)
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      val naive = df.withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy($"k".asc, $"id".asc)))
        .select($"id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
      got == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  private val weights = Map("a" -> 4, "b" -> 2, "c" -> 1, "d" -> 1)

  test("interleave equals the naive global window over (ladder key, source)") {
    val df = (0 until 160).map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4)))
      .toDF("id", "g")
    val got = Ranks.interleave(df, "g", "id", "mix", weights, nBuckets = 8)
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    val l = 4L // lcm(4,2,1,1)
    val naive = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy(
          Text.baseHash32(concat(lit("mix:"), $"id")).asc, $"id".asc)))
      .withColumn("stride", when($"g" === "a", l / 4).when($"g" === "b", l / 2)
        .otherwise(l))
      .withColumn("key", ($"rn" - 1) * $"stride")
      .withColumn("pos", row_number().over(Window.orderBy($"key".asc, $"g".asc)))
      .select($"id", $"pos".cast("long")).as[(Long, Long)].collect().toMap
    assert(got === naive)
  }

  test("interleave: positions are a permutation and prefixes hold the mix") {
    val df = (0 until 320).map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4)))
      .toDF("id", "g")
    val out = Ranks.interleave(df, "g", "id", "mix2", weights, nBuckets = 8)
      .select($"pos", $"g").as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === (1L to 320L))
    // weight mass available until a source exhausts: the first 160
    // positions draw a:b:c:d = 4:2:1:1 (80 a's exhaust source a exactly
    // at half the corpus: 80 = 4/8 · 160)
    val prefix = out.take(160).map(_._2)
    val byG = prefix.groupBy(identity).view.mapValues(_.length).toMap
    // ladder keys interleave to within one row per source of the ideal
    assert(math.abs(byG("a") - 80) <= 1, byG.toString)
    assert(math.abs(byG("b") - 40) <= 1, byG.toString)
    assert(math.abs(byG("c") - 20) <= 1, byG.toString)
    assert(math.abs(byG("d") - 20) <= 1, byG.toString)
  }

  private def naiveExtend(standing: org.apache.spark.sql.DataFrame,
                          arriving: org.apache.spark.sql.DataFrame,
                          salt: String, served: Long): Map[Long, (Long, Boolean)] = {
    val l = 4L
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy(
          Text.baseHash32(concat(lit(s"$salt:"), $"id")).asc, $"id".asc)))
      .withColumn("stride", when($"g" === "a", l / 4).when($"g" === "b", l / 2)
        .otherwise(l))
    val st = keyed(standing)
      .withColumn("key", ($"rn" - 1) * $"stride")
      .withColumn("pos",
        row_number().over(Window.orderBy($"key".asc, $"g".asc)).cast("long"))
    val nByG = standing.groupBy($"g").agg(count(lit(1)).as("n"))
    val ar = keyed(arriving).join(nByG, Seq("g"), "left")
      .withColumn("key",
        (coalesce($"n", lit(0L)) + $"rn" - 1) * $"stride")
    val frozenRows = st.filter($"pos" <= served)
      .select($"id", $"pos").as[(Long, Long)].collect()
      .map { case (i, p) => i -> (p, true) }
    // base = rows actually frozen, not the watermark: a watermark past the
    // standing corpus must not leave position gaps
    val rem = st.filter($"pos" > served).select($"id", $"g", $"key")
      .unionByName(ar.select($"id", $"g", $"key"))
      .withColumn("pos", lit(frozenRows.length.toLong) +
        row_number().over(Window.orderBy($"key".asc, $"g".asc)).cast("long"))
      .select($"id", $"pos").as[(Long, Long)].collect()
      .map { case (i, p) => i -> (p, false) }
    (frozenRows ++ rem).toMap
  }

  test("extendOrder equals the naive recompute; empty batch + served=0 = interleave") {
    val standing = (0 until 120).map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4)))
      .toDF("id", "g")
    val arriving = (1000 until 1060)
      .map(i => (i.toLong, Seq("a", "b", "c", "d", "e")(i % 5))).toDF("id", "g")
    val w5 = weights + ("e" -> 1)
    val got = Ranks.extendOrder(standing, arriving, "g", "id", "mix5", w5,
        servedRows = 40, nBuckets = 8)
      .select($"id", $"pos", $"frozen").as[(Long, Long, Boolean)].collect()
      .map { case (i, p, f) => i -> (p, f) }.toMap
    assert(got === naiveExtend(standing, arriving, "mix5", 40))
    // positions are a permutation of 1..(N+M)
    assert(got.values.map(_._1).toSeq.sorted === (1L to 180L))
    // empty batch, nothing served: exactly interleave
    val empty = spark.emptyDataset[(Long, String)].toDF("id", "g")
    val plain = Ranks.interleave(standing, "g", "id", "mix5", w5, nBuckets = 8)
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    val ext0 = Ranks.extendOrder(standing, empty, "g", "id", "mix5", w5,
        servedRows = 0, nBuckets = 8)
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    assert(ext0 === plain)
  }

  test("extendOrder: served prefix frozen verbatim; property over watermarks") {
    val gen = for {
      n <- Gen.choose(1, 80)
      m <- Gen.choose(0, 40)
      served <- Gen.choose(0, 100)
      salt <- Gen.identifier.map(_.take(6))
    } yield (n, m, served.toLong, salt)
    val prop = Prop.forAll(gen) { case (n, m, served, salt) =>
      val standing = (0 until n)
        .map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4))).toDF("id", "g")
      val arriving = (1000 until 1000 + m)
        .map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4))).toDF("id", "g")
      val got = Ranks.extendOrder(standing, arriving, "g", "id", salt,
          weights, served, nBuckets = 4)
        .select($"id", $"pos", $"frozen").as[(Long, Long, Boolean)]
        .collect().map { case (i, p, f) => i -> (p, f) }.toMap
      val plain = Ranks.interleave(standing, "g", "id", salt, weights,
          nBuckets = 4)
        .select($"id", $"pos").as[(Long, Long)].collect().toMap
      // frozen rows: exactly the standing order's first `served` positions
      val frozenOk = got.forall { case (id, (p, f)) =>
        if (f) plain(id) == p && p <= served else p > math.min(served, n.toLong)
      } && got.count(_._2._2) == math.min(served, n.toLong)
      frozenOk && got == naiveExtend(standing, arriving, salt, served) &&
        got.values.map(_._1).toSeq.sorted == (1L to (n + m).toLong)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("extendRegistry one step = extendOrder; orderRegistry = interleave + j") {
    val standing = (0 until 120).map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4)))
      .toDF("id", "g")
    val arriving = (1000 until 1060)
      .map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4))).toDF("id", "g")
    val reg0 = Ranks.orderRegistry(standing, "g", "id", "mix6", weights,
      nBuckets = 8)
    // registry = interleave output + the per-source ladder index
    val plain = Ranks.interleave(standing, "g", "id", "mix6", weights,
        nBuckets = 8)
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    assert(reg0.select($"id", $"pos").as[(Long, Long)].collect().toMap
      === plain)
    val viaReg = Ranks.extendRegistry(reg0, arriving, "g", "id", "mix6",
        weights, servedRows = 37, nBuckets = 8)
      .select($"id", $"pos", $"frozen").as[(Long, Long, Boolean)]
      .collect().map { case (i, p, f) => i -> (p, f) }.toMap
    val direct = Ranks.extendOrder(standing, arriving, "g", "id", "mix6",
        weights, servedRows = 37, nBuckets = 8)
      .select($"id", $"pos", $"frozen").as[(Long, Long, Boolean)]
      .collect().map { case (i, p, f) => i -> (p, f) }.toMap
    assert(viaReg === direct)
  }

  test("extendRegistry composes: every earlier watermark prefix survives") {
    val p0 = (0 until 90).map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4)))
      .toDF("id", "g")
    val b1 = (1000 until 1045)
      .map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4))).toDF("id", "g")
    val b2 = (2000 until 2060)
      .map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4))).toDF("id", "g")
    val reg0 = Ranks.orderRegistry(p0, "g", "id", "mix7", weights, nBuckets = 8)
    val reg1 = Ranks.extendRegistry(reg0, b1, "g", "id", "mix7", weights,
      servedRows = 45, nBuckets = 8)
    val reg2 = Ranks.extendRegistry(reg1, b2, "g", "id", "mix7", weights,
      servedRows = 100, nBuckets = 8)
    def posMap(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"pos").as[(Long, Long)].collect().toMap
    val (m0, m1, m2) = (posMap(reg0), posMap(reg1), posMap(reg2))
    // permutations at every step
    assert(m1.values.toSeq.sorted === (1L to 135L))
    assert(m2.values.toSeq.sorted === (1L to 195L))
    // step-1 watermark: reg0's first 45 positions survive into reg1 AND reg2
    m0.filter(_._2 <= 45).foreach { case (id, p) =>
      assert(m1(id) == p, s"id $id moved in reg1"); assert(m2(id) == p) }
    // step-2 watermark: reg1's first 100 positions survive into reg2
    m1.filter(_._2 <= 100).foreach { case (id, p) => assert(m2(id) == p) }
    // frozen flags match the step-2 watermark exactly
    val f2 = reg2.select($"id", $"frozen").as[(Long, Boolean)].collect().toMap
    assert(f2.count(_._2) == 100)
    f2.foreach { case (id, f) => assert(f == m1.get(id).exists(_ <= 100)) }
    // per-source order is j-ascending at every step (the composition
    // invariant extendRegistry relies on)
    reg2.select($"g", $"pos", $"j").as[(String, Long, Long)].collect()
      .groupBy(_._1).values.foreach { rows =>
        val byPos = rows.sortBy(_._2).map(_._3)
        assert(byPos.toSeq === byPos.sorted.toSeq)
      }
  }

  test("interleave: property — random weights, skewed membership, any salt") {
    val gen = for {
      n <- Gen.choose(1, 100)
      wa <- Gen.choose(1, 9); wb <- Gen.choose(1, 9)
      wc <- Gen.choose(1, 9); wd <- Gen.choose(1, 9)
      salt <- Gen.identifier.map(_.take(6))
      ms <- Gen.listOfN(n, Gen.frequency(
        (1, Gen.const("a")), (2, Gen.const("b")),
        (4, Gen.const("c")), (8, Gen.const("d"))))
    } yield (ms.zipWithIndex.map { case (g, i) => (i.toLong, g) },
      Map("a" -> wa, "b" -> wb, "c" -> wc, "d" -> wd), salt)
    val prop = Prop.forAll(gen) { case (rows, w, salt) =>
      val df = rows.toDF("id", "g")
      val got = Ranks.interleave(df, "g", "id", salt, w, nBuckets = 4)
        .select($"id", $"pos").as[(Long, Long)].collect().toMap
      def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
      val l = w.values.foldLeft(1L)((acc, x) => acc / gcd(acc, x) * x)
      val strideOf = w.toSeq.sortBy(_._1)
        .foldRight(lit(-1L)) { case ((g, x), o) =>
          when($"g" === g, lit(l / x)).otherwise(o) }
      val naive = df.withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy(
            Text.baseHash32(concat(lit(s"$salt:"), $"id")).asc, $"id".asc)))
        .withColumn("key", ($"rn" - 1) * strideOf)
        .withColumn("pos",
          row_number().over(Window.orderBy($"key".asc, $"g".asc)))
        .select($"id", $"pos".cast("long")).as[(Long, Long)].collect().toMap
      got == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("extendRegistry fails loudly on a corrupted (non-contiguous) registry") {
    val standing = (0 until 40).map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4)))
      .toDF("id", "g")
    val reg = Ranks.orderRegistry(standing, "g", "id", "mix8", weights,
      nBuckets = 8)
    // corrupt: drop one interior ladder index of source "a"
    val corrupted = reg.filter(!($"g" === "a" && $"j" === 1L))
    val e = intercept[Exception] {
      Ranks.extendRegistry(corrupted,
        Seq((9000L, "a")).toDF("id", "g"), "g", "id", "mix8", weights,
        servedRows = 5, nBuckets = 8).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("non-contiguous ladder"), msgs(e))
  }

  test("interleave fails loudly on a source with no weight") {
    val df = Seq((1L, "a"), (2L, "zz")).toDF("id", "g")
    val e = intercept[Exception] {
      Ranks.interleave(df, "g", "id", "mix3", weights).collect()
    }
    assert(e.getMessage != null)
  }

  test("orderedRank: a key range that overflows the bucket expression fails loudly (r15 advice)") {
    // a raw 64-bit hash key makes (k - kmin) * nBuckets overflow Long,
    // silently breaking order alignment — the guard rides the min/max
    // aggregate the operator already pays for
    val df = Seq((1L, Long.MinValue + 1), (2L, Long.MaxValue - 1), (3L, 0L))
      .toDF("id", "k")
    val e = intercept[Exception] {
      Ranks.orderedRank(df, Seq.empty, "k", "id", nBuckets = 64).collect()
    }
    assert(e.getMessage.contains("overflows the bucket expression"),
      s"expected the range guard, got: ${e.getMessage}")
  }

  test("orderedRank: NULL keys fail loudly instead of vanishing through the offset join") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(9L)))
      .toDF("id", "k")
    val e = intercept[Exception] {
      Ranks.orderedRank(df, Seq.empty, "k", "id", nBuckets = 4).collect()
    }
    assert(e.getMessage.contains("NULL keys"),
      s"expected the NULL-key guard, got: ${e.getMessage}")
  }

  test("no global window ever runs on data rows — only on the bucket aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.nonEmpty)
      wins.filter(_.partitionSpec.isEmpty).foreach { w =>
        // the only permissible single-partition window is the cross-bucket
        // offset prefix-sum, whose input is the (group, bucket) count
        // aggregate — nBuckets rows, not the corpus
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          s"global window over non-aggregated input:\n$w")
      }
      // the data-side rank window is always bucket-partitioned
      assert(wins.exists(_.partitionSpec.nonEmpty))
    }
    check(Ranks.shuffleRank(docs(100, 1).drop("g"), Seq.empty, "id", "s3", 8))
    check(Ranks.interleave(
      (0 until 40).map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4)))
        .toDF("id", "g"), "g", "id", "mix4", weights, nBuckets = 8))
  }
}
