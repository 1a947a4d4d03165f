package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental CC: the registry fold must be bit-identical to global CC
  * over the union of all folded edges AFTER EVERY BATCH (chaining
  * equivalence), on both contracted-CC execution paths, and idempotent
  * under batch replay.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edgesDf(es: Seq[(Long, Long)]): DataFrame =
    es.toDF("a", "b")

  private def canon(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("node").cast("long"), col("cluster").cast("long"),
        col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet

  private def foldAndCheck(batches: Seq[Seq[(Long, Long)]],
                           localThreshold: Long): Unit = {
    var reg = Components.emptyRegistry(spark, edgesDf(Seq((0L, 0L))), "a")
    var seen = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (batch, i) =>
      seen ++= batch
      reg = Components.updateRegistry(reg, edgesDf(batch), "a", "b",
          localThreshold = localThreshold)
        .localCheckpoint(true)
      val inc = canon(Components.components(reg))
      val glob = canon(TextDedup.dupClusters(edgesDf(seen), "a", "b"))
      assert(inc == glob, s"batch $i (threshold $localThreshold): " +
        s"incremental ${inc.size} rows != global ${glob.size}")
    }
  }

  test("chaining equivalence: merging chains across batches (union-find path)") {
    // batch 1: two separate components; batch 2 bridges them; batch 3
    // adds a node to the merged component AND a fresh component.
    foldAndCheck(Seq(
      Seq((1L, 2L), (3L, 4L), (10L, 11L)),
      Seq((2L, 3L)),
      Seq((4L, 5L), (20L, 21L))
    ), localThreshold = 1000000L)
  }

  test("chaining equivalence on the iterative contracted-CC path") {
    foldAndCheck(Seq(
      Seq((1L, 2L), (3L, 4L), (10L, 11L)),
      Seq((2L, 3L)),
      Seq((4L, 5L), (20L, 21L))
    ), localThreshold = 0L)
  }

  test("high-diameter chain built out of order still converges to one component") {
    // A 30-node path delivered as interleaved thirds: folds must chain
    // labels transitively through the contracted graph each time.
    val path = (0L until 29L).map(i => (i, i + 1))
    val batches = Seq(
      path.zipWithIndex.collect { case (e, j) if j % 3 == 0 => e },
      path.zipWithIndex.collect { case (e, j) if j % 3 == 1 => e },
      path.zipWithIndex.collect { case (e, j) if j % 3 == 2 => e })
    foldAndCheck(batches, localThreshold = 1000000L)
    foldAndCheck(batches, localThreshold = 0L)
  }

  test("replaying an already-folded batch is a no-op") {
    val b1 = Seq((1L, 2L), (3L, 4L))
    val b2 = Seq((2L, 3L))
    var reg = Components.emptyRegistry(spark, edgesDf(b1), "a")
    reg = Components.updateRegistry(reg, edgesDf(b1), "a", "b").localCheckpoint(true)
    reg = Components.updateRegistry(reg, edgesDf(b2), "a", "b").localCheckpoint(true)
    val before = canon(Components.components(reg))
    val replayed = Components.updateRegistry(reg, edgesDf(b2), "a", "b")
    assert(canon(Components.components(replayed)) == before)
    assert(canon(Components.components(
      Components.updateRegistry(replayed.localCheckpoint(true), edgesDf(b1),
        "a", "b"))) == before)
  }

  test("foldIntoParquet releases every block the fold added (steady storage for long streams)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-fold")
      .toFile.getAbsolutePath + "/registry"
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Components.foldIntoParquet(spark, dir,
      edgesDf(Seq((1L, 2L), (3L, 4L))), "a", "b")
    Components.foldIntoParquet(spark, dir,
      edgesDf(Seq((2L, 3L))), "a", "b")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"fold leaked persistent RDDs: $leaked")
    val out = canon(Components.components(spark.read.parquet(dir)))
    assert(out == canon(TextDedup.dupClusters(
      edgesDf(Seq((1L, 2L), (3L, 4L), (2L, 3L))), "a", "b")))
  }

  test("string node ids label lexicographically (the q118/q120 domain)") {
    val es = Seq(("c9", "s10"), ("s10", "c10"), ("z1", "z2")).toDF("a", "b")
    var reg = Components.emptyRegistry(spark, es, "a")
    reg = Components.updateRegistry(reg, es, "a", "b").localCheckpoint(true)
    val out = Components.components(reg)
      .select("node", "cluster").as[(String, String)].collect().toMap
    // lexicographic min: "c10" < "c9" < "s10"
    assert(out("c9") == "c10" && out("s10") == "c10" && out("c10") == "c10")
    assert(out("z1") == "z1" && out("z2") == "z1")
  }

  test("property: random edge batches fold ≡ global CC after every batch") {
    val gen = for {
      n1 <- Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      n2 <- Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      n3 <- Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
    } yield Seq(n1, n2, n3)
    val prop = Prop.forAll(gen) { batches =>
      val cleaned = batches.map(_.filter(e => e._1 != e._2))
      if (cleaned.exists(_.nonEmpty)) {
        var reg = Components.emptyRegistry(spark, edgesDf(Seq((0L, 1L))), "a")
        var seen = Seq.empty[(Long, Long)]
        cleaned.filter(_.nonEmpty).forall { batch =>
          seen ++= batch
          reg = Components.updateRegistry(reg, edgesDf(batch), "a", "b")
            .localCheckpoint(true)
          canon(Components.components(reg)) ==
            canon(TextDedup.dupClusters(edgesDf(seen), "a", "b"))
        }
      } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
