package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloomSemi is a superset of the semi-join and exact after the join") {
    val big = (1 to 2000).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    val keys = (1 to 2000 by 13).map(i => s"k$i").toDF("pk")
    val pruned = Prune.bloomSemi(big, col("k"), keys, col("pk"),
      expectedItems = 200L, numBits = 4096L)
    val exactSemi = big.join(keys.withColumnRenamed("pk", "k"), Seq("k"),
      "left_semi")
    val prunedKeys = pruned.select("k").as[String].collect().toSet
    val semiKeys = exactSemi.select("k").as[String].collect().toSet
    // no false negatives: every true match survives the gate
    assert(semiKeys.subsetOf(prunedKeys))
    // the exact join after the gate removes the false positives
    val joined = pruned.join(keys, col("k") === col("pk"))
      .select("k", "v").as[(String, Long)].collect().toSet
    val direct = big.join(keys, col("k") === col("pk"))
      .select("k", "v").as[(String, Long)].collect().toSet
    assert(joined == direct)
    // and the gate actually prunes: ~154 true keys + ~1% FP of 2000,
    // far below the unpruned 2000 (loose bound: under a quarter)
    assert(prunedKeys.size < 500,
      s"bloom gate passed ${prunedKeys.size} of 2000 rows - not pruning")
  }

  test("bloomSemi rejects mismatched key types (xxhash64 is type-sensitive)") {
    val big = Seq(1, 2, 3).toDF("k") // int
    val keys = Seq(1L, 2L).toDF("pk") // bigint
    assertThrows[IllegalArgumentException](
      Prune.bloomSemi(big, col("k"), keys, col("pk"), 10L, 1024L))
  }

  test("contaminationAgainst with bloomPrune equals the unpruned pipeline") {
    val docs = (1 to 60).map { i =>
      val words = (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val probe = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val plain = TextDedup.contaminationAgainst(probe, corpus,
        "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    val pruned = TextDedup.contaminationAgainst(probe, corpus,
        "doc_id", "text", k = 3, bloomPrune = Some((1000L, 16384L)))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }
}
