package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SplitAssignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incremental assignment: a batch near-dup inherits its standing doc's cluster-keyed split (q164 pin)") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (2L, dup, 8L),                                   // standing
      (3L, dup, 8L),                                   // batch near-dup of 2
      (4L, "one two three four five six seven", 7L),   // standing, unique
      (5L, "red green blue cyan magenta yellow", 6L),  // batch, unique
      (7L, "lorem ipsum dolor sit amet consectetur", 6L) // batch, unique
    ).toDF("doc_id", "text", "n_chars")
    val out = LlmPipelines.splitAssignIncremental(docs)
      .select($"doc_id", $"inherited", $"skey", $"split")
      .as[(Long, Boolean, Long, String)].collect().map(r => r._1 -> r).toMap
    // only odd ids are the batch
    assert(out.keySet == Set(3L, 5L, 7L))
    // doc 3 matched standing doc 2 (a standing singleton: cluster key 2)
    assert(out(3L)._2 && out(3L)._3 == 2L)
    // its split is what the hash rule gives key 2 - the standing doc's own
    // cluster-safe split, so the pair can never straddle
    val expected = graft.operators.Sampling.hashSplit(
        Seq(2L).toDF("skey"), "skey", "exp1",
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select($"split").as[String].head()
    assert(out(3L)._4 == expected)
    // unmatched batch docs fall back to their own id, not inherited
    assert(!out(5L)._2 && out(5L)._3 == 5L)
    assert(!out(7L)._2 && out(7L)._3 == 7L)
  }
}
