package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the resident-engine cache lifecycle (verdict r10 item 6): running
  * registered queries leaves persisted state behind by DESIGN (the
  * caller-owned `persist()` convention plus `localCheckpoint` lineage
  * truncation), and [[Caches.clearAll]] drains ALL of it — including the
  * localCheckpoint blocks `catalog.clearCache()` cannot see — so a loop
  * over [[SparkEntry.queries]] runs at steady storage memory.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  // The heaviest cache users: q109 persists three shared subtrees AND
  // trains BPE (localCheckpoint generations); q106 trains (checkpoint
  // chain) then segments through the kernel; q115 persists the excised
  // corpus feeding three consumers; q128 persists the unigram piece
  // table (both vocab union branches read it); q126 persists the
  // per-domain supply table.
  private val heavy = Seq("q109_pipeline_v2", "q106_bpe_segment",
    "q115_pipeline_v3", "q128_unigram_segment", "q126_epoch_allocation",
    "q133_tokenizer_compare", "q136_unigram_em")

  test("clearAll leaves no cached datasets and no persisted RDDs after heavy queries") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    for (name <- heavy) {
      SparkEntry.queries(name)(spark, sfDir).count()
      Caches.clearAll(spark)
      val left = spark.sparkContext.getPersistentRDDs
      assert(left.isEmpty,
        s"$name left ${left.size} persisted RDDs after clearAll: " +
          left.values.map(_.name).mkString(", "))
      assert(spark.sharedState.cacheManager.isEmpty, s"$name left cached plans")
    }
  }

  test("trainMerges frees its own checkpoint generations eagerly") {
    import spark.implicits._
    Caches.clearAll(spark)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "f")
    graft.operators.Bpe.trainMerges(vocab, "w", "f", nMerges = 4).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"trainMerges left ${leaked.size} checkpoint RDDs persisted")
  }
}
