package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic invariants of the q109 composed pipeline (span dedup → CCNet
  * gate on rebuilt text → BPE fertility). Exact values are pinned by the
  * generated DuckDB twin ([[Oracles]] `q109_pipeline_v2`); this spec pins
  * the properties that must hold on ANY corpus — the things a value hash
  * can't explain when it breaks.
  */
class PipelineV2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"
  private lazy val out = Curation.q109PipelineV2(spark, d).collect()
  private lazy val byLang = out.map(r => r.getString(0) -> r).toMap

  test("output shape: one row per surviving language, expected columns") {
    val cols = Curation.q109PipelineV2(spark, d).columns.toSeq
    assert(cols == Seq("lang", "n_docs", "kept_blocks", "n_tokens",
      "n_pieces", "fertility_pm"))
    assert(out.nonEmpty)
    assert(byLang.size == out.length, "one row per language")
  }

  test("the gate drops a real tail: survivors are a strict, non-empty subset") {
    import graft.operators.{TermStats, TextDedup}
    val docs = graft.sources.Tables.balanced(spark, d, "documents")
    val rebuilt = TextDedup.spanDedup(docs, "doc_id", "text", k = 3)
      .filter(col("kept_blocks") >= 1L)
    // scored = docs with >= 1 bigram in rebuilt text (lmFluency's domain)
    val scored = TermStats.lmFluency(rebuilt, "doc_id", "new_text").count()
    val survivors = out.map(_.getLong(1)).sum
    assert(survivors > 0 && survivors < scored,
      s"gate must drop some docs: $survivors of $scored survived")
    // tercile semantics: roughly the top two thirds survive (exact cutoff
    // position depends on score ties; wide tolerance on the tiny corpus)
    val frac = survivors.toDouble / scored
    assert(frac > 0.5 && frac < 0.85, s"survivor fraction $frac not ~2/3")
  }

  test("fertility is >= 1 piece per token and bounded by characters per token") {
    out.foreach { r =>
      val (lang, nTokens, nPieces, fert) =
        (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nPieces >= nTokens, s"$lang: a token segments into >= 1 piece")
      assert(fert == 1000000L * nPieces / nTokens, s"$lang: fertility arithmetic")
      // 6 merges must actually compress: strictly fewer pieces than a
      // no-merge segmentation (= one piece per character)
      assert(fert < 1000000L * 40, s"$lang: fertility $fert implausibly high")
    }
  }

  test("more merges never raise fertility (trained merges only join pieces)") {
    import graft.functions.Text
    import graft.operators.{Bpe, TermStats, TextDedup}
    val docs = graft.sources.Tables.balanced(spark, d, "documents")
    val rebuilt = TextDedup.spanDedup(docs, "doc_id", "text", k = 3)
      .filter(col("kept_blocks") >= 1L)
    val words = TermStats.lmFluency(rebuilt, "doc_id", "new_text")
      .join(rebuilt, Seq("doc_id"))
      .select(explode(Text.tokens(col("new_text"))).as("w"))
    val wf = words.groupBy("w").agg(count(lit(1)).as("n"))
    val vocab = wf.orderBy(col("n").desc, col("w").asc).limit(400)
      .withColumnRenamed("n", "f")
    val merges = Bpe.trainMerges(vocab, "w", "f", nMerges = 6)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def pieces(ms: Seq[(String, String)]): Long =
      Bpe.applyMerges(wf.select("w").distinct(), "w", ms)
        .join(wf, Seq("w"))
        .agg(sum(col("n") * col("n_pieces"))).head().getLong(0)
    val p0 = pieces(merges.take(0))
    val p3 = pieces(merges.take(3))
    val p6 = pieces(merges)
    assert(p0 >= p3 && p3 >= p6, s"pieces must be monotone: $p0 >= $p3 >= $p6")
    assert(p6 < p0, "6 trained merges must compress the corpus")
  }

  test("pipeline v3 invariants: selection size, pack conservation, budget fill") {
    // sf0.01: the pool comfortably exceeds the top-150 selection, so the
    // example count must be EXACTLY the selection size; pack token totals
    // conserve example costs; every pack but a shard's last is full to
    // within one example's straddle.
    val v3 = Curation.q115PipelineV3(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(v3.map(_._3).sum == 150L, "every selected doc lands in exactly one pack row")
    assert(v3.forall(_._4 > 0), "no empty packs")
    // within each shard, packs are contiguous from 0
    v3.groupBy(_._1).foreach { case (shard, rows) =>
      val packs = rows.map(_._2).sorted.toSeq
      assert(packs == (0L until packs.length.toLong).toSeq,
        s"shard $shard pack ids not contiguous: $packs")
    }
    graft.Caches.clearAll(spark)
  }
}
