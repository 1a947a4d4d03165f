package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{Similarity, TextDedup}
import graft.sources.Tables

/** The large-scale training-data-pipeline operator suite over the
  * `documents` / `embeddings` tables: text analysis, exact and near-dup
  * deduplication (n-gram Jaccard, MinHash+LSH, SimHash), and similarity
  * search (brute-force + LSH-bucketed ANN).
  *
  * Every query has a DuckDB oracle twin ([[Oracles.llm]]) built on the same
  * md5-derived portable hashes and identical left-fold arithmetic, so even
  * the signature/bucket values hash-match across engines.
  *
  * Scale notes per query live on the operators
  * ([[graft.operators.TextDedup]], [[graft.operators.Similarity]]); the
  * invariant: candidate generation is always an equi-join (shingle, band
  * hash, LSH bucket), never an all-pairs product — except q30's deliberate
  * broadcast of a constant-size query set, which is the textbook
  * distributed brute-force baseline.
  */
object LlmPipelines {

  val ShingleK = 3
  val NumHashes = 16
  val Bands = 4
  val Planes = 8
  val Dims = 64

  /** q24: per-doc text-quality signals — token count, char counts, average
    * token length, stopword ratio, composite quality score (all scaled
    * integers for cross-engine hashing).
    */
  def q24TextStats(spark: SparkSession, d: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    Tables.balanced(spark, d, "documents")
      .select(col("doc_id"), toks.as("toks"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("n_nonspace"))
      .select(col("doc_id"), col("n_chars_raw"),
        size(col("toks")).cast("long").as("n_tokens"),
        Text.stopwordCount(col("toks")).as("n_stop"),
        round(lit(1000.0) * col("n_nonspace") / size(col("toks"))).cast("long")
          .as("avg_token_len_milli"))
      .withColumn("stop_pm",
        round(lit(1000000.0) * col("n_stop") / col("n_tokens")).cast("long"))
      .withColumn("quality_milli",
        round(lit(1000.0) * (lit(0.5) * (col("n_stop") / col("n_tokens"))
          + lit(0.5) * least(lit(1.0), col("n_tokens") / lit(100.0))))
          .cast("long"))
  }

  /** q25: language-ID heuristic (marker-word scores, deterministic
    * tie-break) cross-tabulated against the ground-truth `lang` label.
    */
  def q25LangId(spark: SparkSession, d: String): DataFrame =
    Tables.balanced(spark, d, "documents")
      .select(col("lang"), Text.tokens(col("text")).as("toks"))
      .select(col("lang"), Text.langGuess(col("toks")).as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("cnt"))

  /** q26: document fingerprints — md5 of the whitespace-normalized text
    * (exact-dup key) plus an order-sensitive polynomial rolling hash; the
    * window count exposes exact-dup cluster sizes (sf0.1 contains planted
    * exact dups).
    */
  def q26FingerprintDedup(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.balanced(spark, d, "documents")
      .select(col("doc_id"),
        md5(Text.normalized(col("text"))).as("fp_md5"),
        Text.rollingHash(Text.tokens(col("text"))).as("roll_hash"))
    base.withColumn("n_dups",
      count(lit(1)).over(Window.partitionBy(col("fp_md5"))))
  }

  /** q27: exact n-gram Jaccard near-dup pairs via the inverted shingle
    * index (equi-join on shingle, never all-pairs); threshold 0.8.
    */
  def q27NgramJaccardPairs(spark: SparkSession, d: String): DataFrame =
    TextDedup.ngramJaccardPairs(Tables.balanced(spark, d, "documents"),
        "doc_id", "text", ShingleK, minJacPm = 800000L)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
        col("jac_pm"))

  /** q100: exact SPAN dedup at 3-token block granularity (C4 / Lee et al.
    * 2022 within-corpus repeated-text removal): only the globally-first
    * occurrence of each distinct block survives, documents are rebuilt
    * from their surviving blocks. First-wins is rn=1 under
    * InferWindowGroupLimit: map-side partial top-1 per block, so
    * boilerplate hot blocks forward one row per task (steady-state
    * parity with the min-struct SortAggregate twin, both skew-safe —
    * SCALE.md `spandedup`).
    */
  def q100SpanDedup(spark: SparkSession, d: String): DataFrame =
    TextDedup.spanDedup(Tables.balanced(spark, d, "documents"),
      "doc_id", "text", k = 3)

  /** q102: INCREMENTAL exact span dedup — the q58 asymmetry applied to
    * q100: odd-id docs (the incoming batch) dedup against the distinct
    * block registry of even-id docs (the existing corpus), which is
    * never re-scanned or re-deduped; batch-internal first-wins still
    * applies among the surviving blocks.
    */
  def q102SpanDedupIncremental(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
    // Registry = ALL distinct blocks of the existing corpus (survivors
    // and removed duplicates tile the same block set).
    val existingBlocks = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(graft.functions.Text.blocks(
        graft.functions.Text.tokens(col("text")), 3)).as("blk"))
      .distinct()
    TextDedup.spanDedupAgainst(docs.filter(col("doc_id") % 2 === 1),
      existingBlocks, "doc_id", "text", k = 3)
  }

  /** q28: MinHash+LSH candidate pairs — 16 hashes, 4 bands × 4 rows;
    * output is the agreeing-component count (jaccard estimate ×16).
    */
  def q28MinhashLshPairs(spark: SparkSession, d: String): DataFrame = {
    val sigs = TextDedup.minhashSignatures(Tables.balanced(spark, d, "documents"),
      "doc_id", "text", ShingleK, NumHashes)
    TextDedup.lshCandidatePairs(sigs, NumHashes, Bands)
      .filter(col("n_sig_equal") >= 8)
  }

  /** q43: near-dup clusters — connected components over the q28 candidate
    * pairs, each doc labeled with its component's minimum doc id (the
    * canonical representative) plus the cluster size. The
    * keep-one-per-cluster step every dedup pipeline ends with.
    */
  def q43DupClusters(spark: SparkSession, d: String): DataFrame =
    TextDedup.dupClusters(q28MinhashLshPairs(spark, d), "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("cluster"), col("cluster_size"))

  /** q57: the deduplicated corpus — the end product of the near-dup
    * pipeline a user actually keeps: drop every cluster member except the
    * canonical representative (minimum doc id, from q43), keep everything
    * that was never a candidate. The drop list is orders smaller than the
    * corpus, so the anti-join broadcasts.
    */
  def q57DedupCorpus(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
    val losers = q43DupClusters(spark, d)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
  }

  /** q58: incremental near-dup — the odd-id half of the corpus (the
    * "incoming batch") LSH-checked against the even-id half (the
    * "existing corpus") only
    * ([[TextDedup.lshCandidatePairsAgainst]]: existing×existing pairs
    * never form, the property that makes corpus growth affordable).
    */
  def q58IncrementalNeardup(spark: SparkSession, d: String): DataFrame = {
    // Persist: both halves of the incoming/existing split read the same
    // signature scan. Caller-owned (returned lineage — the TermStats
    // convention; Bench/Verify clearCache() per query).
    val sigs = TextDedup.minhashSignatures(
        Tables.balanced(spark, d, "documents"), "doc_id", "text",
        ShingleK, NumHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    TextDedup.lshCandidatePairsAgainst(
        sigs.filter(col("doc") % 2 === 1), sigs.filter(col("doc") % 2 === 0),
        NumHashes, Bands)
      .filter(col("n_sig_equal") >= 8)
  }

  /** q29: 32-bit SimHash fingerprint per document. */
  def q29Simhash(spark: SparkSession, d: String): DataFrame =
    TextDedup.simhash(Tables.balanced(spark, d, "documents"), "doc_id", "text")
      .select(col("doc").as("doc_id"), col("simhash"))

  /** q30: brute-force cosine top-5 for a 20-vector query set (broadcast
    * against one streamed corpus pass — the exact baseline).
    */
  def q30CosineTopK(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", k = 5)
  }

  /** q31: LSH-bucketed ANN top-3 — candidates restricted to the query's
    * random-projection bucket (the sub-linear scale path).
    */
  def q31AnnLshTopK(spark: SparkSession, d: String): DataFrame =
    Similarity.annTopK(Tables.balanced(spark, d, "embeddings"), "vec_id", "embedding",
      col("vec_id") < 20, Planes, Dims, k = 3)

  /** q155: ANN recall audit — per-probe recall@3 of LSH indexes at THREE
    * bucket widths (2/3/8 planes) against the exact top-3
    * ([[Similarity.recallAudit]]): the recall-vs-cost curve a production
    * vector store tunes against, and the monitor that catches silent
    * retrieval degradation — on this corpus it shows exactly that story
    * (q31's 8-plane index over-shards random embeddings to ~0 recall;
    * 2 planes recovers most of it at 4× the candidate cost).
    * Integer-exact audit arithmetic (hits·1e6 div 3, Spark `div` not
    * `/`); both sides are the proven q30/q31 machinery, so the oracle
    * composes their SQL and the only FP lives inside the search twins.
    */
  def q155AnnRecallAudit(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", k = 3)
    // exact side feeds all three audits; its lineage holds the
    // brute-force scoring — persist caller-owned (the q58 convention)
    val exactP = exact.persist()
    try {
      Seq(2, 3, 8).map { planes =>
        Similarity.recallAudit(exactP,
            Similarity.annTopK(emb, "vec_id", "embedding",
              col("vec_id") < 20, planes, Dims, k = 3), k = 3)
          .withColumn("planes", lit(planes))
      }.reduce(_ unionByName _)
        .localCheckpoint(true)
    } finally { exactP.unpersist(); () }
  }

  /** q169: MMR-diversified retrieval ([[Similarity.mmrDiversify]]) — the
    * re-rank between the dense leg and a context window: each q30 query's
    * exact top-10 is greedily re-ranked to 3 by λ=1/2
    * relevance-minus-redundancy (score doubled to stay integer; the
    * operator scaladoc derives why argmax is unchanged). Candidate
    * pairwise cosines run through the pinned [[Similarity.cosFromNorms]]
    * formula, so the only FP is the proven q30 arithmetic and the greedy
    * itself is pure integer — the oracle unrolls the 3 steps as chained
    * argmax CTEs and the hash pins selection AND tie-breaks.
    *
    * Scale shape: candidate vectors come back from the corpus via a
    * broadcast semi-join of the |Q|·10 id list (never a corpus self-join);
    * the pair build is a self-join of that |Q|·10 slice; the greedy
    * cogroup holds one query's 10 candidates + 90 sims per group.
    */
  def q169MmrDiverse(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    val cands = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 10)
      .persist()
    try {
      val vecs = emb.select(col("vec_id").as("cid"),
          col("embedding").as("v"), Similarity.norm(col("embedding")).as("n"))
        .join(broadcast(cands.select(col("cid")).distinct()), Seq("cid"))
      val ca = cands.select(col("qid"), col("cid").as("a")).join(
        vecs.select(col("cid").as("a"), col("v").as("av"), col("n").as("an")),
        Seq("a"))
      val cb = cands.select(col("qid"), col("cid").as("b")).join(
        vecs.select(col("cid").as("b"), col("v").as("bv"), col("n").as("bn")),
        Seq("b"))
      val sims = ca.join(cb, Seq("qid")).filter(col("a") =!= col("b"))
        .select(col("qid"), col("a"), col("b"),
          Similarity.cosFromNorms(col("av"), col("bv"), col("an"), col("bn"))
            .as("sim_pm"))
      Similarity.mmrDiversify(
          cands.select(col("qid"), col("cid"), col("cos_pm").as("rel_pm")),
          sims, k = 3)
        .localCheckpoint(true)
    } finally { cands.unpersist(); () }
  }

  /** q38: IVF ANN — vectors assigned to the nearest of 8 seed centroids
    * (vec_id < 8), queries (vec_id in [20,30)) search their own cell only
    * (nprobe=1). The data-adaptive bucketed scale path next to q31's
    * hash-bucketed one.
    */
  def q38AnnIvfTopK(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), "vec_id",
        "embedding", col("vec_id") >= 20 && col("vec_id") < 30, k = 3)
      .select(col("qid"), col("cid"), col("cell"), col("cos_pm"), col("rank"))
  }

  /** q39: embedding-cosine near-dup pairs — wide 2-plane LSH buckets for
    * recall, exact cosine ≥ 0.45 (the corpus has no planted embedding
    * dups; the threshold selects the genuine extreme tail).
    */
  def q39EmbeddingNearDup(spark: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.balanced(spark, d, "embeddings"),
      "vec_id", "embedding", planes = 2, dims = Dims, minCosPm = 450000L)

  /** q40: BPE-ish token counting — subword-piece count from
    * [[Text.BpePattern]] (letter runs capped at 4, digit runs at 3,
    * contraction suffixes) plus fertility (pieces per whitespace word,
    * milli) — the tokenizer-budget estimate a training pipeline runs
    * before paying for real BPE.
    */
  def q40BpeTokenCount(spark: SparkSession, d: String): DataFrame =
    Tables.balanced(spark, d, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"),
        Text.bpePieces(col("text")).as("pieces"))
      .select(col("doc_id"),
        size(col("pieces")).cast("long").as("n_bpe"),
        size(col("toks")).cast("long").as("n_ws"),
        round(lit(1000.0) * size(col("pieces")) / size(col("toks")))
          .cast("long").as("fertility_milli"))

  /** q53: the q30 brute-force ranking through [[graft.operators.TopK]]'s
    * partial-aggregation top-k instead of the window — only ≤ k rows per
    * group per map task cross the exchange (the shuffle-minimal form for
    * small k over huge candidate fan-in); results identical by contract.
    */
  def q53TopKAgg(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        Similarity.norm(col("embedding")).as("qn"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      Similarity.norm(col("embedding")).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        Similarity.cosFromNorms(col("qv"), col("cv"), col("qn"), col("cn"))
          .as("cos_pm"))
    graft.operators.TopK.topKByScore(scored, col("qid"), col("cid"),
        col("cos_pm"), k = 5)
      .select(col("group").as("qid"), col("id").as("cid"),
        col("score").as("cos_pm"), col("rank"))
  }

  /** q51: multi-probe IVF ANN — queries search their 2 nearest cells
    * ([[Similarity.ivfTopKProbe]]), the recall knob between q38's
    * nprobe=1 and exact brute force.
    */
  def q51AnnMultiprobe(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    Similarity.ivfTopKProbe(emb, emb.filter(col("vec_id") < 8), "vec_id",
        "embedding", col("vec_id") >= 20 && col("vec_id") < 30, k = 3, nprobe = 2)
      .select(col("qid"), col("cid"), col("cell"), col("cos_pm"), col("rank"))
  }

  /** q55: repeated-table LSH ANN — two independent 6-plane tables,
    * candidates = agreement in at least one ([[Similarity.annTopKMultiTable]]:
    * OR-amplification, the recall knob orthogonal to q51's multi-probe).
    */
  def q55AnnMultiTable(spark: SparkSession, d: String): DataFrame =
    Similarity.annTopKMultiTable(Tables.balanced(spark, d, "embeddings"),
      "vec_id", "embedding", col("vec_id") < 20, planes = 6, tables = 2,
      dims = Dims, k = 3)

  /** q50: k-means training of the IVF index — 3 Lloyd refinements of the
    * 8 seed centroids ([[Similarity.kmeansRefine]]: ordered-fold means,
    * bit-reproducible), emitted as per-component scaled integers plus the
    * final cell populations.
    */
  def q50KmeansRefine(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    Similarity.kmeansRefine(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", iters = 3)
      .select(col("vec_id").as("cell"), col("n_members"),
        posexplode(col("embedding")).as(Seq("i", "m")))
      .select(col("cell"), col("i").cast("long").as("i"),
        round(col("m") * 1000000.0).cast("long").as("m_pm"), col("n_members"))
  }

  /** q41: occupancy-capped adaptive ANN — 2 coarse planes (so the small
    * test corpora actually produce oversized buckets), buckets above 64
    * vectors split by 4 extra planes. The skew-mitigation member of the
    * ANN family: bounded per-bucket work on clustered corpora.
    */
  def q41AnnAdaptiveTopK(spark: SparkSession, d: String): DataFrame =
    Similarity.annTopKAdaptive(Tables.balanced(spark, d, "embeddings"),
      "vec_id", "embedding", col("vec_id") < 20,
      planes = 2, extraPlanes = 4, dims = Dims, k = 3, cap = 64L)

  /** q35: the multimodal pipeline over an opaque binary column (documents
    * text re-encoded as bytes stands in for media blobs): typed metadata
    * (pure column ops) + partition-wise stub decode → per-item features.
    * The bytes never shuffle; only features leave the scan stage.
    */
  def q35BinaryFeatures(spark: SparkSession, d: String): DataFrame = {
    val bin = Tables.balanced(spark, d, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"))
    graft.operators.Multimodal.decodeFeatures(spark, bin, "doc_id", "bytes",
        graft.operators.Multimodal.DeterministicStubCodec)
      .select(col("id").as("doc_id"), col("sizeBytes").as("size_bytes"),
        col("sha"), col("width"), col("height"), col("byteSum").as("byte_sum"),
        col("firstByte").as("first_byte"), col("lastByte").as("last_byte"))
  }

  /** q36: frame-sampling stub — each blob fans out into 4 per-frame rows
    * (hash + length), the partition-local explode shape of real frame
    * extraction.
    */
  def q36FrameSample(spark: SparkSession, d: String): DataFrame = {
    val bin = Tables.balanced(spark, d, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"))
    graft.operators.Multimodal.sampleFrames(spark, bin, "doc_id", "bytes", 4)
      .select(col("id").as("doc_id"), col("frame"), col("frame_sha"),
        col("frame_bytes"))
  }

  /** Deterministic synthetic P6 images rendered FROM the ASCII corpus —
    * the fixture's stand-in for camera bytes: dimensions from the first/
    * last character (1–16 each), pixel payload = the text cycled to
    * exactly 3·w·h bytes, a real binary P6 the [[graft.operators.Multimodal.Ppm]]
    * parser round-trips. ASCII-only, so the DuckDB twin rebuilds the
    * identical bytes as a string.
    */
  private[graft] def renderedPpm(spark: SparkSession, d: String): DataFrame =
    renderedPpmOf(Tables.balanced(spark, d, "documents"))

  /** The rendering itself over any (doc_id, text) frame — shared with the
    * imagededup scale probe so the probe measures the REGISTERED
    * operator chain on scaled fixtures, not a fork of it.
    */
  private[graft] def renderedPpmOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", expr("1 + ascii(substring(text, 1, 1)) % 16"))
      .withColumn("h", expr("1 + ascii(substring(text, length(text), 1)) % 16"))
      .select(col("doc_id"), encode(concat(
        lit("P6"), expr("chr(10)"), col("w").cast("string"), lit(" "),
        col("h").cast("string"), expr("chr(10)"), lit("255"), expr("chr(10)"),
        expr("substring(repeat(text, CAST(w*h*3 div length(text) AS INT) + 1), 1, w*h*3)")),
        "utf-8").as("ppm"))

  /** q42: REAL pixel-domain resize — the rendered P6 blobs are parsed
    * (genuine header decode, [[graft.operators.Multimodal.resizePpm]])
    * and nearest-neighbor downscaled by stride 2; output carries parsed
    * original dims, resized dims, byte counts, and the md5 of the
    * re-rendered P6. The oracle rebuilds the same bytes relationally, so
    * a hash match proves the parse → 2D sample → re-render loop exact.
    */
  def q42PpmResize(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.resizePpm(spark, renderedPpm(spark, d),
        "doc_id", "ppm", 2)
      .select(col("id").as("doc_id"), col("w"), col("h"), col("wo"),
        col("ho"), col("orig_bytes"), col("resized_bytes"), col("resized_sha"))

  /** q121: image perceptual-hash near-dup pairs — the multimodal member
    * of the dedup family: the rendered P6 blobs are REALLY decoded
    * ([[graft.operators.Multimodal.dHashPpm]] — header parse, 9×7 luma
    * grid, 56-bit difference hash), then paired by hamming distance ≤ 2
    * through the same pigeonhole banding the simhash path uses
    * ([[graft.operators.TextDedup.hammingPairs]], bands = 8 → exact
    * recall for hamming ≤ 7; never all-pairs). The oracle recomputes the
    * identical hash relationally from the rebuilt pixel string and
    * confirms pairs by brute force — a hash match proves decode, grid
    * sampling, bit assembly, and banding recall end to end.
    */
  def q121ImageNearDup(spark: SparkSession, d: String): DataFrame =
    graft.operators.TextDedup.hammingPairs(
      graft.operators.Multimodal.dHashPpm(spark, renderedPpm(spark, d),
          "doc_id", "ppm")
        .select(col("id").as("doc"), col("dhash")),
      "doc", "dhash", bits = 56, maxHamming = 2, bands = 8)

  /** Deterministic PNGs rendered from the ASCII corpus — the SAME pixel
    * definition as [[renderedPpmOf]] (dims from first/last char, text
    * cycled to 3·w·h bytes) but serialized through the REAL
    * entropy-coded [[graft.operators.Png]] encoder with the scanline
    * filter cycling row % 5, so every decode exercises all five filter
    * reconstructions AND the zlib inflate. Sharing the pixel definition
    * is the point: the q121 oracle CTEs apply verbatim, and a hash
    * match proves filter → deflate → inflate → unfilter pixel-exact.
    */
  private[graft] def renderedPngOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = text.getBytes("US-ASCII")
        val n = t.length
        val w = 1 + (t(0) & 0xff) % 16
        val h = 1 + (t(n - 1) & 0xff) % 16
        val px = new Array[Byte](3 * w * h)
        var i = 0
        while (i < px.length) { px(i) = t(i % n); i += 1 }
        (id, graft.operators.Png.encode(w, h, px))
      })
      .toDF("doc_id", "png")
  }

  /** q145: REAL PNG decode — the fourth real codec and the first
    * entropy-coded one ([[graft.operators.Png]]: CRC-checked chunk
    * walk, JDK zlib inflate, all five scanline-filter reconstructions).
    * The oracle rebuilds the pixels from their DEFINITION (the q42/q121
    * CTEs) and compares dims, byte sum, endpoints, and the pixel
    * buffer's md5 — hash equality proves the whole compressed round
    * trip byte-exact, the q137 epistemics for a format with an entropy
    * codec in the middle.
    */
  def q145PngStats(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.pngPixelStats(spark,
        renderedPngOf(Tables.balanced(spark, d, "documents")),
        "doc_id", "png")
      .select(col("id").as("doc_id"), col("width"), col("height"),
        col("px_sum"), col("px_first"), col("px_last"), col("px_md5"))

  /** q146: PNG near-dup — the compressed-image member of the perceptual
    * dedup family, and the proof the EXISTING machine serves it
    * unchanged: [[graft.operators.Multimodal.dHashPng]] is the same
    * 56-bit dHash core over [[graft.operators.Png.decode]]'s pixels, so
    * the fingerprints (and therefore the pairs) are IDENTICAL to what
    * the uncompressed P6 path produces on the same pixel definition —
    * the oracle is q121's SQL verbatim. Same banding, same registries,
    * same streams; only the codec seam changed.
    */
  def q146PngNearDup(spark: SparkSession, d: String): DataFrame =
    graft.operators.TextDedup.hammingPairs(
      graft.operators.Multimodal.dHashPng(spark,
          renderedPngOf(Tables.balanced(spark, d, "documents")),
          "doc_id", "png")
        .select(col("id").as("doc"), col("dhash")),
      "doc", "dhash", bits = 56, maxHamming = 2, bands = 8)

  /** Deterministic grayscale JPEGs rendered from the ASCII corpus —
    * the entropy-coded fixture with an EXACTNESS guarantee: every 8×8
    * block is CONSTANT (its value one text character), and
    * constant-block images are a fixed point of the quant-1 baseline
    * pipeline ([[graft.operators.Jpeg]] scaladoc + JpegSpec), so the
    * decode is byte-exact and a DuckDB oracle can rebuild the decoded
    * samples from this definition. Dims 8·(1 + a1 % 4) × 8·(1 + aN % 4);
    * block (bx, by) carries text((by·wb + bx) mod n).
    */
  private[graft] def renderedJpegOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = text.getBytes("US-ASCII")
        val n = t.length
        val wb = 1 + (t(0) & 0xff) % 4
        val hb = 1 + (t(n - 1) & 0xff) % 4
        val w = 8 * wb; val h = 8 * hb
        val s = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            s(y * w + x) = t(((y / 8) * wb + (x / 8)) % n)
            x += 1
          }
          y += 1
        }
        (id, graft.operators.Jpeg.encode(w, h, s))
      })
      .toDF("doc_id", "jpeg")
  }

  /** q148: REAL baseline-JPEG decode — the fifth real codec, with its
    * own full entropy stack (Huffman tables, bit reader with marker
    * unstuffing, zigzag, dequant, IDCT). The oracle recomputes the
    * decoded samples from the constant-block DEFINITION — hash equality
    * proves marker walk → Huffman → DCT chain byte-exact (the q145
    * epistemics, now for a LOSSY format pinned at its fixed point).
    */
  def q148JpegStats(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.jpegLumaStats(spark,
        renderedJpegOf(Tables.balanced(spark, d, "documents")),
        "doc_id", "jpeg")
      .select(col("id").as("doc_id"), col("width"), col("height"),
        col("luma_sum"), col("luma_first"), col("luma_last"), col("luma_md5"))

  /** q149: JPEG near-dup — the entropy-coded member of the perceptual
    * dedup family: [[graft.operators.Multimodal.dHashJpeg]] is the same
    * 56-bit core over the decoded luma (expanded to (s,s,s) triplets),
    * paired by the SAME hamming banding as q121/q135/q138/q146. The
    * oracle recomputes the dHash relationally from the block definition
    * and confirms pairs by brute force.
    */
  def q149JpegNearDup(spark: SparkSession, d: String): DataFrame =
    graft.operators.TextDedup.hammingPairs(
      graft.operators.Multimodal.dHashJpeg(spark,
          renderedJpegOf(Tables.balanced(spark, d, "documents")),
          "doc_id", "jpeg")
        .select(col("id").as("doc"), col("dhash")),
      "doc", "dhash", bits = 56, maxHamming = 2, bands = 8)

  /** Deterministic minimal MP4s rendered from the ASCII corpus — the
    * av-container fixture: 1 + a1 % 3 tracks alternating video/audio
    * handlers, every numeric field a pure integer function of the text
    * (the DuckDB twin recomputes them all), mdat carrying the text
    * bytes (skipped by the walker, as in production).
    */
  private[graft] def renderedMp4Of(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = text.getBytes("US-ASCII")
        val n = t.length
        val a1 = t(0) & 0xff
        val aN = t(n - 1) & 0xff
        val nt = 1 + a1 % 3
        val tracks = (0 until nt).map { k =>
          val vide = k % 2 == 0
          val sc = 1 + (a1 + 3 * k) % 50
          graft.operators.Mp4.Track(
            id = k + 1L,
            handler = if (vide) "vide" else "soun",
            timescale = if (vide) 90000L else 48000L,
            duration = (n + 7L * k) * 100L,
            sampleCount = sc.toLong,
            sampleBytes = sc.toLong * (10L + (aN + 5 * k) % 90) + k % 3)
        }
        val movie = graft.operators.Mp4.Movie("isom", 1000L, n * 40L,
          tracks.toVector)
        (id, graft.operators.Mp4.render(movie, t))
      })
      .toDF("doc_id", "mp4")
  }

  /** q150: REAL ISO BMFF box walk — per-track codec-agnostic metadata
    * (handlers, timescales, durations, sample counts/bytes) recovered
    * from nested length-typed boxes
    * ([[graft.operators.Multimodal.mp4TrackStats]]). The oracle
    * recomputes every field from the fixture DEFINITION — equality
    * proves the render → box walk → stsz summation loop exact. The av
    * container leaves the stub list; only the sample-data codecs stay
    * behind the seam.
    */
  def q150Mp4Tracks(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.mp4TrackStats(spark,
        renderedMp4Of(Tables.balanced(spark, d, "documents")),
        "doc_id", "mp4")
      .select(col("id").as("doc_id"), col("brand"), col("movie_timescale"),
        col("movie_duration"), col("track_id"), col("handler"),
        col("track_timescale"), col("track_duration"), col("sample_count"),
        col("sample_bytes"))

  /** Deterministic MP3 streams rendered from the ASCII corpus: 1 + a1 % 4
    * frames, frame f with bitrate index 1 + (a1 + 3f) % 14, sample-rate
    * index (aN + f) % 3, padding (a1 + aN + f) % 2 — so frame lengths
    * exercise the whole Layer-III table — payload the text cycled from
    * offset f.
    */
  private[graft] def renderedMp3Of(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = text.getBytes("US-ASCII")
        val n = t.length
        val a1 = t(0) & 0xff
        val aN = t(n - 1) & 0xff
        val frames = (0 until 1 + a1 % 4).map { f =>
          graft.operators.Mp3.renderFrame(
            bitrateIdx = 1 + (a1 + 3 * f) % 14,
            sampleRateIdx = (aN + f) % 3,
            padded = (a1 + aN + f) % 2 == 1,
            payload = len => Array.tabulate(len)(i => t((f + i) % n)))
        }
        (id, graft.operators.Mp3.render(frames))
      })
      .toDF("doc_id", "mp3")
  }

  /** q151: REAL MP3 frame walk — every frame boundary from its OWN
    * header's table-validated slot arithmetic
    * ([[graft.operators.Multimodal.mp3FrameStats]]); per frame the
    * declared bitrate/sample-rate, computed length, and payload
    * sum + hash. The oracle recomputes lengths from the same public
    * Layer-III tables and rebuilds each payload from the cycled-text
    * definition — hash equality proves the framing byte-exact. Only
    * the psychoacoustic payload decode remains stubbed.
    */
  def q151Mp3Frames(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.mp3FrameStats(spark,
        renderedMp3Of(Tables.balanced(spark, d, "documents")),
        "doc_id", "mp3")
      .select(col("id").as("doc_id"), col("frame"), col("bitrate_kbps"),
        col("sample_rate"), col("frame_bytes"), col("payload_sum"),
        col("payload_md5"))

  /** q152: AV-INGEST CARD — the q144 datasheet idea over the av
    * CONTAINER walkers: per source, what the routing layer knows before
    * any codec runs — track mix (video vs audio tracks per MP4), sample
    * volume (counts and bytes from stsz), and MP3 stream shape (frames,
    * payload bytes, bitrate mass). ONE box walk and ONE frame walk
    * serve everything; rollups are doc-keyed then source-keyed
    * aggregates, no windows, no all-pairs — the shape of a petabyte
    * ingest inventory job.
    */
  def q152AvIngestCard(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
    val srcOf = docs.select(col("doc_id"), col("source"))
    val mp4 = graft.operators.Multimodal.mp4TrackStats(spark,
        renderedMp4Of(docs), "doc_id", "mp4")
      .groupBy(col("id").as("doc_id"))
      .agg(sum(when(col("handler") === "vide", 1L).otherwise(0L))
          .as("video_tracks"),
        sum(when(col("handler") === "soun", 1L).otherwise(0L))
          .as("audio_tracks"),
        sum(col("sample_count")).as("mp4_samples"),
        sum(col("sample_bytes")).as("mp4_sample_bytes"))
    val mp3 = graft.operators.Multimodal.mp3FrameStats(spark,
        renderedMp3Of(docs), "doc_id", "mp3")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("mp3_frames"),
        sum(col("frame_bytes") - 4L).as("mp3_payload_bytes"),
        sum(col("bitrate_kbps").cast("long")).as("mp3_kbps_sum"))
    srcOf.join(mp4, Seq("doc_id")).join(mp3, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("video_tracks")).as("video_tracks"),
        sum(col("audio_tracks")).as("audio_tracks"),
        sum(col("mp4_samples")).as("mp4_samples"),
        sum(col("mp4_sample_bytes")).as("mp4_sample_bytes"),
        sum(col("mp3_frames")).as("mp3_frames"),
        sum(col("mp3_payload_bytes")).as("mp3_payload_bytes"),
        expr("(1000 * sum(mp3_kbps_sum)) div sum(mp3_frames)")
          .as("mp3_mean_kbps_milli"))
  }

  /** q124: PIPELINE v4 — the multimodal curation composition of this
    * round's operators: render → REAL P6 decode → 56-bit dHash →
    * perceptual EXACT dedup (first-wins per fingerprint: identical
    * dHash ⇒ visually identical under the hash's resolution — the
    * byte-level exact-dedup rule lifted to the pixel domain) →
    * temperature-resampled selection (α = 0.5 over `source`, 200 docs)
    * of the surviving corpus. Scale shape: decode row-local, dedup one
    * fingerprint-keyed window, resample one group window + broadcast
    * targets — no all-pairs anywhere. Output: the selected (doc_id,
    * source) set, hash-compared.
    */
  def q124PipelineV4(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
    val reps = graft.operators.Dedup.keepFirst(
      graft.operators.Multimodal.dHashPpm(spark, renderedPpmOf(docs),
        "doc_id", "ppm"),
      Seq(col("dhash")), Seq(col("id").asc))
    val survivors = docs.join(reps.select(col("id").as("doc_id")), Seq("doc_id"))
    graft.operators.Sampling.temperatureResample(survivors,
        "source", "doc_id", "v4", total = 200L)
      .select(col("doc_id"), col("source"))
  }

  /** Deterministic WAV rendering over any (doc_id, text) frame: sample_i
    * = (byte_i − 96)·256 (letters land at ±small amplitudes, spaces at
    * −16384 — the "loud" events), mono PCM16 at 8 kHz through the REAL
    * RIFF writer ([[graft.operators.Multimodal.Wav.render]], LIST-INFO
    * chunk included so decode always exercises the walker's skip path).
    */
  private[graft] def renderedWavOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val samples = text.getBytes("US-ASCII")
          .map(b => (((b & 0xff) - 96) * 256).toShort)
        (id, graft.operators.Multimodal.Wav.render(8000, samples))
      })
      .toDF("doc_id", "wav")
  }

  /** q134: REAL audio decode + windowed activity — the rendered WAVs
    * parsed back by the genuine RIFF chunk walker and reduced to
    * per-clip integer stats plus a 100-sample-window mean-|amplitude|
    * activity gate (the VAD-lite segmentation precursor). The oracle
    * recomputes every stat from the sample DEFINITION — hash equality
    * proves the JVM render → walk → parse round trip preserved every
    * sample, the q42 epistemics in the audio domain.
    */
  def q134AudioStats(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.pcmWindowStats(spark,
        renderedWavOf(Tables.balanced(spark, d, "documents")),
        "doc_id", "wav", window = 100, activeMeanAbs = 5600L)
      .select(col("id").as("doc_id"), col("sample_rate"), col("n_samples"),
        col("sample_sum"), col("sample_sqsum"), col("peak_abs"),
        col("n_windows"), col("active_windows"))

  /** q135: acoustic-fingerprint near-dup — the audio member of the
    * perceptual dedup family (q121's image dHash, q67's text SimHash):
    * the rendered clips' energy envelopes become 56-bit rise/fall
    * fingerprints ([[graft.operators.Multimodal.audioFingerprint]],
    * 8-sample windows) paired by the SAME hamming pigeonhole banding
    * the image path uses — dedup × {text, image, audio}, one pairing
    * machine.
    */
  def q135AudioNearDup(spark: SparkSession, d: String): DataFrame =
    graft.operators.TextDedup.hammingPairs(
      graft.operators.Multimodal.audioFingerprint(spark,
          renderedWavOf(Tables.balanced(spark, d, "documents")),
          "doc_id", "wav", window = 8)
        .select(col("id").as("doc"), col("afp")),
      "doc", "afp", bits = 56, maxHamming = 4, bands = 8)

  /** Deterministic P6-STREAM "videos" rendered from the ASCII corpus —
    * the video fixture completing the media trio (q121 images, q134
    * audio): each document becomes 1–4 concatenated P6 frames (count
    * from the first character), frame f sized (1 + (a1 + 3f) % 12) ×
    * (1 + (aN + 5f) % 12) with its pixel payload the text cycled FROM
    * OFFSET f — consecutive frames are the same text shifted one byte,
    * a camera pan's statistical shape, so near-identical documents
    * yield near-identical frame SEQUENCES. ASCII-only; the DuckDB twin
    * rebuilds every frame's bytes as a string.
    */
  private[graft] def renderedP6StreamOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = text.getBytes("US-ASCII")
        val n = t.length
        val a1 = t(0) & 0xff
        val aN = t(n - 1) & 0xff
        val nFrames = 1 + a1 % 4
        val frames = (0 until nFrames).map { f =>
          val w = 1 + (a1 + 3 * f) % 12
          val h = 1 + (aN + 5 * f) % 12
          val px = new Array[Byte](3 * w * h)
          var i = 0
          while (i < px.length) { px(i) = t((f + i) % n); i += 1 }
          graft.operators.Multimodal.Ppm.render(w, h, 255, px)
        }
        (id, graft.operators.Multimodal.P6Stream.render(frames))
      })
      .toDF("doc_id", "video")
  }

  /** q137: REAL video frame sampling — the rendered P6 streams walked
    * back by [[graft.operators.Multimodal.videoFrameStats]] (every
    * frame boundary from the previous frame's PARSED header, stride-2
    * sampling: frames 0 and 2) and reduced to per-frame dims, byte sum,
    * and content hash. The oracle recomputes every stat from the frame
    * DEFINITION — hash equality proves render → concatenate → walk →
    * parse preserved every frame byte (q134's epistemics in the video
    * domain).
    */
  def q137VideoFrames(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.videoFrameStats(spark,
        renderedP6StreamOf(Tables.balanced(spark, d, "documents")),
        "doc_id", "video", stride = 2)
      .select(col("id").as("doc_id"), col("frame"), col("width"),
        col("height"), col("frame_bytes"), col("byte_sum"), col("frame_sha"))

  /** q138: video near-dup — the video member of the perceptual dedup
    * family, built from parts that already exist: per-frame 56-bit
    * dHash ([[graft.operators.Multimodal.videoDHash]] — the image hash
    * applied to walked frames), the SAME hamming pigeonhole banding as
    * q121/q135 with (video, frame) packed into the pairing key (frame <
    * 4, so key = doc·4 + frame), pairs filtered to frame-ALIGNED
    * cross-video matches, and a per-video-pair rollup (matched-frame
    * count + closest distance). Scale shape: decode row-local, banding
    * never all-pairs, rollup one pair-keyed aggregate.
    */
  def q138VideoNearDup(spark: SparkSession, d: String): DataFrame =
    graft.operators.TextDedup.hammingPairs(
        graft.operators.Multimodal.videoDHash(spark,
            renderedP6StreamOf(Tables.balanced(spark, d, "documents")),
            "doc_id", "video")
          .select((col("id") * 4 + col("frame")).as("doc"), col("dhash")),
        "doc", "dhash", bits = 56, maxHamming = 2, bands = 8)
      .filter(pmod(col("doc_a"), lit(4)) === pmod(col("doc_b"), lit(4)))
      .select(expr("doc_a div 4").as("doc_a"),
        expr("doc_b div 4").as("doc_b"), col("hamming"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_frames_matched"),
        min(col("hamming")).as("min_hamming"))

  /** q140: SHIFT-TOLERANT video near-dup — q138's frame-ALIGNED pairing
    * misses the most common real-world video duplicate, the TRIMMED
    * re-upload: drop one leading frame and every index shifts, so no
    * aligned pair survives (the exact failure fixed windows have
    * against a 3-token edit, q130's chunking lesson in the video
    * domain — pinned in MultimodalSpec with a trimmed fixture q138
    * scores ZERO on). This form pairs frames by fingerprint alone
    * (same banding machine, no frame-index condition), drops same-video
    * pairs, and rolls up matched frame-pair count + closest distance
    * per video pair — a trimmed/re-cut video keeps its per-frame
    * fingerprints and still matches. Cost: identical banding shuffle;
    * the rollup output grows with cross-video frame matches (capped by
    * `maxBucket` at production scale like every hamming family).
    */
  def q140VideoNearDupShifted(spark: SparkSession, d: String): DataFrame =
    graft.operators.TextDedup.hammingPairs(
        graft.operators.Multimodal.videoDHash(spark,
            renderedP6StreamOf(Tables.balanced(spark, d, "documents")),
            "doc_id", "video")
          .select((col("id") * 4 + col("frame")).as("doc"), col("dhash")),
        "doc", "dhash", bits = 56, maxHamming = 2, bands = 8)
      .filter(expr("doc_a div 4") =!= expr("doc_b div 4"))
      .select(expr("doc_a div 4").as("doc_a"),
        expr("doc_b div 4").as("doc_b"), col("hamming"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_frame_pairs"),
        min(col("hamming")).as("min_hamming"))

  /** q141: keyframe selection ([[graft.operators.Multimodal.keyframes]])
    * — the scene assignment (running cut count, q139's 8-bit threshold)
    * rolled to one row per scene with its first frame as the keyframe
    * and the keyframe's dHash riding along for downstream cross-video
    * dedup. The frames-to-scenes contraction is the point: captioning/
    * embedding cost drops from Σ frames to Σ scenes.
    */
  def q141VideoKeyframes(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.keyframes(spark,
        renderedP6StreamOf(Tables.balanced(spark, d, "documents")),
        "doc_id", "video", minHamming = 8)
      .select(col("id").as("doc_id"), col("scene"), col("keyframe"),
        col("scene_frames"), col("keyframe_dhash"))

  /** q142: PIPELINE v6 — the video curation composition: walk → per-frame
    * dHash → scene assignment → keyframes (q141) → corpus-wide keyframe
    * exact dedup (global first-wins per fingerprint, the q124 rule at
    * scene granularity) → per-video VISUAL NOVELTY rollup: how many of a
    * video's scenes carry a keyframe no earlier (video, scene) already
    * showed. The dedup-aware selection signal a video corpus is actually
    * curated on — a re-upload scores ~0, fresh footage ~10^6. Scale
    * shape: decode row-local, one video-keyed exchange for scenes, one
    * fingerprint-keyed window for the global first-wins, one video
    * rollup; no all-pairs anywhere.
    */
  def q142VideoPipelineV6(spark: SparkSession, d: String): DataFrame = {
    // Global first-wins as the AGG TWIN (r14, kfnovel probe): the rank
    // window over partitionBy(keyframe_dhash) cannot be group-limit
    // pruned, so an identical-fingerprint mega-cluster (the videodedup
    // fixture's ~20% single-value population) sorts in ONE window
    // partition; min(struct(id, scene)) per fingerprint is map-side
    // combinable — the cluster collapses before the exchange (q100's
    // agg-twin rule). Equal output at every probed factor, faster at
    // 64× (0.51 vs 0.71 s), and the gap is structural: window cost
    // tracks the biggest cluster, agg cost tracks distinct fingerprints.
    // Persist: the owners agg and the per-video scene count both read
    // the keyframe frame, and its lineage is the render→walk→decode
    // chain — without the cache the agg twin would DECODE TWICE.
    // Caller-owned (the q58/TermStats convention; Bench/Verify
    // clearAll() per query).
    val kf = graft.operators.Multimodal.keyframes(spark,
        renderedP6StreamOf(Tables.balanced(spark, d, "documents")),
        "doc_id", "video", minHamming = 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val owners = kf
      .groupBy(col("keyframe_dhash"))
      .agg(min(struct(col("id"), col("scene"))).as("f"))
      .groupBy(col("f.id").as("id"))
      .agg(count(lit(1)).as("novel_scenes"))
    kf.groupBy(col("id")).agg(count(lit(1)).as("n_scenes"))
      .join(owners, Seq("id"), "left_outer")
      .select(col("id").as("doc_id"), col("n_scenes"),
        coalesce(col("novel_scenes"), lit(0L)).as("novel_scenes"),
        expr("(1000000 * coalesce(novel_scenes, 0)) div n_scenes")
          .as("novelty_pm"))
  }

  /** q139: scene-cut detection ([[graft.operators.Multimodal.sceneCuts]])
    * over the rendered P6 streams — consecutive frames' dHash hamming
    * distance against a cut threshold of 8 bits, per-video frame/cut/
    * scene counts plus the motion-hamming sum. The fixture's per-frame
    * dimension changes + one-byte pixel pan make inter-frame distances
    * genuinely varied (some streams read "static", others all-cuts), so
    * the threshold does real work; the oracle recomputes every hash and
    * lag relationally.
    */
  def q139VideoScenes(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.sceneCuts(spark,
        renderedP6StreamOf(Tables.balanced(spark, d, "documents")),
        "doc_id", "video", minHamming = 8)
      .select(col("id").as("doc_id"), col("n_frames"), col("n_cuts"),
        col("n_scenes"), col("motion_hamming"))

  /** q143: VAD segmentation ([[graft.operators.Multimodal.audioSegments]])
    * — q134's activity gate turned into SEGMENTS: contiguous runs of
    * active 100-sample windows become the speech-ish clips an ASR
    * pipeline extracts (gaps-and-islands over the decoded envelope, the
    * audio sessionize). The oracle rebuilds windows, islands, and
    * numbering from the sample definition.
    */
  def q143AudioSegments(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.audioSegments(spark,
        renderedWavOf(Tables.balanced(spark, d, "documents")),
        "doc_id", "wav", window = 100, activeMeanAbs = 5600L)
      .select(col("id").as("doc_id"), col("seg"), col("start_window"),
        col("end_window"), col("n_windows"), col("mean_abs_sum"))

  /** q144: MULTIMODAL dataset card — q132's datasheet idea (Gebru 2018)
    * extended across modalities, per source: audio activity (active /
    * total VAD windows, ppm — how much of the audio is speech-ish),
    * video density (frames and scenes per video, milli — static clips
    * vs cut-heavy footage), and mean visual novelty after corpus-wide
    * keyframe dedup (q142's signal rolled to the source grain — which
    * sources bring NEW footage vs re-uploads). ONE audio decode and ONE
    * video decode serve everything: the per-frame fingerprints feed the
    * scene lag, the keyframe arg_min, and the novelty window from a
    * single pass (the operators' internals are the same window algebra,
    * re-clustered here so the card never decodes twice).
    */
  def q144MultimodalCard(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
    val srcOf = docs.select(col("doc_id"), col("source"))
    // audio side: one WAV decode → per-clip window totals
    val audio = graft.operators.Multimodal.pcmWindowStats(spark,
        renderedWavOf(docs), "doc_id", "wav", window = 100,
        activeMeanAbs = 5600L)
      .select(col("id").as("doc_id"), col("n_windows"), col("active_windows"))
    // video side: one walk+decode → scenes AND keyframe novelty
    val byFrame = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("frame").asc)
    val runningCuts = byFrame
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val fp = graft.operators.Multimodal.videoDHash(spark,
        renderedP6StreamOf(docs), "doc_id", "video")
      .withColumn("__prev", lag(col("dhash"), 1).over(byFrame))
      .withColumn("__cut", when(col("__prev").isNotNull &&
        bit_count(col("__prev").bitwiseXOR(col("dhash"))) > 8, 1L)
        .otherwise(0L))
      .withColumn("scene", sum(col("__cut")).over(runningCuts))
    val keyframes = fp.groupBy(col("id"), col("scene"))
      .agg(min_by(col("dhash"), col("frame")).as("kd"),
        count(lit(1)).as("scene_frames"))
      // caller-owned persist: owners + novelty both read this frame and
      // its lineage is the video decode (same rule as q142)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // first-wins as the map-side-combinable agg twin — q142's r14 form
    // (kfnovel probe); the rank-window original skews on fingerprint
    // mega-clusters
    val owners = keyframes
      .groupBy(col("kd"))
      .agg(min(struct(col("id"), col("scene"))).as("f"))
      .groupBy(col("f.id").as("id"))
      .agg(count(lit(1)).as("novel_scenes"))
    val novelty = keyframes
      .groupBy(col("id"))
      .agg(sum(col("scene_frames")).as("n_frames"),
        count(lit(1)).as("n_scenes"))
      .join(owners, Seq("id"), "left_outer")
      .select(col("id"), col("n_frames"), col("n_scenes"),
        coalesce(col("novel_scenes"), lit(0L)).as("novel_scenes"))
    srcOf
      .join(audio, Seq("doc_id"))
      .join(novelty.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_windows")).as("audio_windows"),
        expr("(1000000 * sum(active_windows)) div sum(n_windows)")
          .as("audio_active_pm"),
        expr("(1000 * sum(n_frames)) div count(1)").as("frames_per_video_milli"),
        expr("(1000 * sum(n_scenes)) div count(1)").as("scenes_per_video_milli"),
        expr("(1000000 * sum(novel_scenes)) div sum(n_scenes)")
          .as("visual_novelty_pm"))
  }

  /** q96: the decode member over the same rendered P6 blobs through the
    * REAL [[graft.operators.Multimodal.PpmCodec]] — width/height from the
    * parsed header, byteSum/first/last over the pixel payload only.
    */
  def q96PpmDecode(spark: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.decodeFeatures(spark, renderedPpm(spark, d),
        "doc_id", "ppm", graft.operators.Multimodal.PpmCodec)
      .select(col("id").as("doc_id"), col("sizeBytes").as("size_bytes"),
        col("sha"), col("width"), col("height"), col("byteSum").as("byte_sum"),
        col("firstByte").as("first_byte"), col("lastByte").as("last_byte"))

  /** q79: PQ encode ([[Similarity.pqEncode]]) — every embedding compressed
    * to four 4-bit codes + the packed 2-byte word. The oracle recomputes
    * the per-subspace L2 argmin from the printed codebook constants, so
    * the codes (and the tie rule) are verified end to end.
    */
  def q79PqEncode(spark: SparkSession, d: String): DataFrame =
    Similarity.pqEncode(Tables.balanced(spark, d, "embeddings"),
      "vec_id", "embedding")

  /** q80: ADC top-k over PQ codes ([[Similarity.pqAdcTopK]]) — the
    * compressed-corpus scan: exact query vectors, 2-byte corpus rows.
    */
  def q80PqAdcTopk(spark: SparkSession, d: String): DataFrame =
    Similarity.pqAdcTopK(Tables.balanced(spark, d, "embeddings"),
      "vec_id", "embedding", col("vec_id") < 20, k = 3)

  /** q81: IVF-PQ ([[Similarity.ivfPqTopK]]) — q38's cells prune, q80's
    * codes score; same seed/query split as q38 so the two are directly
    * comparable.
    */
  def q81IvfPqTopk(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", col("vec_id") >= 20 && col("vec_id") < 30, k = 3)
  }

  /** q92: the MATERIALIZED IVF-PQ search — q81's semantics split into its
    * production phases. Phase 1 builds the `(cid, cell, code0..3)` index
    * ([[Similarity.buildIvfPqIndex]]) and WRITES it as a parquet table —
    * the pay-once-at-ingest step. Phase 2 cell-assigns only the query set
    * (|Q|·|cells| dots) and searches the RE-READ table
    * ([[Similarity.ivfPqTopKIndexed]]): the scan side is 2-byte codes,
    * never vectors, which is why the probe measures this phase flat at
    * 0.5–1.0s across 64× corpus growth while the e2e q81 form grows to
    * 30s. End state equals q81 by construction, so the oracle IS q81's
    * SQL; what this row verifies beyond the equivalence spec: the index
    * survives a storage round-trip (schema, codes, cells) and the query
    * phase alone reproduces the full ranking.
    */
  def q92IvfPqIndexed(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
    // deterministic per-(session, source) artifact path, overwritten each
    // refresh (a fresh temp dir per call leaked one directory per
    // invocation; a cross-session shared path raced overwrite-vs-read)
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_ivfpq_index_" + spark.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)).toString
    Similarity.buildIvfPqIndex(emb, cents, "vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val queries = Similarity.ivfAssign(
        emb.filter(col("vec_id") >= 20 && col("vec_id") < 30), cents,
        "vec_id", "embedding")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("cell"))
    Similarity.ivfPqTopKIndexed(index, queries, k = 3)
  }

  /** q93: PQ encode with KMEANS-TRAINED codebooks — the proof that
    * "training swaps the constants, not the operator". Per subspace the
    * corpus slice is Lloyd-refined from the 16 lowest-id seed slices
    * (2 iterations, [[Similarity.trainPqCodebooks]]) and the trained
    * centroids replace the md5 constants in the SAME [[Similarity.pqEncode]]
    * kernel. The oracle re-runs the identical per-subspace Lloyd chain in
    * SQL (the q50 twin pattern, 16-dim slices) and encodes with ITS
    * trained codebooks — codes match only if training AND encode agree
    * bit-for-bit end to end.
    */
  def q93PqTrained(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    val trained = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      col("vec_id") < Similarity.PqK, iters = 2)
    Similarity.pqEncode(emb, "vec_id", "embedding", codebook = trained)
  }

  /** q97: the PRODUCTION ANN stack end to end — every constant trained,
    * every phase materialized, in one oracle-checked query:
    *
    *  1. coarse quantizer: 2 Lloyd iterations refine the 8 seed centroids
    *     over the full corpus ([[Similarity.kmeansRefine]]);
    *  2. PQ codebooks: per-subspace Lloyd on a FIXED 500-vector training
    *     sample ([[Similarity.trainPqCodebooks]] — production trains on a
    *     sample precisely so training cost is independent of corpus
    *     size);
    *  3. index: the (cell, code) table built with the trained constants
    *     and written to parquet ([[Similarity.buildIvfPqIndex]], the
    *     pay-once ingest step);
    *  4. search: cell-assigned queries ADC-scan the re-read 2-byte table
    *     ([[Similarity.ivfPqTopKIndexed]]).
    *
    * The oracle replays the identical composition in SQL — the q50 Lloyd
    * chain (64-dim, k=8) for the centroids, four sliced Lloyd chains for
    * the codebooks, the encode argmin, the trained-cell assignment, and
    * the ADC ranking — so a hash match pins the WHOLE trained stack, not
    * the pieces.
    */
  def q97AnnProduction(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    val cents = Similarity.kmeansRefine(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", iters = 2)
      .select(col("vec_id"), col("embedding"))
    val cb = Similarity.trainPqCodebooks(emb.filter(col("vec_id") < 500),
      "vec_id", "embedding", col("vec_id") < Similarity.PqK, iters = 2)
    // deterministic per-source artifact path, overwritten each refresh
    // (fresh temp dirs leaked one per invocation; the sink-LIFECYCLE
    // queries q78/q101/q108 keep theirs — an empty sink per run is their
    // semantic, and leftover state would change the upsert behavior)
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_ann_prod_" + spark.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)).toString
    Similarity.buildIvfPqIndex(emb, cents, "vec_id", "embedding", cb)
      .write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val queries = Similarity.ivfAssign(
        emb.filter(col("vec_id") >= 20 && col("vec_id") < 30), cents,
        "vec_id", "embedding")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("cell"))
    Similarity.ivfPqTopKIndexed(index, queries, k = 3, cb)
  }

  /** q98: SEMANTIC dedup (the SemDeDup recipe, Abbas et al. 2023, §2 —
    * public knowledge): kmeans cells bucket the embedding space (trained,
    * not hashed — 2 Lloyd iterations over the 8 seeds), candidate pairs
    * form ONLY within a cell (the cell equi-join replaces all-pairs,
    * exactly the paper's "within-cluster pairwise similarity"), pairs at
    * cosine ≥ 0.45 connect into duplicate groups, and each group is
    * labeled with its minimum vec_id representative + size — the
    * keep-one-per-group product. The embedding-space sibling of q43's
    * MinHash text clusters; complements q39's LSH-bucketed near-dup
    * (hash buckets trade recall for no training; kmeans cells are the
    * data-adaptive variant).
    */
  def q98SemanticDedup(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.balanced(spark, d, "embeddings")
    val cents = Similarity.kmeansRefine(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", iters = 2)
      .select(col("vec_id"), col("embedding"))
    val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
      .select(col("cell"), col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("n"))
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("va"), col("n").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("n").as("nb"))
    val pairs = a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .select(col("cell"), col("id_a"), col("id_b"),
        Similarity.cosFromNorms(col("va"), col("vb"), col("na"), col("nb"))
          .as("cos_pm"))
      .filter(col("cos_pm") >= 450000L)
    TextDedup.dupClusters(pairs, "id_a", "id_b")
      .select(col("node").as("vec_id"), col("cluster"), col("cluster_size"))
  }

  /** q99: cross-split LEAKAGE audit — the check every training pipeline
    * runs after splitting: near-duplicate pairs that STRADDLE the
    * train/test boundary (a test doc with a train near-dup measures the
    * model's memory, not its skill). Composition of verified pieces:
    * the q46 salted hash split assigns sides (row-local, a pure function
    * of the id), q28's MinHash signatures feed
    * [[TextDedup.lshCandidatePairsAgainst]] with test as the probe side —
    * train×train and test×test pairs NEVER FORM (the q58 asymmetry,
    * which is what keeps the audit affordable as the corpus grows: cost
    * tracks |test|·bands, not |corpus|²).
    */
  def q99SplitLeakage(spark: SparkSession, d: String): DataFrame = {
    // Persist: both split sides read the same signature scan (the q58
    // convention; caller-owned lineage, Bench/Verify clearCache per query).
    val sigs = TextDedup.minhashSignatures(
        Tables.balanced(spark, d, "documents"), "doc_id", "text",
        ShingleK, NumHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucket = graft.operators.Sampling.hashBucket(col("doc"), "leak1", 100)
    TextDedup.lshCandidatePairsAgainst(
        sigs.filter(bucket >= 90), sigs.filter(bucket < 90),
        NumHashes, Bands)
      .filter(col("n_sig_equal") >= 8)
  }

  /** q163: CLUSTER-SAFE train/val/test split — the constructive fix for
    * the leakage q99 detects: split assignment hashes the near-dup
    * CLUSTER representative (q43's component min, singletons their own
    * doc id), so every near-dup cluster lands wholly in one split and
    * cross-split near-dup pairs cannot exist by construction. Because a
    * singleton's cluster key IS its doc id, unclustered docs keep
    * exactly their q46 assignment — adopting the safe split moves ONLY
    * docs whose cluster spans a naive boundary. The audit columns bill
    * that adoption: `n_docs_moved` (docs whose naive doc-level split
    * differs) and `n_clusters_healed` (clusters in this split the naive
    * rule would have torn across splits).
    *
    * Scale shape: clustering is the q43 machinery (banded LSH + CC —
    * never all-pairs); the split itself is row-local hash arithmetic on
    * the cluster key; the only added corpus-sized step is the doc⨝label
    * left join, keyed and broadcastable at the drop-list's size (the
    * q57 observation: clustered docs are orders fewer than the corpus).
    */
  def q163ClusterSafeSplit(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
    val labels = q43DupClusters(spark, d)
      .select(col("doc_id"), col("cluster"))
    val keyed = docs.join(broadcast(labels), Seq("doc_id"), "left_outer")
      .withColumn("ckey", coalesce(col("cluster"), col("doc_id")))
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val assigned = graft.operators.Sampling.hashSplit(
      graft.operators.Sampling.hashSplit(keyed, "ckey", "exp1", splits),
      "doc_id", "exp1", splits, splitCol = "naive_split")
    assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("ckey")).as("n_clusters"),
        sum(col("n_chars")).as("sum_chars"),
        sum(when(col("naive_split") =!= col("split"), 1L).otherwise(0L))
          .as("n_docs_moved"),
        countDistinct(when(col("naive_split") =!= col("split"), col("ckey")))
          .as("n_clusters_healed"))
  }

  /** q164: INCREMENTAL split assignment — the q163 contract held as the
    * corpus grows (the q58/q102 registry convention for the split
    * family): the even-id half is the standing corpus whose splits are
    * frozen (a registry never re-litigates existing assignments — the
    * production constraint), the odd-id half the arriving batch. Each
    * batch doc is LSH-checked against the standing side only
    * ([[TextDedup.lshCandidatePairsAgainst]] — standing×standing pairs
    * never form, so per-batch cost tracks the batch); a match INHERITS
    * the split of its matched doc's cluster key (min across matches,
    * deterministic — an arriving near-dup of a test doc goes to test,
    * never to train), an unmatched doc hash-assigns by its own id,
    * bitwise the q46/q163 singleton rule. `n_inherited` bills the
    * inheritance per split. Note the honest scope: inheritance prevents
    * an arriving doc landing OPPOSITE an existing near-dup; it does not
    * merge standing clusters the batch newly bridges (that is the batch
    * q163's job on the next full rebuild — same batch-vs-incremental
    * tension every registry family documents).
    */
  def q164SplitAssignIncremental(spark: SparkSession, d: String): DataFrame =
    splitAssignIncremental(Tables.balanced(spark, d, "documents"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("inherited"), 1L).otherwise(0L)).as("n_inherited"),
        sum(col("n_chars")).as("sum_chars"))

  /** q164's core, per-doc grain (doc_id, …, inherited, skey, split) —
    * exposed at this grain so the inheritance invariant (a batch doc
    * near-dupping a standing doc lands in that doc's cluster-keyed
    * split) is spec-pinned on a constructed corpus, not just
    * aggregate-checked by the oracle.
    */
  private[graft] def splitAssignIncremental(docs: DataFrame): DataFrame = {
    // Persist: standing sigs feed both the standing-side CC and the
    // batch join (the q58 convention; caller-owned lineage).
    val sigs = TextDedup.minhashSignatures(docs, "doc_id", "text",
        ShingleK, NumHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val standing = sigs.filter(col("doc") % 2 === 0)
    val batch = sigs.filter(col("doc") % 2 === 1)
    val labels = TextDedup.dupClusters(
        TextDedup.lshCandidatePairs(standing, NumHashes, Bands)
          .filter(col("n_sig_equal") >= 8), "doc_a", "doc_b")
      .select(col("node").as("edoc"), col("cluster"))
    // lshCandidatePairsAgainst canonicalizes (min, max); parity recovers
    // the sides (standing even, batch odd)
    val matches = TextDedup.lshCandidatePairsAgainst(batch, standing,
        NumHashes, Bands)
      .filter(col("n_sig_equal") >= 8)
      .select(
        when(col("doc_a") % 2 === 1, col("doc_a")).otherwise(col("doc_b"))
          .as("bdoc"),
        when(col("doc_a") % 2 === 0, col("doc_a")).otherwise(col("doc_b"))
          .as("edoc"))
    val inherit = matches.join(labels, Seq("edoc"), "left_outer")
      .withColumn("ekey", coalesce(col("cluster"), col("edoc")))
      .groupBy(col("bdoc")).agg(min(col("ekey")).as("ckey"))
      .withColumnRenamed("bdoc", "doc_id")
    val assigned = docs.filter(col("doc_id") % 2 === 1)
      .join(inherit, Seq("doc_id"), "left_outer")
      .withColumn("inherited", col("ckey").isNotNull)
      .withColumn("skey", coalesce(col("ckey"), col("doc_id")))
    graft.operators.Sampling.hashSplit(assigned, "skey", "exp1",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
  }

  /** q165: QUALITY-AWARE canonical selection — q57's keep-one-per-cluster
    * with the representative a production pipeline actually keeps: the
    * highest-quality member (q24's quality_milli, ties broken min doc
    * id), not the arbitrary min-id. Composition of three green pieces —
    * q43 clusters ⨝ q24 quality, one window argmax per cluster
    * ([[graft.operators.Dedup.keepFirst]]), then q57's broadcastable
    * anti-join. The per-lang rollup adds `n_upgraded`: kept
    * representatives that are NOT their cluster's min id — exactly the
    * docs where the quality rule beat the arbitrary one (the delta a
    * team weighs before swapping dedup policies).
    */
  def q165QualityDedup(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
    val quality = q24TextStats(spark, d)
      .select(col("doc_id"), col("quality_milli"))
    val clusters = q43DupClusters(spark, d)
      .select(col("doc_id"), col("cluster"))
    val members = clusters.join(quality, Seq("doc_id"))
    val winners = graft.operators.Dedup.keepFirst(members,
        Seq(col("cluster")),
        Seq(col("quality_milli").desc, col("doc_id").asc))
      .select(col("doc_id"), (col("doc_id") =!= col("cluster")).as("upgraded"))
    val losers = clusters.join(winners.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    docs.join(broadcast(losers), Seq("doc_id"), "left_anti")
      .join(broadcast(winners), Seq("doc_id"), "left_outer")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        sum(when(col("upgraded"), 1L).otherwise(0L)).as("n_upgraded"))
  }

  /** q189: preference-pair construction — the RLHF/DPO data-prep step
    * over the same near-dup clusters q165 curates: within each cluster of
    * ≥2 members, `chosen` = best quality (ties → lowest doc_id),
    * `rejected` = worst quality (ties → HIGHEST doc_id, so chosen ≠
    * rejected even on all-equal clusters), margin = the quality gap a
    * trainer would weight by. One shuffle: both extreme picks are windows
    * over the same cluster partitioning. Zero-margin pairs are kept and
    * FLAGGED rather than dropped — the curation decision (train on them
    * or not) belongs to the consumer, the prep step must not hide them.
    */
  def q189PreferencePairs(spark: SparkSession, d: String): DataFrame = {
    val quality = q24TextStats(spark, d)
      .select(col("doc_id"), col("quality_milli"))
    val members = q43DupClusters(spark, d)
      .select(col("doc_id"), col("cluster"))
      .join(quality, Seq("doc_id"))
    preferencePairs(members)
  }

  /** q189's extreme-member core over a `(doc_id, cluster, quality_milli)`
    * frame — exposed at this grain so the tie-break guarantee (chosen ≠
    * rejected even on an ALL-EQUAL-quality cluster: best ties break to
    * the LOWEST id, worst ties to the HIGHEST) is spec-pinned on a
    * constructed corpus, not just oracle-checked on whatever ties the
    * driver data happens to contain.
    */
  private[graft] def preferencePairs(members: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cluster"))
    val best = Window.partitionBy(col("cluster"))
      .orderBy(col("quality_milli").desc, col("doc_id").asc)
    val worst = Window.partitionBy(col("cluster"))
      .orderBy(col("quality_milli").asc, col("doc_id").desc)
    members
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("rk_best", row_number().over(best))
      .withColumn("rk_worst", row_number().over(worst))
      .filter(col("n_members") >= 2)
      .groupBy(col("cluster"), col("n_members"))
      .agg(
        max(when(col("rk_best") === 1, col("doc_id"))).as("chosen"),
        max(when(col("rk_worst") === 1, col("doc_id"))).as("rejected"),
        (max(when(col("rk_best") === 1, col("quality_milli"))) -
          max(when(col("rk_worst") === 1, col("quality_milli"))))
          .as("margin_milli"))
      .withColumn("zero_margin", col("margin_milli") === 0L)
      .select(col("cluster"), col("chosen"), col("rejected"),
        col("margin_milli"), col("n_members"), col("zero_margin"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q189_preference_pairs" -> q189PreferencePairs _,
    "q163_cluster_safe_split" -> q163ClusterSafeSplit _,
    "q164_split_assign_inc" -> q164SplitAssignIncremental _,
    "q165_quality_dedup" -> q165QualityDedup _,
    "q79_pq_encode" -> q79PqEncode _,
    "q80_pq_adc_topk" -> q80PqAdcTopk _,
    "q81_ivf_pq_topk" -> q81IvfPqTopk _,
    "q92_ivf_pq_indexed" -> q92IvfPqIndexed _,
    "q93_pq_trained" -> q93PqTrained _,
    "q97_ann_production" -> q97AnnProduction _,
    "q98_semantic_dedup" -> q98SemanticDedup _,
    "q99_split_leakage" -> q99SplitLeakage _,
    "q35_binary_features" -> q35BinaryFeatures _,
    "q36_frame_sample" -> q36FrameSample _,
    "q42_ppm_resize" -> q42PpmResize _,
    "q121_image_neardup" -> q121ImageNearDup _,
    "q124_pipeline_v4" -> q124PipelineV4 _,
    "q96_ppm_decode" -> q96PpmDecode _,
    "q134_audio_stats" -> q134AudioStats _,
    "q135_audio_neardup" -> q135AudioNearDup _,
    "q137_video_frames" -> q137VideoFrames _,
    "q138_video_neardup" -> q138VideoNearDup _,
    "q139_video_scenes" -> q139VideoScenes _,
    "q140_video_neardup_shifted" -> q140VideoNearDupShifted _,
    "q141_video_keyframes" -> q141VideoKeyframes _,
    "q142_video_pipeline_v6" -> q142VideoPipelineV6 _,
    "q143_audio_segments" -> q143AudioSegments _,
    "q144_multimodal_card" -> q144MultimodalCard _,
    "q145_png_stats" -> q145PngStats _,
    "q146_png_neardup" -> q146PngNearDup _,
    "q148_jpeg_stats" -> q148JpegStats _,
    "q149_jpeg_neardup" -> q149JpegNearDup _,
    "q150_mp4_tracks" -> q150Mp4Tracks _,
    "q151_mp3_frames" -> q151Mp3Frames _,
    "q152_av_ingest_card" -> q152AvIngestCard _,
    "q38_ann_ivf_topk" -> q38AnnIvfTopK _,
    "q39_embedding_neardup" -> q39EmbeddingNearDup _,
    "q24_text_stats" -> q24TextStats _,
    "q40_bpe_token_count" -> q40BpeTokenCount _,
    "q25_lang_id" -> q25LangId _,
    "q26_fingerprint_dedup" -> q26FingerprintDedup _,
    "q27_ngram_jaccard_pairs" -> q27NgramJaccardPairs _,
    "q100_span_dedup" -> q100SpanDedup _,
    "q102_span_dedup_incremental" -> q102SpanDedupIncremental _,
    "q28_minhash_lsh_pairs" -> q28MinhashLshPairs _,
    "q43_dup_clusters" -> q43DupClusters _,
    "q29_simhash" -> q29Simhash _,
    "q30_cosine_topk" -> q30CosineTopK _,
    "q31_ann_lsh_topk" -> q31AnnLshTopK _,
    "q155_ann_recall_audit" -> q155AnnRecallAudit _,
    "q169_mmr_diverse" -> q169MmrDiverse _,
    "q41_ann_adaptive_topk" -> q41AnnAdaptiveTopK _,
    "q50_kmeans_refine" -> q50KmeansRefine _,
    "q51_ann_multiprobe" -> q51AnnMultiprobe _,
    "q53_topk_agg" -> q53TopKAgg _,
    "q55_ann_multitable" -> q55AnnMultiTable _,
    "q57_dedup_corpus" -> q57DedupCorpus _,
    "q58_incremental_neardup" -> q58IncrementalNeardup _,
  )
}
