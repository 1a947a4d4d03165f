package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Near-duplicate detection over a document corpus: exact n-gram Jaccard
  * via an inverted shingle index, MinHash+LSH banding, and SimHash.
  *
  * Scale design (the part that matters at 100 TB): **no stage is ever
  * all-pairs.** Candidate generation goes through an equi-join key —
  * a shared shingle (Jaccard), a shared band hash (MinHash-LSH) — so the
  * shuffle is keyed and the pair space is Σ bucket² instead of N². Hot
  * buckets (a shingle/band shared by a huge dup cluster) are the skew
  * risk; AQE skew-join splitting handles moderate skew, and a df-cap
  * filter (drop shingles with document frequency above a threshold, the
  * standard trick) is exposed via `maxDf`.
  *
  * Cache lifecycle: persists on RETURNED lineage are caller-owned (the
  * repo-wide convention, see [[TermStats]]); only [[dupClusters]]'
  * iterative path — which materializes internally and therefore sees its
  * own terminal actions — unpersists in `finally` itself.
  */
object TextDedup {

  /** Exact Jaccard similarity over distinct word k-grams for every document
    * pair sharing at least one shingle. Returns (doc_a, doc_b, inter, na,
    * nb, jac_pm) with jac_pm = round(1e6 * |A∩B| / |A∪B|), filtered to
    * `minJacPm`.
    *
    * @param maxDf drop shingles appearing in more than this many docs
    *              (df-cap against hot-key blowup); 0 disables.
    */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String, k: Int,
                        minJacPm: Long, maxDf: Long = 0L): DataFrame = {
    // Tokens materialize as a column BEFORE shingling: a captured
    // expression inside transform()'s lambda re-evaluates per element
    // (split() would run O(tokens) times per doc).
    val sh = docs.select(col(id).as("doc"), Text.tokens(col(text)).as("toks"))
      .select(col("doc"), explode(Text.shingles(col("toks"), k)).as("sh"))
    val filtered0 =
      if (maxDf > 0) {
        val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("sh")
        sh.join(df, "sh")
      } else sh
    // Persist: the exploded shingle index feeds three consumers (sizes +
    // both self-join sides) and would be recomputed for each. Caller-owned
    // (returned lineage — the [[TermStats]] convention).
    val filtered = filtered0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = filtered.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val a = filtered.select(col("doc").as("doc_a"), col("sh"))
    val b = filtered.select(col("doc").as("doc_b"), col("sh"))
    a.join(b, a("sh") === b("sh") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jac_pm",
        round(lit(1000000.0) * col("inter") / (col("na") + col("nb") - col("inter")))
          .cast("long"))
      .filter(col("jac_pm") >= minJacPm)
  }

  /** MinHash signature: numHashes independent permutations approximated by
    * `min(hash32(shingle, seed))`. Returns the input plus a `sig`
    * array&lt;long&gt; column; rows with no shingles are dropped (no
    * signature is definable).
    */
  def minhashSignatures(docs: DataFrame, id: String, text: String, k: Int,
                        numHashes: Int): DataFrame = {
    // Shape note (measured, sf0.1): higher-order functions (transform/
    // aggregate/zip_with) are CodegenFallback — interpreted row-by-row with
    // boxed intermediate arrays — so computing the signature as
    // `array_min(transform(bases, affine_j))` per slot ran ~10s for 5k
    // docs. Exploding the shingle array instead keeps everything inside
    // whole-stage codegen: one md5 per (doc, shingle) row, numHashes `min`
    // aggregates with map-side partial aggregation, a single shuffle keyed
    // on doc. Same values, ~20× faster — and the keyed-aggregate shape is
    // also the right one at scale (no wide rows, partial agg collapses
    // before the exchange).
    val perShingle = docs
      .select(col(id).as("doc"), Text.tokens(col(text)).as("toks"))
      .select(col("doc"), explode(Text.shingles(col("toks"), k)).as("s"))
      .select(col("doc"), Text.baseHash32(col("s")).as("b"))
    perShingle
      .groupBy(col("doc"))
      .agg(min(Text.affine(col("b"), 0)).as("m0"),
        (1 until numHashes).map(j => min(Text.affine(col("b"), j)).as(s"m$j")): _*)
      .select(col("doc"),
        array((0 until numHashes).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** LSH banding over minhash signatures: `bands` bands of `sig.length /
    * bands` rows; a candidate pair is any two docs agreeing on a full band.
    * Returns distinct (doc_a, doc_b, n_sig_equal) where n_sig_equal is the
    * number of agreeing signature components (jaccard estimate =
    * n_sig_equal / numHashes). Banding shuffles on the band hash — the
    * standard sub-quadratic candidate generation; the all-pairs comparison
    * never happens.
    */
  def lshCandidatePairs(sigs: DataFrame, numHashes: Int, bands: Int,
                        maxBucket: Long = 0L): DataFrame = {
    require(numHashes % bands == 0, s"bands $bands must divide numHashes $numHashes")
    val r = numHashes / bands
    // Persist: both sides of the band self-join (and the distinct) would
    // otherwise recompute the full signature scan. Caller-owned (returned
    // lineage — the [[TermStats]] convention).
    val cached = sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded0 = cached.select(col("doc"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        md5(concat_ws(",", (0 until r).map(i =>
          element_at(col("sig"), b * r + i + 1)): _*))): _*)).as(Seq("band", "bk")))
    // Hot-band cap (`maxBucket` docs per (band, bucket); 0 disables):
    // a boilerplate cluster of M near-identical docs shares every band
    // bucket, and the self-join then EMITS M²/2 · bands candidate rows —
    // the blowup is in the join OUTPUT, which AQE skew-splitting cannot
    // shrink (it only rebalances input partitions). The cap drops
    // over-occupied buckets before the join (one partial-aggregated
    // count + a semi-join), the same recall trade as the shingle df-cap:
    // a capped bucket's mega-cluster is exactly the population exact
    // fingerprint/span dedup (q11/q26/q100) already collapses upstream,
    // and near-dup pairs BETWEEN distinct texts still meet in their
    // other, uncapped bands. Measured in SCALE.md's lshskew probe.
    val banded =
      if (maxBucket > 0) {
        val keep = banded0.groupBy(col("band"), col("bk"))
          .agg(count(lit(1)).as("__occ"))
          .filter(col("__occ") <= maxBucket).select(col("band"), col("bk"))
        banded0.join(keep, Seq("band", "bk"))
      } else banded0
    val x = banded.select(col("doc").as("doc_a"), col("sig").as("sa"),
      col("band"), col("bk"))
    val y = banded.select(col("doc").as("doc_b"), col("sig").as("sb"),
      col("band"), col("bk"))
    x.join(y, Seq("band", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        aggregate(zip_with(col("sa"), col("sb"),
            (p, q) => when(p === q, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("long").as("n_sig_equal"))
  }

  /** Cross-corpus LSH candidates: pairs between an INCOMING batch and an
    * EXISTING corpus only — the incremental-dedup shape. A growing corpus
    * must not re-pair itself with itself on every refresh; banding both
    * sides and joining incoming×existing bounds the work to the new
    * batch's bucket neighborhoods (existing×existing pairs never form).
    * Returns (doc_a, doc_b, n_sig_equal) with doc_a = min id, doc_b = max
    * id (the same orientation as [[lshCandidatePairs]]).
    */
  def lshCandidatePairsAgainst(incoming: DataFrame, existing: DataFrame,
                               numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, s"bands $bands must divide numHashes $numHashes")
    val r = numHashes / bands
    def banded(sigs: DataFrame, side: String) = sigs.select(
      col("doc").as(s"doc_$side"), col("sig").as(s"sig_$side"),
      posexplode(array((0 until bands).map(b =>
        md5(concat_ws(",", (0 until r).map(i =>
          element_at(col("sig"), b * r + i + 1)): _*))): _*)).as(Seq("band", "bk")))
    banded(incoming, "i").join(banded(existing, "e"), Seq("band", "bk"))
      .filter(col("doc_i") =!= col("doc_e"))
      .select(least(col("doc_i"), col("doc_e")).as("doc_a"),
        greatest(col("doc_i"), col("doc_e")).as("doc_b"),
        col("sig_i").as("sa"), col("sig_e").as("sb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        aggregate(zip_with(col("sa"), col("sb"),
            (p, q) => when(p === q, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("long").as("n_sig_equal"))
  }

  /** Near-dup cluster formation: connected components over a candidate-pair
    * list, labeling every involved doc with the minimum doc id reachable
    * in its component — the canonical-representative selection step after
    * candidate generation. Returns (node, cluster, cluster_size).
    *
    * Adaptive execution, two physical paths for one logical result (the
    * broadcast-join-threshold pattern): the pair list is orders of
    * magnitude smaller than the corpus (it already survived LSH banding),
    * so when it fits one partition (`≤ localThreshold` pairs) CC runs as a
    * single `mapPartitions` union-find — exact, one job, no iteration.
    * Past the threshold (or for key types without a defined ordering) it
    * falls back to iterative min-label propagation WITH pointer jumping
    * (label := min(label, neighbors' labels, label(label)) — the
    * Shiloach–Vishkin path-doubling step) to fixpoint — the standard
    * large-graph CC without a graph library; each iteration is one
    * neighbor equi-join + one label self-join, and `localCheckpoint`
    * truncates the growing lineage. Iterations needed = O(log diameter)
    * (measured in SCALE.md's ccdiam probe: a 320k-node chain converges
    * in ~18 rounds where plain min-label would need 320k); dup clusters
    * are near-cliques, so 2-3 passes in practice (`maxIter` is the
    * runaway bound — if hit before convergence an IllegalStateException
    * is thrown rather than returning wrong labels). Both paths are
    * property-tested to agree.
    */
  def dupClusters(pairs: DataFrame, aCol: String, bCol: String,
                  maxIter: Int = 20, localThreshold: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val p0 = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    val keyOrd: Option[Ordering[Any]] = p0.schema("a").dataType match {
      case LongType | IntegerType =>
        Some(Ordering.by((x: Any) => x.asInstanceOf[Number].longValue))
      case StringType => Some(Ordering.by((x: Any) => x.asInstanceOf[String]))
      case _ => None
    }
    if (keyOrd.isDefined && localThreshold > 0) {
      val p = p0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (p.count() <= localThreshold) localCC(p, keyOrd.get)
        else iterativeCC(p0, maxIter)
      } finally p.unpersist()
    } else iterativeCC(p0, maxIter)
  }

  /** Single-partition exact CC: union-find with path compression over the
    * whole pair list in one `mapPartitions` pass on one executor core.
    * The result is eagerly materialized (`localCheckpoint`) BEFORE the
    * caller unpersists the pair input — otherwise every downstream action
    * would replay the whole candidate-generation pipeline through the
    * single coalesced task.
    */
  private def localCC(p: DataFrame, ord: Ordering[Any]): DataFrame = {
    val spark = p.sparkSession
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", p.schema("a").dataType),
      org.apache.spark.sql.types.StructField("cluster", p.schema("a").dataType),
      org.apache.spark.sql.types.StructField("cluster_size",
        org.apache.spark.sql.types.LongType)))
    val out = p.rdd.coalesce(1).mapPartitions { rows =>
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      rows.foreach { row =>
        val a = row.get(0); val b = row.get(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val byRoot = parent.keys.toSeq.groupBy(find)
      byRoot.valuesIterator.flatMap { members =>
        val label = members.min(ord)
        val size = members.size.toLong
        members.iterator.map(m => org.apache.spark.sql.Row(m, label, size))
      }
    }
    spark.createDataFrame(out, outSchema).localCheckpoint(true)
  }

  private def iterativeCC(p: DataFrame, maxIter: Int): DataFrame = {
    val spark = p.sparkSession
    val edges = p.unionByName(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count() // materializes the persist; sizes the loop
    // the in-loop conf pair (the q147/walkaqe rule, applied r17 and A/B'd
    // on the ccdiam ladder — see SCALE.md cciter): every round is
    // edge/label-grain shuffles ending in a checkpointed count, so
    // per-round adaptive re-planning is driver overhead and session-sized
    // partitions are mostly empty tasks on the label frames; parts sized
    // to the symmetrized edge frame.
    graft.functions.Cols.withLoopConf(spark,
      graft.functions.Cols.loopParts(edges, nEdges)) {
    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges.join(labels, col("b") === col("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr"))
      // Carry the pre-update label through the checkpoint so convergence
      // detection is a filter-count over the checkpointed frame — not the
      // extra labels⨝updated shuffle join it used to be. The checkpoint is
      // LAZY: the convergence count is the job that materializes it, so
      // each iteration runs exactly one job (eager + count ran two).
      val stepped = labels.join(nbrMin, col("node") === col("a"), "left_outer")
        .select(col("node"), col("label").as("__prev"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .localCheckpoint(false)
      // POINTER JUMP (Shiloach–Vishkin style path doubling): also adopt
      // the label OF the current label — label(v) ← min(label(v),
      // label(label(v))). Plain neighbor-min needs DIAMETER iterations
      // (a 320k-node chain would need 320k rounds — the high-diameter
      // wall the ccdiam probe measures); with the jump the label forest
      // halves in depth each round, so convergence is O(log diameter)
      // at the cost of one extra self-join per round. Correctness is
      // unchanged: a label is always the id of some node in the SAME
      // component (label(label(v)) is in label(v)'s component = v's),
      // labels are monotone non-increasing, and the fixpoint is the
      // component minimum — same invariant, fewer rounds.
      val jumped = stepped
        .join(stepped.select(col("node").as("__jn"), col("label").as("__jl")),
          col("label") === col("__jn"), "left_outer")
        .select(col("node"), col("__prev"),
          least(col("label"), coalesce(col("__jl"), col("label"))).as("label"))
        .localCheckpoint(false)
      changed = jumped.filter(col("label") =!= col("__prev")).count()
      labels = jumped.select(col("node"), col("label"))
      iter += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIter iterations")
    // ONE label-keyed exchange for the size rollup: whole-partition
    // window count over the label clustering (aggregate + join-back
    // paid a second exchange plus a join for the same key — the
    // Components.components fix, applied here too).
    labels.select(col("node"), col("label").as("cluster"),
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("label"))).as("cluster_size"))
    }
  }

  /** Train/eval contamination check (decontamination): for every PROBE
    * document (the eval/benchmark side), count its k-shingles that also
    * appear anywhere in the CORPUS side (the training set) and how many
    * distinct corpus documents share at least one. Returns one row per
    * CONTAMINATED probe doc: (doc, n_shingles, n_contaminated,
    * n_corpus_docs); clean probe docs don't appear (anti-join [[dropIds]]
    * style downstream gives the clean set).
    *
    * The standard eval-leakage gate (GPT-3 appendix C / PaLM §7 run n-gram
    * overlap exactly like this). Scale shape: both sides explode to
    * (doc, shingle) rows and meet in ONE equi-join on the shingle — never
    * doc×doc. `maxDf` drops corpus shingles above a document-frequency cap
    * before the join (hot boilerplate shingles would otherwise fan out);
    * a capped shingle can no longer testify to contamination, the standard
    * recall/robustness trade, 0 disables.
    *
    * `bloomPrune = Some((expectedItems, numBits))` inserts a
    * [[Prune.bloomSemi]] gate on the corpus shingle stream keyed by the
    * probe's shingles, BELOW the overlap join: at production scale the
    * corpus side is the 100 TB training set while the probe is a few
    * thousand eval documents, so virtually no corpus shingle survives the
    * gate and the join's shuffle shrinks to ~the contaminated fraction.
    * False positives pass the gate and are then dropped by the exact
    * join, so the RESULT IS BIT-IDENTICAL with or without pruning
    * (test-pinned; q85 runs the pruned form against q61's oracle). The
    * df-cap aggregate (when `maxDf` > 0) deliberately stays on the
    * UN-pruned stream — df is a whole-corpus statistic.
    */
  def contaminationAgainst(probe: DataFrame, corpus: DataFrame, id: String,
                           text: String, k: Int, maxDf: Long = 0L,
                           bloomPrune: Option[(Long, Long)] = None): DataFrame = {
    def shingled(df: DataFrame, as: String) =
      df.select(col(id).as(as), Text.tokens(col(text)).as("toks"))
        .select(col(as), explode(Text.shingles(col("toks"), k)).as("sh"))
    // Persist: the probe's shingle index feeds both the size rollup and the
    // overlap join; with a df-cap the CORPUS index also feeds two consumers
    // (the df aggregate and the filter join) — and the corpus is the
    // expensive side, so recomputing its explode+shuffle twice is the worse
    // miss. Both caller-owned (returned lineage — the [[TermStats]]
    // convention).
    val p = shingled(probe, "doc")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c =
      if (maxDf > 0) {
        val c0 = shingled(corpus, "doc_c")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val keep = c0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("sh")
        c0.join(keep, "sh")
      } else shingled(corpus, "doc_c")
    val sizes = p.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val cJoinSide = bloomPrune match {
      case Some((items, bits)) =>
        Prune.bloomSemi(c, col("sh"), p, col("sh"), items, bits)
      case None => c
    }
    p.join(cJoinSide, "sh")
      .groupBy(col("doc"))
      .agg(countDistinct(col("sh")).as("n_contaminated"),
        countDistinct(col("doc_c")).as("n_corpus_docs"))
      .join(sizes, "doc")
      .select(col("doc"), col("n_shingles"), col("n_contaminated"),
        col("n_corpus_docs"))
  }

  /** 32-bit SimHash over the (multiplicity-weighted) token stream: bit j of
    * the fingerprint is the sign of Σ_tokens (±1 by bit j of the token
    * hash). Near-dups differ in few bits (compare by hamming distance
    * downstream). One narrow shuffle per aggregation level.
    */
  /** Near-dup pairs over 32-bit [[simhash]] fingerprints: all (doc_a <
    * doc_b) with hamming distance ≤ `maxHamming`. Candidate generation is
    * pigeonhole banding (Manku et al. 2007, WWW — the Google simhash-dedup
    * paper): the fingerprint splits into `bands` equal bit-blocks, and two
    * fingerprints within hamming d < bands must agree on ≥ 1 whole block —
    * so an equi-join on (band, block value) finds every true pair
    * (EXACT recall for maxHamming ≤ bands−1, which is `require`d), and the
    * cheap `bit_count(xor)` confirm runs only inside band buckets. Never
    * all-pairs; same shuffle shape as [[lshCandidatePairs]].
    * Input: output of [[simhash]] (doc, simhash).
    */
  def simhashNearDupPairs(sigs: DataFrame, maxHamming: Int,
                          bands: Int = 4): DataFrame =
    hammingPairs(sigs, "doc", "simhash", bits = 32, maxHamming = maxHamming,
      bands = bands)

  /** Cross-corpus [[hammingPairs]]: pairs between an INCOMING batch of
    * fingerprints and an EXISTING corpus only — the incremental-dedup
    * shape for the hamming domain (simhash text batches, q121-style
    * image dHashes). Banding both sides and joining incoming×existing
    * bounds the work to the new batch's bucket neighborhoods;
    * existing×existing pairs never form (the [[lshCandidatePairsAgainst]]
    * contract). Returns (doc_a, doc_b, hamming) with doc_a = the
    * incoming id, doc_b = the existing id.
    */
  def hammingPairsAgainst(incoming: DataFrame, existing: DataFrame,
                          idCol: String, hashCol: String, bits: Int,
                          maxHamming: Int, bands: Int): DataFrame = {
    require(bands >= 1 && bits % bands == 0,
      s"bands must divide $bits, got $bands")
    require(maxHamming < bands,
      s"pigeonhole recall needs maxHamming < bands, got $maxHamming/$bands")
    val width = bits / bands
    val mask = (1L << width) - 1
    def banded(sigs: DataFrame, side: String) = sigs.select(
      col(idCol).as(s"doc_$side"), col(hashCol).as(s"h_$side"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col(hashCol), b * width).bitwiseAND(mask)): _*))
        .as(Seq("band", "blk")))
    banded(incoming, "i").join(banded(existing, "e"), Seq("band", "blk"))
      .filter(col("doc_i") =!= col("doc_e"))
      .select(col("doc_i").as("doc_a"), col("doc_e").as("doc_b"),
        col("h_i").as("ha"), col("h_e").as("hb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Generic hamming-distance near-dup pairing over ANY integer
    * fingerprint column (simhash q29/q67, image dHash q121): all
    * (doc_a < doc_b) with `bit_count(xor) <= maxHamming`, candidates by
    * pigeonhole banding (Manku et al. 2007) — the fingerprint splits
    * into `bands` equal bit-blocks, two fingerprints within hamming
    * d < bands must agree on ≥ 1 whole block, so an equi-join on
    * (band, block value) finds every true pair (EXACT recall for
    * maxHamming ≤ bands−1, `require`d) and the cheap confirm runs only
    * inside band buckets. Never all-pairs.
    */
  def hammingPairs(sigs: DataFrame, idCol: String, hashCol: String,
                   bits: Int, maxHamming: Int, bands: Int,
                   maxBucket: Long = 0L): DataFrame = {
    require(bands >= 1 && bits % bands == 0,
      s"bands must divide $bits, got $bands")
    require(maxHamming < bands,
      s"pigeonhole recall needs maxHamming < bands, got $maxHamming/$bands")
    val width = bits / bands
    val mask = (1L << width) - 1
    // Persist: both sides of the band self-join would otherwise recompute
    // the fingerprint derivation (for simhash, two keyed shuffles over
    // 32× the token count; for dHash, a full media decode) — same reuse
    // rule as [[lshCandidatePairs]]. Caller-owned (returned lineage —
    // the [[TermStats]] convention).
    val cached = sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded0 = cached.select(col(idCol).as("doc"), col(hashCol).as("__h"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col(hashCol), b * width).bitwiseAND(mask)): _*))
        .as(Seq("band", "blk")))
    // Hot-bucket cap, the [[lshCandidatePairs]] maxBucket trade verbatim:
    // a cluster of IDENTICAL fingerprints (byte-identical images, boiler
    // simhashes) occupies every band bucket and the self-join emits M²/2
    // · bands rows — join OUTPUT, beyond AQE's reach. Over-occupied
    // buckets drop before the join; the dropped mega-cluster is the
    // population exact (hash-equality) dedup collapses upstream.
    val banded =
      if (maxBucket > 0) {
        val keep = banded0.groupBy(col("band"), col("blk"))
          .agg(count(lit(1)).as("__occ"))
          .filter(col("__occ") <= maxBucket).select(col("band"), col("blk"))
        banded0.join(keep, Seq("band", "blk"))
      } else banded0
    val x = banded.select(col("doc").as("doc_a"), col("__h").as("ha"),
      col("band"), col("blk"))
    val y = banded.select(col("doc").as("doc_b"), col("__h").as("hb"),
      col("band"), col("blk"))
    x.join(y, Seq("band", "blk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact SPAN dedup at k-token block granularity — the within-corpus
    * repeated-text removal every large training pipeline runs (C4 removed
    * repeated three-sentence spans; Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", does exact substring
    * dedup at ~50-token granularity — both public recipes). Documents are
    * tiled into consecutive non-overlapping k-token blocks
    * ([[Text.blocks]]); only the corpus-globally FIRST occurrence of each
    * distinct block text survives (ordered by (doc, pos)); every document
    * is rebuilt from its surviving blocks in original order.
    *
    * Returns (doc_id, n_blocks, kept_blocks, new_text); a fully-deduped
    * document keeps its row with kept_blocks = 0 and new_text = ''.
    *
    * Scale shape — MEASURED (SCALE.md `spandedup`): first-wins is
    * `row_number() OVER (PARTITION BY blk ORDER BY doc, pos) = 1`, which
    * Spark's InferWindowGroupLimit turns into a map-side partial
    * `WindowGroupLimit` BEFORE the exchange — each task forwards at most
    * one row per block it sees, so a block repeated millions of times
    * (boilerplate, the real-corpus hot key) costs one row per task,
    * never a skewed sort partition. The alternative — `min(struct(doc,
    * pos))` GROUP BY blk — cannot hash-aggregate (struct buffer →
    * SortAggregate both sides) but its partial side ALSO combines
    * map-side; the alternating-rep probe measures steady-state PARITY
    * between the two (first-timed-form-loses is warmup, the q32
    * lesson). The window form ships because it is the repo's D3
    * newest/first-wins idiom and keeps the whole pipeline codegen'd;
    * the agg twin stays in the probe, equality-checked. Two keyed
    * shuffles total (by block text, then by doc for the rebuild).
    */
  def spanDedup(docs: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val blocked = tiled(docs, id, text, k)
    firstWinsRebuild(blocked,
      blocked.select(col("doc"), posexplode(col("blks")).as(Seq("pos", "blk"))))
  }

  /** Documents tiled into k-token blocks: (doc, blks). */
  private def tiled(docs: DataFrame, id: String, text: String, k: Int): DataFrame =
    docs.select(col(id).as("doc"), Text.blocks(Text.tokens(col(text)), k).as("blks"))

  /** Shared tail of both span-dedup forms: batch-internal first-wins by
    * (doc, pos) over the candidate blocks, then rebuild every tiled
    * document from its survivors (zero-survivor docs keep their row via
    * the narrow per-doc block count joined back at the end).
    */
  private def firstWinsRebuild(blocked: DataFrame, candidates: DataFrame): DataFrame = {
    val nb = blocked.select(col("doc"), size(col("blks")).cast("long").as("n_blocks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("doc"), col("pos"))
    val winners = candidates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val rebuilt = winners.groupBy(col("doc"))
      .agg(count(lit(1)).as("kept_blocks"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("blk")))),
            x => x.getField("blk")), " ").as("new_text"))
    nb.join(rebuilt, Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("n_blocks"),
        coalesce(col("kept_blocks"), lit(0L)).as("kept_blocks"),
        coalesce(col("new_text"), lit("")).as("new_text"))
  }

  /** Incremental exact span dedup — [[spanDedup]] under CORPUS GROWTH,
    * the q58 asymmetry: an incoming batch is deduped against an existing
    * block REGISTRY (the distinct block texts already in the corpus)
    * without ever re-scanning or re-deduping the existing corpus. An
    * incoming block survives iff it is (a) absent from the registry and
    * (b) the batch-internal first occurrence by (doc, pos).
    *
    * `registry` is a single-column frame of distinct block texts (column
    * `blk`) — exactly what a previous batch's surviving blocks produce,
    * so batches chain: registry' = registry ∪ surviving blocks. The
    * anti-join is keyed on block text (shuffle both sides by `blk`;
    * at real scale the registry is the big side, so this is the one
    * unavoidable big shuffle — it replaces re-running [[spanDedup]] over
    * corpus+batch, which would re-shuffle the whole corpus every epoch).
    */
  def spanDedupAgainst(incoming: DataFrame, registry: DataFrame,
                       id: String, text: String, k: Int): DataFrame = {
    val blocked = tiled(incoming, id, text, k)
    firstWinsRebuild(blocked,
      blocked.select(col("doc"), posexplode(col("blks")).as(Seq("pos", "blk")))
        .join(registry.select(col("blk")), Seq("blk"), "left_anti"))
  }

  /** Exact SUBSTRING-level dedup at ≥L-token granularity — the Lee et
    * al. 2022 objective ("Deduplicating Training Data Makes Language
    * Models Better": excise every repeated substring of ≥ 50 tokens,
    * keeping one copy), reached WITHOUT a suffix array: a token position
    * lies inside a repeated substring of length ≥ L **iff** some
    * duplicated L-gram covers it, so overlapping L-grams + keyed
    * counting + a range-frame coverage window decide excision exactly.
    * (Suffix-array construction is how a single machine enumerates the
    * repeats; distributed, the gram form is pure keyed aggregation —
    * no prefix-doubling rounds of global sorts.)
    *
    * Keep-one-copy rule, deterministic: an L-gram occurrence KEEPS its
    * positions iff the gram is unique or this occurrence is the gram's
    * global first by (doc, pos) — the repo's first-wins idiom at
    * overlapping-gram granularity. A position survives when ANY covering
    * occurrence keeps it (or no full gram covers it: docs shorter than
    * L, and the < L-1 tokens past the last gram start are judged by the
    * grams that straddle them). The duplicate's interior dies; boundary
    * tokens survive exactly when a unique straddling gram vouches for
    * them — the same boundary fuzz the published method has at its
    * granularity.
    *
    * Plan shape: explode → gram build (L−1 `lead`s, ONE doc window) →
    * gram-keyed stats window (count + first occurrence; one shuffle by
    * gram — the full token stream, the operator's unavoidable big
    * exchange, map-side combinable in the agg twin sense) → coverage
    * max over a ROWS [−(L−1), 0] frame back on the doc clustering →
    * per-doc rebuild reusing it. Three shuffles total, no all-pairs, no
    * driver state.
    */
  def substringExcise(docs: DataFrame, id: String, text: String,
                      minLen: Int): DataFrame =
    substringExciseImpl(docs, id, text, minLen, None)

  /** [[substringExcise]] under CORPUS GROWTH — the q102/q58 asymmetry at
    * substring granularity: an incoming batch is excised against the
    * GRAM REGISTRY of the existing corpus (all distinct L-grams it
    * contains) without re-scanning the corpus. An incoming occurrence
    * vouches for its positions iff its gram is ABSENT from the registry
    * and (unique in the batch OR the batch-internal first by (doc, pos))
    * — which reproduces the global first-wins rule exactly when corpus
    * doc ids precede batch ids (the q102 ordering contract; chaining
    * equivalence test-pinned). Registry chaining: registry' = registry ∪
    * the batch's distinct grams.
    *
    * Scale note: the gram registry carries one row per DISTINCT L-gram —
    * the substring-level state any exact method must keep (a suffix
    * array over the corpus is the single-machine equivalent, at
    * comparable size); the anti-join indicator is keyed on gram text, so
    * per-batch cost is O(batch + registry shuffle), never O(corpus).
    */
  def substringExciseAgainst(incoming: DataFrame, registry: DataFrame,
                             id: String, text: String,
                             minLen: Int): DataFrame =
    substringExciseImpl(incoming, id, text, minLen,
      Some(registry.select(col("gram")).distinct()))

  private def substringExciseImpl(docs: DataFrame, id: String, text: String,
                                  minLen: Int,
                                  registry: Option[DataFrame]): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val toks = docs
      .select(col(id).as("doc"), posexplode(Text.tokens(col(text))).as(Seq("p0", "tok")))
      .select(col("doc"), (col("p0") + 1).as("pos"), col("tok"))
    // gram starting at pos (null when fewer than L tokens remain)
    val gramCols = (0 until minLen).map(k =>
      if (k == 0) col("tok") else lead(col("tok"), k).over(byPos))
    // NULL-gram rows (the last L−1 positions of every doc, and all of a
    // sub-L doc) carry keep = null by definition — route them AROUND the
    // gram-keyed stages entirely: hashed into the gram shuffle they all
    // land in ONE partition (a single-task hotspot of (L−1)·docs rows at
    // corpus scale — the q113 scale shape depends on this split), and
    // the registry join's null keys never match anyway. They are rebuilt
    // ROW-LOCALLY from a second source scan (a slice of each doc's token
    // tail — no window, no exchange; re-filtering the windowed stream
    // would compute the lead window twice instead).
    val withGram = toks
      .withColumn("gram", concat_ws(" ", gramCols: _*))
      .withColumn("__last", gramCols.last) // windows can't sit in a WHERE
      .filter(col("__last").isNotNull).drop("__last")
    val noGram = docs
      .select(col(id).as("doc"), Text.tokens(col(text)).as("tk"))
      .select(col("doc"), greatest(size(col("tk")) - (minLen - 2), lit(1)).as("start"),
        col("tk"))
      .select(col("doc"),
        posexplode(expr(s"slice(tk, start, size(tk) - start + 1)")).as(Seq("o", "tok")),
        col("start"))
      .select(col("doc"), (col("start") + col("o")).as("pos"), col("tok"),
        lit(null).cast("int").as("keep"))
    // registry indicator (incremental form): a registered gram can never
    // vouch — its global first occurrence lives in the corpus
    val joined = registry match {
      case Some(reg) => withGram.join(
        reg.withColumn("__inreg", lit(1)), Seq("gram"), "left_outer")
      case None => withGram.withColumn("__inreg", lit(null).cast("int"))
    }
    val byGram = Window.partitionBy(col("gram"))
    val byGramOrd = byGram.orderBy(col("doc"), col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val kept = joined.withColumn("keep",
      (col("__inreg").isNull &&
        ((count(lit(1)).over(byGram) === 1) ||
          (first(col("doc")).over(byGramOrd) === col("doc") &&
            first(col("pos")).over(byGramOrd) === col("pos"))))
        .cast("int"))
      .select(col("doc"), col("pos"), col("tok"), col("keep"))
      .unionByName(noGram)
    val covered = kept.withColumn("cov",
      max(col("keep")).over(byPos.rowsBetween(-(minLen - 1), 0)))
    val survive = coalesce(col("cov"), lit(1)) === 1
    covered.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(survive, 0L).otherwise(1L)).as("n_removed"),
        concat_ws(" ", sort_array(collect_list(
          when(survive, struct(col("pos"), col("tok"))))).getField("tok"))
          .as("new_text"))
      .withColumnRenamed("doc", "doc_id")
  }

  def simhash(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = docs.select(col(id).as("doc"),
        explode(Text.tokens(col(text))).as("t"))
      .select(col("doc"), Text.hash32(col("t"), 0).as("hv"))
    toks.select(col("doc"), col("hv"),
        explode(sequence(lit(0), lit(31))).as("j"))
      .groupBy(col("doc"), col("j"))
      .agg(sum(expr("(shiftright(hv, j) & 1) * 2 - 1")).as("vote"))
      .groupBy(col("doc"))
      .agg(sum(when(col("vote") > 0, expr("shiftleft(1L, j)")).otherwise(0L))
        .as("simhash"))
  }
}
