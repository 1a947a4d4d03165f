package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING and APPLICATION (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * the public recipe behind every BPE/WordPiece-family tokenizer):
  * starting from characters, repeatedly (1) count adjacent symbol pairs
  * weighted by word frequency (overlapping positions count, the
  * canonical convention), (2) merge the most frequent pair everywhere
  * with the greedy left-to-right rule, (3) record the merge. The ordered
  * merge table IS the tokenizer artifact; applying it in rank order
  * segments any word.
  *
  * Determinism: ties on pair count break lexicographically (left asc,
  * right asc) — engines never disagree on integer counts + string
  * order, so the whole training run is hash-exact across engines (the
  * oracle generates the same N iterations in SQL, the Lloyd-twin
  * pattern).
  *
  * Greedy-merge-as-relational-algebra: a merge pass never needs
  * sequential scanning. Match positions of the winning pair form
  * maximal consecutive runs (an overlap `i, i+1` can only happen
  * inside a run); greedy left-to-right keeps exactly the alternating
  * positions of each run, i.e. `(pos − run_start) % 2 == 0`, which two
  * windows compute: `grp = pos − row_number()` groups a run,
  * `min(pos) OVER (w, grp)` anchors it. (RE2-style regex replace can't
  * express this portably — no lookbehind — which is why the operator
  * speaks windows, not regexes.) ONE pass per rule is exhaustive: the
  * merged symbol is a fresh token that can never re-form its own rule's
  * (l, r) adjacency.
  *
  * Scale: BPE trains on a bounded SAMPLE (the q97 rule — training cost
  * independent of corpus size); each of the `nMerges` iterations is two
  * word-keyed window passes + one pair aggregation over the sample, and
  * the only driver-side data is the single winning pair per iteration
  * (the kmeans-centroid pattern). APPLICATION runs over the corpus'
  * DISTINCT words — a Zipf-bounded vocabulary, never the token stream —
  * and callers re-join pieces to the corpus by word key. Each generation
  * is lineage-truncated with a LAZY `localCheckpoint` that the next
  * action materializes (the [[TextDedup]] iterativeCC rule — without it
  * the analyzer re-walks a plan that grows by two windows and two joins
  * per iteration, and planning time explodes combinatorially long before
  * any data is touched).
  */
object Bpe {

  private val byW = Window.partitionBy("w").orderBy("pos")

  /** Unpersist the RDD behind a `localCheckpoint`ed frame. `df.rdd` would
    * derive a NEW RDD over the checkpointed one (unpersisting it is a
    * no-op); the persisted blocks belong to the `LogicalRDD`'s own RDD,
    * reached through the logical plan.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false))

  /** Character-level symbol table (w, extra…, pos, sym) for a word list;
    * empty words contribute no rows (and `sequence(1, 0)` would run
    * DESCENDING, so they must not reach the explode).
    *
    * `singlePartition`: the TRAINER's vocabulary is BOUNDED (the top-N
    * sample contract), so its symbol table is a few thousand rows — the
    * [[TextDedup]] localCC reasoning ("fits one partition → run it
    * there"): every per-iteration window, join, and pair aggregate then
    * runs exchange-free (SinglePartition satisfies every clustering, and
    * `localCheckpoint` preserves partitioning), where the session's 32
    * shuffle partitions paid two exchanges per merge pass to move
    * kilobytes. SEGMENTATION stays hash-distributed: it runs over the
    * full corpus vocabulary, unbounded at web scale.
    */
  private def charSyms(words: DataFrame, word: String, extra: Seq[String],
                       singlePartition: Boolean): DataFrame = {
    val in = words
      .withColumn("w", col(word))
      .filter(length(col("w")) >= 1)
    (if (singlePartition) in.repartition(1) else in)
      .select(col("w") +: extra.map(col) :+ posexplode(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")): _*)
      .select(col("w") +: extra.map(col) :+
        (col("pos") + 1).as("pos") :+ col("col").as("sym"): _*)
  }

  /** One greedy left-to-right merge pass of (l, r) over a
    * (w, extra…, pos, sym, nxt) table: keep the alternating positions of
    * each match run, drop the consumed right halves, renumber.
    */
  private def mergePass(withNext: DataFrame, l: String, r: String,
                        extra: Seq[String]): DataFrame = {
    val kept = withNext
      .filter(col("sym") === lit(l) && col("nxt") === lit(r))
      .withColumn("grp", col("pos") - row_number().over(byW))
      .withColumn("off",
        col("pos") - min(col("pos")).over(Window.partitionBy("w", "grp")))
      .filter(col("off") % 2 === 0)
      .select(col("w"), col("pos"))
    val curK = kept.withColumn("curk", lit(true))
    val prvK = kept.select(col("w"), (col("pos") + 1).as("pos"))
      .withColumn("prvk", lit(true))
    withNext
      .join(curK, Seq("w", "pos"), "left")
      .join(prvK, Seq("w", "pos"), "left")
      .filter(col("prvk").isNull) // the consumed right halves vanish
      .select(col("w") +: extra.map(col) :+
        when(col("curk"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym") :+ col("pos"): _*)
      .withColumn("pos", row_number().over(byW))
      .select("w" +: extra :+ "pos" :+ "sym" map col: _*)
  }

  /** Train `nMerges` BPE merges over a (word, freq) table. Returns the
    * ordered merge table (rank, l, r, merged, pair_count); stops early
    * (fewer rows) only if the sample runs out of adjacent pairs.
    */
  def trainMerges(words: DataFrame, word: String, freq: String,
                  nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = words.sparkSession
    // Normalize to one row per word (duplicate vocab rows SUM their
    // frequencies — the only well-defined reading of a (word, freq)
    // table; without this, every window below would interleave the
    // duplicates' symbol rows in nondeterministic tie order).
    val vocab = words.select(col(word), col(freq).cast("long").as("f"))
      .groupBy(col(word)).agg(sum(col("f")).as("f"))
    var syms = charSyms(vocab, word, Seq("f"), singlePartition = true)
      .localCheckpoint(false)
    // Training fully materializes inside this call (the merge table is a
    // local Seq), so the checkpoint generations are DEAD on return — free
    // them eagerly instead of leaving blocks for the ContextCleaner (a
    // resident engine's registry loop would otherwise accumulate them;
    // the lazy segment-side checkpoints stay caller-owned via
    // graft.Caches.clearAll because the returned frame still needs them).
    val gens = mutable.Buffer(syms)
    val merges = mutable.Buffer.empty[(Int, String, String, String, Long)]
    var exhausted = false
    // Loop sizing (the q147/q153 convention, with a twist the A/B
    // exposed): the symbol table lives on ONE partition (charSyms
    // singlePartition), so every per-iteration shuffle is hand-sized to
    // 1 AND adaptive re-planning is disabled together. AQE off ALONE is
    // SLOWER (+10% — with the session's 32 shuffle partitions, AQE's
    // post-shuffle coalesce was doing real work); the win only appears
    // once the partition count states the truth AQE had to discover
    // per-round. Family A/B at sf0.1 (SCALE.md r15 bpeaqe): 14.0 →
    // 11.7 s over q105/q106/q109/q133, reproduced.
    graft.functions.Cols.withLoopConf(spark, 1) {
      for (k <- 1 to nMerges if !exhausted) {
        val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(byW))
        val best = withNext.filter(col("nxt").isNotNull)
          .groupBy(col("sym").as("l"), col("nxt").as("r"))
          .agg(sum(col("f")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect() // ONE row — the kmeans-centroid scale of collect
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += ((k, l, r, l + r, cnt))
          // Lazy checkpoint: the NEXT iteration's argmax (or nothing, on
          // the last pass) is the job that materializes this generation —
          // one extra job total, not one per iteration.
          syms = mergePass(withNext, l, r, Seq("f")).localCheckpoint(false)
          gens += syms
        }
      }
    }
    gens.foreach(freeCheckpoint)
    import spark.implicits._
    merges.toSeq.toDF("rank", "l", "r", "merged", "pair_count")
  }

  /** Segment every word with an ordered merge list (the tokenizer's
    * ENCODE path): one greedy pass per rule, rank order. Returns
    * (w, pieces, n_pieces) where `pieces` joins the surviving symbols
    * with single spaces. Training evolves its own symbol table by the
    * identical pass, so `applyMerges(trainWords, merges)` reproduces the
    * trainer's final state — the equivalence the q106 oracle pins.
    *
    * Execution: the codegen'd [[graft.expressions.BpeSegment]] kernel —
    * segmentation is per-word pure, so it runs INSIDE whole-stage codegen
    * as one shuffle-free projection (plus the distinct), not the trainer's
    * per-rule window passes (8 rules = 8 sequential job barriers — at
    * sf0.1 that was ~2.5 s of almost pure scheduling). The window algebra
    * survives as [[applyMergesWindowed]], the cross-checked twin BpeSpec
    * holds the kernel to.
    */
  def applyMerges(words: DataFrame, word: String,
                  merges: Seq[(String, String)]): DataFrame = {
    // Same normalization as the trainer: duplicates carry no information
    // for segmentation, so distinct() is the semantics; empty words
    // contribute no symbol rows in the window form, so they are filtered
    // here too (not segmented to an empty piece list).
    val ls = typedLit(merges.map(_._1))
    val rs = typedLit(merges.map(_._2))
    words.select(col(word).as("w")).distinct()
      .filter(length(col("w")) >= 1)
      .select(col("w"),
        call_function("bpe_segment", col("w"), ls, rs).as("seg"))
      .select(col("w"), col("seg.pieces").as("pieces"),
        col("seg.n_pieces").as("n_pieces"))
  }

  /** The window-algebra segmentation — [[applyMerges]]'s relational twin
    * (identical greedy semantics, one merge pass per rule as two window
    * functions + two joins). Kept as the independent implementation the
    * equivalence property in BpeSpec cross-checks the codegen'd kernel
    * against; [[applyMerges]] is the shipped path.
    */
  def applyMergesWindowed(words: DataFrame, word: String,
                          merges: Seq[(String, String)]): DataFrame = {
    var syms = charSyms(words.select(col(word)).distinct(), word,
        Seq.empty, singlePartition = false)
      .localCheckpoint(false)
    for ((l, r) <- merges) {
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(byW))
      syms = mergePass(withNext, l, r, Seq.empty).localCheckpoint(false)
    }
    syms.groupBy(col("w"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sym")))),
          x => x("sym")), " ").as("pieces"),
        count(lit(1)).as("n_pieces"))
  }
}
