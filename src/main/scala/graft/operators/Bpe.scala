package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the public
  * recipe behind every BPE/WordPiece-family tokenizer): starting from
  * characters, repeatedly (1) count adjacent symbol pairs weighted by
  * word frequency (overlapping positions count, the canonical
  * convention), (2) merge the most frequent pair everywhere with the
  * greedy left-to-right rule, (3) record the merge. The ordered merge
  * table IS the tokenizer artifact.
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
  * speaks windows, not regexes.)
  *
  * Scale: BPE trains on a bounded SAMPLE (the q97 rule — training cost
  * independent of corpus size); each of the `nMerges` iterations is two
  * word-keyed window passes + one pair aggregation over the sample, and
  * the only driver-side data is the single winning pair per iteration
  * (the kmeans-centroid pattern). Each generation is lineage-truncated
  * with a LAZY `localCheckpoint` that the next iteration's argmax job
  * materializes (the [[TextDedup]] iterativeCC rule — without it the
  * analyzer re-walks a plan that grows by two windows and two joins per
  * iteration, and planning time explodes combinatorially long before
  * any data is touched).
  */
object Bpe {

  /** Train `nMerges` BPE merges over a (word, freq) table. Returns the
    * ordered merge table (rank, l, r, merged, pair_count); stops early
    * (fewer rows) only if the sample runs out of adjacent pairs.
    */
  def trainMerges(words: DataFrame, word: String, freq: String,
                  nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = words.sparkSession
    val byW = Window.partitionBy("w").orderBy("pos")
    var syms = words
      .select(col(word).as("w"), col(freq).cast("long").as("f"))
      .select(col("w"), col("f"), posexplode(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")))
      .select(col("w"), col("f"), (col("pos") + 1).as("pos"), col("col").as("sym"))
      .localCheckpoint(false)
    val merges = mutable.Buffer.empty[(Int, String, String, String, Long)]
    var exhausted = false
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
        // greedy left-to-right = alternating positions of each match run
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
        // Lazy checkpoint: the NEXT iteration's argmax (or nothing, on
        // the last pass) is the job that materializes this generation —
        // one extra job total, not one per iteration.
        syms = withNext
          .join(curK, Seq("w", "pos"), "left")
          .join(prvK, Seq("w", "pos"), "left")
          .filter(col("prvk").isNull) // the consumed right halves vanish
          .select(col("w"), col("f"),
            when(col("curk"), concat(col("sym"), col("nxt")))
              .otherwise(col("sym")).as("sym"), col("pos"))
          .withColumn("pos", row_number().over(byW))
          .select("w", "f", "pos", "sym")
          .localCheckpoint(false)
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "l", "r", "merged", "pair_count")
  }
}
