package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Data selection via hashed n-gram importance resampling — the DSIR
  * recipe (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): fit cheap bag-of-hashed-ngram models of a
  * TARGET corpus (the data you want more of) and the RAW pool, score
  * every raw document by how much more likely the target model finds its
  * features, and resample the pool toward the target distribution.
  *
  * Faithful-to-scale shape, exact-to-the-bit arithmetic:
  *  - features are word unigrams + bigrams, OCCURRENCES not distinct
  *    (counts are the model), hashed into `buckets` ids with the repo's
  *    portable md5 base hash ([[Text.baseHash32]] — the same family the
  *    DuckDB oracles reproduce);
  *  - both models are add-one-smoothed bucket multinomials. DSIR scores
  *    with Σ log p_t/p_r; logs are not hash-portable across engines, so
  *    the engine scores with the ARITHMETIC likelihood ratio in exact
  *    micro-units — per-bucket probabilities share the corpus-wide
  *    denominator (T + buckets), so the per-doc sums reduce to integer
  *    sums of smoothed counts: `score_pm = (1e6 · Σ(c_t(b)+1)) div
  *    Σ(c_r(b)+1)` over the doc's feature occurrences, with the global
  *    (T_r+B)/(T_t+B) factor folded out (constant across docs —
  *    ranking-invariant). Same integer-micro-unit convention as the q103
  *    CCNet gate; deterministic on every engine.
  *  - resampling is the deterministic top-N by (score_pm DESC,
  *    md5(id) ASC) — the hash tiebreak is the derandomized stand-in for
  *    DSIR's Gumbel noise (same role: shuffle among near-equal scores,
  *    reproducible here by construction).
  *
  * Scale shape (100 TB): feature explode is linear and row-local; each
  * side collapses to a ≤`buckets`-row count table via one map-side-
  * combined aggregation; the per-occurrence probability join is against
  * that BROADCAST bucket table (no shuffle); the per-doc rollup is one
  * keyed shuffle; selection is TakeOrderedAndProject (per-partition
  * top-N + driver merge of N rows, never a global sort). The target
  * model is typically small (a quality corpus) and the raw model is one
  * aggregate over the pool — both fit the driver trivially at any corpus
  * size since they are bucket-bounded. Long arithmetic holds while
  * n_feats·(T_t+1) < 9.2e12 (score numerator ≤ 1e6·Σ(c_t+1)); beyond
  * that (petabyte token counts) the sums move to decimal(38,0) —
  * bucket-bounded, so the switch is mechanical.
  */
object Dsir {

  /** (id, bucket) — one row per unigram/bigram OCCURRENCE of each doc. */
  def featureBuckets(docs: DataFrame, id: String, text: String,
                     buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = Text.tokens(col(text))
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i.cast("int")),
          element_at(toks, (i + 1).cast("int")))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(id), explode(concat(toks, bigrams)).as("f"))
      .select(col(id), pmod(Text.baseHash32(col("f")), lit(buckets.toLong)).as("bucket"))
  }

  /** The frozen model artifact: (bucket, st, sr) with st = c_target+1,
    * sr = c_raw+1 over buckets observed in EITHER corpus. ≤ `buckets`
    * rows — the thing a deployment trains ONCE and broadcasts to every
    * scorer (the [[graft.streaming.Incremental.streamingDsirScore]]
    * shape). A bucket seen only in the target keeps its smoothed target
    * mass (st = c_t+1, sr = 1) instead of falling to the neutral 1/1
    * the scorer's coalesce would supply — in-pool docs never hit such
    * buckets (their buckets have c_raw ≥ 1 by construction, so
    * q110/q117 arithmetic is unchanged), but OUT-of-pool docs carrying
    * target-distinctive vocabulary now score the full (c_t+1)/1 DSIR
    * contribution rather than a floor. Shape: both sides' feature
    * streams union with a side tag and collapse in ONE map-side-combined
    * aggregation (a full-outer join of two count tables would force a
    * shuffle join — full-outer cannot broadcast — where this is a
    * single keyed exchange over pre-combined partials).
    */
  def bucketStats(raw: DataFrame, target: DataFrame, id: String,
                  text: String, buckets: Int): DataFrame =
    featureBuckets(raw, id, text, buckets).select(col("bucket"), lit(0).as("__side"))
      .unionByName(featureBuckets(target, id, text, buckets)
        .select(col("bucket"), lit(1).as("__side")))
      .groupBy(col("bucket"))
      .agg((sum(when(col("__side") === 1, 1L).otherwise(0L)) + 1L).as("st"),
        (sum(when(col("__side") === 0, 1L).otherwise(0L)) + 1L).as("sr"))

  /** Score `docs` against a frozen (bucket, st, sr) model: (id, n_feats,
    * score_pm). Buckets the model never observed smooth to st = sr = 1
    * (a neutral ratio contribution) — scoring a batch drawn from the
    * model's own pool matches the all-at-once path exactly, and unseen
    * vocabulary degrades gracefully.
    */
  def scoreAgainst(docs: DataFrame, stats: DataFrame, id: String,
                   text: String, buckets: Int): DataFrame =
    featureBuckets(docs, id, text, buckets)
      .join(broadcast(stats), Seq("bucket"), "left_outer")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("st"), lit(1L))).as("num"),
        sum(coalesce(col("sr"), lit(1L))).as("den"))
      .select(col(id), col("n_feats"),
        expr("(1000000 * num) div den").as("score_pm"))

  /** Importance scores for every raw doc: (id, n_feats, score_pm) with
    * `score_pm = (1e6 · Σ_occ (c_target(bucket)+1)) div Σ_occ (c_raw(bucket)+1)`.
    * Higher = more target-like.
    *
    * Two-pass note: this all-at-once form scans the raw pool twice —
    * once to fit the bucket counts, once to score — the inherent
    * fit-then-apply shape. A deployment fits [[bucketStats]] ONCE
    * (materialized, ≤`buckets` rows) and pays a single scoring pass per
    * batch thereafter; [[graft.streaming.Incremental.streamingDsirScore]]
    * is exactly that form. Caching the exploded feature stream instead
    * would store strictly more bytes than re-scanning the source reads.
    */
  def importanceScores(raw: DataFrame, target: DataFrame, id: String,
                       text: String, buckets: Int): DataFrame =
    scoreAgainst(raw, bucketStats(raw, target, id, text, buckets),
      id, text, buckets)

  /** Deterministic resample: the `n` most target-like docs, hash
    * tiebreak (the derandomized Gumbel role). TakeOrderedAndProject —
    * never a global sort.
    */
  def resample(scored: DataFrame, id: String, n: Int): DataFrame =
    scored.orderBy(col("score_pm").desc, md5(col(id).cast("string")).asc)
      .limit(n)

  /** The full selection: score `raw` against `target`, keep the top `n`. */
  def select(raw: DataFrame, target: DataFrame, id: String, text: String,
             buckets: Int, n: Int): DataFrame =
    resample(importanceScores(raw, target, id, text, buckets), id, n)
}
