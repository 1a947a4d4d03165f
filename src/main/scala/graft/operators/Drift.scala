package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus distribution-drift monitoring — the check a production
  * training-data pipeline runs between snapshot N and snapshot N+1
  * before a retrain: has the feature distribution moved? A crawler that
  * silently started truncating pages, a source whose language mix
  * shifted, a dedup stage that began over-pruning long documents — all
  * surface here first, as binned-feature drift between snapshots.
  *
  * The metric is TOTAL-VARIATION distance, TVD = ½·Σ_b |p_b − q_b|,
  * chosen over PSI/KL deliberately: no logarithms (log(x) differs in
  * the last ulp across libm implementations — a KL oracle would be FP
  * russian roulette at pm rounding boundaries), defined when a bin is
  * empty on one side (KL is infinite there), bounded [0, 1], and
  * computable EXACTLY in integers via cross-multiplication:
  *
  *   tvd_pm = Σ_b |ca_b·nb − cb_b·na| · 1e6 div (2·na·nb)
  *
  * — every intermediate an integer, so engine and oracle agree
  * bit-for-bit by construction.
  */
object Drift {

  /** Long-range guard: Σ_b|ca·nb − cb·na| ≤ 2·na·nb, so the pm scaling
    * needs 2·na·nb·1e6 < 2^63 ⟹ na·nb < ~4.6e12 (≈2M docs per side).
    * At corpus scale feed a deterministic hash SAMPLE
    * ([[Sampling.hashBucket]] < pct) — drift is a statistical monitor
    * and the fixed 1%-sample is the production shape anyway; the guard
    * below turns an overflow into a loud error, never a wrong number.
    */
  val MaxCrossProduct: Long = Long.MaxValue / 2000000L

  /** Per-group TVD between the `splitA` and `splitB` rows of a binned
    * long-form frame: one row per (groupCols…, bin, split) observation.
    * Returns one row per groupCols… with (na, nb, tvd_pm). Two keyed
    * aggregations, no FP anywhere; empty sides yield tvd_pm = 1e6
    * against any non-empty side (all mass moved) and 0 when both are
    * empty-vs-empty never happens (no rows → no group).
    */
  def tvd(binned: DataFrame, groupCols: Seq[String], binCol: String,
          splitCol: String, splitA: String, splitB: String): DataFrame = {
    require(groupCols.nonEmpty, "tvd needs at least one group column")
    val counts = binned
      .filter(col(splitCol) === splitA || col(splitCol) === splitB)
      .groupBy(groupCols.map(col) :+ col(binCol): _*)
      .agg(
        sum(when(col(splitCol) === splitA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(splitCol) === splitB, 1L).otherwise(0L)).as("cb"))
    tvdFromCounts(counts, groupCols)
  }

  /** Reference-histogram registry of a snapshot: per-(groupCols…, bin)
    * counts — the artifact a monitoring pipeline materializes ONCE from
    * the reference corpus and scores every later batch against
    * ([[tvdAgainstRegistry]]). |bins| rows per group, corpus-independent
    * size — the lmCounts/gram-registry pattern: what persists is the
    * aggregate, never the rows that produced it.
    */
  def binnedCounts(binned: DataFrame, groupCols: Seq[String],
                   binCol: String): DataFrame =
    binned.groupBy(groupCols.map(col) :+ col(binCol): _*)
      .agg(count(lit(1)).as("c"))

  /** Per-group TVD of an incoming batch against a frozen
    * [[binnedCounts]] registry — the incremental form of [[tvd]]: the
    * reference side costs nothing per batch (its rows were aggregated
    * away at registry-build time), the batch side is one keyed count,
    * and the join is |bins|-sized. Group columns present only on one
    * side read as full drift against an empty opposite histogram, same
    * as [[tvd]]'s empty-side rule. Equivalence to the two-split batch
    * form is spec-pinned.
    */
  def tvdAgainstRegistry(registry: DataFrame, batch: DataFrame,
                         groupCols: Seq[String], binCol: String): DataFrame =
    tvdBetweenCounts(registry, binnedCounts(batch, groupCols, binCol),
      groupCols, binCol)

  /** TVD between two [[binnedCounts]]-shaped frames (reference side `ref`
    * as p, current side `cur` as q) — the counts-level core behind
    * [[tvdAgainstRegistry]], exposed for consumers that already HOLD
    * aggregated counts (the streaming monitor sums its per-batch
    * partials into exactly this shape; counts are associative, so
    * partial sums ≡ a global count).
    */
  def tvdBetweenCounts(ref: DataFrame, cur: DataFrame,
                       groupCols: Seq[String], binCol: String): DataFrame = {
    require(groupCols.nonEmpty, "tvd needs at least one group column")
    val gb = groupCols :+ binCol
    val counts = ref
      .select(gb.map(col) :+ col("c").as("ca") :+ lit(0L).as("cb"): _*)
      .unionByName(cur
        .select(gb.map(col) :+ lit(0L).as("ca") :+ col("c").as("cb"): _*))
      .groupBy(gb.map(col): _*)
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    tvdFromCounts(counts, groupCols)
  }

  /** The shared arithmetic: (groupCols…, bin, ca, cb) → one row per
    * group with (na, nb, tvd_pm). Exact-integer end to end.
    */
  private def tvdFromCounts(counts: DataFrame,
                            groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val tot = counts.groupBy(g: _*)
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    counts.join(tot, groupCols)
      .groupBy((g :+ col("na")) :+ col("nb"): _*)
      .agg(sum(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("xnum"))
      .select(
        g ++ Seq(col("na"), col("nb"),
          when(col("na") === 0 || col("nb") === 0,
            when(col("na") === col("nb"), 0L).otherwise(1000000L))
            .otherwise(
              when(col("na") * col("nb") > MaxCrossProduct,
                raise_error(concat(lit("Drift.tvd overflow: na*nb too "),
                  lit("large - feed a hash sample"))).cast("long"))
              .otherwise(expr(
                "(xnum * CAST(1000000 AS BIGINT)) div (2 * na * nb)")))
            .as("tvd_pm")): _*)
  }
}
