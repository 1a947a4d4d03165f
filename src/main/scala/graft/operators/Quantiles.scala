package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Exact per-group quantiles by integer rank arithmetic: the value at rank
  * `ceil(p · n)` (1-based, ascending) — i.e. the smallest value with at
  * least a p-fraction of the group at or below it. This is `quantile_disc`
  * semantics, chosen over interpolated (`percentile_cont`) quantiles
  * deliberately: engines disagree on interpolation arithmetic in the last
  * ulp, they never disagree on integer ranks — same portability rule as
  * [[Sampling.topFractionByGroup]].
  *
  * Scale shape: ONE shuffle on the group key; both windows (rank, count)
  * share the partitioning, and the final rollup reuses the same key. The
  * usual per-key window invariant applies (a group's rows fit a
  * partition); for corpus-scale percentile dashboards where that breaks,
  * Spark's `approx_percentile` sketch is the right tool instead — this
  * operator is the exact gate the oracle can verify.
  */
object Quantiles {

  /** One row per group: `q_<label>` = exact quantile of `value` for each
    * requested (label, p), plus `n` group size. `p` in (0, 1] with at most
    * 6 decimal digits; `tiebreak` makes equal values rank deterministically
    * (any unique column).
    *
    * The target rank ceil(p·n) is evaluated in INTEGER arithmetic —
    * `(rn−1)·1e6 < p_micro·n ≤ rn·1e6` — never as `ceil` of a double
    * product: 0.07·100 is 7.000000000000001 in doubles, so the FP form
    * silently returns rank 8 where the semantics promise rank 7 (and an
    * oracle computing the same double agrees with the same wrong answer).
    * Longs are exact up to group sizes of 2^63/1e6 ≈ 9.2e12 rows.
    */
  def byRank(df: DataFrame, groups: Seq[Column], value: Column, tiebreak: Column,
             ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    require(ps.forall { case (_, p) => p > 0.0 && p <= 1.0 },
      s"quantiles must be in (0,1], got ${ps.map(_._2).mkString(",")}")
    // Enforce the 6-decimal-digit contract loudly: p below 5e-7 would round
    // to pMicro = 0 (a permanently-null quantile column), and p with more
    // decimal digits would silently compute a DIFFERENT quantile than the
    // caller asked for.
    ps.foreach { case (label, p) =>
      val pMicro = math.round(p * 1e6)
      require(pMicro >= 1, s"quantile '$label': p=$p rounds to 0 at the 6-digit precision this operator supports")
      require(pMicro / 1e6 == p, s"quantile '$label': p=$p has more than 6 decimal digits; use a p exactly representable in micro-units")
    }
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(groups: _*)
    val rn = Cols.freeName(df, "__rn")
    val n = Cols.freeName(df, "__n")
    val ranked = df
      .withColumn(rn, row_number().over(byGroup.orderBy(value.asc, tiebreak.asc)))
      .withColumn(n, count(lit(1)).over(byGroup))
    ranked.groupBy(groups: _*)
      .agg(max(col(n)).as("n"),
        ps.map { case (label, p) =>
          val pMicro = math.round(p * 1e6)
          // rank = ceil(p_micro·n / 1e6): exactly one rn satisfies the
          // two-sided integer bound; max() lifts it out of the aggregation.
          val target = (col(rn) - 1) * 1000000L < lit(pMicro) * col(n) &&
            lit(pMicro) * col(n) <= col(rn) * 1000000L
          max(when(target, value)).as(s"q_$label")
        }: _*)
  }
}
