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
    * requested (label, p), plus `n` group size. `p` in (0, 1]; `tiebreak`
    * makes equal values rank deterministically (any unique column).
    */
  def byRank(df: DataFrame, groups: Seq[Column], value: Column, tiebreak: Column,
             ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    require(ps.forall { case (_, p) => p > 0.0 && p <= 1.0 },
      s"quantiles must be in (0,1], got ${ps.map(_._2).mkString(",")}")
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
          // max(value | rank = ceil(p·n)): exactly one row matches, max is
          // just the portable way to lift it out of the aggregation.
          max(when(col(rn) === ceil(lit(p) * col(n)), value)).as(s"q_$label")
        }: _*)
  }
}
