package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range rolling aggregates: per key, the running sum/count of a
  * metric over a trailing value-based window (`RANGE BETWEEN lookback
  * PRECEDING AND CURRENT ROW`) — "each event with its user's last-24h
  * spend" — the rate/velocity feature a fraud or engagement pipeline
  * attaches to every event.
  *
  * RANGE (not ROWS) frames deliberately: the frame boundary is defined by
  * the TIME VALUE, so rows with equal timestamps all see the identical
  * frame regardless of their order within the partition — deterministic
  * without a tiebreak, where a ROWS frame under duplicate timestamps is
  * not. One shuffle on the key; Spark evaluates the running frame in a
  * single partition-local pass (sliding two-pointer over the sorted run,
  * not O(frame) re-aggregation per row).
  */
object Rolling {

  /** Attach `roll_sum` and `roll_cnt` of `metric` over the trailing
    * `lookback` (inclusive both ends: [time − lookback, time]) per key.
    * `time` must be numeric (µs-since-epoch longs here) — RANGE frames
    * order by value.
    */
  def overRange(df: DataFrame, keys: Seq[Column], time: Column, metric: Column,
                lookback: Long): DataFrame = {
    require(lookback >= 0, s"lookback must be >= 0, got $lookback")
    require(!df.columns.contains("roll_sum") && !df.columns.contains("roll_cnt"),
      "input already has a roll_sum/roll_cnt column — alias it away first " +
        "(chaining two lookbacks would silently clobber the first)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(time.asc)
      .rangeBetween(-lookback, 0)
    df.withColumn("roll_sum", sum(metric).over(w))
      .withColumn("roll_cnt", count(lit(1)).over(w))
  }

  /** Recency-decayed aggregate — the feature-store staple ("activity
    * score, halved every H") in EXACT integer arithmetic: the weight is
    * `1e6 >> elapsed_halvings` (ppm), zero after 20 halvings (< 1 ppm),
    * so the decayed sum is a plain integer aggregate with map-side
    * partial aggregation — one shuffle on the group key, no window. The
    * usual `exp(-λΔt)` form needs `pow`, which IEEE does NOT require
    * correctly rounded — engines disagree in the last ulp and a hash
    * compare dies; halving per whole interval keeps the semantics
    * (geometric decay) and the portability (shifts are exact everywhere,
    * the q63/q64 integer-arithmetic rule).
    *
    * `asOf` anchors the decay (rows newer than it get weight 1e6 — pass
    * the corpus max for "as of now"); weights reference `time` only
    * through `(asOf − time) div halfLife`, so late-arriving data
    * re-aggregates deterministically.
    */
  def decayedSum(df: DataFrame, keys: Seq[Column], time: Column,
                 metric: Column, asOf: Long, halfLife: Long): DataFrame = {
    require(halfLife > 0, s"halfLife must be positive, got $halfLife")
    // the Scala shiftright() helper only takes a literal shift — the SQL
    // form accepts a column amount on both engines
    val weight = expr(
      s"""CASE WHEN greatest(0L, (${asOf}L - __decay_t) div ${halfLife}L) >= 20
         |     THEN 0L
         |     ELSE shiftright(1000000L,
         |       cast(greatest(0L, (${asOf}L - __decay_t) div ${halfLife}L) as int))
         |END""".stripMargin)
    df.withColumn("__decay_t", time)
      .groupBy(keys: _*)
      .agg(sum(metric * weight).as("decayed_ppm"),
        sum(metric).as("raw_sum"), count(lit(1)).as("n"))
  }
}
