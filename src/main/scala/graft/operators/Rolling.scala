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
}
