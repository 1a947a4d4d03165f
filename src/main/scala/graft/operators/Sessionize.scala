package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Gap-based sessionization: group a keyed event stream into sessions that
  * break whenever the gap to the previous event exceeds `maxGap`. The
  * clickstream/telemetry primitive the reference's users would need next
  * (its ETL only buckets by day — SURVEY.md §2.7 F4); also the batch twin
  * of Structured Streaming's session windows.
  *
  * Scale shape: ONE shuffle on the session key, then two window passes over
  * the same partitioning (lag → gap flags, running sum → session ordinal) —
  * Spark plans consecutive windows over one `partitionBy` without a second
  * exchange. No driver state, no iteration; a key's events must fit one
  * partition's window buffer (bounded by events-per-user, not corpus size —
  * the same invariant every per-key window in this engine relies on).
  * Session ids are per-key ordinals (key, session_seq), so they are
  * deterministic under any input order given a unique `tiebreak`.
  */
object Sessionize {

  /** Assign each row a `session_seq` ordinal (1-based per key): a new
    * session starts when `time - lag(time) > maxGap` (strictly greater — a
    * gap of exactly `maxGap` stays in-session). Ties in `time` order by
    * `tiebreak` and can never break a session (gap 0).
    */
  def assign(df: DataFrame, keys: Seq[Column], time: Column, tiebreak: Column,
             maxGap: Long): DataFrame = {
    require(maxGap >= 0, s"maxGap must be >= 0, got $maxGap")
    require(!df.columns.contains("session_seq"),
      "input already has a session_seq column — alias it away first")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(time.asc, tiebreak.asc)
    val gap = Cols.freeName(df, "__gap")
    df.withColumn(gap,
        when(time - lag(time, 1).over(w) > maxGap, 1L).otherwise(0L))
      .withColumn("session_seq",
        (sum(col(gap)).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) + 1L).cast("long"))
      .drop(gap)
  }

  /** Sessionize and roll up: one row per (keys, session_seq) with event
    * count, start/end time, duration, and `sum(metric)` — the session-table
    * end product. Same single shuffle as [[assign]]; the rollup reuses the
    * partitioning (partial-aggregated groupBy on a superset key).
    */
  def rollup(df: DataFrame, keys: Seq[Column], time: Column, tiebreak: Column,
             maxGap: Long, metric: Column): DataFrame =
    assign(df, keys, time, tiebreak, maxGap)
      .groupBy(keys :+ col("session_seq"): _*)
      .agg(count(lit(1)).as("n_events"),
        min(time).as("session_start"),
        max(time).as("session_end"),
        (max(time) - min(time)).as("duration"),
        sum(metric).as("sum_metric"))
}
