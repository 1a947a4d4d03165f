package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming forms of the incremental semantics (SURVEY.md
  * §2.10): the reference hand-rolls a polling follower; here the same
  * contracts are event-time streams — watermarks bound state exactly like
  * the T4/T5 sliding windows bound the batch recomputes.
  *
  * Scale notes: all three operators are keyed stateful transforms — state
  * lives in the state store partitioned by key, no driver state, and the
  * watermark bounds its size (5-day event-time horizon ⇒ state ∝ active
  * keys within the horizon, independent of total history).
  */
object Streams {

  /** A witness-edge observation on the stream (one exploded receipt). */
  case class WitnessObs(key: String, time: Long, snr: Double, isValid: Boolean)
  /** The retained newest edge per ordered pair. */
  case class WitnessLatest(key: String, time: Long, snr: Double, isValid: Boolean)

  /** T5 streaming: per-user event-time windowed reward sums with a
    * watermark (the `rewards_5d` window as a live aggregate instead of a
    * whole-window recompute). Input needs `ts_us` (long µs) + `user_id` +
    * `value`; emits one row per (user, window).
    */
  def windowedRewards(events: DataFrame, windowLength: String,
                      watermarkDelay: String): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), window(col("ts"), windowLength).as("w"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rewards_c"),
        count(lit(1)).as("cnt"))
      .select(col("user_id"), col("w.start").as("window_start"),
        col("rewards_c"), col("cnt"))

  /** D2/D4 streaming: deterministic newest-wins per ordered-pair key as
    * running state (`mapGroupsWithState`) — the streaming twin of
    * [[graft.operators.Dedup.newestWins]]. Late or duplicate receipts
    * never regress the stored edge (T6). Emits the current winner per key
    * on every update.
    */
  def newestWinsState(obs: Dataset[WitnessObs]): Dataset[WitnessLatest] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .mapGroupsWithState[WitnessLatest, WitnessLatest](GroupStateTimeout.NoTimeout) {
        (key, batch, state: GroupState[WitnessLatest]) =>
          import scala.math.Ordering.Implicits._
          val newestInBatch = batch.maxBy(o => (o.time, o.snr))
          val winner = state.getOption match {
            case Some(cur) if (cur.time, cur.snr) >= ((newestInBatch.time, newestInBatch.snr)) => cur
            case _ =>
              val w = WitnessLatest(key, newestInBatch.time,
                newestInBatch.snr, newestInBatch.isValid)
              state.update(w)
              w
          }
          winner
      }
  }

  /** T6 streaming: watermark-bounded exactly-once by content key —
    * `dropDuplicates` over the D1 key with the event-time watermark
    * bounding the dedup state (the streaming twin of `onDuplicate='ignore'`
    * with a retention horizon).
    */
  def dedupByContentKey(events: DataFrame, keyCol: String,
                        watermarkDelay: String): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates(keyCol, "ts")
}
