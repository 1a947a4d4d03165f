package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-step ordered funnel — the generalization of the chained as-of
  * funnel (q119 hardcoded three steps; any real funnel ask is "now add a
  * step"): a fold of [[AsOf.backward]] over the step list, each hop
  * enriching step i's events with the latest prior step-(i−1) event
  * within that hop's window, CARRYING the whole accumulated chain as one
  * atomic struct (a scalar carry would let a step-i match reach back to
  * an OLDER step-i event's upstream chain and mispair — the q119
  * struct-carry rule, applied at every hop).
  *
  * Cost: one user-keyed exchange per hop (the union-window as-of is a
  * single shuffle + partition-local sort; no candidate blowup at any
  * key skew), so an N-step funnel is ≤ N−1 exchanges, all on the user
  * key — and a same-keyed rollup on top reuses the last hop's
  * clustering. Plan-pinned for N=4 in PlanSpec (q122); the funnel
  * scale probe records the linear 1/4/16/64× curve (SCALE.md).
  *
  * Streaming path: each hop is exactly the
  * [[graft.streaming.Streams.asofEnrichState]] contract (newest-wins
  * right state, event-time-ordered arrival), so a live funnel is that
  * stage chained N−1 times — the batch fold here is the replay/backfill
  * twin of that topology, same per-hop windows and tiebreaks.
  */
object Funnel {

  /** Enrich the FINAL step's events with the ids of every prior step in
    * the chain.
    *
    * @param events  one event frame; `user`/`time`/`id` name its columns
    *                (`id` must be an INTEGRAL type, enforced — it is
    *                each hop's long tiebreak at duplicate timestamps,
    *                and a non-integral id would cast to null silently)
    * @param steps   one predicate per funnel step, in order (size ≥ 2)
    * @param windows windows(i) = max age (in `time` units) of a step-i+1
    *                match when enriching step i+2 — the per-hop window,
    *                the pandas `merge_asof(tolerance)` contract
    * @return all final-step rows: (user, time, stepN_id, step1_id …
    *         step{N−1}_id); step j's id is null when the chain is broken
    *         at or before hop j (prefix chains only — a later id can be
    *         non-null while an earlier one is null, never the reverse
    *         within one hop's atomic carry)
    */
  def funnelN(events: DataFrame, user: String, time: String, id: String,
              steps: Seq[Column], windows: Seq[Long]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(windows.size == steps.size - 1,
      s"need one window per hop: ${steps.size - 1} hops, ${windows.size} windows")
    // the id is each hop's deterministic tiebreak, compared AS A LONG
    // inside AsOf.backward — a non-integral id would silently cast to
    // null there and collapse the tiebreak order, so reject it by type
    // here where the caller can see it
    events.schema(id).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"funnel id column '$id' must be an integral type (it is the " +
          s"per-hop long tiebreak); got ${other.simpleString}")
    }
    def stepCol(i: Int) = s"step${i + 1}_id"
    def stepDf(i: Int) = events.filter(steps(i))
      .select(col(user), col(time), col(id).as(stepCol(i)))
    val hopPrefix = "__hop_"
    (1 until steps.size).foldLeft(stepDf(0)) { (acc, i) =>
      val carryCols = (0 until i).map(stepCol)
      val enriched = AsOf.backward(stepDf(i), acc, Seq(user), time,
          tiebreak = stepCol(i - 1), carry = carryCols,
          prefix = hopPrefix, maxAge = Some(windows(i - 1)))
        .drop(s"${hopPrefix}age")
      carryCols.foldLeft(enriched)((df, c) =>
        df.withColumnRenamed(hopPrefix + c, c))
    }
  }
}
