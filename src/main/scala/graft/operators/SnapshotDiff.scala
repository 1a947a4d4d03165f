package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level snapshot diffing — the ETL regression report that pairs with
  * the distribution-level drift monitor ([[Drift]]): between snapshot N
  * and snapshot N+1, which keys appeared, vanished, or changed content?
  * A crawler re-fetch that silently rewrote half a source, a dedup-stage
  * bug that dropped a shard, an upstream id-space migration — all read
  * directly off these four counters per source before any retrain.
  *
  * One full-outer equi-join on the key (both sides shuffle-partitioned by
  * the same key, so at 100 TB this is a single co-partitioned exchange
  * per side — or zero with bucketed snapshot layout, the
  * [[graft.sources.Bucketing]] pattern), then a per-group rollup.
  * Content equality is judged on a caller-supplied expression (a column,
  * or a hash over many — the md5-row-hash [[graft.functions.Keys]]
  * convention), compared null-safely.
  */
object SnapshotDiff {

  /** Per-group added/removed/changed/unchanged counts from `prev` to
    * `cur`. `cmp` names a column that must exist in BOTH frames and
    * defines "changed" (null-safe inequality on matched keys); `group`
    * likewise exists in both and attributes each key to a report row
    * (taken from the side that has the row; `cur` wins on matches —
    * a key that MOVED groups counts as changed membership on the new
    * side, the report a pipeline wants).
    */
  def diffCounts(prev: DataFrame, cur: DataFrame, key: String, cmp: String,
                 group: String): DataFrame = {
    val p = prev.select(col(key).as("k"), col(cmp).as("pc"),
      col(group).as("pg"), lit(1L).as("in_prev"))
    val c = cur.select(col(key).as("k"), col(cmp).as("cc"),
      col(group).as("cg"), lit(1L).as("in_cur"))
    val status = when(col("in_prev").isNull, lit("added"))
      .when(col("in_cur").isNull, lit("removed"))
      .when(not(col("pc") <=> col("cc")), lit("changed"))
      .otherwise(lit("unchanged"))
    p.join(c, Seq("k"), "full_outer")
      .select(coalesce(col("cg"), col("pg")).as(group), status.as("status"))
      .groupBy(col(group))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"))
  }
}
