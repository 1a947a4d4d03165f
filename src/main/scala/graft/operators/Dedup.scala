package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication operators (SURVEY.md §2.5).
  *
  * The reference has three dedup devices: newest-wins in-memory iteration
  * (reference `src/blockchain_queries.py:265-288`), load-order +
  * `onDuplicate='ignore'` (`:291-319` — racy across its parallel time
  * chunks, SURVEY.md D4), and content-hash keys collapsing identical
  * payloads (`:224,243`). All three are the same logical operator — argmax
  * per key — which Spark expresses as one shuffle-by-key + per-partition
  * sort. The window form is deterministic under any input order, fixing the
  * reference's D4 race by construction.
  *
  * Scale note: `row_number` over (key) shuffles once on the key and sorts
  * within partitions — the same cost class as the `groupBy` it replaces.
  * For skewed keys AQE skew-join/partition splitting applies; there is no
  * driver-side state.
  */
object Dedup {

  /** Keep exactly one row per key: the first under `order` (e.g. newest
    * timestamp first). Deterministic: supply a total order (include a
    * unique tiebreaker column).
    */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    // Collision-free temp name: withColumn would silently replace an
    // existing column of the same name and corrupt the dedup.
    val rn = graft.functions.Cols.freeName(df, "__rn")
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Top-k per key under `order`, with the 1-based rank exposed as a long
    * column `rankCol` (long on purpose: SQL engines' `row_number` is
    * 64-bit, so oracle schemas line up). Same single-shuffle cost class as
    * [[keepFirst]].
    */
  def keepFirstK(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int, rankCol: String): DataFrame = {
    require(!df.columns.contains(rankCol), s"column $rankCol already exists")
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Newest-wins per key (D2/D3/D4): latest `time`, ties broken by
    * `tiebreak` descending — the semantics the reference *intends* with its
    * `ORDER BY time DESC, hash` + first-write-wins load.
    */
  def newestWins(df: DataFrame, keys: Seq[Column], time: Column, tiebreak: Column): DataFrame =
    keepFirst(df, keys, Seq(time.desc, tiebreak.desc))

  /** First-write-wins (the `onDuplicate='ignore'` sink semantic, reference
    * `src/arango_queries.py:314`), made deterministic by ordering on the
    * supplied columns ascending.
    */
  def firstWins(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order)

  /** [[newestWins]] as a grouped aggregation: `max_by(struct(row),
    * struct(time, tiebreak))`. Same winner per key as the window form
    * (struct comparison is lexicographic; supply a unique tiebreak, same
    * contract), different physical plan: a hash aggregate with MAP-SIDE
    * PARTIAL AGGREGATION, so duplicate-heavy keys collapse before the
    * exchange instead of shuffling every version. Prefer this form when
    * the dup ratio is high (the witness case: days of receipts per hotspot
    * pair); the window form when rows are mostly unique (partial agg then
    * only adds per-row struct packing) or when `time`/`tiebreak` can be
    * null (window sorting places nulls deterministically; max_by skips
    * null ordering keys).
    *
    * Precondition: column names must be unique (`struct(df.columns.map(col))`
    * is ambiguous on frames with duplicate names, e.g. fresh join output).
    * Spark resolves names case-insensitively unless `spark.sql.caseSensitive`
    * is set, so `K` vs `k` counts as a duplicate here too — the check
    * lowercases before comparing. Use [[keepFirst]] there, or re-alias first.
    */
  def newestWinsAgg(df: DataFrame, keys: Seq[Column], time: Column, tiebreak: Column): DataFrame = {
    // Locale.ROOT: default-locale toLowerCase is locale-sensitive (tr_TR
    // lowercases "ID" to "ıd"), which would let exactly the duplicate this
    // check exists to catch slip through.
    val lowered = df.columns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(lowered.distinct.length == lowered.length,
      s"newestWinsAgg requires unique column names (case-insensitive, matching Spark's default resolution), got: ${df.columns.mkString(", ")}")
    val best = graft.functions.Cols.freeName(df, "__best")
    df.groupBy(keys: _*)
      .agg(max_by(struct(df.columns.toIndexedSeq.map(col): _*), struct(time, tiebreak)).as(best))
      .select(col(s"$best.*"))
  }

  /** Exact duplicate collapse by content hash over `contentCols` — one
    * representative row per distinct content (min of `representative`).
    * Returns (key, representative, n_dups, contentCols...).
    */
  def exactByContent(df: DataFrame, contentCols: Seq[String], representative: String): DataFrame = {
    val key = md5(to_json(struct(contentCols.map(col): _*))).as("_key")
    df.groupBy(key +: contentCols.map(col): _*)
      .agg(min(col(representative)).as("representative"),
        count(lit(1)).as("n_dups"))
  }
}
