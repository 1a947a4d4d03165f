package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Geo, Keys}
import graft.operators.{Dedup, Merge}
import graft.sources.Tables

/** The reference's relational operator inventory (SURVEY.md §2) re-expressed
  * over the driver test tables. Each query has a DuckDB oracle twin in
  * [[Oracles.relational]]; column names and value canonicalization (money as
  * integer cents, days as strings, timestamps at µs) are chosen so both
  * engines produce hash-identical results — see individual notes.
  *
  * Scale notes live on the operators these queries compose
  * ([[graft.operators.Dedup]], [[graft.operators.Merge]]); the common
  * themes: dimension joins are broadcast, aggregations are partial+final
  * hash aggs, every query is a single shuffle unless inherently two-stage.
  */
object Relational {

  /** Money as integer cents: FP sums are order-dependent, integer sums are
    * exact and associative — deterministic across engines and at any
    * parallelism (SURVEY.md §1.3: amounts are integer "bones" for the same
    * reason).
    */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  private def day(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Microsecond epoch of the ns-long events.ts — DuckDB timestamp precision. */
  private val tsUs = expr("ts div 1000")

  // A1: SUM … GROUP BY (reference `src/blockchain_queries.py:197,206-207`).
  def q01AggSumGroupBy(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        count(lit(1)).as("cnt"))

  // P1: strictly-exclusive time-range bounds on both ends (reference
  // `src/blockchain_queries.py:174,197,235` — semantics preserved exactly).
  val Q02Lo = 1704672000000000L // 2024-01-08T00:00:00Z µs
  val Q02Hi = 1705881600000000L // 2024-01-22T00:00:00Z µs
  def q02FilterTimeRange(spark: SparkSession, d: String): DataFrame =
    Tables.eventsExclusiveRangeUs(spark, d, Q02Lo, Q02Hi)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("sum_value_c"))

  // P3+P7: IN-list predicate + narrow projection (reference
  // `src/blockchain_queries.py:235`; pruning reaches the parquet scan).
  def q03FilterInProjection(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_orderstatus") === "O")
      .select("o_orderkey", "o_orderpriority", "o_orderstatus")

  // J1+J2+F6+P8: double left-outer dimension enrichment — the hotspot
  // pipeline shape (reference `src/blockchain_queries.py:137-139`). Both
  // dimension sides broadcast: zero shuffles at any fact-table scale.
  def q04JoinLeftEnrich(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "customer")
      .join(broadcast(Tables(spark, d, "nation")),
        col("c_nationkey") === col("n_nationkey"), "left_outer")
      .join(broadcast(Tables(spark, d, "region")),
        col("n_regionkey") === col("r_regionkey"), "left_outer")
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"),
        coalesce(col("r_name"), lit("UNKNOWN")).as("region_name"),
        Keys.vertexRef("accounts", col("c_name")).as("vertex_ref"))

  // J3+P4+A1: fact-fact inner join, filter on the joined side, then
  // aggregate — the rewards⨝transactions shape (reference
  // `src/blockchain_queries.py:173-174`). Join key = the aggregation's
  // upstream key; AQE handles skew.
  def q05JoinInnerAgg(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "lineitem")
      .join(Tables(spark, d, "orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("cnt"))

  // A4+J5: argmax-per-group ("latest per calendar day") — the daily-balances
  // core (reference `src/blockchain_queries.py:329-336`), as a single
  // window instead of the reference's aggregate-subquery self-join.
  def q06ArgmaxPerDay(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("order_day"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(spark, d, "orders")
      .withColumn("order_day", day(col("o_orderdate")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("order_day"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_c"))
  }

  // A5+D5+F1: DISTINCT + md5 keying — the cities pipeline (reference
  // `src/blockchain_queries.py:93,101`).
  def q07DistinctContentKey(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "nation")
      .join(broadcast(Tables(spark, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name"))
      .distinct()
      .withColumn("city_key", Keys.scalarKey(concat_ws("|", col("n_name"), col("r_name"))))

  // A3: MIN/MAX expressed as aggregates, not ORDER BY + LIMIT 1 (reference
  // `src/blockchain_queries.py:21-28` does the latter; aggregates avoid a
  // global sort).
  def q08AggMinMax(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "orders").agg(
      day(min(col("o_orderdate"))).as("min_day"),
      day(max(col("o_orderdate"))).as("max_day"),
      min(col("o_orderkey")).as("min_key"),
      max(col("o_orderkey")).as("max_key"))

  // F9: JSON payload field extraction (reference
  // `src/blockchain_queries.py:226-229,245-257` reads JSONB shapes).
  def q09JsonExtract(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("cnt"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  // D2/D3/D4: newest-wins dedup per key — deterministic window form of the
  // reference's racy load-order dedup (SURVEY.md §2.5 D4).
  def q10DedupNewestWins(spark: SparkSession, d: String): DataFrame =
    Dedup.newestWins(
        Tables(spark, d, "events").withColumn("ts_us", tsUs),
        Seq(col("user_id"), col("event_type")),
        col("ts_us"), col("event_id"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        cents(col("value")).as("value_c"), col("ts_us"))

  // D1+F1+F2: content-hash keys collapse identical payloads; first write
  // wins (reference `src/blockchain_queries.py:224,243` + onDuplicate=
  // 'ignore' at `src/arango_queries.py:314`).
  def q11DedupContentHash(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "orders")
      .groupBy(Keys.contentKey(
          col("o_custkey").as("custkey"),
          col("o_orderpriority").as("priority")).as("_key"),
        col("o_custkey"), col("o_orderpriority"))
      .agg(min(col("o_orderkey")).as("first_order"), count(lit(1)).as("n_dups"))

  // F8: haversine distance as pure column arithmetic (reference GEO_DISTANCE,
  // `src/arango_queries.py:152`), computed per *equi-joined pair* — the
  // reference computes distance per witness edge after a key join
  // (`src/arango_queries.py:147-154`), never all-pairs. Supplier side is a
  // broadcast dim; output granularity is whole km so cross-engine libm
  // 1-ulp differences cannot flip the rounding.
  def q12GeoHaversine(spark: SparkSession, d: String): DataFrame = {
    val c = Tables(spark, d, "customer").select(col("c_custkey"), col("c_nationkey"),
      ((col("c_custkey") % 170) - 85 + 0.25).as("c_lat"),
      ((col("c_custkey") * 7 % 350) - 175 + 0.5).as("c_lng"))
    val s = Tables(spark, d, "supplier").select(col("s_suppkey"), col("s_nationkey"),
      ((col("s_suppkey") * 13 % 170) - 85 + 0.5).as("s_lat"),
      ((col("s_suppkey") * 29 % 350) - 175 + 0.5).as("s_lng"))
    c.join(broadcast(s), col("c_nationkey") === col("s_nationkey"))
      .select(col("c_custkey"), col("s_suppkey"),
        round(Geo.haversineMeters(col("c_lat"), col("c_lng"), col("s_lat"), col("s_lng")) / 1000.0)
          .cast("long").as("dist_km"))
  }

  // F6+F7: vertex-ref build + strip round trip (reference
  // `src/blockchain_queries.py:226-227`, `src/arango_queries.py:153`).
  def q13VertexRefRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val ref = Keys.vertexRef("accounts", col("c_name"))
    Tables(spark, d, "customer").select(col("c_custkey"),
      ref.as("vertex_ref"), Keys.vertexKey(ref).as("stripped"))
  }

  // A6: grouped list rebuild — replaces the reference's O(n²) Python
  // grouping loop (reference `src/blockchain_queries.py:350-359`). Sorted,
  // string-joined for a deterministic cross-engine value.
  def q14CollectSortedList(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"),
        concat_ws(",", sort_array(collect_list(col("c_custkey").cast("string"))))
          .as("members"))

  // payment_v1/payment_v2 shape fallback via coalesce (reference
  // `src/blockchain_queries.py:244-257` try/except → SURVEY.md §2.6).
  // json_tuple extracts both candidate fields in ONE parse of the payload —
  // two get_json_object calls would each re-parse the JSON per row (measured
  // ~2× the extraction cost at sf0.1).
  def q15JsonFallbackCoalesce(spark: SparkSession, d: String): DataFrame =
    Tables(spark, d, "events")
      .select(json_tuple(col("props"), "missing", "k").as(Seq("v1", "v2")))
      .select(coalesce(col("v1"), col("v2")).cast("int").as("k"))
      .groupBy((col("k") % 5).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  // T5: the rewards_5d sliding window — sum over (max_t - 5d, max_t),
  // strictly exclusive on BOTH ends, matching the reference's
  // `time > min AND time < max` bounds (reference
  // `src/blockchain_queries.py:197`, window math `src/etl.py:94`).
  val FiveDaysUs = 5L * 86400 * 1000000
  def q16WindowRewards5d(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables(spark, d, "events").withColumn("ts_us", tsUs)
    val maxTs = ev.agg(max(col("ts_us")).as("max_ts"))
    ev.crossJoin(broadcast(maxTs))
      .filter(col("ts_us") > col("max_ts") - FiveDaysUs && col("ts_us") < col("max_ts"))
      .groupBy(col("user_id"))
      .agg(sum(cents(col("value"))).as("rewards_5d_c"), count(lit(1)).as("cnt"))
  }

  // K3 (intended semantics): per-account daily-balance series — latest value
  // per (user, day), then the per-user day-ordered series (reference
  // `src/blockchain_queries.py:350-361`, `src/arango_queries.py:77-87`).
  def q17DailyBalances(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables(spark, d, "events")
      .withColumn("ts_us", tsUs)
      .withColumn("day", day(timestamp_micros(tsUs)))
    val latestPerDay = Dedup.newestWins(ev,
        Seq(col("user_id"), col("day")), col("ts_us"), col("event_id"))
      .select(col("user_id"), col("day"), cents(col("value")).as("value_c"))
    latestPerDay.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
        concat_ws(";", sort_array(collect_list(
          concat(col("day"), lit(":"), col("value_c").cast("string")))))
          .as("daily_balances"))
  }

  /** K1 fixtures: existing = all orders; incoming = updated rows for
    * custkey%3==0 plus brand-new keys (+10M) for custkey%5==0.
    */
  private def upsertInputs(spark: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = Tables(spark, d, "orders")
      .select(col("o_orderkey").as("_key"), cents(col("o_totalprice")).as("val"),
        col("o_custkey"))
    val existing = base.select(col("_key"), col("val"), lit(0).as("ver"))
    val incoming = base.filter(col("o_custkey") % 3 === 0)
      .select(col("_key"), (col("val") + 111).as("val"), lit(1).as("ver"))
      .unionByName(base.filter(col("o_custkey") % 5 === 0)
        .select((col("_key") + 10000000L).as("_key"), (col("val") + 222).as("val"),
          lit(1).as("ver")))
    (existing, incoming)
  }

  // K1 onDuplicate='update': incoming wins on matched keys, new keys insert
  // (reference `src/arango_queries.py:211-228`).
  def q18UpsertUpdate(spark: SparkSession, d: String): DataFrame = {
    val (existing, incoming) = upsertInputs(spark, d)
    Merge.upsert(existing, incoming, "_key", Merge.Update, "ver")
  }

  // K1 onDuplicate='ignore': existing wins on matched keys, new keys insert
  // (reference `src/arango_queries.py:314`).
  def q19UpsertIgnore(spark: SparkSession, d: String): DataFrame = {
    val (existing, incoming) = upsertInputs(spark, d)
    Merge.upsert(existing, incoming, "_key", Merge.Ignore, "ver")
  }

  // K2+T4: sliding-window retention delete (reference
  // `src/arango_queries.py:90-99` — witnesses older than the cutoff drop).
  val Q20CutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z µs
  def q20RetentionFilter(spark: SparkSession, d: String): DataFrame =
    Merge.retain(Tables(spark, d, "events").withColumn("ts_us", tsUs),
        "ts_us", Q20CutoffUs)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** q94 — J4 as a COMPOSITION (its pieces are oracled piecewise in
    * q06/q14/q17; this row verifies the product pipeline
    * [[graft.pipelines.Collections.balances]] end to end): account rows
    * rendered from events join their blocks by height, the latest row per
    * (address, UTC day) survives (time desc, height tiebreak), and each
    * account carries its day-ordered series — flattened to a string so
    * the cross-engine hash compare sees scalar columns (the q17
    * convention). Reference `src/blockchain_queries.py:322-361`.
    */
  def q94BalancesRebuild(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables(spark, d, "events").withColumn("ts_us", tsUs)
    val accounts = ev.select(
      col("event_id").as("block"),
      concat(lit("u"), col("user_id")).as("address"),
      cents(col("value")).as("balance"),
      (col("event_id") % 97).as("staked_balance"),
      (col("event_id") % 7).as("dc_balance"))
    val blocks = ev.select(
      col("event_id").as("height"),
      col("ts_us").as("time"),
      timestamp_micros(col("ts_us")).as("timestamp"))
    graft.pipelines.Collections.balances(accounts, blocks)
      .select(col("_key"), col("address"),
        size(col("daily_balances")).cast("long").as("n_days"),
        concat_ws(";", transform(col("daily_balances"), s =>
          concat_ws(":", s.getField("date"),
            s.getField("balance").cast("string"),
            s.getField("staked_balance").cast("string"),
            s.getField("dc_balance").cast("string")))).as("series"))
  }

  /** q95 — P9+F11 in column form. Two degenerate-input scrubs in one row:
    *
    *  - P9, the metrics mean-normalization: group 2's metric is
    *    identically zero, so `m/mean` is 0/0 there. Spark 4's ANSI
    *    `Divide` throws on a zero divisor (even for doubles), so the
    *    engine uses `try_divide` — NULL on 0/0, which is EXACTLY what
    *    DuckDB's IEEE division returns — and `coalesce`-scrubs to 0: the
    *    same end state GraphMetrics' Scala-side zero-mean guard produces.
    *  - F11, the `isnan` guard: an injected-NaN channel (every 7th event)
    *    is flagged by `isnan` and scrubbed by `nanvl` — the literal
    *    nanvl/isnan column functions the id names.
    *
    * The group mean is an ordered fold (the q50 pattern) so every
    * non-degenerate quotient is bit-identical across engines.
    */
  def q95NanScrub(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables(spark, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k").isNotNull)
      .withColumn("grp", col("k") % 5)
      .withColumn("m", when(col("grp") === 2, lit(0.0)).otherwise(col("value")))
    val means = ev.groupBy(col("grp"))
      .agg((aggregate(sort_array(collect_list(struct(col("event_id"), col("m")))),
        lit(0.0), (acc, s) => acc + s.getField("m")) / count(lit(1))).as("mean"))
    val q = try_divide(col("m"), col("mean"))
    val noisy = when(col("event_id") % 7 === 0, lit(Double.NaN))
      .otherwise(col("value"))
    ev.join(broadcast(means), Seq("grp"))
      .select(col("event_id"), col("grp"),
        q.isNull.as("was_scrubbed"),
        round(lit(1000000.0) * coalesce(q, lit(0.0))).cast("long").as("norm_pm"),
        isnan(noisy).as("was_nan"),
        round(nanvl(noisy, lit(0.0)) * 100).cast("long").as("denoised_c"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_sum_groupby" -> q01AggSumGroupBy _,
    "q02_filter_time_range" -> q02FilterTimeRange _,
    "q03_filter_in_projection" -> q03FilterInProjection _,
    "q04_join_left_enrich" -> q04JoinLeftEnrich _,
    "q05_join_inner_agg" -> q05JoinInnerAgg _,
    "q06_argmax_per_day" -> q06ArgmaxPerDay _,
    "q07_distinct_content_key" -> q07DistinctContentKey _,
    "q08_agg_min_max" -> q08AggMinMax _,
    "q09_json_extract" -> q09JsonExtract _,
    "q10_dedup_newest_wins" -> q10DedupNewestWins _,
    "q11_dedup_content_hash" -> q11DedupContentHash _,
    "q12_geo_haversine" -> q12GeoHaversine _,
    "q13_vertex_ref_roundtrip" -> q13VertexRefRoundtrip _,
    "q14_collect_sorted_list" -> q14CollectSortedList _,
    "q15_json_fallback_coalesce" -> q15JsonFallbackCoalesce _,
    "q16_window_rewards_5d" -> q16WindowRewards5d _,
    "q17_daily_balances" -> q17DailyBalances _,
    "q18_upsert_update" -> q18UpsertUpdate _,
    "q19_upsert_ignore" -> q19UpsertIgnore _,
    "q20_retention_filter" -> q20RetentionFilter _,
    "q94_balances_rebuild" -> q94BalancesRebuild _,
    "q95_nan_scrub" -> q95NanScrub _,
  )
}
