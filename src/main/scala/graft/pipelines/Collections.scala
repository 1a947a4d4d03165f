package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Geo, Keys}
import graft.operators.Dedup
import graft.schema.Payloads

/** The six collection builders — the reference's full document pipeline
  * surface (E1/E2), re-expressed as pure DataFrame transforms over sources
  * conforming to [[graft.schema.Blockchain]]. A reference user's whole sync
  * is: read sources → these six builders → keyed upsert sinks
  * ([[graft.operators.Merge]]) under the incremental driver
  * ([[graft.streaming.Incremental]]).
  *
  * Plan shapes (the 100 TB view): accounts/cities are single-pass
  * projections; hotspots is two broadcast left joins (dims are small);
  * payments/witnesses are row-local JSON parses + one keyed window;
  * balances is one join + two keyed windows. Nothing here shuffles more
  * than once per keyed stage and no stage holds driver-side state.
  */
object Collections {

  /** `accounts` vertices from account_inventory (reference
    * `src/blockchain_queries.py:72-87`): `_key` = address.
    */
  def accounts(accountInventory: DataFrame): DataFrame =
    accountInventory.select(
      col("address").as("_key"), col("address"), col("balance"),
      col("dc_balance"), col("security_balance"), col("staked_balance"),
      col("nonce"), col("first_block"), col("last_block"))

  /** `cities` vertices (A5+D5, reference `src/blockchain_queries.py:90-112`):
    * distinct city rows keyed by md5(city_id).
    */
  def cities(locations: DataFrame): DataFrame =
    locations.filter(col("city_id").isNotNull)
      .select(col("city_id"), col("long_city"), col("long_state"), col("long_country"))
      .distinct()
      .select(Keys.scalarKey(col("city_id")).as("_key"), col("city_id"),
        col("long_city"), col("long_state"), col("long_country"))

  /** `hotspots` vertices (J1+J2+F3+P8, reference
    * `src/blockchain_queries.py:135-169`): inventory ⟕ status ⟕ locations,
    * GeoJSON point from the cell via the REAL icosahedral decode
    * ([[Geo.cellToLatLng]] — genuine on-sphere cell centers; only the
    * foreign-hex anchor is the documented pseudo seam), nested
    * location_details with the city_key, analytics columns null until the
    * metrics stage (G5) fills them. Status and locations are broadcast
    * dims → zero shuffles.
    */
  def hotspots(gatewayInventory: DataFrame, gatewayStatus: DataFrame,
               locations: DataFrame): DataFrame = {
    val inv = gatewayInventory.alias("inv")
    val st = gatewayStatus.select(col("address"), col("online")).alias("st")
    val loc = locations.select(col("location"), col("long_city"),
      col("long_state"), col("long_country"), col("city_id")).alias("loc")
    val (lat, lng) = Geo.cellToLatLng(col("inv.location_hex"))
    inv.join(broadcast(st), Seq("address"), "left_outer")
      .join(broadcast(loc), col("inv.location") === col("loc.location"), "left_outer")
      .select(
        col("address").as("_key"), col("address"), col("inv.owner"),
        col("inv.location"), col("inv.name"), col("inv.mode"),
        col("inv.elevation"), col("inv.gain"), col("inv.reward_scale"),
        col("st.online").as("status"),
        when(col("inv.location_hex").isNotNull, Geo.geoJsonPoint(lat, lng))
          .as("geo_location"),
        struct(col("loc.city_id"), col("loc.long_city"), col("loc.long_state"),
          col("loc.long_country"),
          when(col("loc.city_id").isNotNull, Keys.scalarKey(col("loc.city_id")))
            .as("city_key")).as("location_details"),
        lit(null).cast("long").as("rewards_5d"),
        lit(null).cast("double").as("betweenness_centrality"),
        lit(null).cast("double").as("betweenness_centrality_n"),
        lit(null).cast("double").as("pagerank"),
        lit(null).cast("double").as("pagerank_n"),
        lit(null).cast("double").as("hub_score"),
        lit(null).cast("double").as("authority_score"))
  }

  /** `payments` edges (E2, reference `src/blockchain_queries.py:233-262`):
    * type filter → v1/v2 payload fallback → content-hash key → vertex refs.
    * Strictly exclusive time bounds (P1).
    */
  def payments(transactions: DataFrame, minTime: Long, maxTime: Long): DataFrame = {
    val (payer, payee, amount) = Payloads.paymentFields(col("fields"))
    transactions
      .filter(col("type").isin("payment_v1", "payment_v2") &&
        col("time") > minTime && col("time") < maxTime)
      .select(
        md5(col("fields")).as("_key"), // D1: md5 of the payload content
        Keys.vertexRef("accounts", payer).as("_from"),
        Keys.vertexRef("accounts", payee).as("_to"),
        amount.as("amount"), col("time"))
      .dropDuplicates("_key") // onDuplicate='ignore' within the batch
  }

  /** `witnesses` edges (reference `src/blockchain_queries.py:265-319`):
    * poc_receipts_v1 → explode path[0].witnesses → pair key → P6 validity
    * passthrough → D2/D4 newest-wins, deterministic (the reference's
    * load-order race, fixed).
    */
  def witnesses(transactions: DataFrame, minTime: Long, maxTime: Long): DataFrame = {
    val (challengee, ws) = Payloads.receiptFields(col("fields"))
    val exploded = transactions
      .filter(col("type") === "poc_receipts_v1" &&
        col("time") > minTime && col("time") < maxTime)
      .select(challengee.as("challengee"), col("time"), explode(ws).as("w"))
      .select(
        Keys.pairKey(col("challengee"), col("w.gateway")).as("_key"),
        Keys.vertexRef("hotspots", col("challengee")).as("_from"),
        Keys.vertexRef("hotspots", col("w.gateway")).as("_to"),
        col("w.snr").as("snr"), col("w.signal").as("signal"),
        col("time"), col("w.is_valid").as("is_valid"))
    // Partial-agg form: receipts for a hotspot pair arrive many times per
    // window at scale; map-side combine collapses them pre-shuffle. The
    // tiebreak must be unique WITHIN the pair key on time ties — _from/_to
    // are constant there, so break on the receipt payload itself (rows
    // tying on time + snr + signal + is_valid are identical rows).
    Dedup.newestWinsAgg(exploded, Seq(col("_key")), col("time"),
      struct(col("snr"), col("signal"), col("is_valid")))
  }

  /** G1/J6: the per-city 1-hop "traversal" as two relational joins — the
    * reference iterates cities and, per city, walks
    * `FOR v,e,p IN 1..1 OUTBOUND hotspot witnesses` computing
    * GEO_DISTANCE between endpoint hotspots (`src/arango_queries.py:
    * 145-163`). Here ALL cities build in one pass: valid witness edges ⨝
    * hotspots on `_from` ⨝ hotspots on `_to`, keeping pairs whose
    * challengee hotspot carries a city (the reference's per-city filter on
    * the nested `location_details.city_key`, P2), weighted by the
    * haversine meters between the two GeoJSON points (F8). Vertex refs are
    * stripped back to addresses (F7). Output (city, src, dst, w) feeds
    * [[graft.operators.GraphMetrics]] directly.
    *
    * Plan: hotspot endpoints join by key — broadcast when hotspots are a
    * dim, shuffle hash join at scale; no per-city driver loop (the
    * reference's chunking bug, `src/arango_queries.py:196-199`, cannot
    * exist in this shape).
    */
  def cityGraphEdges(hotspots: DataFrame, witnesses: DataFrame): DataFrame = {
    def endpoint(side: String) = hotspots.select(
      Keys.vertexRef("hotspots", col("address")).as(s"__ref_$side"),
      col("address").as(s"__addr_$side"),
      col("location_details.city_key").as(s"__city_$side"),
      col("geo_location.coordinates").getItem(1).as(s"__lat_$side"),
      col("geo_location.coordinates").getItem(0).as(s"__lng_$side"))
    witnesses.filter(col("is_valid"))
      .join(endpoint("a"), col("_from") === col("__ref_a"))
      .join(endpoint("b"), col("_to") === col("__ref_b"))
      .filter(col("__city_a").isNotNull)
      .select(col("__city_a").as("city"),
        col("__addr_a").as("src"), col("__addr_b").as("dst"),
        round(Geo.haversineMeters(col("__lat_a"), col("__lng_a"),
          col("__lat_b"), col("__lng_b"))).cast("long").as("w"))
  }

  /** G5: write the per-city graph metrics back onto the hotspot vertices
    * (reference `src/arango_queries.py:169-178` upserts them with
    * `onDuplicate='update'`). A broadcast-friendly left join on `_key`
    * overwriting only the analytics columns — hotspots without metrics
    * (city below the size gate, or not in any city graph) keep nulls.
    * `pagerank`/`betweenness` frames carry (node, value_pm, norm_pm);
    * the optional `hits` frame carries (node, hub_pm, auth_pm) and fills
    * the hub/authority columns the reference only ever initialized to
    * null (G4 — `nx.hits` commented out, `src/arango_queries.py:168`).
    *
    * PRECONDITION: metric frames must be unique per node. Per-city metrics
    * can score one node in several cities (a node is pulled into a
    * neighbor city's subgraph as an edge target); restrict each frame to
    * the node's own city first — see the flagship entry — or the left
    * joins fan out.
    */
  def mergeMetrics(hotspots: DataFrame, pagerank: DataFrame,
                   betweenness: DataFrame,
                   hits: Option[DataFrame] = None): DataFrame = {
    // No broadcast() hints on the metric sides: they span every hotspot in
    // every sized city, so forcing a broadcast is driver-memory-bound at
    // scale. AQE picks broadcast when a frame measures small at runtime
    // (the small-input choice is pinned in CollectionsSpec) and falls back
    // to a shuffle hash join when it doesn't — the size gate lives in the
    // planner, not the query.
    def metric(df: DataFrame, v: String, n: String) =
      df.select(col("node").as("_key"),
        (col("value_pm") / 1e6).as(v), (col("norm_pm") / 1e6).as(n))
    val withPr = hotspots
      .drop("pagerank", "pagerank_n", "betweenness_centrality", "betweenness_centrality_n")
      .join(metric(pagerank, "pagerank", "pagerank_n"), Seq("_key"), "left_outer")
      .join(metric(betweenness, "betweenness_centrality",
        "betweenness_centrality_n"), Seq("_key"), "left_outer")
    hits.fold(withPr) { h =>
      withPr.drop("hub_score", "authority_score")
        .join(h.select(col("node").as("_key"),
          (col("hub_pm") / 1e6).as("hub_score"),
          (col("auth_pm") / 1e6).as("authority_score")), Seq("_key"), "left_outer")
    }
  }

  /** `balances` time-series docs (J4+A4/J5+A6, the intended semantics of
    * the reference's raw-SQL CTE + O(n²) Python grouping,
    * `src/blockchain_queries.py:322-361`): latest account row per UTC day
    * via one window, then the day-ordered series per account.
    */
  def balances(accounts: DataFrame, blocks: DataFrame): DataFrame = {
    val joined = accounts.join(blocks, col("block") === col("height"))
      .withColumn("date", date_format(col("timestamp"), "yyyy-MM-dd"))
    val latestPerDay = Dedup.newestWins(joined,
      Seq(col("address"), col("date")), col("time"), col("height"))
    latestPerDay
      .groupBy(col("address"))
      .agg(sort_array(collect_list(struct(
        col("date"), col("balance"), col("staked_balance"), col("dc_balance"))))
        .as("daily_balances"))
      .select(col("address").as("_key"), col("address"), col("daily_balances"))
  }
}
