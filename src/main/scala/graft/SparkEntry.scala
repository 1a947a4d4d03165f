package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{GraphMetrics, Merge}
import graft.pipelines.Collections
import graft.queries.{Curation, Extensions, Graphs, JsonPipelines, LlmPipelines, Oracles, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full witness pipeline end-to-end at sf0.001 (E2+E3
    * compressed): events rendered as poc_receipts_v1 transactions →
    * [[Collections.witnesses]] (declared-schema from_json → explode →
    * pair-key newest-wins dedup) → T4 retention window →
    * per-city weighted PageRank over the surviving witness graph →
    * G5 metric write-back → X3 bulk sink (per-partition batched JSON,
    * re-read as the returned frame). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables(spark, d, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
    // Render Helium-shaped receipt transactions from the event stream.
    val txns = ev.select(
      lit(1L).as("block"), col("event_id").cast("string").as("hash"),
      lit("poc_receipts_v1").as("type"),
      to_json(struct(array(struct(
        concat(lit("u"), col("user_id")).as("challengee"),
        array(struct(
          concat(lit("g"), col("k") % 20).as("gateway"),
          (col("k") - 100).cast("long").as("signal"),
          col("value").as("snr"),
          (col("k") % 10 =!= 0).as("is_valid"),
          col("ts_us").as("timestamp"))).as("witnesses"))).as("path")))
        .as("fields"),
      col("ts_us").as("time"))
    val edges = Collections.witnesses(txns,
      minTime = 0L, maxTime = Long.MaxValue)
    // T4 sliding retention: keep the last 15 days of edges.
    val cutoff = 1705276800000000L // 2024-01-15T00:00:00Z µs
    val kept = Merge.retain(edges.filter(col("is_valid")), "time", cutoff)
    // Hotspot docs for every edge endpoint: real icosa-cell geo (the
    // address stands in for the foreign location hex) + a 5-city
    // partition, same document shape Collections.hotspots emits.
    val addrs = kept
      .select(element_at(split(col("_from"), "/"), -1).as("address"))
      .unionByName(kept.select(element_at(split(col("_to"), "/"), -1).as("address")))
      .distinct()
    val (lat, lng) = graft.functions.Geo.cellToLatLng(md5(col("address")))
    val hotspots = addrs.select(col("address"),
      struct((crc32(col("address")) % 5).cast("string").as("city_key"))
        .as("location_details"),
      graft.functions.Geo.geoJsonPoint(lat, lng).as("geo_location"))
    // E3: J6 traversal over the docs → gated per-city metrics → G5 merge.
    val graph = Collections.cityGraphEdges(hotspots, kept)
      .withColumn("w", col("w") + 1) // same-cell endpoints share a center; keep w ≥ 1
    // A node can appear in SEVERAL city subgraphs (it is pulled into a
    // neighbor's graph as a witness target); its hotspot document takes the
    // scores from its OWN city only — the reference's per-city upsert loop
    // instead let whichever city processed last win, nondeterministically
    // (`src/arango_queries.py:169-178`), a race this join closes.
    val ownCity = hotspots.select(col("address").as("node"),
      col("location_details.city_key").cast("string").as("city"))
    def own(m: org.apache.spark.sql.DataFrame) = m.join(ownCity, Seq("city", "node"))
    val pr = own(GraphMetrics.perCityPagerank(graph, minEdges = 2))
      .select(col("node"), col("pr_pm").as("value_pm"), col("pr_norm_pm").as("norm_pm"))
    val bc = own(GraphMetrics.perCityBetweenness(graph, minEdges = 2))
      .select(col("node"), col("bc_pm").as("value_pm"), col("bc_norm_pm").as("norm_pm"))
    val ha = own(GraphMetrics.perCityHits(graph, minEdges = 2))
      .select(col("node"), col("hub_pm"), col("auth_pm"))
    val docs = Collections.mergeMetrics(
      hotspots.withColumn("_key", col("address")), pr, bc, Some(ha))
    // X3/K1: ship the finished docs through the per-partition bulk sink —
    // the reference's importBulk loop (fresh connection per worker,
    // batched JSON payloads, src/arango_queries.py:137-143,231-258) — and
    // return them re-read from the sink, so the smoke row count witnesses
    // the full write path, not just the transform lineage.
    val sinkDir = java.nio.file.Files
      .createTempDirectory("graft_flagship_sink").toString
    graft.operators.BulkSink.write(
      docs.select(to_json(struct(docs.columns.toIndexedSeq.map(col): _*)).as("doc")),
      new graft.operators.BulkSink.JsonLinesWriter(sinkDir), batchSize = 1000)
    spark.read.json(sinkDir)
  }

  /** One entry per implemented operator family from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ JsonPipelines.all ++ LlmPipelines.all ++ Graphs.all ++
      Extensions.all ++ Curation.all ++ graft.queries.Sinks.all ++
      graft.queries.Summaries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    Oracles.relational ++ Oracles.json ++ Oracles.llm ++ Oracles.graphs ++
      Oracles.extensions ++ Oracles.curation ++ Oracles.sinks ++
      Oracles.summaries
}
