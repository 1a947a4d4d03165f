package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{GraphMetrics, Merge}
import graft.pipelines.Collections
import graft.queries.{Graphs, JsonPipelines, LlmPipelines, Oracles, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full witness pipeline end-to-end at sf0.001 (E2+E3
    * compressed): events rendered as poc_receipts_v1 transactions →
    * [[Collections.witnesses]] (declared-schema from_json → explode →
    * pair-key newest-wins dedup) → T4 retention window →
    * per-city weighted PageRank over the surviving witness graph.
    * Driver smoke-checks rows > 0.
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
    // E3: per-city metrics over the retained witness graph.
    val graph = kept.select(
      (crc32(col("_from")) % 5).cast("int").as("city"),
      col("_from").as("src"), col("_to").as("dst"),
      (abs(col("signal")) + 1).as("w"))
    GraphMetrics.perCityPagerank(graph)
  }

  /** One entry per implemented operator family from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ JsonPipelines.all ++ LlmPipelines.all ++ Graphs.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    Oracles.relational ++ Oracles.json ++ Oracles.llm ++ Oracles.graphs
}
