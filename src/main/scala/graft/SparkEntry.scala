package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Graphs, JsonPipelines, LlmPipelines, Oracles, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The daily-balances pipeline (K3 intended semantics): event scan →
    * µs normalization → per-(user,day) newest-wins window dedup →
    * per-user sorted series rebuild — the richest end-to-end shape
    * currently registered (reference `src/blockchain_queries.py:350-361`).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q17DailyBalances(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator family from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ JsonPipelines.all ++ LlmPipelines.all ++ Graphs.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    Oracles.relational ++ Oracles.json ++ Oracles.llm ++ Oracles.graphs
}
