package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference scans Postgres via ORM (reference
  * `src/blockchain_queries.py:74,93,137-139,197,235,293-296`); here the
  * source is parquet and the analog of its hand-rolled OFFSET/LIMIT and
  * keyset pagination (`src/blockchain_queries.py:53-69,195-216`) is simply
  * Spark's partitioned columnar scan — filters and projections declared on
  * the DataFrame reach the scan via Catalyst pushdown, so none of the
  * client-side pagination machinery is reproduced.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS); read as long (ns since epoch).
      // Runtime-settable; also set in GraftSession for sessions we build.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `ts` (long, ns) reduced to microseconds — the precision DuckDB (and
    * most engines) use for timestamps, so cross-engine comparisons agree.
    */
  def eventsWithUs(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "events").withColumn("ts_us", expr("ts div 1000"))

  /** Scan rebalanced to the session's parallelism. The driver test tables
    * are single-row-group parquet files, which Spark cannot split — one
    * task per scan, so every row-local derivation (JSON render/parse,
    * hashing, shingling, vector folds) runs single-threaded without this.
    * On a real cluster the source arrives in many splits and this
    * round-robin exchange is cheap insurance against the same pathology
    * (few huge files); use for CPU-bound pipelines, plain [[apply]] for
    * cheap scans and broadcast dims.
    */
  def balanced(spark: SparkSession, sfDir: String, name: String): DataFrame =
    apply(spark, sfDir, name).repartition(spark.sparkContext.defaultParallelism)
}
