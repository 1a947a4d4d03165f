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
      // Older driver generations store events.ts as parquet
      // TIMESTAMP(NANOS); read those as long (ns since epoch).
      // Runtime-settable; also set in GraftSession for sessions we build.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize `events.ts` to long ns-since-epoch across driver testdata
    * generations: rounds 1-9 wrote parquet TIMESTAMP(NANOS) (long ns via
    * the `nanosAsLong` legacy read), round 10 writes TIMESTAMP(MICROS)
    * (arrives as TIMESTAMP_NTZ). Everything downstream keeps the long-ns
    * contract (`ts div 1000` → µs, the precision DuckDB compares at).
    * NTZ wall time is interpreted in the session time zone — pinned UTC in
    * [[graft.GraftSession]] — which matches DuckDB's naive `epoch_us`.
    * Works on batch and streaming frames alike (pure column ops).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case t => sys.error(s"events.ts: unsupported type $t")
    }
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
