package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.sources.Tables

/** Oracle-checked queries for the mergeable-sketch family
  * ([[graft.operators.Sketches]]) — the sub-linear rollup operators. Each
  * query exercises the full sketch lifecycle (build per partition-like
  * group → merge → query), and because the sketches are deterministic
  * md5-hash constructions, the DuckDB twin recomputes the IDENTICAL
  * sketch directly from the raw table — so a hash match verifies build,
  * merge algebra, and estimator arithmetic end to end.
  */
object Summaries {

  /** Microsecond-precision UTC day bucket — built from `ts div 1000` so
    * the twin's `epoch_us(ts)` agrees at day boundaries (DuckDB truncates
    * parquet nanos to µs; see the verify-recipe gotcha).
    */
  private val DayUs = 86400000000L

  val CmsDepth = 4
  val CmsWidth = 256
  val KmvK = 32

  /** q82 (CMS): per-day Count-Min sketches over event actor activity,
    * MERGED into the global sketch, then point-estimated for every fifth
    * user. The oracle sketches the whole table directly — a hash match
    * proves merge(per-day) ≡ sketch(union), the rollup property, plus the
    * estimator's min-over-rows arithmetic.
    */
  def q82CmsHeavyHitters(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
      .withColumn("day", expr(s"ts_us div $DayUs"))
    val daily = Sketches.cmsSketch(ev, col("user_id"), lit(1L),
      CmsDepth, CmsWidth, groups = Seq("day"))
    val merged = Sketches.cmsMerge(daily)
    Sketches.cmsEstimate(merged, ev.filter(col("user_id") % 5 === 0),
        col("user_id"), CmsDepth, CmsWidth)
      .withColumnRenamed("key", "user_id")
  }

  /** q83 (KMV): distinct-users-per-day estimate with a k=32 bounded
    * buffer — the θ-sketch shape of a 100 TB uniques dashboard (exact
    * below k, `(k−1)·2⁶⁰ / v_k` beyond). Estimates ship as micro-units
    * (`round(est · 1e6)` longs) — the oracle-compare convention for
    * derived doubles.
    */
  def q83KmvDistinct(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
      .withColumn("day", expr(s"ts_us div $DayUs"))
    Sketches.kmvDistinct(ev, Seq("day"), col("user_id"), KmvK)
      .select(col("day"), col("n_mins"),
        when(col("n_mins") < KmvK, col("n_mins") * 1000000L)
          .otherwise(round(col("est_distinct") * lit(1000000.0)).cast("long"))
          .as("est_micro"))
  }

  /** q84 (histogram quantiles): per-language length quantiles from a
    * 64-bin [0, 4096) histogram — the sketch twin of q63's exact ranks
    * (same p-list; answers are bin lower edges, within one 64-char bin of
    * exact).
    */
  def q84HistQuantiles(spark: SparkSession, d: String): DataFrame =
    Sketches.histQuantiles(Tables(spark, d, "documents"), Seq("lang"),
      col("n_chars"), lo = 0L, hi = 4096L, bins = 64,
      ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_cms_heavy_hitters" -> q82CmsHeavyHitters _,
    "q83_kmv_distinct" -> q83KmvDistinct _,
    "q84_hist_quantiles" -> q84HistQuantiles _)
}
