package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention — users grouped by first-seen week (epoch-anchored
  * floor division), activity counted per week offset, retention as an
  * exact micro-unit share of the cohort. One implementation serving the
  * registered query (q116, oracle-checked) and the scale probe — the
  * shared-operator rule every other probe section follows.
  *
  * Scale shape: the per-user week set collapses in ONE user-keyed
  * aggregate (`collect_set` partials combine map-side; weeks-per-user is
  * calendar-bounded), the explode is row-local, and the (cohort, offset)
  * rollup + cohort-size window run over cohort-bounded data.
  */
object Cohorts {

  val WeekUs: Long = 7L * 86400L * 1000000L

  /** Epoch-anchored FLOOR week bucket as a SQL fragment. `div` alone
    * truncates toward zero (pre-1970 timestamps would round UP into the
    * wrong week, diverging from the oracle's floor `//`); subtracting the
    * non-negative `pmod` first makes the dividend exactly divisible, so
    * the result is true floor division at full long precision.
    */
  def weekFloorSql(tsUs: String): String =
    s"($tsUs - pmod($tsUs, ${WeekUs}L)) div ${WeekUs}L"

  /** @param user user id column name; @param tsUs µs-epoch long column. */
  def retention(events: DataFrame, user: String, tsUs: String): DataFrame = {
    val uw = events
      .select(col(user), expr(weekFloorSql(tsUs)).as("wk"))
      .groupBy(col(user)).agg(collect_set(col("wk")).as("weeks"))
    val byCohort = Window.partitionBy(col("cohort_week"))
    uw.select(col(user), array_min(col("weeks")).as("cohort_week"),
        explode(col("weeks")).as("wk"))
      .select(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("cohort_size",
        sum(when(col("week_offset") === 0, col("n_users"))).over(byCohort))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        expr("(1000000 * n_users) div cohort_size").as("retention_pm"))
  }
}
