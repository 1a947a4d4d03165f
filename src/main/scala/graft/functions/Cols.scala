package graft.functions

import org.apache.spark.sql.DataFrame

/** Column utilities shared by the operators. */
object Cols {

  /** A temp-column name not present on `df` — `withColumn` with a name the
    * frame already has silently REPLACES that column and corrupts the
    * caller's data, so every operator that adds temporaries or outputs
    * must probe first (one shared guard instead of per-operator copies).
    */
  def freeName(df: DataFrame, prefix: String): String =
    Iterator.from(0).map(i => s"$prefix$i").find(!df.columns.contains(_)).get

  /** The iterative-loop shuffle sizing rule (the q147 convention,
    * generalized in r16): loops scope AQE off because every per-step
    * frame is eagerly checkpointed and per-step adaptive re-planning is
    * pure driver overhead — but AQE off means shuffle.partitions must be
    * SIZED TO THE DATA, not left at the session default (off-alone froze
    * 32-partition checkpoints of few-thousand-row frames and regressed
    * q179 2×, SCALE.md walkaqe) and not hard-coded small (right on
    * local[32], wrong on a 1000-executor graph). ~64k rows per partition,
    * clamped to [1, defaultParallelism].
    */
  def loopParts(df: DataFrame, rows: Long,
                rowsPerPartition: Long = 64000L): Int =
    math.max(1, math.min(df.sparkSession.sparkContext.defaultParallelism,
      (rows / rowsPerPartition).toInt + 1))
}
