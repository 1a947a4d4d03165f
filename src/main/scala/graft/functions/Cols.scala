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
}
