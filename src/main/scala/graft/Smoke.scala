package graft
import org.apache.spark.sql.SparkSession

/** Dev smoke: runs the flagship [[SparkEntry.entry]] exactly as the driver
  * does and prints the row count (driver requires rows > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = 60)
    println(s"[smoke] entry rows = $n")
    spark.stop()
  }
}
