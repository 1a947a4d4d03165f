package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("32")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[b1] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
