package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("32")
    for (name <- args) {
      // dev knob: a `parts=N` arg re-sets shuffle partitions for the
      // queries that FOLLOW it (quick planned-partition A/Bs)
      if (name.startsWith("parts=")) {
        spark.conf.set("spark.sql.shuffle.partitions", name.drop(6))
        println(s"[b1] set $name")
      } else {
        val fn = SparkEntry.queries(name)
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          Caches.clearAll(spark)
          println(f"[b1] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
        }
      }
    }
    spark.stop()
  }
}
