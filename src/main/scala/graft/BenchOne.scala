package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("32")
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions")
    for (name <- args) {
      // dev knob: a `parts=N` arg re-sets shuffle partitions for the
      // queries that FOLLOW it (quick planned-partition A/Bs);
      // `parts=default` restores the session value. Validated here so a
      // typo fails at the arg, not as a planning error two queries later
      // (r17 advice).
      if (name.startsWith("parts=")) {
        val v = name.drop(6)
        val parts = if (v == "default") defaultParts
          else try { require(v.toInt >= 1); v }
          catch { case _: IllegalArgumentException =>
            sys.error(s"[b1] bad arg '$name': want parts=<positive int> " +
              "or parts=default") }
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        println(s"[b1] set shuffle.partitions=$parts")
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
