package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same-key bucketed tables join with zero exchanges; results match plain join") {
    val facts = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "v")
    val dims = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "d")
    Bucketing.writeBucketed(facts, "bkt_facts", 8, "k")
    Bucketing.writeBucketed(dims, "bkt_dims", 8, "k")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_facts")
        .join(spark.table("bkt_dims"), Seq("k"))
      assert(Bucketing.isExchangeFree(joined))
      // and specifically via the bucketed layout, not a broadcast fallback
      assert(Bucketing.usedBucketedScan(joined))
      // a plain (non-catalog) frame never reports a bucketed scan
      assert(!Bucketing.usedBucketedScan(facts))
      val expected = facts.join(dims, Seq("k")).as[(Long, Long, String)]
        .collect().toSet
      assert(joined.as[(Long, Long, String)].collect().toSet == expected)
      // grouping on the bucket key is exchange-free too
      val agg = spark.table("bkt_facts").groupBy("k").agg(sum("v").as("s"))
      assert(Bucketing.isExchangeFree(agg))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("compactBucketed: appends collapse to one file per touched bucket; layout and rows survive") {
    val table = "bkt_compact_t"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    def rmAll(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmAll); f.delete(); ()
    }
    if (loc.exists()) rmAll(loc)
    try {
      Bucketing.writeBucketed((1L to 100L).toDF("k"), table, 4, "k")
      Bucketing.appendBucketed((101L to 200L).toDF("k"), table, 4, "k")
      Bucketing.appendBucketed((201L to 300L).toDF("k"), table, 4, "k")
      def files() = loc.listFiles().count(_.getName.endsWith(".parquet"))
      // bucketBy writes one file per (task × bucket), so three multi-
      // partition writes leave far more than 4 files — the decay
      // compaction exists for
      val before = files()
      assert(before > 4, s"expected file accumulation, got $before")
      Bucketing.compactBucketed(spark, table, 4, "k")
      assert(files() == 4, s"compaction must leave 1 file/bucket, got ${files()}")
      assert(spark.table(table).as[Long].collect().toSet == (1L to 300L).toSet)
      // still a genuine bucketed layout after the rewrite
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = spark.table(table).groupBy("k").agg(count(lit(1)).as("n"))
      assert(Bucketing.isExchangeFree(agg) && Bucketing.usedBucketedScan(agg))
      // compacting a missing table is a no-op, not a crash
      Bucketing.compactBucketed(spark, "bkt_compact_missing", 4, "k")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("CC registry as a bucketed table: the endpoint lookup shuffles only the batch side") {
    // the q120/q114 scale claim made executable: a (node → label)
    // registry bucketed on node serves the batch-endpoint lookup through
    // its bucketed layout — the registry side scans in place, only the
    // (small) batch side exchanges.
    val registry = (0L until 500L).map(i => (i, i / 5 * 5)).toDF("node", "label")
    Bucketing.writeBucketed(registry, "bkt_cc_registry", 8, "node")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val reg = spark.table("bkt_cc_registry")
      val batchNodes = (480L until 520L).map(Tuple1(_)).toDF("n")
      val lookup = batchNodes.join(reg, col("n") === col("node"), "left_outer")
        .select(col("n"), coalesce(col("label"), col("n")).as("lab"))
      assert(Bucketing.usedBucketedScan(lookup))
      // exactly one exchange: the batch side repartitioning to the
      // registry's bucketing; the 500-row registry never shuffles
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      def shuffles(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case s: ShuffleExchangeLike => 1 + s.children.map(shuffles).sum
        case q: QueryStageExec => shuffles(q.plan)
        case other => other.children.map(shuffles).sum
      }
      lookup.foreach(_ => ())
      assert(shuffles(lookup.queryExecution.executedPlan) == 1)
      // and the lookup is correct: known nodes take their label, fresh
      // nodes fall back to themselves
      val m = lookup.as[(Long, Long)].collect().toMap
      assert(m(480L) == 480L && m(499L) == 495L && m(519L) == 519L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_cc_registry")
    }
  }
}
