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
}
