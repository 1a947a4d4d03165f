package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Merge}
import graft.pipelines.Collections
import graft.sources.Tables
import graft.streaming.Incremental

/** Oracle-checked queries for the sink/driver family (K3, G5, T1-T3) —
  * the operators that previously had only ScalaTest coverage because their
  * surface is a *materialized side effect* rather than a pure transform.
  * Each query here drives the real machinery (array-append merge, metric
  * write-back, the chunked two-epoch incremental driver with checkpoint
  * resume) and then re-reads the result as a DataFrame, so the DuckDB
  * oracle can verify the end state relationally — the T6 idempotence
  * contract expressed as an equality check: N epochs of chunked keyed
  * upserts must equal one direct query over the source.
  */
object Sinks {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** q76 (K3): [[Merge.appendSeries]] — the reference's
    * `daily_balances: append(OLD, new)` upsert (reference
    * `src/arango_queries.py:77-87`). Existing = even-id events' daily
    * series; incoming = every-third-id events' series with a +1e6 bump so
    * overlap days visibly take the incoming value. The merged arrays are
    * exploded back to rows for the relational compare.
    */
  def q76AppendSeries(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
      .withColumn("day", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
    def daily(pred: Column, bump: Long) =
      Dedup.newestWins(ev.filter(pred), Seq(col("user_id"), col("day")),
          col("ts_us"), col("event_id"))
        .select(col("user_id"), col("day"), (cents(col("value")) + bump).as("value_c"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("day"), col("value_c")))).as("series"))
    val existing = daily(col("event_id") % 2 === 0, 0L)
    val incoming = daily(col("event_id") % 3 === 0, 1000000L)
    Merge.appendSeries(existing, incoming, "user_id", "series", "day")
      .select(col("user_id"), explode(col("series")).as("e"))
      .select(col("user_id"), col("e.day").as("day"), col("e.value_c").as("value_c"))
  }

  /** q77 (G5): [[Collections.mergeMetrics]] — the metric write-back join
    * (reference `src/arango_queries.py:169-178`), driven over a
    * customer-shaped "hotspot" frame with three sparse metric frames
    * (every 3rd/5th/7th key). Outputs re-scaled to ppm longs so the
    * /1e6 … ×1e6 round trip (exact for these magnitudes) never hashes a
    * raw double; unmatched keys must stay null.
    */
  def q77MergeMetrics(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables(spark, d, "customer")
    val hs = cust.select(
      col("c_name").as("_key"), col("c_custkey").cast("long").as("custkey"),
      lit(null).cast("double").as("pagerank"),
      lit(null).cast("double").as("pagerank_n"),
      lit(null).cast("double").as("betweenness_centrality"),
      lit(null).cast("double").as("betweenness_centrality_n"),
      lit(null).cast("double").as("hub_score"),
      lit(null).cast("double").as("authority_score"))
    def metricFrame(mod: Int, a: Int, b: Int) =
      cust.filter(col("c_custkey") % mod === 0)
        .select(col("c_name").as("node"),
          (col("c_custkey") * lit(a.toLong)).as("value_pm"),
          (col("c_custkey") * lit(b.toLong)).as("norm_pm"))
    val hits = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_name").as("node"),
        (col("c_custkey") * 19L).as("hub_pm"), (col("c_custkey") * 23L).as("auth_pm"))
    Collections.mergeMetrics(hs, metricFrame(3, 7, 11), metricFrame(5, 13, 17), Some(hits))
      .select(col("_key"), col("custkey"),
        round(col("pagerank") * 1e6).cast("long").as("pagerank_pm"),
        round(col("pagerank_n") * 1e6).cast("long").as("pagerank_n_pm"),
        round(col("betweenness_centrality") * 1e6).cast("long").as("bc_pm"),
        round(col("betweenness_centrality_n") * 1e6).cast("long").as("bc_n_pm"),
        round(col("hub_score") * 1e6).cast("long").as("hub_pm"),
        round(col("authority_score") * 1e6).cast("long").as("auth_pm"))
  }

  /** q78 (T1-T3): a two-epoch [[Incremental.Driver]] run against the events
    * table (height = event_id) into fresh parquet sinks — epoch 1 backfills
    * the first half in chunks, epoch 2 resumes FROM THE CHECKPOINT and
    * syncs the rest, a third epoch with no height growth must gate out
    * (T2). The final materialized state is read back and compared per user
    * against the snapshot sink AND the oracle's direct scan — chunking,
    * checkpoint resume, and first-write-wins re-processing must all be
    * invisible in the end state (T6 idempotence).
    */
  def q78IncrementalDriver(spark: SparkSession, d: String): DataFrame =
    incrementalDriverRun(spark, d, partitioned = false)

  /** q91: the SAME two-epoch driver with the STEADY-STATE sink —
    * [[Incremental.DynamicCollection.heightBucket]] routes ev_docs
    * through [[graft.operators.Merge.upsertPartitionedByHeight]], so
    * each chunk rewrites only its own height partitions and no epoch
    * fold runs at all. The oracle is q78's twin UNCHANGED: both sink
    * forms must leave exactly the state of one direct scan — the
    * equality is the contract (the q85/q61 pattern).
    */
  def q91PartitionedDriver(spark: SparkSession, d: String): DataFrame =
    incrementalDriverRun(spark, d, partitioned = true)

  private def incrementalDriverRun(spark: SparkSession, d: String,
                                   partitioned: Boolean): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q78_").toString
    val ev = Tables.eventsWithUs(spark, d)
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
    var cap = maxId / 2 // epoch-1 "chain height"; grows before epoch 2
    val source = () => ev.filter(col("event_id") <= cap)
    val dyn = Incremental.DynamicCollection("ev_docs",
      chunk => chunk.select(md5(col("event_id").cast("string")).as("_key"),
        col("event_id"), col("user_id"), cents(col("value")).as("value_c")),
      key = "_key", tiebreak = "event_id",
      // bucketWidth ~ chunk size: each chunk touches ≤ 2 partitions —
      // the sizing contract upsertPartitionedByHeight enforces
      heightBucket = if (partitioned) Some(math.max(1L, maxId / 5)) else None)
    val snap = Incremental.SnapshotCollection("user_snap",
      s => source().groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("snap_sum_c")),
      key = "user_id", tiebreak = "n_events")
    val driver = new Incremental.Driver(spark, source, "event_id",
      stateDir = s"$base/state", sinkDir = s"$base/sinks",
      chunkSize = math.max(1L, maxId / 5), minDiff = 1L,
      dynamics = Seq(dyn), snapshots = Seq(snap))
    val e1 = driver.runEpoch()
    cap = maxId
    val e2 = driver.runEpoch()
    val e3 = driver.runEpoch() // no growth: must gate out, sinks untouched
    val docs = spark.read.parquet(driver.sinkPath("ev_docs"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("value_c")).as("sum_value_c"))
    docs.join(spark.read.parquet(driver.sinkPath("user_snap")), Seq("user_id"))
      .select(col("user_id"), col("n_docs"), col("sum_value_c"),
        col("n_events"), col("snap_sum_c"),
        lit(e1.ran && e2.ran && !e3.ran).as("gated"))
  }

  /** q101: the DataSource V2 connector round-trip — documents projected
    * to (doc_id, lang, n_chars) go OUT through the `jsonlines` V2 write
    * path ([[graft.sources.JsonLinesSource]]: staged files, two-phase
    * driver commit) and come BACK through its V2 scan with the filter
    * pushed into the line parser and `doc_id` pruned out of it, then
    * aggregate. The oracle runs the same filter+aggregate directly over
    * the parquet table: write → commit → scan → pushdown must be a
    * perfect pass-through, the round-trip IS the contract (the q78
    * pattern applied to the connector itself).
    */
  def q101JsonlinesRoundtrip(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_q101_").toString
    Tables.balanced(spark, d, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.format("jsonlines").mode("overwrite").save(dir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    spark.read.format("jsonlines").schema(schema).load(dir)
      .filter(col("n_chars") >= 290L && col("lang").isin("en", "de", "zh"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** q108: the TIERED sink lifecycle ([[graft.sources.TieredJsonSink]]) —
    * the storage-management half of the connector story. Three document
    * batches go through the full log-structured cycle: append (jsonl
    * tail) → compact (parquet base-0) → append → compact again (the
    * ITERATIVE path: base-1 absorbs base-0 ∪ tail) → a third append left
    * live as tail — then one tiered read (newest base ∪ un-absorbed
    * tail) aggregates. The oracle scans the source table directly: two
    * compactions and a mixed base/tail read must be invisible in the end
    * state — the same T6-idempotence contract as q78, applied to the
    * sink's storage tiers.
    */
  def q108TieredSink(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.sources.TieredJsonSink
    val dir = java.nio.file.Files.createTempDirectory("graft_q108_").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    val docs = Tables.balanced(spark, d, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    TieredJsonSink.append(docs.filter(col("doc_id") % 3 === 0), dir)
    TieredJsonSink.compact(spark, dir, schema)
    TieredJsonSink.append(docs.filter(col("doc_id") % 3 === 1), dir)
    TieredJsonSink.compact(spark, dir, schema)
    TieredJsonSink.append(docs.filter(col("doc_id") % 3 === 2), dir)
    TieredJsonSink.read(spark, dir, schema)
      .filter(col("n_chars") >= 250L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(col("doc_id")).as("sum_ids"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_append_series" -> q76AppendSeries _,
    "q77_merge_metrics" -> q77MergeMetrics _,
    "q78_incremental_driver" -> q78IncrementalDriver _,
    "q91_partitioned_driver" -> q91PartitionedDriver _,
    "q101_jsonlines_roundtrip" -> q101JsonlinesRoundtrip _,
    "q108_tiered_sink" -> q108TieredSink _,
  )
}
