package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("appendSeries merges per-element newest-wins, replay-safe (K3)") {
    val existing = Seq(
      ("a", Seq(("2024-01-01", 10L), ("2024-01-02", 20L)))
    ).toDF("_key", "series")
      .select(col("_key"), col("series").cast("array<struct<date:string,balance:bigint>>"))
    val incoming = Seq(
      ("a", Seq(("2024-01-02", 99L), ("2024-01-03", 30L))), // day-2 update + new day
      ("b", Seq(("2024-01-01", 1L))) // brand-new doc
    ).toDF("_key", "series")
      .select(col("_key"), col("series").cast("array<struct<date:string,balance:bigint>>"))

    val out = Merge.appendSeries(existing, incoming, "_key", "series", "date")
      .as[(String, Seq[(String, Long)])].collect().toMap
    assert(out("a") == Seq(("2024-01-01", 10L), ("2024-01-02", 99L), ("2024-01-03", 30L)))
    assert(out("b") == Seq(("2024-01-01", 1L)))
    // replaying the same incoming window changes nothing (idempotent)
    val once = Merge.appendSeries(existing, incoming, "_key", "series", "date")
    val twice = Merge.appendSeries(once, incoming, "_key", "series", "date")
      .as[(String, Seq[(String, Long)])].collect().toMap
    assert(twice == out)
  }

  test("appendSeries orders by the ELEMENT KEY even when it is not the " +
    "struct's first field (r19 review: bare-struct sort_array sorted by " +
    "field declaration order)") {
    val existing = Seq(
      ("a", Seq((9L, "2024-01-01"), (5L, "2024-01-02")))
    ).toDF("_key", "series")
      .select(col("_key"), col("series").cast("array<struct<balance:bigint,date:string>>"))
    val incoming = Seq(
      ("a", Seq((1L, "2024-01-03")))
    ).toDF("_key", "series")
      .select(col("_key"), col("series").cast("array<struct<balance:bigint,date:string>>"))
    val out = Merge.appendSeries(existing, incoming, "_key", "series", "date")
      .as[(String, Seq[(Long, String)])].collect().toMap
    // date order — a struct-field sort would have put balance 1 first
    assert(out("a") ==
      Seq((9L, "2024-01-01"), (5L, "2024-01-02"), (1L, "2024-01-03")))
  }

  test("appendSeries plan: one exchange, no interpreted array-HOF filter") {
    val existing = Seq(("a", Seq(("2024-01-01", 10L)))).toDF("_key", "series")
      .select(col("_key"), col("series").cast("array<struct<date:string,balance:bigint>>"))
    val incoming = Seq(("a", Seq(("2024-01-02", 20L)))).toDF("_key", "series")
      .select(col("_key"), col("series").cast("array<struct<date:string,balance:bigint>>"))
    val out = Merge.appendSeries(existing, incoming, "_key", "series", "date")
    out.foreach(_ => ()) // finalize AQE
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case s: ShuffleExchangeLike => 1 + s.children.map(shuffles).sum
      case q: QueryStageExec => shuffles(q.plan)
      case other => other.children.map(shuffles).sum
    }
    assert(shuffles(out.queryExecution.executedPlan) == 1)
    // the quadratic filter/exists lambda pair must stay gone
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ArrayFilter") && !plan.contains("ArrayExists"))
  }

  test("JsonLinesWriter round-trips documents through the file-backed sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_spec").toString
    val docs = spark.range(0, 50).toDF("id")
      .select(to_json(struct(col("id"), (col("id") * 2).as("v"))).as("doc"))
      .repartition(4)
    val accepted = BulkSink.write(docs, new BulkSink.JsonLinesWriter(dir), batchSize = 8)
    assert(accepted == 50)
    val back = spark.read.json(dir).select("id", "v")
      .as[(Long, Long)].collect().toSet
    assert(back == (0L until 50L).map(i => (i, i * 2)).toSet)
  }

  test("BulkSink opens one connection per partition and batches writes (X3)") {
    val df = spark.range(0, 100).toDF("id").repartition(4)
    val accepted = BulkSink.write(df, CountingWriter, batchSize = 7)
    assert(accepted == 100)
    // 4 partitions × (open + close); batches of ≤7
    assert(CountingWriter.opens.get() == 4)
    assert(CountingWriter.closes.get() == 4)
    assert(CountingWriter.maxBatch.get() <= 7)
  }
}

/** Executor-side collector (object = one instance per JVM; local mode
  * shares it, which is exactly what the assertions need).
  */
object CountingWriter extends BulkSink.BulkWriter {
  val opens = new java.util.concurrent.atomic.AtomicInteger
  val closes = new java.util.concurrent.atomic.AtomicInteger
  val maxBatch = new java.util.concurrent.atomic.AtomicInteger
  def open(partitionId: Int): Unit = opens.incrementAndGet()
  def writeBatch(rows: Seq[Row]): Long = {
    maxBatch.updateAndGet(m => math.max(m, rows.size))
    rows.size.toLong
  }
  def close(): Unit = closes.incrementAndGet()
}
