package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** X3/K1: the external-connector sink shape — per-PARTITION connections
  * and batched bulk writes, the distributed form of the reference's
  * "fresh connection inside each worker" + `importBulk(batch)` pattern
  * (`src/arango_queries.py:137-143, 211-258`).
  *
  * The reference's own deprecation comments ("Faster to just import with
  * onDuplicate" — per-row RPC loses to batching) are encoded here: rows
  * stream through a bounded buffer and flush in `batchSize` chunks, so a
  * connector sees O(rows/batchSize) round trips and the driver sees none.
  * Executor-side accumulators report created counts without collecting.
  */
object BulkSink {

  /** One connector connection, opened per partition on the executor. A
    * real implementation wraps an HTTP/JDBC client; tests plug in a
    * collector.
    */
  trait BulkWriter extends Serializable {
    /** Called once per partition, executor-side. */
    def open(partitionId: Int): Unit
    /** One batched bulk write; returns rows accepted. */
    def writeBatch(rows: Seq[Row]): Long
    /** Called once per partition after the last batch (also on empty). */
    def close(): Unit
  }

  /** A file-backed [[BulkWriter]]: partition `p` appends its batches as
    * JSON lines to `dir/part-p.jsonl`. Expects a single string column —
    * the serialized document — which is exactly the payload shape the
    * reference bulk-imports (it POSTs JSON document arrays,
    * `src/arango_queries.py:231-258`); the directory stands in for the
    * external endpoint with the same per-partition connection lifecycle.
    * Executor-local writes: in cluster mode `dir` must be a shared
    * filesystem; the flagship runs local mode.
    */
  final class JsonLinesWriter(dir: String) extends BulkWriter {
    @transient private var out: java.io.BufferedWriter = _
    def open(partitionId: Int): Unit = {
      val p = java.nio.file.Paths.get(dir, f"part-$partitionId%05d.jsonl")
      java.nio.file.Files.createDirectories(p.getParent)
      out = java.nio.file.Files.newBufferedWriter(p)
    }
    def writeBatch(rows: Seq[Row]): Long = {
      rows.foreach { r => out.write(r.getString(0)); out.newLine() }
      rows.size.toLong
    }
    def close(): Unit = if (out != null) out.close()
  }

  /** Stream `df` into the writer with per-partition connections and
    * `batchSize` bulk chunks; returns the total accepted count (via an
    * accumulator — no driver-side collect).
    *
    * Count semantics are AT-LEAST-ONCE: a retried or speculative task
    * attempt re-runs its partition, and the accumulator sums every
    * attempt's batches, so the returned count can exceed the rows actually
    * resident in an idempotent sink (JsonLinesWriter truncates on open, so
    * its FILES are exactly-once; only the counter over-reports). Callers
    * needing an exact count must derive it from the sink itself — the
    * flagship re-reads the sink directory and counts that, treating this
    * return value as a progress indicator.
    */
  def write(df: DataFrame, writer: BulkWriter, batchSize: Int): Long = {
    require(batchSize > 0, "batchSize must be positive")
    val accepted: LongAccumulator =
      df.sparkSession.sparkContext.longAccumulator("bulkSinkAccepted")
    df.foreachPartition { (it: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      writer.open(pid)
      try {
        it.grouped(batchSize).foreach { batch =>
          accepted.add(writer.writeBatch(batch))
        }
      } finally writer.close()
    }
    accepted.value
  }
}
