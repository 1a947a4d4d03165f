package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** The incremental-sync contract (SURVEY.md §2.10, T1-T3): chunked
  * backfill, a polling follower gate, snapshot-vs-append collection
  * routing, and a durable high-water-mark checkpoint.
  *
  * Deliberate divergences from the reference (both are bugs there):
  *  - the current height is re-read EVERY epoch; the reference captures it
  *    once at startup (`src/etl.py:53`) so every follower epoch re-syncs a
  *    growing range;
  *  - progress is checkpointed durably (atomic rename), so a restarted
  *    driver resumes from the high-water mark instead of re-backfilling.
  *
  * Idempotence comes from the sinks, not the driver: dynamic collections
  * append through keyed upsert with content-hash keys (re-processing a
  * chunk is a no-op), snapshots are full-refresh merges (T3,
  * `src/etl.py:77-109`). Late/duplicate data is therefore handled exactly
  * like the reference (T6) but deterministically.
  */
object Incremental {

  /** Durable scalar checkpoint via Hadoop FileSystem. Storage-agnostic
    * (posix/HDFS). Hadoop `rename` does NOT overwrite an existing
    * destination, so every write after the first swaps through a
    * rename-aside: mark → `.old`, tmp → mark, delete `.old` — and
    * [[read]] falls back to `.old`, so a crash between the renames
    * degrades to the PREVIOUS durable mark (the epoch replays,
    * idempotent by T6), never to "no mark" and a full from-zero re-sync.
    * The pre-r19 delete-then-rename fallback had exactly that window.
    */
  final class Checkpoint(spark: SparkSession, dir: String) {
    private val fs: FileSystem =
      new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    private val file = new Path(dir, "high_water_mark")
    private val aside = new Path(dir, "high_water_mark.old")

    private def readOne(p: Path): Option[Long] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      }

    def read(): Option[Long] = readOne(file).orElse(readOne(aside))

    def write(mark: Long): Unit = {
      fs.mkdirs(new Path(dir))
      val tmp = new Path(dir, s"high_water_mark.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(mark.toString.getBytes("UTF-8")) finally out.close()
      if (fs.exists(aside)) fs.delete(aside, false)
      if (fs.exists(file)) fs.rename(file, aside)
      if (!fs.rename(tmp, file))
        throw new java.io.IOException(s"checkpoint rename failed: $file")
      fs.delete(aside, false)
      // sweep tmp orphans from crashed writes (uuid-named, never reused)
      fs.listStatus(new Path(dir))
        .filter(_.getPath.getName.startsWith("high_water_mark.tmp-"))
        .foreach(s => fs.delete(s.getPath, false))
      ()
    }
  }

  /** T1 chunk walk: inclusive-exclusive [lo, hi) ranges of at most `chunk`. */
  def chunkRanges(lo: Long, hi: Long, chunk: Long): Seq[(Long, Long)] = {
    require(chunk > 0, "chunk must be positive")
    (lo until hi by chunk).map(s => (s, math.min(s + chunk, hi)))
  }

  /** One dynamic (append-by-range) collection: how to turn the source rows
    * of one chunk into keyed documents. Keys must be content-derived so
    * re-processing is a no-op (D1/T6).
    *
    * `heightBucket = Some(width)` opts the collection into the
    * STEADY-STATE sink ([[Merge.upsertPartitionedByHeight]]): the
    * extracted frame must RETAIN the driver's height column, and keys
    * must be height-local (content keys are). Per-chunk cost is then
    * O(chunk) with no epoch fold at all — partitions outside the chunk's
    * height range are never rewritten (MergeSpec pins untouched partitions'
    * part files unchanged across epochs).
    */
  case class DynamicCollection(name: String, extract: DataFrame => DataFrame,
                               key: String, tiebreak: String,
                               heightBucket: Option[Long] = None)

  /** One snapshot (full-refresh) collection (T3 "inventories"). */
  case class SnapshotCollection(name: String, build: SparkSession => DataFrame,
                                key: String, tiebreak: String)

  case class EpochReport(ran: Boolean, from: Long, to: Long, chunks: Int)

  /** The STREAMING follower: a Structured Streaming source drives the
    * same keyed first-write-wins sink the batch [[Driver]] walks in
    * height chunks — `foreachBatch` IS the chunk loop, with the trigger
    * deciding chunk boundaries instead of height ranges, and the stream's
    * own checkpoint (offset log) replacing the [[Checkpoint]] high-water
    * mark. Idempotence is unchanged and comes from the sink (T6):
    * content-derived keys + `Merge.Ignore` make a replayed micro-batch a
    * no-op, so the at-least-once delivery foreachBatch guarantees becomes
    * exactly-once SINK STATE — the equivalence
    * StreamBatchEquivalence/IncrementalSpec pin for the batch driver
    * holds for the stream too (asserted in IncrementalSpec).
    *
    * Scale note: per micro-batch this pays the same O(sink) parquet
    * rewrite as the batch driver — the documented stand-in; production
    * swaps `Merge.upsertParquet` for a table-format MERGE inside the same
    * foreachBatch (see SCALE.md's sink section), the driver shape is
    * unchanged.
    */
  def streamingUpsert(stream: DataFrame, checkpointDir: String, sinkPath: String,
                      key: String, tiebreak: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Merge.upsertParquet(batch.sparkSession, sinkPath, batch,
          key, Merge.Ignore, tiebreak)
        ()
      }
      .start()

  /** The streaming follower on the DELTA LOG: each micro-batch appends an
    * O(batch) delta (never reading the growing sink) and the whole-sink
    * fold runs only every `compactEvery` batches — the same LSM shape the
    * batch [[Driver]] uses per epoch, driven by the trigger instead of
    * height ranges. Between folds the sink's logical state is served by
    * [[Merge.readMerged]] (base + pending deltas under the same
    * precedence — the transaction-log read path); a single append is
    * atomic (tmp+rename), but long reads must not overlap a compaction —
    * see readMerged's consistency contract (plain parquet has no
    * snapshot isolation; that is the documented Delta/Iceberg swap
    * point). Idempotence (T6) is unchanged: a
    * replayed micro-batch appends a duplicate delta and first-write-wins
    * resolves it away, exactly the crashed-epoch story MergeSpec pins.
    * Compared to [[streamingUpsert]] (per-batch O(sink) rewrite — fine
    * for bootstrap-scale sinks), this is the steady-state form for
    * long-running followers whose sink dwarfs a trigger interval's rows.
    */
  def streamingUpsertDelta(stream: DataFrame, checkpointDir: String,
                           sinkPath: String, key: String, tiebreak: String,
                           compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery > 0, s"compactEvery must be positive, got $compactEvery")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        Merge.appendDelta(spark, sinkPath, batch)
        if (Merge.pendingDeltas(spark, sinkPath).size >= compactEvery)
          Merge.finalizeDeltas(spark, sinkPath, key, Merge.Ignore, tiebreak)
        ()
      }
      .start()
  }

  /** The streaming follower on the HEIGHT-BUCKETED sink — the third sink
    * regime, completing the set: [[streamingUpsert]] rewrites O(sink) per
    * batch (bootstrap scale), [[streamingUpsertDelta]] appends O(batch)
    * with a periodic O(sink) fold (LSM), and THIS form merges only the
    * micro-batch's own height buckets ([[Merge.upsertPartitionedByHeight]])
    * — per-batch cost O(batch + touched buckets), NEVER the sink size, no
    * fold ever. Exactly the q91 batch driver's steady-state path with
    * `foreachBatch` as the chunk loop and the stream's offset log as the
    * checkpoint; requires the same height-locality contract on keys
    * (content keys qualify) and a `heightCol` on every row. Idempotence
    * (T6) is unchanged: a replayed micro-batch finds its own rows in the
    * merged buckets and first-write-wins keeps them —
    * StreamBatchEquivalenceSpec pins stream ≡ batch end state.
    */
  def streamingUpsertPartitioned(stream: DataFrame, checkpointDir: String,
                                 sinkPath: String, key: String,
                                 tiebreak: String, heightCol: String,
                                 bucketWidth: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Merge.upsertPartitionedByHeight(batch.sparkSession, sinkPath, batch,
          key, Merge.Ignore, tiebreak, heightCol, bucketWidth)
        ()
      }
      .start()

  /** Streaming incremental exact span dedup — the q102 chaining contract
    * (`registry' = registry ∪ new distinct blocks`) driven by
    * `foreachBatch`: each micro-batch is deduped against the persistent
    * block registry ([[graft.operators.TextDedup.spanDedupAgainst]]),
    * the rebuilt documents land in `outPath` via a KEYED first-write-wins
    * upsert, and only the batch's genuinely-new distinct blocks append to
    * `registryPath`.
    *
    * Replay safety (T6) hangs on the WRITE ORDER: documents first,
    * registry second. A batch replayed after a crash between the two
    * writes recomputes the same dedup (registry unchanged), the keyed
    * upsert ignores the already-present doc rows, and the registry
    * append retries. The reverse order would be wrong: with its blocks
    * already registered, a replayed batch would dedup to empty rebuilds
    * and first-write-wins would keep THOSE. The registry delta is the
    * batch's distinct blocks anti-joined on the registry — by
    * construction exactly the surviving block set, and empty on replay,
    * so the registry never accumulates duplicates.
    */
  def streamingSpanDedup(stream: DataFrame, checkpointDir: String,
                         outPath: String, registryPath: String,
                         id: String, text: String, k: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val reg = readRegistry(spark, registryPath)
        val deduped = graft.operators.TextDedup.spanDedupAgainst(
          batch, reg, id, text, k)
        Merge.upsertParquet(spark, outPath, deduped,
          "doc_id", Merge.Ignore, "n_blocks")
        batch.select(explode(graft.functions.Text.blocks(
            graft.functions.Text.tokens(col(text)), k)).as("blk"))
          .distinct()
          .join(reg, Seq("blk"), "left_anti")
          .write.mode("append").parquet(registryPath)
        ()
      }
      .start()

  /** Streaming substring excision — [[streamingSpanDedup]]'s twin at the
    * q113/q114 granularity: each micro-batch is excised against the
    * persistent GRAM registry
    * ([[graft.operators.TextDedup.substringExciseAgainst]]), excised
    * docs land via keyed first-write-wins upsert, and the batch's novel
    * distinct grams append to the registry. Same replay-safe write
    * order as the span form (documents FIRST, registry second): a
    * replayed batch re-excises identically — its grams are not yet
    * registered on the replayed path that matters, and the Ignore
    * upsert keeps the first write — and the registry delta re-computes
    * to empty-or-identical rows.
    */
  def streamingSubstringExcise(stream: DataFrame, checkpointDir: String,
                               outPath: String, registryPath: String,
                               id: String, text: String, minLen: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val reg = readGramRegistry(spark, registryPath)
        val excised = graft.operators.TextDedup.substringExciseAgainst(
          batch, reg, id, text, minLen)
        Merge.upsertParquet(spark, outPath, excised,
          "doc_id", Merge.Ignore, "n_tokens")
        batch.select(explode(graft.functions.Text.shingles(
            graft.functions.Text.tokens(col(text)), minLen)).as("gram"))
          .distinct()
          .join(reg, Seq("gram"), "left_anti")
          .write.mode("append").parquet(registryPath)
        ()
      }
      .start()

  /** [[streamingSubstringExcise]] with a BUCKETED gram registry — the
    * scale form for the registry that actually gets huge at 100 TB. The
    * image twin's literal-pushdown trick ([[bucketedDhashLookup]]) dies
    * here: a batch's distinct L-grams track its TOKEN count (far past
    * any IN-list), so bucket PRUNING cannot apply — the right tool is
    * the storage-partitioned JOIN. The registry lives as a catalog
    * table bucketed by `gram`; the excision's registry join and the
    * novel-gram anti-join then satisfy their ClusteredDistribution
    * straight off the bucketed scan, so per batch the registry
    * contributes ZERO shuffle rows — only the batch side exchanges
    * (plan-asserted in StreamBatchEquivalenceSpec, gramreg probe in
    * SCALE.md). The flat twin shuffles the ENTIRE registry every
    * micro-batch; at a billions-of-grams registry that exchange IS the
    * batch cost.
    *
    * `withForcedBucketedScan` spans the actions because Spark's
    * `DisableUnnecessaryBucketedScan` rule does not credit one-side
    * bucketed joins whose other side it plans to shuffle anyway —
    * measured, same as the image twin; foreachBatch serializes batches,
    * so the session-level flip cannot race this stream's own queries.
    * Same replay-safe write order (documents FIRST, registry second);
    * results ≡ the flat twin ≡ the batch q114 rule over ordered arrival
    * (StreamBatchEquivalenceSpec).
    */
  def streamingSubstringExciseBucketed(stream: DataFrame, checkpointDir: String,
                                       outPath: String, registryTable: String,
                                       id: String, text: String, minLen: Int,
                                       buckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        graft.sources.Bucketing.withForcedBucketedScan(spark) {
          val reg =
            if (spark.catalog.tableExists(registryTable))
              spark.table(registryTable).select(col("gram"))
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("gram",
                  org.apache.spark.sql.types.StringType))))
          val excised = graft.operators.TextDedup.substringExciseAgainst(
            batch, reg, id, text, minLen)
          Merge.upsertParquet(spark, outPath, excised,
            "doc_id", Merge.Ignore, "n_tokens")
          val novel = batch.select(explode(graft.functions.Text.shingles(
              graft.functions.Text.tokens(col(text)), minLen)).as("gram"))
            .distinct()
            .join(reg, Seq("gram"), "left_anti")
          if (spark.catalog.tableExists(registryTable))
            graft.sources.Bucketing.appendBucketed(novel, registryTable,
              buckets, "gram")
          else
            graft.sources.Bucketing.writeBucketed(novel, registryTable,
              buckets, "gram")
          ()
        }
      }
      .start()

  /** Streaming perceptual image dedup — [[streamingSpanDedup]]'s twin in
    * the multimodal domain: each micro-batch of (id, ppm-binary) rows is
    * dHashed (REAL decode,
    * [[graft.operators.Multimodal.dHashPpm]]), deduped against the
    * persistent FINGERPRINT registry
    * ([[graft.operators.Multimodal.dHashDedupAgainst]] — batch-keyed
    * anti-join, corpus never re-scanned), surviving representatives land
    * via keyed first-write-wins upsert, and the batch's novel distinct
    * fingerprints append to the registry. Same replay-safe write order
    * (documents FIRST, registry second).
    */
  def streamingImageDedup(stream: DataFrame, checkpointDir: String,
                          outPath: String, registryPath: String,
                          id: String, bin: String,
                          hasher: (SparkSession, DataFrame, String, String) => DataFrame =
                            graft.operators.Multimodal.dHashPpm)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val reg = readDhashRegistry(spark, registryPath)
        // the codec is a SEAM, not a fork: dHashPpm / dHashPng /
        // dHashJpeg all emit the same 56-bit fingerprint schema, so a
        // compressed-image stream runs this twin unchanged (pinned in
        // StreamBatchEquivalenceSpec — PNG batches reproduce the PPM
        // path's kept set on the same pixel definitions)
        val hashes = hasher(spark, batch, id, bin)
        val kept = graft.operators.Multimodal.dHashDedupAgainst(hashes, reg)
        Merge.upsertParquet(spark, outPath, kept, "id", Merge.Ignore, "dhash")
        hashes.select(col("dhash")).distinct()
          .join(reg, Seq("dhash"), "left_anti")
          .write.mode("append").parquet(registryPath)
        ()
      }
      .start()

  /** [[streamingImageDedup]] with a BUCKETED registry — the scale form
    * of the per-batch registry read. The flat twin re-scans the WHOLE
    * fingerprint registry every micro-batch (at 100 TB the registry is
    * billions of rows and the scan dwarfs the batch); here the registry
    * is a catalog table bucketed by `dhash`, and each batch's lookup
    * pushes its OWN fingerprint values into the scan as literals
    * ([[bucketedDhashLookup]]), so Spark's bucket pruning reads only
    * the ≤ |batch-distinct| buckets the batch can possibly touch —
    * per-batch scan cost tracks the BATCH, not the corpus. Measured
    * (SCALE.md bucketreg probe): a 32-value batch against a 12.8M-row
    * registry reads 136k records where the flat scan reads all 12.8M
    * (94×), and the fraction tracks |batch|/buckets at every factor —
    * which is also the SIZING RULE: pruning only prunes when buckets ≫
    * per-batch distinct values (the probe's first cut, 500 values on
    * 64 buckets, touched every bucket and pruned nothing). Default 64
    * suits small batches; size buckets to ≥ 10× the expected per-batch
    * distinct fingerprint count at deployment.
    *
    * The driver-side collect of the batch's distinct fingerprints is
    * bounded by the micro-batch size (the bounded-collect rule) — that
    * bound is what BUYS the pruning: values must be literals to reach
    * the scan. Lookup equivalence is exact, not approximate: both the
    * dedup anti-join and the novelty anti-join compare on `dhash`
    * membership, and pruning keeps precisely the registry rows whose
    * `dhash` is in the batch — rows outside the batch's value set
    * cannot influence either join (StreamBatchEquivalenceSpec pins
    * stream ≡ batch ≡ the flat twin, bucketed scan asserted).
    * Same replay-safe write order (documents FIRST, registry second).
    */
  def streamingImageDedupBucketed(stream: DataFrame, checkpointDir: String,
                                  outPath: String, registryTable: String,
                                  id: String, bin: String, buckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hashes = graft.operators.Multimodal.dHashPpm(spark, batch, id, bin)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the forced-bucketed-scan scope must span the ACTIONS (planning
        // reads the conf then); foreachBatch serializes batches, so the
        // session-level flip cannot race this stream's own queries
        try graft.sources.Bucketing.withForcedBucketedScan(spark) {
          val batchValues = hashes.select(col("dhash")).distinct()
            .collect().map(_.getLong(0)) // bounded by the micro-batch
          val reg = bucketedDhashLookup(spark, registryTable, batchValues)
          val kept = graft.operators.Multimodal.dHashDedupAgainst(hashes, reg)
          Merge.upsertParquet(spark, outPath, kept, "id", Merge.Ignore, "dhash")
          val novel = hashes.select(col("dhash")).distinct()
            .join(reg.select(col("dhash")), Seq("dhash"), "left_anti")
          if (spark.catalog.tableExists(registryTable))
            graft.sources.Bucketing.appendBucketed(novel, registryTable,
              buckets, "dhash")
          else
            graft.sources.Bucketing.writeBucketed(novel, registryTable,
              buckets, "dhash")
          ()
        } finally { hashes.unpersist(); () }
      }
      .start()

  /** The batch-valued registry lookup behind
    * [[streamingImageDedupBucketed]]: registry rows whose `dhash` is in
    * `values`, as a bucket-PRUNED scan (the values arrive as literals,
    * so the bucketed file source skips every bucket no value hashes
    * into). Empty-safe before the table exists. Public at test scope so
    * the spec can assert `usedBucketedScan` on the exact frame the
    * twin runs.
    */
  private[graft] def bucketedDhashLookup(spark: SparkSession,
                                         registryTable: String,
                                         values: Array[Long]): DataFrame =
    if (spark.catalog.tableExists(registryTable))
      spark.table(registryTable)
        .filter(col("dhash").isin(values.map(Long.box).toIndexedSeq: _*))
        .select(col("dhash"))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dhash",
          org.apache.spark.sql.types.LongType))))

  /** Streaming video novelty — q142's deployment shape: each micro-batch
    * of (id, P6-stream) videos is walked → per-frame dHashed → scene-
    * contracted to keyframes ([[graft.operators.Multimodal.keyframes]]),
    * each keyframe is tested for visual novelty against the persistent
    * FINGERPRINT registry (the same `dhash` registry schema the image
    * twin uses — fingerprints are fingerprints) AND against earlier
    * keyframes of the same batch (first-wins by (id, scene), q142's
    * global window restricted to the batch), the per-video novelty row
    * lands via keyed first-write-wins upsert, and the batch's novel
    * fingerprints append to the registry. Replay-safe by the standard
    * write order: a replayed batch recomputes novelty 0 (its
    * fingerprints are registered) but the Ignore upsert keeps the first
    * row.
    *
    * Stream ≡ batch: over ordered arrival the chained first-wins equals
    * q142's one global (id, scene)-ordered window
    * (StreamBatchEquivalenceSpec).
    *
    * Registry maintenance is wired to the stream's OWN cadence: every
    * `compactEvery` batches the append-only registry is folded to one
    * file ([[compactRegistry]] — serial with the appends by foreachBatch
    * construction, idempotent on replay). IncrementalSpec pins that
    * appends continue across a compaction with no key lost or duplicated.
    */
  def streamingVideoNovelty(stream: DataFrame, checkpointDir: String,
                            outPath: String, registryPath: String,
                            id: String, bin: String, minHamming: Int,
                            compactEvery: Int = 32)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val kf = graft.operators.Multimodal.keyframes(spark, batch, id, bin,
            minHamming)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val reg = readDhashRegistry(spark, registryPath)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("keyframe_dhash"))
            .orderBy(col("id").asc, col("scene").asc)
          val flagged = kf
            .withColumn("__rn", row_number().over(w))
            .join(reg.select(col("dhash").as("keyframe_dhash"),
              lit(true).as("__seen")), Seq("keyframe_dhash"), "left_outer")
          val novelty = flagged.groupBy(col("id"))
            .agg(count(lit(1)).as("n_scenes"),
              sum(when(col("__rn") === 1 && col("__seen").isNull, 1L)
                .otherwise(0L)).as("novel_scenes"),
              expr("(1000000 * sum(CASE WHEN __rn = 1 AND __seen IS NULL" +
                " THEN 1 ELSE 0 END)) div count(1)").as("novelty_pm"))
          Merge.upsertParquet(spark, outPath, novelty, "id", Merge.Ignore,
            "n_scenes")
          kf.select(col("keyframe_dhash").as("dhash")).distinct()
            .join(reg, Seq("dhash"), "left_anti")
            .write.mode("append").parquet(registryPath)
          // registry maintenance on the owning stream's own cadence
          // (batches are serial, so compaction can never race an
          // append; batchId is deterministic on replay and compaction
          // is a distinct+rewrite — idempotent). Without this a
          // long-running stream accumulates one KB-sized file per
          // batch and registry scan cost starts tracking FILE COUNT.
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
            compactRegistry(spark, registryPath)
          ()
        } finally { kf.unpersist(); () }
      }
      .start()

  /** The fingerprint registry, empty-safe before the first batch commits. */
  private def readDhashRegistry(spark: SparkSession,
                                registryPath: String): DataFrame =
    // one emptiness check to maintain — readLongColOrEmpty is the shared
    // shape (this used to be a verbatim copy, the drift the
    // readStringColOrEmpty comment warns about)
    readLongColOrEmpty(spark, registryPath, "dhash")

  /** One empty-safe single-string-column parquet reader behind every
    * streaming registry (blocks, grams, seen words) — one emptiness
    * check to maintain, not three silently-diverging copies.
    */
  private def readStringColOrEmpty(spark: SparkSession, path: String,
                                   column: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      spark.read.parquet(path).select(column)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(column,
          org.apache.spark.sql.types.StringType))))
  }

  /** The gram registry, empty-safe before the first batch commits. */
  private def readGramRegistry(spark: SparkSession, registryPath: String): DataFrame =
    readStringColOrEmpty(spark, registryPath, "gram")

  /** Streaming SFT rendering — q127's deployment shape. A conversation
    * MUTATES as turns arrive (every new turn changes its `rendered`
    * string and can shift nothing before it but extends the masks), so
    * the twin keeps a TURN REGISTRY (append-only, first-wins per
    * (conversation, turn id) — replays land nothing) and re-renders
    * ONLY the conversations the batch touched, upserting their rows
    * UPDATE-mode (newest render wins — the one twin family where the
    * sink row legitimately changes; `n_turns` is the monotone tiebreak,
    * so even a reordered refresh converges to the fullest render).
    * Per-batch cost ∝ touched conversations' history, never the corpus.
    *
    * `keyCols`/`turnCols` contract: `turns` carries
    * (convKey, turnId, ts, role, content); re-rendering is a pure
    * function of the registry, so stream ≡ batch over any chunking
    * (StreamBatchEquivalenceSpec, including a replayed chunk).
    *
    * Scan cost note: the registry READ here is a full-file scan per
    * batch (the join prunes rows, not files). At production registry
    * sizes, write the registry bucketed/partitioned by a conv-hash so
    * the touched-conversation lookup prunes partitions — the
    * bucketed-registry pattern SCALE.md records for the block registry;
    * the operator shape is unchanged.
    */
  def streamingSftRender(stream: DataFrame, checkpointDir: String,
                         outPath: String, registryPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // 1. land the batch's turns (first-wins on the TUPLE key —
        //    a replayed or duplicated turn cannot double-render). Never
        //    a concat key: conv="c:1"/turn="2" and conv="c"/turn="1:2"
        //    would alias and silently drop a turn — the trap this file's
        //    own partial-key comments ban elsewhere.
        Merge.upsertParquet(spark, registryPath, batch,
          Seq("conv", "turn_id"), Merge.Ignore, "ts")
        // 2. re-render the touched conversations from the registry
        val touched = batch.select(col("conv")).distinct()
        val history = spark.read.parquet(registryPath)
          .join(touched, Seq("conv"))
        val rendered = graft.operators.Sft.renderChat(history,
          Seq(col("conv")), col("ts"), col("turn_id"),
          col("role"), col("content"))
        Merge.upsertParquet(spark, outPath, rendered,
          "conv", Merge.Update, "n_turns")
        ()
      }
      .start()

  /** Streaming dataset card — q132 maintained LIVE over an arriving
    * corpus, and the repo's third state idiom. The first two:
    * keyed first-write-wins upsert (idempotent per-ROW results —
    * [[streamingSpanDedup]] and family) and tmp+swap snapshot (MUTATING
    * state — [[streamingComponents]]). Additive counters fit neither: a
    * replayed batch must not double-count, but its rows carry no
    * identity of their own. The exactly-once-ADDITIVE pattern: write
    * per-(source, batchId) PARTIALS under first-wins on that composite
    * key — `batchId` is deterministic on replay, so the recomputed
    * partial (whose dup flags WOULD differ, the registry having already
    * absorbed the batch) is dropped and the first landing stays
    * authoritative — and serve the card by SUMMING partials
    * ([[datasetCardFromPartials]]), every ratio derived from summed
    * counters exactly as the batch card derives them from one
    * aggregate's.
    *
    * Dup accounting matches the batch card's global first-wins when
    * batches arrive in `doc_id` order (the chaining convention all
    * registry twins share): a doc is a duplicate iff its normalized
    * fingerprint was seen in an earlier batch (registry hit) or earlier
    * in its own batch (batch-internal window).
    *
    * Maintenance notes: the partials store grows one row per (source,
    * batch) — [[compactRegistry]]-style folding of partials older than
    * the stream's replayable horizon (sum them into a base row) bounds
    * it; compacting batches the checkpoint can still replay would
    * un-dedupe them, so fold strictly behind the committed offset. The
    * fingerprint registry read is a full scan per batch (bucket it by
    * fp-hash at production sizes, as above).
    */
  def streamingDatasetCard(stream: DataFrame, checkpointDir: String,
                           partialsPath: String, registryPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        val reg = readStringColOrEmpty(spark, registryPath, "fp")
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
        val flagged = graft.queries.Curation.cardSignals(batch)
          .join(reg.withColumn("__seen", lit(true)), Seq("fp"), "left")
          .withColumn("__rn", row_number().over(w))
          .withColumn("__dup", col("__seen").isNotNull || col("__rn") > 1)
        val partial = flagged.groupBy(col("source"))
          .agg(graft.queries.Curation.cardCounters.head, graft.queries.Curation.cardCounters.tail: _*)
          .withColumn("batch_id", lit(batchId))
        // tuple key, never concat: a source name containing the delimiter
        // would alias two distinct partials and silently drop one
        Merge.upsertParquet(spark, partialsPath, partial,
          Seq("source", "batch_id"), Merge.Ignore, "n_docs")
        flagged.filter(col("__rn") === 1 && col("__seen").isNull)
          .select(col("fp"))
          .write.mode("append").parquet(registryPath)
        ()
      }
      .start()

  /** Serve the live card: sum the partials per source, derive the same
    * ratios the batch card derives — identical output schema to q132.
    */
  def datasetCardFromPartials(spark: SparkSession,
                              partialsPath: String): DataFrame =
    spark.read.parquet(partialsPath)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_dup_docs")).as("n_dup_docs"),
        sum(col("n_lang_match")).as("n_lang_match"),
        sum(col("stop_pm_sum")).as("stop_pm_sum"))
      .select(col("source") +: graft.queries.Curation.cardRatios: _*)

  /** Streaming term-association registries — the q175/q177 count tables
    * maintained LIVE over an arriving corpus, the exactly-once-ADDITIVE
    * partials idiom ([[streamingDatasetCard]]'s third state pattern):
    * each micro-batch lands its own windowed pair counts and unigram
    * counts as per-(key, batchId) PARTIAL rows under first-wins upsert —
    * batchId is deterministic on checkpoint replay, so a recomputed
    * partial is dropped and nothing double-counts. Windows never cross
    * documents, so ANY doc-batching yields partials that sum to the
    * global tables exactly (the q177 additivity, no arrival contract).
    * Per-batch cost: the batch's own row-local pair generation plus two
    * keyed upserts sized to the batch's distinct pairs/terms —
    * earlier batches are never re-read. At production sizes the
    * partials stores are pair-/term-bucketed catalog tables and
    * [[compactRegistry]]-style folding behind the committed offset
    * bounds their row count.
    */
  def streamingTermAssociations(stream: DataFrame, checkpointDir: String,
                                pairPartialsPath: String,
                                termPartialsPath: String, window: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import graft.operators.Cooccurrence
        // tuple keys, never concat: tokens come from whitespace-only
        // splitting, so they can legitimately contain any delimiter —
        // concat'd keys would alias distinct pairs like ("x","y|z") and
        // ("x|y","z") and first-wins would silently undercount (r15
        // advice). The multi-column upsert partitions by the columns
        // themselves.
        val pairs = Cooccurrence.termPairCounts(batch, "text", window)
          .withColumn("batch_id", lit(batchId))
        Merge.upsertParquet(spark, pairPartialsPath, pairs,
          Seq("a", "b", "batch_id"), Merge.Ignore, "c_ab")
        val terms = Cooccurrence.termOccurrences(batch, "text")
          .withColumn("batch_id", lit(batchId))
        Merge.upsertParquet(spark, termPartialsPath, terms,
          Seq("w", "batch_id"), Merge.Ignore, "c_w")
        ()
      }
      .start()

  /** Serve the q175 association view from [[streamingTermAssociations]]
    * partials: sum partials per key (exact, counts are associative),
    * then the same PMI-lift scoring as the batch path.
    */
  def associationsFromPartials(spark: SparkSession, pairPartialsPath: String,
                               termPartialsPath: String,
                               minPairCount: Long): DataFrame =
    graft.operators.Cooccurrence.associationScores(
      spark.read.parquet(pairPartialsPath)
        .groupBy(col("a"), col("b")).agg(sum(col("c_ab")).as("c_ab")),
      spark.read.parquet(termPartialsPath)
        .groupBy(col("w")).agg(sum(col("c_w")).as("c_w")),
      minPairCount)

  /** Streaming drift-monitor partials ([[graft.operators.Drift]] family
    * — the q158 registry form run continuously): each micro-batch folds
    * its binned-feature counts into an upserted partials table keyed
    * (groupCols…, bin, batch_id), idempotent under checkpoint replay
    * (Ignore mode — a replayed batch's partial already holds the same
    * counts). Counts are associative, so summing partials reproduces
    * the global histogram exactly; [[driftFromPartials]] serves the
    * live TVD against a frozen reference registry from those sums.
    * Per-batch cost is the batch's own rows plus a |bins|-sized upsert;
    * neither the reference corpus nor earlier batches are ever re-read.
    */
  def streamingDriftPartials(stream: DataFrame, checkpointDir: String,
                             partialsPath: String, groupCols: Seq[String],
                             binCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // tuple key, never concat_ws: group values from data can contain
        // the delimiter (the same silent-undercount class as the
        // association partials)
        val partial = graft.operators.Drift
          .binnedCounts(batch, groupCols, binCol)
          .withColumn("batch_id", lit(batchId))
        Merge.upsertParquet(spark, partialsPath, partial,
          groupCols :+ binCol :+ "batch_id", Merge.Ignore, "c")
        ()
      }
      .start()

  /** Serve the live drift: sum partials into the global per-(group, bin)
    * histogram and TVD it against the frozen reference registry —
    * identical output schema and values to the batch
    * [[graft.operators.Drift.tvdAgainstRegistry]] over the union of all
    * streamed rows (stream ≡ batch pinned in
    * StreamBatchEquivalenceSpec).
    */
  def driftFromPartials(spark: SparkSession, partialsPath: String,
                        registry: DataFrame, groupCols: Seq[String],
                        binCol: String): DataFrame = {
    val counts = spark.read.parquet(partialsPath)
      .groupBy((groupCols :+ binCol).map(col): _*)
      .agg(sum(col("c")).as("c"))
    graft.operators.Drift.tvdBetweenCounts(registry, counts, groupCols,
      binCol)
  }

  /** Compact an append-only streaming registry in place. Every
    * [[streamingSpanDedup]]-family micro-batch appends one small parquet
    * file of novel keys; a long-running stream accumulates tens of
    * thousands of KB-sized files and registry SCAN cost starts tracking
    * file count, not data (the small-file problem the tiered sink solves
    * for documents — registries need the same maintenance). One
    * distinct + coalesce snapshot through the [[Merge.replaceParquet]]
    * commitSwap discipline (the new state materializes fully before the
    * old files move — safe even though the lineage reads the current
    * dir). Call it from the owning stream's own foreachBatch cadence
    * (every N batches): batches are serial, so the compaction can never
    * race an append from the same query. No-op if the registry doesn't
    * exist yet.
    */
  def compactRegistry(spark: SparkSession, registryPath: String,
                      partitions: Int = 1): Unit = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val p = new Path(registryPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) &&
        fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      Merge.replaceParquet(spark, registryPath,
        spark.read.parquet(registryPath).distinct().coalesce(partitions))
  }

  /** Streaming LM quality scoring — the CCNet deployment shape of q107:
    * the stupid-backoff count tables are trained ONCE
    * ([[graft.operators.TermStats.lmCounts]], captured by the closure
    * and persisted, so every micro-batch reuses the same materialized
    * artifact), and each arriving batch of documents is scored against
    * them ([[graft.operators.TermStats.lmScoreAgainst]]) and landed in
    * `outPath` via a KEYED first-write-wins upsert.
    *
    * Replay safety (T6) is free here: scoring is a pure function of
    * (batch, frozen counts), so a replayed batch recomputes identical
    * rows and the Ignore-mode upsert drops them — no write-order
    * subtlety, unlike [[streamingSpanDedup]] whose registry mutates.
    */
  def streamingLmScore(stream: DataFrame, train: DataFrame,
                       checkpointDir: String, outPath: String,
                       id: String, text: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val counts = graft.operators.TermStats.lmCounts(train, id, text)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val scored = graft.operators.TermStats.lmScoreAgainst(
          batch, counts, id, text)
        Merge.upsertParquet(batch.sparkSession, outPath, scored,
          "doc_id", Merge.Ignore, "n_trigrams")
        ()
      }
      .start()
  }

  /** Streaming DSIR scoring — the data-selection deployment shape of
    * q110: the hashed-ngram bucket models are trained ONCE
    * ([[graft.operators.Dsir.bucketStats]], persisted so every
    * micro-batch reuses the materialized ≤buckets-row artifact) and each
    * arriving batch of documents is scored against them
    * ([[graft.operators.Dsir.scoreAgainst]] — broadcast join, exact
    * integer ratio) and landed via a keyed first-write-wins upsert.
    * Replay safety is free: scoring is pure in (batch, frozen stats) —
    * the [[streamingLmScore]] reasoning. A threshold gate (or a
    * downstream periodic top-N over the sink) turns scores into the
    * selected corpus.
    *
    * Lifecycle: the persisted stats frame is released automatically when
    * THIS query terminates (a self-removing `StreamingQueryListener` —
    * callers own nothing). A [[graft.Caches.clearAll]] in the same
    * session while the query is live drops the cached blocks AND the
    * cache registration, silently degrading every later micro-batch to a
    * model refit (correct results, train-once contract lost) — run
    * long-lived scoring queries in their own session, or re-start them
    * after a cache sweep.
    */
  def streamingDsirScore(stream: DataFrame, raw: DataFrame,
                         target: DataFrame, checkpointDir: String,
                         outPath: String, id: String, text: String,
                         buckets: Int)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val stats = graft.operators.Dsir.bucketStats(raw, target, id, text, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Listener registered BEFORE start(): a query that dies immediately
    // can post its QueryTerminatedEvent before a post-start addListener
    // runs, leaking the persisted stats and the dead listener forever.
    // The id is only known after start, so match through a volatile and
    // close the remaining pre-assignment window with the isActive check
    // below (double-unpersist/removeListener are harmless no-ops).
    val streams = stream.sparkSession.streams
    @volatile var qid: java.util.UUID = null
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (qid != null && e.id == qid) {
          stats.unpersist(blocking = false)
          streams.removeListener(this)
        }
    }
    streams.addListener(listener)
    val query =
      try stream.writeStream
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val scored = graft.operators.Dsir.scoreAgainst(
            batch, stats, id, text, buckets)
          Merge.upsertParquet(batch.sparkSession, outPath, scored,
            id, Merge.Ignore, "n_feats")
          ()
        }
        .start()
      catch { case t: Throwable =>
        streams.removeListener(listener)
        stats.unpersist(blocking = false)
        throw t
      }
    qid = query.id
    if (!query.isActive) { // terminated before qid was visible to the listener
      stats.unpersist(blocking = false)
      streams.removeListener(listener)
    }
    query
  }

  /** Streaming cohort retention — the dashboard deployment of q116: each
    * micro-batch folds into a persistent (user, week) ACTIVITY registry
    * (keyed first-write-wins upsert on the pair — replay-safe and
    * idempotent under any chunking), and the retention matrix is served
    * on demand by [[cohortRetentionFromRegistry]] over the registry
    * alone. Unlike the pure-function twins, cohort state is genuinely
    * CROSS-BATCH (a user's first-seen week moves if an earlier week
    * arrives later) — keeping the registry at (user, week) granularity
    * (calendar-bounded per user) rather than materializing cohorts makes
    * the fold order-independent, so stream ≡ batch holds under ANY
    * arrival order, not just time-ordered chunks.
    */
  def streamingCohortActivity(stream: DataFrame, checkpointDir: String,
                              registryPath: String, user: String,
                              tsUs: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = batch.select(col(user).as("user_key"),
            expr(graft.operators.Cohorts.weekFloorSql(tsUs)).as("wk"))
          .distinct()
          .withColumn("_key", concat(col("user_key"), lit(":"), col("wk")))
        Merge.upsertParquet(batch.sparkSession, registryPath, pairs,
          "_key", Merge.Ignore, "wk")
        ()
      }
      .start()

  /** Streaming incremental connected components — the deployment shape
    * of q120: each micro-batch of edges folds into a persistent
    * (node → label) registry via
    * [[graft.operators.Components.updateRegistry]] (contract to
    * component representatives, CC the batch-bounded contracted graph,
    * broadcast-relabel), and the q118 component view is served on demand
    * by [[componentsFromRegistry]]. Unlike the append-only gram/block
    * registries, CC labels MUTATE on merge, so the commit is a snapshot
    * [[Merge.replaceParquet]] tmp+swap, not an upsert. Replay safety: an
    * already-folded batch contracts to self-loops and relabels nothing
    * (the [[graft.operators.Components]] idempotence contract), so a
    * crash-replayed micro-batch converges to the same registry (T6).
    * Each micro-batch runs through
    * [[graft.operators.Components.foldIntoParquet]], which releases the
    * fold's own checkpoint blocks after the commit — a stream folding
    * thousands of batches holds steady storage memory.
    */
  def streamingComponents(stream: DataFrame, checkpointDir: String,
                          registryPath: String, a: String, b: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Components.foldIntoParquet(
          batch.sparkSession, registryPath, batch, a, b)
        ()
      }
      .start()

  /** The q118/q120 component view served from a [[streamingComponents]]
    * registry. */
  def componentsFromRegistry(spark: SparkSession,
                             registryPath: String): DataFrame =
    graft.operators.Components.components(spark.read.parquet(registryPath))

  /** Streaming N-step funnel — the live deployment of
    * [[graft.operators.Funnel.funnelN]] (q119/q122). Spark cannot chain
    * multiple `flatMapGroupsWithState` stages in one query, so the
    * multi-hop state lives in the registry pattern instead: per funnel
    * LEVEL i < N, a (user → latest step-i event + its carried chain)
    * registry, newest-wins per user. Each micro-batch enriches hop by
    * hop — the hop's right side is `registry ∪ this batch's enriched
    * step-i rows`, so intra-batch ordering is exact (the as-of handles
    * it) and cross-batch matches need only the latest prior row per
    * user, which is precisely what the registry keeps. Final-step rows
    * land in `outPath` via keyed first-write-wins upsert.
    *
    * Arrival contract: event-time-ordered chunks, rights before lefts
    * at equal timestamps across batch boundaries (the documented
    * [[Streams.asofEnrichState]] contract) — within it, the sink is
    * EXACTLY the batch fold's output (stream ≡ batch pinned). Replay
    * safety: re-running a batch re-reads registries that may already
    * hold its rows; the union then carries duplicates that resolve to
    * the same as-of winners (greatest-tiebreak rule), the newest-wins
    * registry refold is idempotent, and the keyed upsert ignores rows
    * already landed.
    *
    * @param stepValues step i matches `typeCol === stepValues(i)`
    * @param windows    windows(i) = max age of a step-i+1 match for
    *                   step i+2 (the funnelN contract)
    */
  def streamingFunnel(stream: DataFrame, checkpointDir: String,
                      statePath: String, outPath: String, user: String,
                      time: String, id: String, typeCol: String,
                      stepValues: Seq[String], windows: Seq[Long])
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(stepValues.size >= 2, "a funnel needs >= 2 steps")
    require(windows.size == stepValues.size - 1,
      s"need one window per hop: ${stepValues.size - 1} hops, ${windows.size} windows")
    val n = stepValues.size
    def stepCol(i: Int) = s"step${i + 1}_id"
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hopPrefix = "__hop_"
        // owned block lifecycle (the Components.foldIntoParquet rule):
        // the per-level unions checkpoint eagerly; release exactly what
        // this batch added once everything has materialized
        val before = spark.sparkContext.getPersistentRDDs.keySet
        try {
          var rightRows: DataFrame = null
          for (i <- 0 until n) {
            val stepEvents = batch.filter(col(typeCol) === stepValues(i))
              .select(col(user), col(time).cast("long").as(time),
                col(id).cast("long").as(stepCol(i)))
            val enriched =
              if (i == 0) stepEvents
              else {
                val carryCols = (0 until i).map(stepCol)
                carryCols.foldLeft(
                  graft.operators.AsOf.backward(stepEvents, rightRows,
                      Seq(user), time, tiebreak = stepCol(i - 1),
                      carry = carryCols, prefix = hopPrefix,
                      maxAge = Some(windows(i - 1)))
                    .drop(s"${hopPrefix}age"))(
                  (df, c) => df.withColumnRenamed(hopPrefix + c, c))
              }
            if (i < n - 1) {
              // Next hop's right side = prior registry (latest per user,
              // enough for cross-batch matches under ordered arrival)
              // ∪ ALL of this batch's step-i rows (an intra-batch left
              // may need an OLDER same-batch right — the collapsed
              // registry alone would lose it). Checkpointed EAGERLY so
              // its lineage detaches from the parquet files the swap
              // below replaces; the registry fold then collapses the
              // same union newest-wins per user (ties to the greatest
              // id — the as-of's duplicate-right rule).
              val lvlPath = s"$statePath/level$i"
              val hPath = new Path(lvlPath)
              val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
              val prior =
                if (fs.exists(hPath) && fs.listStatus(hPath).nonEmpty)
                  spark.read.parquet(lvlPath)
                else spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  enriched.schema)
              val union = prior.select(enriched.columns.map(col).toIndexedSeq: _*)
                .unionByName(enriched)
                .localCheckpoint(true)
              Merge.replaceParquet(spark, lvlPath,
                graft.operators.Dedup.newestWins(union, Seq(col(user)),
                  col(time), col(stepCol(i))))
              rightRows = union
            } else {
              Merge.upsertParquet(spark, outPath, enriched, stepCol(n - 1),
                Merge.Ignore, stepCol(n - 1))
            }
          }
        } finally {
          spark.sparkContext.getPersistentRDDs
            .filterNot { case (rid, _) => before(rid) }
            .values.foreach(_.unpersist(blocking = false))
        }
        ()
      }
      .start()
  }

  /** The q116 retention matrix served from a
    * [[streamingCohortActivity]] registry. */
  def cohortRetentionFromRegistry(spark: SparkSession,
                                  registryPath: String): DataFrame =
    graft.operators.Cohorts.retention(
      spark.read.parquet(registryPath)
        .select(col("user_key").as("user_id"),
          (col("wk") * graft.operators.Cohorts.WeekUs).as("ts_us")),
      "user_id", "ts_us")

  /** Streaming span-corruption example construction — the example-prep
    * deployment shape of q111: each arriving micro-batch of documents is
    * rendered to (inputs, targets) denoising examples
    * ([[graft.operators.SpanCorrupt.examples]] — the mask is a pure
    * hash of (doc, pos), so no cross-batch state exists at all) and
    * landed via keyed first-write-wins upsert. Replay-safe for free
    * (the [[streamingLmScore]] reasoning: pure function + Ignore
    * upsert).
    */
  def streamingSpanCorrupt(stream: DataFrame, checkpointDir: String,
                           outPath: String, id: String, text: String,
                           ratePm: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ex = graft.operators.SpanCorrupt.examples(batch, id, text, ratePm)
        Merge.upsertParquet(batch.sparkSession, outPath, ex,
          id, Merge.Ignore, "n_tokens")
        ()
      }
      .start()

  /** Streaming BPE segmentation — the tokenizer-ENCODE deployment shape
    * of q106 (verdict r10 item 7): the merge table is trained ONCE (the
    * q105 contract — rules frozen, captured by the closure) and each
    * micro-batch segments only its PREVIOUSLY-UNSEEN words: the batch's
    * distinct vocabulary anti-joins the sink (the [[streamingSpanDedup]]
    * registry pattern) and [[graft.operators.Bpe.applyMerges]] runs over
    * the fresh words alone, appending (w, pieces, n_pieces). Per-batch
    * cost is therefore ∝ NEW vocabulary, not batch size — at 100 TB the
    * arriving token stream is huge but its unseen-word tail is the
    * Zipf remainder, exactly what an online tokenizer wants to pay for.
    *
    * Replay safety (T6): segmentation is a pure function of
    * (word, rules), so a replayed batch anti-joins to an empty fresh set
    * (its words are already in the sink) and appends nothing; any
    * chunking of the vocabulary lands the same rows as one batch
    * (StreamBatchEquivalenceSpec pins stream ≡ Bpe.applyMerges over the
    * full distinct vocabulary).
    */
  def streamingBpeSegment(stream: DataFrame, checkpointDir: String,
                          outPath: String, word: String,
                          merges: Seq[(String, String)])
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val seen = readSeenWords(spark, outPath)
        val fresh = batch.select(col(word).as("w")).distinct()
          .join(seen, Seq("w"), "left_anti")
        // skip the empty append (the saturated-vocabulary steady state —
        // nearly every batch once the Zipf head is seen): it would still
        // commit one schema-only part file per batch, the small-file
        // decay the curriculum stream learned the hard way
        if (!fresh.isEmpty)
          graft.operators.Bpe.applyMerges(fresh, "w", merges)
            .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** Streaming CDC dedup — [[streamingSpanDedup]]'s twin at
    * content-defined granularity (q131): each micro-batch of documents
    * is CDC-chunked and checked against the persistent chunk-hash
    * registry ([[graft.operators.Chunk.cdcDedupAgainst]]), per-doc
    * contributions land via keyed first-write-wins upsert, and the
    * batch's novel distinct chunk hashes append to the registry. Same
    * replay-safe write order (documents FIRST, registry second). The
    * shift-invariant boundaries are what make this the RE-CRAWL dedup:
    * an edited document re-contributes only its edited chunks, where
    * the fixed-block registry would see every block as new.
    */
  def streamingCdcDedup(stream: DataFrame, checkpointDir: String,
                        outPath: String, registryPath: String,
                        id: String, text: String, divisor: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val reg = readStringColOrEmpty(spark, registryPath, "chunk_hash")
        val fresh = graft.operators.Chunk.cdcDedupAgainst(
          batch, reg, id, text, divisor)
        Merge.upsertParquet(spark, outPath, fresh,
          id, Merge.Ignore, "n_chunks")
        graft.operators.Chunk.contentDefined(batch, id, text, divisor)
          .select(col("chunk_hash")).distinct()
          .join(reg, Seq("chunk_hash"), "left_anti")
          .write.mode("append").parquet(registryPath)
        ()
      }
      .start()

  /** Streaming IVF-PQ index ingest — the missing ONLINE half of the
    * q92/q97 production ANN stack: coarse centroids and codebooks are
    * trained once (frozen in the closure, the q97 fixed-sample
    * contract), and each arriving vector micro-batch is cell-assigned +
    * PQ-encoded against them and APPENDED to the materialized (cell,
    * code) index — previously-indexed ids are dropped by an index
    * anti-join, so replays (T6) and re-crawled vectors land exactly
    * once. Per-batch cost ∝ batch size (assignment is |batch|·|cells|
    * dots, encoding |batch|·PqSub·PqK); the index grows append-only and
    * [[graft.operators.Similarity.ivfPqTopKIndexed]] serves searches
    * against any committed prefix — ingest never blocks search, the
    * standard ANN-serving split.
    */
  def streamingIndexIngest(stream: DataFrame, checkpointDir: String,
                           indexPath: String, centroids: DataFrame,
                           id: String, vec: String,
                           codebook: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
                             graft.operators.Similarity.pqCodebook)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val seen = readIndexedIds(spark, indexPath)
        val fresh = batch
          .join(seen.withColumnRenamed("cid", id), Seq(id), "left_anti")
        graft.operators.Similarity
          .buildIvfPqIndex(fresh, centroids, id, vec, codebook)
          .write.mode("append").parquet(indexPath)
        ()
      }
      .start()

  /** Streaming lexical-index ingest — [[streamingIndexIngest]]'s twin
    * for the BM25 postings registry (the q157/q162 serve family): each
    * arriving doc micro-batch is tokenized ONCE into its postings
    * aggregate ([[graft.operators.TermStats.bm25Postings]]) and appended
    * to the materialized (doc, term, tf) registry; already-indexed doc
    * ids are dropped by a registry anti-join, so replays (T6) land
    * exactly once. Every BM25 statistic is additive over the registry,
    * so [[graft.operators.TermStats.bm25TopKFromPostings]] serves ranked
    * retrieval against any committed prefix without re-tokenizing a
    * single standing doc — ingest cost ∝ batch tokens, and ingest never
    * blocks serve (the same split the dense twin makes).
    */
  def streamingPostingsIngest(stream: DataFrame, checkpointDir: String,
                              registryPath: String, id: String, text: String,
                              minTermLen: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val seen = readLongColOrEmpty(spark, registryPath, "doc")
          .withColumnRenamed("doc", id).distinct()
        graft.operators.TermStats
          .bm25Postings(batch.join(seen, Seq(id), "left_anti"),
            id, text, minTermLen)
          .write.mode("append").parquet(registryPath)
        ()
      }
      .start()

  /** Streaming split assignment — q164's deployment shape with a GROWING
    * registry: the registry directories hold minhash signatures
    * (`sigsPath`: doc, sig) and split keys (`labelsPath`: edoc, cluster)
    * — seed them from the standing corpus (its sigs + its q43 cluster
    * labels). Each arriving doc micro-batch is signature-matched against
    * the registry ([[graft.operators.TextDedup.lshCandidatePairsAgainst]]
    * — registry×registry pairs never form); a match INHERITS the min
    * matched split key, an unmatched doc hash-assigns by its own id, and
    * the batch then JOINS the registry (its sigs appended, each doc's
    * final `skey` its label) so a later arrival that near-dups it
    * inherits too — the property the frozen-standing batch form (q164)
    * cannot give. Replays (T6) are dropped by the assignment anti-join
    * before any registry write. Honest scope, matching q164's scaladoc:
    * near-dups WITHIN one micro-batch assign independently (incoming
    * pairs never form), and inheritance never merges registry clusters a
    * new doc bridges.
    */
  def streamingSplitAssign(stream: DataFrame, checkpointDir: String,
                           outPath: String, sigsPath: String,
                           labelsPath: String, id: String, text: String,
                           shingleK: Int, numHashes: Int, bands: Int,
                           minSigEqual: Int,
                           splits: Seq[(String, Int)], salt: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val assigned = readLongColOrEmpty(spark, outPath, id).distinct()
        val fresh = batch.join(assigned, Seq(id), "left_anti")
          .localCheckpoint(true) // two registry writes + the assignment read it
        val bSigs = graft.operators.TextDedup.minhashSignatures(
            fresh, id, text, shingleK, numHashes)
          .localCheckpoint(true)
        val out = splitAssignAgainst(fresh, bSigs,
            spark.read.parquet(sigsPath), spark.read.parquet(labelsPath),
            id, numHashes, bands, minSigEqual, splits, salt)
          .localCheckpoint(true) // two sink writes read it; don't re-run the LSH join
        // REGISTRIES FIRST, assignment sink LAST — the dl-last pattern:
        // outPath is the replay guard (the anti-join above), so a crash
        // after it but before the registry appends would permanently omit
        // the batch from the inheritance registry and later near-dups of
        // those docs would hash-assign independently — the exact leakage
        // this operator exists to prevent. With the guard last, a crash
        // replays the whole batch: the deterministic recompute re-appends
        // byte-identical sigs/labels rows, and the inherit path collapses
        // duplicates harmlessly (candidate pairs dedupe through the
        // groupBy-min; label fanout can't move a min).
        bSigs.write.mode("append").parquet(sigsPath)
        out.select(col(id).as("edoc"), col("skey").as("cluster"))
          .write.mode("append").parquet(labelsPath)
        out.select(col(id), col("inherited"), col("skey"), col("split"))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** [[streamingSplitAssign]]'s per-batch core, shared with the splitreg
    * scale probe: match a batch (rows + precomputed signatures) against
    * the registry's signature and split-key tables and assign every
    * batch row a split (inherit min matched key, else own-id hash).
    */
  private[graft] def splitAssignAgainst(fresh: DataFrame, bSigs: DataFrame,
                                        standingSigs: DataFrame,
                                        labels: DataFrame, id: String,
                                        numHashes: Int, bands: Int,
                                        minSigEqual: Int,
                                        splits: Seq[(String, Int)],
                                        salt: String): DataFrame = {
    val pairs = graft.operators.TextDedup.lshCandidatePairsAgainst(
        bSigs, standingSigs, numHashes, bands)
      .filter(col("n_sig_equal") >= minSigEqual)
    // the Against form canonicalizes (min, max); batch membership
    // recovers the sides
    val sided = pairs
      .join(bSigs.select(col("doc").as("doc_a"), lit(true).as("a_is_batch")),
        Seq("doc_a"), "left_outer")
      .select(
        when(col("a_is_batch"), col("doc_a")).otherwise(col("doc_b")).as(id),
        when(col("a_is_batch"), col("doc_b")).otherwise(col("doc_a")).as("edoc"))
    val inherit = sided
      .join(labels, Seq("edoc"), "left_outer")
      .withColumn("ekey", coalesce(col("cluster"), col("edoc")))
      .groupBy(col(id)).agg(min(col("ekey")).as("ckey"))
    graft.operators.Sampling.hashSplit(
      fresh.join(inherit, Seq(id), "left_outer")
        .withColumn("inherited", col("ckey").isNotNull)
        .withColumn("skey", coalesce(col("ckey"), col(id))),
      "skey", salt, splits)
  }

  /** The index's id column, empty-safe before the first batch commits.
    * Long-typed (vector ids), so it gets its own reader rather than
    * widening [[readStringColOrEmpty]].
    */
  private def readIndexedIds(spark: SparkSession, indexPath: String): DataFrame =
    readLongColOrEmpty(spark, indexPath, "cid")

  /** One long-typed column of a registry/index table, empty-safe before
    * the first batch commits (shared by the dense `cid` and lexical
    * `doc` ingest twins).
    */
  private def readLongColOrEmpty(spark: SparkSession, path: String,
                                 colName: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      spark.read.parquet(path).select(colName)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(colName,
          org.apache.spark.sql.types.LongType))))
  }

  /** Streaming chunker — q125's deployment shape: each micro-batch of
    * documents fans out to its token windows
    * ([[graft.operators.Chunk.tokenWindows]], stateless — the one
    * pipeline stage that needs NO registry) and upserts the sink on the
    * composite (doc, chunk_idx) key with first-wins semantics, so a
    * replayed batch (T6) rewrites identical rows instead of duplicating
    * them. A re-ingested doc whose text CHANGED keeps its old chunks
    * under Ignore — matching the exactly-once contract of the other
    * twins, where a key's first landing is authoritative.
    */
  def streamingChunk(stream: DataFrame, checkpointDir: String,
                     outPath: String, id: String, text: String,
                     size: Int, overlap: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ch = graft.operators.Chunk.tokenWindows(batch, id, text, size, overlap)
          .withColumn("chunk_id",
            concat(col(id), lit(":"), col("chunk_idx")))
        Merge.upsertParquet(batch.sparkSession, outPath, ch,
          "chunk_id", Merge.Ignore, "n_tok")
        ()
      }
      .start()

  /** Streaming unigram segmentation — [[streamingBpeSegment]]'s twin for
    * the OTHER tokenizer family (q128): the scored vocabulary is trained
    * once ([[graft.operators.Unigram.trainVocab]], frozen in the
    * closure) and each micro-batch Viterbi-segments only its
    * previously-unseen words (sink anti-join), appending
    * (w, n_pieces, score, pieces). Same deployment economics: per-batch
    * cost ∝ new vocabulary (the Zipf tail), not the token stream; same
    * T6 replay safety (segmentation is a pure function of (word, vocab),
    * a replayed batch appends nothing; StreamBatchEquivalenceSpec pins
    * stream ≡ [[graft.operators.Unigram.segment]] over the full distinct
    * vocabulary).
    */
  def streamingUnigramSegment(stream: DataFrame, checkpointDir: String,
                              outPath: String, word: String,
                              vocab: Seq[(String, Long)], maxLen: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val seen = readSeenWords(spark, outPath)
        val fresh = batch.select(col(word).as("w")).distinct()
          .join(seen, Seq("w"), "left_anti")
        // saturated-vocabulary steady state: skip the schema-only append
        // (same rationale as streamingBpeSegment)
        if (!fresh.isEmpty)
          graft.operators.Unigram.segment(fresh, "w", vocab, maxLen)
            .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** The segmented-word sink's key column, empty-safe before the first
    * batch commits.
    */
  private def readSeenWords(spark: SparkSession, outPath: String): DataFrame =
    readStringColOrEmpty(spark, outPath, "w")

  /** The block registry, empty-safe before the first batch commits. */
  private def readRegistry(spark: SparkSession, registryPath: String): DataFrame =
    readStringColOrEmpty(spark, registryPath, "blk")

  /** The follower/backfill driver. `source` must yield rows with a
    * monotonically increasing `heightCol`; `currentHeight` is re-read per
    * epoch.
    *
    * Scale note: each chunk is one bounded filter over the source (at
    * production scale a partition-pruned scan: height/time IS the partition
    * key, X1) feeding keyed-upsert sinks — the driver holds no data, only
    * the two longs of the range.
    */
  final class Driver(spark: SparkSession, source: () => DataFrame,
                     heightCol: String, stateDir: String, sinkDir: String,
                     chunkSize: Long, minDiff: Long,
                     dynamics: Seq[DynamicCollection],
                     snapshots: Seq[SnapshotCollection]) {

    val checkpoint = new Checkpoint(spark, stateDir)

    /** Max height, or None on an EMPTY source (bootstrap-before-data, or
      * a source truncated between epochs) — `max` over zero rows is a
      * null cell, and the old `.getLong(0)` NPE'd the polling loop
      * instead of letting the epoch report itself as a gated no-op.
      */
    def currentHeight(): Option[Long] = {
      val r = source().agg(max(col(heightCol))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }

    def sinkPath(name: String): String = s"$sinkDir/$name"

    /** One epoch: gate on minDiff (T2), chunked dynamic sync (T1/E2),
      * snapshot refresh (T3), then advance the mark.
      */
    def runEpoch(): EpochReport = {
      val cur = currentHeight() match {
        case Some(h) => h + 1 // exclusive upper bound
        case None => // empty source: nothing to sync, report a no-op
          val from0 = checkpoint.read().getOrElse(0L)
          return EpochReport(ran = false, from0, from0, 0)
      }
      val from = checkpoint.read().getOrElse(0L)
      if (cur - from < minDiff) return EpochReport(ran = false, from, cur, 0)
      val ranges = chunkRanges(from, cur, chunkSize)
      // LSM shape (see Merge's delta-log section): each chunk APPENDS a
      // delta — O(chunk), no read of the growing sink — and the whole-sink
      // first-write-wins fold runs ONCE per epoch instead of once per
      // chunk. Sequential per-chunk upserts paid O(chunks · sink) per
      // epoch; the fold's precedence (earliest delta wins under Ignore)
      // reproduces that sequence's end state exactly (MergeSpec-pinned).
      // A crashed epoch leaves orphan deltas + an unadvanced checkpoint;
      // the re-run re-appends the same chunks and the fold resolves the
      // duplicates identically (T6 idempotence, unchanged).
      ranges.foreach { case (lo, hi) =>
        val chunk = source().filter(col(heightCol) >= lo && col(heightCol) < hi)
        dynamics.foreach { d =>
          d.heightBucket match {
            case Some(width) =>
              // steady-state path: the chunk rewrites ONLY its own height
              // partitions — no delta log, no epoch fold
              Merge.upsertPartitionedByHeight(spark, sinkPath(d.name),
                d.extract(chunk), d.key, Merge.Ignore, d.tiebreak,
                heightCol, width)
            case None =>
              Merge.appendDelta(spark, sinkPath(d.name), d.extract(chunk))
          }
        }
      }
      dynamics.filter(_.heightBucket.isEmpty).foreach { d =>
        Merge.finalizeDeltas(spark, sinkPath(d.name), d.key, Merge.Ignore,
          d.tiebreak)
      }
      snapshots.foreach { s =>
        Merge.upsertParquet(spark, sinkPath(s.name), s.build(spark),
          s.key, Merge.Update, s.tiebreak) // full refresh: incoming wins
      }
      checkpoint.write(cur)
      EpochReport(ran = true, from, cur, ranges.size)
    }
  }

  /** Streaming curriculum (the q188 registry fold driven by a stream):
    * each micro-batch extends the materialized training order —
    * watermark from the CURRENT registry size via `servedOf` (the
    * serving process's progress policy), arrivals appended to each
    * source's key ladder, only the unserved tail re-ranked
    * ([[graft.operators.Ranks.extendRegistry]]). The registry mutates
    * wholesale (tail POSITIONS move — an upsert can't express that), so
    * the write is [[Merge.replaceParquet]]'s snapshot swap, never an
    * append. Replay-safe (T6): already-registered ids anti-join away, and
    * an empty fresh set re-derives the identical order — a replayed
    * micro-batch swaps in the same bytes.
    */
  def streamingCurriculum(stream: DataFrame, checkpointDir: String,
                          registryPath: String, group: String, id: String,
                          salt: String, weights: Map[String, Int],
                          servedOf: Long => Long, nBuckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hPath = new Path(registryPath)
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val next =
          if (!fs.exists(hPath))
            graft.operators.Ranks.orderRegistry(batch, group, id, salt,
                weights, nBuckets)
              .withColumn("frozen", lit(false))
          else {
            val reg = spark.read.parquet(registryPath)
            val fresh = batch.join(reg.select(col(id)), Seq(id), "left_anti")
            graft.operators.Ranks.extendRegistry(reg, fresh, group, id, salt,
              weights, servedOf(reg.count()), nBuckets)
          }
        // replaceParquet materializes into a temp dir before any rename,
        // so next's lineage reading registryPath is safe by contract
        Merge.replaceParquet(spark, registryPath, next)
        ()
      }
      .start()

  private def readableParquet(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Reader for [[streamingCurriculumSegmented]]'s layout: the logical
    * registry is `frozen/` (append-only graduated segments) ∪ `tail/`
    * (the live unserved remainder), with the tail read SHADOWED behind
    * the frozen high-water position. The shadow is the crash-safety
    * device: a failure between the frozen append and the tail swap
    * leaves the freshly graduated prefix duplicated in the stale tail,
    * but graduated positions are FINAL by the extendRegistry contract,
    * so the duplicates carry identical `pos` values and the
    * `pos > hwm` filter drops exactly them — the layout self-heals on
    * the next read instead of tripping the ladder-contiguity validation.
    */
  def curriculumRegistry(spark: SparkSession, registryPath: String,
                         pos: String = "pos"): DataFrame = {
    val frozenPath = s"$registryPath/frozen"
    val tailPath = s"$registryPath/tail"
    val frozen = if (readableParquet(spark, frozenPath))
      Some(spark.read.parquet(frozenPath)) else None
    val tail = if (readableParquet(spark, tailPath))
      Some(spark.read.parquet(tailPath)) else None
    (frozen, tail) match {
      case (Some(f), Some(t)) =>
        // one column-pruned scan of the frozen segments for the hwm. A
        // zero-row frozen/ is reachable (an append of an empty frame
        // leaves a schema-only part file; guarded at the writer now, but
        // directories written before that guard — or by a crash mid-
        // append — must still read): NULL max ⇒ degrade to tail-only
        // instead of NPE-wedging every subsequent batch AND its replay.
        val hwmRow = f.agg(max(col(pos))).head
        if (hwmRow.isNullAt(0)) t
        else f.unionByName(t.filter(col(pos) > hwmRow.getLong(0)))
      case (Some(f), None) => f
      case (None, Some(t)) => t
      case (None, None) => throw new IllegalStateException(
        s"no curriculum registry at $registryPath (neither frozen/ nor tail/)")
    }
  }

  /** [[streamingCurriculum]] with the write amplification fixed — the
    * curriculum analog of the other registry families' on-cadence
    * compaction. The monolithic form snapshot-swaps the WHOLE registry
    * every micro-batch (O(registry) writes for an O(tail) change); here
    * rows graduate into `frozen/` exactly once when the watermark passes
    * them (their positions are final — extendRegistry passes the served
    * prefix through verbatim) and only `tail/` is swap-replaced, so
    * per-batch write cost is O(newly-served + unserved tail + batch),
    * independent of how much history has accumulated. Read cost per
    * batch stays O(registry) in the stats aggregate — column-pruned over
    * append-only segments — matching the curreg probe's flat per-step
    * curve. Write ORDER is graduation append first, tail swap second: a
    * crash in between duplicates the graduated prefix in the stale tail,
    * which [[curriculumRegistry]] shadows out (see there); the reverse
    * order would LOSE rows. Replay-safe like the monolithic form:
    * already-registered ids anti-join away and re-derive identical
    * positions.
    */
  def streamingCurriculumSegmented(stream: DataFrame, checkpointDir: String,
                                   registryPath: String, group: String,
                                   id: String, salt: String,
                                   weights: Map[String, Int],
                                   servedOf: Long => Long, nBuckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val frozenPath = s"$registryPath/frozen"
        val tailPath = s"$registryPath/tail"
        if (!readableParquet(spark, frozenPath) &&
            !readableParquet(spark, tailPath)) {
          Merge.replaceParquet(spark, tailPath,
            graft.operators.Ranks.orderRegistry(batch, group, id, salt,
              weights, nBuckets))
        } else {
          val reg = curriculumRegistry(spark, registryPath)
          val fresh = batch.join(reg.select(col(id)), Seq(id), "left_anti")
          // two consumers (graduation append, tail swap) — persist so the
          // re-rank runs once; lineage is already cut from tail/ by
          // extendRegistry's eager checkpoint
          val next = graft.operators.Ranks.extendRegistry(reg, fresh, group,
              id, salt, weights, servedOf(reg.count()), nBuckets)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // NULL max = schema-only frozen/ (see curriculumRegistry):
            // treat as "nothing graduated yet", not an NPE
            val gradFloor = if (readableParquet(spark, frozenPath)) {
              val r = spark.read.parquet(frozenPath).agg(max(col("pos"))).head
              if (r.isNullAt(0)) 0L else r.getLong(0)
            } else 0L
            val grads = next.filter(col("frozen") && col("pos") > gradFloor)
              .drop("frozen")
            // skip the append when NOTHING graduated this batch (e.g. the
            // watermark hasn't passed pos 1 on a tiny first batch): an
            // empty append still writes a schema-only .parquet part, which
            // flips readableParquet(frozen) to true with 0 rows — the
            // exact shape the NULL-max guards above exist for. Don't
            // create it in the first place.
            if (!grads.isEmpty)
              grads.write.mode("append").parquet(frozenPath)
            Merge.replaceParquet(spark, tailPath,
              next.filter(!col("frozen")).drop("frozen"))
          } finally { next.unpersist(); () }
        }
        ()
      }
      .start()

  /** The impact-index registry's layout: `postings/` + `dl/` (append-only
    * — BM25's stats are additive over disjoint doc ids), `stats/` +
    * `corpus/` (append-only ADDITIVE delta logs: per-batch df increments
    * per term, and one (n_docs, a_tok) row per batch — the materialized
    * rollups the zipfreg probe proved are the only flat serve curve;
    * re-deriving them from the full postings/dl registries per serve
    * call converges to rebuild cost, SCALE.md zipfreg), `impact/` (the
    * truncated index, carrying `dl` so per-term re-ranking never
    * rejoins), `meta/` (one row: the depth the standing index was built
    * at, and the doc count it was calibrated against), and `inflight/`
    * (the current batch's (doc, term, tf, dl) snapshot, swap-replaced
    * per batch — the lineage-severed frame the steady-state merge arm
    * reads so it never scans the postings registry; see
    * [[impactBatchIngest]]).
    *
    * Crash contract (the write order is postings → stats → corpus → dl →
    * impact swap → meta swap): a batch is DURABLE once its dl append
    * committed — dl is the seen-doc set the replay anti-join reads, so a
    * crash any earlier replays the whole batch. A replayed batch can
    * re-append rows its crashed predecessor already committed (dl
    * hadn't, so the docs still read as fresh); those are EXACT duplicate
    * rows — postings rows are per-(doc, term) aggregates of a
    * deterministic tokenizer, and every stats/corpus delta carries
    * `dkey` = min fresh doc id, which discriminates batches (durable
    * fresh sets are disjoint, and a min is a member, so two batches
    * can never share one) while a replay re-derives the identical key —
    * and every reader in this family collapses them where its OWN
    * volume lives: the serve on the query footprint (the post-join
    * distinct in `TermStats.rescoreCandidates` — never a full-registry
    * pass), the stats/corpus sums on the O(batches) delta logs
    * ([[impactIndexStats]]), and [[compactImpactRegistry]] folds them
    * out of the raw files on the fold cadence, the Merge delta-log
    * convention.
    * The impact/meta swaps are atomic ([[Merge.replaceParquet]]) and
    * recomputed idempotently from the registries, never from in-flight
    * frames.
    */
  def impactIndexRegistry(spark: SparkSession, registryPath: String)
      : DataFrame = spark.read.parquet(s"$registryPath/impact")

  /** The registry-derived serve inputs for
    * [[graft.operators.TermStats.bm25TopKImpact]]: `(postings, dfreq,
    * dl, corpus)` — postings/dl handed back as RAW LAZY frames (they
    * may carry byte-identical crash-replay duplicates until the next
    * compaction; the impact serve touches them only through keyed
    * candidate joins and heals them on the query footprint —
    * `TermStats.rescoreCandidates`'s post-join distinct. The pre-r19
    * form healed here with a full-registry `distinct()` per serve call:
    * an all-columns HashAggregate + Exchange over the ENTIRE postings
    * registry UPSTREAM of the doc-keyed join that would have shrunk it
    * to Σ_cand dl(doc) rows — VERDICT r18 #1, the same
    * O(registry)-in-O(query)-clothing class the stats logs removed from
    * ingest. A consumer that needs healed RAW frames for something
    * other than the keyed serve — e.g. a full-corpus audit via
    * `bm25TopKFromIndex` against a possibly-uncompacted registry —
    * runs [[compactImpactRegistry]] first or distincts its own read);
    * dfreq/corpus read from the MATERIALIZED `stats/`/`corpus/` delta
    * logs (distinct-healed, summed — O(batches·batch_vocab) rows,
    * corpus-size-independent), never re-derived from the full postings
    * registry: the per-serve `postings.groupBy(term)` rollup this
    * replaces is the "postings-only halfway house" the zipfreg probe
    * measured decaying to rebuild cost (19.2 s vs 3.1 s flat at 16×,
    * SCALE.md).
    *
    * Registries written before the stats artifacts existed (or built by
    * hand from postings+dl) fall back to the one-scan rollup — the
    * compat arm, not the production path, and it WARNS (a lost or
    * mis-deployed stats log would otherwise silently pay the decayed
    * zipfreg curve forever); the first [[impactBatchIngest]] against
    * such a registry backfills the logs from the durable registry state
    * and resumes the additive path.
    *
    * Crash-window staleness contract: a serve issued BETWEEN a batch's
    * crash and its replay may see that batch's postings/stats/corpus
    * deltas without its dl rows (dl is the last append) — candidates
    * rescore only against docs present in dl (the score join is inner),
    * so no phantom doc can be returned, while df/corpus read at most
    * one partial batch ahead; the replay converges them. This window
    * existed identically in the pre-r18 rollup form (postings appended
    * before dl there too) — stated here because the materialized logs
    * make it look new. A serve issued between a retention crash and its
    * re-run can additionally read retired docs' stale deltas — that
    * state is MARKED on disk and warned about here; see
    * [[retainImpactRegistry]]'s intent marker.
    */
  def impactIndexStats(spark: SparkSession, registryPath: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // NO healSwap here: this is the READ path, and serves may run
    // concurrently with a maintainer's commitSwap — a reader racing the
    // writer's rename pair could steal or delete its siblings. Torn-swap
    // repair belongs to the single-writer maintainers (ingest/compact/
    // retention); a serve that lands inside the torn window reads the
    // missing-artifact state it would have read pre-heal (stats/corpus
    // fall back with a warning; postings/dl fail loudly).
    if (retentionPending(spark, registryPath))
      graft.Log.warn(s"impactIndexStats: $registryPath has an incomplete " +
        "retention (intent marker present) — df/corpus may still count " +
        "retired docs until retainImpactRegistry is re-run")
    val postings = spark.read.parquet(s"$registryPath/postings")
    val dl = spark.read.parquet(s"$registryPath/dl")
    val dfreq =
      if (readableParquet(spark, s"$registryPath/stats"))
        spark.read.parquet(s"$registryPath/stats").distinct()
          .groupBy(col("term")).agg(sum(col("df")).as("df"))
      else {
        graft.Log.warn(s"impactIndexStats: $registryPath/stats missing — " +
          "pre-stats compat arm re-rolls df from the FULL postings " +
          "registry per serve call (the zipfreg decay); run " +
          "impactBatchIngest once to backfill the delta logs")
        postings.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
      }
    val corpus =
      if (readableParquet(spark, s"$registryPath/corpus"))
        spark.read.parquet(s"$registryPath/corpus").distinct()
          .agg(sum(col("n_docs")).as("n_docs"), sum(col("a_tok")).as("a_tok"))
      else {
        graft.Log.warn(s"impactIndexStats: $registryPath/corpus missing — " +
          "pre-stats compat arm recounts (n_docs, a_tok) from the FULL dl " +
          "registry per serve call; run impactBatchIngest once to " +
          "backfill the delta logs")
        dl.distinct().agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).as("a_tok"))
      }
    (postings, dfreq, dl, corpus)
  }

  /** True while a [[retainImpactRegistry]] intent marker is on disk — a
    * retention started and has not yet completed (crash window). See
    * the marker contract there.
    */
  def retentionPending(spark: SparkSession, registryPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$registryPath/retain_intent")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Publish the impact registry's SERVE artifacts as bucketed catalog
    * tables — the 100 TB serving layout (SCALE.md zipfbucket): once the
    * candidate set of a serve batch outgrows the broadcast threshold
    * (deep calibrated m × many queries), the doc-keyed rescore joins
    * plan as sort-merge and shuffle BOTH sides, so a plain-parquet
    * registry re-shuffles its corpus-proportional postings/dl frames
    * per serve batch. Published doc-bucketed (postings, dl) and
    * term-bucketed (impact), the registry side arrives pre-partitioned
    * and only the candidate side (∝ query footprint) shuffles —
    * measured −2 exchanges / −37% wall at the probe's 64× rung.
    *
    * A SNAPSHOT republication, not a maintainer: O(registry) per call,
    * run on the compaction cadence (or per epoch) like
    * [[compactImpactRegistry]] — the bucketed write IS the shuffle the
    * serve then never pays, amortized over every serve batch until the
    * next publish. Rows are distinct-healed on the way out (the tables
    * are read raw by the serve; `rescoreCandidates`' footprint heal
    * stays correct but should have nothing to do). The tiny
    * `stats/`/`corpus/` delta logs are NOT published — serve them from
    * the registry as always ([[impactIndexStats]]).
    *
    * Serve: `bm25TopKImpact(spark.table(s"${prefix}_impact"),
    * spark.table(s"${prefix}_postings"), dfreq,
    * spark.table(s"${prefix}_dl"), corpus, …)` with dfreq/corpus from
    * [[impactIndexStats]]. BucketedServeSpec pins result equality and
    * that no shuffle feeds off a bare published-registry scan even
    * under a forced sort-merge plan.
    */
  def publishImpactServeTables(spark: SparkSession, registryPath: String,
                               prefix: String, buckets: Int = 32): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    for (sub <- Seq("postings", "dl", "impact"))
      Merge.healSwap(spark, s"$registryPath/$sub")
    // a crashed publish (or a fresh catalog over a surviving warehouse
    // dir — the catalog is per-session, the directory is not) leaves an
    // ORPHANED table location that CTAS refuses; clear both halves so
    // the republication is idempotent from any torn state
    def clearTable(table: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      ()
    }
    for (suffix <- Seq("postings", "dl", "impact"))
      clearTable(s"${prefix}_$suffix")
    graft.sources.Bucketing.writeBucketed(
      spark.read.parquet(s"$registryPath/postings").distinct(),
      s"${prefix}_postings", buckets, "doc")
    graft.sources.Bucketing.writeBucketed(
      spark.read.parquet(s"$registryPath/dl").distinct(),
      s"${prefix}_dl", buckets, "doc")
    graft.sources.Bucketing.writeBucketed(
      spark.read.parquet(s"$registryPath/impact"),
      s"${prefix}_impact", buckets, "term")
  }

  /** The impact registry's COMPACTION — the LSM fold the crash contract
    * defers to (see [[impactIndexRegistry]]): rewrite `postings/` and
    * `dl/` deduplicated, and FOLD the `stats/`/`corpus/` delta logs —
    * durable deltas (their `dkey` is in the dl doc set) and previously
    * folded rows (`dkey` null) collapse into one row per term / one
    * global row, while deltas of a crashed not-yet-durable batch are
    * kept verbatim so their replay still distinct-heals. After the fold
    * the per-serve healing `distinct()` runs over already-unique rows
    * and crash-replay duplicates stop accumulating. Run on the fold
    * cadence (per epoch / every N batches —
    * [[streamingImpactIndex]]'s `compactEvery` wires exactly that), not
    * per batch: one O(registry) rewrite amortized over many O(batch)
    * appends, the Merge delta-log economics. Atomic swaps; the impact/
    * and meta/ artifacts are untouched (they are recomputed snapshots,
    * never accumulating logs).
    *
    * Run it from the ingest cadence or at rest — never concurrently with
    * a crashed batch's replay (the stream's own cadence satisfies this:
    * a restart replays the wedged batch before any later batch can
    * trigger a fold).
    */
  def compactImpactRegistry(spark: SparkSession, registryPath: String): Unit = {
    for (sub <- Seq("postings", "dl", "stats", "corpus"))
      Merge.healSwap(spark, s"$registryPath/$sub")
    for (sub <- Seq("postings", "dl")) {
      val path = s"$registryPath/$sub"
      if (readableParquet(spark, path))
        Merge.replaceParquet(spark, path, spark.read.parquet(path).distinct())
    }
    val dlPath = s"$registryPath/dl"
    if (readableParquet(spark, dlPath)) {
      val durableKeys = spark.read.parquet(dlPath)
        .select(col("doc").as("dkey")).distinct()
      def fold(path: String, combine: DataFrame => DataFrame): Unit =
        if (readableParquet(spark, path)) {
          val deltas = spark.read.parquet(path).distinct()
          val dkeyType = deltas.schema("dkey").dataType
          val durable = deltas.filter(col("dkey").isNull).unionByName(
            deltas.filter(col("dkey").isNotNull)
              .join(durableKeys, Seq("dkey"), "left_semi"))
          val pending = deltas.filter(col("dkey").isNotNull)
            .join(durableKeys, Seq("dkey"), "left_anti")
          val folded = combine(durable)
            .withColumn("dkey", lit(null).cast(dkeyType))
            .select(deltas.columns.map(col).toSeq: _*)
          Merge.replaceParquet(spark, path, folded.unionByName(pending))
        }
      fold(s"$registryPath/stats",
        _.groupBy(col("term")).agg(sum(col("df")).as("df")))
      fold(s"$registryPath/corpus",
        // a global agg of ZERO durable rows yields one all-null row —
        // drop it (nothing durable to fold), where the stats groupBy
        // correctly yields no rows
        _.agg(sum(col("n_docs")).as("n_docs"), sum(col("a_tok")).as("a_tok"))
          .filter(col("n_docs").isNotNull))
    }
  }

  /** Retention for the impact registry — the T4-style sliding-window
    * story the serve contract needs when the corpus is NOT append-only
    * (the reference retires witness edges older than 5 days,
    * `src/arango_queries.py:90-99`). The monotone-merge theorem is
    * append-only by assumption — a delete can resurrect postings below
    * the truncation cut that were never kept — so retention is a
    * REBUILD event, never an incremental one: postings/dl are rewritten
    * semi-joined to the kept doc set (healed in the same pass — an
    * O(registry) rewrite is a compaction too), the additive stats/corpus
    * logs are re-materialized in their folded forms from the retained
    * postings (subtracting deltas would be exact but leaves the logs
    * unbounded and replay-entangled; the rebuild IS the fold), and
    * impact/meta rebuild at the depth recalibrated to the retained
    * count. Subsequent [[impactBatchIngest]] folds resume the monotone
    * merge from the new base — append-only again, theorem restored.
    *
    * `keepDocs`: one `doc` column, the retained doc-id set (the registry
    * stores no timestamps; the window predicate lives with the caller's
    * doc metadata — filter there, pass ids here). An at-rest maintenance
    * op like [[compactImpactRegistry]]: every swap is atomic and the
    * whole op is idempotent (re-filtering retained logs is a no-op), so
    * a crash mid-sequence is healed by re-running — and the re-run is
    * ENFORCED, not hoped for (ADVICE r18): an intent marker
    * (`retain_intent`) is written before the first rewrite and removed
    * after the last swap; while it is present [[impactBatchIngest]]
    * refuses to ingest (a half-retained registry's stale deltas would
    * read as forever-pending rows once new batches resume) and
    * [[impactIndexStats]] warns. Only a completed retention clears it.
    */
  def retainImpactRegistry(spark: SparkSession, registryPath: String,
                           keepDocs: DataFrame, docsPerSlot: Long = 625L,
                           mMin: Int = 64, quantizeDepth: Boolean = true)
      : Unit = {
    import graft.operators.TermStats
    val postPath = s"$registryPath/postings"
    val dlPath = s"$registryPath/dl"
    for (sub <- Seq("postings", "dl", "stats", "corpus", "impact", "meta"))
      Merge.healSwap(spark, s"$registryPath/$sub")
    val marker = new org.apache.hadoop.fs.Path(s"$registryPath/retain_intent")
    val markerFs =
      marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    markerFs.create(marker, true).close()
    val keep = keepDocs.select(col("doc")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Merge.replaceParquet(spark, postPath, spark.read.parquet(postPath)
        .distinct().join(keep, Seq("doc"), "left_semi"))
      Merge.replaceParquet(spark, dlPath, spark.read.parquet(dlPath)
        .distinct().join(keep, Seq("doc"), "left_semi"))
      val post = spark.read.parquet(postPath)
      val dl = spark.read.parquet(dlPath)
      val dkeyType = dl.schema("doc").dataType
      Merge.replaceParquet(spark, s"$registryPath/stats",
        post.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .withColumn("dkey", lit(null).cast(dkeyType)))
      Merge.replaceParquet(spark, s"$registryPath/corpus",
        dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("a_tok"))
          .withColumn("dkey", lit(null).cast(dkeyType))
          .filter(col("n_docs") > 0))
      val nTotal = dl.count()
      val mCal = TermStats.impactM(nTotal, docsPerSlot, mMin)
      val mQ = if (!quantizeDepth) mCal
        else if (mCal >= (1 << 30)) mCal
        else if (mCal <= 1) 1
        else Integer.highestOneBit(mCal - 1) << 1
      Merge.replaceParquet(spark, s"$registryPath/impact",
        TermStats.bm25ImpactIndexWithDl(post, dl, mQ))
      import spark.implicits._
      Merge.replaceParquet(spark, s"$registryPath/meta",
        Seq((mQ, nTotal)).toDF("m_built", "n_docs"))
      // last: only a COMPLETED retention clears the intent marker — a
      // crash anywhere above leaves it, and ingest refuses until the
      // re-run lands here
      markerFs.delete(marker, false)
      ()
    } finally { keep.unpersist(); () }
  }

  /** One ingest fold of the impact registry — the batch form of
    * [[streamingImpactIndex]]'s per-micro-batch step, public so a batch
    * backfill (or a test/oracle twin) drives the IDENTICAL write path
    * the stream does. See [[impactIndexRegistry]] for the layout and
    * crash contract; per call:
    *
    *  1. `postings/`, `stats/`, `corpus/` and `dl/` extend by the
    *     batch's rows, in that order — dl last, the durability mark
    *     (append-only; replayed doc ids anti-join away against the dl
    *     registry — the first-wins convention; empty appends are
    *     SKIPPED, the schema-only-part lesson from the segmented
    *     curriculum). The stats/corpus deltas are O(batch) aggregates
    *     of the batch's own postings, keyed by `dkey` = min fresh doc
    *     id so a crash replay appends byte-identical rows that
    *     distinct-heal — the corpus rollups are ADDITIVE, maintained
    *     incrementally, never recounted (the zipfreg finding).
    *  2. `impact/` re-truncates per term over (standing index ∪ the
    *     batch docs' postings).distinct — EXACT by the monotone top-m
    *     property on an append-only corpus: a posting outside top-m(P)
    *     is dominated by ≥ m postings that all remain in P ∪ B, so
    *     top-m(P ∪ B) ⊆ top-m(P) ∪ B. An entirely-fresh batch (the
    *     steady state) merges the IN-FLIGHT postings frame —
    *     byte-identical to the rows just appended, zero registry scan;
    *     only when some batch docs anti-joined away (a crash-window
    *     replay, or a source re-delivering ingested docs) does the
    *     recovery arm re-read those docs' rows from the registry with a
    *     batch-keyed join, so the replay still lands the crashed
    *     batch's rows in the swap — the merge's distinct de-dups
    *     re-merged rows instead of double-counting them toward m.
    *  3. The depth follows the calibrated
    *     [[graft.operators.TermStats.impactM]] m(n) with n read from
    *     the corpus delta log (O(batches) rows — NOT a per-batch
    *     distinct+count of the whole dl registry, which is an O(n_docs)
    *     shuffle hiding in what must be O(batch) maintenance). With
    *     `quantizeDepth` (the streaming default) m is QUANTIZED to the
    *     next power of two: a depth increase invalidates the monotone
    *     merge (rows below the old cut were never kept), so it triggers
    *     a REBUILD from the postings registry — pow2 quantization makes
    *     that a corpus-doubling event, amortized O(1) rebuilds per
    *     doubling, while the standing depth stays ≥ the calibration (so
    *     the serve contract's recall floor holds between rebuilds). A
    *     one-shot batch build passes `quantizeDepth = false` to land on
    *     the exact calibrated depth.
    *
    * Write cost per batch: O(batch) appends + an O(m·|vocab|) index swap
    * (the index IS the registry's tail — m·V rows by construction, the
    * bounded artifact the truncation exists to produce; the raw postings
    * are never rewritten). Serve via [[impactIndexRegistry]] +
    * `bm25TopKImpact`, bit-identical to a from-scratch build (pinned in
    * StreamBatchEquivalenceSpec; the registry-SERVED path is pinned in
    * the oracle gate as q206).
    */
  def impactBatchIngest(spark: SparkSession, registryPath: String,
                        batch: DataFrame, id: String, text: String,
                        minTermLen: Int = 1, docsPerSlot: Long = 625L,
                        mMin: Int = 64, quantizeDepth: Boolean = true)
      : Unit = {
    import graft.operators.TermStats
    val postPath = s"$registryPath/postings"
    val dlPath = s"$registryPath/dl"
    val statsPath = s"$registryPath/stats"
    val corpusPath = s"$registryPath/corpus"
    val impactPath = s"$registryPath/impact"
    val metaPath = s"$registryPath/meta"
    // torn-swap repair first (a crash between commitSwap's two renames
    // leaves an artifact absent with a recoverable sibling — for the
    // ACCUMULATING stats/corpus logs that absence would otherwise be
    // silently recreated batch-only below and every later serve would
    // undercount, ADVICE r18), then the retention gate: a half-finished
    // retention must be completed by its owner before ingest resumes,
    // or retired docs' stale deltas survive as forever-pending rows.
    for (sub <- Seq("postings", "dl", "stats", "corpus", "impact", "meta",
        "inflight"))
      Merge.healSwap(spark, s"$registryPath/$sub")
    if (retentionPending(spark, registryPath))
      throw new IllegalStateException(s"impactBatchIngest: $registryPath " +
        "has an incomplete retention (intent marker present) — re-run " +
        "retainImpactRegistry to completion before ingesting")
    // Legacy upgrade (ADVICE r18, medium): a registry written before the
    // stats artifacts existed has postings/dl but no stats//corpus/.
    // Starting the delta logs with ONLY this batch's deltas would
    // undercount the entire pre-existing corpus (wrong idf, wrong n for
    // the depth calibration) the moment the logs become readable — so
    // BACKFILL the folded rollups from the DURABLE registry state first
    // (postings semi-joined to the dl doc set: rows of a crashed
    // not-yet-durable batch stay out of the fold and re-append their
    // deltas on replay, compactImpactRegistry's durable/pending rule).
    // One O(registry) migration event, idempotent — a crash between the
    // two swaps re-triggers the same rebuild.
    if (readableParquet(spark, dlPath) &&
        (!readableParquet(spark, statsPath) ||
          !readableParquet(spark, corpusPath))) {
      graft.Log.warn(s"impactBatchIngest: backfilling stats/corpus delta " +
        s"logs from the pre-stats registry at $registryPath (one-time " +
        "O(registry) upgrade)")
      val dlReg = spark.read.parquet(dlPath).distinct()
      val durablePost = spark.read.parquet(postPath).distinct()
        .join(dlReg.select(col("doc")), Seq("doc"), "left_semi")
      val dkeyType = dlReg.schema("doc").dataType
      Merge.replaceParquet(spark, statsPath,
        durablePost.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .withColumn("dkey", lit(null).cast(dkeyType)))
      Merge.replaceParquet(spark, corpusPath,
        dlReg.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("a_tok"))
          .withColumn("dkey", lit(null).cast(dkeyType))
          .filter(col("n_docs") > 0))
    }
    val docsIn = batch.select(col(id).as("doc"), col(text).as("__text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // replay safety: the dl registry is the seen-doc-id set
      val fresh =
        if (readableParquet(spark, dlPath))
          docsIn.join(spark.read.parquet(dlPath).select(col("doc")),
            Seq("doc"), "left_anti")
        else docsIn
      val newPost = TermStats.bm25Postings(
          fresh.select(col("doc").as(id), col("__text").as(text)),
          id, text, minTermLen)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val newDl = newPost.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nFresh = newDl.count()
        if (nFresh > 0) { // empty append = schema-only part file
          // in-flight snapshot FIRST: newPost's lineage reads the dl
          // registry (the freshness anti-join), and Spark invalidates —
          // then lazily RECOMPUTES — any cache whose lineage touches a
          // path being appended (refreshByPath fires inside the insert
          // command), so after the dl append below the persisted newPost
          // would silently re-evaluate EMPTY (every batch doc now reads
          // as seen). The O(batch) snapshot parquet severs that lineage;
          // the merge arm reads it back after the appends. Swap-replaced
          // per batch — a crashed attempt's copy is either rewritten
          // byte-identically by the replay or bypassed by its recovery
          // arm.
          Merge.replaceParquet(spark, s"$registryPath/inflight",
            newPost.join(newDl, "doc")
              .select(col("doc"), col("term"), col("tf"), col("dl")))
          // postings FIRST, dl LAST: dl is the durability mark (see
          // impactIndexRegistry's crash contract); the additive deltas
          // land in between, all derived from the SAME deterministic
          // newPost so a replay re-appends byte-identical rows
          newPost.write.mode("append").parquet(postPath)
          val batchCorpus = newDl.agg(count(lit(1)).as("n_docs"),
            sum(col("dl")).as("a_tok"), min(col("doc")).as("dkey"))
          newPost.groupBy(col("term")).agg(count(lit(1)).as("df"))
            .crossJoin(broadcast(batchCorpus.select(col("dkey"))))
            .write.mode("append").parquet(statsPath)
          batchCorpus.write.mode("append").parquet(corpusPath)
          newDl.write.mode("append").parquet(dlPath)
        }
        if (readableParquet(spark, dlPath)) {
          // n from the corpus delta log (O(batches) rows); the dl-recount
          // fallback serves registries that predate the stats artifacts
          val nTotal =
            if (readableParquet(spark, corpusPath)) {
              val r = spark.read.parquet(corpusPath).distinct()
                .agg(sum(col("n_docs"))).head
              if (r.isNullAt(0)) 0L else r.getLong(0)
            } else
              spark.read.parquet(dlPath).distinct().count()
          val mCal = TermStats.impactM(nTotal, docsPerSlot, mMin)
          // next power of two ≥ mCal (mCal ≤ 2^30 in any real corpus;
          // past that the shift would wrap, so saturate)
          val mQ = if (!quantizeDepth) mCal
            else if (mCal >= (1 << 30)) mCal
            else if (mCal <= 1) 1
            else Integer.highestOneBit(mCal - 1) << 1
          val builtM: Int =
            if (readableParquet(spark, metaPath))
              spark.read.parquet(metaPath).head.getInt(0)
            else -1
          val dlRaw = spark.read.parquet(dlPath)
          val next =
            if (mQ > builtM || !readableParquet(spark, impactPath)) {
              // depth grew (or first build): the merge property can't
              // reach below the old cut — rebuild from the registry.
              // The rebuild joins postings×dl positionally into the
              // top-m windows, so BOTH sides need the healing distinct
              // (a duplicated dl row would double its doc's postings
              // inside the window and steal top-m slots) — the one
              // remaining O(registry) read, amortized pow2-rarely
              TermStats.bm25ImpactIndexWithDl(
                spark.read.parquet(postPath).distinct(), dlRaw.distinct(),
                mQ)
            } else {
              val nIn = docsIn.select(col("doc")).distinct().count()
              val batchRows =
                if (nFresh == nIn && nFresh > 0)
                  // entirely-fresh batch — the STEADY STATE: the rows
                  // the merge needs are exactly the in-flight snapshot
                  // written above (byte-identical to the rows just
                  // appended), so the postings registry is not scanned
                  // at all. Pre-r18 this arm always paid a full-registry
                  // scan per micro-batch — the same
                  // O(registry)-in-O(batch)-clothing class as the dl
                  // recount the stats logs removed.
                  spark.read.parquet(s"$registryPath/inflight")
                else
                  // recovery arm: some batch docs' rows live only in the
                  // registry — a crash between the appends and this swap
                  // (fresh anti-joined away on replay) or a source that
                  // re-delivers ingested docs. Batch-keyed registry join;
                  // impactIndexMerge's distinct keeps re-merged or
                  // replay-duplicated rows from double-counting toward m,
                  // which also heals the duplicate dlRaw rows this join
                  // can fan out (no full-registry distinct here). Docs
                  // already in the standing index contribute rows the
                  // merge's distinct collapses — harmless, and the
                  // monotone property says they cannot re-enter anyway.
                  spark.read.parquet(postPath)
                    .join(docsIn.select(col("doc")).distinct(), Seq("doc"))
                    .join(dlRaw, "doc")
                    .select(col("doc"), col("term"), col("tf"), col("dl"))
              TermStats.impactIndexMerge(
                spark.read.parquet(impactPath), batchRows, builtM)
            }
          val effM = math.max(mQ, builtM)
          Merge.replaceParquet(spark, impactPath, next)
          import spark.implicits._
          Merge.replaceParquet(spark, metaPath,
            Seq((effM, nTotal)).toDF("m_built", "n_docs"))
        }
      } finally { newPost.unpersist(); newDl.unpersist(); () }
    } finally { docsIn.unpersist(); () }
  }

  /** Streaming maintenance of the impact-truncated BM25 serve index
    * ([[graft.operators.TermStats.bm25ImpactIndex]]) — the incremental
    * path the q203/q204 pruned serves imply: a production deployment
    * ingests documents continuously and must not re-tokenize the corpus
    * per refresh. Each micro-batch is one [[impactBatchIngest]] fold
    * (see there for the step list, costs, and the crash contract).
    *
    * `compactEvery` gives the fold-cadence compaction an OWNER (the
    * Merge delta-log convention): every N batches the stream itself
    * runs [[compactImpactRegistry]], so crash-replay duplicates and
    * delta-log length stay bounded by the cadence instead of growing
    * with replay history until an operator remembers to fold. 0 = off
    * (the caller owns compaction — e.g. one fold per epoch from the
    * backfill driver). Safe at any cadence: compaction runs strictly
    * between batch folds on the stream's own thread, and a restart
    * replays a wedged batch before any later batch can trigger a fold.
    */
  def streamingImpactIndex(stream: DataFrame, checkpointDir: String,
                           registryPath: String, id: String, text: String,
                           minTermLen: Int = 1, docsPerSlot: Long = 625L,
                           mMin: Int = 64, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        impactBatchIngest(batch.sparkSession, registryPath, batch, id, text,
          minTermLen, docsPerSlot, mMin)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          compactImpactRegistry(batch.sparkSession, registryPath)
        ()
      }
      .start()
}
