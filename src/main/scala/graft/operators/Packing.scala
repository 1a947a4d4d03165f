package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Sequence packing — the concat-and-chunk step an LLM pretraining pipeline
  * runs after dedup/filtering: documents are laid out in a deterministic
  * stream and cut into fixed-budget sequences, each document landing at a
  * byte/token offset inside its pack (documents MAY straddle pack
  * boundaries — the standard causal-LM packing contract, which wastes zero
  * budget; `n_chunks` reports the straddle count).
  *
  * Scale design: a single global running sum would serialize on one
  * partition, so the stream is SHARDED by a salted hash first — each shard
  * packs independently (embarrassingly parallel, one window per shard) and
  * a pack is identified by (shard, pack). Order within a shard is by a
  * second salted hash (deterministic shuffle: reproducible, and
  * decorrelates document order from corpus insertion order, which matters
  * for training). Everything is window arithmetic over longs — one shuffle
  * by shard, no driver state, no floating point.
  */
object Packing {

  /** Assign each row its (shard, pack, offset_in_pack, n_chunks) under
    * `budget` cost units per pack.
    *
    * @param id     stable row id column (drives both hashes)
    * @param cost   long column: the row's size in budget units (tokens,
    *               chars, bytes — caller's choice)
    * @param budget pack capacity in the same units; must be positive
    * @param shards number of independent packing streams
    * @param salt   experiment isolation, as in [[Sampling]]
    */
  def packByBudget(df: DataFrame, id: String, cost: String, budget: Long,
                   shards: Int, salt: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val reserved = Seq("shard", "pack", "offset_in_pack", "n_chunks",
      "__cum_after", "__cum_before")
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — withColumn would silently overwrite them; alias first")
    val shard: Column = Sampling.hashBucket(col(id), salt, shards)
    val ord: Column = Text.baseHash32(concat(lit(s"$salt-ord:"), col(id)))
    // Window over the bound ATTRIBUTE, not the raw expression: a
    // downstream aggregate groups on col("shard"), and Spark only
    // recognizes the window's exchange as satisfying that grouping when
    // both sides reference the same attribute — the expression form cost
    // every (shard, …) rollup an extra exchange (caught by the q112 plan
    // pin).
    val w = Window.partitionBy(col("shard")).orderBy(ord, col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("__cum_after", sum(col(cost)).over(w))
      .withColumn("__cum_before", col("__cum_after") - col(cost))
      .withColumn("pack", expr(s"__cum_before div ${budget}L"))
      .withColumn("offset_in_pack", col("__cum_before") % budget)
      .withColumn("n_chunks",
        expr(s"(__cum_after - 1) div ${budget}L") - col("pack") + 1)
      .drop("__cum_after", "__cum_before")
  }

  /** Fixed-count PADDED batch assembly — the SFT/seq2seq counterpart to
    * [[packByBudget]]'s concat packing: sequences form batches of
    * `batchSize` rows (the last batch per group may run short), every
    * sequence pads to its batch's max length, and the output is the
    * per-batch padding bill. Length BUCKETING (`bucketWidth` > 0) is the
    * standard mitigation (batches form within (shard, len div width)
    * groups, so members have near-equal lengths and the pad waste
    * collapses); `bucketWidth = 0` is the unbucketed arrival-order
    * baseline the audit compares against.
    *
    * Returns one row per batch: (shard, bucket, batch, n_rows,
    * batch_max, n_tokens, n_pad).
    *
    * Same scale shape as [[packByBudget]]: shard by salted hash, order
    * within (shard, bucket) by a second salted hash then id — one
    * shuffle, per-group windows, no global ordering anywhere (a global
    * batch numbering would serialize on one partition; per-shard
    * assembly is also what training workers actually do).
    */
  def paddedBatches(df: DataFrame, id: String, len: String, batchSize: Int,
                    shards: Int, salt: String, bucketWidth: Long): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(shards > 0, s"shards must be positive, got $shards")
    require(bucketWidth >= 0, s"bucketWidth must be >= 0, got $bucketWidth")
    val reserved = Seq("shard", "bucket", "batch", "n_rows", "batch_max",
      "n_tokens", "n_pad", "__rn")
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — withColumn would silently overwrite them; alias first")
    val bucket: Column =
      if (bucketWidth > 0) expr(s"$len div ${bucketWidth}L") else lit(0L)
    val ord: Column = Text.baseHash32(concat(lit(s"$salt-ord:"), col(id)))
    val w = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(ord, col(id))
    df.withColumn("shard", Sampling.hashBucket(col(id), salt, shards))
      .withColumn("bucket", bucket)
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch", expr(s"(__rn - 1) div ${batchSize}L"))
      .groupBy(col("shard"), col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_rows"), max(col(len)).as("batch_max"),
        sum(col(len)).as("n_tokens"))
      .withColumn("n_pad", col("n_rows") * col("batch_max") - col("n_tokens"))
  }

  /** NO-STRADDLE packing — greedy next-fit in the same deterministic
    * shard/order layout as [[packByBudget]], but documents never split
    * across packs (the long-context contract: attention must see whole
    * documents), at the price of per-pack waste the caller reports
    * instead of hiding. A document larger than the budget gets a pack of
    * its own, flagged `oversize` — the prep step must not silently drop
    * or truncate it.
    *
    * Pack boundaries depend on every prior row of the shard (a running
    * sum WITH RESETS), which no window or prefix-sum expresses — this is
    * the sanctioned `mapPartitions` case: rows arrive hash-clustered by
    * shard and secondary-sorted (shard, order-hash, id), the fold
    * STREAMS them with O(1) state (current shard, pack seq, fill), and
    * `shards` is the parallelism knob exactly as in [[packByBudget]].
    * Adds (shard, pack, offset_in_pack, oversize) to the input columns.
    */
  def packNoStraddle(df: DataFrame, id: String, cost: String, budget: Long,
                     shards: Int, salt: String,
                     order: Seq[Column] = Seq.empty): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val reserved = Seq("shard", "pack", "offset_in_pack", "oversize", "__ord")
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — withColumn would silently overwrite them; alias first")
    // default stream order = the deterministic shuffle; callers may trade
    // order for waste by passing VALUE columns (compared ascending,
    // lexicographically; negate for descending — e.g. `-cost` gives
    // next-fit-decreasing, q199's A/B)
    val streamOrder =
      if (order.nonEmpty) order
      else Seq(Text.baseHash32(concat(lit(s"$salt-ord:"), col(id))))
    val prepared = df
      .withColumn("shard", Sampling.hashBucket(col(id), salt, shards))
      .withColumn("__ord", struct(streamOrder: _*))
      .repartition(col("shard")) // same-shard rows co-located
      .sortWithinPartitions(col("shard"), col("__ord"), col(id))
    val schema = org.apache.spark.sql.types.StructType(
      prepared.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("pack",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("offset_in_pack",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("oversize",
          org.apache.spark.sql.types.BooleanType, nullable = false)))
    val shardIdx = prepared.schema.fieldIndex("shard")
    val costIdx = prepared.schema.fieldIndex(cost)
    val out = prepared.mapPartitions { rows =>
      var curShard = Long.MinValue
      var pack = 0L
      var fill = 0L
      rows.map { r =>
        val s = r.get(shardIdx) match {
          case i: Int => i.toLong; case l: Long => l
          case other => throw new IllegalArgumentException(
            s"shard must be integral, got $other")
        }
        val n = r.get(costIdx) match {
          case i: Int => i.toLong; case l: Long => l
          case other => throw new IllegalArgumentException(
            s"cost must be integral, got $other")
        }
        require(n >= 0, s"negative cost $n")
        if (s != curShard) { curShard = s; pack = 0L; fill = 0L }
        else if (fill > 0 && fill + n > budget) { pack += 1L; fill = 0L }
        val offset = fill
        fill += n
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq ++ Seq(pack, offset, n > budget))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    out.drop("__ord")
  }
}
