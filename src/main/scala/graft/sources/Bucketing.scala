package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (the brief's
  * "pre-partitioning / bucketing" scale tool).
  *
  * A join between two tables bucketed by the same key into the same
  * bucket count needs NO exchange on either side — the shuffle is paid
  * once at write time and amortized over every subsequent join/aggregate
  * on that key. This is the right layout for the engine's repeated
  * fact-fact joins (rewards⨝transactions on hash, accounts⨝blocks on
  * height) in a standing deployment; [[graft.operators.Skew.saltedJoin]]
  * and broadcast remain the tools for skew and dims.
  *
  * Spark bucketing requires the table catalog (`saveAsTable`) — plain
  * `.parquet(path)` writes ignore `bucketBy`.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String, moreKeys: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Append to an existing bucketed table with the SAME bucket spec
    * (Spark rejects a mismatched spec — the layout contract is
    * catalog-enforced, not convention). Each append adds one file per
    * touched bucket; a long-running registry stream compacts on its
    * own cadence ([[graft.streaming.Incremental.compactRegistry]]'s
    * discipline applied to tables).
    */
  def appendBucketed(df: DataFrame, table: String, buckets: Int,
                     key: String, moreKeys: String*): Unit =
    df.write
      .mode(SaveMode.Append)
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Compact a bucketed table in place: every [[appendBucketed]] adds
    * one file per touched bucket, so a long-running registry stream
    * accumulates files until bucket-pruned lookups pay per-file open
    * cost again — the same decay [[graft.streaming.Incremental
    * .compactRegistry]] fixes for flat registries. Reads the whole
    * table through an EAGER local checkpoint (Spark refuses to
    * overwrite a table it is still reading from — the checkpoint cuts
    * that dependency), then rewrites it with the same bucket spec. Run
    * from the owning stream's serial `foreachBatch` cadence, like every
    * registry maintenance op (no concurrent readers of the half-written
    * table).
    */
  def compactBucketed(spark: SparkSession, table: String, buckets: Int,
                      key: String, moreKeys: String*): Unit = {
    if (spark.catalog.tableExists(table)) {
      val snap = spark.table(table).localCheckpoint(true)
      // bucketBy writes one file per (task × bucket); repartitioning on
      // the bucket keys first (same Murmur3 hash family as the bucket
      // assignment) lands each bucket's rows in ONE task, so the
      // rewrite leaves exactly one file per non-empty bucket
      val oneTaskPerBucket = snap.repartition(buckets,
        (key +: moreKeys).map(org.apache.spark.sql.functions.col): _*)
      writeBucketed(oneTaskPerBucket, table, buckets, key, moreKeys: _*)
    }
  }

  /** Run `f` with Spark's auto-bucketed-scan heuristic OFF (conf
    * restored after). The `DisableUnnecessaryBucketedScan` planner rule
    * disables bucketed reads whenever no operator NEEDS the bucketing's
    * output partitioning — but it does not account for bucket PRUNING,
    * so a literal-valued lookup on the bucket key (the registry-probe
    * shape: `WHERE dhash IN (<batch values>)`) gets planned as a full
    * flat scan by default (measured r13: `Bucketed: false (disabled by
    * query planner)` vs `SelectedBucketsCount: 3 out of 16` with the
    * rule off). The conf is read at PLANNING time, i.e. at the first
    * action — so the flip must stay open across the action, which is
    * why this is a scope, not a builder option. Session-level conf:
    * callers must not run CONCURRENT queries in the same session that
    * would suffer forced bucketed scans (true inside a `foreachBatch`,
    * which Spark serializes per query — the
    * [[graft.operators.Components.foldIntoParquet]] caveat).
    */
  def withForcedBucketedScan[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  /** True when the executed plan of `df` contains no SHUFFLE exchange —
    * the assertion that a bucketed join was in fact co-located. Broadcast
    * and reused exchanges don't count: a broadcast dim join is co-located
    * by construction. Execution is forced with a no-op `foreach` (AQE
    * finalizes the plan at first action) — nothing is pulled to the driver.
    */
  def isExchangeFree(df: DataFrame): Boolean = {
    df.foreach(_ => ()) // force execution so AQE finalizes the physical plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // Descend through AQE wrappers and materialized query stages (leaves to
    // TreeNode.collect) so shuffles hidden inside them are still counted.
    def hasShuffle(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => hasShuffle(a.executedPlan)
      case _: ShuffleExchangeLike => true
      case q: QueryStageExec => hasShuffle(q.plan)
      case other => other.children.exists(hasShuffle)
    }
    !hasShuffle(df.queryExecution.executedPlan)
  }

  /** Count SHUFFLE exchanges in the executed plan (AQE wrappers and
    * materialized stages descended like [[isExchangeFree]]). The
    * assertion currency for "the bucketed layout removed exchange N":
    * specs compare flat-vs-bucketed counts instead of eyeballing
    * explain output.
    */
  def countShuffles(df: DataFrame): Int = {
    df.foreach(_ => ())
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: ShuffleExchangeLike => 1 + s.children.map(walk).sum
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** True when the executed plan actually read through a bucketed file
    * scan. [[isExchangeFree]] alone is also satisfied by a broadcast
    * fallback (co-located, but not via bucketing); call sites that want to
    * assert the bucketed layout specifically should check BOTH — shuffle
    * freedom AND that a scan reported selected bucket output.
    */
  def usedBucketedScan(df: DataFrame): Boolean = {
    df.foreach(_ => ())
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def hasBucketedScan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => hasBucketedScan(a.executedPlan)
      case s: FileSourceScanExec => s.bucketedScan
      case q: QueryStageExec => hasBucketedScan(q.plan)
      case other => other.children.exists(hasBucketedScan)
    }
    hasBucketedScan(df.queryExecution.executedPlan)
  }
}
