package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Drift, Layout, Packing, RangeJoin, Ranks, Rolling, Sampling, Sessionize, Sft, Skew, SnapshotDiff}
import graft.functions.Text
import graft.sources.Tables

/** Beyond-reference temporal/sampling operators (the build brief's as-of
  * join, range join, and deterministic dataset-split family), registered as
  * oracle-checked queries over the driver tables. The reference itself has
  * only equi-joins (SURVEY.md §2.3) and no sampling; these are the
  * operators its users would need next at training-pipeline scale.
  */
object Extensions {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  val SixHoursUs = 6L * 3600 * 1000000

  /** q44: backward as-of join — for every click, the user's most recent
    * prior-or-simultaneous purchase ([[AsOf.backward]]: one shuffle on
    * user_id, running-state window, no candidate blowup). Duplicate
    * purchase timestamps resolve to the greatest event_id on both engines.
    */
  def q44AsofJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("p_id"),
        cents(col("value")).as("p_value_c"))
    AsOf.backward(clicks, purchases, Seq("user_id"), "ts_us",
        tiebreak = "p_id", carry = Seq("p_id", "p_value_c"), prefix = "m_")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("m_p_id"), col("m_p_value_c"), col("m_age"))
  }

  /** q52: nearest as-of join — each click matched to its closest purchase
    * in either time direction, ties to the backward match
    * ([[AsOf.nearest]]: one shuffle, two partition-local window sorts).
    */
  def q52AsofNearest(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("p_id"),
        cents(col("value")).as("p_value_c"))
    AsOf.nearest(clicks, purchases, Seq("user_id"), "ts_us",
        tiebreak = "p_id", carry = Seq("p_id", "p_value_c"), prefix = "m_")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("m_p_id"), col("m_p_value_c"), col("m_age"))
  }

  /** q45: point-in-interval range join — every event falling in one of the
    * sampled 6-hour anchor windows, aggregated per anchor
    * ([[RangeJoin.pointInInterval]]: equi-join on a time bin, never a
    * nested-loop product; each match produced exactly once).
    */
  def q45RangeJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
    val anchors = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("anchor_id"), col("ts_us").as("lo"),
        (col("ts_us") + SixHoursUs).as("hi"))
    val points = ev.select(col("event_id"), col("ts_us"),
      cents(col("value")).as("value_c"))
    RangeJoin.pointInInterval(points, "ts_us", anchors, "lo", "hi",
        binWidth = SixHoursUs)
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("value_c")).as("sum_value_c"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
  }

  /** q46: deterministic 90/5/5 hash split of the document corpus with
    * per-split corpus stats ([[Sampling.hashSplit]]: row-local md5
    * assignment — reproducible, sticky under corpus growth, no shuffle).
    */
  def q46HashSplit(spark: SparkSession, d: String): DataFrame =
    Sampling.hashSplit(Tables(spark, d, "documents"), "doc_id", "exp1",
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))

  /** q48: sequence packing — the document corpus laid out into 8
    * deterministic shard streams and cut into 4096-char packs
    * ([[Packing.packByBudget]]: one shuffle by shard, window arithmetic
    * over longs, documents may straddle pack boundaries).
    */
  /** q156: corpus drift monitor ([[graft.operators.Drift.tvd]]) —
    * total-variation distance between two snapshots over binned text
    * features (n_chars div 64, token count div 8), exact-integer
    * arithmetic end to end (the scaladoc explains why TVD and not
    * PSI/KL: no logs, no FP, defined on empty bins). Two comparisons in
    * one query: `null_pair` (the corpus hash-split in half — the
    * monitor's steady-state, near-zero drift) and `len_biased` (half A
    * vs the ≤-median-length subset of half B — a simulated
    * truncation-bug snapshot, large drift on BOTH features since length
    * and token count move together). The production shape at corpus
    * scale is this exact query over [[Sampling.sampleByHash]] samples
    * of each snapshot (Drift.MaxCrossProduct guard).
    */
  def q156DriftTvd(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.balanced(spark, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
        Sampling.hashBucket(col("doc_id"), "drift", 2).as("half"))
    val longForm = base.select(col("half"), col("n_chars"),
        lit("n_chars").as("feature"), expr("n_chars div 64").as("bin"))
      .unionByName(base.select(col("half"), col("n_chars"),
        lit("n_tokens").as("feature"), expr("n_tokens div 8").as("bin")))
    val nullRows = longForm.select(lit("null_pair").as("comparison"),
      col("feature"), col("bin"),
      when(col("half") === 0, "a").otherwise("b").as("split"))
    val biasedRows = longForm.filter(col("half") === 0)
      .select(lit("len_biased").as("comparison"), col("feature"),
        col("bin"), lit("a").as("split"))
      .unionByName(longForm.filter(col("half") === 1 && col("n_chars") <= 306)
        .select(lit("len_biased").as("comparison"), col("feature"),
          col("bin"), lit("b").as("split")))
    Drift.tvd(nullRows.unionByName(biasedRows),
      Seq("comparison", "feature"), "bin", "split", "a", "b")
  }

  /** q158: the drift family's REGISTRY form
    * ([[graft.operators.Drift.tvdAgainstRegistry]]) — q156's monitor
    * restructured the way a production pipeline actually runs it: the
    * reference snapshot (hash-half 0) is aggregated ONCE into a
    * [[graft.operators.Drift.binnedCounts]] histogram registry (|bins|
    * rows — the lmCounts/gram-registry pattern), and each arriving batch
    * (hash-half 1, split into three batches by doc_id mod 3) is scored
    * against that frozen artifact with one keyed count + a |bins|-sized
    * join. Per-batch cost is the batch's own rows; the reference corpus
    * is never re-scanned. The registry is replicated per batch id via a
    * broadcast cross join (3 × |bins| rows — the constant-side artifact
    * shape). Registry-vs-split equivalence is DriftSpec-pinned.
    */
  def q158DriftRegistry(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.balanced(spark, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
        Sampling.hashBucket(col("doc_id"), "drift", 2).as("half"))
    def longForm(df: DataFrame) = df
      .select(col("doc_id"), lit("n_chars").as("feature"),
        expr("n_chars div 64").as("bin"))
      .unionByName(df.select(col("doc_id"), lit("n_tokens").as("feature"),
        expr("n_tokens div 8").as("bin")))
    val registry = Drift.binnedCounts(longForm(base.filter(col("half") === 0)),
      Seq("feature"), "bin")
    val batches = longForm(base.filter(col("half") === 1))
      .withColumn("batch_id", col("doc_id") % 3)
    val batchIds = batches.select(col("batch_id")).distinct()
    Drift.tvdAgainstRegistry(broadcast(batchIds).crossJoin(registry),
      batches, Seq("batch_id", "feature"), "bin")
  }

  /** q159: row-level snapshot diff
    * ([[graft.operators.SnapshotDiff.diffCounts]]) — the ETL regression
    * report completing the monitoring family (q156/q158 watch the
    * DISTRIBUTION; this watches the ROWS): per-source counts of keys
    * added, removed, changed, and unchanged between snapshot N and N+1.
    * Snapshot N+1 is simulated deterministically from the corpus: every
    * doc_id % 7 == 0 row vanishes, every doc_id % 5 == 0 row's text is
    * rewritten, and every doc_id % 11 == 0 row re-appears under a new
    * id (an id-space migration leak). Content identity is the md5 text
    * hash; one full-outer key join + one source rollup.
    */
  def q159SnapshotDiff(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
    val prev = docs.select(col("doc_id"), md5(col("text")).as("content"),
      col("source"))
    val kept = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("content"),
        col("source"))
    val added = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        md5(col("text")).as("content"), col("source"))
    SnapshotDiff.diffCounts(prev, kept.unionByName(added), "doc_id",
      "content", "source")
  }

  /** q160: the padding-waste audit
    * ([[graft.operators.Packing.paddedBatches]]) — q48 packs by
    * concatenation (zero waste, causal-LM style); this measures the
    * OTHER batching regime, padded fixed-count batches (SFT/seq2seq),
    * under the two standard strategies on identical shards/order:
    * `arrival` (no bucketing — every batch pads to its longest straggler)
    * vs `bucketed32` (length buckets of 32 tokens — near-equal members,
    * waste collapses). One summary row per strategy with the exact
    * padding bill; the pm ratio is the number a pipeline owner tunes
    * bucket width against.
    */
  def q160PaddedBatches(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.balanced(spark, d, "documents")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("len"))
    def audit(width: Long, name: String) =
      Packing.paddedBatches(docs, "doc_id", "len", batchSize = 16,
          shards = 8, salt = "pb", bucketWidth = width)
        .agg(count(lit(1)).as("n_batches"), sum(col("n_rows")).as("n_rows"),
          sum(col("n_tokens")).as("n_tokens"), sum(col("n_pad")).as("n_pad"))
        .select(lit(name).as("strategy"), col("n_batches"), col("n_rows"),
          col("n_tokens"), col("n_pad"),
          expr("(1000000 * n_pad) div (n_tokens + n_pad)").as("pad_pm"))
    audit(0L, "arrival").unionByName(audit(32L, "bucketed32"))
  }

  def q48SequencePacking(spark: SparkSession, d: String): DataFrame =
    Packing.packByBudget(
        Tables(spark, d, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", budget = 4096L, shards = 8, salt = "pack")
      .select(col("doc_id"), col("shard"), col("pack"),
        col("offset_in_pack"), col("n_chunks"))

  /** q49: per-language quality gate — keep the top half of each language
    * by length ([[Sampling.topFractionByGroup]]: exact rank arithmetic,
    * one shuffle), reporting the surviving population per language.
    */
  def q49QualityGate(spark: SparkSession, d: String): DataFrame =
    Sampling.topFractionByGroup(Tables(spark, d, "documents"),
        Seq(col("lang")), col("n_chars"), col("doc_id"), frac = 0.5)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), min(col("n_chars")).as("cutoff_chars"),
        sum(col("n_chars")).as("sum_chars"), min(col("doc_id")).as("min_doc"))

  val FourHoursUs = 4L * 3600 * 1000000

  /** q56: interval-overlap join — every 6-hour anchor window (event_id %
    * 97) overlapped against the 4-hour windows (event_id % 89), counted
    * per anchor ([[RangeJoin.intervalOverlap]]: bin equi-join with
    * first-overlap-bin emission — exactly once, no distinct, never a
    * nested loop).
    */
  def q56IntervalOverlap(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
    val a = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("a_id"), col("ts_us").as("a_lo"),
        (col("ts_us") + SixHoursUs).as("a_hi"))
    val b = ev.filter(col("event_id") % 89 === 0)
      .select(col("event_id").as("b_id"), col("ts_us").as("b_lo"),
        (col("ts_us") + FourHoursUs).as("b_hi"))
    RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
        binWidth = SixHoursUs)
      .groupBy(col("a_id"))
      .agg(count(lit(1)).as("n_overlaps"),
        min(col("b_id")).as("min_b"), max(col("b_id")).as("max_b"))
  }

  /** q54: balanced data mixing — each (lang, source) stratum capped at 40
    * documents by salted-hash rank ([[Sampling.capPerGroup]]), reporting
    * the per-stratum survivors. The domain-balancing step of a corpus
    * mixing pipeline.
    */
  /** q123: temperature-resampled corpus — q64's α = 0.5 mixing weights
    * turned into an actual 300-doc selection over the `source` domains
    * ([[Sampling.temperatureResample]]): integer largest-remainder
    * apportionment of the micro-unit weights (Σ targets = 300 exactly),
    * salted-hash rank selection within each source. The oracle
    * recomputes weights, apportionment, and the per-source hash ranks
    * relationally; hash equality pins the whole selected SET, not a
    * rollup.
    */
  def q123TemperatureResample(spark: SparkSession, d: String): DataFrame =
    Sampling.temperatureResample(Tables(spark, d, "documents"),
        "source", "doc_id", "temp", total = 300L)
      .select(col("doc_id"), col("source"))

  def q54BalancedMix(spark: SparkSession, d: String): DataFrame =
    Sampling.capPerGroup(Tables(spark, d, "documents"),
        Seq(col("lang"), col("source")), "doc_id", "mix1", n = 40)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))

  val ThirtyMinUs = 30L * 60 * 1000000

  /** q59: gap-based sessionization — each user's event stream cut into
    * sessions at 30-minute silences, rolled up to a session table
    * ([[Sessionize.rollup]]: one shuffle on user_id, two windows + the
    * rollup all reusing that partitioning).
    */
  def q59Sessionize(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        cents(col("value")).as("value_c"))
    Sessionize.rollup(ev, Seq(col("user_id")), col("ts_us"), col("event_id"),
        maxGap = ThirtyMinUs, metric = col("value_c"))
      .withColumnRenamed("sum_metric", "sum_value_c")
  }

  /** q66: salted skew join — events against a per-user dim via
    * [[Skew.saltedJoin]] (salt=8: every hot user key splits across 8
    * sub-partitions, the dim replicates 8×), aggregated back per user.
    * The oracle is the PLAIN join — salting must be output-invisible.
    */
  def q66SaltedJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
      .select(col("user_id"), col("event_id"), cents(col("value")).as("value_c"))
    val dim = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_user_events"))
    Skew.saltedJoin(ev, dim, Seq("user_id"), salt = 8)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_value_c"),
        max(col("n_user_events")).as("n_user_events"))
  }

  val OneHourUs = 3600L * 1000000
  val OneDayUs = 24L * 3600 * 1000000
  val SevenDayUs = 7L * 24 * 3600 * 1000000

  /** q68: conversion funnel — each purchase attributed to the user's most
    * recent click within the preceding hour ([[AsOf.backward]] with
    * `maxAge`: the attribution-window variant of the as-of join), rolled
    * up to per-user conversion rates. Funnel = as-of + rollup; no new
    * shuffle shape.
    */
  def q68Funnel(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id").as("c_id"))
    AsOf.backward(purchases, clicks, Seq("user_id"), "ts_us",
        tiebreak = "c_id", carry = Seq("c_id"), prefix = "m_",
        maxAge = Some(OneHourUs))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("m_c_id")).as("n_converted"),
        round(lit(1000000.0) * count(col("m_c_id")) / count(lit(1)))
          .cast("long").as("conv_pm"))
  }

  /** q69: trailing-24h rolling spend per event ([[Rolling.overRange]]:
    * RANGE frame — duplicate timestamps see identical frames, so the
    * result is deterministic without a tiebreak; one shuffle on user_id).
    */
  def q69RollingWindow(spark: SparkSession, d: String): DataFrame =
    Rolling.overRange(
        Tables.eventsWithUs(spark, d)
          .select(col("event_id"), col("user_id"), col("ts_us"),
            cents(col("value")).as("value_c")),
        Seq(col("user_id")), col("ts_us"), col("value_c"),
        lookback = OneDayUs)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("roll_sum").as("roll_sum_c"), col("roll_cnt"))

  /** q90: exact-N stratified sample ([[Sampling.proportionalSample]]) —
    * 500 documents apportioned across languages by largest remainder
    * (integer-exact quotas), rows picked by sticky salted-hash rank. The
    * oracle reproduces the SAME 500 doc ids, so apportionment, leftover
    * order, and in-stratum ranking are all hash-verified.
    */
  def q90StratifiedSample(spark: SparkSession, d: String): DataFrame =
    Sampling.proportionalSample(
      Tables(spark, d, "documents").select(col("doc_id"), col("lang")),
      group = "lang", id = "doc_id", salt = "strat", totalN = 500L)

  /** q89: recency-decayed activity features ([[Rolling.decayedSum]]) —
    * per-user value halved every 3 days, anchored at 2024-01-31. Exact
    * shift-based ppm weights (never `pow` — engines round it
    * differently), plain partial-agg integer sum: the feature-store
    * recency signal with zero FP hazard in the oracle compare.
    */
  def q89DecayedFeatures(spark: SparkSession, d: String): DataFrame =
    Rolling.decayedSum(
      Tables.eventsWithUs(spark, d)
        .withColumn("value_c", round(col("value") * 100).cast("long")),
      Seq(col("user_id")), col("ts_us"), col("value_c"),
      asOf = 1706659200000000L, halfLife = 3L * 86400000000L)

  /** q88: purged temporal split ([[Sampling.timeSplit]]) — train strictly
    * before boundary−embargo, test at/after the boundary, a 2-day embargo
    * band excluded from both (the leakage gate for windowed features:
    * without the purge, a trailing-48h aggregate computed for a train row
    * just under the boundary reads test-period events). Rolled up per
    * split so the oracle checks band edges AND populations.
    */
  def q88TimeSplit(spark: SparkSession, d: String): DataFrame = {
    val boundaryUs = 1705881600000000L // 2024-01-22T00:00:00Z
    val embargoUs = 2L * 86400000000L
    Sampling.timeSplit(Tables.eventsWithUs(spark, d), col("ts_us"),
        boundaryUs, embargoUs)
      .groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("ts_us")).as("min_ts_us"), max(col("ts_us")).as("max_ts_us"))
  }

  /** q86: Z-order layout audit ([[graft.operators.Layout]]) — customers on
    * a 256×256 key-derived grid, Morton-coded and assigned to 16
    * contiguous z-range buckets (the files a clustered write would
    * produce). The per-bucket extents prove the locality contract: with a
    * power-of-two bucket count every bucket is an axis-aligned 64×64
    * rectangle, so 2-D range predicates touch few buckets — the file-
    * skipping property LayoutSpec measures against a real partitioned
    * write. The oracle recomputes the identical mask cascade in SQL.
    */
  def q86ZorderLayout(spark: SparkSession, d: String): DataFrame = {
    val g = Tables(spark, d, "customer").select(col("c_custkey"),
      (col("c_custkey") % 256).as("gx"), (col("c_custkey") * 7 % 256).as("gy"))
    g.withColumn("z", Layout.zValue(col("gx"), col("gy")))
      .withColumn("bucket", Layout.zBucket(col("z"), zBits = 16, buckets = 16))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("gx").as("min_gx"), max("gx").as("max_gx"),
        min("gy").as("min_gy"), max("gy").as("max_gy"),
        min("z").as("z_lo"), max("z").as("z_hi"))
  }

  /** q116: cohort retention matrix — users grouped by first-seen week
    * (epoch-anchored), activity counted per week offset, retention as a
    * micro-unit share of the cohort. The analytics-dashboard staple over
    * the event stream, shaped for scale: per-user week sets collapse in
    * ONE user-keyed aggregate (collect_set partials combine map-side;
    * weeks-per-user is calendar-bounded), the explode is row-local, and
    * the (cohort, offset) rollup + cohort-size window run over
    * cohort-bounded data.
    */
  def q116CohortRetention(spark: SparkSession, d: String): DataFrame =
    graft.operators.Cohorts.retention(
      Tables.eventsWithUs(spark, d), "user_id", "ts_us")

  /** q119: THREE-step ordered funnel (view → click → purchase, 1h per
    * hop) — the canonical multi-step event-analytics query, built by
    * CHAINING the as-of join: stage 1 enriches each click with its
    * latest prior view (≤24h — the browse-earlier-that-day hop); stage 2
    * enriches each purchase with its latest prior click (≤1h), CARRYING
    * the click's view match — the
    * as-of carry is a struct, so (click, its view) stay an atomic pair
    * even when the nearest click has no view (a scalar last_value would
    * reach back to an older click's view and mispair). Two keyed
    * shuffles (one per as-of), partial-agg rollup, exact micro-unit
    * rates.
    */
  def q119Funnel3(spark: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.funnelN(Tables.eventsWithUs(spark, d),
        "user_id", "ts_us", "event_id",
        steps = Seq(col("event_type") === "view",
          col("event_type") === "click", col("event_type") === "purchase"),
        windows = Seq(OneDayUs, OneHourUs))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("step2_id")).as("n_step2"),
        count(col("step1_id")).as("n_full"),
        expr("(1000000 * count(step2_id)) div count(1)").as("conv2_pm"),
        expr("(1000000 * count(step1_id)) div count(1)").as("conv_full_pm"))

  /** q122: FOUR-step ordered funnel (signup → view → click → purchase;
    * 7d/24h/1h hop windows) through the generalized
    * [[graft.operators.Funnel.funnelN]] fold — the operator q119 now
    * also runs through (its hash-stable oracle pins the fold against the
    * hand-chained three-step form it replaced). Each hop is one
    * user-keyed as-of exchange with the accumulated chain carried as an
    * atomic struct; the rollup reuses the final hop's clustering —
    * plan-pinned at ≤4 user-keyed exchanges (PlanSpec).
    */
  def q122Funnel4(spark: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.funnelN(Tables.eventsWithUs(spark, d),
        "user_id", "ts_us", "event_id",
        steps = Seq(col("event_type") === "signup",
          col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windows = Seq(SevenDayUs, OneDayUs, OneHourUs))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("step3_id")).as("n_click"),
        count(col("step2_id")).as("n_view"),
        count(col("step1_id")).as("n_full"),
        expr("(1000000 * count(step1_id)) div count(1)").as("conv_full_pm"))

  /** q127: SFT chat-template rendering with loss-mask spans
    * ([[Sft.renderChat]] over [[Sessionize.assign]] sessions) — each
    * user's 24-hour-gap session (~8 turns at sf0.01 — multi-turn on
    * purpose, a 30-min gap gave 91% singleton conversations and never
    * exercised the offset arithmetic) becomes one training conversation:
    * click/view/signup turns are the "user" side, purchase/error the
    * "assistant" side, and every assistant turn's content span lands in
    * `mask_starts`/`mask_ends` (0-based character offsets into
    * `rendered`). ONE user-keyed exchange serves the sessionizer, the
    * offset windows, and the per-session rollup (plan-pinned).
    *
    * PUBLIC projection emits the mask arrays as canonical JSON strings
    * (`to_json` — `[5,17]`, `[]` when empty): the driver's oracle
    * harness sorts result rows with pandas, which cannot factorize
    * array cells, so every registered query's output must be scalar-only
    * (pinned repo-wide in ContractSpec). [[Sft.renderChat]] keeps the
    * typed `array<long>` API for library users (SftSpec pins it).
    */
  def q127SftRender(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithUs(spark, d)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), cents(col("value")).as("value_c"))
    val sess = Sessionize.assign(ev, Seq(col("user_id")), col("ts_us"),
      col("event_id"), maxGap = OneDayUs)
    Sft.renderChat(sess, Seq(col("user_id"), col("session_seq")),
      col("ts_us"), col("event_id"),
      role = when(col("event_type").isin("click", "view", "signup"), "user")
        .otherwise("assistant"),
      content = concat(col("event_type"), lit("="), col("value_c")))
      .withColumn("mask_starts", to_json(col("mask_starts")))
      .withColumn("mask_ends", to_json(col("mask_ends")))
  }

  /** The curriculum mix for q185/q186: a deliberately skewed source mix
    * (src0 8×, src1 4×, src2 2×, the other seventeen 1×; LCM 8 keeps the
    * ladder strides at 1/2/4/8 — small integer keys).
    */
  private val CurriculumWeights: Map[String, Int] =
    (0 until 20).map(i => s"src$i" -> (i match {
      case 0 => 8; case 1 => 4; case 2 => 2; case _ => 1
    })).toMap

  /** q185: deterministic weighted curriculum order
    * ([[Ranks.interleave]]) — the source-mixed global training order
    * every pretraining loader needs, with exact positions and NO
    * single-partition window anywhere: per-source shuffle ranks come
    * from the bucketed-rank decomposition, the global position from the
    * closed-form ladder count (broadcast source stats, row-local
    * arithmetic). The oracle is the naive two-window form — equal
    * output, catastrophically different plan at scale.
    */
  def q185CurriculumOrder(spark: SparkSession, d: String): DataFrame =
    Ranks.interleave(
      Tables(spark, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars")),
      "source", "doc_id", "cur1", CurriculumWeights, nBuckets = 64)
      .select(col("pos"), col("doc_id"), col("source"), col("n_chars"))

  /** q186: prefix-mix audit over q185's order — per source, how many
    * docs land in the first 1/8, 1/4, 1/2, and all of the corpus (the
    * monitoring card that catches a broken interleave: a source's share
    * should track its weight until it exhausts). The checkpoint frame is
    * a 4-row broadcast; the theta-join is a broadcast nested loop over
    * it, a bounded 4× of one narrow column — never row×row.
    */
  def q186MixPrefixAudit(spark: SparkSession, d: String): DataFrame = {
    val ord = q185CurriculumOrder(spark, d).select(col("pos"), col("source"))
    val cps = ord.agg(count(lit(1)).as("total"))
      .select(explode(array(lit(1L), lit(2L), lit(4L), lit(8L))).as("m"),
        col("total"))
      .withColumn("cp", expr("(total * m) div 8"))
      .select(col("m"), col("cp"))
    ord.join(broadcast(cps), col("pos") <= col("cp"))
      .groupBy(col("m"), col("cp"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("m").as("checkpoint_eighths"),
        col("cp").as("checkpoint_rows"), col("source"), col("n_docs"))
  }

  /** q187: curriculum extension ([[Ranks.extendOrder]]) — the registry
    * form of q185: the even-id half is the standing ordered corpus with
    * its first half already served (watermark = ⌊N/2⌋, a one-scalar
    * count action); the odd-id half arrives. Served positions are frozen
    * verbatim; the unserved tail and the arrivals re-interleave behind
    * them, arrivals continuing each source's key ladder — so a training
    * run never revisits consumed data and never reshuffles what the
    * loader already scheduled. Same closed-form position machinery
    * (ladder remainders [c_g, e_g)), still no global window.
    */
  def q187CurriculumExtend(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val standing = docs.filter(col("doc_id") % 2 === 0)
    val arriving = docs.filter(col("doc_id") % 2 === 1)
    Ranks.extendOrder(standing, arriving, "source", "doc_id", "cur1",
        CurriculumWeights, servedRows = standing.count() / 2, nBuckets = 64)
      .select(col("pos"), col("doc_id"), col("source"), col("n_chars"),
        col("frozen"))
  }

  /** q188: two-epoch curriculum registry fold ([[Ranks.orderRegistry]] →
    * [[Ranks.extendRegistry]] ×2) — the composable form: each step
    * consumes the MATERIALIZED registry (payload + ladder index + pos),
    * freezes the watermark prefix, appends arrivals to each source's
    * ladder, and re-ranks only the tail. Thirds of the corpus arrive in
    * sequence (ids ≡ 0, 1, 2 mod 3); watermarks ⌊N₀/2⌋ then
    * ⌊(N₀+N₁)/2⌋. Every earlier watermark prefix survives every later
    * step (spec-pinned invariant: per-source order stays
    * ladder-ascending, so watermarks always cut ladder prefixes).
    */
  def q188CurriculumRegistry(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val p0 = docs.filter(col("doc_id") % 3 === 0)
    val p1 = docs.filter(col("doc_id") % 3 === 1)
    val p2 = docs.filter(col("doc_id") % 3 === 2)
    val (n0, n1) = (p0.count(), p1.count())
    val reg0 = Ranks.orderRegistry(p0, "source", "doc_id", "cur1",
      CurriculumWeights, nBuckets = 64)
    val reg1 = Ranks.extendRegistry(reg0, p1, "source", "doc_id", "cur1",
      CurriculumWeights, servedRows = n0 / 2, nBuckets = 64)
    val reg2 = Ranks.extendRegistry(reg1, p2, "source", "doc_id", "cur1",
      CurriculumWeights, servedRows = (n0 + n1) / 2, nBuckets = 64)
    reg2.select(col("pos"), col("doc_id"), col("source"), col("n_chars"),
      col("frozen"))
  }

  /** q190: shard manifest over q185's order — the export step: the
    * curriculum cut into fixed-size sequential shards (shard =
    * (pos−1) div 100), manifest row per shard with position range,
    * doc/char totals, per-shard source spread, and an order-sensitive
    * id checksum (md5 of the comma-joined ids IN POSITION ORDER — a
    * loader can verify a shard file against the manifest without
    * re-sorting). One shuffle: the manifest agg groups by shard; the
    * checksum's sort is per-shard (bounded by shard size, a knob —
    * never a global window).
    */
  def q190CurriculumShards(spark: SparkSession, d: String): DataFrame =
    q185CurriculumOrder(spark, d)
      .withColumn("shard", expr("(pos - 1) div 100"))
      .groupBy(col("shard"))
      .agg(min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"),
        md5(array_join(transform(array_sort(collect_list(
            struct(col("pos"), col("doc_id")))),
          x => x.getField("doc_id").cast("string")), ",")).as("ids_md5"))

  /** q192: global deterministic shuffle ([[Ranks.shuffleRank]] with no
    * groups) — the plain "shuffle the corpus, reproducibly" op, distinct
    * from q185's weighted mixing. This is the path where the naive twin
    * is a SINGLE task (`row_number()` with no PARTITION BY sorting the
    * whole corpus); the bucketed decomposition keeps the only
    * single-partition window on the 64-row bucket aggregate.
    */
  def q192GlobalShuffle(spark: SparkSession, d: String): DataFrame =
    Ranks.shuffleRank(
      Tables(spark, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars")),
      Seq.empty, "doc_id", "shuf1", nBuckets = 64, out = "pos")
      .select(col("pos"), col("doc_id"), col("source"), col("n_chars"))

  /** q193: mixing-quality card — the ordering ablation: sequential
    * (doc_id), uniform shuffle (q192), and weighted curriculum (q185)
    * compared on the adjacency signal that matters to training (long
    * same-source runs = correlated gradients): per ordering, adjacent
    * same-source pair count, the share in parts-per-million, and the
    * most-repeated adjacent source. Adjacency is a `pos ⟷ pos+1`
    * EQUI-JOIN on the unique position — the naive form is a global
    * `lag()` window, one task over the corpus (the oracle uses it; the
    * engine must not).
    */
  def q193MixingQuality(spark: SparkSession, d: String): DataFrame = {
    def adjacency(ordered: DataFrame, name: String): DataFrame = {
      val a = ordered.select(col("pos"), col("source"))
      val adj = a.join(
        a.select((col("pos") - 1).as("pos"), col("source").as("next_source")),
        Seq("pos"))
      // the TRUE mode of same-source adjacencies (count per source, ties
      // to the lexicographically smallest — r15 advice: the old
      // max(when(...)) reported the lexicographically LARGEST repeating
      // source, not the most-repeated one). Two-level aggregate: per
      // source first (bounded by |sources|), then the argmax as
      // min(struct(-count, source)) — no window, no collect.
      val bySource = adj.groupBy(col("source"))
        .agg(count(lit(1)).as("n_adj_s"),
          sum(when(col("source") === col("next_source"), 1L).otherwise(0L))
            .as("n_same_s"))
      bySource.groupBy(lit(name).as("ordering"))
        .agg(sum(col("n_adj_s")).as("n_adjacent"),
          sum(col("n_same_s")).as("n_same"),
          min(when(col("n_same_s") > 0,
            struct((-col("n_same_s")).as("nc"), col("source").as("s"))))
            .as("__m"))
        .withColumn("mode_same_source", col("__m.s"))
        .drop("__m")
        .withColumn("same_ppm",
          expr("(n_same * 1000000) div n_adjacent"))
    }
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    // sequential = arrival order: doc_ids are contiguous from 0 by the
    // generator contract, so the position is doc_id + 1 directly. The
    // contract is CHECKED loudly: with id gaps the pos⟷pos+1 equi-join
    // silently drops pairs while the oracle's lead() does not — the
    // divergence class that must fail as an error, not a hash mismatch.
    val bounds = docs.agg(count(lit(1)).as("n"), max(col("doc_id")).as("m"))
      .collect().head
    require(bounds.getLong(1) == bounds.getLong(0) - 1,
      s"doc_ids not contiguous from 0 (n=${bounds.getLong(0)}, " +
        s"max=${bounds.getLong(1)}); the sequential leg needs the " +
        "generator's contiguity contract")
    val sequential = docs
      .withColumn("pos", col("doc_id") + 1)
      .select(col("pos"), col("source"))
    adjacency(sequential, "sequential")
      .unionByName(adjacency(q192GlobalShuffle(spark, d), "shuffled"))
      .unionByName(adjacency(q185CurriculumOrder(spark, d), "curriculum"))
  }

  /** q196: late-arrival audit — the batch twin of what a streaming
    * watermark decides: per user (arrival proxy = event_id, the
    * generator's insertion order), an event's lateness is how far its
    * event time sits behind the user's running event-time maximum at
    * arrival. The card bills lateness into exact buckets (on-time /
    * ≤1h / ≤1d / >1d) with counts and value mass — the evidence for
    * choosing `withWatermark` delays: everything in a bucket below the
    * chosen delay survives, everything above is silently dropped by the
    * streaming form. One shuffle: the running max is a user-partitioned
    * window (millions of users at production scale — never global).
    *
    * The driver generator emits event ids in per-user time order, which
    * would leave every event on_time and the buckets untested at
    * runtime — so the query INJECTS deterministic out-of-orderness (the
    * q95 injected-NaN convention): 10% of events (by portable hash
    * parity) have their event time pulled back by hash-chosen 0–2 days.
    * The oracle applies the identical perturbation.
    */
  def q196LateArrivals(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Text.baseHash32(concat(lit("late:"), col("event_id")))
    val ev = Tables.eventsWithUs(spark, d)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        cents(col("value")).as("value_c"))
      .withColumn("ts_us", col("ts_us") -
        when(h % 10 === 0, (h % 172800L) * 1000000L).otherwise(0L))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val lateness = ev
      .withColumn("hwm", max(col("ts_us")).over(w))
      .withColumn("late_us",
        greatest(lit(0L), col("hwm") - col("ts_us")))
      .withColumn("bucket",
        when(col("hwm").isNull || col("late_us") === 0L, "on_time")
          .when(col("late_us") <= 3600L * 1000000, "late_1h")
          .when(col("late_us") <= 86400L * 1000000, "late_1d")
          .otherwise("late_over_1d"))
    lateness.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_c")).as("value_c"),
        max(col("late_us")).as("max_late_us"))
  }

  /** q198: no-straddle packing card ([[Packing.packNoStraddle]]) — the
    * long-context layout where documents never split across packs:
    * greedy next-fit per deterministic shard stream, per-pack waste
    * billed (never hidden), oversize docs (> budget, here 64 tokens so
    * the flag is non-vacuous on the driver corpus) isolated in their
    * own flagged packs. The per-shard fold is the sanctioned
    * mapPartitions case (running sum WITH RESETS — no window expresses
    * it); the oracle replays it as a per-shard recursive CTE.
    */
  def q198PackNoStraddle(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
    graft.operators.Packing.packNoStraddle(docs, "doc_id", "n_tok",
        budget = 64L, shards = 8, salt = "pk2")
      .groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("used_tok"),
        greatest(lit(0L), lit(64L) - sum(col("n_tok"))).as("waste_tok"),
        sum(when(col("oversize"), 1L).otherwise(0L)).as("n_oversize"))
  }

  /** q199: packing-order ablation — the tradeoff q198 leaves implicit,
    * measured: order-preserving next-fit (the deterministic shuffle —
    * training order intact) vs next-fit-DECREASING (cost descending —
    * classical bin-packing, better fill, training order destroyed).
    * One row per strategy: packs, used, waste, oversize. The decreasing
    * leg reuses [[Packing.packNoStraddle]] with the cost-descending
    * order override; same budget/shards/salt so only the order moves.
    */
  def q199PackOrderAblation(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
    def card(name: String, order: Seq[org.apache.spark.sql.Column]) =
      graft.operators.Packing.packNoStraddle(docs, "doc_id", "n_tok",
          budget = 64L, shards = 8, salt = "pk2", order = order)
        .groupBy(col("shard"), col("pack"))
        .agg(sum(col("n_tok")).as("used"),
          sum(when(col("oversize"), 1L).otherwise(0L)).as("n_over"))
        .agg(lit(name).as("strategy"),
          count(lit(1)).as("n_packs"),
          sum(col("used")).as("used_tok"),
          sum(greatest(lit(0L), lit(64L) - col("used"))).as("waste_tok"),
          sum(col("n_over")).as("n_oversize"))
    card("arrival_hash", Seq.empty)
      .unionByName(card("size_desc", Seq(-col("n_tok"))))
  }

  /** q200: the ordered-pipeline capstone card — the new family chained
    * end-to-end the way a pretraining data build runs it: exact dedup
    * (normalized-fp first-wins, min doc_id), quality gate
    * (quality_milli ≥ 500, the exact-integer threshold), weighted
    * curriculum interleave over the survivors, then no-straddle packing
    * per worker shard CONSUMING THE CURRICULUM ORDER (each hash shard
    * is one data-parallel worker's stream; within it, packs fill in
    * position order — the override q199 added). One manifest row per
    * shard: docs, packs, used, waste.
    */
  def q200OrderedPipeline(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
    // D1 first-wins on the normalized content fingerprint
    val deduped = graft.operators.Dedup.keepFirst(
      docs.withColumn("fp", md5(Text.normalized(col("text")))),
      Seq(col("fp")), Seq(col("doc_id").asc)).drop("fp")
    // exact-integer quality gate (the q165 formula, threshold 500)
    val gated = deduped
      .join(graft.queries.LlmPipelines.q24TextStats(spark, d)
        .select(col("doc_id"), col("quality_milli")), Seq("doc_id"))
      .filter(col("quality_milli") >= 500L)
    val ordered = Ranks.interleave(
      gated.select(col("doc_id"), col("source"), col("n_tok")),
      "source", "doc_id", "cur1", CurriculumWeights, nBuckets = 64)
    graft.operators.Packing.packNoStraddle(ordered, "doc_id", "n_tok",
        budget = 256L, shards = 8, salt = "pk2",
        order = Seq(col("pos")))
      .groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("used"))
      .groupBy(col("shard"))
      .agg(sum(col("nd")).as("n_docs"), count(lit(1)).as("n_packs"),
        sum(col("used")).as("used_tok"),
        sum(greatest(lit(0L), lit(256L) - col("used"))).as("waste_tok"))
  }

  /** q201: shard-manifest diff across a curriculum extension — the
    * incremental-EXPORT payoff of the frozen prefix: q190's manifest
    * taken before and after q187's extension, joined by shard, each
    * shard classified `unchanged` (checksum equal — the shard file
    * needs no rewrite), `rewritten`, or `new`. Because served positions
    * freeze verbatim, every 100-row shard wholly inside the watermark
    * is provably unchanged — an extension's export cost is the
    * unfrozen tail, not the corpus. Order-sensitive checksums make the
    * classification exact.
    */
  def q201ManifestDiff(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("source"))
    val standing = docs.filter(col("doc_id") % 2 === 0)
    val arriving = docs.filter(col("doc_id") % 2 === 1)
    def manifest(ordered: DataFrame) = ordered
      .withColumn("shard", expr("(pos - 1) div 100"))
      .groupBy(col("shard"))
      .agg(md5(array_join(transform(array_sort(collect_list(
          struct(col("pos"), col("doc_id")))),
        x => x.getField("doc_id").cast("string")), ",")).as("ids_md5"))
    val before = manifest(Ranks.interleave(standing, "source", "doc_id",
      "cur1", CurriculumWeights, nBuckets = 64))
    val after = manifest(Ranks.extendOrder(standing, arriving, "source",
        "doc_id", "cur1", CurriculumWeights,
        servedRows = standing.count() / 2, nBuckets = 64)
      .select(col("pos"), col("doc_id")))
    before.select(col("shard"), col("ids_md5").as("md5_before"))
      .join(after.select(col("shard"), col("ids_md5").as("md5_after")),
        Seq("shard"), "full_outer")
      .select(col("shard"),
        when(col("md5_before").isNull, "new")
          .when(col("md5_before") === col("md5_after"), "unchanged")
          .otherwise("rewritten").as("status"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q201_manifest_diff" -> q201ManifestDiff _,
    "q200_ordered_pipeline" -> q200OrderedPipeline _,
    "q199_pack_order_ablation" -> q199PackOrderAblation _,
    "q198_pack_nostraddle" -> q198PackNoStraddle _,
    "q196_late_arrivals" -> q196LateArrivals _,
    "q193_mixing_quality" -> q193MixingQuality _,
    "q192_global_shuffle" -> q192GlobalShuffle _,
    "q190_curriculum_shards" -> q190CurriculumShards _,
    "q185_curriculum_order" -> q185CurriculumOrder _,
    "q186_mix_prefix_audit" -> q186MixPrefixAudit _,
    "q187_curriculum_extend" -> q187CurriculumExtend _,
    "q188_curriculum_registry" -> q188CurriculumRegistry _,
    "q127_sft_render" -> q127SftRender _,
    "q119_funnel3" -> q119Funnel3 _,
    "q122_funnel4" -> q122Funnel4 _,
    "q116_cohort_retention" -> q116CohortRetention _,
    "q44_asof_join" -> q44AsofJoin _,
    "q45_range_join" -> q45RangeJoin _,
    "q46_hash_split" -> q46HashSplit _,
    "q156_drift_tvd" -> q156DriftTvd _,
    "q158_drift_registry" -> q158DriftRegistry _,
    "q159_snapshot_diff" -> q159SnapshotDiff _,
    "q160_padded_batches" -> q160PaddedBatches _,
    "q48_sequence_packing" -> q48SequencePacking _,
    "q49_quality_gate" -> q49QualityGate _,
    "q52_asof_nearest" -> q52AsofNearest _,
    "q54_balanced_mix" -> q54BalancedMix _,
    "q56_interval_overlap" -> q56IntervalOverlap _,
    "q59_sessionize" -> q59Sessionize _,
    "q66_salted_join" -> q66SaltedJoin _,
    "q68_funnel" -> q68Funnel _,
    "q69_rolling_window" -> q69RollingWindow _,
    "q86_zorder_layout" -> q86ZorderLayout _,
    "q88_time_split" -> q88TimeSplit _,
    "q89_decayed_features" -> q89DecayedFeatures _,
    "q90_stratified_sample" -> q90StratifiedSample _,
    "q123_temperature_resample" -> q123TemperatureResample _,
  )
}
