package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Span-corruption training-example construction — the T5 denoising
  * objective's data side (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning…", §3.1.4; also UL2's R-denoiser): mask contiguous
  * token spans, replace each span with a numbered sentinel in the INPUTS,
  * and emit the spans behind their sentinels as the TARGETS.
  *
  * Determinism contract (the repo's no-rng rule): each position's mask
  * decision is `md5(doc:pos) mod 1000 < rate_pm/1000` — a hash-Bernoulli,
  * reproducible on any engine, so the oracle rebuilds the exact same
  * examples. Consecutive masked positions form one span (run grouping via
  * the `pos − row_number()` trick — the same algebra as
  * [[TextDedup.spanDedup]]'s runs and [[Bpe]]'s merge passes), which
  * yields geometric-ish span lengths rather than T5's fixed mean-3
  * sampling; the corruption RATE is exact in expectation and the
  * construction is the published one. Sentinels are `<extra_id_k>`,
  * k in span-start order, 0-based — the T5 vocabulary convention.
  *
  * Scale shape: one explode (row-local), every window keyed by the doc
  * (ONE keyed shuffle — all four windows and the final rollup share the
  * `partitionBy(doc)` clustering), no driver state, no cross-doc
  * dependency. Pack the emitted examples with [[Packing.firstFit]] for
  * fixed-length batches — composition, not new machinery.
  */
object SpanCorrupt {

  /** Build one (inputs, targets) example per document.
    *
    * @param ratePm corruption rate in parts-per-mille (150 = 15%).
    * @return (id, n_tokens, n_spans, n_masked, inputs, targets)
    */
  def examples(docs: DataFrame, id: String, text: String,
               ratePm: Int = 150): DataFrame = {
    require(ratePm >= 0 && ratePm <= 1000, s"ratePm out of [0,1000]: $ratePm")
    val byDoc = Window.partitionBy(col(id))
    val byPos = byDoc.orderBy(col("pos"))
    val ex = docs
      .select(col(id), posexplode(Text.tokens(col(text))).as(Seq("pos0", "tok")))
      .select(col(id), (col("pos0") + 1).as("pos"), col("tok"))
      .withColumn("masked",
        pmod(Text.baseHash32(concat(col(id).cast("string"), lit(":"),
          col("pos").cast("string"))), lit(1000L)) < ratePm)
    // runs of consecutive masked positions → span id in start order.
    // grp = pos − running-masked-count: constant within a run, strictly
    // larger across the unmasked gap to the next run. The dense_rank
    // ordering key keeps unmasked rows NON-NULL and LAST (engines
    // disagree on default null ordering), so spans rank 1..n → 0-based.
    val runs = ex
      .withColumn("mrn",
        sum(when(col("masked"), 1).otherwise(0)).over(byPos))
      .withColumn("grp", when(col("masked"), col("pos") - col("mrn")))
      .withColumn("span_id",
        when(col("masked"),
          dense_rank().over(
            byDoc.orderBy(coalesce(col("grp"), lit(Long.MaxValue)))) - 1))
    // span START rows carry the sentinel into the inputs; interior masked
    // rows vanish from the inputs; unmasked rows pass through.
    val spanStart = col("masked") &&
      coalesce(!lag(col("masked"), 1).over(byPos), lit(true))
    val rendered = runs
      .withColumn("in_tok",
        when(!col("masked"), col("tok"))
          .when(spanStart, concat(lit("<extra_id_"), col("span_id"), lit(">"))))
      .withColumn("tgt_tok",
        when(col("masked") && spanStart,
          concat(lit("<extra_id_"), col("span_id"), lit("> "), col("tok")))
          .when(col("masked"), col("tok")))
    rendered.groupBy(col(id))
      .agg(
        count(lit(1)).as("n_tokens"),
        (max(coalesce(col("span_id"), lit(-1))) + 1).cast("long").as("n_spans"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
        concat_ws(" ", sort_array(collect_list(
          when(col("in_tok").isNotNull,
            struct(col("pos"), col("in_tok"))))).getField("in_tok"))
          .as("inputs"),
        concat_ws(" ", sort_array(collect_list(
          when(col("tgt_tok").isNotNull,
            struct(col("pos"), col("tgt_tok"))))).getField("tgt_tok"))
          .as("targets"))
  }
}
