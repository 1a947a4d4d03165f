package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Keys
import graft.operators.Dedup
import graft.schema.Payloads
import graft.sources.Tables

/** The reference's JSONB document pipelines (F9 full): payload construction
  * → `from_json` with declared StructTypes → field extraction / `explode` →
  * content keys → dedup. The driver test tables carry no nested payloads,
  * so each query first *renders* a reference-shaped JSON payload column from
  * relational columns, then runs the real parse pipeline over those strings
  * — the oracle recomputes the same result relationally, so a hash match
  * proves the JSON round-trip is lossless and the extraction rules are
  * correct.
  *
  * Scale note: `from_json`/`explode` are codegen'd row-local operators — no
  * shuffle; the only shuffles below are the final keyed aggregations. At
  * 100 TB the payload column arrives from the source already, and these
  * plans are unchanged.
  */
object JsonPipelines {

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** q21: payment extraction with the v1/v2 shape fallback (reference
    * `src/blockchain_queries.py:233-262`). Even order keys render as
    * payment_v1, odd as payment_v2 (single-element payments array — the
    * reference only ever reads payments[0]); extraction coalesces both
    * schemas. `_key` = md5 of the raw payload (D1), vertex refs F6.
    */
  def q21PaymentJsonPipeline(spark: SparkSession, d: String): DataFrame = {
    val payer = concat(lit("acct"), col("o_custkey"))
    val payee = concat(lit("acct"), col("o_custkey") * 7 % 1500)
    val amount = cents(col("o_totalprice"))
    val payload = when(col("o_orderkey") % 2 === 0,
        to_json(struct(payer.as("payer"), payee.as("payee"), amount.as("amount"))))
      .otherwise(
        to_json(struct(payer.as("payer"),
          array(struct(payee.as("payee"), amount.as("amount"))).as("payments"))))

    val raw = Tables.balanced(spark, d, "orders").select(payload.as("payload"))
    val (pPayer, pPayee, pAmount) = Payloads.paymentFields(col("payload"))
    raw.select(
        md5(col("payload")).as("_key"), // D1: content-hash of the payload
        Keys.vertexRef("accounts", pPayer).as("_from"),
        Keys.vertexRef("accounts", pPayee).as("_to"),
        pAmount.as("amount_c"))
      .distinct() // identical payloads collapse (onDuplicate='ignore')
  }

  /** q22: the witness fan-out pipeline — poc_receipts_v1 parse → explode of
    * path[0].witnesses → F10 struct merge (edge fields + witness payload
    * fields in one row) → D2 pair-key newest-wins dedup (reference
    * `src/blockchain_queries.py:291-319`). Receipts are rendered one per
    * order from its lineitems (array ordered by line number so the payload
    * is deterministic); the oracle recomputes relationally with the same
    * window.
    */
  def q22WitnessExplodePipeline(spark: SparkSession, d: String): DataFrame = {
    val receipts = Tables.balanced(spark, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber").cast("long").as("timestamp"),
        concat(lit("gw"), col("l_suppkey")).as("gateway"),
        cents(col("l_quantity")).as("signal"),
        col("l_discount").as("snr"),
        (col("l_returnflag") =!= lit("R")).as("is_valid")))).as("ws"))
      .select(col("l_orderkey"),
        to_json(struct(array(struct(
          concat(lit("ch"), col("l_orderkey")).as("challengee"),
          col("ws").as("witnesses"))).as("path"))).as("payload"))

    val (challengee, witnesses) = Payloads.receiptFields(col("payload"))
    val exploded = receipts
      .select(col("l_orderkey"), challengee.as("challengee"), explode(witnesses).as("w"))
      .select(col("l_orderkey"), col("challengee"),
        // F10 dict-merge: edge fields + all witness payload fields flat
        col("w.gateway").as("gateway"), col("w.signal").as("signal_c"),
        col("w.timestamp").as("ts"), col("w.is_valid").as("is_valid"),
        Keys.pairKey(col("challengee"), col("w.gateway")).as("_key"))
    // P6 boolean edge filter + D2 newest-wins per ordered pair. The dedup
    // partitions on (l_orderkey, gateway) — the same equivalence classes as
    // `_key` = md5(challengee‖gateway), since challengee is 1:1 with
    // l_orderkey — so the window's ClusteredDistribution is already
    // satisfied by the render aggregation's HashPartitioning(l_orderkey):
    // zero extra shuffle, just a partition-local sort (keying the window by
    // `_key` itself re-shuffled every exploded row). The high-dup
    // production witness stream uses [[Dedup.newestWinsAgg]] — see
    // Collections.witnesses.
    Dedup.newestWins(exploded.filter(col("is_valid")),
        Seq(col("l_orderkey"), col("gateway")), col("ts"), col("signal_c"))
      .select(col("_key"), col("challengee"), col("gateway"),
        col("signal_c"), col("ts"))
  }

  /** q23: multi-payee explode-all (the sane extension the reference lacks —
    * it drops payments[1..n], `src/blockchain_queries.py:255-256`).
    * Renders payment_v2 payloads with 1-3 payees per order, posexplodes
    * every sub-payment, keys each by (payload hash, index).
    */
  def q23PaymentV2ExplodeAll(spark: SparkSession, d: String): DataFrame = {
    val mkPayee = (i: Int) => struct(
      concat(lit("acct"), (col("o_custkey") * (7 + i)) % 1500).as("payee"),
      (cents(col("o_totalprice")) + i).as("amount"))
    val payload = to_json(struct(
      concat(lit("acct"), col("o_custkey")).as("payer"),
      when(col("o_orderkey") % 3 === 0, array(mkPayee(0)))
        .when(col("o_orderkey") % 3 === 1, array(mkPayee(0), mkPayee(1)))
        .otherwise(array(mkPayee(0), mkPayee(1), mkPayee(2))).as("payments")))

    Tables.balanced(spark, d, "orders").select(payload.as("payload"))
      .select(md5(col("payload")).as("payload_key"),
        from_json(col("payload"), Payloads.paymentV2).getField("payer").as("payer"),
        posexplode(Payloads.explodePaymentsV2(col("payload"))))
      .select(concat(col("payload_key"), lit(":"), col("pos")).as("_key"),
        col("payer"), col("col.payee").as("payee"), col("col.amount").as("amount_c"))
      .groupBy(col("payer"))
      .agg(count(lit(1)).as("n_subpayments"),
        sum(col("amount_c")).as("total_c"),
        min(col("_key")).as("min_key"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_payment_json_pipeline" -> q21PaymentJsonPipeline _,
    "q22_witness_explode_pipeline" -> q22WitnessExplodePipeline _,
    "q23_payment_v2_explode_all" -> q23PaymentV2ExplodeAll _,
  )
}
