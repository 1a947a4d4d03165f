package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared StructTypes for the reference's JSONB payload shapes and the
  * extraction rules over them (SURVEY.md §1.3, F9).
  *
  * The reference reads three shapes out of `transactions.fields`:
  * payment_v1 (reference `src/blockchain_queries.py:244-250`), payment_v2
  * (`:251-257`), and poc_receipts_v1 (`:299-314`). Parsing is schema-first
  * (`from_json` with a declared StructType, never schema inference) so the
  * scan stays columnar and malformed payloads surface as nulls, mirroring
  * the reference's try/except shape fallback.
  */
object Payloads {

  /** payment_v1: flat payer→payee. */
  val paymentV1: StructType = StructType(Seq(
    StructField("payer", StringType),
    StructField("payee", StringType),
    StructField("amount", LongType)))

  /** payment_v2: payer → payments[{payee, amount}]. The reference keeps
    * only `payments[0]` and silently drops additional payees
    * (`src/blockchain_queries.py:255-256`) — [[paymentFields]] reproduces
    * that for parity; [[explodePaymentsV2]] is the sane explode-all
    * extension.
    */
  val paymentV2: StructType = StructType(Seq(
    StructField("payer", StringType),
    StructField("payments", ArrayType(StructType(Seq(
      StructField("payee", StringType),
      StructField("amount", LongType)))))))

  /** poc_receipts_v1: path[0].challengee + path[0].witnesses[] (the witness
    * fan-out, `src/blockchain_queries.py:303-314`).
    */
  val witness: StructType = StructType(Seq(
    StructField("gateway", StringType),
    StructField("signal", LongType),
    StructField("snr", DoubleType),
    StructField("is_valid", BooleanType),
    StructField("timestamp", LongType)))

  val pocReceiptV1: StructType = StructType(Seq(
    StructField("path", ArrayType(StructType(Seq(
      StructField("challengee", StringType),
      StructField("witnesses", ArrayType(witness))))))))

  /** Union of the v1/v2 shapes: ONE parse covers both (absent fields read
    * null), halving Jackson work versus parsing under each schema.
    */
  private val paymentAny: StructType = StructType(Seq(
    StructField("payer", StringType),
    StructField("payee", StringType),
    StructField("amount", LongType),
    StructField("payments", ArrayType(StructType(Seq(
      StructField("payee", StringType),
      StructField("amount", LongType)))))))

  /** v1/v2 fallback extraction — the declarative twin of the reference's
    * try/except (`src/blockchain_queries.py:244-257`): a single parse
    * under the union schema, coalescing the v1 scalars with payments[0].
    * Returns (payer, payee, amount); v2 keeps only payments[0] (reference
    * parity quirk).
    */
  def paymentFields(payload: Column): (Column, Column, Column) = {
    val f = from_json(payload, paymentAny)
    (f.getField("payer"),
     coalesce(f.getField("payee"), f.getField("payments").getItem(0).getField("payee")),
     coalesce(f.getField("amount"), f.getField("payments").getItem(0).getField("amount")))
  }

  /** Explode-all extension for multi-payee payment_v2 (posexplode keeps the
    * payee index so downstream keys stay unique per sub-payment).
    */
  def explodePaymentsV2(payload: Column): Column =
    from_json(payload, paymentV2).getField("payments")

  /** poc receipt → (challengee, witnesses array) ready for `explode`. */
  def receiptFields(payload: Column): (Column, Column) = {
    val f = from_json(payload, pocReceiptV1)
    (f.getField("path").getItem(0).getField("challengee"),
     f.getField("path").getItem(0).getField("witnesses"))
  }
}
