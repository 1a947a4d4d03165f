package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the 11 relational source tables (SURVEY.md §1.2,
  * mirroring reference `src/blockchain_tables.py`) and the 6 output
  * document/edge collections (§1.4, `src/arango_schema.py`). Schemas are
  * declared, never inferred — the reference is schema-first and inference
  * at 100 TB means an extra pass over the data.
  *
  * Type mapping (§1.3): BigInteger → LongType (amounts are integer "bones";
  * DoubleType would lose precision on sums), Enum → StringType (the
  * reference's enum *values* alias each other — `poc_receipts_v1 = vars_v1
  * = 14`, `src/blockchain_types.py:18-19` — so only labels are safe),
  * JSONB → StringType parsed via [[Payloads]].
  */
object Blockchain {

  private def s(name: String) = StructField(name, StringType)
  private def l(name: String) = StructField(name, LongType)
  private def i(name: String) = StructField(name, IntegerType)
  private def d(name: String) = StructField(name, DoubleType)
  private def t(name: String) = StructField(name, TimestampType)
  private def b(name: String) = StructField(name, BooleanType)

  /** `accounts` — per-block account state (`blockchain_tables.py:14-30`). */
  val accounts: StructType = StructType(Seq(
    l("block"), s("address"), l("dc_balance"), l("dc_nonce"),
    l("security_balance"), l("security_nonce"), l("balance"), l("nonce"),
    l("staked_balance")))

  /** `account_inventory` (`blockchain_tables.py:33-50`). */
  val accountInventory: StructType = StructType(Seq(
    s("address"), l("balance"), l("nonce"), l("dc_balance"), l("dc_nonce"),
    l("security_balance"), l("security_nonce"), l("first_block"),
    l("last_block"), l("staked_balance")))

  /** `transaction_actors` (`blockchain_tables.py:53-65`). */
  val transactionActors: StructType = StructType(Seq(
    s("actor"), s("actor_role"), s("transaction_hash"), l("block")))

  /** `transactions` — `fields` is the JSONB payload column
    * (`blockchain_tables.py:68-81`).
    */
  val transactions: StructType = StructType(Seq(
    l("block"), s("hash"), s("type"), StructField("fields", StringType),
    l("time")))

  /** `gateways` — per-block gateway state (`blockchain_tables.py:84-107`). */
  val gateways: StructType = StructType(Seq(
    l("block"), s("address"), s("owner"), s("location"), l("last_poc_challenge"),
    s("last_poc_onion_key_hash"), s("witnesses"), l("first_block"),
    l("last_block"), l("nonce"), s("name"), t("first_timestamp"),
    d("reward_scale"), i("elevation"), i("gain"), s("location_hex"),
    s("mode"), s("payer")))

  /** `gateway_inventory` (`blockchain_tables.py:110-135`). */
  val gatewayInventory: StructType = StructType(Seq(
    s("address"), s("owner"), s("location"), l("last_poc_challenge"),
    s("last_poc_onion_key_hash"), l("first_block"), l("last_block"),
    l("nonce"), s("name"), t("first_timestamp"), d("reward_scale"),
    i("elevation"), i("gain"), s("location_hex"), s("mode"), s("payer")))

  /** `gateway_status` (`blockchain_tables.py:138-153`). */
  val gatewayStatus: StructType = StructType(Seq(
    s("address"), s("online"), s("block"), s("updated_at"),
    s("listen_addrs"), s("poc_interval"), t("peer_timestamp")))

  /** `rewards` (`blockchain_tables.py:156-170`). */
  val rewards: StructType = StructType(Seq(
    l("block"), s("transaction_hash"), l("time"), s("account"), s("gateway"),
    l("amount")))

  /** `dc_burns` — declared but never queried by the reference
    * (`blockchain_tables.py:173-188`); kept for source parity.
    */
  val dcBurns: StructType = StructType(Seq(
    l("block"), s("transaction_hash"), s("actor"), s("type"), l("amount"),
    l("oracle_price"), l("time")))

  /** `blocks` (`blockchain_tables.py:191-211`). */
  val blocks: StructType = StructType(Seq(
    l("height"), l("time"), t("timestamp"), s("prev_hash"), s("block_hash"),
    i("transaction_count"), l("hbbft_round"), l("election_epoch"),
    l("epoch_start"), s("rescue_signature"), l("snapshot_hash")))

  /** `locations` (`blockchain_tables.py:214-232`). */
  val locations: StructType = StructType(Seq(
    s("location"), s("long_street"), s("short_street"), s("long_city"),
    s("short_city"), s("long_state"), s("short_state"), s("long_country"),
    s("short_country"), s("city_id")))

  // ---- Output document contracts (§1.4, `src/arango_schema.py`) ----

  case class GeoPoint(coordinates: Seq[Option[Double]], `type`: String)
  case class LocationDetails(city_id: Option[String], long_city: Option[String],
    long_state: Option[String], long_country: Option[String],
    city_key: Option[String])

  /** `hotspots` vertex (`arango_schema.py:32-61`): inventory fields +
    * status + geo + analytics (null until the metrics stage fills them,
    * `blockchain_queries.py:161-163`).
    */
  case class HotspotDoc(_key: String, address: String, owner: Option[String],
    location: Option[String], name: Option[String], mode: Option[String],
    elevation: Option[Int], gain: Option[Int], reward_scale: Option[Double],
    status: Option[String], geo_location: Option[GeoPoint],
    location_details: Option[LocationDetails], rewards_5d: Option[Long],
    betweenness_centrality: Option[Double], betweenness_centrality_n: Option[Double],
    pagerank: Option[Double], pagerank_n: Option[Double],
    hub_score: Option[Double], authority_score: Option[Double])

  /** `accounts` vertex (`arango_schema.py:64-79`). */
  case class AccountDoc(_key: String, address: String, balance: Long,
    dc_balance: Long, security_balance: Long, staked_balance: Long,
    nonce: Long, first_block: Long, last_block: Long)

  /** `payments` edge (`arango_schema.py:82-92`): `_key` = content hash. */
  case class PaymentEdge(_key: String, _from: String, _to: String,
    amount: Long, time: Long)

  /** `witnesses` edge (`arango_schema.py:118-133`): `_key` = ordered pair
    * hash, newest receipt wins.
    */
  case class WitnessEdge(_key: String, _from: String, _to: String,
    snr: Option[Double], signal: Option[Long], time: Long,
    is_valid: Option[Boolean])

  /** `cities` vertex (`arango_schema.py:105-115`): `_key` = md5(city_id). */
  case class CityDoc(_key: String, city_id: String, long_city: Option[String],
    long_state: Option[String], long_country: Option[String])

  /** `balances` time-series doc (`arango_schema.py:95-102`). */
  case class DailyBalance(date: String, balance: Long, staked_balance: Long,
    dc_balance: Long)
  case class BalanceDoc(_key: String, address: String,
    daily_balances: Seq[DailyBalance])
}
