package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.Blockchain

/** Golden tests for the six collection builders over tiny Helium-shaped
  * fixtures conforming to [[graft.schema.Blockchain]].
  */
class CollectionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(schema: org.apache.spark.sql.types.StructType, rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("accounts: one doc per inventory row keyed by address") {
    val inv = df(Blockchain.accountInventory,
      Row("addr1", 100L, 1L, 10L, 0L, 5L, 0L, 1L, 9L, 0L),
      Row("addr2", 200L, 2L, 20L, 0L, 6L, 0L, 2L, 8L, 50L))
    val out = Collections.accounts(inv)
    assert(out.count() == 2)
    val r = out.filter($"_key" === "addr2").head()
    assert(r.getAs[Long]("balance") == 200L && r.getAs[Long]("staked_balance") == 50L)
  }

  test("cities: distinct rows, md5(city_id) key, null city_id dropped") {
    val loc = df(Blockchain.locations,
      Row("hexA", null, null, "San Francisco", null, "CA", null, "US", null, "sf"),
      Row("hexB", null, null, "San Francisco", null, "CA", null, "US", null, "sf"),
      Row("hexC", null, null, null, null, null, null, null, null, null))
    val out = Collections.cities(loc).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("_key") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex("sf"))
  }

  test("hotspots: left-join enrichment, null-safe geo, nested city_key") {
    val inv = df(Blockchain.gatewayInventory,
      Row("gw1", "own1", "hexA", 5L, null, 1L, 9L, 0L, "happy-gw", null, 1.0,
        10, 2, "8828308281fffff", "full", null),
      Row("gw2", "own2", null, null, null, 1L, 9L, 0L, "sad-gw", null, 0.5,
        null, null, null, "light", null))
    val st = df(Blockchain.gatewayStatus,
      Row("gw1", "online", null, null, null, null, null))
    val loc = df(Blockchain.locations,
      Row("hexA", null, null, "SF", null, "CA", null, "US", null, "sf"))
    val out = Collections.hotspots(inv, st, loc)
    assert(out.count() == 2)
    val g1 = out.filter($"_key" === "gw1").head()
    assert(g1.getAs[String]("status") == "online")
    assert(g1.getAs[Row]("geo_location") != null) // has a location_hex
    assert(g1.getAs[Row]("location_details").getAs[String]("city_key") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex("sf"))
    assert(g1.isNullAt(g1.fieldIndex("pagerank"))) // analytics null until G5
    val g2 = out.filter($"_key" === "gw2").head()
    assert(g2.getAs[String]("status") == null) // no status row (left join)
    assert(g2.isNullAt(g2.fieldIndex("geo_location"))) // P8 null-tolerant
  }

  test("payments: v1/v2 fallback, exclusive bounds, content-key dedup") {
    val mk = (h: String, ty: String, fields: String, time: Long) =>
      Row(1L, h, ty, fields, time)
    val txns = df(Blockchain.transactions,
      mk("h1", "payment_v1", """{"payer":"p1","payee":"q1","amount":5}""", 10L),
      mk("h2", "payment_v2", """{"payer":"p2","payments":[{"payee":"q2","amount":7}]}""", 20L),
      mk("h3", "payment_v1", """{"payer":"p1","payee":"q1","amount":5}""", 30L), // dup fields
      mk("h4", "payment_v1", """{"payer":"px","payee":"qx","amount":9}""", 100L), // out of range
      mk("h5", "poc_receipts_v1", """{}""", 15L)) // wrong type
    val out = Collections.payments(txns, minTime = 0L, maxTime = 100L)
    val rows = out.collect()
    assert(rows.length == 2) // dup payload collapsed; h4 excluded (exclusive max)
    val v2 = rows.find(_.getAs[String]("_from") == "accounts/p2").get
    assert(v2.getAs[String]("_to") == "accounts/q2" && v2.getAs[Long]("amount") == 7L)
  }

  test("witnesses: explode + pair key + newest receipt wins") {
    val w = (gw: String, snr: Double, valid: Boolean) =>
      s"""{"gateway":"$gw","snr":$snr,"signal":-80,"is_valid":$valid,"timestamp":1}"""
    val txns = df(Blockchain.transactions,
      Row(1L, "h1", "poc_receipts_v1",
        s"""{"path":[{"challengee":"ch1","witnesses":[${w("g1", 1.0, true)},${w("g2", 2.0, true)}]}]}""",
        10L),
      Row(2L, "h2", "poc_receipts_v1",
        s"""{"path":[{"challengee":"ch1","witnesses":[${w("g1", 9.0, false)}]}]}""",
        20L))
    val out = Collections.witnesses(txns, 0L, 100L).collect()
    assert(out.length == 2) // (ch1,g1) deduped newest-wins + (ch1,g2)
    val g1 = out.find(_.getAs[String]("_to") == "hotspots/g1").get
    assert(g1.getAs[Double]("snr") == 9.0) // the time=20 receipt won
    assert(!g1.getAs[Boolean]("is_valid")) // P6 value passed through
  }

  test("mergeMetrics writes analytics back onto hotspots, null where absent (G5)") {
    val inv = df(Blockchain.gatewayInventory,
      Row("gw1", "o", null, null, null, 1L, 9L, 0L, "n1", null, 1.0, 1, 1, null, "full", null),
      Row("gw2", "o", null, null, null, 1L, 9L, 0L, "n2", null, 1.0, 1, 1, null, "full", null))
    val hs = Collections.hotspots(inv,
      df(Blockchain.gatewayStatus), df(Blockchain.locations))
    val pr = Seq(("gw1", 500000L, 1200000L)).toDF("node", "value_pm", "norm_pm")
    val bc = Seq(("gw1", 250000L, 800000L)).toDF("node", "value_pm", "norm_pm")
    val out = Collections.mergeMetrics(hs, pr, bc)
    val g1 = out.filter($"_key" === "gw1").head()
    assert(g1.getAs[Double]("pagerank") == 0.5)
    assert(g1.getAs[Double]("pagerank_n") == 1.2)
    assert(g1.getAs[Double]("betweenness_centrality") == 0.25)
    val g2 = out.filter($"_key" === "gw2").head()
    assert(g2.isNullAt(g2.fieldIndex("pagerank"))) // no metrics → stays null
    assert(out.columns.count(_ == "pagerank") == 1) // no duplicate columns
    // hub/authority stay null unless a HITS frame is supplied (G4)
    assert(g1.isNullAt(g1.fieldIndex("hub_score")))
    val hits = Seq(("gw1", 1000000L, 0L)).toDF("node", "hub_pm", "auth_pm")
    val withHits = Collections.mergeMetrics(hs, pr, bc, Some(hits))
    val h1 = withHits.filter($"_key" === "gw1").head()
    assert(h1.getAs[Double]("hub_score") == 1.0)
    assert(h1.getAs[Double]("authority_score") == 0.0)
    val h2 = withHits.filter($"_key" === "gw2").head()
    assert(h2.isNullAt(h2.fieldIndex("hub_score")))
    assert(withHits.columns.count(_ == "hub_score") == 1)
    // The broadcast choice for small metric frames belongs to the PLANNER
    // (no broadcast() hint in the query — a forced broadcast is driver-bound
    // when metrics span every hotspot at scale). Pin that the planner still
    // picks it when the inputs measure small.
    withHits.foreach(_ => ()) // finalize AQE
    val plan = withHits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("cityGraphEdges: J6 traversal as joins — valid edges, city filter, haversine weight") {
    val hs = (addr: String, cityKey: String, lat: Double, lng: Double) =>
      (s"hotspots/$addr", addr, cityKey, Seq(lng, lat))
    val hotspots = Seq(
      hs("gw1", "sf", 37.0, -122.0),
      hs("gw2", "sf", 38.0, -122.0),
      hs("gw3", null, 0.0, 0.0)) // no city → its outbound edges drop
      .toDF("__ref", "address", "ck", "coords")
      .select(col("address"),
        struct(col("ck").as("city_key")).as("location_details"),
        struct(col("coords").as("coordinates"), lit("Point").as("type"))
          .as("geo_location"))
    val wit = Seq(
      ("hotspots/gw1", "hotspots/gw2", true),
      ("hotspots/gw2", "hotspots/gw1", false), // invalid → dropped (P6)
      ("hotspots/gw3", "hotspots/gw1", true))  // challengee has no city
      .toDF("_from", "_to", "is_valid")
    val out = Collections.cityGraphEdges(hotspots, wit).collect()
    assert(out.length == 1)
    val e = out.head
    assert(e.getAs[String]("city") == "sf" && e.getAs[String]("src") == "gw1"
      && e.getAs[String]("dst") == "gw2")
    // 1 degree of latitude ≈ 111.2 km on the spherical model
    assert(math.abs(e.getAs[Long]("w") - 111195L) < 200)
  }

  test("perCity metrics honor the min_city_size EDGE-count gate") {
    val edges = Seq(
      ("big", "a", "b", 1L), ("big", "b", "c", 1L), ("big", "c", "a", 1L),
      ("small", "x", "y", 1L))
      .toDF("city", "src", "dst", "w")
    val pr = graft.operators.GraphMetrics.perCityPagerank(edges, minEdges = 2)
    assert(pr.select("city").distinct().as[String].collect().toSet == Set("big"))
    val bc = graft.operators.GraphMetrics.perCityBetweenness(edges, minEdges = 2)
    assert(bc.select("city").distinct().as[String].collect().toSet == Set("big"))
  }

  test("balances: latest row per day, day-ordered series per account") {
    val acc = (block: Long, addr: String, bal: Long) =>
      Row(block, addr, 0L, 0L, 0L, 0L, bal, 0L, 0L)
    val blk = (h: Long, t: Long, ts: java.sql.Timestamp) =>
      Row(h, t, ts, null, null, null, null, null, null, null, null)
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val accounts = df(Blockchain.accounts,
      acc(1L, "a", 10L), acc(2L, "a", 20L), acc(3L, "a", 30L))
    val blocks = df(Blockchain.blocks,
      blk(1L, 1000L, ts("2024-01-01 05:00:00")),
      blk(2L, 2000L, ts("2024-01-01 23:00:00")), // same day, later → wins
      blk(3L, 3000L, ts("2024-01-02 01:00:00")))
    val out = Collections.balances(accounts, blocks).collect()
    assert(out.length == 1)
    val series = out(0).getSeq[Row](out(0).fieldIndex("daily_balances"))
    assert(series.map(r => (r.getAs[String]("date"), r.getAs[Long]("balance"))) ==
      Seq(("2024-01-01", 20L), ("2024-01-02", 30L)))
  }
}
