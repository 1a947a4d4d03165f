package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The vendor-ready H3 seam contract (verdict r10 item 8 — F3's one
  * documented divergence from the reference, which decodes real H3 cells
  * via `h3.h3_to_geo`, reference `src/blockchain_queries.py:124-128`).
  *
  * The engine's rule: EVERY consumer of a foreign cell id goes through
  * [[Geo.cellToLatLng]]/[[Geo.cellToIcosa]], and those route the id
  * through exactly ONE anchor function — [[Geo.cellToPseudoLatLng]] —
  * before the real [[IcosaGrid]] geometry takes over. A production build
  * with a vendored H3 jar replaces THAT function alone (id → true
  * h3_to_geo coordinates); nothing downstream changes. This spec pins
  * each clause of that contract with realistic H3-format fixture ids so
  * the future wiring is a mechanical drop-in:
  *
  *  1. anchor contract: deterministic, in-range, null-safe — the
  *     properties any replacement must also satisfy;
  *  2. composition contract: the product decode IS
  *     `anchor ∘ icosa-encode ∘ icosa-center` — pinned against the
  *     scala-side [[IcosaGrid]] reference implementation, so swapping the
  *     anchor provably cannot disturb the geometry stage;
  *  3. drop-in simulation: inject a stand-in "real H3 decode" (a fixture
  *     id → coordinate table, the shape a vendored `h3.cellToLatLng`
  *     provides) and run the UNCHANGED downstream — outputs are the
  *     genuine icosa cell centers of the injected coordinates, i.e. the
  *     seam swap re-anchors the ids and nothing else.
  */
class H3SeamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Realistic res-8-style H3 index strings (15 hex chars) — the
  // `location_hex` shape a Helium user would feed q37/the hotspot builder.
  private val fixtureCells = Seq(
    "8828308281fffff", "882830828dfffff", "8828308299fffff",
    "88283095a3fffff", "8844c0a32bfffff")

  test("anchor: deterministic, in-range, null-safe — the replacement contract") {
    val df = (fixtureCells :+ null).toDF("cell")
    val (lat, lng) = Geo.cellToPseudoLatLng(col("cell"))
    val out = df.select(col("cell"), lat.as("lat"), lng.as("lng"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
    val (nulls, reals) = out.partition(_._1 == null)
    assert(nulls.forall(r => r._2.isEmpty && r._3.isEmpty), "null id must anchor to null")
    assert(reals.length == fixtureCells.length)
    reals.foreach { case (c, latO, lngO) =>
      val (la, ln) = (latO.get.asInstanceOf[Double], lngO.get.asInstanceOf[Double])
      assert(la >= -84.75 && la < 85.25, s"$c lat out of range: $la")
      assert(ln >= -174.5 && ln < 175.5, s"$c lng out of range: $ln")
    }
    // distinct ids anchor apart (md5 dispersion over the fixture set)
    assert(reals.map(r => (r._2, r._3)).distinct.length == reals.length)
    // and a second evaluation reproduces the first bit for bit
    val again = df.select(lat.as("lat"), lng.as("lng")).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(out.map(r => (r._2, r._3)).toSeq == again.toSeq)
  }

  test("composition: product decode == anchor ∘ IcosaGrid.encode ∘ IcosaGrid.decode") {
    val df = fixtureCells.toDF("cell")
    val (alat, alng) = Geo.cellToPseudoLatLng(col("cell"))
    val (dlat, dlng) = Geo.cellToLatLng(col("cell"))
    val rows = df.select(alat.as("alat"), alng.as("alng"),
        Geo.cellToIcosa(col("cell")).as("icell"),
        dlat.as("dlat"), dlng.as("dlng"))
      .as[(Double, Double, Long, Double, Double)].collect()
    rows.foreach { case (aLat, aLng, icell, dLat, dLng) =>
      assert(icell == IcosaGrid.encode(aLat, aLng, 6),
        "icosa encode of the anchor must be the product cell id")
      val (cLat, cLng) = IcosaGrid.decode(icell)
      assert(dLat == cLat && dLng == cLng,
        "product decode must be the genuine icosa cell center")
    }
  }

  test("drop-in: injecting a vendored decode re-anchors ids, downstream unchanged") {
    // Stand-in for h3.cellToLatLng over the fixture ids — the lookup shape
    // a vendored H3 jar provides (values here are representative San
    // Francisco / Houston-area points; a real build maps each id to its
    // true cell center instead).
    val vendored = Map(
      "8828308281fffff" -> (37.7766, -122.4188),
      "882830828dfffff" -> (37.7812, -122.4095),
      "8828308299fffff" -> (37.7725, -122.4330),
      "88283095a3fffff" -> (37.7080, -122.4520),
      "8844c0a32bfffff" -> (29.7499, -95.3580))
    // The replacement seam: id → injected coordinates (broadcast-joined
    // lookup, exactly how a codegen'd vendored decode would slot in).
    val lut = vendored.toSeq.map { case (c, (la, ln)) => (c, la, ln) }
      .toDF("cell", "h3lat", "h3lng")
    val anchored = fixtureCells.toDF("cell")
      .join(broadcast(lut), Seq("cell"))
    // UNCHANGED downstream: icosa-encode the anchor, decode the center.
    val ic = call_function("icosa_encode", col("h3lat"), col("h3lng"), lit(6))
    val out = anchored.select(col("cell"), ic.as("icell"),
        call_function("icosa_lat", ic).as("lat"),
        call_function("icosa_lng", ic).as("lng"))
      .as[(String, Long, Double, Double)].collect()
    assert(out.length == fixtureCells.length)
    out.foreach { case (cell, icell, lat, lng) =>
      val (trueLat, trueLng) = vendored(cell)
      assert(icell == IcosaGrid.encode(trueLat, trueLng, 6),
        s"$cell: downstream encode must key off the injected coordinates")
      val (cLat, cLng) = IcosaGrid.decode(icell)
      assert(lat == cLat && lng == cLng)
      // res-6 cells are ~50 km: the center must stay within one cell
      // radius of the injected point (the geometry is REAL, not pseudo)
      val km = 6371.0 * math.acos(math.min(1.0,
        math.sin(math.toRadians(trueLat)) * math.sin(math.toRadians(lat)) +
          math.cos(math.toRadians(trueLat)) * math.cos(math.toRadians(lat)) *
            math.cos(math.toRadians(trueLng - lng))))
      assert(km < 60.0, s"$cell: center ${km}km from injected point")
    }
    // SF-area ids (within ~15 km of each other) land in nearby-or-equal
    // cells; the Houston id must not share a cell with any SF id.
    val byCell = out.map(o => o._1 -> o._2).toMap
    assert(byCell("8844c0a32bfffff") != byCell("8828308281fffff"))
  }
}
