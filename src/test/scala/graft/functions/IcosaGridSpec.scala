package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins the icosahedral codec's geometry (F3): construction invariants,
  * decode∘encode round-trip error bounded by the cell radius, totality over
  * the whole lat/lng domain, loud failure on invalid ids, and the face-seam
  * contract (see the seam note in [[IcosaGrid]]'s scaladoc). The DuckDB
  * q75 oracle checks the same arithmetic end-to-end against DuckDB's
  * independent trig; these tests pin the *geometric* claims no SQL hash
  * can express (distances, monotone refinement, failure modes).
  */
class IcosaGridSpec extends AnyFunSuite {

  private def haversineKm(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val r = math.Pi / 180.0
    val dLat = (lat2 - lat1) * r / 2
    val dLng = (lng2 - lng1) * r / 2
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(lat1 * r) * math.cos(lat2 * r) * math.sin(dLng) * math.sin(dLng)
    2 * 6371.0 * math.asin(math.sqrt(a))
  }

  /** Deterministic uniform-on-sphere sample (area-true: z uniform). */
  private def spherePoints(n: Int, seed: Long): Seq[(Double, Double)] = {
    val rnd = new Random(seed)
    Seq.fill(n) {
      val z = rnd.nextDouble() * 2 - 1
      val lng = rnd.nextDouble() * 360 - 180
      (math.asin(z) * 180 / math.Pi, lng)
    }
  }

  test("construction: 20 distinct faces with orthonormal tangent bases") {
    def dot(a: Array[Double], b: Array[Double]) = a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
    assert(IcosaGrid.faces.size == 20)
    for (f <- IcosaGrid.faces) {
      assert(math.abs(dot(f.c, f.c) - 1) < 1e-12)
      assert(math.abs(dot(f.e1, f.e1) - 1) < 1e-12)
      assert(math.abs(dot(f.e2, f.e2) - 1) < 1e-12)
      assert(math.abs(dot(f.c, f.e1)) < 1e-12)
      assert(math.abs(dot(f.c, f.e2)) < 1e-12)
      assert(math.abs(dot(f.e1, f.e2)) < 1e-12)
    }
    assert(IcosaGrid.faces.map(f => (f.c(0), f.c(1), f.c(2))).distinct.size == 20)
    // Faces pair up antipodally (a regular icosahedron is centrosymmetric).
    val centers = IcosaGrid.faces.map(_.c)
    assert(centers.forall(c => centers.exists(d =>
      math.abs(c(0) + d(0)) + math.abs(c(1) + d(1)) + math.abs(c(2) + d(2)) < 1e-9)))
  }

  test("decode∘encode stays within one res-6 cell radius (worst ≈54 km)") {
    val worst = spherePoints(10000, seed = 42).map { case (lat, lng) =>
      val (dLat, dLng) = IcosaGrid.decode(IcosaGrid.encode(lat, lng, 6))
      haversineKm(lat, lng, dLat, dLng)
    }.max
    // Res-6 cell half-diagonal with worst edge-of-face gnomonic stretch is
    // ~54 km; 60 bounds it with slack while still pinning the scale.
    assert(worst < 60.0, s"worst decode∘encode distance $worst km")
  }

  test("encode is total over the domain, incl. poles and the antimeridian") {
    for (lat <- BigDecimal(-90) to 90 by 3.7; lng <- BigDecimal(-180) to 180 by 7.3) {
      val (dLat, dLng) = IcosaGrid.decode(IcosaGrid.encode(lat.toDouble, lng.toDouble, 6))
      assert(dLat >= -90 && dLat <= 90 && dLng >= -180 && dLng <= 180)
    }
    for ((la, ln) <- Seq((90.0, 0.0), (-90.0, 0.0), (0.0, 180.0), (0.0, -180.0),
        (90.0, 180.0), (-90.0, -180.0)))
      IcosaGrid.decode(IcosaGrid.encode(la, ln, 6))
  }

  test("resolutions 0..15 round-trip and refine ~2x per level") {
    val (lat, lng) = (47.6, -122.3)
    val errs = (0 to IcosaGrid.MaxRes).map { r =>
      val (dLat, dLng) = IcosaGrid.decode(IcosaGrid.encode(lat, lng, r))
      haversineKm(lat, lng, dLat, dLng)
    }
    assert(errs(6) < 60.0)
    assert(errs.last < errs.head / 1000, s"res 15 error ${errs.last} km vs res 0 ${errs.head}")
  }

  test("invalid ids and resolutions fail loudly, never decode to garbage") {
    intercept[IllegalArgumentException](IcosaGrid.encode(0, 0, -1))
    intercept[IllegalArgumentException](IcosaGrid.encode(0, 0, IcosaGrid.MaxRes + 1))
    intercept[IllegalArgumentException](IcosaGrid.decode(-1L))
    // face 25 does not exist
    intercept[IllegalArgumentException](IcosaGrid.decode(25L * 4294967296L + 65536L + 1L))
    // res 16 exceeds MaxRes
    intercept[IllegalArgumentException](IcosaGrid.decode(16L * 32L * 4294967296L))
    // i out of range for res 0 (iRaw must be < 2)
    intercept[IllegalArgumentException](IcosaGrid.decode(5L * 65536L))
  }

  test("q75 oracle lattice sits far from face-dot ties and grid lines") {
    // The q75 oracle (Oracles.icosaSql) matches hashes only if JVM Math and
    // DuckDB's libm round every trig call the same way for these inputs —
    // both specs allow ~1 ulp slack, so a point within a few ulps of a
    // face-dot tie or a floor(g/step) grid line could flip its cell id on
    // another platform. This pins the docstring's margin claim: every
    // synthetic point (the same lattice the oracle's `pts` CTE generates)
    // keeps a margin ≫ ulp from both decision boundaries.
    val res = 6
    val m = 1L << res
    val step = IcosaGrid.Span / m
    // q75's offset lattice, plus the full foreign-cell seam lattice (every
    // coordinate Geo.cellToPseudoLatLng can produce: md5-derived lat ∈
    // {-85..84}+0.25, lng ∈ {-175..174}+0.5 — the offsets exist precisely
    // to keep anchors off the icosahedron's symmetry planes, where
    // integer-degree points tie mirror faces exactly).
    val q75 = for (k <- 1 to 1500 if k % 97 != 0)
      yield ((k % 170) - 85 + 0.25, (k * 7 % 350) - 175 + 0.5)
    val q37 = for (la <- -85 to 84; ln <- -175 to 174)
      yield (la + 0.25, ln + 0.5)
    for ((lat, lng) <- q75 ++ q37) {
      val latR = lat * math.Pi / 180.0
      val lngR = lng * math.Pi / 180.0
      val p = Array(math.cos(latR) * math.cos(lngR),
        math.cos(latR) * math.sin(lngR), math.sin(latR))
      val dots = IcosaGrid.faces
        .map(f => p(0) * f.c(0) + p(1) * f.c(1) + p(2) * f.c(2))
        .sorted.reverse
      assert(dots(0) - dots(1) > 1e-9,
        s"point ($lat, $lng) is ${dots(0) - dots(1)} from a face tie")
      val f = IcosaGrid.faces(IcosaGrid.faces.indices.maxBy(i =>
        p(0) * IcosaGrid.faces(i).c(0) + p(1) * IcosaGrid.faces(i).c(1) +
          p(2) * IcosaGrid.faces(i).c(2)))
      val bd = p(0) * f.c(0) + p(1) * f.c(1) + p(2) * f.c(2)
      val q = Array(p(0) / bd - f.c(0), p(1) / bd - f.c(1), p(2) / bd - f.c(2))
      for (g <- Seq(q(0) * f.e1(0) + q(1) * f.e1(1) + q(2) * f.e1(2),
          q(0) * f.e2(0) + q(1) * f.e2(1) + q(2) * f.e2(2))) {
        val u = g / step
        val d = math.abs(u - math.rint(u))
        assert(d > 1e-9, s"point ($lat, $lng) is $d grid-units from a grid line")
      }
    }
  }

  test("face-seam contract: few centers re-encode to a neighbor, never far") {
    // The per-face grid spans [-0.8, 0.8) but the face's spherical Voronoi
    // radius is tan(37.38°) ≈ 0.764, so cells straddling a face boundary
    // can have centers owned by the NEIGHBOR face: encode(decode(id)) may
    // differ from id for a small seam population. Pin both halves of the
    // contract: the fraction stays small, and a seam cell's re-encoded id
    // is a genuine adjacent cell (its center within one cell radius), not
    // garbage.
    val ids = spherePoints(20000, seed = 7)
      .map { case (lat, lng) => IcosaGrid.encode(lat, lng, 6) }.distinct
    val seam = ids.filter { id =>
      val (la, ln) = IcosaGrid.decode(id)
      IcosaGrid.encode(la, ln, 6) != id
    }
    val frac = seam.size.toDouble / ids.size
    assert(frac < 0.02, s"seam fraction $frac unexpectedly large")
    seam.foreach { id =>
      val (la, ln) = IcosaGrid.decode(id)
      val (rla, rln) = IcosaGrid.decode(IcosaGrid.encode(la, ln, 6))
      assert(haversineKm(la, ln, rla, rln) < 60.0,
        s"seam cell $id re-encodes to a non-adjacent cell")
    }
  }
}
