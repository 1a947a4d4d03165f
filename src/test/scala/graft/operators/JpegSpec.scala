package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {

  private def rnd(w: Int, h: Int, seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(w * h)(r.nextInt(256).toByte)
  }

  test("constant 8x8 blocks are a FIXED POINT of the quant-1 pipeline (byte-exact round trip)") {
    // the property that makes JPEG oracle-able here: per constant block
    // the AC basis sums cancel and DC = 8*(s-128) survives float DCT +
    // round exactly
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val (wb, hb) = (1 + r.nextInt(4), 1 + r.nextInt(4))
      val (w, h) = (8 * wb, 8 * hb)
      val s = new Array[Byte](w * h)
      val blockVal = Array.fill(hb, wb)((32 + r.nextInt(95)).toByte)
      for (y <- 0 until h; x <- 0 until w)
        s(y * w + x) = blockVal(y / 8)(x / 8)
      val img = Jpeg.decode(Jpeg.encode(w, h, s))
      assert(img.w == w && img.h == h)
      assert(java.util.Arrays.equals(img.samples, s), s"seed $seed")
    }
  }

  test("random images: bounded reconstruction error (AC path), deterministic decode") {
    // at quant 1 the only loss is FDCT coefficient rounding; the
    // per-sample reconstruction error is small and the decode is a pure
    // function of the bytes
    for (seed <- 1 to 3) {
      val (w, h) = (24, 16)
      val s = rnd(w, h, seed)
      val enc = Jpeg.encode(w, h, s)
      val d1 = Jpeg.decode(enc)
      val d2 = Jpeg.decode(enc)
      assert(java.util.Arrays.equals(d1.samples, d2.samples), "decode must be deterministic")
      val maxErr = s.indices.map(i =>
        math.abs((s(i) & 0xff) - (d1.samples(i) & 0xff))).max
      assert(maxErr <= 2,
        s"seed $seed: quant-1 reconstruction error $maxErr exceeds the rounding bound")
    }
  }

  test("byte stuffing: an entropy stream containing 0xFF bytes round-trips") {
    // search a few seeds for an encoding that actually contains a
    // stuffed 0xFF00 inside the scan — then prove it decodes
    val found = (1 to 50).exists { seed =>
      val s = rnd(16, 16, 1000 + seed)
      val enc = Jpeg.encode(16, 16, s)
      // scan body = after SOS .. before EOI; look for FF00
      val hasStuffed = (0 until enc.length - 1).exists(i =>
        (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0x00)
      if (hasStuffed) {
        val d = Jpeg.decode(enc)
        val maxErr = s.indices.map(i =>
          math.abs((s(i) & 0xff) - (d.samples(i) & 0xff))).max
        maxErr <= 2
      } else false
    }
    assert(found, "no fixture with a stuffed byte found in 50 seeds — widen the search")
  }

  test("corrupt blobs fail loudly: bad SOI, truncation, flipped scan byte, oversized marker length") {
    val good = Jpeg.encode(8, 8, rnd(8, 8, 9))
    val noSoi = good.clone(); noSoi(1) = 0x00
    assertThrows[IllegalArgumentException](Jpeg.decode(noSoi))
    assertThrows[IllegalArgumentException](Jpeg.decode(good.take(20)))
    // a marker segment declaring a length beyond the buffer
    val badLen = good.clone()
    badLen(4) = 0x7f // DQT length high byte
    assertThrows[IllegalArgumentException](Jpeg.decode(badLen))
    // flipping a scan byte either decodes to different-but-valid pixels
    // or throws (invalid Huffman code / truncation) — it must never hang
    val flip = good.clone(); flip(good.length - 5) = (flip(good.length - 5) ^ 0x7f).toByte
    try { Jpeg.decode(flip); () }
    catch { case _: IllegalArgumentException => () }
  }

  test("unsupported profiles are NAMED errors: progressive, multi-component, restart intervals") {
    val good = Jpeg.encode(8, 8, rnd(8, 8, 5))
    // SOF0 marker byte → SOF2 (progressive); find it: FF C0
    val sofAt = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    val prog = good.clone(); prog(sofAt + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](Jpeg.decode(prog))
      .getMessage.contains("progressive"))
    // encoder profile gate
    assertThrows[IllegalArgumentException](Jpeg.encode(7, 8, new Array[Byte](56)))
    assertThrows[IllegalArgumentException](Jpeg.encode(8, 8, new Array[Byte](63)))
  }

  test("EXTEND and category are inverses over the full coefficient range") {
    // the Annex F amplitude coding: v -> (category, raw bits) -> v
    def cat(v: Int): Int = { var a = math.abs(v); var s = 0; while (a != 0) { a >>= 1; s += 1 }; s }
    def enc(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1
    def ext(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    for (v <- -1024 to 1024; if v != 0) {
      val s = cat(v)
      assert(ext(enc(v, s), s) == v, s"v=$v")
    }
  }
}
