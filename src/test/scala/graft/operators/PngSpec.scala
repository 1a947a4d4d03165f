package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PngSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rndPixels(w: Int, h: Int, seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(3 * w * h)(r.nextInt(256).toByte)
  }

  test("encode → decode round-trips pixels exactly across sizes (default filter cycle)") {
    for (((w, h), i) <- Seq((1, 1), (2, 1), (1, 2), (3, 7), (7, 5), (16, 16),
        (40, 1), (1, 40)).zipWithIndex) {
      val px = rndPixels(w, h, 100 + i)
      val img = Png.decode(Png.encode(w, h, px))
      assert(img.w == w && img.h == h, s"dims for ${w}x$h")
      assert(java.util.Arrays.equals(img.pixels, px), s"pixels for ${w}x$h")
    }
  }

  test("every filter type (None/Sub/Up/Average/Paeth) reconstructs exactly") {
    val (w, h) = (9, 6)
    val px = rndPixels(w, h, 7)
    for (ft <- 0 to 4) {
      val img = Png.decode(Png.encode(w, h, px, _ => ft))
      assert(java.util.Arrays.equals(img.pixels, px), s"filter $ft")
    }
    // a worst-case gradient (monotone ramps stress Average/Paeth rounding)
    val ramp = Array.tabulate(3 * w * h)(i => (i % 256).toByte)
    for (ft <- 0 to 4)
      assert(java.util.Arrays.equals(
        Png.decode(Png.encode(w, h, ramp, _ => ft)).pixels, ramp), s"ramp $ft")
  }

  test("decoder is independent of the encoder's compressor: hand-built STORED zlib blocks decode identically") {
    val (w, h) = (11, 8)
    val px = rndPixels(w, h, 42)
    val stored = Png.encodeStored(w, h, px)
    val deflated = Png.encode(w, h, px)
    assert(!java.util.Arrays.equals(stored, deflated),
      "the two encoders must produce different byte streams for this to prove anything")
    assert(java.util.Arrays.equals(Png.decode(stored).pixels, px))
    assert(java.util.Arrays.equals(Png.decode(stored).pixels,
      Png.decode(deflated).pixels))
  }

  test("corrupt blobs fail loudly: bad signature, CRC flip, truncation, trailing garbage, unknown critical chunk") {
    val good = Png.encode(4, 4, rndPixels(4, 4, 1))
    // bad signature
    val sig = good.clone(); sig(0) = 0x42
    assertThrows[IllegalArgumentException](Png.decode(sig))
    // flip a byte inside the IDAT payload → chunk CRC must catch it
    val idatOff = {
      var o = 8
      while (new String(good, o + 4, 4, "US-ASCII") != "IDAT")
        o += 12 + (((good(o) & 0xff) << 24) | ((good(o + 1) & 0xff) << 16) |
          ((good(o + 2) & 0xff) << 8) | (good(o + 3) & 0xff))
      o
    }
    val crcFlip = good.clone(); crcFlip(idatOff + 9) = (crcFlip(idatOff + 9) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException](Png.decode(crcFlip))
    assert(e.getMessage.contains("CRC"), s"expected CRC failure, got: ${e.getMessage}")
    // truncation mid-chunk
    assertThrows[IllegalArgumentException](Png.decode(good.take(good.length - 5)))
    // trailing garbage after IEND
    assertThrows[IllegalArgumentException](
      Png.decode(good ++ "junk".getBytes("US-ASCII")))
    // an unknown CRITICAL chunk (uppercase first letter) must fail, an
    // ancillary one (lowercase) must be skipped — splice before IEND
    def splice(typ: String): Array[Byte] = {
      val payload = Array[Byte](1, 2, 3)
      val t = typ.getBytes("US-ASCII")
      val chunk = new Array[Byte](12 + payload.length)
      chunk(0) = 0; chunk(1) = 0; chunk(2) = 0; chunk(3) = payload.length.toByte
      System.arraycopy(t, 0, chunk, 4, 4)
      System.arraycopy(payload, 0, chunk, 8, payload.length)
      val crc = new java.util.zip.CRC32
      crc.update(chunk, 4, 4 + payload.length)
      val v = crc.getValue.toInt
      chunk(8 + payload.length) = (v >>> 24).toByte
      chunk(9 + payload.length) = (v >>> 16).toByte
      chunk(10 + payload.length) = (v >>> 8).toByte
      chunk(11 + payload.length) = v.toByte
      good.take(good.length - 12) ++ chunk ++ good.drop(good.length - 12)
    }
    val ec = intercept[IllegalArgumentException](Png.decode(splice("ABCD")))
    assert(ec.getMessage.contains("critical"), ec.getMessage)
    assert(java.util.Arrays.equals(Png.decode(splice("abCD")).pixels,
      Png.decode(good).pixels), "ancillary chunk must be skipped")
  }

  test("unsupported profiles are named errors: 16-bit, grayscale, interlaced") {
    val good = Png.encode(2, 2, rndPixels(2, 2, 3))
    // IHDR sits at offset 8; its payload at 16 (len 13, type IHDR);
    // patch a field then re-CRC the chunk
    def patchIhdr(field: Int, value: Byte): Array[Byte] = {
      val b = good.clone()
      b(16 + field) = value
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 4 + 13)
      val v = crc.getValue.toInt
      b(16 + 13) = (v >>> 24).toByte; b(17 + 13) = (v >>> 16).toByte
      b(18 + 13) = (v >>> 8).toByte; b(19 + 13) = v.toByte
      b
    }
    assert(intercept[IllegalArgumentException](
      Png.decode(patchIhdr(8, 16))).getMessage.contains("bit depth"))
    assert(intercept[IllegalArgumentException](
      Png.decode(patchIhdr(9, 0))).getMessage.contains("color type"))
    assert(intercept[IllegalArgumentException](
      Png.decode(patchIhdr(12, 1))).getMessage.contains("interlaced"))
  }

  test("a PNG and a P6 of the same pixels carry the SAME dHash (one fingerprint machine)") {
    import spark.implicits._
    val imgs = (0 until 8).map { i =>
      val w = 3 + i; val h = 2 + (i % 4)
      (i.toLong, w, h, rndPixels(w, h, 1000 + i))
    }
    val pngDf = imgs.map { case (id, w, h, px) => (id, Png.encode(w, h, px)) }
      .toDF("id", "png")
    val ppmDf = imgs.map { case (id, w, h, px) =>
      (id, Multimodal.Ppm.render(w, h, 255, px)) }.toDF("id", "ppm")
    val viaPng = Multimodal.dHashPng(spark, pngDf, "id", "png")
      .as[(Long, Long)].collect().toMap
    val viaPpm = Multimodal.dHashPpm(spark, ppmDf, "id", "ppm")
      .as[(Long, Long)].collect().toMap
    assert(viaPng == viaPpm)
  }

  test("pngPixelStats: by-hand stats on a known image") {
    import spark.implicits._
    val px = Array[Byte](10, 20, 30, 40, 50, 60) // 1x2
    val df = Seq((7L, Png.encode(1, 2, px))).toDF("id", "png")
    val out = Multimodal.pngPixelStats(spark, df, "id", "png")
      .as[Multimodal.PngStats].head()
    assert(out == Multimodal.PngStats(7L, 1, 2, 210L, 10, 60,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(px)))
  }
}
