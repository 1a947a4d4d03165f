package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The r14 container walkers: ISO BMFF boxes and MP3 frame sync. Same
  * contract battery as Wav/Png/P6Stream — exact round trip, loud
  * failure on every malformed shape, strict forward progress.
  */
class ContainerSpec extends AnyFunSuite {

  private def movie(nt: Int): Mp4.Movie = Mp4.Movie("isom", 1000L, 8000L,
    (0 until nt).map { k =>
      Mp4.Track(k + 1L, if (k % 2 == 0) "vide" else "soun",
        if (k % 2 == 0) 90000L else 48000L, 100L * (k + 3),
        sampleCount = 5L + k, sampleBytes = 403L + 7 * k)
    }.toVector)

  test("Mp4: render → parse round-trips movie and track metadata exactly") {
    for (nt <- 1 to 3) {
      val m = movie(nt)
      val parsed = Mp4.parse(Mp4.render(m, "payload".getBytes("US-ASCII")))
      assert(parsed == m, s"$nt tracks")
    }
  }

  test("Mp4: non-uniform stsz sums back; unknown boxes are skipped; largesize handled") {
    // 403 bytes over 5 samples → sizes 81,81,81,80,80 — parse must SUM
    val m = movie(1)
    assert(Mp4.parse(Mp4.render(m, Array.empty)).tracks.head.sampleBytes == 403L)
    // splice an unknown top-level box before moov — must be skipped
    val good = Mp4.render(m, Array[Byte](1, 2, 3))
    val unknown = Array[Byte](0, 0, 0, 12) ++ "xyz ".getBytes("US-ASCII") ++
      Array[Byte](9, 9, 9, 9)
    val ftypLen = 16 // 8 + brand(4) + ver(4) + compat(4) = 20? read from bytes
    val fl = ((good(0) & 0xff) << 24) | ((good(1) & 0xff) << 16) |
      ((good(2) & 0xff) << 8) | (good(3) & 0xff)
    val spliced = good.take(fl) ++ unknown ++ good.drop(fl)
    assert(Mp4.parse(spliced) == m)
    // a 64-bit largesize box (size field 1 + 8-byte size) walks correctly
    val largebox = Array[Byte](0, 0, 0, 1) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 20) ++ Array.fill(4)(0.toByte)
    assert(Mp4.parse(good.take(fl) ++ largebox ++ good.drop(fl)) == m)
  }

  test("Mp4: corrupt boxes fail loudly — truncation, over-declared size, missing moov") {
    val good = Mp4.render(movie(2), Array[Byte](5))
    assertThrows[IllegalArgumentException](Mp4.parse(good.take(good.length - 3)))
    val overdecl = good.clone()
    overdecl(0) = 0x7f // ftyp declares a huge size
    assertThrows[IllegalArgumentException](Mp4.parse(overdecl))
    // ftyp alone (no moov)
    val fl = ((good(0) & 0xff) << 24) | ((good(1) & 0xff) << 16) |
      ((good(2) & 0xff) << 8) | (good(3) & 0xff)
    assertThrows[IllegalArgumentException](Mp4.parse(good.take(fl)))
  }

  test("Mp3: render → walk round-trips headers, lengths, and payload bytes") {
    val t = "abcdefghij".getBytes("US-ASCII")
    val fs = Seq(
      Mp3.renderFrame(1, 0, padded = false, len => Array.tabulate(len)(i => t(i % t.length))),
      Mp3.renderFrame(14, 2, padded = true, len => Array.fill(len)(7.toByte)),
      Mp3.renderFrame(9, 1, padded = false, len => Array.fill(len)(0xff.toByte)))
    val stream = Mp3.render(fs)
    val refs = Mp3.frames(stream).toSeq
    assert(refs.map(r => (r.bitrateKbps, r.sampleRate, r.padded)) ==
      Seq((32, 44100, false), (320, 32000, true), (128, 48000, false)))
    // each frame's extent comes from ITS OWN header's slot arithmetic
    assert(refs.map(r => r.end - r.start) == fs.map(_.length))
    assert(refs.map(r =>
      java.util.Arrays.copyOfRange(stream, r.start, r.end).toSeq) ==
      fs.map(_.toSeq))
    // the full-0xFF payload is NOT mistaken for sync: boundaries come
    // from the header, never from scanning for sync words
    assert(refs.size == 3)
  }

  test("Mp3: corrupt streams fail loudly — lost sync, reserved indices, truncated final frame") {
    val good = Mp3.render(Seq(
      Mp3.renderFrame(3, 0, padded = false, len => new Array[Byte](len))))
    assertThrows[IllegalArgumentException](
      Mp3.frames("junk".getBytes("US-ASCII") ++ good).toSeq)
    assertThrows[IllegalArgumentException](
      Mp3.frames(good.take(good.length - 1)).toSeq)
    // reserved bitrate index 15
    val resv = good.clone(); resv(2) = (0xf0 | (resv(2) & 0x0f)).toByte
    assertThrows[IllegalArgumentException](Mp3.frames(resv).toSeq)
    // reserved sample-rate index 3
    val resr = good.clone(); resr(2) = ((resr(2) & 0xf0) | 0x0c).toByte
    assertThrows[IllegalArgumentException](Mp3.frames(resr).toSeq)
    // MPEG-2 version bits rejected by profile
    val v2 = good.clone(); v2(1) = (v2(1) & 0xef).toByte
    assertThrows[IllegalArgumentException](Mp3.frames(v2).toSeq)
  }
}
