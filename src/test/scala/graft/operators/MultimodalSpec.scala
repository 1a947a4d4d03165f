package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withMeta sniffs jpeg/riff magic bytes and hashes content") {
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x01)
    val riff = "RIFFxxxx".getBytes
    val other = "hello".getBytes
    val df = Seq((1L, jpeg), (2L, riff), (3L, other)).toDF("id", "bytes")
    val formats = Multimodal.withMeta(df, "bytes")
      .select(col("id"), col("meta.format")).as[(Long, String)].collect().toMap
    assert(formats == Map(1L -> "jpeg", 2L -> "riff", 3L -> "unknown"))
  }

  test("decodeFeatures runs the stub codec partition-wise with exact features") {
    val bytes = "abc".getBytes // a=97, b=98, c=99
    val df = Seq((7L, bytes)).toDF("id", "bytes").repartition(3)
    val out = Multimodal.decodeFeatures(spark, df, "id", "bytes",
      Multimodal.DeterministicStubCodec).head()
    assert(out.getAs[Long]("id") == 7L)
    assert(out.getAs[Long]("byteSum") == 97 + 98 + 99)
    assert(out.getAs[Int]("width") == 1 + 97 % 64)
    assert(out.getAs[Int]("height") == 1 + 99 % 64)
    assert(out.getAs[String]("sha") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(bytes))
  }

  test("sampleFrames splits bytes into n hashed ranges, bytes stay local") {
    val df = Seq((1L, "0123456789ab".getBytes)).toDF("id", "bytes")
    val out = Multimodal.sampleFrames(spark, df, "id", "bytes", 4)
      .orderBy("frame").as[(Long, Int, String, Long)].collect()
    assert(out.length == 4)
    assert(out.map(_._4).sum == 12) // 3 bytes per frame, nothing dropped
    assert(out(0)._3 ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex("012".getBytes))
  }

  test("resample keeps every stride-th byte and hashes the result") {
    val df = Seq((1L, "0123456789".getBytes)).toDF("id", "bytes")
    val out = Multimodal.resample(spark, df, "id", "bytes", 4)
      .as[(Long, Long, Long, String)].head()
    assert(out._2 == 10L && out._3 == 3L) // positions 0, 4, 8
    assert(out._4 ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex("048".getBytes))
  }

  // A hand-built 3x3 P6: pixel (x, y) has RGB (10x+y, 100+x, 200+y).
  private def px3(x: Int, y: Int) =
    Array((10 * x + y).toByte, (100 + x).toByte, (200 + y).toByte)
  private def ppm3x3: Array[Byte] = Multimodal.Ppm.render(3, 3, 255,
    (for (y <- 0 until 3; x <- 0 until 3) yield px3(x, y)).flatten.toArray)

  test("Ppm golden: parse round-trips render, comments and whitespace ok") {
    val img = ppm3x3
    val (w, h, mx, off) = Multimodal.Ppm.parseHeader(img)
    assert((w, h, mx) == ((3, 3, 255)))
    assert(img.length == off + 27)
    // the header form with a comment line parses to the same dims
    val commented = ("P6\n# a comment\n 3\t3\n255\n".getBytes("US-ASCII")
      ++ img.drop(off))
    assert(Multimodal.Ppm.parseHeader(commented)._1 == 3)
    // corrupt magic fails loudly, never silent garbage
    intercept[IllegalArgumentException] {
      Multimodal.Ppm.parseHeader("P5\n3 3\n255\n".getBytes("US-ASCII"))
    }
    // truncated payload fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.Ppm.parseHeader(img.dropRight(1))
    }
  }

  test("Ppm golden: stride-2 nearest-neighbor keeps pixels (0,0),(2,0),(0,2),(2,2)") {
    val resized = Multimodal.Ppm.resizeNearest(ppm3x3, 2)
    val (wo, ho, _, off) = Multimodal.Ppm.parseHeader(resized)
    assert((wo, ho) == ((2, 2)))
    val kept = resized.drop(off)
    assert(kept.toSeq ==
      (px3(0, 0) ++ px3(2, 0) ++ px3(0, 2) ++ px3(2, 2)).toSeq)
  }

  test("dHashPpm golden: brightness gradients set exactly the expected bits") {
    // Horizontal DARKENING gradient (left brighter than right at every
    // sample): every comparison bit fires → hash = 2^56 − 1.
    def gradient(desc: Boolean): Array[Byte] = {
      val w = 16; val h = 16
      val px = (for (y <- 0 until h; x <- 0 until w) yield {
        val v = if (desc) (255 - 15 * x) else 15 * x
        Array(v.toByte, v.toByte, v.toByte)
      }).flatten.toArray
      Multimodal.Ppm.render(w, h, 255, px)
    }
    val df = Seq((1L, gradient(desc = true)), (2L, gradient(desc = false)),
      (3L, Multimodal.Ppm.render(4, 4, 255, Array.fill(48)(77.toByte))))
      .toDF("id", "bytes")
    val out = Multimodal.dHashPpm(spark, df, "id", "bytes")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == (1L << 56) - 1) // all 56 bits: left always brighter
    assert(out(2L) == 0L)             // ascending: never brighter
    assert(out(3L) == 0L)             // flat: strict > never fires
    // hammingPairs over these: only (2,3) agree (hamming 0); 1 differs in
    // all 56 bits from both
    val pairs = TextDedup.hammingPairs(
        Multimodal.dHashPpm(spark, df, "id", "bytes")
          .select(col("id").as("doc"), col("dhash")),
        "doc", "dhash", bits = 56, maxHamming = 2, bands = 8)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((2L, 3L, 0L)))
  }

  test("PpmCodec decodes header dims and payload-only features; resizePpm end-to-end") {
    val df = Seq((7L, ppm3x3)).toDF("id", "bytes")
    val f = Multimodal.decodeFeatures(spark, df, "id", "bytes",
      Multimodal.PpmCodec).as[Multimodal.MediaFeatures].head()
    assert(f.width == 3 && f.height == 3)
    val payload = ppm3x3.drop(ppm3x3.length - 27)
    assert(f.byteSum == payload.map(_ & 0xff).map(_.toLong).sum)
    assert(f.firstByte == (payload.head & 0xff) &&
      f.lastByte == (payload.last & 0xff))
    val r = Multimodal.resizePpm(spark, df, "id", "bytes", 2)
      .select("w", "h", "wo", "ho", "resized_sha")
      .as[(Int, Int, Int, Int, String)].head()
    assert(r._1 == 3 && r._2 == 3 && r._3 == 2 && r._4 == 2)
    assert(r._5 == org.apache.commons.codec.digest.DigestUtils
      .md5Hex(Multimodal.Ppm.resizeNearest(ppm3x3, 2)))
  }

  test("Wav: render → parse round-trips every sample; the walker skips LIST") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -4242)
    val bytes = Multimodal.Wav.render(8000, samples)
    // withMeta's sniffer recognizes the container
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    // the LIST-INFO chunk is physically present between fmt and data —
    // parse succeeding AT ALL exercises the unknown-chunk skip path
    assert(new String(bytes).contains("LIST"))
    val (rate, back) = Multimodal.Wav.parse(bytes)
    assert(rate == 8000)
    assert(back.toSeq == samples.toSeq)
  }

  test("Wav: odd-sized unknown chunks are word-aligned past; corrupt blobs fail loudly") {
    // splice an ODD-sized junk chunk before data: the walker must pad
    val good = Multimodal.Wav.render(16000, Array[Short](7, -7))
    val dataIdx = {
      var i = 12
      while (new String(good, i, 4, "US-ASCII") != "data") i += 1
      i
    }
    val junk = "junk".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val spliced = good.take(dataIdx) ++ junk ++ good.drop(dataIdx)
    // patch the RIFF size for the inserted bytes
    val riffSz = (spliced.length - 8)
    spliced(4) = (riffSz & 0xff).toByte
    spliced(5) = ((riffSz >> 8) & 0xff).toByte
    val (rate, back) = Multimodal.Wav.parse(spliced)
    assert(rate == 16000 && back.toSeq == Seq[Short](7, -7))
    // corrupt: not RIFF / stereo fmt must throw, never garbage-decode
    assertThrows[IllegalArgumentException](
      Multimodal.Wav.parse("nope".getBytes("US-ASCII")))
    val stereo = Multimodal.Wav.render(8000, Array[Short](1)).clone()
    val fmtIdx = {
      var i = 12
      while (new String(stereo, i, 4, "US-ASCII") != "fmt ") i += 1
      i
    }
    stereo(fmtIdx + 10) = 2 // channels LE16 -> 2
    assertThrows[IllegalArgumentException](Multimodal.Wav.parse(stereo))
    // a NEGATIVE chunk size must throw, not walk the offset backwards
    // into an infinite loop
    val neg = Multimodal.Wav.render(8000, Array[Short](1)).clone()
    val listIdx = {
      var i = 12
      while (new String(neg, i, 4, "US-ASCII") != "LIST") i += 1
      i
    }
    neg(listIdx + 7) = 0x80.toByte // size high byte -> negative int32
    assertThrows[IllegalArgumentException](Multimodal.Wav.parse(neg))
    // a HUGE positive chunk size (2^31−8: payload+sz overflows Int
    // negative) must fail by contract, not re-enter the walk at a
    // negative offset / AIOOBE from a raw read
    val huge = Multimodal.Wav.render(8000, Array[Short](1)).clone()
    val hugeListIdx = {
      var i = 12
      while (new String(huge, i, 4, "US-ASCII") != "LIST") i += 1
      i
    }
    huge(hugeListIdx + 4) = 0xf8.toByte // size LE32 = 0x7ffffff8
    huge(hugeListIdx + 5) = 0xff.toByte
    huge(hugeListIdx + 6) = 0xff.toByte
    huge(hugeListIdx + 7) = 0x7f.toByte
    val hugeErr = intercept[IllegalArgumentException](Multimodal.Wav.parse(huge))
    assert(hugeErr.getMessage.contains("declares"))
    // a TRUNCATED blob whose data chunk over-declares must throw the
    // documented IllegalArgumentException, not a raw
    // ArrayIndexOutOfBoundsException from rdLe16
    val whole = Multimodal.Wav.render(8000, Array[Short](5, 6, 7, 8))
    val truncated = whole.take(whole.length - 4)
    // keep the declared RIFF size honest about the truncation being
    // inside the data chunk (riffEnd clamps to bytes.length anyway)
    val truncErr =
      intercept[IllegalArgumentException](Multimodal.Wav.parse(truncated))
    assert(truncErr.getMessage.contains("declares"))
    // a >2 GiB DECLARED RIFF SIZE (unsigned 32-bit) must clamp to the
    // buffer, not overflow Int into a negative riffEnd that skips the
    // walk and reports "no data chunk" for a perfectly valid body
    val bigRiff = Multimodal.Wav.render(8000, Array[Short](9, -9)).clone()
    bigRiff(4) = 0xff.toByte; bigRiff(5) = 0xff.toByte
    bigRiff(6) = 0xff.toByte; bigRiff(7) = 0xff.toByte
    val (bigRate, bigBack) = Multimodal.Wav.parse(bigRiff)
    assert(bigRate == 8000 && bigBack.toSeq == Seq[Short](9, -9))
  }

  test("audioFingerprint: rise/fall bits by hand; an edited clip stays a near-dup while its byte hash moves") {
    import spark.implicits._
    // window=2 energies: (4,4)->4, (8,8)->8, (2,2)->2, (6,6)->6 →
    // deltas rise, fall, rise → bits 55 and 53
    val s = Array[Short](4, -4, 8, 8, -2, 2, 6, -6)
    val df = Seq((1L, Multimodal.Wav.render(8000, s))).toDF("id", "wav")
    val fp = Multimodal.audioFingerprint(spark, df, "id", "wav", window = 2)
      .as[(Long, Long)].head()._2
    assert(fp == ((1L << 55) | (1L << 53)))
    // a lightly edited long clip: one sample nudged — envelope shape
    // (and fingerprint) barely moves, the byte hash completely does
    val rnd = new scala.util.Random(5)
    val long1 = Array.fill(400)((rnd.nextInt(8000) - 4000).toShort)
    val long2 = long1.clone(); long2(200) = (long2(200) + 300).toShort
    val two = Seq((1L, Multimodal.Wav.render(8000, long1)),
      (2L, Multimodal.Wav.render(8000, long2))).toDF("id", "wav")
    val pairs = graft.operators.TextDedup.hammingPairs(
        Multimodal.audioFingerprint(spark, two, "id", "wav", window = 8)
          .select(col("id").as("doc"), col("afp")),
        "doc", "afp", bits = 56, maxHamming = 4, bands = 8)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.length == 1 && pairs.head._3 <= 4)
    assert(!java.util.Arrays.equals(Multimodal.Wav.render(8000, long1),
      Multimodal.Wav.render(8000, long2)))
  }

  test("pcmWindowStats: integer stats and the activity gate match a by-hand clip") {
    import spark.implicits._
    // 5 samples, window 2: |v| means per window = (3+5)/2=4, (0+8)/2=4, 2/1=2
    val s = Array[Short](3, -5, 0, 8, -2)
    val df = Seq((9L, Multimodal.Wav.render(8000, s))).toDF("id", "wav")
    val out = Multimodal.pcmWindowStats(spark, df, "id", "wav",
        window = 2, activeMeanAbs = 4L)
      .as[Multimodal.PcmStats].head()
    assert(out == Multimodal.PcmStats(9L, 8000, 5L,
      sample_sum = 4L, sample_sqsum = 9 + 25 + 0 + 64 + 4,
      peak_abs = 8L, n_windows = 3L, active_windows = 2L))
  }

  test("P6Stream: render → walk round-trips frames of different sizes; corrupt mid-stream fails loudly") {
    val f0 = Multimodal.Ppm.render(2, 3, 255, Array.fill(18)(7.toByte))
    val f1 = Multimodal.Ppm.render(4, 1, 255, Array.fill(12)(9.toByte))
    val f2 = Multimodal.Ppm.render(1, 1, 255, Array[Byte](1, 2, 3))
    val stream = Multimodal.P6Stream.render(Seq(f0, f1, f2))
    val refs = Multimodal.P6Stream.frames(stream).toSeq
    assert(refs.map(r => (r.index, r.w, r.h)) == Seq((0, 2, 3), (1, 4, 1), (2, 1, 1)))
    // each frame's extent comes from ITS OWN parsed header
    assert(refs.map(r => java.util.Arrays.copyOfRange(stream, r.start, r.end).toSeq)
      == Seq(f0.toSeq, f1.toSeq, f2.toSeq))
    // an empty stream yields no frames; trailing garbage fails loudly
    assert(Multimodal.P6Stream.frames(Array.empty[Byte]).isEmpty)
    val corrupt = stream ++ "junk".getBytes("US-ASCII")
    assertThrows[IllegalArgumentException](
      Multimodal.P6Stream.frames(corrupt).toSeq)
    // a truncated final frame fails loudly too (the Wav.parse contract)
    assertThrows[IllegalArgumentException](
      Multimodal.P6Stream.frames(stream.take(stream.length - 1)).toSeq)
  }

  test("videoFrameStats: by-hand stats per kept frame; stride sampling keeps 0, 2") {
    import spark.implicits._
    val f0 = Multimodal.Ppm.render(1, 2, 255, Array[Byte](1, 2, 3, 4, 5, 6))
    val f1 = Multimodal.Ppm.render(1, 1, 255, Array[Byte](9, 9, 9))
    val f2 = Multimodal.Ppm.render(2, 1, 255, Array[Byte](10, 20, 30, 40, 50, 60))
    val df = Seq((5L, Multimodal.P6Stream.render(Seq(f0, f1, f2))))
      .toDF("id", "video")
    val out = Multimodal.videoFrameStats(spark, df, "id", "video", stride = 2)
      .as[Multimodal.FrameStats].collect().sortBy(_.frame)
    assert(out.map(_.frame).toSeq == Seq(0, 2), "stride 2 keeps frames 0 and 2")
    assert(out(0) == Multimodal.FrameStats(5L, 0, 1, 2, f0.length.toLong,
      21L, org.apache.commons.codec.digest.DigestUtils.md5Hex(f0)))
    assert(out(1) == Multimodal.FrameStats(5L, 2, 2, 1, f2.length.toLong,
      210L, org.apache.commons.codec.digest.DigestUtils.md5Hex(f2)))
  }

  test("videoDHash: frame hashes equal the image dHash of each standalone frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val mk = (w: Int, h: Int) => Multimodal.Ppm.render(w, h, 255,
      Array.fill(3 * w * h)((rnd.nextInt(256) - 128).toByte))
    val frames = Seq(mk(10, 8), mk(9, 7), mk(12, 12))
    val vid = Seq((1L, Multimodal.P6Stream.render(frames))).toDF("id", "video")
    val perFrame = Multimodal.videoDHash(spark, vid, "id", "video")
      .as[(Long, Int, Long)].collect().sortBy(_._2).map(_._3).toSeq
    val standalone = frames.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("id", "ppm")
    val imageHashes = Multimodal.dHashPpm(spark, standalone, "id", "ppm")
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(perFrame == imageHashes,
      "video near-dup is the image fingerprint per frame BY CONSTRUCTION")
  }

  test("shift-tolerance: a one-frame-trimmed video matches UNALIGNED pairing, never aligned (the q130 lesson for video)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def noisy(): Array[Byte] = Multimodal.Ppm.render(10, 8, 255,
      Array.fill(240)((rnd.nextInt(256) - 128).toByte))
    val f0 = noisy(); val f1 = noisy(); val f2 = noisy()
    // mutual distances must clear the threshold or the fixture is vacuous
    val hs = Multimodal.dHashPpm(spark,
        Seq((0L, f0), (1L, f1), (2L, f2)).toDF("id", "ppm"), "id", "ppm")
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    for (i <- 0 until 3; j <- i + 1 until 3)
      assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) > 2,
        s"fixture degenerate: frames $i/$j collide")
    // video 1 = (f0, f1, f2); video 2 = the TRIMMED re-upload (f1, f2)
    val vids = Seq(
      (1L, Multimodal.P6Stream.render(Seq(f0, f1, f2))),
      (2L, Multimodal.P6Stream.render(Seq(f1, f2)))).toDF("id", "video")
    val packed = Multimodal.videoDHash(spark, vids, "id", "video")
      .select((col("id") * 4 + col("frame")).as("doc"), col("dhash"))
    val pairs = graft.operators.TextDedup.hammingPairs(
        packed, "doc", "dhash", bits = 56, maxHamming = 2, bands = 8)
      .filter(expr("doc_a div 4") =!= expr("doc_b div 4"))
    // q138's frame-ALIGNED form: every index shifted, zero matches
    assert(pairs
      .filter(pmod(col("doc_a"), lit(4)) === pmod(col("doc_b"), lit(4)))
      .count() == 0, "aligned pairing must MISS the trimmed re-upload")
    // q140's shift-tolerant form: both surviving frames match exactly
    val shifted = pairs.select(expr("doc_a div 4").as("a"),
        expr("doc_b div 4").as("b"), col("hamming"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(shifted.size == 2 && shifted.forall(p => p._1 == 1L && p._2 == 2L
      && p._3 == 0L), s"expected the two trimmed frames to match: $shifted")
  }

  test("sceneCuts: cuts where consecutive frame hashes diverge; singletons are one scene") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def noisy(): Array[Byte] = Multimodal.Ppm.render(10, 8, 255,
      Array.fill(240)((rnd.nextInt(256) - 128).toByte))
    val a = noisy(); val c = noisy()
    // stream: a, a, c — one cut iff hamming(a,c) clears the threshold
    val st = Seq(
      (1L, Multimodal.P6Stream.render(Seq(a, a, c))),
      (2L, Multimodal.P6Stream.render(Seq(a)))).toDF("id", "video")
    val hashes = Multimodal.dHashPpm(spark,
        Seq((0L, a), (1L, c)).toDF("id", "ppm"), "id", "ppm")
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    val hamAC = java.lang.Long.bitCount(hashes(0) ^ hashes(1)).toLong
    assert(hamAC > 8, s"fixture degenerate: hamming(a,c) = $hamAC")
    val out = Multimodal.sceneCuts(spark, st, "id", "video", minHamming = 8)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 1L, 2L, hamAC), // a→a no cut (hamming 0), a→c cuts
      (2L, 1L, 0L, 1L, 0L)))   // single frame: one scene, no motion
  }

  test("keyframes: scene assignment by running cuts; each scene keeps its first frame + dhash") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def noisy(): Array[Byte] = Multimodal.Ppm.render(10, 8, 255,
      Array.fill(240)((rnd.nextInt(256) - 128).toByte))
    val a = noisy(); val c = noisy()
    val hs = Multimodal.dHashPpm(spark,
        Seq((0L, a), (1L, c)).toDF("id", "ppm"), "id", "ppm")
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(java.lang.Long.bitCount(hs(0) ^ hs(1)) > 8, "fixture degenerate")
    // stream a, a, c, c: one cut at frame 2 → scenes {0,1}×{2,3}
    val st = Seq((7L, Multimodal.P6Stream.render(Seq(a, a, c, c))))
      .toDF("id", "video")
    val out = Multimodal.keyframes(spark, st, "id", "video", minHamming = 8)
      .as[(Long, Long, Int, Long, Long)].collect().sortBy(_._2).toSeq
    assert(out == Seq(
      (7L, 0L, 0, 2L, hs(0)),   // scene 0: frames 0-1, keyframe 0 = a
      (7L, 1L, 2, 2L, hs(1))))  // scene 1: frames 2-3, keyframe 2 = c
  }

  test("audioSegments: islands of active windows, numbered in time order; silence splits") {
    import spark.implicits._
    // window=2, threshold 4: loud pairs (|8|,|8|) → mean 8 active; quiet
    // (1,1) → 1 silent. Pattern L L q L q q L → segments {0,1}, {3}, {6}
    val loud = Array[Short](8, -8); val quiet = Array[Short](1, -1)
    val samples = (loud ++ loud ++ quiet ++ loud ++ quiet ++ quiet ++ loud)
    val df = Seq((4L, Multimodal.Wav.render(8000, samples))).toDF("id", "wav")
    val out = Multimodal.audioSegments(spark, df, "id", "wav",
        window = 2, activeMeanAbs = 4L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(out == Seq(
      (4L, 0L, 0L, 1L, 2L, 16L),  // windows 0-1, mean 8 each
      (4L, 1L, 3L, 3L, 1L, 8L),   // window 3
      (4L, 2L, 6L, 6L, 1L, 8L)))  // window 6
    // an all-silent clip has no segments (and no crash)
    val silent = Seq((5L, Multimodal.Wav.render(8000, quiet))).toDF("id", "wav")
    assert(Multimodal.audioSegments(spark, silent, "id", "wav", 2, 4L)
      .count() == 0)
  }

  test("pcmWindowStats: a zero-sample clip emits a zero row, never drops (r13 advice)") {
    import spark.implicits._
    // the q134 oracle used to INNER-join its per-sample CTEs back to the
    // doc table, silently dropping a clip the engine keeps — pin the
    // engine's side of the contract: one row, all stats zero
    val df = Seq((3L, Multimodal.Wav.render(8000, Array.empty[Short])))
      .toDF("id", "wav")
    val out = Multimodal.pcmWindowStats(spark, df, "id", "wav",
        window = 2, activeMeanAbs = 4L)
      .as[Multimodal.PcmStats].collect()
    assert(out.toSeq == Seq(Multimodal.PcmStats(3L, 8000, 0L,
      sample_sum = 0L, sample_sqsum = 0L, peak_abs = 0L,
      n_windows = 0L, active_windows = 0L)))
  }

  test("Ppm/P6Stream: a crafted huge-dimension header fails loudly, never loops (r13 advice)") {
    // 100000×100000 overflows 3*w*h in Int (3e10 wraps); before the
    // Long-domain guard the truncation require passed spuriously and the
    // walker could stall or re-parse garbage forever on attacker-shaped
    // bytes — the exact failure mode Wav.parse already rejects
    val crafted = "P6\n100000 100000\n255\n".getBytes("US-ASCII") ++
      Array.fill(64)(1.toByte)
    assertThrows[IllegalArgumentException](Multimodal.Ppm.parseHeader(crafted))
    assertThrows[IllegalArgumentException](
      Multimodal.P6Stream.frames(crafted).toSeq)
    // and a stream whose SECOND frame carries the crafted header fails
    // mid-walk after yielding the good first frame
    val good = Multimodal.Ppm.render(1, 1, 255, Array[Byte](1, 2, 3))
    val it = Multimodal.P6Stream.frames(good ++ crafted)
    assert(it.next().index == 0)
    assertThrows[IllegalArgumentException](it.next())
  }

  test("empty-video contract: a zero-frame stream is ABSENT from every per-frame rollup (r13 verdict #8)") {
    import spark.implicits._
    // P6Stream.frames(empty) = no frames, so sceneCuts/keyframes emit NO
    // row for the video (not n_scenes = 0) — and the q139/q141/q142
    // oracles share the shape: their per-frame CTEs generate no rows for
    // an empty stream either, so both sides of the gate agree by
    // construction. Pinned here so a contract change (emitting explicit
    // zero rows) must consciously touch oracle and engine together.
    val f0 = Multimodal.Ppm.render(2, 2, 255, Array.fill(12)(5.toByte))
    val f1 = Multimodal.Ppm.render(2, 2, 255, Array.fill(12)(200.toByte))
    val df = Seq(
      (1L, Multimodal.P6Stream.render(Seq(f0, f1))),
      (2L, Array.empty[Byte])).toDF("id", "video")
    val scenes = Multimodal.sceneCuts(spark, df, "id", "video", 8)
      .select("id").as[Long].collect().toSet
    val kf = Multimodal.keyframes(spark, df, "id", "video", 8)
      .select("id").as[Long].collect().toSet
    val stats = Multimodal.videoFrameStats(spark, df, "id", "video")
      .select("id").as[Long].collect().toSet
    assert(scenes == Set(1L) && kf == Set(1L) && stats == Set(1L),
      "empty stream must be absent, populated stream present")
  }
}
