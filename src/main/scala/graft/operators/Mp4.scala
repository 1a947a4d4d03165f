package graft.operators

/** REAL ISO BMFF (MP4) box walker — the av-container member of the
  * container-walk family (RIFF chunks for audio, P6-stream frames for
  * video, PNG chunks, JPEG markers): the ISO base media file format's
  * structure is public and codec-agnostic — `[size:4 BE][type:4cc]
  * [payload]`, size 1 = 64-bit largesize follows, containers nest boxes
  * — so track structure, timescales, durations, and sample tables are
  * all parseable without any codec. What stays stubbed is only the
  * SAMPLE DATA inside `mdat` (H.264/AAC need entropy codecs this
  * sandbox cannot ship); a production build hands those bytes to a
  * decoder, and everything the walker extracts here is exactly what it
  * would route on.
  *
  * Same loud-failure contract as [[Multimodal.Wav]]/[[Png]]/[[Jpeg]]:
  * every declared size is bounds-checked, every step must make strict
  * forward progress, unknown boxes are skipped by declared size
  * (ISO BMFF's explicit extensibility rule), truncation throws.
  */
object Mp4 {

  /** One track's codec-agnostic metadata. */
  final case class Track(id: Long, handler: String, timescale: Long,
                         duration: Long, sampleCount: Long,
                         sampleBytes: Long)

  /** Whole-file metadata: movie header + per-track rows. */
  final case class Movie(brand: String, timescale: Long, duration: Long,
                         tracks: Vector[Track])

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Walk one box level in [start, end): callback gets (type, payload
    * start, payload end). Enforces forward progress and bounds.
    */
  private def walk(bytes: Array[Byte], start: Int, end: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var o = start
    while (o < end) {
      require(o + 8 <= end, s"truncated box header at $o")
      var size = be32(bytes, o)
      val typ = fourcc(bytes, o + 4)
      var payload = o + 8
      if (size == 1) { // 64-bit largesize
        require(o + 16 <= end, s"truncated largesize box at $o")
        size = be64(bytes, o + 8)
        payload = o + 16
      } else if (size == 0) { // box extends to end of enclosing scope
        size = end - o
      }
      require(size >= (payload - o) && o + size <= end,
        s"box $typ at $o declares $size bytes (scope ends at $end)")
      f(typ, payload, o + size.toInt)
      require(o + size > o, s"box walker stalled at $o") // strict progress
      o += size.toInt
    }
  }

  /** Parse the movie structure. Version 0 and 1 full-box headers are
    * both handled where they occur (mvhd/tkhd/mdhd).
    */
  def parse(bytes: Array[Byte]): Movie = {
    var brand = ""
    var mvTimescale = -1L
    var mvDuration = -1L
    val tracks = Vector.newBuilder[Track]
    var sawMoov = false
    walk(bytes, 0, bytes.length) {
      case ("ftyp", p, e) =>
        require(e - p >= 4, "truncated ftyp")
        brand = fourcc(bytes, p)
      case ("moov", p, e) =>
        sawMoov = true
        walk(bytes, p, e) {
          case ("mvhd", mp, me) =>
            val ver = bytes(mp) & 0xff
            if (ver == 1) {
              require(me - mp >= 4 + 8 + 8 + 4 + 8, "truncated mvhd v1")
              mvTimescale = be32(bytes, mp + 20)
              mvDuration = be64(bytes, mp + 24)
            } else {
              require(me - mp >= 4 + 4 + 4 + 4 + 4, "truncated mvhd v0")
              mvTimescale = be32(bytes, mp + 12)
              mvDuration = be32(bytes, mp + 16)
            }
          case ("trak", tp, te) =>
            var tid = -1L
            var handler = ""
            var mdTimescale = -1L
            var mdDuration = -1L
            var nSamples = 0L
            var sampleBytes = 0L
            var sawStsz = false
            walk(bytes, tp, te) {
              case ("tkhd", p2, e2) =>
                val ver = bytes(p2) & 0xff
                if (ver == 1) {
                  require(e2 - p2 >= 4 + 8 + 8 + 4, "truncated tkhd v1")
                  tid = be32(bytes, p2 + 20)
                } else {
                  require(e2 - p2 >= 4 + 4 + 4 + 4, "truncated tkhd v0")
                  tid = be32(bytes, p2 + 12)
                }
              case ("mdia", p2, e2) =>
                walk(bytes, p2, e2) {
                  case ("mdhd", p3, e3) =>
                    val ver = bytes(p3) & 0xff
                    if (ver == 1) {
                      require(e3 - p3 >= 4 + 8 + 8 + 4 + 8, "truncated mdhd v1")
                      mdTimescale = be32(bytes, p3 + 20)
                      mdDuration = be64(bytes, p3 + 24)
                    } else {
                      require(e3 - p3 >= 4 + 4 + 4 + 4 + 4, "truncated mdhd v0")
                      mdTimescale = be32(bytes, p3 + 12)
                      mdDuration = be32(bytes, p3 + 16)
                    }
                  case ("hdlr", p3, e3) =>
                    require(e3 - p3 >= 12, "truncated hdlr")
                    handler = fourcc(bytes, p3 + 8)
                  case ("minf", p3, e3) =>
                    walk(bytes, p3, e3) {
                      case ("stbl", p4, e4) =>
                        walk(bytes, p4, e4) {
                          case ("stsz", p5, e5) =>
                            // a second stsz would overwrite nSamples but
                            // ACCUMULATE sampleBytes — an inconsistent
                            // Track row; fail loudly (walker contract)
                            require(!sawStsz, "multiple stsz boxes in one trak")
                            sawStsz = true
                            require(e5 - p5 >= 12, "truncated stsz")
                            val defaultSize = be32(bytes, p5 + 4)
                            val n = be32(bytes, p5 + 8)
                            nSamples = n
                            if (defaultSize != 0) sampleBytes = defaultSize * n
                            else {
                              require(e5 - p5 >= 12 + 4 * n,
                                s"stsz declares $n entries beyond its box")
                              var i = 0
                              while (i < n) {
                                sampleBytes += be32(bytes, p5 + 12 + 4 * i)
                                i += 1
                              }
                            }
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
            require(tid >= 0, "trak without tkhd")
            require(mdTimescale >= 0, "trak without mdhd")
            tracks += Track(tid, handler, mdTimescale, mdDuration,
              nSamples, sampleBytes)
          case _ => ()
        }
      case _ => () // mdat / free / unknown: skip by declared size
    }
    require(sawMoov, "no moov box")
    require(mvTimescale > 0, "no mvhd")
    Movie(brand, mvTimescale, mvDuration, tracks.result())
  }

  // ------------------------------------------------------------ render

  private def be32b(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32b(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  /** Render a minimal spec-conformant MP4 skeleton: ftyp + moov(mvhd +
    * per-track trak(tkhd + mdia(mdhd + hdlr + minf(stbl(stsz))))) +
    * mdat. The fixture's other half — `parse(render(m))` must walk back
    * exactly the inputs (Mp4Spec + the q150 oracle).
    */
  def render(m: Movie, mdat: Array[Byte]): Array[Byte] = {
    val ftyp = box("ftyp", m.brand.getBytes("US-ASCII") ++ be32b(0L) ++
      m.brand.getBytes("US-ASCII"))
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ // version 0 + flags
      be32b(0L) ++ be32b(0L) ++ // ctime mtime
      be32b(m.timescale) ++ be32b(m.duration) ++
      new Array[Byte](80)) // rate/volume/matrix/predefined/next-track
    val traks = m.tracks.map { t =>
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++
        be32b(0L) ++ be32b(0L) ++ be32b(t.id) ++ be32b(0L) ++
        new Array[Byte](4 + 8 + 8 + 36 + 8)) // duration+reserved+matrix+wh
      val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++
        be32b(0L) ++ be32b(0L) ++ be32b(t.timescale) ++ be32b(t.duration) ++
        Array[Byte](0x55, 0xc4.toByte, 0, 0)) // language 'und' + predefined
      val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0) ++ be32b(0L) ++
        t.handler.getBytes("US-ASCII") ++ new Array[Byte](12) ++
        Array[Byte](0)) // reserved + empty name
      // per-sample sizes: deterministic spread summing to sampleBytes
      val sizes: Array[Long] =
        if (t.sampleCount == 0) Array.empty
        else {
          val base = t.sampleBytes / t.sampleCount
          val rem = t.sampleBytes % t.sampleCount
          Array.tabulate(t.sampleCount.toInt)(i =>
            base + (if (i < rem) 1L else 0L))
        }
      val stsz = box("stsz", Array[Byte](0, 0, 0, 0) ++ be32b(0L) ++
        be32b(t.sampleCount) ++ sizes.flatMap(be32b))
      val stbl = box("stbl", stsz)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    ftyp ++ moov ++ box("mdat", mdat)
  }
}
