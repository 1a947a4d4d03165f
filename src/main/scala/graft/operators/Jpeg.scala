package graft.operators

/** REAL pure-JVM baseline JPEG codec (sequential DCT, 8-bit grayscale)
  * — the fifth real media format, and the first with a full
  * entropy-coding stack of its own: Huffman tables, a bit-level reader
  * with marker byte-unstuffing, zigzag coefficient order, quantization,
  * and the 8×8 DCT. Everything here is the public ITU T.81 spec: the
  * marker structure (SOI/DQT/SOF0/DHT/SOS/EOI), canonical Huffman code
  * construction (Annex C), the DC-difference + AC run-length symbol
  * coding with EXTEND (Annex F), the Annex K "typical" luminance code
  * tables, and the type-II DCT basis.
  *
  * Supported profile — fail-loudly on everything else, the repo's
  * walker contract: baseline sequential (SOF0), 8-bit precision, ONE
  * component (grayscale — full entropy+DCT machinery with no chroma
  * subsampling surface), 1×1 sampling, dimensions multiples of 8, no
  * restart intervals, no progressive (SOF2) or arithmetic coding.
  *
  * Exactness note (what makes JPEG oracle-able here): JPEG is lossy in
  * general, but an image whose 8×8 blocks are each CONSTANT is a fixed
  * point of the quant-1 pipeline — all AC basis sums cancel (quantize
  * to 0) and the DC term 8·(s−128) is integer-exact through the float
  * DCT — so encode→decode reproduces such images byte-exactly and a
  * DuckDB oracle can recompute the decoded pixels from their
  * definition (q148). The AC path is exercised and bounded by spec
  * tests on random images (JpegSpec), where the only error source at
  * quant 1 is FDCT coefficient rounding.
  */
object Jpeg {

  /** Decoded grayscale image: row-major 8-bit samples, w·h bytes. */
  final case class Gray(w: Int, h: Int, samples: Array[Byte])

  // Annex K.3.1: typical luminance DC code lengths + values
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // Annex K.3.2: typical luminance AC code lengths + values
  private val AcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // zigzag: index in scan order → index in natural (row-major) order
  private val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTable: Array[Double] = {
    // cos((2x+1)·u·π/16) for x, u in 0..7
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Canonical Huffman codes (Annex C.2): codes assigned in order of
    * increasing length, then value order. Returns (code, length) per
    * value for the encoder, and a flat (length → (firstCode, firstIdx,
    * count)) structure for the decoder.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    // decoder side: for each length 1..16, the smallest code and the
    // index of its first value
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // inclusive; -1 = no codes
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        val n = bits(len)
        var i = 0
        while (i < n) {
          val v = vals(k)
          codeOf(v) = code
          lenOf(v) = len
          code += 1; k += 1; i += 1
        }
        maxCode(len) = if (n > 0) code - 1 else -1
        code <<= 1
      }
      require(k == vals.length, "Huffman bits/vals mismatch")
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  private val DcTable = new HuffTable(DcBits, DcVals)
  private val AcTable = new HuffTable(AcBits, AcVals)

  /** Magnitude category (number of bits to represent |v|). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ---------------------------------------------------------------- encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s (spec F.1.2.3)
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def fdctQuant(block: Array[Int]): Array[Int] = {
    // type-II DCT with level shift, quantization table all-1s
    val out = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          val cy = CosTable(y * 8 + v)
          while (x < 8) {
            s += (block(y * 8 + x) - 128) * CosTable(x * 8 + u) * cy
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = math.round(0.25 * cu * cv * s).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    Array(0xff.toByte, marker.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
  }

  private def dhtPayload(cls: Int, id: Int, bits: Array[Int],
                         vals: Array[Int]): Array[Byte] =
    Array(((cls << 4) | id).toByte) ++
      (1 to 16).map(l => bits(l).toByte).toArray ++
      vals.map(_.toByte)

  /** Serialize grayscale samples as a baseline JPEG (quant all-1s,
    * Annex K luminance tables). Dimensions must be multiples of 8 —
    * the supported profile; a production encoder pads, this one
    * refuses.
    */
  def encode(w: Int, h: Int, samples: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"dimensions must be positive multiples of 8, got $w x $h")
    require(samples.length == w * h,
      s"need ${w * h} samples, got ${samples.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // DQT: precision 0, id 0, all-1s
    out.write(seg(0xdb, Array(0x00.toByte) ++ Array.fill(64)(1.toByte)))
    // SOF0: precision 8, h, w, 1 component (id 1, 1x1 sampling, qtable 0)
    out.write(seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 1, 1, 0x11, 0).map(_.toByte)))
    out.write(seg(0xc4, dhtPayload(0, 0, DcBits, DcVals)))
    out.write(seg(0xc4, dhtPayload(1, 0, AcBits, AcVals)))
    // SOS: 1 component, (dc table 0, ac table 0), Ss=0 Se=63 AhAl=0
    out.write(seg(0xda, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte)))
    val bw = new BitWriter(out)
    var dcPred = 0
    val block = new Array[Int](64)
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            block(y * 8 + x) = samples((by * 8 + y) * w + bx * 8 + x) & 0xff
            x += 1
          }
          y += 1
        }
        val coef = fdctQuant(block)
        // DC difference
        val diff = coef(0) - dcPred
        dcPred = coef(0)
        val s = category(diff)
        bw.write(DcTable.codeOf(s), DcTable.lenOf(s))
        if (s > 0)
          bw.write(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        // AC run-length
        var run = 0
        var k = 1
        while (k < 64) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              bw.write(AcTable.codeOf(0xf0), AcTable.lenOf(0xf0)) // ZRL
              run -= 16
            }
            val sz = category(v)
            val sym = (run << 4) | sz
            bw.write(AcTable.codeOf(sym), AcTable.lenOf(sym))
            bw.write(if (v >= 0) v else v + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0)
          bw.write(AcTable.codeOf(0x00), AcTable.lenOf(0x00)) // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "truncated JPEG entropy stream")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated JPEG after 0xFF")
          val m = bytes(pos) & 0xff
          require(m == 0x00,
            f"unexpected marker 0xFF$m%02X inside entropy-coded data")
          pos += 1 // stuffed zero
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (t.maxCode(len) < 0 || code > t.maxCode(len)) {
        require(len < 16, "invalid Huffman code in JPEG stream")
        code = (code << 1) | bit()
        len += 1
      }
      t.value(len, code)
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Parse a baseline grayscale JPEG to its samples. Throws a named
    * error on any profile deviation, malformed marker segment, invalid
    * Huffman code, or truncation.
    */
  def decode(bytes: Array[Byte]): Gray = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    var pos = 2
    var w = -1; var h = -1
    var quant: Array[Int] = null
    var dcT: HuffTable = null
    var acT: HuffTable = null
    var sawSof = false
    var scanAt = -1
    while (scanAt < 0) {
      require(pos + 4 <= bytes.length, s"truncated JPEG at marker offset $pos")
      require((bytes(pos) & 0xff) == 0xff,
        f"expected marker at $pos, got 0x${bytes(pos) & 0xff}%02X")
      val marker = bytes(pos + 1) & 0xff
      val len = be16(bytes, pos + 2)
      require(len >= 2 && pos + 2 + len <= bytes.length,
        f"marker 0xFF$marker%02X at $pos declares $len bytes beyond the buffer")
      val payload = pos + 4
      val plen = len - 2
      marker match {
        case 0xdb => // DQT — possibly several tables in one segment
          var o = payload
          while (o < payload + plen) {
            val pq = (bytes(o) & 0xf0) >> 4
            val tq = bytes(o) & 0x0f
            require(pq == 0, "16-bit quantization tables not supported")
            require(o + 65 <= payload + plen, "truncated DQT")
            if (tq == 0) {
              // Qk arrive in ZIGZAG order (spec B.2.4.1) — store natural
              quant = new Array[Int](64)
              var i = 0
              while (i < 64) { quant(Zigzag(i)) = bytes(o + 1 + i) & 0xff; i += 1 }
            }
            o += 65
          }
        case 0xc0 => // SOF0 baseline
          require(plen >= 8, "truncated SOF0")
          require((bytes(payload) & 0xff) == 8, "only 8-bit precision supported")
          h = be16(bytes, payload + 1); w = be16(bytes, payload + 3)
          val ncomp = bytes(payload + 5) & 0xff
          require(ncomp == 1, s"only 1-component (grayscale) JPEG supported, got $ncomp")
          require((bytes(payload + 7) & 0xff) == 0x11, "only 1x1 sampling supported")
          require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
            s"dimensions must be positive multiples of 8 (profile), got $w x $h")
          // Long arithmetic: 65528×65528 passes the per-axis bounds yet
          // overflows Int at the sample-buffer alloc — fail HERE, named
          require(1L * w * h <= Int.MaxValue - 64,
            s"image too large: $w x $h")
          sawSof = true
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) not supported")
        case 0xc4 => // DHT — possibly several tables
          var o = payload
          while (o < payload + plen) {
            val cls = (bytes(o) & 0xf0) >> 4
            val id = bytes(o) & 0x0f
            require(o + 17 <= payload + plen, "truncated DHT")
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = bytes(o + l) & 0xff; total += bits(l) }
            require(o + 17 + total <= payload + plen, "truncated DHT values")
            val vals = (0 until total).map(i => bytes(o + 17 + i) & 0xff).toArray
            val t = new HuffTable(bits, vals)
            if (id == 0) { if (cls == 0) dcT = t else acT = t }
            o += 17 + total
          }
        case 0xda => // SOS
          require(sawSof, "SOS before SOF0")
          require(quant != null, "SOS before DQT")
          require(dcT != null && acT != null, "SOS before DHT")
          scanAt = payload + plen
        case 0xd8 | 0xd9 => throw new IllegalArgumentException(
          f"unexpected marker 0xFF$marker%02X before scan")
        case 0xdd => throw new IllegalArgumentException(
          "restart intervals (DRI) not supported")
        case _ => () // APPn/COM/etc: skip by declared length
      }
      pos += 2 + len
    }
    val br = new BitReader(bytes, scanAt)
    val samples = new Array[Byte](w * h)
    val coef = new Array[Int](64)
    var dcPred = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        java.util.Arrays.fill(coef, 0)
        val s = br.decode(dcT)
        require(s <= 11, s"invalid DC category $s")
        dcPred += extend(br.bits(s), s)
        coef(0) = dcPred * quant(0)
        var k = 1
        var done = false
        while (k < 64 && !done) {
          val sym = br.decode(acT)
          val run = (sym >> 4) & 0x0f
          val sz = sym & 0x0f
          if (sz == 0) {
            if (run == 15) k += 16 // ZRL
            else done = true // EOB
          } else {
            k += run
            require(k < 64, "AC run past end of block")
            coef(Zigzag(k)) = extend(br.bits(sz), sz) * quant(Zigzag(k))
            k += 1
          }
        }
        // IDCT + level shift + clamp
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var sum = 0.0
            var v = 0
            while (v < 8) {
              var u = 0
              val cy = CosTable(y * 8 + v)
              while (u < 8) {
                val cu = if (u == 0) InvSqrt2 else 1.0
                val cv = if (v == 0) InvSqrt2 else 1.0
                sum += cu * cv * coef(v * 8 + u) * CosTable(x * 8 + u) * cy
                u += 1
              }
              v += 1
            }
            val px = math.round(0.25 * sum + 128.0).toInt
            samples((by * 8 + y) * w + bx * 8 + x) =
              math.max(0, math.min(255, px)).toByte
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    // past the last MCU the reader has already consumed every entropy
    // byte (pad bits live INSIDE the final consumed byte; stuffing is
    // eaten with its 0xFF) — so the buffer must continue with EOI and
    // END there, the Png 'trailing bytes after IEND' contract: scanning
    // forward for any 0xFFD9 would silently bless garbage between the
    // scan and EOI and arbitrary trailing bytes after it
    val p = br.pos
    require(p + 1 < bytes.length &&
      (bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) == 0xd9,
      "missing EOI after scan")
    require(p + 2 == bytes.length, s"trailing bytes after EOI at ${p + 2}")
    Gray(w, h, samples)
  }
}
