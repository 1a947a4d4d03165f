package graft.operators

/** REAL MP3 (MPEG-1 Layer III) FRAME walker — the audio analog of
  * [[Multimodal.P6Stream]]: every frame declares its own extent through
  * its 4-byte header (11-bit sync, version/layer bits, bitrate and
  * sample-rate table indices, padding bit — all public ISO 11172-3
  * structure), so frame boundaries, bitrates, and payload bytes are
  * parseable WITHOUT decoding any audio: frame length =
  * ⌊144·bitrate/samplerate⌋ + padding. What stays stubbed is only the
  * psychoacoustic payload decode (Huffman spectral data + subband
  * synthesis — a perceptual codec with no loss-free fixed point to pin
  * an oracle on); a production build hands each walked frame to a
  * decoder, and the walk here is exactly the framing it would route on.
  *
  * Same contract as every walker: header fields are table-validated,
  * declared lengths must fit the buffer, every step makes strict
  * forward progress, truncation and reserved indices throw.
  */
object Mp3 {

  /** MPEG-1 Layer III bitrates (kbps) by header index 1..14; 0 (free)
    * and 15 (reserved) are rejected.
    */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates (Hz) by header index 0..2; 3 is reserved. */
  val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)

  /** One walked frame: index, absolute offsets, and the header's
    * declared parameters.
    */
  final case class FrameRef(index: Int, start: Int, end: Int,
                            bitrateKbps: Int, sampleRate: Int,
                            padded: Boolean)

  /** Frame length in bytes (Layer III): ⌊144 · bitrate / samplerate⌋ +
    * padding (the spec's slot arithmetic; a Layer-III slot is 1 byte).
    */
  def frameLength(bitrateKbps: Int, sampleRate: Int, padded: Boolean): Int =
    144 * bitrateKbps * 1000 / sampleRate + (if (padded) 1 else 0)

  /** Walk the stream lazily, in place. Fails loudly on lost sync, a
    * reserved bitrate/samplerate index, a non-MPEG1-Layer-III header,
    * or a truncated final frame.
    */
  def frames(bytes: Array[Byte]): Iterator[FrameRef] =
    new Iterator[FrameRef] {
      private var off = 0
      private var idx = 0
      def hasNext: Boolean = off < bytes.length
      def next(): FrameRef = {
        require(off + 4 <= bytes.length, s"truncated MP3 header at $off")
        val b0 = bytes(off) & 0xff
        val b1 = bytes(off + 1) & 0xff
        val b2 = bytes(off + 2) & 0xff
        require(b0 == 0xff && (b1 & 0xe0) == 0xe0, s"lost frame sync at $off")
        val version = (b1 >> 3) & 0x03
        val layer = (b1 >> 1) & 0x03
        require(version == 3, s"only MPEG-1 supported (version bits $version)")
        require(layer == 1, s"only Layer III supported (layer bits $layer)")
        val bIdx = (b2 >> 4) & 0x0f
        val sIdx = (b2 >> 2) & 0x03
        require(bIdx >= 1 && bIdx <= 14,
          s"free/reserved bitrate index $bIdx at $off")
        require(sIdx <= 2, s"reserved sample-rate index at $off")
        val padded = ((b2 >> 1) & 1) == 1
        val len = frameLength(BitrateKbps(bIdx), SampleRateHz(sIdx), padded)
        val end = off + len
        require(end > off && end <= bytes.length,
          s"frame at $off declares $len bytes, ${bytes.length - off} remain")
        val f = FrameRef(idx, off, end, BitrateKbps(bIdx),
          SampleRateHz(sIdx), padded)
        off = end; idx += 1
        f
      }
    }

  /** Render one frame: valid header + caller-supplied payload filler
    * (called with the payload length = frame length − 4).
    */
  def renderFrame(bitrateIdx: Int, sampleRateIdx: Int, padded: Boolean,
                  payload: Int => Array[Byte]): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrate index $bitrateIdx")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2,
      s"sample-rate index $sampleRateIdx")
    val len = frameLength(BitrateKbps(bitrateIdx), SampleRateHz(sampleRateIdx),
      padded)
    val body = payload(len - 4)
    require(body.length == len - 4,
      s"payload filler returned ${body.length} bytes, need ${len - 4}")
    Array(0xff.toByte, 0xfb.toByte, // sync + MPEG1 + Layer III + no CRC
      (((bitrateIdx << 4) | (sampleRateIdx << 2) |
        (if (padded) 2 else 0)) & 0xff).toByte,
      0xc0.toByte) ++ body // mono, no mode extension
  }

  /** Concatenate frames into a stream (the fixture's other half). */
  def render(fs: Seq[Array[Byte]]): Array[Byte] = fs.flatten.toArray
}
