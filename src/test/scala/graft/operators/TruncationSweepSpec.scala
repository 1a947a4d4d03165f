package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Attacker-shaped-bytes battery: for EVERY prefix of a valid file,
  * each decoder must either succeed or throw the contract exception
  * (IllegalArgumentException from a require) — never hang, never
  * escape with an unguarded ArrayIndexOutOfBounds/NegativeArraySize,
  * which would mean a bounds check is missing somewhere. One sweep per
  * walker, covering the whole r12–r14 codec family.
  */
class TruncationSweepSpec extends AnyFunSuite {

  private def sweep(name: String, bytes: Array[Byte])(decode: Array[Byte] => Any): Unit = {
    for (len <- 0 until bytes.length) {
      try { decode(bytes.take(len)); () }
      catch {
        case _: IllegalArgumentException => () // the contract failure
        case e: Throwable =>
          fail(s"$name: prefix of $len/${bytes.length} bytes escaped with " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    decode(bytes) // and the full file must decode
    ()
  }

  test("PNG: every truncation throws the contract exception") {
    val r = new scala.util.Random(1)
    sweep("png", Png.encode(6, 5, Array.fill(90)(r.nextInt(256).toByte)))(Png.decode)
  }

  test("JPEG: every truncation throws the contract exception") {
    val r = new scala.util.Random(2)
    sweep("jpeg", Jpeg.encode(16, 8, Array.fill(128)(r.nextInt(256).toByte)))(Jpeg.decode)
  }

  test("WAV: every truncation throws the contract exception") {
    sweep("wav", Multimodal.Wav.render(8000,
      Array.tabulate(300)(i => (i * 97 - 150).toShort)))(Multimodal.Wav.parse)
  }

  test("P6 stream: every truncation throws the contract exception") {
    val f0 = Multimodal.Ppm.render(3, 2, 255, Array.fill(18)(40.toByte))
    val f1 = Multimodal.Ppm.render(2, 4, 255, Array.fill(24)(200.toByte))
    sweep("p6stream", Multimodal.P6Stream.render(Seq(f0, f1)))(
      b => Multimodal.P6Stream.frames(b).toSeq)
  }

  test("MP4: every truncation throws the contract exception") {
    val m = Mp4.Movie("isom", 1000L, 4000L, Vector(
      Mp4.Track(1L, "vide", 90000L, 300L, 4L, 41L),
      Mp4.Track(2L, "soun", 48000L, 500L, 3L, 33L)))
    sweep("mp4", Mp4.render(m, Array[Byte](1, 2, 3)))(Mp4.parse)
  }

  test("MP3: every truncation throws the contract exception") {
    val fs = Seq(
      Mp3.renderFrame(2, 1, padded = true, len => Array.fill(len)(5.toByte)),
      Mp3.renderFrame(7, 0, padded = false, len => Array.fill(len)(0xff.toByte)))
    sweep("mp3", Mp3.render(fs))(b => Mp3.frames(b).toSeq)
  }
}
