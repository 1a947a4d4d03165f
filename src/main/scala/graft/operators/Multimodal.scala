package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise.
  *
  * The decode step itself (JPEG/PNG/audio codecs) is STUBBED — the
  * container ships no media libraries — behind [[MediaCodec]]:
  * [[DeterministicStubCodec]] derives features from the raw bytes so the
  * whole pipeline is real and testable end-to-end (schema, partitioning,
  * batch shape, feature fan-out), and a production codec (javacv/ffmpeg)
  * drops into the one trait method.
  *
  * Scale design: media bytes never shuffle — metadata extraction and
  * featurization are row/partition-local; only the (small) feature vectors
  * and metadata flow into downstream joins. `mapPartitions` amortizes
  * per-batch codec setup exactly like a vectorized-UDF batch would; batch
  * memory is bounded by `spark.sql.files.maxPartitionBytes`, not file
  * count.
  */
object Multimodal {

  /** Typed metadata carried next to every opaque binary column. */
  case class MediaMeta(sizeBytes: Long, sha: String, format: String)

  /** One decoded row: stub "dimensions" + a small feature vector. */
  case class MediaFeatures(id: Long, sizeBytes: Long, sha: String,
    width: Int, height: Int, byteSum: Long, firstByte: Int, lastByte: Int)

  private implicit val inEnc: Encoder[(Long, Array[Byte])] =
    Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
  private implicit val outEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /** The decode seam. A real implementation parses the container format;
    * the stub derives deterministic pseudo-dimensions and features from
    * the bytes themselves.
    */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte]): MediaFeatures
  }

  object DeterministicStubCodec extends MediaCodec {
    def decode(bytes: Array[Byte]): MediaFeatures = {
      val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val last = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
      MediaFeatures(id = -1L, sizeBytes = bytes.length,
        sha = org.apache.commons.codec.digest.DigestUtils.md5Hex(bytes),
        width = 1 + first % 64, height = 1 + last % 64,
        byteSum = sum, firstByte = first, lastByte = last)
    }
  }

  /** Attach typed metadata to a binary column — pure column ops (codegen'd,
    * no decode needed): size, content hash, sniffed format tag.
    */
  def withMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", struct(
      length(col(binCol)).cast("long").as("sizeBytes"),
      md5(col(binCol)).as("sha"),
      when(substring(col(binCol), 1, 3) === lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)), "jpeg")
        .when(substring(col(binCol), 1, 4) === lit("RIFF".getBytes), "riff")
        .otherwise("unknown").as("format")))

  /** Partition-wise decode + featurize over (id, bytes) rows — the Scala
    * analog of a vectorized-UDF batch: one codec instance per partition,
    * rows streamed through it.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     binCol: String, codec: MediaCodec): DataFrame = {
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec setup happens here (amortized), then stream
        it.map { case (id, bytes) => codec.decode(bytes).copy(id = id) }
      }
      .toDF()
  }

  /** Resize stub: stride-resample the byte stream (every `stride`-th
    * byte), the partition-local shape of a pixel-domain resize — bytes in,
    * smaller bytes out, metadata updated, nothing shuffles. A production
    * implementation swaps the slice loop for the codec's scaler; the
    * output contract (id, original size, resized size, resized content
    * hash) is what downstream dedup/quality stages consume.
    */
  def resample(spark: SparkSession, df: DataFrame, idCol: String,
               binCol: String, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    implicit val enc: Encoder[(Long, Long, Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.STRING)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val kept = bytes.indices.by(stride).map(bytes(_)).toArray
          (id, bytes.length.toLong, kept.length.toLong,
            org.apache.commons.codec.digest.DigestUtils.md5Hex(kept))
        }
      }
      .toDF("id", "orig_bytes", "resized_bytes", "resized_sha")
  }

  /** Frame sampling stub for "video" bytes: split into `frames` equal
    * byte-ranges and hash each — the partition-local fan-out shape of real
    * frame extraction (explode of per-frame rows, bytes stay local).
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
                   binCol: String, frames: Int): DataFrame = {
    implicit val enc: Encoder[(Long, Int, String, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
        Encoders.STRING, Encoders.scalaLong)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = math.max(1, bytes.length / frames)
        (0 until frames).iterator.map { f =>
          val slice = bytes.slice(f * n, math.min((f + 1) * n, bytes.length))
          (id, f, org.apache.commons.codec.digest.DigestUtils.md5Hex(slice),
            slice.length.toLong)
        }
      }
      .toDF("id", "frame", "frame_sha", "frame_bytes")
  }
}
