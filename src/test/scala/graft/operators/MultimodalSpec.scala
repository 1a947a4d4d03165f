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
}
