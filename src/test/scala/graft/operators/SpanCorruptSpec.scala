package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[SpanCorrupt]] invariants. The mask is hash-derived (no fixture can
  * hand-pick it), so the spec pins the STRUCTURAL contract instead — most
  * importantly lossless round-trip: substituting each sentinel's target
  * span back into the inputs must reconstruct the original token stream
  * exactly, for every document.
  */
class SpanCorruptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sentinel = "<extra_id_(\\d+)>".r

  private def roundTrip(inputs: String, targets: String): String = {
    // parse targets: "<extra_id_0> tok tok <extra_id_1> tok ..." → spans
    val spans = scala.collection.mutable.Map.empty[Int, List[String]]
    var cur = -1
    targets.split(" ").filter(_.nonEmpty).foreach {
      case sentinel(k) => cur = k.toInt; spans(cur) = Nil
      case tok => spans(cur) = spans(cur) :+ tok
    }
    inputs.split(" ").filter(_.nonEmpty).flatMap {
      case sentinel(k) => spans(k.toInt)
      case tok => List(tok)
    }.mkString(" ")
  }

  test("round-trip: inputs + targets reconstruct every original document") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (3L, "one"),
      (4L, (1 to 200).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SpanCorrupt.examples(docs, "doc_id", "text", ratePm = 300)
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(out.length == 4)
    val original = docs.as[(Long, String)].collect().toMap
    out.foreach { case (id, nTok, nSpans, nMasked, inputs, targets) =>
      assert(roundTrip(inputs, targets) == original(id), s"doc $id corrupted")
      val inToks = inputs.split(" ").filter(_.nonEmpty)
      val tgtToks = targets.split(" ").filter(_.nonEmpty)
      assert(inToks.length == nTok - nMasked + nSpans, s"doc $id input arity")
      assert(tgtToks.length == nMasked + nSpans, s"doc $id target arity")
      assert(nSpans <= nMasked)
      // sentinels appear 0..n-1 in order, in both streams
      val inSent = inToks.collect { case sentinel(k) => k.toInt }.toSeq
      val tgtSent = tgtToks.collect { case sentinel(k) => k.toInt }.toSeq
      assert(inSent == (0 until nSpans.toInt) && tgtSent == inSent,
        s"doc $id sentinel numbering: $inSent / $tgtSent")
    }
    // the 200-token doc masks ~30%: loose band to catch a broken mask
    val big = out.find(_._1 == 4L).get
    assert(big._4 > 30 && big._4 < 90, s"mask rate off: ${big._4}/200 masked")
  }

  test("rate 0 masks nothing; rate 1000 masks everything into one span") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val none = SpanCorrupt.examples(docs, "doc_id", "text", ratePm = 0)
      .as[(Long, Long, Long, Long, String, String)].head()
    assert(none == ((1L, 3L, 0L, 0L, "alpha beta gamma", "")))
    val all = SpanCorrupt.examples(docs, "doc_id", "text", ratePm = 1000)
      .as[(Long, Long, Long, Long, String, String)].head()
    assert(all == ((1L, 3L, 1L, 3L, "<extra_id_0>",
      "<extra_id_0> alpha beta gamma")))
  }
}
