package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunk(texts: Seq[(String, String)], size: Int, overlap: Int) =
    Chunk.tokenWindows(texts.toDF("doc_id", "text"), "doc_id", "text",
        size, overlap)
      .select("doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_text")
      .as[(String, Int, Long, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))

  test("short doc yields exactly one full-coverage chunk") {
    val out = chunk(Seq(("a", "x y z")), size = 10, overlap = 3)
    assert(out == Seq(("a", 0, 0L, 3L, "x y z")))
  }

  test("windows advance by stride, overlap tokens repeat, tail may be short") {
    val toks = (1 to 10).map(i => s"t$i")
    val out = chunk(Seq(("a", toks.mkString(" "))), size = 4, overlap = 2)
    // stride 2: starts 0,2,4,6 — last window [6,10) reaches the end
    assert(out.map(_._3) == Seq(0L, 2L, 4L, 6L))
    assert(out.map(_._5) == Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8",
      "t7 t8 t9 t10"))
    assert(out.forall(_._4 == 4L))
  }

  test("every token position is covered and consecutive chunks overlap by exactly `overlap` (except a short tail)") {
    val toks = (1 to 57).map(i => s"w$i")
    val out = chunk(Seq(("a", toks.mkString(" "))), size = 8, overlap = 3)
    val covered = out.flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered == (0L until 57L).toSet)
    out.sliding(2).foreach {
      case Seq(p, n) => assert(n._3 - p._3 == 5L, "stride = size − overlap")
      case _ =>
    }
    // rebuild: stripping the first `overlap` tokens of every non-first
    // chunk reconstructs the document exactly
    val rebuilt = out.head._5.split(" ") ++
      out.tail.flatMap(_._5.split(" ").drop(3))
    assert(rebuilt.toSeq == toks)
  }

  test("chunk count matches 1 + ceil((n − size)/stride) and reaches the end") {
    for (n <- 1 to 40; size <- Seq(4, 7, 16); overlap <- Seq(0, 2)) {
      val toks = (1 to n).map(i => s"v$i")
      val out = chunk(Seq(("d", toks.mkString(" "))), size, overlap)
      val stride = size - overlap
      val expected = if (n <= size) 1 else 1 + ((n - size) + stride - 1) / stride
      assert(out.size == expected, s"n=$n size=$size overlap=$overlap")
      val last = out.last
      assert(last._3 + last._4 == n, "last window reaches the document end")
    }
  }

  test("empty/whitespace-only text yields no chunks; bad params rejected") {
    // split(trim(" "), "\\s+") gives a single empty token — one
    // empty-text chunk, the same row the oracle emits; a truly absent
    // text still chunks deterministically. Pin the non-empty case only.
    assertThrows[IllegalArgumentException](
      Chunk.tokenWindows(Seq(("a", "x")).toDF("doc_id", "text"),
        "doc_id", "text", size = 4, overlap = 4))
    assertThrows[IllegalArgumentException](
      Chunk.tokenWindows(Seq(("a", "x")).toDF("doc_id", "text"),
        "doc_id", "text", size = 0, overlap = 0))
  }

  private def cdc(texts: Seq[(String, String)], divisor: Int = 8) =
    Chunk.contentDefined(texts.toDF("doc_id", "text"), "doc_id", "text",
        divisor)
      .select("doc_id", "chunk_seq", "n_tok", "chunk_text", "chunk_hash")
      .as[(String, Long, Long, String, String)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("contentDefined: chunks tile the document exactly, in order") {
    val text = (1 to 80).map(i => s"w${i % 13}").mkString(" ")
    val out = cdc(Seq(("a", text)))
    assert(out.map(_._2) == (1L to out.size))
    assert(out.map(_._3).sum == 80L)
    assert(out.map(_._4).mkString(" ") == text, "concatenation rebuilds the doc")
    // mean chunk length is geometric-ish around the divisor: just pin
    // that boundaries actually fire (more than one chunk) and chunks
    // aren't all singletons
    assert(out.size > 1 && out.exists(_._3 > 1))
  }

  test("contentDefined boundaries are SHIFT-INVARIANT; fixed windows are not") {
    val base = (1 to 60).map(i => s"t${i * 7 % 17}x$i")
    val shifted = Seq("zzz", "yyy", "xxx") ++ base
    val a = cdc(Seq(("a", base.mkString(" "))))
    val b = cdc(Seq(("b", shifted.mkString(" "))))
    // boundaries at original positions >= 2 coincide (grams are pure
    // content), so every original chunk from seq 3 on lands unchanged
    val stable = a.filter(_._2 >= 3).map(_._5).toSet
    assert(stable.nonEmpty)
    assert(stable.subsetOf(b.map(_._5).toSet),
      "downstream chunks must survive a head insertion")
    // the fixed-window chunker loses EVERY hash under the same 3-token
    // shift (stride 16, shift 3 — no alignment)
    val fa = chunk(Seq(("a", base.mkString(" "))), 24, 8).map(_._5).toSet
    val fb = chunk(Seq(("b", shifted.mkString(" "))), 24, 8).map(_._5).toSet
    assert(fa.intersect(fb).forall(t => t.split(" ").length < 24)
      || fa.intersect(fb).isEmpty)
  }

  test("cdcDedupAgainst: an edited re-crawl contributes only its edited neighborhood") {
    val base = (1 to 60).map(i => s"t${i * 7 % 17}x$i")
    val edited = base.updated(30, "EDITED")
    val registry = Chunk.contentDefined(
      Seq(("orig", base.mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", 8).select(col("chunk_hash"))
    val out = Chunk.cdcDedupAgainst(
        Seq(("recrawl", edited.mkString(" "))).toDF("doc_id", "text"),
        registry, "doc_id", "text", 8)
      .select("doc_id", "n_chunks", "new_chunks", "new_text")
      .as[(String, Long, Long, String)].collect().head
    assert(out._2 > 4, "doc chunks into several pieces")
    // the edit can dirty at most the chunk containing it plus one
    // neighbor (a boundary may appear/vanish inside the edited grams)
    assert(out._3 >= 1 && out._3 <= 2,
      s"one mid-doc edit must not re-contribute the document (got ${out._3} of ${out._2})")
    assert(out._4.contains("EDITED"))
    // an unchanged re-crawl contributes nothing
    val clean = Chunk.cdcDedupAgainst(
        Seq(("again", base.mkString(" "))).toDF("doc_id", "text"),
        registry, "doc_id", "text", 8)
      .select("new_chunks", "new_text").as[(Long, String)].collect().head
    assert(clean == ((0L, "")))
  }

  /** Independent in-JVM reference for contentDefined: sequential scan,
    * same 2-gram md5 boundary rule — a different algorithm shape (linear
    * scan vs window algebra), the substringExcise cross-check convention.
    */
  private def naiveCdc(text: String, divisor: Int): Seq[(Long, Long, String)] = {
    val toks = text.trim.split("\\s+").toSeq
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("7:" + s).getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val chunks = scala.collection.mutable.Buffer.empty[Seq[String]]
    var cur = scala.collection.mutable.Buffer.empty[String]
    toks.zipWithIndex.foreach { case (t, i) =>
      cur += t
      val gram = if (i == 0) t else s"${toks(i - 1)} $t"
      if (h32(gram) % divisor == 0) { chunks += cur.toSeq; cur = scala.collection.mutable.Buffer.empty }
    }
    if (cur.nonEmpty) chunks += cur.toSeq
    chunks.toSeq.zipWithIndex.map { case (c, k) =>
      (k + 1L, c.size.toLong, c.mkString(" "))
    }
  }

  test("contentDefined ≡ an independent sequential reference on randomized docs") {
    val rnd = new scala.util.Random(13)
    val texts = (1 to 25).map { d =>
      (s"d$d", (1 to 1 + rnd.nextInt(90))
        .map(_ => s"w${rnd.nextInt(30)}").mkString(" "))
    }
    val got = cdc(texts, divisor = 6).groupBy(_._1)
    texts.foreach { case (id, text) =>
      val expected = naiveCdc(text, 6)
      val actual = got(id).map(r => (r._2, r._3, r._4))
      assert(actual == expected, s"doc $id")
    }
  }

  test("contentDefined: one doc-keyed exchange serves markers, offsets, and rebuild") {
    val plan = Chunk.contentDefined(
        Seq(("a", "x y z w")).toDF("doc_id", "text"), "doc_id", "text", 4)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"expected ≤1 exchange:\n$plan")
  }

  test("zero-shuffle plan: no Exchange below the chunker") {
    val plan = Chunk.tokenWindows(Seq(("a", "x y")).toDF("doc_id", "text"),
      "doc_id", "text", 4, 1).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"chunking must be row-local:\n$plan")
  }
}
