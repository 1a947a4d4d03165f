package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect()(0).getAs[T](0)

  test("bpePieces: caps letter runs at 4, digits at 3, splits contractions") {
    val pieces = Seq("it's extraordinary 12345!")
      .toDF("t").select(Text.bpePieces(col("t"))).as[Seq[String]].head()
    // extraordinary (13 letters) → 4+4+4+1 pieces; 12345 → 123, 45
    assert(pieces === Seq("it", "'s", "extr", "aord", "inar", "y",
      "123", "45", "!"))
  }

  test("tokens collapse runs of whitespace and trim edges") {
    val toks = Seq("  a  b\tc ").toDF("t")
      .select(Text.tokens(col("t"))).as[Seq[String]].head()
    assert(toks == Seq("a", "b", "c"))
  }

  test("shingles: word 3-grams, distinct, empty below k tokens") {
    val df = Seq("a b c d", "a b", "x y x y x y").toDF("t")
      .select(Text.tokens(col("t")).as("toks"))
      .select(Text.shingles(col("toks"), 3)).as[Seq[String]].collect()
    assert(df(0) == Seq("a b c", "b c d"))
    assert(df(1) == Seq())
    assert(df(2) == Seq("x y x", "y x y")) // distinct collapses repeats
  }

  test("hash32/baseHash32/affine are deterministic and in range") {
    val row = Seq("shingle").toDF("s").select(
      Text.hash32(col("s"), 3).as("h"),
      Text.baseHash32(col("s")).as("b"),
      Text.affine(Text.baseHash32(col("s")), 7).as("a"))
      .as[(Long, Long, Long)].head()
    val again = Seq("shingle").toDF("s").select(
      Text.hash32(col("s"), 3), Text.baseHash32(col("s")),
      Text.affine(Text.baseHash32(col("s")), 7)).as[(Long, Long, Long)].head()
    assert(row == again)
    assert(row._1 >= 0 && row._1 < (1L << 32))
    assert(row._3 >= 0 && row._3 < Text.HashP)
  }

  test("rollingHash is order-sensitive; normalized is not content-destroying") {
    val hashes = Seq("a b c", "c b a", "a  b   c").toDF("t")
      .select(Text.rollingHash(Text.tokens(col("t")))).as[Long].collect()
    assert(hashes(0) != hashes(1)) // order matters
    assert(hashes(0) == hashes(2)) // whitespace does not
    val norm = Seq("  Foo   BAR ").toDF("t")
      .select(Text.normalized(col("t"))).as[String].head()
    assert(norm == "foo bar")
  }

  test("langGuess: marker max wins, declaration order breaks ties, und on none") {
    val out = Seq("the der the cat", "der die das", "zzz qqq", "le the")
      .toDF("t").select(Text.langGuess(Text.tokens(col("t"))))
      .as[String].collect().toSeq
    assert(out == Seq("en", "de", "und", "en")) // tie le/the → en first
  }

  test("PII redaction: ordered spans, multi-match, and count/replace agreement") {
    val text = "mail a.b+c@x-y.co and d@e.io, ip 192.168.0.1, " +
      "call +1 (555) 123-4567, ssn-ish 123456789 tail 12345678"
    val r = Seq(text).toDF("t")
      .select(Text.piiCounts(col("t")) :+ Text.redactPii(col("t")).as("red"): _*)
      .collect().head
    assert(r.getLong(0) == 2, "two emails")      // n_email
    assert(r.getLong(1) == 1, "one ip")          // n_ipv4
    assert(r.getLong(2) == 1, "one phone")       // n_phone
    assert(r.getLong(3) == 1, "one long id; 8 digits must NOT match") // n_idnum
    val red = r.getString(4)
    assert(red.contains("<EMAIL> and <EMAIL>"))
    assert(red.contains("<IP>") && red.contains("<PHONE>") && red.contains("<ID>"))
    assert(red.contains("12345678"), "8-digit run stays")
    assert(!red.contains("@") && !red.contains("192.168"))
  }

  test("PII order: an email's digits are never re-matched as phone/id") {
    // 10 digits before the @ would match idnum if the email had not been
    // consumed first — the ordered-application contract.
    val r = Seq("reach 1234567890@mail.com now").toDF("t")
      .select(Text.piiCounts(col("t")) :+ Text.redactPii(col("t")).as("red"): _*)
      .collect().head
    assert(r.getLong(0) == 1 && r.getLong(3) == 0)
    assert(r.getString(4).contains("reach <EMAIL> now"))
  }
}
