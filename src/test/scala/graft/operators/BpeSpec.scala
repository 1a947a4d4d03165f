package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Bpe.trainMerges]] against hand-derived merge sequences: the Sennrich
  * §3.2-style vocabulary (counts chosen so ties exercise the lexicographic
  * break), and overlap runs where greedy left-to-right keeps alternating
  * match positions.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def train(vocab: Seq[(String, Long)], n: Int) =
    Bpe.trainMerges(vocab.toDF("w", "f"), "w", "f", n)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
      .toSeq

  test("Sennrich-style vocabulary: ties break lexicographically, merged symbols re-pair") {
    // pair counts at step 1: es=9, st=9 (tie -> es), we=8, lo=7, ow=7, ...
    val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(train(vocab, 4) === Seq(
      (1, "e", "s", "es", 9L),   // tie with (s,t) 9 — left asc wins
      (2, "es", "t", "est", 9L), // the merged symbol immediately re-pairs
      (3, "l", "o", "lo", 7L),   // tie with (o,w) 7
      (4, "lo", "w", "low", 7L)))
  }

  test("overlapping run: greedy left-to-right keeps alternating positions") {
    // 'aaaa' has matches of (a,a) at pos 1,2,3 — one run; greedy keeps 1,3.
    val m = train(Seq("aaaa" -> 1L), 2)
    assert(m === Seq(
      (1, "a", "a", "aa", 3L),   // overlapping occurrences all count
      (2, "aa", "aa", "aaaa", 1L)))
  }

  test("odd run leaves a singleton tail that pairs with the next merge") {
    // 'aaaaa' -> matches at 1..4; greedy keeps 1,3 -> aa,aa,a. Then
    // (aa,aa)=1 ties (aa,a)=1: same left, right "a" < "aa" -> (aa,a).
    val m = train(Seq("aaaaa" -> 1L), 2)
    assert(m === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "aa", "a", "aaa", 1L)))
  }

  test("applyMerges segments unseen words with the trained table (the Sennrich demo)") {
    val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = train(vocab, 4).map(m => (m._2, m._3)) // es, est, lo, low
    val seg = Bpe.applyMerges(
        Seq("lowest", "newest", "x", "estlow").toDF("w"), "w", merges)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(seg === Seq(
      ("estlow", "est low", 2L),   // rank order: es -> est, then lo -> low
      ("lowest", "low est", 2L),   // the classic: unseen word, fully covered
      ("newest", "n e w est", 4L),
      ("x", "x", 1L)))
  }

  test("applyMerges over the training words reproduces the trainer's final state") {
    val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = train(vocab, 4).map(m => (m._2, m._3))
    val seg = Bpe.applyMerges(vocab.map(_._1).toDF("w"), "w", merges)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(seg === Seq(
      ("low", "low"), ("lower", "low e r"),
      ("newest", "n e w est"), ("widest", "w i d est")))
  }

  test("stops early when no adjacent pairs remain") {
    val m = train(Seq("ab" -> 1L), 5)
    assert(m.size === 1 && m.head === ((1, "a", "b", "ab", 1L)))
  }

  test("codegen'd kernel ≡ window algebra on randomized words and rule tables") {
    // The shipped applyMerges (BpeSegment expression) against the
    // independent relational twin, over a tiny alphabet so rules FIRE
    // often: runs of equal chars (l==r rules), overlaps, rules whose left
    // half is a previous rule's output.
    val rnd = new scala.util.Random(41)
    for (round <- 1 to 5) {
      val words = Seq.fill(60)(
        (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      // evolve rules the way training does: each rule merges two symbols
      // drawn from the current symbol pool, and its output joins the pool
      var pool = Seq("a", "b", "c")
      val rules = (1 to 6).map { _ =>
        val l = pool(rnd.nextInt(pool.size)); val r = pool(rnd.nextInt(pool.size))
        pool = (pool :+ (l + r)).distinct
        (l, r)
      }
      val df = words.toDF("w")
      val fast = Bpe.applyMerges(df, "w", rules)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val slow = Bpe.applyMergesWindowed(df, "w", rules)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(fast == slow, s"round $round diverged with rules $rules")
    }
  }

  test("kernel splits by code point: a surrogate pair is one symbol, like substring()") {
    // 𝕏 (U+1D54F) is two Java chars; the window form's substring() split
    // treats it as ONE symbol, so the kernel must too.
    val w = "a𝕏b"
    val fast = Bpe.applyMerges(Seq(w).toDF("w"), "w", Seq.empty)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(fast == ("a 𝕏 b", 3L))
    val slow = Bpe.applyMergesWindowed(Seq(w).toDF("w"), "w", Seq.empty)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(fast == slow)
  }
}
