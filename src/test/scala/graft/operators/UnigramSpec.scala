package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val MaxLen = 4

  /** Independent reference: exhaustive enumeration of all piece tilings,
    * ranked by (n_pieces asc, score desc, pieces-string asc) — the same
    * objective the DP fold optimizes, implemented by a different
    * algorithm (the DuckDB-oracle shape, in-JVM).
    */
  private def bruteBest(w: String, vocab: Map[String, Long]): (Int, Long, String) = {
    def tilings(rest: String): Seq[List[String]] =
      if (rest.isEmpty) Seq(Nil)
      else (1 to math.min(MaxLen, rest.length)).flatMap { j =>
        val piece = rest.take(j)
        if (j == 1 || vocab.contains(piece))
          tilings(rest.drop(j)).map(piece :: _)
        else Seq.empty
      }
    tilings(w)
      .map { t => (t.size, t.map(p => vocab.getOrElse(p, 0L)).sum, t.mkString(" ")) }
      .minBy { case (np, sc, seg) => (np, -sc, seg) }
  }

  private def segment(words: Seq[String], vocab: Seq[(String, Long)]) =
    Unigram.segment(words.toDF("w"), "w", vocab, MaxLen)
      .select("w", "n_pieces", "score", "pieces")
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("prefers fewest pieces, then highest support, then lexicographic") {
    val vocab = Seq("ab" -> 5L, "cd" -> 5L, "abcd" -> 1L,
      "a" -> 9L, "b" -> 9L, "c" -> 9L, "d" -> 9L)
    // 1 piece beats 2 pieces despite lower total score
    assert(segment(Seq("abcd"), vocab)("abcd") == ((1L, 1L, "abcd")))
    // equal piece count: higher score wins ("xy"+"z" vs "x"+"yz")
    val v2 = Seq("xy" -> 10L, "yz" -> 3L, "x" -> 1L, "z" -> 2L, "y" -> 1L)
    assert(segment(Seq("xyz"), v2)("xyz") == ((2L, 12L, "xy z")))
    // full tie on count and score: lexicographically smaller rendering
    val v3 = Seq("aa" -> 4L, "a" -> 2L)
    // "aa a" vs "a aa": both 2 pieces, score 6 — "a aa" sorts first
    assert(segment(Seq("aaa"), v3)("aaa") == ((2L, 6L, "a aa")))
  }

  test("characters outside the vocabulary fall back to score-0 singles") {
    val out = segment(Seq("q!"), Seq("q" -> 7L))
    assert(out("q!") == ((2L, 7L, "q !")))
  }

  test("DP equals exhaustive enumeration on randomized words and vocabularies") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    val words = Seq.fill(60)(
      (1 to (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      .distinct
    val pieces = Seq.fill(30)(
      (1 to (2 + rnd.nextInt(3))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      .distinct
    val vocab = alphabet.map(c => c.toString -> (1L + rnd.nextInt(50))) ++
      pieces.map(p => p -> (1L + rnd.nextInt(50)))
    val got = segment(words, vocab)
    val vm = vocab.toMap
    words.foreach { w =>
      val (np, sc, seg) = bruteBest(w, vm)
      assert(got(w) == ((np.toLong, sc, seg)), s"word '$w'")
    }
  }

  test("trainVocab keeps all single chars plus exactly topK multi-char pieces") {
    val words = Seq(("banana", 10L), ("bandana", 5L), ("ana", 7L))
      .toDF("w", "f")
    val v = Unigram.trainVocab(words, "w", "f", maxLen = 3, topK = 4)
      .as[(String, Long)].collect().toSeq
    val (singles, multis) = v.partition(_._1.length == 1)
    assert(singles.map(_._1).sorted == Seq("a", "b", "d", "n"))
    assert(multis.size == 4)
    // support sums word freq once per occurrence position: "an" appears
    // twice in banana (2×10), twice in bandana (2×5), once in ana (7)
    assert(v.toMap.apply("an") == 37L)
    // single-char support likewise positional: 'a' = 3·10 + 3·5 + 2·7
    assert(v.toMap.apply("a") == 59L)
  }

  test("duplicate vocab rows in training input sum their frequencies") {
    val words = Seq(("ab", 3L), ("ab", 4L)).toDF("w", "f")
    val v = Unigram.trainVocab(words, "w", "f", maxLen = 2, topK = 2)
      .as[(String, Long)].collect().toMap
    assert(v("ab") == 7L && v("a") == 7L)
  }

  test("refineVocab: unused multi-char pieces are pruned, singles survive with usage") {
    // seed vocab makes "ab"+"cd" optimal for "abcd"; "bc" never wins
    val vocab = Seq("ab" -> 9L, "cd" -> 9L, "bc" -> 1L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
    val words = Seq(("abcd", 5L), ("ab", 2L)).toDF("w", "f")
    val v2 = Unigram.refineVocab(words, "w", "f", vocab, maxLen = 4).toMap
    assert(v2("ab") == 7L, "usage = 5 (in abcd) + 2 (alone)")
    assert(v2("cd") == 5L)
    assert(!v2.contains("bc"), "never-used piece pruned")
    assert(v2("a") == 0L && v2("b") == 0L, "unused singles kept at usage 0")
    // re-segmentation under the refined vocab is still the enumeration
    // optimum for that vocab
    val got = segment(Seq("abcd", "abab"), v2.toSeq)
    val vm = v2
    Seq("abcd", "abab").foreach { w =>
      val (np, sc, seg) = bruteBest(w, vm)
      assert(got(w) == ((np.toLong, sc, seg)), s"word '$w'")
    }
  }

  test("oversized word fails loudly instead of building an O(len²) DP row") {
    val e = intercept[Exception] {
      segment(Seq("x" * 65), Seq("x" -> 1L))
    }
    assert(e.getMessage.contains("maxWordLen") ||
      e.getCause != null && e.getCause.getMessage.contains("maxWordLen"))
  }

  test("segmentation plan: one exchange (the distinct), DP is a pure projection") {
    val plan = Unigram.segment(Seq("abc").toDF("w"), "w",
        Seq("ab" -> 1L, "a" -> 1L, "b" -> 1L, "c" -> 1L), MaxLen)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"expected only the distinct's exchange:\n$plan")
  }
}
