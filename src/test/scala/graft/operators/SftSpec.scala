package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (conv, ts, tiebreak, role, content)
  private def render(rows: Seq[(String, Long, Long, String, String)]) =
    Sft.renderChat(rows.toDF("conv", "ts", "tb", "role", "content"),
        Seq(col("conv")), col("ts"), col("tb"), col("role"), col("content"))
      .select("conv", "n_turns", "n_assistant", "rendered", "mask_starts",
        "mask_ends")
      .as[(String, Long, Long, String, Seq[Long], Seq[Long])]
      .collect().toSeq.sortBy(_._1)

  test("template renders turns in (time, tiebreak) order") {
    val out = render(Seq(
      ("c", 2L, 0L, "assistant", "hi there"),
      ("c", 1L, 0L, "user", "hello")))
    assert(out.head._4 == "<|user|>hello\n<|assistant|>hi there\n")
  }

  test("mask spans select exactly the assistant content substrings") {
    val rows = Seq(
      ("c", 1L, 0L, "user", "what is 2+2"),
      ("c", 2L, 0L, "assistant", "4"),
      ("c", 3L, 0L, "user", "and 3+3"),
      ("c", 4L, 0L, "assistant", "6, obviously"))
    val Seq((_, nTurns, nAsst, rendered, starts, ends)) = render(rows)
    assert(nTurns == 4 && nAsst == 2)
    val spans = starts.zip(ends).map { case (s, e) =>
      rendered.substring(s.toInt, e.toInt) }
    assert(spans == Seq("4", "6, obviously"))
  }

  test("equal timestamps order by tiebreak; masks stay aligned") {
    val rows = Seq(
      ("c", 5L, 2L, "assistant", "second"),
      ("c", 5L, 1L, "assistant", "first"))
    val Seq((_, _, _, rendered, starts, ends)) = render(rows)
    assert(rendered == "<|assistant|>first\n<|assistant|>second\n")
    val spans = starts.zip(ends).map { case (s, e) =>
      rendered.substring(s.toInt, e.toInt) }
    assert(spans == Seq("first", "second"))
  }

  test("a conversation with no assistant turns gets empty (not null) masks") {
    val Seq((_, n, na, _, starts, ends)) =
      render(Seq(("c", 1L, 0L, "user", "monologue")))
    assert(n == 1 && na == 0 && starts.isEmpty && ends.isEmpty)
  }

  test("conversations are independent: offsets restart per key") {
    val out = render(Seq(
      ("a", 1L, 0L, "assistant", "aa"),
      ("b", 1L, 0L, "assistant", "bbb")))
    assert(out.map(_._5) == Seq(Seq(13L), Seq(13L)),
      "both first spans start right after '<|assistant|>'")
    assert(out.map(r => r._6.head - r._5.head) == Seq(2L, 3L))
  }

  test("randomized conversations: every mask span extracts exactly its assistant content") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 30).flatMap { c =>
      (1 to 1 + rnd.nextInt(8)).map { t =>
        (s"c$c", rnd.nextInt(5).toLong, t.toLong,
          if (rnd.nextBoolean()) "assistant" else "user",
          (1 to 1 + rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      }
    }
    val expected = rows.groupBy(_._1).map { case (c, rs) =>
      c -> rs.sortBy(r => (r._2, r._3)).filter(_._4 == "assistant").map(_._5)
    }
    render(rows).foreach { case (c, _, nAsst, rendered, starts, ends) =>
      val spans = starts.zip(ends).map { case (s, e) =>
        rendered.substring(s.toInt, e.toInt) }
      assert(spans == expected(c), s"conversation $c")
      assert(nAsst == expected(c).size)
    }
  }

  test("one exchange serves offsets and rollup (window keys prefix the grouping)") {
    val df = Seq(("c", 1L, 0L, "user", "x")).toDF("conv", "ts", "tb", "role", "content")
    val plan = Sft.renderChat(df, Seq(col("conv")), col("ts"), col("tb"),
        col("role"), col("content"))
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"expected ≤1 exchange:\n$plan")
  }
}
