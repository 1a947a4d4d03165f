package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k per group as a typed `Aggregator` with MAP-SIDE PARTIAL
  * AGGREGATION — the scale-correct alternative to the window form
  * ([[Dedup.keepFirstK]]) for small k over many candidates.
  *
  * The window form shuffles EVERY candidate row to its group's partition
  * and sorts there; this aggregator keeps a bounded k-element buffer per
  * group per map task, so only ≤ k·partitions rows per group cross the
  * exchange. At an ANN candidate fan-in of thousands per query and k=5,
  * that is a ~1000× shuffle reduction — exactly the partial-agg shape the
  * build brief asks every aggregate to have. Results are identical to the
  * window form: the buffer orders by (score DESC, id ASC), the same total
  * order `keepFirstK` sorts by (equivalence test-pinned).
  */
object TopK {

  /** One scored candidate: the (id, scaled-score) shape every similarity
    * ranking in the engine reduces to (SURVEY §2.11's "custom aggregate"
    * slot, next to the graph-metrics Aggregator).
    */
  case class Scored(id: Long, score: Long)

  /** Keep the k best by (score desc, id asc) — a sorted bounded list;
    * O(k) insert, O(k) merge, both orders of magnitude below shuffle cost
    * at small k.
    */
  class TopKByScore(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    require(k > 0, s"k must be positive, got $k")
    private def beats(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    private def insert(buf: List[Scored], s: Scored): List[Scored] = {
      if (buf.lengthCompare(k) >= 0 && beats(buf.last, s)) buf
      else {
        val (pre, post) = buf.span(beats(_, s))
        (pre ::: s :: post).take(k)
      }
    }
    def zero: List[Scored] = Nil
    def reduce(buf: List[Scored], a: Scored): List[Scored] = insert(buf, a)
    def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(insert)
    def finish(buf: List[Scored]): Seq[Scored] = buf
    def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  /** Top-k rows per group: input columns (group, id, score) → output rows
    * (group, id, score, rank) identical to
    * `Dedup.keepFirstK(..., score.desc, id.asc)` but executed as a
    * partial+final object-hash aggregate instead of a full shuffle + sort.
    */
  def topKByScore(df: DataFrame, group: Column, id: Column, score: Column,
                  k: Int): DataFrame = {
    val agg = udaf(new TopKByScore(k))
    df.select(group.as("__g"), id.as("__id"), score.as("__score"))
      .groupBy(col("__g"))
      .agg(agg(col("__id"), col("__score")).as("__top"))
      .select(col("__g"), posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col("__g").as("group"), col("__s.id").as("id"),
        col("__s.score").as("score"), (col("__pos") + 1).cast("long").as("rank"))
  }
}
