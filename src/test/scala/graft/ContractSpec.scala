package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants that round 1 lost a whole round to:
  * every registered query must carry an oracle (and vice versa), and the
  * registry must stay non-trivially populated.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle twin and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles missing queries: ${(o -- q).toSeq.sorted}")
    assert(q.size >= 52)
  }

  test("query names are unique across the contributing registries") {
    import graft.queries._
    val maps = Seq(Relational.all, JsonPipelines.all, LlmPipelines.all,
      Graphs.all, Extensions.all)
    val total = maps.map(_.size).sum
    assert(total == SparkEntry.queries.size,
      "a query name collides across registries (map ++ silently dropped one)")
  }
}
