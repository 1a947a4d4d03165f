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

  test("every registered query runs at sf0.001 (the driver's smoke scale)") {
    // The bench warmup swallows per-query errors at this scale; a query
    // that only works above some row count would otherwise surface as a
    // confusing driver-side failure.
    val spark = TestSpark.spark
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every registered query's PUBLIC output schema is scalar-only") {
    // The driver's correctness gate sorts result rows with pandas
    // sort_values, which throws on array/struct/map cells (unhashable
    // ndarray in factorize) — round 12's q127 was green in the dev
    // harness and red in the driver for exactly this. Operators may
    // return typed arrays (Sft.renderChat does, SftSpec pins it); the
    // REGISTERED projection must canonicalize them (to_json) first.
    import org.apache.spark.sql.types._
    val spark = TestSpark.spark
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, "/root/testdata/sf0.001").schema
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[StructType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[BinaryType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-scalar public output columns (driver cannot sort these):\n" +
        offenders.mkString("\n"))
  }

  test("query names are unique across the contributing registries") {
    import graft.queries._
    val maps = Seq(Relational.all, JsonPipelines.all, LlmPipelines.all,
      Graphs.all, Extensions.all, Curation.all, Sinks.all, Summaries.all)
    val total = maps.map(_.size).sum
    assert(total == SparkEntry.queries.size,
      "a query name collides across registries (map ++ silently dropped one)")
  }
}
