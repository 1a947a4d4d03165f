package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KeysSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contentKey is deterministic and distinguishes field order-sensitive content") {
    val df = Seq(("p1", 5L), ("p1", 5L), ("p2", 5L)).toDF("payer", "amount")
    val keys = df.select(Keys.contentKey(col("payer"), col("amount")).as("k"))
      .as[String].collect()
    assert(keys(0) == keys(1)) // identical content → identical key
    assert(keys(0) != keys(2)) // different content → different key
    assert(keys(0).matches("[0-9a-f]{32}"))
  }

  test("pairKey mirrors md5(challengee ‖ witness) and is order-sensitive") {
    val df = Seq(("a", "b")).toDF("x", "y")
    val Array((ab, ba)) = df.select(
      Keys.pairKey(col("x"), col("y")).as("ab"),
      Keys.pairKey(col("y"), col("x")).as("ba")).as[(String, String)].collect()
    assert(ab != ba) // ordered pair: one edge per direction
  }

  test("vertexRef/vertexKey round-trip") {
    val df = Seq("addr1", "addr/with/slashes").toDF("k")
    val out = df.select(Keys.vertexKey(Keys.vertexRef("hotspots", col("k"))).as("back"))
      .as[String].collect()
    assert(out(0) == "addr1")
    assert(out(1) == "slashes") // AQL LAST(SPLIT(...)) semantics preserved
  }

  test("scalarKey matches a known md5 fixture") {
    val out = Seq("abc").toDF("c").select(Keys.scalarKey(col("c"))).as[String].head()
    assert(out == "900150983cd24fb0d6963f7d28e17f72")
  }
}
