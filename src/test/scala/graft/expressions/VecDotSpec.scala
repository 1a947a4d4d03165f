package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VecDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vec_dot matches the interpreted HOF fold bit-for-bit") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.5f)),
      (Seq(0.1f, 0.2f), Seq(0.3f, 0.4f))
    ).toDF("a", "b")
    val out = df.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (native, hof) =>
      assert(java.lang.Double.doubleToLongBits(native) ==
        java.lang.Double.doubleToLongBits(hof))
    }
  }

  test("vec_dot resolves in SQL via the session extension and is null-safe") {
    val viaSql = spark.sql(
      "SELECT vec_dot(array(cast(2.0 as float)), array(cast(3.5 as float)))")
      .as[Double].head()
    assert(viaSql == 7.0)
    val nulls = Seq((Option.empty[Seq[Float]], Some(Seq(1f))))
      .toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")))
      .as[Option[Double]].head()
    assert(nulls.isEmpty) // null array → null, no crash
  }

  test("vec_dot participates in whole-stage codegen") {
    // non-literal input, or constant folding evaluates it at plan time
    val df = spark.range(3)
      .select(array(col("id").cast("float"), lit(2.0f)).as("v"))
      .select(call_function("vec_dot", col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; vec_dot must be
    // INSIDE one, not a fallback project
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("vec_dot")), plan)
    assert(df.as[Double].collect().toSet == Set(4.0, 5.0, 8.0)) // id²+4
  }
}
