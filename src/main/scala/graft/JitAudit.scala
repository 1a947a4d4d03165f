package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.command.ExecutedCommandExec

/** JIT-size audit: whole-stage-codegen methods past HotSpot's 8000-byte
  * `DontCompileHugeMethods` limit run in the bytecode INTERPRETER with no
  * warning from Spark — the silent 10–35× slowdown that hit the PQ encode
  * path (see SCALE.md's PQ section). This main compiles every codegen
  * subtree of the named queries (default: all) at sf0.001 and flags any
  * method at or past the limit. Dev tool — not part of the driver
  * contract; run after adding expression-heavy projections.
  */
object JitAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    // AQE wraps stages lazily and hides WholeStageCodegen nodes until
    // execution; the audit only needs the generated code, so plan
    // statically. Codegen content is identical either way.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    var worst = 0
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, d)
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[WholeStageCodegenExec] = {
          // subquery plans (scalar subqueries, the bloom gates) are
          // separate trees reachable only via subqueries — codegen in
          // them must not escape the audit
          val subs = p.subqueries.flatMap(walk)
          (p match {
            case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
            case w: WholeStageCodegenExec => w +: w.children.flatMap(walk)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
            case _: ExecutedCommandExec => Nil
            case other => other.children.flatMap(walk)
          }) ++ subs
        }
        val sizes = walk(df.queryExecution.executedPlan).map { w =>
          val (_, code) = w.doCodeGen()
          org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
            .compile(code)._2.maxMethodCodeSize
        }
        val top = if (sizes.isEmpty) 0 else sizes.max
        worst = math.max(worst, top)
        val flag = if (top >= 8000) "  <-- PAST JIT LIMIT (interpreted!)" else ""
        println(f"[jit] $name%-28s max WSCG method = $top%6d bytes$flag")
      } catch {
        case e: Throwable => println(s"[jit] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    println(s"[jit] worst across ${names.size} queries: $worst bytes (limit 8000)")
    spark.stop()
  }
}
