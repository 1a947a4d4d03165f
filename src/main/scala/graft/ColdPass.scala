package graft

/** Cold-pass attribution probe (r18 verdict #4): the driver's r18 bench
  * read q147 pass 0 at 262 s wall / 2043 CPU-s against 9.8 s / 66 CPU-s
  * warm — a production consumer runs a query ONCE, so whatever pass 0
  * pays is the number that matters to them. This main reproduces
  * Bench's exact pass-0 conditions (fresh JVM, the same optional
  * sf0.001 warmup, then timed passes at the target sf) and splits each
  * pass into the terms a cold JVM can pay:
  *
  *  - `jit_ms`: delta of the JVM's total JIT compilation time
  *    (CompilationMXBean) — C2 compiling the whole-stage-codegen
  *    classes and everything they call; until compiled, those loops run
  *    INTERPRETED, which burns task CPU at 10–30× (the JitAudit
  *    lesson, now measured per pass instead of inferred).
  *  - `codegen_compiles`: how many NEW generated classes Janino had to
  *    compile this pass (CodeGenerator's compilation cache metric) —
  *    distinguishes "same code, still JIT-warming" from "AQE planned
  *    different code at this sf than the warmup sf".
  *  - wall vs process-CPU: the contention axis, same reading rule as
  *    Bench.
  *
  * Usage: `runMain graft.ColdPass q147_pagerank_distributed [nowarm]
  * [passes=N]` — `nowarm` skips the sf0.001 warmup (isolates how much
  * of pass 0 the warmup actually absorbs).
  */
object ColdPass {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.collectFirst {
      case a if a.startsWith("passes=") => a.drop(7).toInt
    }.getOrElse(3)
    val warm = !args.contains("nowarm")
    val names = args.filterNot(a => a == "nowarm" || a.startsWith("passes="))
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(names.nonEmpty && unknown.isEmpty,
      s"usage: ColdPass <query...> [nowarm] [passes=N]; unknown: $unknown")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def codegenCompiles(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    if (warm) {
      val warmDir = "/root/testdata/sf0.001"
      val t0 = System.nanoTime(); val j0 = jitBean.getTotalCompilationTime
      val g0 = codegenCompiles() // baseline: session bootstrap compiles too
      for (name <- names) {
        try { SparkEntry.queries(name)(spark, warmDir).count(); () }
        catch { case _: Throwable => () }
        Caches.clearAll(spark)
      }
      println(f"[cold] warmup(sf0.001) ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f", jit ${jitBean.getTotalCompilationTime - j0} ms" +
        f", codegen_compiles ${codegenCompiles() - g0}")
    }
    for (name <- names; p <- 0 until passes) {
      val j0 = jitBean.getTotalCompilationTime
      val g0 = codegenCompiles()
      val cpu0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - cpu0) / 1e9
      Caches.clearAll(spark)
      println(f"[cold] $name pass$p wall $wall%.2f s, cpu $cpu%.1f s, " +
        f"jit ${jitBean.getTotalCompilationTime - j0} ms, " +
        f"codegen_compiles ${codegenCompiles() - g0}")
    }
    spark.stop()
  }
}
