package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration for the engine.
  *
  * Design notes (scale-first):
  *  - `spark.sql.shuffle.partitions` defaults to the local core count here;
  *    on a real cluster this is AQE-advised (`spark.sql.adaptive.enabled`)
  *    so the post-shuffle partition count tracks data volume, not a constant.
  *  - `nanosAsLong`: the driver test data stores `events.ts` as parquet
  *    TIMESTAMP(NANOS) which Spark cannot represent natively; we read it as
  *    a long (ns since epoch) and convert explicitly (see
  *    [[graft.sources.Tables.eventsWithUs]]).
  *  - session time zone is pinned to UTC: the reference operates on unix
  *    seconds and UTC calendar days (reference `src/blockchain_queries.py:334`).
  */
object GraftSession {

  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // parallelismFirst stays at its DEFAULT (true) — measured, not
      // assumed (r17 aqesize A/B, SCALE.md): flipping it false with an
      // 8 MB advisory was a wash-to-loss (+2.6% over a 20-query subset;
      // q157/q168/q155/q57 +18–22%, one −20% win). The r16 leak's
      // small-query speedups came from PLANNED 1-partition shuffles (and
      // AQE off), not from runtime coalescing — runtime merge keeps the
      // planning/scheduling overhead and the smaller advisory starves
      // mid-size shuffles. Loop-shaped queries get planned sizing via
      // Cols.withLoopConf instead.
      // The generated-class cache defaults to 100 entries; a resident
      // engine serving this registry's 130+ query shapes (several with
      // large codegen'd expression trees — minhash signatures, banding,
      // the q113 lead-chain) evicts and re-Janino-compiles hot plans on
      // every execution. 1000 was enough through ~119 shapes; the r12
      // registry crossed it and the bench showed the signature — a
      // broad +30% drift with the biggest-codegen queries hit hardest
      // (q113 0.7 → 7.3 s, all three min-of-3 runs paying a fresh
      // Janino pass). 10000 keeps every span resident; bytecode cost is
      // a few MB.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and benches. */
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
