package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Cols, Text}

/** Scale-safe exact ranking and deterministic corpus ordering.
  *
  * The naive form of "shuffle a corpus deterministically" is
  * `row_number() OVER (PARTITION BY source ORDER BY hash(id))` — which
  * plans every source's rows into ONE window partition: a handful of
  * sources over a huge corpus means a handful of tasks each sorting its
  * whole source (and the global training order — no PARTITION BY at all —
  * is a single task). Rank is the one common operator where the
  * declarative plan does NOT decompose by itself, so this file does the
  * distributed-sort-rank decomposition explicitly:
  *
  *   1. bucket each row by the HIGH bits of its own order key, so buckets
  *      are order-aligned (every key in bucket b sorts before every key
  *      in bucket b+1 within its group);
  *   2. rank inside (group, bucket) — the only window, max partition =
  *      group size / nBuckets;
  *   3. add back cross-bucket offsets from a tiny (group, bucket) count
  *      aggregate, prefix-summed and broadcast-joined onto the data.
  *
  * Same order, same tiebreak, same result as the naive window — pinned by
  * RanksSpec property tests — but partition size is a knob (`nBuckets`)
  * instead of a function of the group cardinality.
  *
  * [[interleave]] builds on it: the weighted source-mixing order every
  * pretraining data loader needs ("each prefix of the corpus holds the
  * source mix") with the GLOBAL position computed in closed form from the
  * per-source counts — no global window, no single-partition exchange
  * anywhere in the job.
  */
object Ranks {

  private val HashRange = 4294967296L // baseHash32 values live in [0, 2^32)

  /** Deterministic per-group shuffle rank (1-based): rows of each `group`
    * ranked by the salted portable hash of `id` (ties by `id` — total
    * order for unique ids). Equivalent to
    * `row_number() OVER (PARTITION BY group ORDER BY hash, id)` with the
    * partition-size problem removed as described above. `groups` may be
    * empty: a global deterministic shuffle (the naive twin would be a
    * SINGLE task sorting the corpus).
    */
  def shuffleRank(df: DataFrame, groups: Seq[String], id: String,
                  salt: String, nBuckets: Int = 64,
                  out: String = "rn"): DataFrame = {
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two >= 2, got $nBuckets")
    val k = Cols.freeName(df, "__key")
    val b = Cols.freeName(df, "__bucket")
    val withK = df
      .withColumn(k, Text.baseHash32(concat(lit(s"$salt:"), col(id))))
      .withColumn(b, expr(s"`$k` div ${HashRange / nBuckets}L"))
    // cross-bucket offsets: |groups|*nBuckets rows — tiny by construction,
    // the window over it runs on the aggregate, never on the data
    val cnt = Cols.freeName(df, "__cnt")
    val off = Cols.freeName(df, "__off")
    val offsets = withK.groupBy((groups :+ b).map(col): _*)
      .agg(count(lit(1)).as(cnt))
      .withColumn(off,
        coalesce(sum(col(cnt)).over(
          Window.partitionBy(groups.map(col): _*).orderBy(col(b).asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop(cnt)
    val inBucket = Window.partitionBy((groups :+ b).map(col): _*)
      .orderBy(col(k).asc, col(id).asc)
    withK
      .join(broadcast(offsets), (groups :+ b), "inner")
      .withColumn(out, col(off) + row_number().over(inBucket))
      .drop(k, b, off)
  }

  /** Deterministic weighted interleave — the curriculum order of a
    * source-mixed training corpus. Each source is shuffled by
    * [[shuffleRank]], its rows laid on an integer key ladder with stride
    * `lcm(weights)/weight` (heavier source = denser ladder), and the
    * global order is (key asc, source asc): every prefix of the order
    * holds the weight mix to within one row per source, with zero
    * randomness beyond the salt.
    *
    * The global POSITION is where naive implementations re-introduce the
    * single task (`row_number()` over everything). Here it is computed in
    * closed form: ladder keys within a source are strictly increasing, so
    * a row's position is
    *
    *   pos = rn + Σ_{g sorting before its source on ties} min(N_g, key div s_g + 1)
    *            + Σ_{g sorting after}                     min(N_g, (key + s_g − 1) div s_g)
    *
    * — per-source counts broadcast as ONE collected struct array, the sum
    * a codegen'd `aggregate` over it, entirely row-local. Exact integers
    * end to end; RanksSpec pins equality with the naive global window.
    *
    * A source missing from `weights` fails loudly at runtime
    * (`raise_error`), not silently: an unweighted source would otherwise
    * vanish from the mix bookkeeping while still occupying positions.
    */
  def interleave(df: DataFrame, group: String, id: String, salt: String,
                 weights: Map[String, Int], nBuckets: Int = 64,
                 pos: String = "pos"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0),
      s"weights must be positive, got $weights")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val L = weights.values.foldLeft(1L)((acc, w) => acc / gcd(acc, w) * w)
    val strideOf: Column = weights.toSeq.sortBy(_._1)
      .foldRight(raise_error(concat(lit("no weight for source: "),
        col(group))).cast("long")) { case ((g, w), otherwise) =>
        when(col(group) === g, lit(L / w)).otherwise(otherwise)
      }
    val rn = Cols.freeName(df, "__rn")
    val s = Cols.freeName(df, "__stride")
    val k = Cols.freeName(df, "__lkey")
    val ranked = shuffleRank(df, Seq(group), id, salt, nBuckets, rn)
      .withColumn(s, strideOf)
      .withColumn(k, (col(rn) - 1) * col(s))
    // per-source ladder stats: one row per source, folded into a single
    // broadcast array — the closed-form sum never shuffles the data
    val stats = Cols.freeName(df, "__stats")
    val statsRow = ranked.groupBy(col(group).as("g"))
      .agg(count(lit(1)).as("n"), first(col(s)).as("s"))
      .agg(collect_list(struct(col("g"), col("n"), col("s"))).as(stats))
    // SQL-lambda form because the Column DSL has no integer division —
    // `/` promotes longs to double, and the whole point is exact ranks
    ranked.crossJoin(broadcast(statsRow))
      .withColumn(pos, expr(
        s"""`$rn` + aggregate(`$stats`, 0L, (acc, x) -> acc +
           |  CASE WHEN x.g < `$group`
           |         THEN least(x.n, (`$k` div x.s) + 1L)
           |       WHEN x.g > `$group`
           |         THEN least(x.n, (`$k` + x.s - 1L) div x.s)
           |       ELSE 0L END)""".stripMargin))
      .drop(rn, s, k, stats)
  }
}
