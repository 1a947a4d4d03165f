package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop product — the second
  * member of the beyond-reference temporal-operator family (with
  * [[AsOf]]). Spark plans a bare `p.t >= i.lo AND p.t < i.hi` join as
  * BroadcastNestedLoopJoin (fine only while one side broadcasts) or a
  * cartesian product; this operator turns it into an EQUI-join on a
  * fixed-width time bin, which shuffles both sides by bin and compares only
  * within co-located bins — the standard bin-bucketing rewrite every
  * interval-join engine uses.
  *
  * Shape: each point lands in exactly ONE bin (`floor(t / w)`); each
  * interval explodes to every bin it overlaps (`ceil(len / w) + 1` rows at
  * most). A (point, interval) pair can therefore meet only in the point's
  * single bin — each match is produced exactly once, no post-join
  * `distinct` needed. Cost is Σ_bin |P_bin|·|I_bin| candidate comparisons;
  * pick `binWidth` near the typical interval length so intervals replicate
  * ~2× while bins stay selective. Hot bins (a burst of points or pile of
  * intervals in one window) are ordinary join skew — AQE skew-split
  * applies, and [[Skew.saltedJoin]] remains the explicit tool past that.
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing them:
    * `lo <= t < hi` (half-open, the retention/window convention used
    * throughout the engine). Column names must not collide across the two
    * frames (alias first; the bin column is temporary and dropped).
    *
    * @param binWidth bin size in the time unit of `t`/`lo`/`hi`; must be > 0
    */
  def pointInInterval(points: DataFrame, t: String,
                      intervals: DataFrame, lo: String, hi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: ${overlap.mkString(", ")}")
    val bin = "__bin"
    val p = points.withColumn(bin, floor(col(t) / binWidth))
    // Empty intervals (hi <= lo) produce a descending sequence bound —
    // guard them out; they can match nothing under the half-open contract.
    val i = intervals.filter(col(hi) > col(lo)).withColumn(bin,
      explode(sequence(floor(col(lo) / binWidth), floor((col(hi) - 1) / binWidth))))
    p.join(i, bin)
      .filter(col(t) >= col(lo) && col(t) < col(hi))
      .drop(bin)
  }

  /** Interval×interval overlap join under the half-open contract:
    * `[aLo, aHi)` overlaps `[bLo, bHi)` iff `aLo < bHi && bLo < aHi`.
    * Both sides explode to their covered bins and equi-join on the bin;
    * an overlapping pair meets in EVERY shared bin, so the match is
    * emitted only in the overlap's first bin (`floor(max(lo) / w)`) —
    * exactly-once without a distinct. Column names must not collide.
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: ${overlap.mkString(", ")}")
    val bin = "__bin"
    def binned(df: DataFrame, lo: String, hi: String) =
      df.filter(col(hi) > col(lo)).withColumn(bin,
        explode(sequence(floor(col(lo) / binWidth), floor((col(hi) - 1) / binWidth))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), bin)
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
        col(bin) === floor(greatest(col(aLo), col(bLo)) / binWidth))
      .drop(bin)
  }
}
