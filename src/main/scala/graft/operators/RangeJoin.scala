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
  * Shape: each point lands in exactly ONE bin; each interval explodes to
  * every bin it overlaps (`ceil(len / w) + 1` rows at most). A
  * (point, interval) pair can therefore meet only in the point's single
  * bin — each match is produced exactly once, no post-join `distinct`
  * needed. Cost is Σ_bin |P_bin|·|I_bin| candidate comparisons; pick
  * `binWidth` near the typical interval length so intervals replicate ~2×
  * while bins stay selective. Hot bins (a burst of points or pile of
  * intervals in one window) are ordinary join skew — AQE skew-split
  * applies, and [[Skew.saltedJoin]] remains the explicit tool past that.
  *
  * Binning is PURE LONG arithmetic (`pmod` + `div`, floor semantics for
  * negative times too) — `floor(t / w)` would route through double
  * division, which loses integer precision past 2^53; a nanosecond epoch
  * timestamp (~2^60) binned as a double can land one bin off while the
  * exact long range filter still passes, silently dropping the match.
  */
object RangeJoin {

  /** Floor-division bin as a SQL expression over a column name; exact for
    * the full long range (`pmod` ≥ 0 makes truncating `div` a floor).
    */
  private def binOf(name: String, w: Long): String =
    s"((`$name` - pmod(`$name`, ${w}L)) div ${w}L)"

  /** All bins covered by the half-open interval [`lo`, `hi`). */
  private def binsOf(lo: String, hi: String, w: Long): String = {
    val last = s"((`$hi` - 1 - pmod(`$hi` - 1, ${w}L)) div ${w}L)"
    s"sequence(${binOf(lo, w)}, $last)"
  }

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
    val taken = points.columns.toSet ++ intervals.columns
    val bin = Iterator.from(0).map(i => s"__bin$i").find(!taken.contains(_)).get
    val p = points.withColumn(bin, expr(binOf(t, binWidth)))
    // Empty intervals (hi <= lo) produce a descending sequence bound —
    // guard them out; they can match nothing under the half-open contract.
    val i = intervals.filter(col(hi) > col(lo))
      .withColumn(bin, explode(expr(binsOf(lo, hi, binWidth))))
    p.join(i, bin)
      .filter(col(t) >= col(lo) && col(t) < col(hi))
      .drop(bin)
  }

  /** Interval×interval overlap join under the half-open contract:
    * `[aLo, aHi)` overlaps `[bLo, bHi)` iff `aLo < bHi && bLo < aHi`.
    * Both sides explode to their covered bins and equi-join on the bin;
    * an overlapping pair meets in EVERY shared bin, so the match is
    * emitted only in the overlap's first bin (the bin of `max(lo)`) —
    * exactly-once without a distinct. Column names must not collide.
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: ${overlap.mkString(", ")}")
    val taken = a.columns.toSet ++ b.columns
    val bin = Iterator.from(0).map(i => s"__bin$i").find(!taken.contains(_)).get
    def binned(df: DataFrame, lo: String, hi: String) =
      df.filter(col(hi) > col(lo))
        .withColumn(bin, explode(expr(binsOf(lo, hi, binWidth))))
    val w = binWidth
    val firstOverlapBin = expr(
      s"((greatest(`$aLo`, `$bLo`) - pmod(greatest(`$aLo`, `$bLo`), ${w}L)) div ${w}L)")
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), bin)
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
        col(bin) === firstOverlapBin)
      .drop(bin)
  }
}
