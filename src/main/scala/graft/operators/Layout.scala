package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout — the I/O-side 100 TB lever the rest of
  * the engine's operators don't touch: once rows are WRITTEN in Z-order
  * (Morton order), any 2-D range predicate maps to a few contiguous
  * curve ranges, so partition pruning + parquet min/max skipping read a
  * tiny fraction of the files instead of scanning everything (the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` idea, as plain column arithmetic).
  * Everything here is pure long bit-twiddling — codegen'd, portable SQL
  * (the DuckDB twin computes identical longs), zero shuffle until the
  * caller asks for the clustered write itself.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (Morton spread):
    * bit i → bit 2i. The classic mask cascade, in long arithmetic.
    */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton/Z value of a 2-D grid point (each coordinate uses its low 16
    * bits): x occupies even bits, y odd bits. Nearby (x, y) share long z
    * prefixes — the locality that makes range predicates contiguous.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Which of `buckets` contiguous z-ranges the value falls in — the
    * file/partition id a clustered write assigns. `zBits` = total z bits
    * (2× the per-coordinate bits); `buckets` must be a power of two so
    * the division is a pure shift (and each bucket is an axis-aligned
    * rectangle of the grid — the property the locality test pins).
    */
  def zBucket(z: Column, zBits: Int, buckets: Int): Column = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val shift = zBits - java.lang.Integer.numberOfTrailingZeros(buckets)
    require(shift >= 0, s"more buckets ($buckets) than z-space (2^$zBits)")
    shiftright(z, shift)
  }

  /** Cluster a frame for a Z-ordered write: range-partition on the z value
    * and sort within partitions, so every output file covers one tight
    * curve range (tight parquet min/max on BOTH original columns). The
    * write itself stays the caller's (`partitionBy`/plain parquet); this
    * is the `OPTIMIZE ZORDER BY` rewrite step.
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
                 numPartitions: Int): DataFrame = {
    val z = zValue(x, y).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
