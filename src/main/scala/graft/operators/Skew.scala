package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins (SURVEY.md §2.8 / the 100 TB brief).
  *
  * AQE's skew-join splitting handles moderate skew transparently; salting
  * is the explicit tool for the pathological case — a single join key
  * carrying a significant fraction of the fact side (the witness graph's
  * mega-city, a dup cluster's shingle) where one post-shuffle partition
  * would otherwise hold the whole key.
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against a replicable `small`
    * side: each big row lands in one of `salt` sub-keys (deterministically,
    * from a hash of the whole row — no RNG state), the small side is
    * replicated across all `salt` sub-keys, and the join runs on
    * (keys, sub-key). Every hot key's partition shrinks by ~`salt`×; the
    * price is `salt`× replication of the small side, so this is for
    * big⨝medium shapes where the small side is too large to broadcast but
    * cheap to replicate a few times. Results are exactly the plain join's.
    *
    * Join types that preserve unmatched SMALL-side rows (right/full outer,
    * and semi/anti against the small side) are rejected: the small side is
    * replicated `salt`× before the join, so an unmatched small row would be
    * emitted `salt` times — there is no way to salt those shapes exactly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left join types only (got '$joinType'): " +
        "right/full outer would duplicate unmatched small-side rows salt times")
    val saltCol = Iterator.from(0).map(i => s"__salt$i")
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    val b = big.withColumn(saltCol,
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salt.toLong)).cast("int"))
    val s = small.withColumn(saltCol,
      explode(array((0 until salt).map(lit): _*)))
    b.join(s, keys :+ saltCol, joinType).drop(saltCol)
  }
}
