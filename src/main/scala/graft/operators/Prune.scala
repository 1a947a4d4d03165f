package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Semi-join reduction — the 100 TB pre-prune: before shuffling a huge
  * fact side into an equi-join whose other side is selective, reduce the
  * fact SCAN-SIDE with a broadcast Bloom filter built from the selective
  * side's keys. The filter is a superset gate (false positives pass, false
  * negatives cannot exist), so composing it UNDER the exact join leaves
  * the join result bit-identical while the shuffle carries only the
  * ~matching fraction of the big side. This is Spark's own AQE
  * runtime-filter pattern made explicit and tunable — declared in the
  * plan, it survives where the injected variant bails (non-equi
  * downstream shapes, reused subtrees, or a build side Spark's heuristics
  * do not pick).
  */
object Prune {

  /** Rows of `big` whose `bigKey` MIGHT be in `keys.keyCol` (exact
    * superset of the semi-join; false-positive rate set by
    * `numBits / expectedItems` — ~10 bits/key ≈ 1%). The Bloom binary is
    * one `numBits/8`-byte blob broadcast to every task (1 MB at 8M bits),
    * and the gate is a scan-side filter: it runs BEFORE any exchange, so
    * downstream shuffle bytes shrink by the true selectivity. Keys hash
    * through `xxhash64` on both sides — the engine's own Bloom contract
    * (`bloom_filter_agg` / `might_contain`, the expressions behind
    * Spark's injected runtime filters). The Bloom bit-pattern is
    * implementation-private, which is fine: correctness never depends on
    * it — only the post-join result is contract, and that is unchanged.
    */
  def bloomSemi(big: DataFrame, bigKey: Column, keys: DataFrame,
                keyCol: Column, expectedItems: Long, numBits: Long): DataFrame = {
    require(expectedItems > 0 && numBits > 0,
      s"need positive sizing, got items=$expectedItems bits=$numBits")
    // xxhash64 is TYPE-sensitive (int 42 and bigint 42 hash differently)
    // while the exact equi-join downstream would happily cast-and-match —
    // a type mismatch here would silently drop true matches and break the
    // superset contract. Fail loudly instead.
    val bigType = big.select(bigKey).schema.head.dataType
    val keyType = keys.select(keyCol).schema.head.dataType
    require(bigType == keyType,
      s"bloomSemi key types must match exactly (xxhash64 is type-sensitive): " +
        s"big side ${bigType.simpleString} vs keys ${keyType.simpleString} — " +
        s"cast one side explicitly")
    val gateCol = Cols.freeName(big, "__gate_k")
    // `might_contain` requires its Bloom argument to be a constant or a
    // SCALAR SUBQUERY (the analyzer rejects a join-produced attribute), so
    // the build side rides in as a real subquery expression — exactly how
    // Spark's InjectRuntimeFilter wires its own bloom: the subquery
    // executes once, and its result broadcasts to every task as a literal.
    val bloomPlan = keys.select(keyCol.as("__k"))
      .agg(expr(s"bloom_filter_agg(xxhash64(__k), ${expectedItems}L, ${numBits}L)"))
    val bloomScalar = org.apache.spark.sql.graftbridge.Internal
      .scalarSubquery(bloomPlan.queryExecution.analyzed)
    big.withColumn(gateCol, bigKey)
      .filter(call_function("might_contain", bloomScalar,
        xxhash64(col(gateCol))))
      .drop(gateCol)
  }
}
