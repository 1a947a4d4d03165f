package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (Seidman, Social Networks 1983): the maximal
  * subgraph in which every node has degree ≥ k, computed by the standard
  * peel — repeatedly drop nodes whose current degree is below k until a
  * fixpoint. The graph-quality gate a link-graph curation pipeline runs
  * before trusting degree-derived signals (a spam farm's long tails and
  * pendant chains peel away; the dense core survives), and the natural
  * companion to the CC/PageRank/betweenness family
  * ([[graft.operators.Components]], [[GraphMetrics]] — the reference
  * stops at those three, `src/arango_queries.py:152-178`; k-core is a
  * beyond-reference member of the same G-family).
  *
  * Semantics pinned for the oracle twin: the graph is UNDIRECTED
  * (symmetrize + distinct), self-loops dropped before any degree count,
  * isolated nodes never in a k ≥ 1 core (the edge-set representation
  * loses them by construction — both engines). The DuckDB twin unrolls
  * `maxRounds` peel rounds as chained CTEs; rounds past the fixpoint are
  * no-ops, so the loud convergence `require` here IS the cross-engine
  * contract: converge within the bound or fail, never return a
  * half-peeled set.
  *
  * Scale shape: each round is one degree aggregate plus two semi-join
  * restrictions of the edge set — all keyed equi-joins on the node id,
  * nothing driver-side, and the edge frame only SHRINKS. Lineage is
  * truncated per round (eager localCheckpoint, the iterative-family
  * convention) and AQE is scoped off inside the loop (the r15 prab/bwab
  * finding: hand-sized per-round shuffles make adaptive re-planning pure
  * driver overhead). Peel rounds are data-bounded (worst case the
  * longest chain, in practice single digits); each costs O(|E| current).
  */
object KCore {

  /** Nodes of the k-core with their within-core degree: `(node, core_deg)`.
    * Empty when the whole graph peels away.
    */
  def kCore(edges: DataFrame, src: String, dst: String, k: Int,
            maxRounds: Int = 24): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = edges.sparkSession
    val half = edges.select(col(src).as("a"), col(dst).as("b"))
      .filter(col("a") =!= col("b"))
    // init distinct + sizing count run at the session conf (only the peel
    // rounds shrink with the monotonically shrinking core); parts joined
    // the AQE-off treatment in r16 (the walkaqe pair — off-alone froze
    // 32-partition checkpoints of few-thousand-row edge frames: −68% at
    // sf0.1), sized to the symmetrized edge frame per the q147 rule
    // (Cols.loopParts). The scope itself is Cols.withLoopConf — re-entrant
    // first-in-save/last-out-restore, safe under concurrent callers.
    var cur = half
      .unionByName(half.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    graft.functions.Cols.withLoopConf(spark,
      graft.functions.Cols.loopParts(edges, cur.count())) {
      var n = cur.select(col("a")).distinct().count()
      var rounds = 0
      var converged = false
      while (!converged && rounds < maxRounds) {
        val keep = cur.groupBy(col("a")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("a"))
        val next = cur.join(keep, Seq("a"))
          .join(keep.select(col("a").as("b")), Seq("b"))
          .select(col("a"), col("b"))
          .localCheckpoint(true)
        val m = next.select(col("a")).distinct().count()
        // node set unchanged ⇒ the degree filter removed nobody ⇒ every
        // remaining degree is ≥ k — the fixpoint, by definition.
        if (m == n) converged = true
        else { cur = next; n = m }
        rounds += 1
      }
      // n == 0 is a converged (empty) core even if the peel used the
      // last allowed round to reach it.
      require(converged || n == 0,
        s"k-core did not converge within $maxRounds rounds " +
          s"(the oracle unrolls exactly that many; raise maxRounds)")
      cur.groupBy(col("a").as("node")).agg(count(lit(1)).as("core_deg"))
    }
  }
}
