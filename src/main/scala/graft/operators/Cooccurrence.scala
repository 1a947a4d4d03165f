package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite one-mode projection and triangle statistics — the two
  * graph-shape operators between an entity-affiliation edge list and the
  * metrics family: project the bipartite graph onto one side (who shares
  * neighbors with whom), then read the projection's local structure
  * (triangles, clustering). The reference's witness graph is itself
  * bipartite (customer↔supplier, `src/arango_queries.py:145-163` shape),
  * so its one-mode projection is where triangle structure first EXISTS —
  * an odd cycle can't live in the bipartite original.
  *
  * Both operators are exact, integer-only, and built from keyed
  * equi-joins with per-group expansion bounded by an explicit contract
  * (the hub cap, the degree orientation) — never an unbounded
  * neighborhood enumeration.
  */
object Cooccurrence {

  /** Shared-neighbor projection of a bipartite edge list `(left, right)`
    * onto the `right` side: `(a, b, n_shared)` with `a < b`, n_shared =
    * common left-neighbors. The hub cap is SEMANTICS, not truncation:
    * left nodes with degree > `maxLeftDeg` are excluded up front — a hub
    * connects everything to everything and contributes deg² near-noise
    * pairs (the standard drop-hubs rule in co-occurrence analysis), and
    * at scale it is also the one thing that breaks the join bound. With
    * the cap, per-left expansion is ≤ maxLeftDeg², so projection cost is
    * |kept edges|·maxLeftDeg in the worst case — a constant-factor
    * equi-join, partial-aggregated on the pair key before the exchange.
    */
  def project(edges: DataFrame, left: String, right: String,
              maxLeftDeg: Long): DataFrame =
    pairsOf(keptEdges(edges, left, right, maxLeftDeg))

  /** The hub-capped distinct edge set `(l, r)` shared by [[project]] and
    * [[jaccardProject]].
    */
  private def keptEdges(edges: DataFrame, left: String, right: String,
                        maxLeftDeg: Long): DataFrame = {
    require(maxLeftDeg >= 2, s"maxLeftDeg must be >= 2, got $maxLeftDeg")
    val e = edges.select(col(left).as("l"), col(right).as("r")).distinct()
    val keep = e.groupBy(col("l")).agg(count(lit(1)).as("ld"))
      .filter(col("ld") <= maxLeftDeg).select(col("l"))
    e.join(keep, Seq("l"))
  }

  private def pairsOf(ek: DataFrame): DataFrame =
    ek.select(col("l"), col("r").as("a"))
      .join(ek.select(col("l"), col("r").as("b")), Seq("l"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))

  /** [[project]] with the shared-neighbor count normalized to a
    * similarity: `jacc_pm = (1e6 · n_shared) div (da + db − n_shared)`,
    * the exact-integer Jaccard of the two right-nodes' left-neighbor
    * SETS within the kept (hub-capped) edge universe — degrees are
    * counted over the SAME kept edges the pair counts come from, so the
    * ratio is internally consistent (a hub-excluded neighbor appears in
    * neither numerator nor denominator). Output
    * `(a, b, n_shared, jacc_pm)`, pairs `a < b` as in [[project]].
    * Cost over [[project]]: one extra degree aggregate on the kept
    * edges plus two broadcast-or-shuffle equi-joins on single node
    * keys — no new expansion anywhere.
    */
  def jaccardProject(edges: DataFrame, left: String, right: String,
                     maxLeftDeg: Long): DataFrame = {
    val ek = keptEdges(edges, left, right, maxLeftDeg)
    val deg = ek.groupBy(col("r").as("n")).agg(count(lit(1)).as("d"))
    pairsOf(ek)
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("n_shared"),
        expr("(1000000 * n_shared) div (da + db - n_shared)").as("jacc_pm"))
  }

  /** Incremental projection: fold one batch of bipartite edges into a
    * standing pair-count registry — `n_shared` is additive over disjoint
    * left-entities, so the fold is `registry ∪ project(batch)` merged by
    * pair-key sum, and folding batches is bit-identical to a from-scratch
    * rebuild (the q120/q162 incremental convention; the q174 oracle IS
    * the full-projection SQL).
    *
    * CONTRACT — left-entity-complete batches: all of a left node's edges
    * arrive in ONE batch. Both the pair counts and the hub cap are
    * per-left-entity, so splitting an entity across batches silently
    * changes semantics (its within-batch degree undercounts against the
    * cap, and cross-batch neighbor pairs are never formed) — the spec
    * pins the violation visibly rather than pretending the fold repairs
    * it. This is the ingestion shape an ETL follower naturally produces
    * (an entity's edges land when the entity is processed).
    *
    * Scale shape: per-batch cost is the batch's own capped projection
    * plus a pair-keyed merge; with the registry stored pair-bucketed
    * (the bucketreg layout) the merge shuffles only the batch side.
    */
  def projectFold(registry: DataFrame, batch: DataFrame, left: String,
                  right: String, maxLeftDeg: Long): DataFrame =
    countsFold(registry, project(batch, left, right, maxLeftDeg),
      Seq("a", "b"), "n_shared")

  /** Common-neighbor link prediction with exact-integer resource-
    * allocation weighting (Zhou, Lü & Zhang, Eur. Phys. J. B 2009 — RA
    * outperforms Adamic–Adar with the same candidate set, and unlike
    * AA's `1/ln(deg)` its `1/deg` weight survives the integer-portable
    * treatment: `ra_pm = Σ_mid (1e6 div deg(mid))`). Candidates are the
    * distance-2 pairs: the one-mode projection of the symmetrized
    * adjacency onto itself, with the mid-node cap playing the same dual
    * role as [[project]]'s hub cap — it bounds per-mid pair expansion at
    * cap² AND drops the mids whose per-neighbor contribution
    * (1e6 div deg → 0) is noise by the score's own definition. Already-
    * adjacent pairs leave via one anti-join against the canonical edge
    * set. Output `(a, b, cn, ra_pm)` with `a < b`: common-neighbor
    * count and the RA score.
    */
  def linkPrediction(edges: DataFrame, src: String, dst: String,
                     maxMidDeg: Long): DataFrame = {
    require(maxMidDeg >= 2, s"maxMidDeg must be >= 2, got $maxMidDeg")
    val half = edges.select(col(src).as("u"), col(dst).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    val sym = half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
    val dg = sym.groupBy(col("u").as("mid")).agg(count(lit(1)).as("deg"))
    val ek = sym.select(col("u").as("mid"), col("v").as("n"))
      .join(dg.filter(col("deg") <= maxMidDeg), Seq("mid"))
    ek.select(col("mid"), col("n").as("a"), col("deg"))
      .join(ek.select(col("mid"), col("n").as("b")), Seq("mid"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div deg")).as("ra_pm"))
      .join(half.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
  }

  /** Windowed term co-occurrence counts — the embedding-prep /
    * collocation-mining primitive (the count table behind GloVe, SGNS
    * negative-sampling tables, and PMI collocation lists): for every
    * token position i, one pair per position j in (i, i+window],
    * canonicalized `(least, greatest)`, self-pairs dropped. The window
    * is the scale contract: pair volume is ≤ n_tokens · window, row-local
    * (array transforms inside whole-stage codegen — NO positional
    * self-join), so the only shuffle is the final pair-key count with
    * map-side partials. Windows never cross documents STRUCTURALLY: pairs
    * are generated inside each row's own token array, so no document-id
    * column is needed (or taken — an earlier signature accepted one and
    * ignored it). Returns `(a, b, c_ab)` over ALL windows in the corpus
    * (occurrence counts, not document counts).
    */
  def termPairCounts(docs: DataFrame, text: String,
                     window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = docs.select(graft.functions.Text.tokens(col(text)).as("t"))
    toks.select(explode(flatten(transform(
        sequence(lit(1), size(col("t"))),
        i => when(i < size(col("t")),
            transform(sequence(i + 1, least(i + lit(window), size(col("t")))),
              j => struct(
                least(element_at(col("t"), i.cast("int")),
                  element_at(col("t"), j.cast("int"))).as("a"),
                greatest(element_at(col("t"), i.cast("int")),
                  element_at(col("t"), j.cast("int"))).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
      ))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
  }

  /** Corpus token-occurrence counts `(w, c_w)` — the unigram margin for
    * [[associationScores]]. One keyed count over the exploded token
    * stream.
    */
  def termOccurrences(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(graft.functions.Text.tokens(col(text))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))

  /** PMI-lift scoring of a co-occurrence table against its unigram
    * margins: `lift_micro = (1e6 · c_ab · n_tok) div (c_a · c_b)` — the
    * scaled observed/expected ratio `p(a,b)/(p(a)·p(b))` whose log is
    * PMI. Integer division keeps it hash-portable across engines (the
    * idf_micro rule: `ln` rounds differently per libm) and monotone with
    * PMI, so thresholds and rankings compose exactly. `minPairCount` is
    * the standard low-count PMI-noise gate (rare pairs otherwise
    * dominate any PMI-family score).
    *
    * The margins join is two equi-joins on single-term keys (broadcast
    * when the vocabulary is small, shuffle otherwise — Catalyst's call);
    * `n_tok` is a 1-row aggregate broadcast via crossJoin, never
    * driver-collected. Overflow bound: `1e6 · c_ab · n_tok < 2^63`
    * requires c_ab · n_tok < 9.2e12 — beyond that (a trillion-token
    * corpus with hot pairs), compute per-shard counts and fold, or widen
    * to DECIMAL(38,0) at the caller.
    *
    * Both inputs are additive over disjoint DOCUMENT sets (windows never
    * cross documents), so per-batch counts fold by key-sum into standing
    * registries and scoring the folded registries is bit-identical to a
    * from-scratch rebuild — ANY doc-partition works; no entity-
    * completeness caveat (contrast [[projectFold]]'s left-entity
    * contract). [[countsFold]] is that fold.
    */
  def associationScores(pairCounts: DataFrame, termCounts: DataFrame,
                        minPairCount: Long): DataFrame = {
    val nTok = termCounts.agg(sum(col("c_w")).as("n_tok"))
    pairCounts.filter(col("c_ab") >= minPairCount)
      .join(termCounts.select(col("w").as("a"), col("c_w").as("ca")), Seq("a"))
      .join(termCounts.select(col("w").as("b"), col("c_w").as("cb")), Seq("b"))
      .crossJoin(broadcast(nTok))
      .select(col("a"), col("b"), col("c_ab"),
        expr("(1000000 * c_ab * n_tok) div (ca * cb)").as("lift_micro"))
  }

  /** Fold one batch's keyed counts into a standing count registry:
    * key-sum merge, exact for any additive count table (pair counts on
    * `(a, b)`, unigram counts on `(w)`). With the registry pair-bucketed
    * (the bucketreg layout) the merge shuffles only the batch side.
    */
  def countsFold(registry: DataFrame, batch: DataFrame,
                 keys: Seq[String], cnt: String): DataFrame =
    registry.unionByName(batch)
      .groupBy(keys.map(col): _*).agg(sum(col(cnt)).as(cnt))

  /** Per-node triangle counts and local clustering coefficient over an
    * undirected graph, by degree-ordered orientation (compact-forward:
    * Schank & Wagner, WEA 2005; the MapReduce form Suri & Vassilvitskii,
    * WWW 2011): orient every edge toward the higher `(deg, id)` endpoint
    * — out-degree is then O(√m) on ANY graph — enumerate wedges as pairs
    * of out-edges at the triangle's lowest vertex, and close them with
    * one more oriented-edge equi-join. Every triangle is counted exactly
    * once, and no node ever expands an unbounded neighborhood: the
    * worst-case wedge count is m^{3/2}, the information-theoretic floor
    * for exact triangle listing.
    *
    * Input is symmetrized + deduped (self-loops dropped). Output one row
    * per node of the graph: `(node, deg, tri, lcc_pm)` with
    * `lcc_pm = (2·tri·1e6) div (deg·(deg−1))`, 0 when deg < 2 — exact
    * integer arithmetic end to end.
    */
  def triangleStats(edges: DataFrame, src: String, dst: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val half = edges.select(col(src).as("u"), col(dst).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    // sym/deg/o are each read by 2-3 downstream subtrees of the ONE
    // final plan; uncached, every consumer recomputes the whole input
    // lineage (for q172 that is the full projection — measured 7.7 →
    // 4.1 s warm at sf0.1). Caller owns cache cleanup, the repo-wide
    // convention (TermStats scaladoc).
    val sym = half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
      .persist(MEMORY_AND_DISK)
    val deg = sym.groupBy(col("u").as("n")).agg(count(lit(1)).as("deg"))
      .persist(MEMORY_AND_DISK)
    val o = sym
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u").as("a"), col("v").as("b"), col("dv").as("db"))
      .persist(MEMORY_AND_DISK)
    val wedge = o.select(col("a"), col("b"), col("db"))
      .join(o.select(col("a"), col("b").as("c"), col("db").as("dc")),
        Seq("a"))
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
      .select(col("a"), col("b"), col("c"))
    val tri = wedge.join(
      o.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    val perNode = tri.select(col("a").as("n"))
      .unionByName(tri.select(col("b").as("n")))
      .unionByName(tri.select(col("c").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("n"), "left_outer")
      .select(col("n").as("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("lcc_pm", when(col("deg") < 2, lit(0L))
        .otherwise(expr("(2 * tri * 1000000) div (deg * (deg - 1))")))
  }
}
