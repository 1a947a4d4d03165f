package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Cols, Text}

/** Deterministic uniform random walks over an undirected graph — the
  * DeepWalk / node2vec corpus generator (Perozzi et al., KDD 2014): the
  * walk corpus IS the "text" that node-embedding training consumes, and
  * its skip-gram co-occurrence statistics (via
  * [[Cooccurrence.termPairCounts]]) are the exact count tables SGNS
  * factorizes. "Random" here is a portable hash — step t of walk w picks
  * neighbor index `hash32(seed, w:t) mod deg` — so the corpus is a pure
  * function of (graph, seed): reproducible across runs AND engines,
  * which makes a lossy-looking sampling operator hash-checkable (the
  * q46/q154/q173 determinism convention).
  *
  * Scale shape: each step is two equi-joins — walk state against the
  * (node, deg) table to compute the neighbor index, then against the
  * indexed adjacency on `(node, idx)` to move. One walk picks ONE
  * neighbor per step, so per-step cost is |walks| join rows regardless
  * of degree skew (a hub's full adjacency is never expanded into the
  * walk frame — the (n, idx) key lands on exactly one row). State is
  * eagerly localCheckpoint'ed per step: lineage stays one step deep and
  * the final union reads materialized step frames. Walk count = |V| ·
  * walksPerNode scales with the cluster; on a real deployment the
  * adjacency is a bucketed catalog table on `n` and every step's second
  * join co-locates.
  */
object Walks {

  /** Walk corpus in long form: `(walk, step, node)`, step 0..length,
    * walk id = `<start>#<replica>`. Walks start from every node with at
    * least one edge (the symmetrized, deduped, self-loop-free graph —
    * the [[Cooccurrence.triangleStats]] normalization), so no walk ever
    * hits a dead end. Neighbor order for indexing is the node-id sort —
    * deterministic, and identical in any engine with binary string
    * collation.
    */
  def randomWalks(edges: DataFrame, src: String, dst: String,
                  walksPerNode: Int, length: Int, seed: Int): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    require(length >= 1, s"length must be >= 1, got $length")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val half = edges.select(col(src).as("u"), col(dst).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val sym = half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    // adjacency with the deterministic per-node neighbor index; deg rides
    // along so the degree table is a cheap projection, not a second scan
    val byNode = Window.partitionBy(col("u"))
    val adj = sym.select(col("u").as("n"),
        (row_number().over(byNode.orderBy(col("v"))) - 1).as("idx"),
        col("v").as("nbr"),
        count(lit(1)).over(byNode).as("deg"))
      .persist(MEMORY_AND_DISK)
    val deg = adj.select(col("n"), col("deg")).distinct()
    // AQE off + data-sized parts for the step loop (the BPE-trainer
    // treatment, A/B'd at sf0.1 — walkaqe, SCALE.md): every step
    // materializes eagerly via localCheckpoint, the per-step joins are
    // walk-frame-sized, so adaptive re-planning per step is pure driver
    // overhead and session-default shuffle partitions are mostly empty
    // tasks. Measured: q178 5.9 → 3.1 s (−48%), q179 8.0 → 6.8 s
    // (−15%); AQE-off ALONE regressed q179 2× (32-partition checkpoints
    // poison the downstream pair counting — rejected, the bpeaqe lesson
    // repeating). Parts are sized to the adjacency ([[Cols.loopParts]],
    // the q147 rule — a hard-coded small constant would be right here
    // and wrong on a 1000-executor graph). Values oracle-pinned; the
    // conf cannot escape — every job this scope runs is driven to
    // completion inside it.
    val nAdj = adj.count() // materializes the persisted adjacency
    val spark = edges.sparkSession
    Cols.withLoopConf(spark, Cols.loopParts(edges, nAdj)) {
      var state = adj.select(col("n")).distinct()
        .select(explode(sequence(lit(0), lit(walksPerNode - 1))).as("k"), col("n"))
        .select(concat(col("n"), lit("#"), col("k")).as("walk"),
          col("n").as("node"))
        .localCheckpoint(true)
      val steps = Seq.newBuilder[DataFrame]
      steps += state.select(col("walk"), lit(0L).as("step"), col("node"))
      for (t <- 1 to length) {
        val idxed = state
          .join(deg, state("node") === deg("n"))
          .select(col("walk"),
            pmod(Text.hash32(concat(col("walk"), lit(s":$t")), seed), col("deg"))
              .as("idx"), col("node"))
        state = idxed
          .join(adj, idxed("node") === adj("n") && idxed("idx") === adj("idx"))
          .select(col("walk"), col("nbr").as("node"))
          .localCheckpoint(true)
        steps += state.select(col("walk"), lit(t.toLong).as("step"), col("node"))
      }
      adj.unpersist()
      steps.result().reduce(_ unionByName _)
    }
  }

  /** Weisfeiler–Lehman label refinement (Weisfeiler & Lehman 1968; the
    * WL-subtree kernel form of Shervashidze et al., JMLR 2011) — per-node
    * STRUCTURAL fingerprints: after k rounds, two nodes share a label iff
    * their depth-k neighborhood trees are isomorphic (one-sided: equal
    * labels ⇒ isomorphic views up to hash collision). The structural
    * analog of content fingerprints — graph dedup, role discovery, and
    * graph-kernel features all consume exactly this table.
    *
    * Round t: `l_t(v) = md5(l_{t-1}(v) | sorted multiset of neighbor
    * l_{t-1})`, seeded with the degree. The multiset is an ordered
    * string_agg — deterministic, engine-portable (binary collation) —
    * so the whole refinement is hash-checkable and the oracle replays
    * it as generated chained CTEs (the q170/q178 convention).
    *
    * Scale shape: each round is ONE keyed shuffle — neighbor labels
    * re-keyed by edge target, aggregated with a sorted list per node —
    * plus a join back to the standing label frame; per-node cost is its
    * degree (the sorted concat is the multiset encoding, there is no
    * way below it for exact WL), hub rows bounded by the same degree
    * the graph actually has. Labels localCheckpoint per round (lineage
    * depth 1, the iterative convention). Output `(node, wl)` after
    * `iterations` rounds, plus `deg` for the round-0 seed audit.
    */
  def wlLabels(edges: DataFrame, src: String, dst: String,
               iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val half = edges.select(col(src).as("u"), col(dst).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val sym = half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
      .distinct().persist(MEMORY_AND_DISK)
    // the randomWalks in-loop conf pair, A/B'd (walkaqe/wl, SCALE.md):
    // per-round frames are node/edge-sized, checkpoints freeze the
    // partitioning, adaptive re-planning per round is driver overhead;
    // parts sized to the symmetrized edge frame (the q147 rule)
    val nSym = sym.count() // materializes the persisted edge frame
    val spark = edges.sparkSession
    Cols.withLoopConf(spark, Cols.loopParts(edges, nSym)) {
      var lab = sym.groupBy(col("u").as("n"))
        .agg(count(lit(1)).as("deg"))
        .withColumn("wl", md5(concat(lit("d"), col("deg"))))
        .localCheckpoint(true)
      for (_ <- 1 to iterations) {
        val nbr = sym.select(col("u"), col("v").as("__v"))
          .join(lab.select(col("n").as("__v"), col("wl").as("wv")), Seq("__v"))
          .groupBy(col("u").as("n"))
          .agg(array_join(array_sort(collect_list(col("wv"))), ",").as("ms"))
        lab = lab.join(nbr, Seq("n"))
          .select(col("n"), col("deg"),
            md5(concat(col("wl"), lit("|"), col("ms"))).as("wl"))
          .localCheckpoint(true)
      }
      sym.unpersist()
      lab.select(col("n").as("node"), col("deg"), col("wl"))
    }
  }

  /** WL-subtree kernel between node groups (Shervashidze et al., JMLR
    * 2011): `K(a, b) = Σ_label c_a(label) · c_b(label)` over the groups'
    * WL-label count vectors — the graded form of [[wlLabels]]-fingerprint
    * equality (equal fingerprints ⇒ maximal kernel; partial structural
    * overlap shows up as partial mass). Exact integer arithmetic.
    *
    * The label-pair join is the [[Cooccurrence.project]] shape with
    * labels as the shared key: per-label expansion is (groups sharing
    * that label)², so `maxLabelDf` caps it — and like the projection hub
    * cap it is semantics too: a label present in more than `maxLabelDf`
    * groups is structurally UBIQUITOUS (a stopword of the structure
    * vocabulary) and carries no discriminative mass. Output
    * `(ga, gb, k)` for group pairs `ga < gb` with k > 0; self-kernels
    * ride along as `(g, g, k_self)` rows so a caller can normalize
    * without a second pass.
    */
  def wlKernel(labels: DataFrame, node: String, label: String,
               groups: DataFrame, gNode: String, g: String,
               maxLabelDf: Long): DataFrame = {
    require(maxLabelDf >= 2, s"maxLabelDf must be >= 2, got $maxLabelDf")
    // three consumers (the df filter + both sides of the pair join) and
    // the input is the full labels⋈groups aggregation — checkpoint the
    // tiny (group, label, count) frame so that join runs once, not 3×
    val c = labels.select(col(node).as("__n"), col(label).as("wl"))
      .join(groups.select(col(gNode).as("__n"), col(g).as("g")), Seq("__n"))
      .groupBy(col("g"), col("wl")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val keep = c.groupBy(col("wl")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxLabelDf).select(col("wl"))
    val ck = c.join(keep, Seq("wl"))
    ck.select(col("wl"), col("g").as("ga"), col("c").as("ca"))
      .join(ck.select(col("wl"), col("g").as("gb"), col("c").as("cb")),
        Seq("wl"))
      .filter(col("ga") <= col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(sum(col("ca") * col("cb")).as("k"))
  }

  /** Reassemble the long-form corpus into one whitespace-joined node
    * "sentence" per walk — the exact input shape
    * [[Cooccurrence.termPairCounts]] consumes, so walk skip-gram counts
    * reuse the (row-local, join-free) windowed pair machinery. Sort key
    * is the step (unique per walk), so the aggregation is
    * order-insensitive and deterministic.
    */
  def walkDocs(walks: DataFrame): DataFrame =
    walks.groupBy(col("walk")).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("step"), col("node")))),
        x => x.getField("node")), " ").as("text"))
}
