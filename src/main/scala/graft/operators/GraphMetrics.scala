package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Per-group (per-city) graph analytics — the reference's marquee feature:
  * witness-graph PageRank and betweenness centrality written back onto
  * hotspot vertices (reference `src/arango_queries.py:145-178`).
  *
  * Execution model: city subgraphs are small (city-sized), so the idiomatic
  * Spark shape is `groupByKey(city).flatMapGroups` running plain Scala per
  * group — ONE shuffle by city replaces the reference's process pool +
  * per-city AQL round trips (and fixes its chunking bug that silently
  * skipped most cities, `src/arango_queries.py:196-199`). Distributed
  * Pregel/GraphFrames only becomes necessary if a single group outgrows an
  * executor — a documented seam, not a current need.
  *
  * Numerics are engine-portable: PageRank runs a FIXED 30 iterations with
  * literal 0.85/0.15 damping (matching the oracle's generated SQL
  * iteration-for-iteration), weights stay integer until the final double
  * division, and outputs are scaled-integer parts-per-million.
  */
object GraphMetrics {

  /** Directed weighted edge within a city subgraph. */
  case class Edge(city: String, src: String, dst: String, w: Long)
  case class Metric(city: String, node: String, value_pm: Long, norm_pm: Long)
  case class HitsRow(city: String, node: String, hub_pm: Long, auth_pm: Long)

  val Alpha = 0.85
  val Iterations = 30

  private implicit val edgeEnc: Encoder[Edge] = Encoders.product[Edge]
  private implicit val metricEnc: Encoder[Metric] = Encoders.product[Metric]
  private implicit val hitsEnc: Encoder[HitsRow] = Encoders.product[HitsRow]
  private implicit val strEnc: Encoder[String] = Encoders.STRING

  /** Weighted PageRank on one small graph, networkx-compatible semantics
    * (uniform start/personalization, dangling mass redistributed
    * uniformly), fixed iteration count for cross-engine determinism.
    * Returns node → score (sums to 1).
    */
  def pagerank(edges: Seq[(String, String, Long)],
               iterations: Int = Iterations): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted.toArray
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val outW = new Array[Long](n)
    edges.foreach { case (s, _, w) => outW(idx(s)) += w }
    // in-edges grouped by destination, source-sorted for stable summation
    val inEdges = edges.map { case (s, d, w) => (idx(d), idx(s), w) }
      .sortBy(e => (e._1, e._2)).toArray
    var x = Array.fill(n)(1.0 / n)
    for (_ <- 0 until iterations) {
      val dangling = (0 until n).collect { case i if outW(i) == 0 => x(i) }.sum
      val contrib = new Array[Double](n)
      inEdges.foreach { case (d, s, w) => contrib(d) += x(s) * w / outW(s) }
      x = Array.tabulate(n)(i => 0.15 / n + 0.85 * (contrib(i) + dangling / n))
    }
    nodes.zip(x).toMap
  }

  /** One city's graph in CSR form — flat int arrays, serializable so
    * the source-parallel distributed form can broadcast it.
    */
  private[operators] final class Csr(val nodes: Array[String],
      val adjStart: Array[Int], val adj: Array[Int],
      val inStart: Array[Int], val inAdj: Array[Int]) extends Serializable {
    def n: Int = nodes.length
  }

  private[operators] def buildCsr(edges: Seq[(String, String)]): Csr = {
    // Int-domain build: one hash pass for the name universe, then the
    // edge set as packed longs — sort + adjacent-dedup replaces the
    // old Seq.distinct on string tuples (the boxing-heavy step the
    // bwphase probe showed dominating the distributed form's CSR
    // stage). Side effect worth having: adjacency buckets come out
    // dst-SORTED, so BFS visit order — and with it the (ppm-absorbed)
    // FP summation order — is a pure function of the graph, not of
    // shuffle arrival order.
    val seen = new java.util.HashMap[String, Integer]()
    edges.foreach { case (s, d) =>
      seen.putIfAbsent(s, 0); seen.putIfAbsent(d, 0)
    }
    val nodes = new Array[String](seen.size())
    val kit = seen.keySet().iterator()
    var i = 0
    while (kit.hasNext) { nodes(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(nodes, Ordering.String)
    val n = nodes.length
    val idx = new java.util.HashMap[String, Integer](n * 2)
    i = 0
    while (i < n) { idx.put(nodes(i), i); i += 1 }
    val enc = new Array[Long](edges.size)
    i = 0
    edges.foreach { case (s, d) =>
      enc(i) = (idx.get(s).toLong << 32) | (idx.get(d).toLong & 0xffffffffL)
      i += 1
    }
    java.util.Arrays.sort(enc)
    var m = 0
    var j = 0
    while (j < enc.length) {
      if (m == 0 || enc(m - 1) != enc(j)) { enc(m) = enc(j); m += 1 }
      j += 1
    }
    val adjStart = new Array[Int](n + 1)
    j = 0
    while (j < m) { adjStart((enc(j) >>> 32).toInt + 1) += 1; j += 1 }
    i = 0
    while (i < n) { adjStart(i + 1) += adjStart(i); i += 1 }
    // sorted by (src, dst): the low words in order ARE the adj array
    val adj = new Array[Int](m)
    j = 0
    while (j < m) { adj(j) = enc(j).toInt; j += 1 }
    val (inStart, inAdj) = reverseCsr(n, adjStart, adj)
    new Csr(nodes, adjStart, adj, inStart, inAdj)
  }

  /** Reusable scratch for one Brandes source pass (the per-visit
    * allocation-free discipline; one instance per task/loop).
    */
  private[operators] final class BrandesScratch(n: Int) {
    val stack = new Array[Int](n)
    val queue = new Array[Int](n)
    val dist = new Array[Int](n)
    val sigma = new Array[Double](n)
    val delta = new Array[Double](n)
  }

  /** ONE source's Brandes pass: BFS + dependency accumulation, deltas
    * ADDED into `bc`. Shared verbatim by the per-group and the
    * source-parallel distributed forms — their equivalence is by
    * construction, up to cross-source summation order (ppm-rounded
    * away; spec-pinned).
    */
  private[operators] def brandesSource(g: Csr, s: Int, bc: Array[Double],
                                       sc: BrandesScratch): Unit = {
    import sc._
    java.util.Arrays.fill(dist, -1)
    java.util.Arrays.fill(sigma, 0.0)
    java.util.Arrays.fill(delta, 0.0)
    sigma(s) = 1.0; dist(s) = 0
    queue(0) = s
    var qHead = 0; var qTail = 1; var top = 0
    while (qHead < qTail) {
      val v = queue(qHead); qHead += 1
      stack(top) = v; top += 1
      var e = g.adjStart(v)
      while (e < g.adjStart(v + 1)) {
        val w = g.adj(e)
        if (dist(w) < 0) { dist(w) = dist(v) + 1; queue(qTail) = w; qTail += 1 }
        if (dist(w) == dist(v) + 1) sigma(w) += sigma(v)
        e += 1
      }
    }
    // Dependency accumulation: a predecessor of w on a shortest path is
    // any in-neighbor v with dist(v) = dist(w) − 1 — recovered from the
    // reverse CSR instead of materializing per-source pred lists.
    while (top > 0) {
      top -= 1
      val w = stack(top)
      val coef = (1.0 + delta(w)) / sigma(w)
      var e = g.inStart(w)
      while (e < g.inStart(w + 1)) {
        val v = g.inAdj(e)
        if (dist(v) == dist(w) - 1) delta(v) += sigma(v) * coef
        e += 1
      }
      if (w != s) bc(w) += delta(w)
    }
  }

  /** Betweenness centrality, Brandes' algorithm, directed UNWEIGHTED (the
    * reference's asymmetry: PageRank is weighted, betweenness is not —
    * networkx defaults, `src/arango_queries.py:162-167`). Normalized by
    * 1/((n-1)(n-2)) (networkx `normalized=True` on a digraph).
    */
  def betweenness(edges: Seq[(String, String)]): Map[String, Double] = {
    val g = buildCsr(edges)
    val n = g.n
    val bc = new Array[Double](n)
    val scratch = new BrandesScratch(n)
    var s = 0
    while (s < n) { brandesSource(g, s, bc, scratch); s += 1 }
    val scale = if (n > 2) 1.0 / ((n - 1.0) * (n - 2.0)) else 0.0
    g.nodes.zipWithIndex.map { case (name, i) => name -> bc(i) * scale }.toMap
  }

  /** Weighted HITS hubs/authorities — the reference's G4, which it left as
    * null columns with the `nx.hits` call commented out (reference
    * `src/arango_queries.py:168`, null init `src/blockchain_queries.py:
    * 161-163`); implemented here with the same power-iteration contract as
    * networkx (weighted adjacency, uniform start, final sum-normalization)
    * but a FIXED iteration count so engine and oracle run the identical
    * arithmetic trajectory. Per iteration: a = Aᵀh (raw), h = A·a
    * max-normalized per graph — the only scaling that affects anything
    * numerically (power iteration is scale-invariant and the final
    * sum-normalization cancels every scalar, but without the max step the
    * weighted products overflow double range within ~15 iterations).
    * Returns (hub, authority), each summing to 1.
    */
  def hits(edges: Seq[(String, String, Long)],
           iterations: Int = Iterations): (Map[String, Double], Map[String, Double]) = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted.toArray
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    // source-major sorted edge order: deterministic FP summation in-engine
    val es = edges.map { case (s, d, w) => (idx(s), idx(d), w) }
      .sortBy(e => (e._1, e._2)).toArray
    var h = Array.fill(n)(1.0 / n)
    var a = new Array[Double](n)
    for (_ <- 0 until iterations) {
      a = new Array[Double](n)
      es.foreach { case (s, d, w) => a(d) += h(s) * w }
      val hn = new Array[Double](n)
      es.foreach { case (s, d, w) => hn(s) += a(d) * w }
      val hmax = hn.max // > 0 whenever the subgraph has an edge
      var i = 0
      while (i < n) { hn(i) /= hmax; i += 1 }
      h = hn
    }
    val hs = h.sum
    val as = a.sum
    (nodes.zip(h.map(_ / hs)).toMap, nodes.zip(a.map(_ / as)).toMap)
  }

  private def toMetrics(city: String, scores: Map[String, Double]): Iterator[Metric] = {
    val mean = if (scores.isEmpty) 0.0 else scores.values.sum / scores.size
    scores.iterator.map { case (node, v) =>
      // P9 NaN-scrub: zero mean (all-zero metric) normalizes to 0, not NaN
      val norm = if (mean == 0.0) 0.0 else v / mean
      Metric(city, node, math.round(v * 1e6), math.round(norm * 1e6))
    }
  }

  /** G2 per-city weighted PageRank over an edge DataFrame with columns
    * (city, src:string, dst:string, w:long). One shuffle by city.
    *
    * `minEdges` is the reference's `MIN_CITY_SIZE` gate — cities whose
    * subgraph has fewer than that many EDGES are skipped entirely. (The
    * reference compares edge count despite the env var's name suggesting
    * hotspot count, `src/arango_queries.py:159` — quirk preserved.)
    */
  def perCityPagerank(edges: DataFrame, minEdges: Int = 0): DataFrame =
    edges.select(col("city").cast("string"), col("src"), col("dst"), col("w"))
      .as[Edge]
      .groupByKey(_.city)
      .flatMapGroups { (city, it) =>
        val es = it.map(e => (e.src, e.dst, e.w)).toSeq
        if (es.size < minEdges) Iterator.empty
        else toMetrics(city, pagerank(es))
      }
      .toDF("city", "node", "pr_pm", "pr_norm_pm")

  /** DISTRIBUTED weighted PageRank — [[perCityPagerank]]'s scale twin,
    * and the close of the graph family's one single-partition
    * assumption: the per-group form materializes a whole city's edge
    * list on one executor thread (fine at city scale; a 100× merged
    * graph or one mega-city must not OOM an executor). This form is an
    * aggregate-messages power iteration over the edge DataFrame — the
    * q118 machinery's shape: per iteration, contributions flow by an
    * edge⨝rank join on (city, src), collapse by `groupBy(city, dst)`
    * (map-side combinable), per-city dangling mass is a tiny per-city
    * aggregate joined back broadcast, and the rank frame is eagerly
    * localCheckpoint'ed (the q120 rule: every iteration's frame is read
    * twice — lazy checkpoints would recompute it) so lineage stays one
    * iteration deep. Heap per task is O(edges/partition), never
    * O(edges-in-city); rounds' cost tracks total edges, not the biggest
    * city (prdist probe).
    *
    * Numerics: the SAME fixed-iteration trajectory as [[pagerank]] —
    * identical per-term arithmetic ((x·w)/outw, 0.15/n + 0.85·(c + d/n))
    * in the same dependency order; only SUMMATION order differs
    * (distributed aggregation is order-free), which ppm rounding
    * absorbs — hash-equality with the per-group form on every city is
    * spec-pinned, and the q33 oracle passes unchanged (q147).
    */
  def pagerankDistributed(edges: DataFrame, minEdges: Int = 0,
                          iterations: Int = Iterations,
                          checkpointEvery: Int = 1): DataFrame = {
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val e0 = edges.select(col("city").cast("string"), col("src"),
      col("dst"), col("w").cast("long"))
    // the reference's MIN_CITY_SIZE gate: compare EDGE-ROW count (the
    // perCityPagerank quirk, preserved)
    val gated = e0.groupBy(col("city"))
      .agg(count(lit(1)).as("__m")).filter(col("__m") >= minEdges)
      .select(col("city"))
    // Loop partitioning is sized to the GRAPH, not the session default:
    // an iterative job's floor on small inputs is stage scheduling (the
    // q120 finding — 30 rounds × k stages × 32 near-empty tasks), so
    // the loop runs on ⌈edges / 64k⌉ partitions capped at the cluster's
    // parallelism — one partition per real chunk of work locally, full
    // fan-out on a billion-edge graph. The static sides (e, base) are
    // pre-partitioned on their join keys ONCE so iterations shuffle
    // only the rank frame.
    val eAll = e0.join(broadcast(gated), Seq("city"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parts = math.max(1, math.min(
      edges.sparkSession.sparkContext.defaultParallelism,
      (eAll.count() / 64000L).toInt + 1))
    val e = eAll.repartition(parts, col("city"), col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("city"), col("src").as("node"))
        .unionByName(e.select(col("city"), col("dst").as("node")))
        .distinct()
      val outW = e.groupBy(col("city"), col("src").as("node"))
        .agg(sum(col("w")).as("outw"))
      val nPerCity = nodes.groupBy(col("city"))
        .agg(count(lit(1)).as("n"))
      // base: one row per (city, node) with its out-weight and city
      // size. Computed ONCE into the initial rank frame — the loop
      // self-joins x⨝contrib (x carries outw/n along), so no separate
      // static frame re-enters every round.
      val base = nodes.join(outW, Seq("city", "node"), "left_outer")
        .na.fill(0L, Seq("outw"))
        .join(broadcast(nPerCity), Seq("city"))
        .repartition(parts, col("city"), col("node"))
      locally {
        // every loop shuffle (contrib agg, dangling agg) sized like the
        // static sides: conf is read at planning time, i.e. at each
        // iteration's checkpoint action, so the scope must span the
        // loop. AQE off: every shuffle is already hand-sized to `parts`,
        // per-round adaptive re-planning is pure overhead — measured
        // 11.6-12.3 s → 8.6-9.1 s steady at sf0.1 (prab A/B, 3
        // interleaved passes; 240 jobs → 73), values oracle-pinned.
        // Cols.withLoopConf so a concurrent caller can't race the restore.
        val spark = edges.sparkSession
        graft.functions.Cols.withLoopConf(spark, parts) {
        var x = base.select(col("city"), col("node"), col("outw"), col("n"),
            (lit(1.0) / col("n")).as("x"))
          .localCheckpoint(true)
        var lastCkpt = x
        for (i <- 0 until iterations) {
          // NOTE (r15 A/B): folding the dangling mass into the contrib
          // exchange as marker-keyed rows read by both a broadcast-dang
          // branch and the contrib branch DEADLOCKS with AQE off — the
          // broadcast side reuses the main plan's exchange and waits on
          // the job that itself waits on the broadcast (reuse-deadlock;
          // the run hung at load 1.0 past 10 min where this loop takes
          // ~9 s). The separate tiny dang aggregate stays.
          val dang = x.filter(col("outw") === 0)
            .groupBy(col("city")).agg(sum(col("x")).as("dang"))
          val contrib = e
            .join(x.select(col("city"), col("node").as("src"),
              col("outw"), col("x")), Seq("city", "src"))
            .groupBy(col("city"), col("dst").as("node"))
            .agg(sum(col("x") * col("w") / col("outw")).as("contrib"))
          val next = x
            .join(contrib, Seq("city", "node"), "left_outer")
            .join(broadcast(dang), Seq("city"), "left_outer")
            .select(col("city"), col("node"), col("outw"), col("n"),
              (lit(0.15) / col("n") + lit(0.85) *
                (coalesce(col("contrib"), lit(0.0)) +
                  coalesce(col("dang"), lit(0.0)) / col("n"))).as("x"))
          // checkpoint cadence: every round (depth 1, the q120 default)
          // or every k-th (lineage depth k; the un-checkpointed rounds'
          // triple read — dang, contrib, next-join — is deduped by
          // ReuseExchange within the one checkpoint action)
          if (i % checkpointEvery == checkpointEvery - 1 ||
              i == iterations - 1) {
            x = next.localCheckpoint(true)
            lastCkpt.unpersist()
            lastCkpt = x
          } else {
            x = next
          }
        }
        val mean = x.groupBy(col("city"))
          .agg((sum(col("x")) / count(lit(1))).as("mean"))
        x.join(broadcast(mean), Seq("city"))
          .select(col("city"), col("node"),
            round(col("x") * 1e6).cast("long").as("pr_pm"),
            when(col("mean") === 0.0, 0L)
              .otherwise(round(col("x") / col("mean") * 1e6).cast("long"))
              .as("pr_norm_pm"))
          .localCheckpoint(true) // sever from the persisted inputs before unpersist
        }
      }
    } finally { e.unpersist(); eAll.unpersist(); () }
  }

  /** One city's CSR as an encodable row, for the distributed
    * betweenness form: the per-city graph built ONCE by a keyed
    * aggregation, then fanned out to source-slice tasks as data — the
    * driver never touches an edge.
    */
  private[operators] case class CityCsr(city: String, nodes: Array[String],
      adjStart: Array[Int], adj: Array[Int],
      inStart: Array[Int], inAdj: Array[Int]) {
    def n: Int = nodes.length
    def toCsr: Csr = new Csr(nodes, adjStart, adj, inStart, inAdj)
  }
  /** One source-range slice of one city's work, trimmed to what a
    * Brandes task actually touches: the forward CSR and ITS OWN source
    * indices. Node strings never ride a slice (only the node frame
    * ships them, once per city), and the reverse CSR is rebuilt
    * per-task — an O(m) int counting sort is far cheaper than shipping
    * m+n more ints per slice copy (it halves the replicated bytes,
    * which the bwdist probe showed dominate this operator's wall).
    */
  private[operators] case class CsrSlice(city: String, n: Int,
      adjStart: Array[Int], adj: Array[Int], srcs: Array[Int])
  private implicit val cityCsrEnc: Encoder[CityCsr] = Encoders.product[CityCsr]
  private implicit val csrSliceEnc: Encoder[CsrSlice] = Encoders.product[CsrSlice]

  /** Reverse CSR from a forward CSR: counting sort over edge targets. */
  private[operators] def reverseCsr(n: Int, adjStart: Array[Int],
      adj: Array[Int]): (Array[Int], Array[Int]) = {
    val m = adj.length
    val inStart = new Array[Int](n + 1)
    var e = 0
    while (e < m) { inStart(adj(e) + 1) += 1; e += 1 }
    var i = 0
    while (i < n) { inStart(i + 1) += inStart(i); i += 1 }
    val inAdj = new Array[Int](m)
    val fill = java.util.Arrays.copyOf(inStart, n)
    var v = 0
    while (v < n) {
      e = adjStart(v)
      while (e < adjStart(v + 1)) {
        inAdj(fill(adj(e))) = v; fill(adj(e)) += 1; e += 1
      }
      v += 1
    }
    (inStart, inAdj)
  }

  /** DISTRIBUTED betweenness — [[perCityBetweenness]]'s scale twin on
    * the COMPUTE axis: exact Brandes needs per-source BFS state that
    * aggregate-messages cannot carry, so the distributable unit is the
    * SOURCE, not the edge. Fully distributed, no driver gather and no
    * whole-graph broadcast: (1) per-city CSRs are built by a
    * `groupByKey(city)` aggregation — per-task heap is ONE city's
    * graph, the same bound the per-group twin already accepts; (2)
    * each CSR row fans itself out into source-range slices
    * (≤ `sourcesPerSlice` sources each, slice count per city capped at
    * `defaultParallelism` so blob replication stays bounded), which a
    * round-robin repartition spreads across the cluster — a
    * plain city-keyed join would hash every slice of a mega-city onto
    * one partition and serialize exactly the work this form exists to
    * spread; (3) each task runs [[brandesSource]] VERBATIM over its
    * slice and emits sparse per-city partials, summed by one keyed
    * aggregate. Equivalence with the per-group form is by construction
    * up to cross-source summation order — ppm-rounded away and
    * spec-pinned on the real graph (GraphMetricsSpec), and q153 passes
    * q34's generated oracle unchanged.
    *
    * Cost model at 100×: shuffle volume is CSR-bytes × slices-per-city
    * (~16 B/edge × ≤defaultParallelism for the biggest city) — executor
    * and driver heap stay flat where the old broadcast form's driver
    * gather of string edge rows fell over first. Past the point where
    * even one city's CSR slice rows are too heavy to ship, exact
    * betweenness itself is the wrong ask and [[betweennessSampled]] —
    * the same machinery on a deterministic source subset — is the
    * standard escape.
    */
  def betweennessDistributed(edges: DataFrame, minEdges: Int = 0,
                             sourcesPerSlice: Int = 256): DataFrame =
    brandesDistributed(edges, minEdges, sourcesPerSlice, sampleNibbleMax = 16)

  /** First hex nibble of md5(node-name): the deterministic source-sample
    * selector shared bit-for-bit with the DuckDB oracle's
    * `substr(md5(node),1,1)` predicate — a pure function of the name, so
    * the sampled source SET is identical across runs, partitionings, and
    * engines (spec-pinned).
    */
  private[operators] def md5Nibble(name: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (d(0) & 0xF0) >>> 4
  }

  /** SAMPLED-source approximate betweenness — the documented escape past
    * graphs where even exact source-parallel Brandes is the wrong ask:
    * run [[brandesSource]] only from sources whose name's md5 first
    * nibble is < `nibbleMax` (expected nibbleMax/16 of the nodes), and
    * rescale each node's accumulated dependency by n/|S| per city — the
    * Brandes–Pich unbiased estimator. Everything else (CSR build, slice
    * fan-out, normalization, ppm rounding) is [[betweennessDistributed]]
    * VERBATIM via the shared core, so the oracle is the q34 generator
    * restricted to the same md5 predicate — exact on the sample, hence
    * hash-checkable, not a tolerance test. Cost: |S|/n of the exact
    * form's source passes; at 100× run this, not the exact form.
    */
  def betweennessSampled(edges: DataFrame, minEdges: Int = 0,
                         sourcesPerSlice: Int = 256,
                         nibbleMax: Int = 4): DataFrame = {
    require(nibbleMax >= 1 && nibbleMax <= 16,
      s"nibbleMax must be in [1,16], got $nibbleMax")
    brandesDistributed(edges, minEdges, sourcesPerSlice, nibbleMax)
  }

  private def brandesDistributed(edges: DataFrame, minEdges: Int,
                                 sourcesPerSlice: Int,
                                 sampleNibbleMax: Int): DataFrame = {
    val session = edges.sparkSession
    // no session.implicits._ here: it would ambiguate the object-level
    // string encoder groupByKey resolves against
    implicit val t3Enc: Encoder[(String, String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING)
    implicit val partEnc: Encoder[(String, Int, Double)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.scalaDouble)
    implicit val nodeEnc: Encoder[(String, Int, String, Int, Int)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.STRING,
        Encoders.scalaInt, Encoders.scalaInt)
    val sliceCap = math.max(1, session.sparkContext.defaultParallelism)
    // AQE off for this DAG (scoped; the method materializes eagerly via
    // the final localCheckpoint, so the conf never escapes): shuffle
    // sizes are known (slices = bounded fan-out, scoring frames =
    // node-grain) and per-stage adaptive re-planning only adds driver
    // time — bwaqe A/B: steady 1.69-2.26 s → 1.61 s, cold 12.0 → 3.5 s.
    // Scoped via Cols.withLoopAqeOff (partitions untouched here) so the
    // restore can't race a concurrent scope on the shared session.
    graft.functions.Cols.withLoopAqeOff(session) {
    def sampledSources(g: CityCsr): Array[Int] =
      if (sampleNibbleMax >= 16) Array.range(0, g.n)
      else (0 until g.n).filter(i => md5Nibble(g.nodes(i)) < sampleNibbleMax)
        .toArray
    val csrs = edges.select(col("city").cast("string"), col("src"), col("dst"))
      .as[(String, String, String)]
      .groupByKey(_._1)
      .flatMapGroups { (c, it) =>
        val es = it.map(e => (e._2, e._3)).toIndexedSeq
        // the reference's gate quirk preserved: EDGE-ROW count, dups included
        if (es.length < minEdges) Iterator.empty
        else {
          val g = buildCsr(es)
          Iterator.single(CityCsr(c, g.nodes, g.adjStart, g.adj,
            g.inStart, g.inAdj))
        }
      }
      .persist() // feeds slices AND the node frame; lineage holds the build
    val sliced = csrs.flatMap { g =>
      val src = sampledSources(g)
      val sn = src.length
      val nSlices = math.max(1, math.min(sliceCap,
        (sn + sourcesPerSlice - 1) / math.max(1, sourcesPerSlice)))
      (0 until nSlices).iterator.map { i =>
        src.slice((sn.toLong * i / nSlices).toInt,
          (sn.toLong * (i + 1) / nSlices).toInt)
      }.filter(_.nonEmpty)
        .map(mySrcs => CsrSlice(g.city, g.n, g.adjStart, g.adj, mySrcs))
    }
    val partials = sliced
      .repartition(session.sparkContext.defaultParallelism * 2)
      .mapPartitions { it =>
        it.flatMap { sl =>
          val (inStart, inAdj) = reverseCsr(sl.n, sl.adjStart, sl.adj)
          // node names deliberately absent from slices; Brandes only
          // walks the int arrays (the node frame carries the names)
          val g = new Csr(new Array[String](0), sl.adjStart, sl.adj,
            inStart, inAdj)
          val bc = new Array[Double](sl.n)
          val scratch = new BrandesScratch(sl.n)
          sl.srcs.foreach(s => brandesSource(g, s, bc, scratch))
          bc.iterator.zipWithIndex.collect {
            case (v, i) if v != 0.0 => (sl.city, i, v)
          }
        }
      }
      .toDF("city", "nidx", "partial")
    val summed = partials.groupBy(col("city"), col("nidx"))
      .agg(sum(col("partial")).as("bc"))
    val nodesDf = csrs.flatMap { g =>
      val sn = sampledSources(g).length
      g.nodes.iterator.zipWithIndex.map { case (nm, i) =>
        (g.city, i, nm, g.n, sn)
      }
    }.toDF("city", "nidx", "node", "n", "s_cnt")
    try {
    val v1 = nodesDf
      .join(summed, Seq("city", "nidx"), "left_outer")
      .select(col("city"), col("node"), col("n"), col("s_cnt"),
        (coalesce(col("bc"), lit(0.0)) *
          when(col("n") > 2,
            lit(1.0) / ((col("n") - 1.0) * (col("n") - 2.0)))
            .otherwise(lit(0.0))).as("v1"))
    // Sampled path: the Brandes–Pich rescale n/|S| must not ride on the
    // raw double — engine (recursive deltas) and oracle (closed-form
    // pair sums) agree only up to summation order, and multiplying that
    // noise by n/|S| pushed three sf0.01 values across a pm rounding
    // boundary. So quantize the RESTRICTED sum to pm first (the exact
    // form's machinery, proven hash-stable on q34/q153), then rescale
    // the rounded integer: round(p1·n/|S|) is a pure function of
    // (int, int, int) — bit-identical across engines by construction.
    val scaled =
      if (sampleNibbleMax >= 16)
        v1.select(col("city"), col("node"), col("v1").as("v"))
      else
        v1.select(col("city"), col("node"),
          when(col("s_cnt") > 0,
            round(col("v1") * 1e6).cast("long").cast("double") *
              col("n").cast("double") / col("s_cnt").cast("double"))
            .otherwise(lit(0.0)).as("v"))
    val means = scaled.groupBy(col("city"))
      .agg((sum(col("v")) / count(lit(1))).as("mean"))
    val pmCol =
      if (sampleNibbleMax >= 16) round(col("v") * 1e6).cast("long")
      else round(col("v")).cast("long")
    scaled.join(broadcast(means), Seq("city"))
      .select(col("city"), col("node"),
        pmCol.as("bc_pm"),
        when(col("mean") === 0.0, 0L)
          .otherwise(round(col("v") / col("mean") * 1e6).cast("long"))
          .as("bc_norm_pm"))
      .localCheckpoint(true) // sever from the persisted CSR frame before unpersist
    } finally {
      csrs.unpersist()
      ()
    }
    }
  }

  /** G3 per-city betweenness (unweighted, normalized + mean-normalized);
    * same `minEdges` gate as [[perCityPagerank]].
    */
  def perCityBetweenness(edges: DataFrame, minEdges: Int = 0): DataFrame =
    edges.select(col("city").cast("string"), col("src"), col("dst"), col("w"))
      .as[Edge]
      .groupByKey(_.city)
      .flatMapGroups { (city, it) =>
        val es = it.map(e => (e.src, e.dst)).toSeq
        if (es.size < minEdges) Iterator.empty
        else toMetrics(city, betweenness(es))
      }
      .toDF("city", "node", "bc_pm", "bc_norm_pm")

  /** DISTRIBUTED weighted HITS — [[perCityHits]]'s scale twin, the
    * same aggregate-messages machinery as [[pagerankDistributed]] (the
    * power-iteration shape is identical; only the messages differ):
    * per iteration a = Aᵀh by an edge⨝h join on (city, src) collapsed
    * by (city, dst), then h' = A·a by the mirror join on (city, dst)
    * collapsed by (city, src), max-normalized per city (the overflow
    * guard the local form documents) via a tiny broadcast-joined
    * aggregate. Hub/authority normalization and the final sums match
    * the local trajectory term for term; only summation order differs,
    * absorbed by ppm rounding — hash-equality with [[perCityHits]] on
    * the real graph is spec-pinned, which chains it to q47's oracle.
    *
    * NOT separately registered as a query: it would re-run q47's exact
    * oracle at ~1.5× q147's iteration cost for no new semantics — the
    * oracle-vs-distributed-loop proof already stands on q147; this twin
    * is pinned by equivalence instead (the bench-lean choice,
    * documented in COVERAGE.md). Use it when one city's edge list
    * outgrows an executor — per-task heap is O(edges/partition).
    */
  def hitsDistributed(edges: DataFrame, minEdges: Int = 0,
                      iterations: Int = Iterations): DataFrame = {
    // a itself is only assigned inside the loop; 0 iterations would NPE
    // at the final normalization instead of failing loudly
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges.select(col("city").cast("string"), col("src"),
      col("dst"), col("w").cast("long"))
    val gated = e0.groupBy(col("city"))
      .agg(count(lit(1)).as("__m")).filter(col("__m") >= minEdges)
      .select(col("city"))
    val eAll = e0.join(broadcast(gated), Seq("city"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = edges.sparkSession
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      (eAll.count() / 64000L).toInt + 1))
    // both message directions are joins against the edge frame; one
    // copy per join key keeps every iteration shuffle on the h/a side
    val eBySrc = eAll.repartition(parts, col("city"), col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eByDst = eAll.repartition(parts, col("city"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = eAll.select(col("city"), col("src").as("node"))
        .unionByName(eAll.select(col("city"), col("dst").as("node")))
        .distinct()
      val nPerCity = nodes.groupBy(col("city")).agg(count(lit(1)).as("n"))
      val base = nodes.join(broadcast(nPerCity), Seq("city"))
        .repartition(parts, col("city"), col("node"))
      // AQE off + parts for the loop — shuffles are hand-sized to `parts`;
      // per-round adaptive re-planning is overhead (the prab finding).
      // Cols.withLoopConf: restore is first-in-save/last-out, race-free.
      graft.functions.Cols.withLoopConf(spark, parts) {
        var h = base.select(col("city"), col("node"),
            (lit(1.0) / col("n")).as("h"))
          .localCheckpoint(true)
        var a: DataFrame = null
        for (_ <- 0 until iterations) {
          // a = Aᵀh (RAW, the local trajectory): per dst, Σ h(src)·w
          val aNext = eBySrc
            .join(h.select(col("city"), col("node").as("src"), col("h")),
              Seq("city", "src"))
            .groupBy(col("city"), col("dst").as("node"))
            .agg(sum(col("h") * col("w")).as("a"))
            .localCheckpoint(true)
          // h' = A·a, max-normalized per city (overflow guard)
          val hRaw = eByDst
            .join(aNext.select(col("city"), col("node").as("dst"), col("a")),
              Seq("city", "dst"))
            .groupBy(col("city"), col("src").as("node"))
            .agg(sum(col("a") * col("w")).as("hr"))
          val hMax = hRaw.groupBy(col("city")).agg(max(col("hr")).as("hmax"))
          val prevH = h
          val prevA = a
          h = h.select(col("city"), col("node"))
            .join(hRaw, Seq("city", "node"), "left_outer")
            .join(broadcast(hMax), Seq("city"))
            .select(col("city"), col("node"),
              (coalesce(col("hr"), lit(0.0)) / col("hmax")).as("h"))
            .localCheckpoint(true)
          a = aNext
          prevH.unpersist()
          if (prevA != null) { prevA.unpersist(); () }
        }
        // final normalization: h by its city sum, a by its city sum;
        // nodes with no in-edges carry authority 0 (absent from a)
        val hs = h.groupBy(col("city")).agg(sum(col("h")).as("hs"))
        val as_ = a.groupBy(col("city")).agg(sum(col("a")).as("as"))
        base.select(col("city"), col("node"))
          .join(h, Seq("city", "node"), "left_outer")
          .join(a, Seq("city", "node"), "left_outer")
          .join(broadcast(hs), Seq("city"))
          .join(broadcast(as_), Seq("city"))
          .select(col("city"), col("node"),
            round(coalesce(col("h"), lit(0.0)) / col("hs") * 1e6)
              .cast("long").as("hub_pm"),
            round(coalesce(col("a"), lit(0.0)) / col("as") * 1e6)
              .cast("long").as("auth_pm"))
          .localCheckpoint(true) // sever from persisted inputs
      }
    } finally { eBySrc.unpersist(); eByDst.unpersist(); eAll.unpersist(); () }
  }

  /** G4 per-city weighted HITS (hub_pm, auth_pm as parts-per-million);
    * same shuffle-once-by-city execution and `minEdges` gate as
    * [[perCityPagerank]].
    */
  def perCityHits(edges: DataFrame, minEdges: Int = 0): DataFrame =
    edges.select(col("city").cast("string"), col("src"), col("dst"), col("w"))
      .as[Edge]
      .groupByKey(_.city)
      .flatMapGroups { (city, it) =>
        val es = it.map(e => (e.src, e.dst, e.w)).toSeq
        if (es.size < minEdges) Iterator.empty
        else {
          val (hub, auth) = hits(es)
          hub.keysIterator.map(node => HitsRow(city, node,
            math.round(hub(node) * 1e6), math.round(auth(node) * 1e6)))
        }
      }
      .toDF("city", "node", "hub_pm", "auth_pm")
}
