package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup output (d2–d6) into actionable CLUSTERS: every
  * document gets the minimum doc id of its component as `component_id`,
  * so "keep the canonical, drop the rest" is a single filter.
  *
  * Algorithm: iterative minimum-label propagation (the dataframe form of
  * Pregel-style CC; equivalent to the "small-star only" case of
  * Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
  * 2014). Each round joins current labels across edges and keeps the
  * per-vertex minimum of (own label, neighbors' labels); convergence when
  * a round changes nothing.
  *
  * Scale properties:
  *  - rounds needed = graph diameter in the worst case, but near-dup
  *    graphs are unions of near-cliques (a duplicate cluster pairs almost
  *    every member with almost every other), so 2–3 rounds converge;
  *  - each round is two hash joins keyed on vertex id plus one
  *    aggregation — all equi-shuffles, AQE-coalesced;
  *  - lineage is cut every round with a lazy localCheckpoint, or the
  *    iteration N plan would nest N joins deep;
  *  - the driver only evaluates the single-long "did anything change"
  *    count per round (no data collect).
  */
object Components {

  /** Label every vertex of the `(srcCol, dstCol)` edge list with the
    * minimum vertex id reachable from it. Output: (id, component_id),
    * one row per distinct vertex, deterministic.
    *
    * Hybrid scheme: min-label propagation (converges in 2–3 rounds on the
    * near-clique graphs dedup actually produces) for the first
    * `switchAfter` rounds; if the graph turns out to be high-diameter — a
    * chain of pairwise-overlapping documents makes propagation need
    * diameter rounds — fall through to the alternating
    * large-star/small-star algorithm ([[connectedComponentsAlternating]]),
    * which contracts path length multiplicatively and converges in
    * O(log n) rounds on ANY graph (Kiveris et al., SoCC 2014). Both paths
    * produce the identical min-id labeling, so callers (and the d7
    * oracle) never see which one ran.
    *
    * @param maxIter hard round cap. The loop exits early on convergence;
    *   hitting the cap without converging throws — silent partial labels
    *   would corrupt a dedup pipeline.
    * @param switchAfter propagation rounds to try before switching to the
    *   alternating algorithm; `>= maxIter` disables the fallback. */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      switchAfter: Int = 5): DataFrame = {
    // undirected: keep each edge in both directions, vertices from both ends
    val fwd = edges.select(col(srcCol).as("__u"), col(dstCol).as("__v"))
    val und = fwd.union(fwd.select(col("__v").as("__u"), col("__u").as("__v")))
      .localCheckpoint(eager = false)
    var labels = und.select(col("__u").as("id")).distinct()
      .withColumn("component_id", col("id"))
      .localCheckpoint(eager = false)
    var round = 0
    var converged = false
    while (!converged && round < maxIter && round < switchAfter) {
      // per-vertex min of neighbor labels, then min with the own label
      val viaNeighbors = und
        .join(labels.withColumnRenamed("id", "__v"), Seq("__v"))
        .groupBy(col("__u").as("id"))
        .agg(min(col("component_id")).as("__nbr_min"))
      val next = labels
        .join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("component_id"), coalesce(col("__nbr_min"), col("component_id")))
            .as("component_id"))
        .localCheckpoint(eager = false)
      val changed = next.as("n")
        .join(labels.as("p"), Seq("id"))
        .filter(col("n.component_id") =!= col("p.component_id"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      round += 1
    }
    if (!converged && round < maxIter)
      return connectedComponentsAlternating(edges, srcCol, dstCol, maxIter - round)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR edge
    * rewriting — the published scale answer for high-diameter graphs
    * (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected
    * Components in MapReduce and Beyond", SoCC 2014, Algorithm 3).
    * Identical output contract to [[connectedComponents]]: one
    * (id, component_id = min reachable id) row per distinct input vertex.
    *
    * Each round rewrites the EDGE SET rather than propagating labels:
    *
    *  - large-star: every vertex u links each strictly-LARGER neighbor to
    *    m(u) = min(Γ(u) ∪ u) — long chains fold toward local minima from
    *    both ends at once;
    *  - small-star: every vertex u links its smaller neighbors (and
    *    itself) to the minimum of that set — flattening the partial trees
    *    large-star built.
    *
    * Path length contracts multiplicatively (vs one hop per round for
    * label propagation), giving O(log n) rounds on any graph; the fixed
    * point is the star graph vertex→component-min, which IS the answer.
    * Per round: two wordcount-shaped aggs + two equi-joins, all keyed on
    * vertex ids — same shuffle shape as propagation, strictly more rounds
    * survived. Lineage cut per round with a lazy localCheckpoint; the
    * driver sees one scalar count per round. */
  def connectedComponentsAlternating(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // original vertex set: the output contract is one row per vertex, and
    // star rewriting drops vertices that become isolated roots
    val verts = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id")))
      .distinct()
      .localCheckpoint(eager = false)
    // canonical undirected edge rows: (__hi, __lo), self-loops dropped
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("__hi"),
        least(col(srcCol), col(dstCol)).as("__lo"))
      .filter(col("__hi") =!= col("__lo"))
      .distinct()
      .localCheckpoint(eager = false)
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // LARGE-STAR over the symmetrized edges: at u, link every larger
      // neighbor v to m(u) = min(neighbors ∪ u). m(u) ≤ u < v keeps the
      // (__hi, __lo) orientation invariant.
      val sym = e.select(col("__hi").as("__u"), col("__lo").as("__v"))
        .union(e.select(col("__lo").as("__u"), col("__hi").as("__v")))
      val lsMin = sym.groupBy(col("__u"))
        .agg(least(min(col("__v")), col("__u")).as("__m"))
      val ls = sym.join(lsMin, Seq("__u"))
        .filter(col("__v") > col("__u"))
        .select(col("__v").as("__hi"), col("__m").as("__lo"))
        .filter(col("__hi") =!= col("__lo"))
        .distinct()
        .localCheckpoint(eager = false)
      // SMALL-STAR on the (hi → lo) orientation: at u, link u and every
      // smaller neighbor to the minimum of the set. All outputs keep
      // hi > lo by construction (v > m because m is the minimum).
      val ssMin = ls.groupBy(col("__hi").as("__u")).agg(min(col("__lo")).as("__m"))
      val ssLinks = ls.join(ssMin, ls("__hi") === ssMin("__u"))
        .filter(col("__lo") =!= col("__m"))
        .select(col("__lo").as("__hi"), col("__m").as("__lo"))
      val next = ssLinks
        .union(ssMin.select(col("__u").as("__hi"), col("__m").as("__lo")))
        .filter(col("__hi") =!= col("__lo"))
        .distinct()
        .localCheckpoint(eager = false)
      // fixed point: the edge set stopped changing (both are distinct sets,
      // so equality = same size + no row of next outside e)
      val nNext = next.count()
      val nPrev = e.count()
      val novel =
        if (nNext != nPrev) 1L
        else next.join(e, Seq("__hi", "__lo"), "left_anti").limit(1).count()
      e = next
      converged = novel == 0
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsAlternating did not converge in $maxIter rounds")
    // fixed point is a star forest: every non-root vertex carries exactly
    // one (vertex, component-min) edge; roots and original singletons
    // label themselves
    verts
      .join(e.select(col("__hi").as("id"), col("__lo").as("__cc")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__cc"), col("id")).as("component_id"))
  }

  /** Dedup clustering: pairs → one row per involved doc with its
    * canonical (min) id and the component size. Docs not in any pair are
    * singletons and simply do not appear (their canonical is themselves). */
  def dedupClusters(pairs: DataFrame, idaCol: String, idbCol: String): DataFrame = {
    val cc = connectedComponents(pairs, idaCol, idbCol)
    val sizes = cc.groupBy(col("component_id")).agg(count(lit(1)).as("component_size"))
    cc.join(sizes, Seq("component_id"))
      .select(col("id"), col("component_id"), col("component_size"))
  }

  /** The last step of the dedup pipeline: drop every non-canonical member
    * of every near-dup cluster from the corpus. A LEFT ANTI join against
    * the (small — duplicates only) non-canonical id set; singletons pass
    * through untouched. This is the operator a training-data run actually
    * ends with: corpus in, deduplicated corpus out. */
  def keepCanonical(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      idaCol: String,
      idbCol: String): DataFrame = {
    val losers = connectedComponents(pairs, idaCol, idbCol)
      .filter(col("id") =!= col("component_id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
