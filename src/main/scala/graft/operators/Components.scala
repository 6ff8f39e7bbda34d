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
    * @param maxIter hard round cap (diameter bound). The loop exits
    *   early on convergence; hitting the cap without converging throws —
    *   silent partial labels would corrupt a dedup pipeline. */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // undirected: keep each edge in both directions, vertices from both ends
    val fwd = edges.select(col(srcCol).as("__u"), col(dstCol).as("__v"))
    val und = fwd.union(fwd.select(col("__v").as("__u"), col("__u").as("__v")))
      .localCheckpoint(eager = false)
    var labels = und.select(col("__u").as("id")).distinct()
      .withColumn("component_id", col("id"))
      .localCheckpoint(eager = false)
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
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
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
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
