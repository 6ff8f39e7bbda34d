package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY.md §2d): brute-force
  * cosine top-k as the exact baseline, and random-hyperplane LSH bucketing
  * as the scale path.
  *
  * Scale design: brute force is O(queries·corpus) — correct, and the right
  * answer when the query set is small (it broadcasts; the corpus streams
  * through map-side with NO shuffle of the big side). The LSH variant
  * assigns every vector a bucket from the sign pattern of `nPlanes`
  * deterministic hyperplanes; each query probes only its own bucket, so the
  * pair space shrinks ~2^nPlanes-fold and the only shuffle keys on the
  * bucket id. Recall is probabilistic (standard LSH trade-off) — the
  * driver records a rows-only check for it, the exact baseline is the
  * oracle-checked operator.
  */
object Similarity {

  /** d5-style exact near-dup pairs: all pairs with cosine ≥ threshold.
    * O(n²/2) pair space — kept exact intentionally (it IS the oracle
    * semantics); at corpus scale use [[lshTopK]] or MinHash instead.
    * Squared norms are computed once per vector before the self-join. */
  def cosinePairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val withNorm = emb.select(col(idCol), col(vecCol), norm2(col(vecCol)).as("__n2"))
    withNorm.as("a")
      .join(withNorm.as("b"), col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("ida"), col(s"b.$idCol").as("idb"),
        cosineFromNorms(dotD(col(s"a.$vecCol"), col(s"b.$vecCol")),
          col("a.__n2"), col("b.__n2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** s1: brute-force cosine top-k neighbors for each query vector.
    * `queries` is expected to be small — Catalyst broadcasts it, the
    * corpus side never shuffles; ranking is one window over query_id. */
  def knnBruteForce(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm2(col(vecCol)).as("__qn2"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm2(col(vecCol)).as("__cn2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFromNorms(dotD(col("__qv"), col("__cv")), col("__qn2"), col("__cn2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane p,
    * dim d): an integer in [-504, 504] from modular arithmetic — engine
    * neutral and seedless (reproducible across runs and engines). */
  private def planeCoef(p: Int, d: Int): Double =
    (((p * 2 + 3) * (d + 1) * 7919 + p * 104729 + 13) % 1009 - 504).toDouble

  /** s2: random-hyperplane LSH ANN. Every vector hashes to a bucket =
    * sign-bit pattern over `nPlanes` hyperplanes; exact cosine rerank
    * within the probed bucket only. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 12): DataFrame = {
    def bucket(vec: org.apache.spark.sql.Column) =
      (0 until nPlanes).map { p =>
        val plane = array((0 until 64).map(d => lit(planeCoef(p, d))): _*)
        when(dotD(vec, plane) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm2(col(vecCol)).as("__qn2"), bucket(col(vecCol)).as("__bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm2(col(vecCol)).as("__cn2"), bucket(col(vecCol)).as("__bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFromNorms(dotD(col("__qv"), col("__cv")), col("__qn2"), col("__cn2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
