package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** ANN recall-drift probe:
  * `runMain graft.tools.RecallProbe <sfDir> [nAppends]` (default 3).
  *
  * The append contract (Similarity.appendToIvfIndex) says "append between
  * rebuilds, rebuild when distribution drift erodes recall" — this is the
  * tool that MEASURES that erosion, closing the loop. Starting from an
  * IVF index trained on the sf corpus, it appends `nAppends` DRIFTED
  * batches (each an orthogonally-transformed replica of the corpus —
  * coordinate rotation + deterministic sign flips, the [[ScaleData]]
  * scheme: norms and within-batch cosines are preserved exactly while
  * the batch occupies directions the trained centroids never saw — a
  * worst-case distribution shift at constant data statistics) and after
  * each append reports, over queries sampled from the WHOLE current
  * corpus:
  *
  *   recall@k(appended index)  vs exact brute-force ground truth
  *   recall@k(index rebuilt on the current corpus)  — the `faiss`
  *     retrain counterfactual the operating rule trades against
  *
  * One JSON line per step; the gap between the two columns is the price
  * of NOT rebuilding after that much drift. Deterministic end to end —
  * no RNG — so the curve is reproducible and belongs in SCALING.md. */
object RecallProbe {

  private val IdStride = 1000000000L // multiple of QueryStride: keeps % 100 sampling aligned
  private val NCells = 16
  private val KmeansIters = 2
  private val NProbes = 3
  private val K = 5
  private val QueryStride = 100
  // PQ geometry, mirroring the s4/s5 query constants (64 dims → 4 × 16)
  private val PqSub = 4
  private val PqSubDim = 16
  private val PqK = 16
  private val PqShortlist = 20

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nAppends = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val tmp = java.nio.file.Files.createTempDirectory("graft_recall").toString

    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)

    // drifted replica i: rotate coordinates by 7i (mod dim) and flip the
    // sign of every position p with (p + i) % 3 == 0 — an orthogonal
    // transform, so ||v|| and within-replica cosine structure are EXACT
    def drifted(i: Int): DataFrame = {
      val r = (7 * i) % dim
      val rotated =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, dim - r),
          slice(col("embedding"), 1, r))
      emb.select(
        (col("vec_id") + lit(i * IdStride)).as("vec_id"),
        zip_with(rotated,
          sequence(lit(0), lit(dim - 1)),
          (x, p) => when((p + lit(i)) % 3 === 0, -x).otherwise(x)
        ).as("embedding"))
    }

    def recallOf(approx: DataFrame, truth: DataFrame): Double = {
      val a = approx.select(col("query_id"), col("neighbor_id"))
      val t = truth.select(col("query_id"), col("neighbor_id"))
      t.join(a, Seq("query_id", "neighbor_id")).count().toDouble /
        t.count().toDouble
    }

    /** Share of the corpus in the fattest cell of an index's postings —
      * the SCAN-COST erosion channel: drifted mass that the frozen
      * centroids cannot separate piles into few cells, and every probe of
      * those cells scans it all. */
    def maxCellShare(table: String): Double = {
      val counts = spark.table(table).groupBy(col("__cell")).count()
        .agg(max(col("count")), sum(col("count"))).head()
      counts.getLong(0).toDouble / counts.getLong(1).toDouble
    }

    Similarity.buildIvfIndex(emb, "vec_id", "embedding", NCells,
      "recall_appended_ivf", s"$tmp/appended", nBuckets = 8,
      kmeansIters = KmeansIters)
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", NCells,
      KmeansIters, PqSub, PqSubDim, PqK, KmeansIters,
      "recall_appended_ivfpq", s"$tmp/appended_pq", nBuckets = 8)

    var corpus = emb
    val lines = (0 to nAppends).map { i =>
      if (i > 0) {
        val batch = drifted(i)
        Similarity.appendToIvfIndex(spark, "recall_appended_ivf", batch,
          "vec_id", "embedding")
        Similarity.appendToIvfPqIndex(spark, "recall_appended_ivfpq", batch,
          "vec_id", "embedding", PqSub, PqSubDim, PqK)
        corpus = corpus.unionByName(batch)
      }
      val snap = corpus.localCheckpoint(eager = true)
      val queries = snap.filter(col("vec_id") % QueryStride === 0)
      val truth = Similarity.knnBruteForce(queries, snap, "vec_id", "embedding", K)
        .localCheckpoint(eager = true)
      val rAppended = recallOf(Similarity.probeIvfIndex(spark,
        "recall_appended_ivf", queries, "vec_id", "embedding", K, NCells, NProbes),
        truth)
      val rAppendedPq = recallOf(Similarity.probeIvfPqIndex(spark,
        "recall_appended_ivfpq", queries, snap, "vec_id", "embedding",
        K, NProbes, PqSub, PqSubDim, PqK, PqShortlist), truth)
      // the retrain counterfactual: same geometry budget, trained on the
      // CURRENT corpus
      Similarity.buildIvfIndex(snap, "vec_id", "embedding", NCells,
        "recall_rebuilt_ivf", s"$tmp/rebuilt_$i", nBuckets = 8,
        kmeansIters = KmeansIters)
      val rRebuilt = recallOf(Similarity.probeIvfIndex(spark,
        "recall_rebuilt_ivf", queries, "vec_id", "embedding", K, NCells, NProbes),
        truth)
      Similarity.buildIvfPqIndex(snap, "vec_id", "embedding", NCells,
        KmeansIters, PqSub, PqSubDim, PqK, KmeansIters,
        "recall_rebuilt_ivfpq", s"$tmp/rebuilt_pq_$i", nBuckets = 8)
      val rRebuiltPq = recallOf(Similarity.probeIvfPqIndex(spark,
        "recall_rebuilt_ivfpq", queries, snap, "vec_id", "embedding",
        K, NProbes, PqSub, PqSubDim, PqK, PqShortlist), truth)
      val shareAppended = maxCellShare("recall_appended_ivf")
      val shareRebuilt = maxCellShare("recall_rebuilt_ivf")
      spark.catalog.clearCache(); System.gc() // bench hygiene between steps
      val line =
        f"""{"appends":$i,"corpus_rows":${snap.count()},"ivf_appended":$rAppended%.4f,"ivf_rebuilt":$rRebuilt%.4f,"ivfpq_appended":$rAppendedPq%.4f,"ivfpq_rebuilt":$rRebuiltPq%.4f,"max_cell_share_appended":$shareAppended%.4f,"max_cell_share_rebuilt":$shareRebuilt%.4f}"""
      println(line)
      line
    }
    // summary block for easy paste into SCALING.md
    System.err.println(lines.mkString("[recall-probe]\n", "\n", ""))
    spark.stop()
  }
}
