package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ANN rebuild-policy hook: driftReport measures recall@k of a
  * persisted index against brute-force ground truth and flips the
  * rebuild recommendation at the configured floor; appended-fraction
  * since the trained geometry rides along as the cheap leading
  * indicator. */
class DriftReportSpec extends SparkSpec {

  private def dropIdx(name: String): Unit =
    Seq("", "_centroids", "_codebooks", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  test("fresh index: recall measured, zero appended fraction, no rebuild; " +
    "drift-appended index: fraction counted, recall floor flips the call") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val path = java.nio.file.Files.createTempDirectory("graft_drift").toString
    dropIdx("graft_drift_ivf")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", 16,
      "graft_drift_ivf", s"$path/ivf", kmeansIters = 2)

    // fresh: geometry trained on exactly this corpus
    val fresh = Similarity.driftReport(spark, "graft_drift_ivf", emb,
      "vec_id", "embedding", k = 5, nCells = 16, nProbes = 3,
      recallFloor = 0.0, sampleEvery = 50)
    // calibration: the r8 RecallProbe measured IVF recall@5 ≈ 0.53 at
    // 16 cells / 3 probes on an isotropic corpus — 0.3 is the sanity
    // floor, not a quality bar
    assert(fresh.sampledQueries > 0 && fresh.recallAtK > 0.3,
      s"fresh index recall implausibly low: $fresh")
    assert(fresh.appendedFraction == 0.0, s"fresh fraction: $fresh")
    assert(!fresh.rebuildRecommended)

    // append two ORTHOGONALLY-TRANSFORMED replicas (the RecallProbe
    // drift scheme: coordinate rotation + sign flips — norms and
    // within-batch cosines exact, directions the trained centroids
    // never saw)
    def drifted(i: Int) = {
      val r = (7 * i) % dim
      val rotated = concat(slice(col("embedding"), r + 1, dim - r),
        slice(col("embedding"), 1, r))
      emb.select((col("vec_id") + lit(i * 1000000000L)).as("vec_id"),
        zip_with(rotated, sequence(lit(0), lit(dim - 1)),
          (x, p) => when((p + lit(i)) % 3 === 0, -x).otherwise(x))
          .as("embedding"))
    }
    val b1 = drifted(1); val b2 = drifted(2)
    Similarity.appendToIvfIndex(spark, "graft_drift_ivf", b1, "vec_id", "embedding")
    Similarity.appendToIvfIndex(spark, "graft_drift_ivf", b2, "vec_id", "embedding")
    val corpus = emb.unionByName(b1).unionByName(b2)

    // floor below any plausible measurement → no recommendation; floor
    // above → flips. The measured value itself must have DROPPED vs the
    // fresh index (drifted mass under frozen geometry).
    val low = Similarity.driftReport(spark, "graft_drift_ivf", corpus,
      "vec_id", "embedding", k = 5, nCells = 16, nProbes = 3,
      recallFloor = 0.0, sampleEvery = 50)
    assert(math.abs(low.appendedFraction - 2.0 / 3.0) < 1e-9,
      s"two appended replicas of the base corpus = 2/3: $low")
    assert(low.indexRows == 3 * fresh.indexRows)
    // the absolute level after drift is the probe's business (the r8
    // RecallProbe curve: norm-preserving drift keeps appended ≈ rebuilt;
    // query samples differ between reports so fresh-vs-appended is not
    // an apples comparison) — this spec pins the HOOK: a measured
    // recall in range, the right appended-fraction, and the floor flip
    assert(low.recallAtK > 0.0 && low.recallAtK < 1.0, s"appended: $low")
    assert(!low.rebuildRecommended, "floor 0.0 must never recommend")
    val high = Similarity.driftReport(spark, "graft_drift_ivf", corpus,
      "vec_id", "embedding", k = 5, nCells = 16, nProbes = 3,
      recallFloor = 0.999, sampleEvery = 50)
    assert(high.rebuildRecommended,
      s"recall ${high.recallAtK} under floor 0.999 must recommend rebuild")
    assert(high.recallAtK == low.recallAtK,
      "the measurement must not depend on the floor")
    dropIdx("graft_drift_ivf")
  }

  test("IVF-PQ variant measures through the codes table; pre-upgrade " +
    "indexes (no _meta) report fraction -1 but still measure") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val path = java.nio.file.Files.createTempDirectory("graft_driftpq").toString
    dropIdx("graft_drift_ivfpq")
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", 16, 2,
      4, 16, 16, 2, "graft_drift_ivfpq", s"$path/ivfpq")
    val rep = Similarity.driftReport(spark, "graft_drift_ivfpq", emb,
      "vec_id", "embedding", k = 5, nCells = 16, nProbes = 3,
      recallFloor = 0.0, sampleEvery = 50, pq = Some((4, 16, 16, 20)))
    // IVF-PQ absolute recall is shortlist-bound (r8 probe: ≈0.19 at
    // shortlist 20 on the isotropic corpus) — assert it measures, not
    // that it is high
    assert(rep.sampledQueries > 0 && rep.recallAtK > 0.0, s"pq recall: $rep")
    assert(rep.appendedFraction == 0.0)
    // simulate a pre-upgrade index: drop only the meta table
    spark.sql("DROP TABLE graft_drift_ivfpq_meta")
    val legacy = Similarity.driftReport(spark, "graft_drift_ivfpq", emb,
      "vec_id", "embedding", k = 5, nCells = 16, nProbes = 3,
      recallFloor = 0.0, sampleEvery = 50, pq = Some((4, 16, 16, 20)))
    assert(legacy.appendedFraction == -1.0, s"legacy fraction: $legacy")
    assert(legacy.recallAtK == rep.recallAtK)
    dropIdx("graft_drift_ivfpq")
  }
}
