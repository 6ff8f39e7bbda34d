package graft

/** Results must not depend on the parallelism: the same query collected
  * under different `spark.sql.shuffle.partitions` (and thus different
  * partial-aggregation groupings, shuffle orders, and task counts) must be
  * bit-identical — the property that lets the identical code run on
  * local[4] and a 1000-executor cluster. This is the executable form of
  * SURVEY §4's determinism rules (DECIMAL/integer aggregation, fixed-order
  * double folds, total ORDER BY): any operator that slipped an
  * order-sensitive double sum or an untied window would fail here.
  *
  * Keys chosen to cover the risk surface: decimal aggregation (q1),
  * double cosine folds + k-means training (s3, s4), banded minhash +
  * verify (d3), fixed-point simhash aggregate (d4), greedy sequential
  * fold (p3), two-level prefix sums (p6), maintained-aggregate algebra
  * (q26), interpreted HOF scoring (t9).
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val keys = Seq(
    "q1_pricing_summary", "d3_dedup_minhash", "d4_dedup_simhash",
    "s3_knn_ivf", "s4_knn_pq", "p3_pack_sequences", "p6_mix_interleave",
    "q26_incremental_rollup", "t9_quality_classifier",
    "d11_fuzzy_join", "m3_multimodal_frames")

  test("results are bit-identical under different shuffle partition counts") {
    val conf = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(conf)
    def collectAll(n: String): Seq[Seq[Any]] =
      SparkEntry.queries(n)(spark, dir).collect().map(_.toSeq).toSeq
    try {
      keys.foreach { k =>
        spark.conf.set(conf, "3")
        val a = collectAll(k)
        spark.conf.set(conf, "13")
        val b = collectAll(k)
        assert(a.nonEmpty, s"$k: empty result")
        assert(a == b, s"$k: result depends on shuffle partition count")
      }
    } finally spark.conf.set(conf, prev)
  }
}
