package graft.operators

import graft.SparkSpec

/** Materialized IVF index (SURVEY.md §5): probing a cell-bucketed index
  * table must (a) reproduce ivfTopK bit-for-bit and (b) get the corpus
  * distribution from the bucketed layout — the probe join shuffles only
  * the probe side. */
class IvfIndexSpec extends SparkSpec {

  test("probeIvfIndex equals ivfTopK bit-for-bit; corpus never re-shuffles") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter("vec_id % 100 = 0")
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString

    spark.sql("DROP TABLE IF EXISTS graft_ivf_index")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_index_centroids")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", 16,
      "graft_ivf_index", s"$path/ivf")

    val direct = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5, 16, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val probed = Similarity.probeIvfIndex(spark, "graft_ivf_index", q,
      "vec_id", "embedding", 5, 16, 3)
    val probedRes = probed
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(probedRes == direct)
    assert(probedRes.nonEmpty)

    // plan proof: disable auto-broadcast so the probe join takes the
    // shuffle path (tiny sf0.01 sides would otherwise broadcast; the
    // centroid joins stay broadcast — they are explicit) — the bucketed
    // corpus contributes its layout, so the only hash exchanges are the
    // probe side and the final top-k window
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.probeIvfIndex(spark, "graft_ivf_index", q,
          "vec_id", "embedding", 5, 16, 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"corpus scan not bucketed:\n$plan")
      // exactly ONE exchange on the cell key — the probe side aligning to
      // the corpus layout. A non-bucketed corpus would add a second.
      val cellExchanges = "hashpartitioning\\(__cell".r.findAllIn(plan).size
      assert(cellExchanges == 1, s"corpus re-shuffled on the cell key:\n$plan")
      // the remaining exchanges are probe-side query_id windows
      val other = "Exchange hashpartitioning\\(query_id".r.findAllIn(plan).size
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == cellExchanges + other)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE graft_ivf_index")
    spark.sql("DROP TABLE graft_ivf_index_centroids")
  }

  test("trained-codebook index: probe via the persisted centroids equals ivfTopK") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter("vec_id % 100 = 0")
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_km").toString

    spark.sql("DROP TABLE IF EXISTS graft_ivf_km")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_km_centroids")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", 16,
      "graft_ivf_km", s"$path/ivf", kmeansIters = 2)

    // the codebook table is the trained centroids — ids are NOT corpus
    // vectors anymore, so probes MUST read it; probeIvfIndex auto-detects
    // the persisted <table>_centroids, so no flag can be passed wrong
    val direct = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5, 16, 3,
        kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val probed = Similarity.probeIvfIndex(spark, "graft_ivf_km", q,
        "vec_id", "embedding", 5, 16, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(probed == direct)
    assert(probed.nonEmpty)
    spark.sql("DROP TABLE graft_ivf_km")
    spark.sql("DROP TABLE graft_ivf_km_centroids")
  }
}
