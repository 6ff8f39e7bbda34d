package graft.operators

import graft.SparkSpec

/** Materialized PQ / IVF∘PQ indexes: probing must (a) reproduce the
  * in-query operators bit-for-bit, (b) pay ZERO training/encoding — the
  * probe plan reads the persisted code tables and touches raw corpus
  * vectors only in the shortlist rerank, and (c) for IVF∘PQ, read the
  * codes through their cell-bucketed layout (no code-side exchange). */
class PqIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def q = emb.filter("vec_id % 100 = 0")
  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet

  test("probePqIndex equals pqTopK bit-for-bit; probe scans raw vectors only for rerank") {
    val path = java.nio.file.Files.createTempDirectory("graft_pq").toString
    spark.sql("DROP TABLE IF EXISTS graft_pq_index")
    spark.sql("DROP TABLE IF EXISTS graft_pq_index_codebooks")
    Similarity.buildPqIndex(emb, "vec_id", "embedding", 4, 16, 16, 2,
      "graft_pq_index", s"$path/pq")

    val direct = rows(Similarity.pqTopK(q, emb, "vec_id", "embedding",
      k = 5, nSub = 4, subDim = 16, kPerSub = 16, kmeansIters = 2, shortlist = 20))
    val probed = Similarity.probePqIndex(spark, "graft_pq_index", q, emb,
      "vec_id", "embedding", k = 5, nSub = 4, subDim = 16, kPerSub = 16,
      shortlist = 20)
    assert(rows(probed) == direct)
    assert(direct.nonEmpty)

    // plan proof of the amortization claim: the probe never re-trains or
    // re-encodes — every scan in the plan is either an index table, the
    // query-side slice, or the ONE rerank read of the raw corpus. The raw
    // embeddings file feeds exactly 2 scans (queries are a filtered slice
    // of the same file here): more would mean the corpus is being
    // re-encoded in-query. Inspected on a FRESH frame — an executed AQE
    // plan prints final + initial and double-counts every scan.
    val plan = Similarity.probePqIndex(spark, "graft_pq_index", q, emb,
        "vec_id", "embedding", k = 5, nSub = 4, subDim = 16, kPerSub = 16,
        shortlist = 20)
      .queryExecution.executedPlan.toString
    val rawScans = "embeddings\\.parquet".r.findAllIn(plan).size
    assert(rawScans == 2, s"expected 2 raw-vector scans (queries + rerank), got $rawScans:\n$plan")
    assert(plan.contains("graft_pq_index"), s"probe does not read the codes table:\n$plan")
    spark.sql("DROP TABLE graft_pq_index")
    spark.sql("DROP TABLE graft_pq_index_codebooks")
  }

  test("ivfPqTopK with nProbes = nCells equals pqTopK exactly (IVF only prunes cells)") {
    val full = rows(Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
      k = 5, nCells = 16, nProbes = 16, coarseIters = 2,
      nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2, shortlist = 20))
    val pq = rows(Similarity.pqTopK(q, emb, "vec_id", "embedding",
      k = 5, nSub = 4, subDim = 16, kPerSub = 16, kmeansIters = 2, shortlist = 20))
    assert(full == pq)
    assert(full.nonEmpty)
  }

  test("probeIvfPqIndex equals ivfPqTopK bit-for-bit; codes read bucketed, no code-side exchange") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    spark.sql("DROP TABLE IF EXISTS graft_ivfpq_index")
    spark.sql("DROP TABLE IF EXISTS graft_ivfpq_index_centroids")
    spark.sql("DROP TABLE IF EXISTS graft_ivfpq_index_codebooks")
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCells = 16, coarseIters = 2, nSub = 4, subDim = 16, kPerSub = 16,
      pqIters = 2, "graft_ivfpq_index", s"$path/ivfpq")

    val direct = rows(Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
      k = 5, nCells = 16, nProbes = 3, coarseIters = 2,
      nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2, shortlist = 20))
    val probed = Similarity.probeIvfPqIndex(spark, "graft_ivfpq_index", q, emb,
      "vec_id", "embedding", k = 5, nProbes = 3, nSub = 4, subDim = 16,
      kPerSub = 16, shortlist = 20)
    assert(rows(probed) == direct)
    assert(direct.nonEmpty)

    // layout proof: the (query, probed-cell) side is explicitly BROADCAST
    // — the query batch is small by assumption — so the cell-keyed scan
    // needs NO exchange at all on either side, even with auto-broadcast
    // off: the codes stream through map-side. Stronger than the
    // probeIvfIndex shape (one probe-side exchange aligning to the
    // bucketed layout).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.probeIvfPqIndex(spark, "graft_ivfpq_index", q, emb,
          "vec_id", "embedding", k = 5, nProbes = 3, nSub = 4, subDim = 16,
          kPerSub = 16, shortlist = 20)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"codes scan not bucketed:\n$plan")
      val cellExchanges = "hashpartitioning\\(__cell".r.findAllIn(plan).size
      assert(cellExchanges == 0, s"cell-key exchange in the probe plan:\n$plan")
      // raw vectors: the query slice twice (cell probes + ADC tables —
      // both tiny, filter-pushed) + the ONE rerank read. The codes table,
      // not the corpus, feeds the ADC scan.
      val rawScans = "embeddings\\.parquet".r.findAllIn(plan).size
      assert(rawScans == 3, s"expected 3 raw-vector scans (2 query-slice + rerank), got $rawScans:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE graft_ivfpq_index")
    spark.sql("DROP TABLE graft_ivfpq_index_centroids")
    spark.sql("DROP TABLE graft_ivfpq_index_codebooks")
  }

  test("appendToIvfPqIndex: O(batch) adds against the frozen geometry; probe stays exact") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    Seq("", "_centroids", "_codebooks").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS graft_ivfpq_app$s"))
    // build on the first 80% of the corpus, append the remaining 20%
    val base = emb.filter("vec_id < 400")
    val batch = emb.filter("vec_id >= 400")
    Similarity.buildIvfPqIndex(base, "vec_id", "embedding",
      nCells = 16, coarseIters = 2, nSub = 4, subDim = 16, kPerSub = 16,
      pqIters = 2, "graft_ivfpq_app", s"$path/ivfpq")
    Similarity.appendToIvfPqIndex(spark, "graft_ivfpq_app", batch,
      "vec_id", "embedding", nSub = 4, subDim = 16, kPerSub = 16)
    assert(spark.table("graft_ivfpq_app").count() == 500)

    // EXACTNESS independent of geometry: probing every cell with a
    // corpus-sized shortlist makes the exact-cosine rerank see every
    // candidate, so the result must equal brute-force kNN over the FULL
    // corpus — appended rows included — whatever the 80%-trained cells
    // and codebooks look like
    def rows4(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val probed = rows4(Similarity.probeIvfPqIndex(spark, "graft_ivfpq_app", q, emb,
      "vec_id", "embedding", k = 5, nProbes = 16, nSub = 4, subDim = 16,
      kPerSub = 16, shortlist = 600))
    val truth = rows4(Similarity.knnBruteForce(q, emb, "vec_id", "embedding", 5))
    assert(probed == truth)
    assert(truth.nonEmpty)
    // a query next to an appended vector finds it: vec 450 queried
    // against the index must return itself's nearest — sanity that the
    // appended codes actually live in probed cells
    val selfQ = emb.filter("vec_id = 450")
    val got = Similarity.probeIvfPqIndex(spark, "graft_ivfpq_app", selfQ, emb,
      "vec_id", "embedding", k = 5, nProbes = 16, nSub = 4, subDim = 16,
      kPerSub = 16, shortlist = 600)
    assert(got.count() == 5)
    Seq("", "_centroids", "_codebooks").foreach(s =>
      spark.sql(s"DROP TABLE graft_ivfpq_app$s"))
  }

  test("residual IVF-PQ index: probe equals ivfPqResidualTopK bit-for-bit, " +
    "codes stay bucketed/exchange-free, appends stay exact") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpqr").toString
    Seq("", "_centroids", "_codebooks").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS graft_ivfpqr_idx$s"))
    val base = emb.filter("vec_id < 400")
    val batch = emb.filter("vec_id >= 400")
    Similarity.buildIvfPqResidualIndex(base, "vec_id", "embedding",
      nCells = 16, coarseIters = 2, nSub = 4, subDim = 16, kPerSub = 16,
      pqIters = 2, "graft_ivfpqr_idx", s"$path/ivfpqr")
    // probe ≡ the in-query operator at the same geometry (over the base)
    val direct = rows(Similarity.ivfPqResidualTopK(q, base, "vec_id", "embedding",
      k = 5, nCells = 16, nProbes = 3, coarseIters = 2,
      nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2, shortlist = 20))
    val probed = Similarity.probeIvfPqResidualIndex(spark, "graft_ivfpqr_idx",
      q, base, "vec_id", "embedding", k = 5, nProbes = 3, nSub = 4,
      subDim = 16, kPerSub = 16, shortlist = 20)
    assert(rows(probed) == direct)
    assert(direct.nonEmpty)
    // same plan contract as the raw kind: bucketed codes, zero cell-key
    // exchanges even with auto-broadcast off
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.probeIvfPqResidualIndex(spark, "graft_ivfpqr_idx",
          q, base, "vec_id", "embedding", k = 5, nProbes = 3, nSub = 4,
          subDim = 16, kPerSub = 16, shortlist = 20)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"codes scan not bucketed:\n$plan")
      val cellExchanges = "hashpartitioning\\(__cell".r.findAllIn(plan).size
      assert(cellExchanges == 0, s"cell-key exchange in the probe plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // append against the frozen geometry; every-cell probe with a
    // corpus-sized shortlist must equal brute force over the union —
    // the exact rerank sees every candidate whatever the codes look like
    Similarity.appendToIvfPqResidualIndex(spark, "graft_ivfpqr_idx", batch,
      "vec_id", "embedding", nSub = 4, subDim = 16, kPerSub = 16)
    assert(spark.table("graft_ivfpqr_idx").count() == emb.count())
    def rows4(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val all = rows4(Similarity.probeIvfPqResidualIndex(spark, "graft_ivfpqr_idx",
      q, emb, "vec_id", "embedding", k = 5, nProbes = 16, nSub = 4,
      subDim = 16, kPerSub = 16, shortlist = 600))
    val truth = rows4(Similarity.knnBruteForce(q, emb, "vec_id", "embedding", 5))
    assert(all == truth)
    Seq("", "_centroids", "_codebooks").foreach(s =>
      spark.sql(s"DROP TABLE graft_ivfpqr_idx$s"))
  }

  test("appendToIvfIndex: appended postings land bucketed; all-cells probe stays exact") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    Seq("", "_centroids").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS graft_ivf_app$s"))
    Similarity.buildIvfIndex(emb.filter("vec_id < 400"), "vec_id", "embedding",
      nCells = 16, "graft_ivf_app", s"$path/ivf", kmeansIters = 2)
    Similarity.appendToIvfIndex(spark, "graft_ivf_app",
      emb.filter("vec_id >= 400"), "vec_id", "embedding")
    assert(spark.table("graft_ivf_app").count() == 500)
    def rows4(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val probed = rows4(Similarity.probeIvfIndex(spark, "graft_ivf_app", q,
      "vec_id", "embedding", 5, nCells = 16, nProbes = 16))
    val truth = rows4(Similarity.knnBruteForce(q, emb, "vec_id", "embedding", 5))
    assert(probed == truth && truth.nonEmpty)
    Seq("", "_centroids").foreach(s => spark.sql(s"DROP TABLE graft_ivf_app$s"))
  }

  test("s5 recall vs brute force at nProbes=3/16 (deterministic floor)") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.knnBruteForce(q, emb, "vec_id", "embedding", 5))
    val got = pairs(Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
      k = 5, nCells = 16, nProbes = 3, coarseIters = 2,
      nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2, shortlist = 20))
    val recall = (truth & got).size.toDouble / truth.size
    // uniform-random 64-dim vectors are PQ's hardest case, and cell
    // pruning stacks on top; deterministic pipeline → not flaky
    assert(recall >= 0.2, s"IVF-PQ recall $recall below floor")
  }
}
