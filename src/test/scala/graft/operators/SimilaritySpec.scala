package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),  // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 1
    (4L, Array(0.0f, 0.9f, 0.1f)),  // close to 3
    (5L, Array(-1.0f, 0.0f, 0.0f))  // opposite of 1
  ).toDF("vec_id", "embedding")

  test("cosinePairs returns exactly the ≥ threshold pairs") {
    val out = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .orderBy("ida", "idb").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 4L)))
    val c12 = out(0).getDouble(2)
    assert(math.abs(c12 - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-6)
  }

  test("trained centroids keep cell-pruned pairs exact AND reduce cell skew") {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactness is centroid-independent (triangle-inequality pruning)
    val exact   = res(Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4))
    val trained = res(Similarity.cosinePairsCellPruned(emb, "vec_id", "embedding", 0.4, 16,
      kmeansIters = 2))
    assert(trained == exact)
    // the point of training: bounded cell skew. max/mean cell size is the
    // probe-cost amplification factor at scale — Lloyd rounds must not
    // make it worse than the data-layout-luck seed cells, and on this
    // corpus they visibly tighten it.
    import org.apache.spark.sql.functions.{col, count, lit}
    def maxMeanRatio(iters: Int): Double = {
      val cent = Similarity.trainCentroids(emb, "vec_id", "embedding", 16, iters)
      val n = emb.select(col("vec_id"), col("embedding"),
        graft.functions.VectorFunctions.norm2(col("embedding")).as("__n2"))
      val sizes = n.join(org.apache.spark.sql.functions.broadcast(cent))
        .select(col("vec_id"), col("__cid"),
          graft.functions.VectorFunctions.cosineFromNorms(
            graft.functions.VectorFunctions.dotD(col("embedding"), col("__cv")),
            col("__n2"), col("__cn2")).as("__ccos"))
        .groupBy(col("vec_id"))
        .agg(org.apache.spark.sql.functions.max_by(col("__cid"),
          org.apache.spark.sql.functions.struct(col("__ccos"), -col("__cid"))).as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1).toDouble)
      sizes.max / (sizes.sum / sizes.length)
    }
    val before = maxMeanRatio(0)
    val after = maxMeanRatio(2)
    info(f"max/mean cell ratio: seed $before%.2f -> trained $after%.2f")
    assert(after < before, s"training worsened cell balance: $before -> $after")
  }

  test("cosinePairsCellPruned equals the all-pairs formulation bit-for-bit") {
    val dir = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("ida", "idb", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact  = res(Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4))
    val pruned = res(Similarity.cosinePairsCellPruned(emb, "vec_id", "embedding", 0.4, 16))
    assert(pruned.keySet == exact.keySet,
      s"missed=${(exact.keySet -- pruned.keySet).take(5)} extra=${(pruned.keySet -- exact.keySet).take(5)}")
    // the verify step recomputes the same expression on the same vectors —
    // cosines must be bit-identical, or the oracle hash would diverge
    exact.foreach { case (k, v) => assert(pruned(k) == v, s"cos mismatch at $k") }
    assert(exact.nonEmpty)
  }

  test("cosinePairsCellPruned plans equi-joins, not an all-pairs theta join") {
    val dir = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val df = Similarity.cosinePairsCellPruned(emb, "vec_id", "embedding", 0.4, 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // nested-loop joins may only be centroid fan-outs (nCells-row build
    // side: the vector→centroid assignment — same shape as s3 — and the
    // centroid×centroid pair table); the PAIR-producing join must be an
    // equi-join on the cell with ida < idb as a post-condition, never a
    // nested loop over the ids
    val nljLines = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(nljLines.forall(l => !l.contains("ida") && !l.contains("idb")),
      s"id-theta nested loop in plan:\n${nljLines.mkString("\n")}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("knnBruteForce ranks by cosine desc, excludes self, ties break by id") {
    val q = vecs.filter("vec_id = 1")
    val out = Similarity.knnBruteForce(q, vecs, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1, 2L), (2, 3L), (3, 4L)))
    assert(out.forall(r => r.getLong(0) == 1L))
    assert(out(0).getDouble(3) > out(1).getDouble(3))
  }

  test("knnBruteForce caps at k and covers every query") {
    val q = vecs.filter("vec_id in (1, 3)")
    val out = Similarity.knnBruteForce(q, vecs, "vec_id", "embedding", 2)
      .collect()
    val byQuery = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byQuery == Map(1L -> 2, 3L -> 2))
  }

  test("lshTopK recall vs brute force on real embeddings (worst-case data)") {
    // uniform-random vectors are LSH's hardest case (all neighbors at
    // 60-70°); deterministic planes make this exact, not flaky
    val dir = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter("vec_id % 100 = 0")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.knnBruteForce(q, emb, "vec_id", "embedding", 5))
    val got = pairs(Similarity.lshTopK(q, emb, "vec_id", "embedding", 5))
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.4, s"LSH recall $recall below floor")
  }

  test("ivfTopK: exact within probed cells, recall floor on real embeddings") {
    val dir = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter("vec_id % 100 = 0")
    def byQuery(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val truth = byQuery(Similarity.knnBruteForce(q, emb, "vec_id", "embedding", 5))
    val got = byQuery(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5, 16, 3))
    // every IVF cosine equals the brute-force cosine bit-for-bit (the
    // rerank is exact — IVF only restricts the candidate set)
    got.foreach { case (pair, cos) =>
      truth.get(pair).foreach(t => assert(t == cos, s"$pair cos mismatch")) }
    val recall = (truth.keySet & got.keySet).size.toDouble / truth.size
    // nprobe/nCells = 3/16 of the corpus scanned; uniform-random vectors
    // are the worst case, deterministic so not flaky
    assert(recall >= 0.3, s"IVF recall $recall below floor")
    // never exceeds k, ranks contiguous from 1
    val ranks = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5, 16, 3)
      .collect().groupBy(_.getLong(0)).values
    assert(ranks.forall(_.length <= 5))
    assert(ranks.forall(_.map(_.getInt(1)).sorted.zipWithIndex.forall {
      case (r, i) => r == i + 1 }))
  }

  test("ivfTopK with nProbes = nCells equals brute force exactly") {
    // probing every cell removes the approximation entirely — the IVF
    // plumbing (assignment, probe, rerank) must then reproduce s1
    val dim3 = vecs // 5 tiny vectors, 4 cells > corpus cells in use
    val q = dim3.filter("vec_id in (1, 3)")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bf  = res(Similarity.knnBruteForce(q, dim3, "vec_id", "embedding", 3))
    val ivf = res(Similarity.ivfTopK(q, dim3, "vec_id", "embedding", 3, 4, 4))
    assert(ivf == bf)
  }

  test("lshTopK only pairs within a bucket and never exceeds k") {
    val dim64 = (id: Long, seed: Int) =>
      (id, Array.tabulate(64)(d => (((seed * 31 + d * 7) % 13) - 6) / 6.0f))
    val corpus = (1L to 40L).map(i => dim64(i, i.toInt)).toDF("vec_id", "embedding")
    val queries = corpus.filter("vec_id % 10 = 0")
    val out = Similarity.lshTopK(queries, corpus, "vec_id", "embedding", 3)
      .collect()
    assert(out.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    // identical vector always lands in the query's own bucket: a duplicate
    // of a query vector must be retrievable
    val dup = corpus.union(Seq(dim64(1000L, 10)).toDF("vec_id", "embedding"))
    val hit = Similarity.lshTopK(dup.filter("vec_id = 10"), dup, "vec_id", "embedding", 3)
      .collect().map(_.getLong(2))
    assert(hit.contains(1000L))
  }

  test("semDedup clusters within-cell dups, keeps the least-central member") {
    // centroids (kmeansIters = 0) seed from the 2 lowest ids: cells around
    // the x-axis (id 1) and the y-axis (id 2)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.99f, 0.14f, 0.0f)),  // x-cell, near-dup of 1 and 4
      (4L, Array(0.95f, 0.31f, 0.0f)),  // x-cell, the least x-aligned dup
      (5L, Array(0.0f, 0.98f, 0.2f)),   // y-cell, near-dup of 2
      (6L, Array(0.0f, -1.0f, 0.1f))    // y-cell (|cos|, no dup partner)
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, "vec_id", "embedding", 0.95, 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // x-cell: {1,3,4} one cluster (1~3, 3~4 chain; 1~4 below thr is fine —
    // components close the chain); keeper = 4, the least centroid-similar
    assert(out(0) == ((1L, 1L, 3L, 0L)))
    assert(out(2) == ((3L, 1L, 3L, 0L)))
    assert(out(3) == ((4L, 1L, 3L, 1L)))
    // y-cell: {2,5} cluster, 5 keeps (farther from the y centroid); 6 is a
    // singleton that keeps itself
    assert(out(1) == ((2L, 2L, 2L, 0L)))
    assert(out(4) == ((5L, 2L, 2L, 1L)))
    assert(out(5) == ((6L, 6L, 1L, 1L)))
  }

  test("semDedup never pairs across cells; exactly one keeper per cluster") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val out = Similarity.semDedup(emb, "vec_id", "embedding", 0.4, 16,
      kmeansIters = 2)
    val rows = out.collect()
    assert(rows.length == emb.count()) // one row per vector, always
    // exactly one keep per cluster_id
    val perCluster = rows.groupBy(_.getLong(2))
    assert(perCluster.values.forall(g => g.count(_.getLong(4) == 1L) == 1))
    // cluster members all share the keeper's cell (within-cell pairing
    // can never chain across cells)
    assert(perCluster.values.forall(g => g.map(_.getLong(1)).toSet.size == 1))
    // sizes are consistent
    assert(perCluster.values.forall(g => g.forall(_.getLong(3) == g.length)))
  }

  test("pqTopK: exact rerank cosines, recall floor, and 16x code compression") {
    val dir = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter("vec_id % 100 = 0")
    def byQuery(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val truth = byQuery(Similarity.knnBruteForce(q, emb, "vec_id", "embedding", 5))
    val out = Similarity.pqTopK(q, emb, "vec_id", "embedding",
      k = 5, nSub = 4, subDim = 16, kPerSub = 16, kmeansIters = 2, shortlist = 20)
    val got = byQuery(out)
    // the rerank is exact: any returned pair's cosine equals brute force
    got.foreach { case (pair, cos) =>
      truth.get(pair).foreach(t => assert(t == cos, s"$pair cos mismatch")) }
    // 4 subspaces × 16 centroids on uniform-random 64-dim vectors is the
    // hardest case for PQ; deterministic, so the floor is not flaky
    val recall = (truth.keySet & got.keySet).size.toDouble / truth.size
    assert(recall >= 0.3, s"PQ recall $recall below floor")
    // the codes really are nSub small ints per vector — the 16× memory
    // claim (4 byte-class codes vs 64 floats) — and rn2 is positive
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding",
      Similarity.trainPqCodebooks(emb, "vec_id", "embedding", 4, 16, 16, 2), 4, 16)
      .collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 16))
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("ivfPqResidualTopK: exact rerank cosines and recall floor on real " +
    "embeddings") {
    val dir = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter("vec_id % 100 = 0")
    def byQuery(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val truth = byQuery(Similarity.knnBruteForce(q, emb, "vec_id", "embedding", 5))
    val out = Similarity.ivfPqResidualTopK(q, emb, "vec_id", "embedding",
      k = 5, nCells = 16, nProbes = 3, coarseIters = 2,
      nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2, shortlist = 20)
    val rows = out.collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // the rerank is exact: any returned pair's cosine equals brute force
    got.foreach { case (pair, cos) =>
      truth.get(pair).foreach(t => assert(t == cos, s"$pair cos mismatch")) }
    val recall = (truth.keySet & got.keySet).size.toDouble / truth.size
    assert(recall >= 0.3, s"residual IVF-PQ recall $recall below floor")
  }

  test("by_residual earns its keep on CLUSTERED data: residual ADC " +
    "tracks true cosine strictly better than raw at identical geometry") {
    // The sf embeddings are uniform-random — the one distribution where
    // residuals are no tighter than raw vectors (measured: raw slightly
    // ahead there), so the faiss-default claim is asserted where it
    // actually applies: clustered data, the case IVF exists for.
    // Deterministic integer-hash noise around 8 well-separated centers.
    import spark.implicits._
    val dim = 64
    val clustered = (0 until 400).map { id =>
      val c = id % 8
      val v = (0 until dim).map { d =>
        val center = if (d % 8 == c) 10.0f else 0.0f
        val h = ((id.toLong * 1315423911L + d.toLong * 2654435761L) % 1000L + 1000L) % 1000L
        center + (h.toFloat / 1000.0f - 0.5f)
      }.toArray
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
    val q = clustered.filter("vec_id % 40 = 0")
    def adcErr(df: org.apache.spark.sql.DataFrame): Double = {
      val rs = df.select("cos", "adc_cos").collect()
      rs.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).sum / rs.length
    }
    // every cell probed, so both scans see every candidate — the only
    // difference is what the codes reconstruct
    val resAll = Similarity.ivfPqResidualTopK(q, clustered, "vec_id", "embedding",
      k = 5, nCells = 8, nProbes = 8, coarseIters = 2,
      nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2, shortlist = 20)
    val rawAll = Similarity.ivfPqTopK(q, clustered, "vec_id", "embedding",
      k = 5, nCells = 8, nProbes = 8, coarseIters = 2,
      nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2, shortlist = 20)
    val (eRes, eRaw) = (adcErr(resAll), adcErr(rawAll))
    assert(eRes < eRaw,
      s"residual ADC error $eRes not better than raw $eRaw on clustered data")
  }

  test("ground-truth RECALL on clustered data at 10x: residual IVF-PQ " +
    "matches-or-beats raw at EQUAL nProbes and geometry (SCALING.md row)") {
    // The round-17 ask: a recall@k number beside the ADC-fidelity number,
    // measured on the distribution the operator exists for (clustered),
    // at 10x the fidelity test's frame. Both variants rerank exactly, so
    // recall differs only through WHICH candidates the ADC shortlist
    // keeps — tighter residual codes keep more true neighbors. Partial
    // probing (4 of 16 cells) and a tight shortlist make the selection
    // pressure real. Deterministic data, deterministic result.
    import spark.implicits._
    val dim = 64
    val n = 4000 // 10x the fidelity test's 400
    val clustered = (0 until n).map { id =>
      val c = id % 16
      val v = (0 until dim).map { d =>
        val center = if (d % 16 == c) 10.0f else 0.0f
        val h = ((id.toLong * 1315423911L + d.toLong * 2654435761L) % 1000L + 1000L) % 1000L
        center + (h.toFloat / 1000.0f - 0.5f)
      }.toArray
      (id.toLong, v)
    }.toDF("vec_id", "embedding").cache()
    val q = clustered.filter("vec_id % 200 = 0") // 20 queries
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(
      Similarity.knnBruteForce(q, clustered, "vec_id", "embedding", 5))
    val res = pairs(Similarity.ivfPqResidualTopK(q, clustered,
      "vec_id", "embedding", k = 5, nCells = 16, nProbes = 4,
      coarseIters = 2, nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2,
      shortlist = 10))
    val raw = pairs(Similarity.ivfPqTopK(q, clustered,
      "vec_id", "embedding", k = 5, nCells = 16, nProbes = 4,
      coarseIters = 2, nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2,
      shortlist = 10))
    val resRecall = (truth & res).size.toDouble / truth.size
    val rawRecall = (truth & raw).size.toDouble / truth.size
    info(f"RecallProbe clustered 10x: s6(residual) recall@5 = " +
      f"$resRecall%.3f, s5(raw) recall@5 = $rawRecall%.3f " +
      f"(n=$n, nCells=16, nProbes=4, shortlist=10)")
    clustered.unpersist()
    assert(resRecall >= rawRecall,
      s"residual recall $resRecall below raw $rawRecall on clustered data " +
        "at equal probes/geometry")
    assert(resRecall >= 0.5, s"residual recall $resRecall below floor")
  }

  test("PQ rejects vectors whose dim doesn't match nSub x subDim") {
    // 3-dim vectors into a 2x2 config: slicing would silently produce
    // short subvectors and plausible-but-wrong neighbors — must raise
    val e = intercept[Exception] {
      Similarity.pqTopK(vecs, vecs, "vec_id", "embedding",
        k = 2, nSub = 2, subDim = 2, kPerSub = 2, kmeansIters = 1,
        shortlist = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("expected vector dim 4")))
  }
}
