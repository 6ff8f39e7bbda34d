package graft

/** Executable plan audits (SURVEY.md §5): the physical-plan properties the
  * 100 TB design depends on, asserted so regressions fail the build —
  * pushdown reaching the parquet scan, column pruning, broadcast sides,
  * shuffle counts.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    // q32 reads through the graft_table TVF by catalog name — the audit
    // sweep runs every key, so the functions must exist on this session
    graft.plans.GraftExtensions.install(spark)
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: shipdate filter and 7-column projection push to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema: struct<l_quantity"))
    assert(!p.contains("l_orderkey")) // untouched columns never read
    assert(!p.contains("l_comment"))
  }

  test("q10 star join: every dimension broadcasts, fact is never shuffled pre-agg") {
    val p = plan("q10_star_join")
    assert(p.split("BroadcastHashJoin").length - 1 == 3)
    assert(!p.contains("SortMergeJoin"))
    // the only exchanges: the aggregate's own shuffle + final ordering
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("s1 knn: the query set is the broadcast build side, not the corpus") {
    val p = plan("s1_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin BuildLeft"))
    // partial top-k runs before the shuffle (WindowGroupLimit pushdown)
    assert(p.contains("WindowGroupLimit"))
  }

  test("q13 sessionize: one shuffle on the session key, windows run within it") {
    val p = plan("q13_sessionize")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("q14 as-of join: union+window formulation shuffles each side once") {
    val p = plan("q14_asof_join")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q3 incremental merge: one key-equi join, no nested loops") {
    val p = plan("q3_incremental_merge")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // full-outer merge on the key: each side shuffles at most once
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2)
  }

  test("q4 scd2 history: change detection stays on the business-key shuffle") {
    val p = plan("q4_scd2_history")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("d2 posting join: keys are 8-byte hashes, not shingle strings") {
    val p = plan("d2_dedup_ngram")
    // the one-pass native hasher emits (pos, hash) structs — the posting
    // join keys are its 55-bit longs; no shingle STRING ever materializes
    assert(p.contains("graft_window_hashes"))
    assert(!p.contains("concat_ws"))
  }

  test("q15 range join: bucketed equi-join, never a nested loop / cartesian") {
    val p = plan("q15_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q16 running windows: all frames share ONE shuffle on the customer key") {
    val p = plan("q16_window_running")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("q17 percentile: rank windows and final aggregate share the group-key shuffle") {
    val p = plan("q17_percentile")
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("q18: both joins plan as hash/merge semi + anti, no nested loops") {
    val p = plan("q18_semi_anti")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q19 pivot: broadcast dim, two-phase pivot shuffles only aggregated groups") {
    val p = plan("q19_pivot")
    assert(p.contains("BroadcastHashJoin"))
    // phase 1 groupBy(segment,status) is the only data-sized shuffle (with
    // map-side partials); phase 2 (PivotFirst) re-shuffles just the
    // |segments|·|statuses| group rows
    assert(p.split("Exchange hashpartitioning").length - 1 == 2)
    assert(p.contains("pivotfirst") || p.contains("PivotFirst"))
  }

  test("s3 ivf: only the 16-row centroid table nested-loops; rerank is an equi-join") {
    val p = plan("s3_knn_ivf")
    assert(!p.contains("CartesianProduct"))
    // exactly two broadcast-nested-loops: corpus×centroids, queries×centroids
    assert(p.split("BroadcastNestedLoopJoin").length - 1 == 2)
  }

  test("d2b capped: the over-cap shingle set broadcasts into a left-anti join") {
    // the shipped query checkpoints the filtered postings (hiding the
    // subtree), so audit the identical un-checkpointed plan
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.operators.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, Some(5L), checkpointPostings = false)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
  }

  test("q22 reconcile: one full-outer key join, no nested loops") {
    val p = plan("q22_reconcile")
    assert(p.contains("FullOuter"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q23 profile: per-column branches, each scan pruned to its own column") {
    val p = plan("q23_profile")
    assert(!p.contains("Join"))
    // every branch's parquet scan reads exactly one column — the reason
    // the per-column union costs the same bytes as one wide scan
    val scans = p.split("FileScan parquet ").drop(1).map(_.takeWhile(_ != ']'))
    assert(scans.length == 5, s"expected 5 pruned scans:\n$p")
    assert(scans.forall(s => !s.contains(",")), s"scan reads >1 column: ${scans.mkString(" | ")}")
    // no branch sort-aggregates on a composite all-columns key (the
    // failure mode of the wide multi-distinct formulation)
    assert(!p.contains("o_orderkey#0L ASC NULLS FIRST, o_totalprice"))
  }

  test("t11/t13: the native tokenizer runs inside the plan (no UDF), and " +
    "t13's vocabulary join broadcasts") {
    val p11 = plan("t11_bpe_tokenize")
    assert(p11.contains("graft_bpe_tokens"),
      s"expected the native BPE expression:\n$p11")
    assert(!p11.contains("BatchEvalPython") && !p11.contains("ScalaUDF"))
    val p13 = plan("t13_bpe_ids")
    // t13 materializes the tokenized frame once (three consumers), so
    // the final plan reads the checkpoint (Scan ExistingRDD) — the
    // native-expression invariant shows as the checkpoint scan carrying
    // the toks column with no Python/UDF node anywhere
    assert(p13.contains("ExistingRDD") && p13.contains("toks"),
      s"expected the materialized token frame:\n$p13")
    assert(!p13.contains("BatchEvalPython") && !p13.contains("ScalaUDF"))
    // the rank vocabulary is metadata-scale: it must broadcast into the
    // position-exploded corpus, never shuffle the corpus side for it
    assert(p13.contains("BroadcastHashJoin"),
      s"vocabulary join must broadcast:\n$p13")
    assert(!p13.contains("SortMergeJoin"), p13)
  }

  test("t5 vocabulary: map-side partial aggregation and TakeOrdered top-K") {
    val p = plan("t5_vocabulary")
    assert(p.contains("partial_count") || p.contains("Partial"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("no query key outside the intentional baselines plans a quadratic join") {
    // The frozen invariant (VERDICT r2 #3): a CartesianProduct or
    // BroadcastNestedLoopJoin in an executed plan means O(n·m) pair work —
    // acceptable ONLY where one side is bounded-tiny by construction or the
    // all-pairs form IS the operator's spec. Everything else must plan
    // hash/merge equi-joins; reintroducing a theta join fails this test.
    val allowed = Map(
      // the all-pairs oracle formulation — its exact scale twin is d6
      "d5_dedup_embedding" -> "spec'd O(n²) baseline",
      // exact kNN baseline: the BNLJ build side is the broadcast query set
      "s1_knn_bruteforce" -> "broadcast query-side baseline",
      // assignment/probe join the broadcast nCells-row centroid table
      "s3_knn_ivf" -> "centroid-table broadcast joins",
      // same centroid joins + the nCells² cell-pair pruning cross
      "d6_dedup_embcell" -> "centroid-table broadcast joins",
      // the ADC scan is intentionally linear like s1 — but over nSub-byte
      // codes, not dim-float vectors (the PQ memory-residency win); the
      // codebook joins broadcast the 64-row (m, cid) table
      "s4_knn_pq" -> "broadcast query-side ADC code scan",
      // IVF∘PQ composition: the only BNLJs are the coarse-assignment and
      // query-probe joins against the broadcast nCells-row centroid table
      // (Similarity.ivfPqTopK — same bounded-tiny class as s3/d6); the ADC
      // rerank itself is a cell-key equi-join over the pruned cells
      "s5_knn_ivfpq" -> "centroid-table broadcast joins",
      // residual IVF∘PQ: the same bounded-tiny class — coarse assignment,
      // the residual frame's cell-geometry attach, and the query probes
      // all join the broadcast nCells-row centroid table; the ADC scan
      // itself stays a cell-key equi-join
      "s6_knn_ivfpq_residual" -> "centroid-table broadcast joins")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allowed.contains)
      .flatMap { name =>
        val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"quadratic join planned by: ${offenders.mkString(", ")}")
  }

  test("st3 enrichment: dim broadcasts, stream side shuffles only for the agg") {
    val p = plan("st3_stream_enrich")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("t9 classifier: map-side only — no hash exchange anywhere in the plan") {
    val p = plan("t9_quality_classifier")
    assert(p.split("Exchange hashpartitioning").length - 1 == 0)
    assert(p.contains("ReadSchema: struct<doc_id")) // scan pruned to (id, text)
    assert(!p.contains("n_chars"))
  }

  test("p6 interleave: bucket-prefix and mix config broadcast; no stratum-wide window") {
    val p = plan("p6_mix_interleave")
    assert(p.split("BroadcastHashJoin").length - 1 == 2)
    assert(!p.contains("SortMergeJoin"))
    // raw rows shuffle once for the within-(stratum,bucket) row_number;
    // the bucket-count agg shuffles once; the stratum-only prefix window
    // runs on the ≤(strata·buckets)-row AGGREGATE, never the raw rows
    assert(p.split("Exchange hashpartitioning").length - 1 <= 3)
  }

  test("q26 maintained rollup: key-equi joins only; agg exchanges are group-keyed") {
    val p = plan("q26_incremental_rollup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("st6 stream join: equi-key hash join with interval residual, no range cartesian") {
    val p = plan("st6_stream_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
