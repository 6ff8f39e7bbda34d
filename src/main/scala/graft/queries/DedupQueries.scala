package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** SURVEY.md §2c/§2d — training-data dedup (d1–d5) and similarity search
  * (s1–s2) over the `documents` / `embeddings` tables.
  *
  * Thresholds are data-informed: the synthetic corpus has planted near-dup
  * pairs at 3-gram Jaccard ≥ 0.9 with background noise < 0.07, so 0.5
  * separates cleanly; embedding cosine has a clear gap around 0.4
  * (0.39987 vs 0.40052 at sf0.01). The oracle SQL re-derives every hash
  * with the same modular arithmetic (see [[graft.functions.TextHash]]).
  */
object DedupQueries {

  private val ShingleN     = 3
  private val JaccardThr   = 0.5
  private val MinhashBands = 24
  private val MinhashRows  = 3 // planted pairs sit at s ≥ 0.8: miss ≈ (1-0.8³)^24 ≈ 3e-8
  private val MaxHamming   = 3
  private val CosThr       = 0.4
  private val KnnK         = 5
  private val LshK         = 5
  private val LshPlanes    = 8
  private val LshTables    = 6
  private val QueryStride  = 100 // s1/s2 query set: vec_id % stride == 0

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_dedup_exact"     -> ((s, d) => d1(s, d)),
    "d2_dedup_ngram"     -> ((s, d) => d2(s, d)),
    "d2b_dedup_ngram_capped" -> ((s, d) => d2b(s, d)),
    "d3_dedup_minhash"   -> ((s, d) => d3(s, d)),
    "d4_dedup_simhash"   -> ((s, d) => d4(s, d)),
    "d5_dedup_embedding" -> ((s, d) => d5(s, d)),
    "d6_dedup_embcell"   -> ((s, d) => d6(s, d)),
    "d7_dedup_components" -> ((s, d) => d7(s, d)),
    "d8_window_dedup"    -> ((s, d) => d8(s, d)),
    "d8b_dup_spans"      -> ((s, d) => d8b(s, d)),
    "d9_decontaminate"   -> ((s, d) => d9(s, d)),
    "d9b_decontaminate_spans" -> ((s, d) => d9b(s, d)),
    "d9c_decontaminate_apply" -> ((s, d) => d9c(s, d)),
    "d12_excise_dups"    -> ((s, d) => d12(s, d)),
    "d10_incremental_dedup" -> ((s, d) => d10(s, d)),
    "d11_fuzzy_join"     -> ((s, d) => d11(s, d)),
    "s1_knn_bruteforce"  -> ((s, d) => s1(s, d)),
    "s2_knn_lsh"         -> ((s, d) => s2(s, d)),
    "s3_knn_ivf"         -> ((s, d) => s3(s, d)),
    "s4_knn_pq"          -> ((s, d) => s4(s, d)),
    "s5_knn_ivfpq"       -> ((s, d) => s5(s, d)),
    "s6_knn_ivfpq_residual" -> ((s, d) => s6(s, d)),
    "p1_curate_corpus"   -> ((s, d) => p1(s, d)),
    "p5_semdedup"        -> ((s, d) => p5(s, d))
  )

  private val IvfCentroids = 16
  private val IvfProbes    = 3
  private val KmeansIters  = 2 // fixed Lloyd rounds — the round count IS the spec
  private val MinDfCap     = 5L  // df cap floor (small corpora)
  private val DfCapDivisor = 100L // cap = max(floor, n_docs/100) = 1% of corpus

  /** d1: exact dedup groups on normalized text (hash-groupBy). */
  def d1(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** d2: n-gram Jaccard near-dup pairs via shingle posting lists. */
  def d2(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        ShingleN, JaccardThr)
      .orderBy(col("ida"), col("idb"))

  /** d2b: the production form of d2 — document-frequency cap wired. A
    * shingle present in more than max(5, 1%) of docs carries no near-dup
    * signal but quadratic posting-list cost (power-law corpora put a
    * boilerplate shingle in millions of docs; its posting list alone would
    * be a petabyte-scale self-join). The cap drops those lists AND shrinks
    * the per-doc set sizes consistently, so the Jaccard stays a true
    * set similarity over the capped vocabulary — semantics the oracle
    * reproduces exactly. */
  def d2b(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val cap = math.max(MinDfCap, docs.count() / DfCapDivisor)
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", ShingleN, JaccardThr, Some(cap))
      .orderBy(col("ida"), col("idb"))
  }

  /** d3: MinHash+LSH candidates, exact-verified — equals the exact
    * threshold pair set (same oracle as d2), reached via the near-linear
    * candidate path instead of the full posting-list join. */
  def d3(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        ShingleN, MinhashBands, MinhashRows, JaccardThr)
      .orderBy(col("ida"), col("idb"))

  /** d4: SimHash fingerprint pairs at Hamming ≤ 3 (lossless banding). */
  def d4(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        ShingleN, MaxHamming)
      .orderBy(col("ida"), col("idb"))

  /** d5: embedding-cosine near-dup pairs (exact, norm precomputed). */
  def d5(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding", CosThr)
      .orderBy(col("ida"), col("idb"))

  /** d6: the SAME exact pair set as d5 (identical oracle), produced by the
    * scale path — centroid-cell assignment + triangle-inequality cell-pair
    * pruning + equi-join candidates + exact verify. No all-pairs theta
    * join anywhere in the plan. */
  def d6(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairsCellPruned(Tables.embeddings(s, dir), "vec_id", "embedding",
        CosThr, IvfCentroids, KmeansIters)
      .orderBy(col("ida"), col("idb"))

  /** d7: near-dup pairs → canonical clusters. Pairs from the d3 scale
    * path (MinHash-LSH candidates, exact-verified — identical to the
    * exact pair set), clustered by iterative min-label propagation; the
    * oracle recomputes the same components with a recursive CTE. */
  def d7(s: SparkSession, dir: String): DataFrame =
    graft.operators.Components.dedupClusters(
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        ShingleN, MinhashBands, MinhashRows, JaccardThr),
      "ida", "idb")
      .orderBy(col("id"))

  private val WindowK = 8 // substring-window length (words) for d8

  /** d8: exact substring-window duplicate coverage (Lee et al. 2021) —
    * per-doc fraction of k-word windows that occur verbatim in ≥ 2 docs.
    * Wordcount-shaped (posting df + join back), never pairwise. */
  def d8(s: SparkSession, dir: String): DataFrame =
    Dedup.windowDupStats(Tables.documents(s, dir), "doc_id", "text", WindowK)
      .orderBy(col("doc_id"))

  /** d8b: maximal duplicated spans — WHERE the d8 duplicated text sits:
    * positional dup windows merged into maximal `start-end` token spans
    * (the excision input; '' for clean docs). */
  def d8b(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpans(Tables.documents(s, dir), "doc_id", "text", WindowK)
      .orderBy(col("doc_id"))

  private val BenchStride = 10 // d9 "benchmark set": doc_id % 10 == 0 (10% of docs)
  private val BatchMod    = 5  // d10 "new batch": doc_id % 5 == 4 (20% of docs)

  /** d9: benchmark decontamination — per corpus doc, the count/fraction of
    * its k-word windows that occur verbatim in the benchmark set (a
    * deterministic 10% slice standing in for the eval suite). Benchmark
    * window hashes broadcast; corpus side never shuffles for the probe. */
  def d9(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.contaminationStats(
        docs.filter(col("doc_id") % BenchStride =!= 0),
        docs.filter(col("doc_id") % BenchStride === 0),
        "doc_id", "text", WindowK)
      .orderBy(col("doc_id"))
  }

  /** d9b: decontamination with SPANS — the positions (0-based window
    * start, over normalized words) of every contaminated window, sorted,
    * comma-joined: what an excision pass actually consumes. Window counts
    * here are positional, not distinct-set. */
  def d9b(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.contaminationSpans(
        docs.filter(col("doc_id") % BenchStride =!= 0),
        docs.filter(col("doc_id") % BenchStride === 0),
        "doc_id", "text", WindowK)
      .orderBy(col("doc_id"))
  }

  /** d9c: decontamination APPLIED — every benchmark-leaked window excised
    * from the corpus docs, spans merged, text rebuilt (normalized token
    * stream). The executable form of d9b's report. */
  def d9c(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.exciseContamination(
        docs.filter(col("doc_id") % BenchStride =!= 0),
        docs.filter(col("doc_id") % BenchStride === 0),
        "doc_id", "text", WindowK)
      .orderBy(col("doc_id"))
  }

  /** d12: duplicate-span excision — Lee et al. 2021's "all but one
    * occurrence" policy applied: the canonical (minimal (doc, pos))
    * occurrence of each cross-doc duplicated window survives, every
    * other occurrence's span is cut and the text rebuilt. */
  def d12(s: SparkSession, dir: String): DataFrame =
    Dedup.exciseDuplicateSpans(Tables.documents(s, dir), "doc_id", "text",
        WindowK)
      .orderBy(col("doc_id"))

  private val FuzzyPrefixLen = 40
  private val FuzzyBlockLen  = 6
  private val FuzzyMaxDist   = 3

  /** d11: blocked fuzzy (edit-distance) join — sequence-similarity pairs
    * over normalized 40-char prefixes, MULTI-BLOCK-KEY union form (the
    * production recall dial: leading block + second slice + char-sorted
    * window, candidates unioned, pairs deduped, verified once). See
    * [[Dedup.fuzzyJoinPairsMulti]]; the single-key form and its
    * spec-pinned recall limit remain as [[Dedup.fuzzyJoinPairs]]. */
  def d11(s: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyJoinPairsMulti(Tables.documents(s, dir), "doc_id", "text",
        FuzzyPrefixLen, FuzzyBlockLen, FuzzyMaxDist)
      .orderBy(col("ida"), col("idb"))

  /** d10: incremental cross-corpus dedup — the daily-arrivals pattern: a
    * deterministic 20% slice plays the NEW batch, the rest the standing
    * curated corpus. Each batch doc is flagged for exact duplication and
    * near-duplication (MinHash bands batch↔corpus, exact-Jaccard verify)
    * without any corpus self-join. */
  def d10(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.incrementalDedupFlags(
        docs.filter(col("doc_id") % BatchMod =!= BatchMod - 1),
        docs.filter(col("doc_id") % BatchMod === BatchMod - 1),
        "doc_id", "text", ShingleN, MinhashBands, MinhashRows, JaccardThr)
      .orderBy(col("doc_id"))
  }

  private val QualityThr = 0.55 // drops the ~p10 tail at sf0.01, keeps the bulk

  /** p1: the end-to-end corpus-curation pipeline — quality filter (t2) →
    * exact dedup (d1 agg form) → df-capped near-dup pairs (d2b) →
    * components + keep-canonical (d7), chained as ONE Pipeline DAG
    * ([[graft.pipelines.CurateCorpus]]). The oracle recomputes every stage
    * over the same parquet and checks the SURVIVING DOC SET — the
    * composition, not just each operator, is hash-verified. */
  def p1(s: SparkSession, dir: String): DataFrame =
    graft.pipelines.CurateCorpus.run(Tables.documents(s, dir), "doc_id", "text",
        QualityThr, ShingleN, JaccardThr, MinDfCap, DfCapDivisor)
      .curated
      .select(col("doc_id"), col("quality_score"))
      .orderBy(col("doc_id"))

  /** p5: SemDeDup over the embeddings table — trained cells (same
    * codebook constants as s3/d6), within-cell cosine ≥ [[CosThr]] dup
    * pairs, min-(ccos, id) keeper per duplicate cluster. */
  def p5(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        CosThr, IvfCentroids, KmeansIters)
      .orderBy(col("vec_id"))

  private def queryVecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") % QueryStride === 0)

  /** s1: brute-force cosine top-k (exact ANN baseline). */
  def s1(s: SparkSession, dir: String): DataFrame =
    Similarity.knnBruteForce(queryVecs(s, dir), Tables.embeddings(s, dir),
        "vec_id", "embedding", KnnK)
      .orderBy(col("query_id"), col("rank"))

  /** s2: hyperplane LSH ANN. The "random" planes are deterministic
    * modular arithmetic (plans/LshSignature.coef), so the WHOLE pipeline
    * — signatures, multi-probe buckets, candidate join, exact rerank —
    * is re-derivable in SQL and hash-checked like everything else;
    * recall against brute force stays the probabilistic part and is
    * floor-asserted in SimilaritySpec. */
  def s2(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(queryVecs(s, dir), Tables.embeddings(s, dir),
        "vec_id", "embedding", LshK, LshPlanes, LshTables)
      .orderBy(col("query_id"), col("rank"))

  /** s3: IVF (inverted-file) ANN — coarse-quantize the corpus into cells
    * with a TRAINED deterministic codebook (fixed-iteration Lloyd's
    * k-means, integer-quantized centroid updates), probe the nprobe
    * nearest cells per query, exact rerank inside. Unlike s2 the whole
    * index — including the training iterations — is deterministic
    * arithmetic, so the full operator is SQL-expressible and hash-checked
    * against an oracle that re-runs the same Lloyd rounds. */
  def s3(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(queryVecs(s, dir), Tables.embeddings(s, dir),
        "vec_id", "embedding", LshK, IvfCentroids, IvfProbes, KmeansIters)
      .orderBy(col("query_id"), col("rank"))

  private val PqSub      = 4  // subspaces (64 dims → 4 × 16)
  private val PqSubDim   = 16
  private val PqK        = 16 // centroids per subspace codebook
  private val PqShortlist = 20 // ADC shortlist per query (4·k) before rerank

  /** s4: PRODUCT-QUANTIZATION ANN (Jégou et al. 2011, faiss IndexPQ
    * shape): per-subspace trained codebooks → nSub-byte codes per corpus
    * vector (16× smaller than the raw floats here, the memory-residency
    * win PQ exists for) → per-query ADC lookup tables → code-scan
    * shortlist → exact rerank of the shortlist only. Training, codes,
    * lookup tables and the ADC fold are deterministic integer/fixed-order
    * arithmetic — the oracle re-runs the whole pipeline, unrolled
    * per-subspace k-means included; recall vs s1 is floor-asserted in
    * SimilaritySpec. */
  def s4(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(queryVecs(s, dir), Tables.embeddings(s, dir),
        "vec_id", "embedding", KnnK, PqSub, PqSubDim, PqK, KmeansIters, PqShortlist)
      .orderBy(col("query_id"), col("rank"))

  /** s5: IVF∘PQ — the faiss IndexIVFPQ composition: coarse cells bound
    * WHICH codes a query scans (nProbes/nCells of the corpus), PQ codes
    * bound what each candidate COSTS (4 table lookups vs a 64-mult dot).
    * Both trainings are the same deterministic Lloyd schemes as s3/s4, so
    * the ENTIRE composition — coarse k-means, subspace k-means, cell
    * assignment, probes, cell-joined ADC scan, shortlist, rerank — is
    * SQL-re-derived and hash-checked. */
  def s5(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(queryVecs(s, dir), Tables.embeddings(s, dir),
        "vec_id", "embedding", KnnK, IvfCentroids, IvfProbes, KmeansIters,
        PqSub, PqSubDim, PqK, KmeansIters, PqShortlist)
      .orderBy(col("query_id"), col("rank"))

  /** s6: IVF∘PQ with RESIDUAL encoding — faiss's `by_residual=true`
    * production default: codes quantize `x − c(cell(x))`, spending the
    * codebook's resolution on the tight within-cell spread. Under dot
    * scoring the correction is linear — `dot(q, c + r̂) = qc + ADC` with
    * the exact reconstruction norm `xn2` stored per row at encode time —
    * so the scan keeps the standard per-query table. Same geometry as
    * s5; the full composition, residual subtraction and both trainings
    * included, is SQL-re-derived. */
  def s6(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqResidualTopK(queryVecs(s, dir), Tables.embeddings(s, dir),
        "vec_id", "embedding", KnnK, IvfCentroids, IvfProbes, KmeansIters,
        PqSub, PqSubDim, PqK, KmeansIters, PqShortlist)
      .orderBy(col("query_id"), col("rank"))

  // ---- amortized-index bench hooks ----------------------------------------
  // The s3/d6/d10 PRODUCTION path splits the one-time index/codebook build
  // from the per-run probe (the query keys above keep the self-contained
  // train-in-query form the DuckDB oracle re-derives). Bench times the two
  // halves separately in its "amortized" section.

  def s3Build(s: SparkSession, dir: String, table: String, path: String): Unit =
    Similarity.buildIvfIndex(Tables.embeddings(s, dir), "vec_id", "embedding",
      IvfCentroids, table, path, nBuckets = 8, kmeansIters = KmeansIters)

  def s3Probe(s: SparkSession, dir: String, table: String): DataFrame =
    Similarity.probeIvfIndex(s, table, queryVecs(s, dir), "vec_id", "embedding",
      LshK, IvfCentroids, IvfProbes)

  /** Trained codebook, MATERIALIZED (the probe must not lazily retrain). */
  def d6Train(s: SparkSession, dir: String): DataFrame =
    Similarity.trainCentroids(Tables.embeddings(s, dir), "vec_id", "embedding",
      IvfCentroids, KmeansIters).localCheckpoint(eager = true)

  def d6Probe(s: SparkSession, dir: String, cent: DataFrame): DataFrame =
    Similarity.cosinePairsCellPruned(Tables.embeddings(s, dir), "vec_id", "embedding",
      CosThr, IvfCentroids, KmeansIters, precomputedCentroids = Some(cent))

  def s4Build(s: SparkSession, dir: String, table: String, path: String): Unit =
    Similarity.buildPqIndex(Tables.embeddings(s, dir), "vec_id", "embedding",
      PqSub, PqSubDim, PqK, KmeansIters, table, path)

  def s4Probe(s: SparkSession, dir: String, table: String): DataFrame =
    Similarity.probePqIndex(s, table, queryVecs(s, dir), Tables.embeddings(s, dir),
      "vec_id", "embedding", KnnK, PqSub, PqSubDim, PqK, PqShortlist)

  def s5Build(s: SparkSession, dir: String, table: String, path: String): Unit =
    Similarity.buildIvfPqIndex(Tables.embeddings(s, dir), "vec_id", "embedding",
      IvfCentroids, KmeansIters, PqSub, PqSubDim, PqK, KmeansIters, table, path)

  def s5Probe(s: SparkSession, dir: String, table: String): DataFrame =
    Similarity.probeIvfPqIndex(s, table, queryVecs(s, dir), Tables.embeddings(s, dir),
      "vec_id", "embedding", KnnK, IvfProbes, PqSub, PqSubDim, PqK, PqShortlist)

  def d10Build(s: SparkSession, dir: String, indexRoot: String): Unit =
    Dedup.buildDedupIndex(
      Tables.documents(s, dir).filter(col("doc_id") % BatchMod =!= BatchMod - 1),
      "doc_id", "text", ShingleN, MinhashBands, MinhashRows, indexRoot)

  def d10Probe(s: SparkSession, dir: String, indexRoot: String): DataFrame =
    Dedup.probeDedupIndex(s, indexRoot,
      Tables.documents(s, dir).filter(col("doc_id") % BatchMod === BatchMod - 1),
      "doc_id", "text", JaccardThr)

  // ---- oracle SQL ---------------------------------------------------------

  private val NormExpr =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

  /** words → distinct 3-gram shingle strings (DuckDB range() end is
    * exclusive: range(1, len-1) ⇒ i ∈ [1, len-2], matching Spark's
    * sequence(1, size-2) inclusive). Parametric in the doc source so the
    * same CTEs run over `documents` or a curated subset. */
  private def shingleCtesFrom(src: String) =
    s"""w AS (SELECT doc_id, string_split($NormExpr, ' ') AS ws FROM $src),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sg FROM w)""".stripMargin

  private val ShingleCtes = shingleCtesFrom("documents")

  /** The d2b df-capped Jaccard pair set as a CTE chain ending in
    * `jp (ida, idb, jaccard)`. Needs `sh` in scope; the cap is computed
    * against the row count of `countSrc` (the corpus the pairs are drawn
    * from). */
  private def cappedJaccardCtes(countSrc: String) =
    s"""cx AS (SELECT doc_id, unnest(sg) AS s FROM sh),
       |cdf AS (SELECT s, count(*) AS c FROM cx GROUP BY s),
       |ckeep AS (SELECT doc_id, s FROM cx JOIN cdf USING (s)
       |  WHERE c <= greatest($MinDfCap, (SELECT count(*) FROM $countSrc) // $DfCapDivisor)),
       |csz AS (SELECT doc_id, count(*) AS n FROM ckeep GROUP BY doc_id),
       |cp AS (SELECT a.doc_id ida, b.doc_id idb, count(*) AS common
       |  FROM ckeep a JOIN ckeep b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jp AS (SELECT ida, idb, common::DOUBLE / (na.n + nb.n - common) AS jaccard
       |  FROM cp JOIN csz na ON cp.ida = na.doc_id JOIN csz nb ON cp.idb = nb.doc_id
       |  WHERE common::DOUBLE / (na.n + nb.n - common) >= $JaccardThr)""".stripMargin

  /** The exact ≥ threshold Jaccard pair set as a CTE (`jp`), composable
    * into the pair queries (d2/d3) and the clustering query (d7). */
  private val JaccardPairCtes =
    s"""$ShingleCtes,
       |p AS (SELECT a.doc_id ida, b.doc_id idb,
       |    len(list_intersect(a.sg, b.sg)) AS common, len(a.sg) na, len(b.sg) nb
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
       |jp AS (SELECT ida, idb, common::DOUBLE / (na + nb - common) AS jaccard
       |  FROM p WHERE common::DOUBLE / (na + nb - common) >= $JaccardThr)""".stripMargin

  private val JaccardPairSql =
    s"""WITH $JaccardPairCtes
       |SELECT ida, idb, jaccard FROM jp ORDER BY ida, idb""".stripMargin

  /** char-fold WIDE polynomial hash of each shingle — mirrors
    * TextHash.wideShingleHashes (base 131, 55-bit prime modulus;
    * acc·131 + byte < 2⁶³, so plain BIGINT arithmetic re-derives it). */
  private val HashCte = {
    val b = graft.plans.GraftExpressions.WideBase
    val m = graft.plans.GraftExpressions.WideMod
    s"""hs AS (SELECT doc_id, list_transform(sg,
       |    sh -> list_reduce(list_transform(range(1, length(sh) + 1), i -> ascii(sh[i])::BIGINT),
       |                      (acc, x) -> (acc * $b + x) % $m)) AS hl FROM sh)""".stripMargin
  }

  private val simhashSums = (0 until Dedup.SimHashBits)
    .map(j => s"sum(((x >> $j) & 1) * 2 - 1) AS s$j").mkString(", ")
  private val simhashFp = (0 until Dedup.SimHashBits)
    .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")

  private val CosDim = 64
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform(range(1, ${CosDim + 1}), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)"
  private val NormCte =
    s"""n AS (SELECT vec_id, embedding,
       |    list_reduce(list_transform(range(1, ${CosDim + 1}), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE),
       |                (x, y) -> x + y) AS n2 FROM embeddings)""".stripMargin

  /** The trained-codebook CTE chain: `cent0` = lowest-id seed vectors,
    * then [[KmeansIters]] unrolled Lloyd rounds, each = deterministic
    * argmax-cosine assignment + the SAME fixed-point centroid update the
    * Spark side runs ([[Similarity.trainCentroids]]): element sums over
    * `floor(x·2²⁰)` BIGINTs (order-independent, exact in any engine) and
    * one double division s/(2²⁰·count). Empty cells keep their previous
    * centroid. Requires the `n` CTE (NormCte) in scope. */
  private val KmeansQ = "1048576.0"
  private val KmeansCtes: String = {
    val seed =
      s"""cent0 AS (SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cv
         |  FROM embeddings WHERE vec_id < $IvfCentroids)""".stripMargin
    val rounds = (1 to KmeansIters).map { t =>
      val p = t - 1
      s"""kn$p AS (SELECT cid, cv, list_reduce(list_transform(range(1, ${CosDim + 1}),
         |    i -> cv[i] * cv[i]), (a, b) -> a + b) AS cn2 FROM cent$p),
         |kac$t AS (SELECT v.vec_id, v.embedding, c.cid,
         |    list_reduce(list_transform(range(1, ${CosDim + 1}),
         |      i -> v.embedding[i]::DOUBLE * c.cv[i]), (a, b) -> a + b)
         |      / sqrt(v.n2 * c.cn2) AS ccos
         |  FROM n v CROSS JOIN kn$p c),
         |kasn$t AS (SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM kac$t) WHERE rn = 1),
         |kcnt$t AS (SELECT cell, count(*) AS c FROM kasn$t GROUP BY cell),
         |ksum$t AS (SELECT cell, r.range AS i,
         |    sum(floor(embedding[r.range]::DOUBLE * $KmeansQ)::BIGINT) AS s
         |  FROM kasn$t CROSS JOIN range(1, ${CosDim + 1}) r GROUP BY cell, r.range),
         |kmean$t AS (SELECT cell, list(s::DOUBLE / ($KmeansQ * c) ORDER BY i) AS mv
         |  FROM ksum$t JOIN kcnt$t USING (cell) GROUP BY cell),
         |cent$t AS (SELECT p.cid, coalesce(m.mv, p.cv) AS cv
         |  FROM cent$p p LEFT JOIN kmean$t m ON m.cell = p.cid)""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** s4's per-subspace PQ pipeline, fully unrolled: `vs2` (subvectors +
    * norms), seed codebooks, [[KmeansIters]] Lloyd rounds under L2 on the
    * subvector (ties → lowest centroid id), dense code map, corpus
    * encoding, per-query ADC tables — all the same fixed-order arithmetic
    * as Similarity.trainPqCodebooks/pqEncode/pqTopK. Requires NormCte. */
  private val PqCtes: String = {
    val (nSub, sd, k) = (4, 16, 16) // PqSub / PqSubDim / PqK
    def subFold(e: String) =
      s"list_reduce(list_transform($e, x -> x * x), (a, b) -> a + b)"
    def subDot(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${sd + 1}), i -> $a[i] * $b[i]), (a, b) -> a + b)"
    val base =
      s"""vs2 AS (SELECT vec_id, m.range AS m,
         |    list_transform(range(1, ${sd + 1}), i -> embedding[m.range * $sd + i]::DOUBLE) AS sv
         |  FROM embeddings CROSS JOIN range(0, $nSub) m),
         |vs3 AS (SELECT *, ${subFold("sv")} AS sn2 FROM vs2),
         |pc0 AS (SELECT m.range AS m, vec_id AS cid,
         |    list_transform(range(1, ${sd + 1}), i -> embedding[m.range * $sd + i]::DOUBLE) AS cv
         |  FROM embeddings CROSS JOIN range(0, $nSub) m WHERE vec_id < $k)""".stripMargin
    val rounds = (1 to KmeansIters).map { t =>
      val p = t - 1
      s"""pn$p AS (SELECT m, cid, cv, ${subFold("cv")} AS cn2 FROM pc$p),
         |pa$t AS (SELECT v.vec_id, v.m, v.sv, c.cid,
         |    v.sn2 + c.cn2 - 2 * ${subDot("v.sv", "c.cv")} AS d2
         |  FROM vs3 v JOIN pn$p c ON v.m = c.m),
         |pas$t AS (SELECT vec_id, m, sv, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, cid) AS rn FROM pa$t) WHERE rn = 1),
         |pct$t AS (SELECT m, cell, count(*) AS c FROM pas$t GROUP BY m, cell),
         |psm$t AS (SELECT m, cell, r.range AS i,
         |    sum(floor(sv[r.range] * $KmeansQ)::BIGINT) AS s
         |  FROM pas$t CROSS JOIN range(1, ${sd + 1}) r GROUP BY m, cell, r.range),
         |pmn$t AS (SELECT m, cell, list(s::DOUBLE / ($KmeansQ * c) ORDER BY i) AS mv
         |  FROM psm$t JOIN pct$t USING (m, cell) GROUP BY m, cell),
         |pc$t AS (SELECT p.m, p.cid, coalesce(n.mv, p.cv) AS cv
         |  FROM pc$p p LEFT JOIN pmn$t n ON n.m = p.m AND n.cell = p.cid)""".stripMargin
    }
    val finish =
      s"""pcf AS (SELECT m, cid, cv, ${subFold("cv")} AS cn2,
         |    (row_number() OVER (PARTITION BY m ORDER BY cid) - 1) AS code
         |  FROM pc$KmeansIters),
         |ea AS (SELECT v.vec_id, v.m, c.code, c.cn2,
         |    v.sn2 + c.cn2 - 2 * ${subDot("v.sv", "c.cv")} AS d2
         |  FROM vs3 v JOIN pcf c ON v.m = c.m),
         |ew AS (SELECT vec_id, m, code, cn2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, code) AS rn FROM ea) WHERE rn = 1),
         |cw AS (SELECT vec_id, list(code ORDER BY m) AS codes,
         |    list_reduce(list(cn2 ORDER BY m), (a, b) -> a + b) AS rn2
         |  FROM ew GROUP BY vec_id),
         |qt AS (SELECT v.vec_id AS query_id, c.m, c.code,
         |    ${subDot("v.sv", "c.cv")} AS pdot
         |  FROM vs3 v JOIN pcf c ON v.m = c.m WHERE v.vec_id % $QueryStride = 0),
         |qf AS (SELECT query_id, list(pdot ORDER BY m, code) AS ftab
         |  FROM qt GROUP BY query_id)""".stripMargin
    (base +: rounds :+ finish).mkString(",\n")
  }

  /** s6's residual-PQ pipeline: identical unrolled per-subspace Lloyd
    * scheme as [[PqCtes]], but trained/encoded over `resv` (residuals
    * `x − c(cell(x))`, with each row's cell-centroid slice `csl` and
    * cell norm `celln2` riding along). Encoding additionally emits the
    * one per-row constant of the cosine ADC algebra: `xn2`, the exact
    * reconstruction norm `celln2 + 2·cdot + ‖r̂‖²` (cdot = winning
    * reconstruction · cell centroid, ascending-m fold). The query table
    * stays over RAW query slices — the residual correction lives
    * entirely in `qc` (probe-side query↔centroid dot). Requires `resv`
    * and `asn` in scope. */
  private val PqResidualCtes: String = {
    val (nSub, sd, k) = (4, 16, 16) // PqSub / PqSubDim / PqK
    def subFold(e: String) =
      s"list_reduce(list_transform($e, x -> x * x), (a, b) -> a + b)"
    def subDot(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${sd + 1}), i -> $a[i] * $b[i]), (a, b) -> a + b)"
    val base =
      s"""rs2 AS (SELECT vec_id, celln2, m.range AS m,
         |    list_transform(range(1, ${sd + 1}), i -> rv[m.range * $sd + i]) AS sv,
         |    list_transform(range(1, ${sd + 1}), i -> ccv[m.range * $sd + i]) AS csl
         |  FROM resv CROSS JOIN range(0, $nSub) m),
         |rs3 AS (SELECT *, ${subFold("sv")} AS sn2 FROM rs2),
         |rpc0 AS (SELECT m.range AS m, vec_id AS cid,
         |    list_transform(range(1, ${sd + 1}), i -> rv[m.range * $sd + i]) AS cv
         |  FROM resv CROSS JOIN range(0, $nSub) m WHERE vec_id < $k)""".stripMargin
    val rounds = (1 to KmeansIters).map { t =>
      val p = t - 1
      s"""rpn$p AS (SELECT m, cid, cv, ${subFold("cv")} AS cn2 FROM rpc$p),
         |rpa$t AS (SELECT v.vec_id, v.m, v.sv, c.cid,
         |    v.sn2 + c.cn2 - 2 * ${subDot("v.sv", "c.cv")} AS d2
         |  FROM rs3 v JOIN rpn$p c ON v.m = c.m),
         |rpas$t AS (SELECT vec_id, m, sv, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, cid) AS rn FROM rpa$t) WHERE rn = 1),
         |rpct$t AS (SELECT m, cell, count(*) AS c FROM rpas$t GROUP BY m, cell),
         |rpsm$t AS (SELECT m, cell, r.range AS i,
         |    sum(floor(sv[r.range] * $KmeansQ)::BIGINT) AS s
         |  FROM rpas$t CROSS JOIN range(1, ${sd + 1}) r GROUP BY m, cell, r.range),
         |rpmn$t AS (SELECT m, cell, list(s::DOUBLE / ($KmeansQ * c) ORDER BY i) AS mv
         |  FROM rpsm$t JOIN rpct$t USING (m, cell) GROUP BY m, cell),
         |rpc$t AS (SELECT p.m, p.cid, coalesce(n.mv, p.cv) AS cv
         |  FROM rpc$p p LEFT JOIN rpmn$t n ON n.m = p.m AND n.cell = p.cid)""".stripMargin
    }
    val finish =
      s"""rpcf AS (SELECT m, cid, cv, ${subFold("cv")} AS cn2,
         |    (row_number() OVER (PARTITION BY m ORDER BY cid) - 1) AS code
         |  FROM rpc$KmeansIters),
         |rea AS (SELECT v.vec_id, v.m, v.celln2, c.code, c.cn2,
         |    ${subDot("v.csl", "c.cv")} AS cd,
         |    v.sn2 + c.cn2 - 2 * ${subDot("v.sv", "c.cv")} AS d2
         |  FROM rs3 v JOIN rpcf c ON v.m = c.m),
         |rew AS (SELECT vec_id, m, celln2, code, cn2, cd FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, code) AS rn FROM rea) WHERE rn = 1),
         |rcw0 AS (SELECT vec_id, min(celln2) AS celln2,
         |    list(code ORDER BY m) AS codes,
         |    list_reduce(list(cn2 ORDER BY m), (a, b) -> a + b) AS rrn2,
         |    list_reduce(list(cd ORDER BY m), (a, b) -> a + b) AS cdot
         |  FROM rew GROUP BY vec_id),
         |rcw AS (SELECT w.vec_id, a.cell, w.codes,
         |    w.celln2 + 2 * w.cdot + w.rrn2 AS xn2
         |  FROM rcw0 w JOIN asn a ON a.vec_id = w.vec_id),
         |rqs AS (SELECT vec_id, m.range AS m,
         |    list_transform(range(1, ${sd + 1}), i -> embedding[m.range * $sd + i]::DOUBLE) AS sv
         |  FROM embeddings CROSS JOIN range(0, $nSub) m
         |  WHERE vec_id % $QueryStride = 0),
         |rqt AS (SELECT v.vec_id AS query_id, c.m, c.code,
         |    ${subDot("v.sv", "c.cv")} AS pdot
         |  FROM rqs v JOIN rpcf c ON v.m = c.m),
         |rqf AS (SELECT query_id, list(pdot ORDER BY m, code) AS ftab
         |  FROM rqt GROUP BY query_id)""".stripMargin
    (base +: rounds :+ finish).mkString(",\n")
  }

  private val CosPairSql =
    s"""WITH $NormCte,
       |p AS (SELECT a.vec_id ida, b.vec_id idb,
       |    ${dotSql("a", "b")} / sqrt(a.n2 * b.n2) AS cos
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT ida, idb, cos FROM p WHERE cos >= $CosThr
       |ORDER BY ida, idb""".stripMargin

  def oracles: Map[String, String] = Map(
    "d1_dedup_exact" ->
      s"""WITH nrm AS (SELECT doc_id, $NormExpr AS norm FROM documents)
         |SELECT doc_id, min(doc_id) OVER (PARTITION BY norm) AS canonical_id,
         |  count(*) OVER (PARTITION BY norm) AS group_size
         |FROM nrm ORDER BY doc_id""".stripMargin,

    "d2_dedup_ngram"   -> JaccardPairSql,

    // capped variant: df over shingle STRINGS (the Spark side keys postings
    // on the 55-bit hash — identical df modulo ~1e-8 collision odds, the
    // same equivalence d2's oracle already relies on)
    "d2b_dedup_ngram_capped" ->
      s"""WITH $ShingleCtes,
         |${cappedJaccardCtes("documents")}
         |SELECT ida, idb, jaccard FROM jp ORDER BY ida, idb""".stripMargin,

    "d3_dedup_minhash" -> JaccardPairSql,

    // d11: identical normalization, the THREE block keys (leading block,
    // second slice, char-sorted 2x window), candidate union + pair dedup,
    // one DP edit-distance verification (levenshtein has the same classic
    // semantics in both engines)
    "d11_fuzzy_join" ->
      s"""WITH nrm AS (SELECT doc_id, $NormExpr AS nt FROM documents),
         |p AS (SELECT doc_id, substr(nt, 1, $FuzzyPrefixLen) AS pfx FROM nrm),
         |bk AS (
         |  SELECT doc_id, pfx, 0 AS i, substr(pfx, 1, $FuzzyBlockLen) AS k FROM p
         |  UNION ALL
         |  SELECT doc_id, pfx, 1 AS i,
         |    substr(pfx, ${FuzzyBlockLen + 1}, $FuzzyBlockLen) AS k FROM p
         |  UNION ALL
         |  SELECT doc_id, pfx, 2 AS i,
         |    list_aggregate(list_sort(string_split(
         |      substr(pfx, 1, ${2 * FuzzyBlockLen}), '')), 'string_agg', '') AS k
         |  FROM p),
         |bkf AS (SELECT * FROM bk WHERE i = 0 OR k <> ''),
         |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
         |    a.pfx AS pa, b.pfx AS pb
         |  FROM bkf a JOIN bkf b ON a.i = b.i AND a.k = b.k AND a.doc_id < b.doc_id)
         |SELECT ida, idb, levenshtein(pa, pb)::BIGINT AS edit_dist
         |FROM cand WHERE levenshtein(pa, pb) <= $FuzzyMaxDist
         |ORDER BY ida, idb""".stripMargin,

    "d4_dedup_simhash" ->
      s"""WITH $ShingleCtes,
         |$HashCte,
         |xs AS (SELECT doc_id, unnest(hl) AS x FROM hs),
         |sums AS (SELECT doc_id, $simhashSums FROM xs GROUP BY doc_id),
         |fp AS (SELECT doc_id, ($simhashFp)::BIGINT AS f FROM sums)
         |SELECT a.doc_id AS ida, b.doc_id AS idb,
         |  bit_count(xor(a.f, b.f))::BIGINT AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.f, b.f)) <= $MaxHamming
         |ORDER BY ida, idb""".stripMargin,

    // df over window STRINGS; the Spark side keys on the 55-bit hash —
    // identical counts modulo the ~1e-8 birthday bound d2b's oracle
    // already relies on
    "d8_window_dedup" -> {
      val kgram = (0 until WindowK).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split($NormExpr, ' ') AS ws FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(ws) >= $WindowK THEN
         |    list_distinct(list_transform(range(1, len(ws) - ${WindowK - 2}),
         |      i -> $kgram)) ELSE []::VARCHAR[] END AS sg FROM w),
         |x AS (SELECT doc_id, unnest(sg) AS s FROM sh),
         |dfc AS (SELECT s, count(*) AS df FROM x GROUP BY s),
         |pd AS (SELECT doc_id, count(*) AS n_windows,
         |    sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_dup
         |  FROM x JOIN dfc USING (s) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(pd.n_windows, 0)::BIGINT AS n_windows,
         |  coalesce(pd.n_dup, 0)::BIGINT AS n_dup_windows,
         |  CASE WHEN coalesce(pd.n_windows, 0) > 0
         |    THEN pd.n_dup::DOUBLE / pd.n_windows::DOUBLE ELSE 0.0 END AS dup_frac
         |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id""".stripMargin
    },

    // positional dup windows (df over window STRINGS, ≥ 2 docs) merged by
    // the classic gaps-and-islands: break when p > lag(p) + k, islands →
    // min(p)..max(p)+k spans — provably the same maximal spans as the
    // Spark side's sorted-position fold
    "d8b_dup_spans" -> {
      val kgram = (0 until WindowK).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split($NormExpr, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= $WindowK THEN
         |    list_transform(range(1, len(ws) - ${WindowK - 2}),
         |      i -> struct_pack(p := i - 1, s := $kgram))
         |    ELSE []::STRUCT(p BIGINT, s VARCHAR)[] END AS gs FROM w),
         |x0 AS (SELECT doc_id, unnest(gs) AS gg FROM g),
         |x AS (SELECT doc_id, gg.p AS p, gg.s AS s FROM x0),
         |dsh AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS c
         |  FROM x GROUP BY s) WHERE c >= 2),
         |dp AS (SELECT doc_id, p FROM x JOIN dsh USING (s)),
         |i0 AS (SELECT doc_id, p, CASE WHEN
         |    p > coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), p) + $WindowK
         |    THEN 1 ELSE 0 END AS brk FROM dp),
         |i1 AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id
         |    ORDER BY p ROWS UNBOUNDED PRECEDING) AS isl FROM i0),
         |sp AS (SELECT doc_id, isl, min(p) AS s, max(p) + $WindowK AS e,
         |    count(*) AS nw FROM i1 GROUP BY doc_id, isl),
         |pd AS (SELECT doc_id, sum(nw)::BIGINT AS n_dup_windows,
         |    count(*)::BIGINT AS n_spans, sum(e - s)::BIGINT AS dup_tokens,
         |    string_agg(s::VARCHAR || '-' || e::VARCHAR, ',' ORDER BY s) AS spans
         |  FROM sp GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(pd.n_dup_windows, 0)::BIGINT AS n_dup_windows,
         |  coalesce(pd.n_spans, 0)::BIGINT AS n_spans,
         |  coalesce(pd.dup_tokens, 0)::BIGINT AS dup_tokens,
         |  coalesce(pd.spans, '') AS spans
         |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id""".stripMargin
    },

    // benchmark = doc_id % BenchStride = 0; df over window STRINGS (Spark
    // probes 55-bit hashes — the d8 equivalence)
    "d9_decontaminate" -> {
      val kgram = (0 until WindowK).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split($NormExpr, ' ') AS ws FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(ws) >= $WindowK THEN
         |    list_distinct(list_transform(range(1, len(ws) - ${WindowK - 2}),
         |      i -> $kgram)) ELSE []::VARCHAR[] END AS sg FROM w),
         |x AS (SELECT doc_id, unnest(sg) AS s FROM sh),
         |bench AS (SELECT DISTINCT s FROM x WHERE doc_id % $BenchStride = 0),
         |corp AS (SELECT doc_id, s FROM x WHERE doc_id % $BenchStride <> 0),
         |pd AS (SELECT c.doc_id, count(*) AS n_windows,
         |    sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS n_cont
         |  FROM corp c LEFT JOIN bench b USING (s) GROUP BY c.doc_id)
         |SELECT d.doc_id, coalesce(pd.n_windows, 0)::BIGINT AS n_windows,
         |  coalesce(pd.n_cont, 0)::BIGINT AS n_contaminated,
         |  CASE WHEN coalesce(pd.n_windows, 0) > 0
         |    THEN pd.n_cont::DOUBLE / pd.n_windows::DOUBLE ELSE 0.0 END
         |    AS contaminated_frac
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $BenchStride <> 0) d
         |LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id""".stripMargin
    },

    // positional variant: every window OCCURRENCE (start index p) joined
    // against the benchmark's distinct window strings; spans = the sorted
    // contaminated positions, comma-joined (Spark probes 55-bit hashes —
    // the d8/d9 equivalence)
    "d9b_decontaminate_spans" -> {
      val kgram = (0 until WindowK).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split($NormExpr, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= $WindowK THEN
         |    list_transform(range(1, len(ws) - ${WindowK - 2}),
         |      i -> struct_pack(p := i - 1, s := $kgram))
         |    ELSE []::STRUCT(p BIGINT, s VARCHAR)[] END AS gs FROM w),
         |x0 AS (SELECT doc_id, unnest(gs) AS gg FROM g),
         |x AS (SELECT doc_id, gg.p AS p, gg.s AS s FROM x0),
         |sh AS (SELECT doc_id, CASE WHEN len(ws) >= $WindowK THEN
         |    list_distinct(list_transform(range(1, len(ws) - ${WindowK - 2}),
         |      i -> $kgram)) ELSE []::VARCHAR[] END AS sg FROM w),
         |bench AS (SELECT DISTINCT unnest(sg) AS s FROM sh
         |  WHERE doc_id % $BenchStride = 0),
         |pd AS (SELECT c.doc_id, count(*) AS nw,
         |    sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS nc,
         |    string_agg(CASE WHEN b.s IS NOT NULL THEN CAST(c.p AS VARCHAR) END,
         |               ',' ORDER BY c.p) AS spans
         |  FROM (SELECT * FROM x WHERE doc_id % $BenchStride <> 0) c
         |  LEFT JOIN bench b USING (s) GROUP BY c.doc_id)
         |SELECT d.doc_id, coalesce(pd.nw, 0)::BIGINT AS n_windows,
         |  coalesce(pd.nc, 0)::BIGINT AS n_contaminated,
         |  CASE WHEN coalesce(pd.nw, 0) > 0
         |    THEN pd.nc::DOUBLE / pd.nw::DOUBLE ELSE 0.0 END AS contaminated_frac,
         |  coalesce(pd.spans, '') AS spans
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $BenchStride <> 0) d
         |LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id""".stripMargin
    },

    // d9b's contaminated sites folded to maximal spans, covered tokens cut,
    // text rebuilt from the normalized word stream (Spark probes 55-bit
    // hashes — the d8/d9 equivalence)
    "d9c_decontaminate_apply" -> {
      val kgram = (0 until WindowK).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split($NormExpr, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= $WindowK THEN
         |    list_transform(range(1, len(ws) - ${WindowK - 2}),
         |      i -> struct_pack(p := i - 1, s := $kgram))
         |    ELSE []::STRUCT(p BIGINT, s VARCHAR)[] END AS gs FROM w),
         |x0 AS (SELECT doc_id, unnest(gs) AS gg FROM g),
         |x AS (SELECT doc_id, gg.p AS p, gg.s AS s FROM x0),
         |bench AS (SELECT DISTINCT s FROM x WHERE doc_id % $BenchStride = 0),
         |exc AS (SELECT doc_id, p FROM x JOIN bench USING (s)
         |  WHERE doc_id % $BenchStride <> 0),
         |i0 AS (SELECT doc_id, p, CASE WHEN
         |    p > coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), p) + $WindowK
         |    THEN 1 ELSE 0 END AS brk FROM exc),
         |i1 AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id
         |    ORDER BY p ROWS UNBOUNDED PRECEDING) AS isl FROM i0),
         |sp AS (SELECT doc_id, isl, min(p) AS s, max(p) + $WindowK AS e
         |  FROM i1 GROUP BY doc_id, isl),
         |tok AS (SELECT doc_id, unnest(range(len(ws))) AS i, ws FROM w
         |  WHERE doc_id % $BenchStride <> 0),
         |cov AS (SELECT DISTINCT t.doc_id, t.i FROM tok t
         |  JOIN sp ON t.doc_id = sp.doc_id AND t.i >= sp.s AND t.i < sp.e),
         |keep AS (SELECT t.doc_id, t.i, t.ws[t.i + 1] AS tk FROM tok t
         |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.i
         |  WHERE c.i IS NULL),
         |rem AS (SELECT doc_id, sum(e - s) AS n_removed FROM sp GROUP BY doc_id),
         |cl AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS clean_text
         |  FROM keep GROUP BY doc_id)
         |SELECT d.doc_id, len(w.ws)::BIGINT AS n_tokens,
         |  coalesce(rem.n_removed, 0)::BIGINT AS n_removed,
         |  coalesce(cl.clean_text, '') AS clean_text
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $BenchStride <> 0) d
         |JOIN w USING (doc_id)
         |LEFT JOIN rem USING (doc_id) LEFT JOIN cl USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    // d8b's duplicated sites minus each window's canonical (first
    // (doc, p)) occurrence, folded to spans, cut, rebuilt — Lee et al.'s
    // "all but one occurrence" excision policy
    "d12_excise_dups" -> {
      val kgram = (0 until WindowK).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split($NormExpr, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= $WindowK THEN
         |    list_transform(range(1, len(ws) - ${WindowK - 2}),
         |      i -> struct_pack(p := i - 1, s := $kgram))
         |    ELSE []::STRUCT(p BIGINT, s VARCHAR)[] END AS gs FROM w),
         |x0 AS (SELECT doc_id, unnest(gs) AS gg FROM g),
         |x AS (SELECT doc_id, gg.p AS p, gg.s AS s FROM x0),
         |dsh AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS c
         |  FROM x GROUP BY s) WHERE c >= 2),
         |dp AS (SELECT doc_id, p, s FROM x JOIN dsh USING (s)),
         |exc AS (SELECT doc_id, p FROM (SELECT doc_id, p,
         |    row_number() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn
         |  FROM dp) WHERE rn > 1),
         |i0 AS (SELECT doc_id, p, CASE WHEN
         |    p > coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), p) + $WindowK
         |    THEN 1 ELSE 0 END AS brk FROM exc),
         |i1 AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id
         |    ORDER BY p ROWS UNBOUNDED PRECEDING) AS isl FROM i0),
         |sp AS (SELECT doc_id, isl, min(p) AS s, max(p) + $WindowK AS e
         |  FROM i1 GROUP BY doc_id, isl),
         |tok AS (SELECT doc_id, unnest(range(len(ws))) AS i, ws FROM w),
         |cov AS (SELECT DISTINCT t.doc_id, t.i FROM tok t
         |  JOIN sp ON t.doc_id = sp.doc_id AND t.i >= sp.s AND t.i < sp.e),
         |keep AS (SELECT t.doc_id, t.i, t.ws[t.i + 1] AS tk FROM tok t
         |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.i
         |  WHERE c.i IS NULL),
         |rem AS (SELECT doc_id, sum(e - s) AS n_removed FROM sp GROUP BY doc_id),
         |cl AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS clean_text
         |  FROM keep GROUP BY doc_id)
         |SELECT d.doc_id, len(w.ws)::BIGINT AS n_tokens,
         |  coalesce(rem.n_removed, 0)::BIGINT AS n_removed,
         |  coalesce(cl.clean_text, '') AS clean_text
         |FROM documents d JOIN w USING (doc_id)
         |LEFT JOIN rem USING (doc_id) LEFT JOIN cl USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    // batch = doc_id % BatchMod = BatchMod-1; exact dup on normalized text,
    // near dup = exact Jaccard batch×corpus at >= threshold (the Spark side
    // reaches the same set via banded MinHash + verify)
    "d10_incremental_dedup" ->
      s"""WITH $ShingleCtes,
         |nrm AS (SELECT doc_id, $NormExpr AS norm FROM documents),
         |corpn AS (SELECT DISTINCT norm FROM nrm WHERE doc_id % $BatchMod <> ${BatchMod - 1}),
         |ex AS (SELECT DISTINCT b.doc_id FROM nrm b JOIN corpn USING (norm)
         |  WHERE b.doc_id % $BatchMod = ${BatchMod - 1}),
         |shb AS (SELECT doc_id, sg FROM sh
         |  WHERE doc_id % $BatchMod = ${BatchMod - 1} AND len(sg) > 0),
         |shc AS (SELECT doc_id, sg FROM sh
         |  WHERE doc_id % $BatchMod <> ${BatchMod - 1} AND len(sg) > 0),
         |p AS (SELECT b.doc_id AS bid,
         |    len(list_intersect(b.sg, c.sg)) AS common, len(b.sg) na, len(c.sg) nb
         |  FROM shb b CROSS JOIN shc c),
         |jp AS (SELECT bid, common::DOUBLE / (na + nb - common) AS jaccard
         |  FROM p WHERE common::DOUBLE / (na + nb - common) >= $JaccardThr),
         |nn AS (SELECT bid, count(*) AS n_near, max(jaccard) AS mj
         |  FROM jp GROUP BY bid)
         |SELECT d.doc_id,
         |  CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END::BIGINT AS is_exact_dup,
         |  coalesce(nn.n_near, 0)::BIGINT AS n_near,
         |  coalesce(nn.mj, 0.0) AS max_jaccard
         |FROM (SELECT doc_id FROM documents
         |      WHERE doc_id % $BatchMod = ${BatchMod - 1}) d
         |LEFT JOIN ex ON ex.doc_id = d.doc_id
         |LEFT JOIN nn ON nn.bid = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "d5_dedup_embedding" -> CosPairSql,
    // d6 is exact by construction (triangle-inequality pruning has no false
    // negatives), so the ALL-PAIRS oracle checks the pruned plan verbatim
    "d6_dedup_embcell"   -> CosPairSql,

    "d7_dedup_components" ->
      s"""WITH RECURSIVE $JaccardPairCtes,
         |e AS (SELECT ida AS u, idb AS v FROM jp UNION SELECT idb, ida FROM jp),
         |r AS (SELECT u AS id, u AS lbl FROM e
         |  UNION SELECT e.u, r.lbl FROM e JOIN r ON r.id = e.v),
         |cc AS (SELECT id, min(lbl) AS component_id FROM r GROUP BY id),
         |sz AS (SELECT component_id, count(*) AS component_size
         |  FROM cc GROUP BY component_id)
         |SELECT cc.id, cc.component_id, sz.component_size
         |FROM cc JOIN sz USING (component_id) ORDER BY id""".stripMargin,

    // re-derives the FULL curation chain: t2's quality score (identical
    // arithmetic to the hash-verified t2 oracle), exact-dedup canonical
    // keep, d2b's capped Jaccard pairs over the remaining docs (cap
    // relative to THAT corpus), recursive-CTE components, loser removal
    "p1_curate_corpus" -> {
      val en = TextAnalysis.StopwordProfiles.toMap.apply("en")
        .map("'" + _ + "'").mkString("[", ", ", "]")
      s"""WITH RECURSIVE
         |w0 AS (SELECT doc_id, text, string_split($NormExpr, ' ') AS ws FROM documents),
         |q0 AS (SELECT doc_id, text,
         |    least(len(ws)::DOUBLE / 50.0, 1.0) * 0.4
         |    + (len(list_distinct(ws))::DOUBLE / len(ws)::DOUBLE) * 0.3
         |    + least((len(list_filter(ws, x -> list_contains($en, x)))::DOUBLE
         |             / len(ws)::DOUBLE) * 10.0, 1.0) * 0.3 AS quality_score
         |  FROM w0),
         |cur1 AS (SELECT * FROM q0 WHERE quality_score >= $QualityThr),
         |nrm AS (SELECT doc_id, text, quality_score, $NormExpr AS norm FROM cur1),
         |cur2 AS (SELECT doc_id, text, quality_score FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY norm) AS canon FROM nrm)
         |  WHERE doc_id = canon),
         |${shingleCtesFrom("cur2")},
         |${cappedJaccardCtes("cur2")},
         |e AS (SELECT ida AS u, idb AS v FROM jp UNION SELECT idb, ida FROM jp),
         |r AS (SELECT u AS id, u AS lbl FROM e
         |  UNION SELECT e.u, r.lbl FROM e JOIN r ON r.id = e.v),
         |cc AS (SELECT id, min(lbl) AS component_id FROM r GROUP BY id),
         |losers AS (SELECT id FROM cc WHERE id <> component_id)
         |SELECT doc_id, quality_score FROM cur2
         |WHERE doc_id NOT IN (SELECT id FROM losers)
         |ORDER BY doc_id""".stripMargin
    },

    "s1_knn_bruteforce" ->
      s"""WITH $NormCte,
         |q AS (SELECT * FROM n WHERE vec_id % $QueryStride = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${dotSql("q", "c")} / sqrt(q.n2 * c.n2) AS cos
         |  FROM q JOIN n c ON c.vec_id != q.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rank FROM p)
         |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= $KnnK
         |ORDER BY query_id, rank""".stripMargin,

    // full re-derivation of the LSH pipeline: the hyperplane coefficients
    // are integer modular arithmetic (LshSignature.coef), the plane dot is
    // the same 0-seeded sequential fold, sign rule dot > 0, bit p = 1<<p;
    // query probes = own bucket + every 1-bit flip per table; exact-cosine
    // rerank identical to s1's
    "s2_knn_lsh" ->
      s"""WITH $NormCte,
         |pl AS (SELECT t.range AS t, p.range AS p
         |  FROM range(0, $LshTables) t, range(0, $LshPlanes) p),
         |dots AS (SELECT n.vec_id, pl.t, pl.p,
         |    list_reduce(list_transform(range(1, ${CosDim + 1}),
         |      i -> n.embedding[i]::DOUBLE *
         |        (((((pl.t * $LshPlanes + pl.p) * 2 + 3) * i * 7919
         |           + (pl.t * $LshPlanes + pl.p) * 104729 + 13) % 1009) - 504)::DOUBLE),
         |      (a, b) -> a + b) AS dot
         |  FROM n CROSS JOIN pl),
         |sig AS (SELECT vec_id, t,
         |    sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS b
         |  FROM dots GROUP BY vec_id, t),
         |qsig AS (SELECT * FROM sig WHERE vec_id % $QueryStride = 0),
         |probes AS (SELECT vec_id, t, b FROM qsig
         |  UNION ALL
         |  SELECT q.vec_id, q.t, xor(q.b, (1::BIGINT << p.range))
         |  FROM qsig q, range(0, $LshPlanes) p),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM probes q JOIN sig c ON q.t = c.t AND q.b = c.b AND c.vec_id <> q.vec_id),
         |scored AS (SELECT cand.query_id, cand.neighbor_id,
         |    ${dotSql("a", "b")} / sqrt(a.n2 * b.n2) AS cos
         |  FROM cand JOIN n a ON a.vec_id = cand.query_id
         |            JOIN n b ON b.vec_id = cand.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
         |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= $LshK
         |ORDER BY query_id, rank""".stripMargin,

    // the identical trained codebook + assignment as s3, then within-cell
    // pairs at >= CosThr, recursive-CTE components, and the paper's
    // keep-least-similar-to-centroid policy (ties to the lowest id)
    "p5_semdedup" ->
      s"""WITH RECURSIVE $NormCte,
         |$KmeansCtes,
         |cent AS (SELECT cid, cv, list_reduce(list_transform(range(1, ${CosDim + 1}),
         |    i -> cv[i] * cv[i]), (a, b) -> a + b) AS n2 FROM cent$KmeansIters),
         |ac AS (SELECT v.vec_id, v.embedding, v.n2, c.cid,
         |    list_reduce(list_transform(range(1, ${CosDim + 1}),
         |      i -> v.embedding[i]::DOUBLE * c.cv[i]), (a, b) -> a + b)
         |      / sqrt(v.n2 * c.n2) AS ccos
         |  FROM n v CROSS JOIN cent c),
         |asn0 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid) AS rn FROM ac),
         |asn AS (SELECT vec_id, embedding, n2, cid AS cell, ccos
         |  FROM asn0 WHERE rn = 1),
         |p AS (SELECT a.vec_id AS ida, b.vec_id AS idb
         |  FROM asn a JOIN asn b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${dotSql("a", "b")} / sqrt(a.n2 * b.n2) >= $CosThr),
         |e AS (SELECT ida AS u, idb AS v FROM p UNION SELECT idb, ida FROM p),
         |r AS (SELECT u AS id, u AS lbl FROM e
         |  UNION SELECT e.u, r.lbl FROM e JOIN r ON r.id = e.v),
         |cc AS (SELECT id, min(lbl) AS cl FROM r GROUP BY id),
         |mem AS (SELECT cc.id, cc.cl, asn.ccos FROM cc
         |  JOIN asn ON asn.vec_id = cc.id),
         |kp AS (SELECT cl, id AS keep_id FROM (SELECT *, row_number()
         |    OVER (PARTITION BY cl ORDER BY ccos, id) AS krn FROM mem)
         |  WHERE krn = 1),
         |sz AS (SELECT cl, count(*) AS csz FROM cc GROUP BY cl)
         |SELECT asn.vec_id, asn.cell AS cell,
         |  coalesce(cc.cl, asn.vec_id) AS cluster_id,
         |  coalesce(sz.csz, 1)::BIGINT AS cluster_size,
         |  (CASE WHEN cc.id IS NULL OR kp.keep_id = asn.vec_id
         |    THEN 1 ELSE 0 END)::BIGINT AS keep
         |FROM asn LEFT JOIN cc ON cc.id = asn.vec_id
         |LEFT JOIN sz ON sz.cl = cc.cl
         |LEFT JOIN kp ON kp.cl = cc.cl
         |ORDER BY asn.vec_id""".stripMargin,

    // s4: the PQ pipeline re-run end to end — subspace codebooks (L2
    // Lloyd rounds), dense codes, ADC lookup tables, ascending-m fold,
    // shortlist, exact rerank of the shortlist only
    "s4_knn_pq" ->
      s"""WITH $NormCte,
         |$PqCtes,
         |ps AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    list_reduce(list_transform(range(0, 4),
         |      m -> q.ftab[m * 16 + c.codes[m + 1] + 1]), (a, b) -> a + b)
         |      / sqrt(n.n2 * c.rn2) AS adc_cos
         |  FROM qf q JOIN n ON n.vec_id = q.query_id, cw c
         |  WHERE c.vec_id <> q.query_id),
         |sl AS (SELECT query_id, neighbor_id, adc_cos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc_cos DESC, neighbor_id) AS sr FROM ps)
         |  WHERE sr <= 20),
         |rr AS (SELECT sl.query_id, sl.neighbor_id, sl.adc_cos,
         |    ${dotSql("a", "b")} / sqrt(a.n2 * b.n2) AS cos
         |  FROM sl JOIN n a ON a.vec_id = sl.query_id
         |           JOIN n b ON b.vec_id = sl.neighbor_id)
         |SELECT query_id, rank, neighbor_id, cos, adc_cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rank FROM rr)
         |WHERE rank <= $KnnK
         |ORDER BY query_id, rank""".stripMargin,

    // s5: the IVF∘PQ composition re-run end to end — BOTH trainings
    // (coarse Lloyd rounds from s3's CTEs, per-subspace Lloyd rounds from
    // s4's), cell assignment, per-query probes, the ADC scan restricted
    // to probed cells via the cell join, shortlist, exact rerank
    // s6: the s5 pipeline with residual PQ — the coarse stage is
    // identical; probes carry the raw query↔centroid dot (qc), codes
    // train/encode over residuals with the exact reconstruction norm
    // xn2, and the scan scores (qc + ADC)/√(qn²·xn²) — the dot of a
    // sum is the sum of dots, so no per-cell table correction exists
    "s6_knn_ivfpq_residual" ->
      s"""WITH $NormCte,
         |$KmeansCtes,
         |cent AS (SELECT cid, cv, list_reduce(list_transform(range(1, ${CosDim + 1}),
         |    i -> cv[i] * cv[i]), (a, b) -> a + b) AS n2 FROM cent$KmeansIters),
         |ac AS (SELECT v.vec_id, v.n2, c.cid, c.n2 AS cn2,
         |    list_reduce(list_transform(range(1, ${CosDim + 1}),
         |      i -> v.embedding[i]::DOUBLE * c.cv[i]), (a, b) -> a + b) AS qc
         |  FROM n v CROSS JOIN cent c),
         |ac2 AS (SELECT vec_id, cid, qc, qc / sqrt(n2 * cn2) AS ccos FROM ac),
         |asn AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM ac2) WHERE rn = 1),
         |pr AS (SELECT vec_id AS query_id, cid AS cell, qc FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM ac2
         |    WHERE vec_id % $QueryStride = 0) WHERE rn <= $IvfProbes),
         |resv AS (SELECT v.vec_id, a.cell, c.n2 AS celln2, c.cv AS ccv,
         |    list_transform(range(1, ${CosDim + 1}),
         |      i -> v.embedding[i]::DOUBLE - c.cv[i]) AS rv
         |  FROM n v JOIN asn a ON a.vec_id = v.vec_id
         |    JOIN cent c ON c.cid = a.cell),
         |$PqResidualCtes,
         |ps AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |    (p.qc + list_reduce(list_transform(range(0, 4),
         |      m -> q.ftab[m * 16 + c.codes[m + 1] + 1]), (a, b) -> a + b))
         |      / sqrt(n.n2 * c.xn2) AS adc_cos
         |  FROM pr p JOIN rqf q ON q.query_id = p.query_id
         |    JOIN n ON n.vec_id = p.query_id
         |    JOIN rcw c ON c.cell = p.cell AND c.vec_id <> p.query_id),
         |sl AS (SELECT query_id, neighbor_id, adc_cos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc_cos DESC, neighbor_id) AS sr FROM ps)
         |  WHERE sr <= 20),
         |rr AS (SELECT sl.query_id, sl.neighbor_id, sl.adc_cos,
         |    ${dotSql("a", "b")} / sqrt(a.n2 * b.n2) AS cos
         |  FROM sl JOIN n a ON a.vec_id = sl.query_id
         |           JOIN n b ON b.vec_id = sl.neighbor_id)
         |SELECT query_id, rank, neighbor_id, cos, adc_cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rank FROM rr)
         |WHERE rank <= $KnnK
         |ORDER BY query_id, rank""".stripMargin,

    "s5_knn_ivfpq" ->
      s"""WITH $NormCte,
         |$KmeansCtes,
         |$PqCtes,
         |cent AS (SELECT cid, cv, list_reduce(list_transform(range(1, ${CosDim + 1}),
         |    i -> cv[i] * cv[i]), (a, b) -> a + b) AS n2 FROM cent$KmeansIters),
         |ac AS (SELECT v.vec_id, v.n2, c.cid,
         |    list_reduce(list_transform(range(1, ${CosDim + 1}),
         |      i -> v.embedding[i]::DOUBLE * c.cv[i]), (a, b) -> a + b)
         |      / sqrt(v.n2 * c.n2) AS ccos
         |  FROM n v CROSS JOIN cent c),
         |asn AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM ac) WHERE rn = 1),
         |pr AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM ac
         |    WHERE vec_id % $QueryStride = 0) WHERE rn <= $IvfProbes),
         |cwc AS (SELECT c.vec_id, c.codes, c.rn2, a.cell
         |  FROM cw c JOIN asn a ON a.vec_id = c.vec_id),
         |ps AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |    list_reduce(list_transform(range(0, 4),
         |      m -> q.ftab[m * 16 + c.codes[m + 1] + 1]), (a, b) -> a + b)
         |      / sqrt(n.n2 * c.rn2) AS adc_cos
         |  FROM pr p JOIN qf q ON q.query_id = p.query_id
         |    JOIN n ON n.vec_id = p.query_id
         |    JOIN cwc c ON c.cell = p.cell AND c.vec_id <> p.query_id),
         |sl AS (SELECT query_id, neighbor_id, adc_cos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc_cos DESC, neighbor_id) AS sr FROM ps)
         |  WHERE sr <= 20),
         |rr AS (SELECT sl.query_id, sl.neighbor_id, sl.adc_cos,
         |    ${dotSql("a", "b")} / sqrt(a.n2 * b.n2) AS cos
         |  FROM sl JOIN n a ON a.vec_id = sl.query_id
         |           JOIN n b ON b.vec_id = sl.neighbor_id)
         |SELECT query_id, rank, neighbor_id, cos, adc_cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rank FROM rr)
         |WHERE rank <= $KnnK
         |ORDER BY query_id, rank""".stripMargin,

    "s3_knn_ivf" ->
      s"""WITH $NormCte,
         |$KmeansCtes,
         |cent AS (SELECT cid, cv, list_reduce(list_transform(range(1, ${CosDim + 1}),
         |    i -> cv[i] * cv[i]), (a, b) -> a + b) AS n2 FROM cent$KmeansIters),
         |ac AS (SELECT v.vec_id, v.embedding, v.n2, c.cid,
         |    list_reduce(list_transform(range(1, ${CosDim + 1}),
         |      i -> v.embedding[i]::DOUBLE * c.cv[i]), (a, b) -> a + b)
         |      / sqrt(v.n2 * c.n2) AS ccos
         |  FROM n v CROSS JOIN cent c),
         |asn0 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid) AS rn FROM ac),
         |asn AS (SELECT vec_id, embedding, n2, cid AS cell FROM asn0 WHERE rn = 1),
         |pr0 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid) AS rn FROM ac WHERE vec_id % $QueryStride = 0),
         |pr AS (SELECT vec_id AS query_id, embedding, n2, cid AS cell
         |  FROM pr0 WHERE rn <= $IvfProbes),
         |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |    ${dotSql("p", "a")} / sqrt(p.n2 * a.n2) AS cos
         |  FROM pr p JOIN asn a ON p.cell = a.cell AND a.vec_id <> p.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rank FROM cand)
         |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= $LshK
         |ORDER BY query_id, rank""".stripMargin
  )
}
