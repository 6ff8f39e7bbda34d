package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash._

/** Deduplication suite for large-scale text corpora (SURVEY.md §2c) —
  * exact, n-gram Jaccard, MinHash+LSH, and SimHash near-dup detection.
  *
  * Algorithms follow the published literature: MinHash resemblance
  * estimation (Broder, "On the resemblance and containment of documents",
  * 1997), LSH banding (Indyk & Motwani 1998; the b-band/r-row S-curve as
  * in Mining of Massive Datasets ch. 3), SimHash fingerprints (Charikar
  * 2002) with the pigeonhole band-partition search of Manku, Jain & Das
  * Sarma ("Detecting near-duplicates for web crawling", WWW 2007).
  *
  * Scale design (100 TB corpus):
  *   - exact dedup is a hash-groupBy — one shuffle on the normalized text
  *     (production: shuffle on a 128-bit content hash instead of the full
  *     string to keep shuffle rows narrow);
  *   - n-gram pairs use the shingle POSTING-LIST self-join — explode is
  *     map-side, the only shuffle keys on the shingle; `maxShingleDf` drops
  *     ubiquitous shingles (df cap) to bound posting-list blowup — the
  *     standard trick for power-law corpora;
  *   - MinHash+LSH reduces candidates from O(n²) to near-linear: signature
  *     → per-band bucket → intra-bucket pairs → EXACT Jaccard verify, so
  *     false positives are filtered and (with bandRows=1, k=32 bands) the
  *     miss probability for sim ≥ 0.5 pairs is (1-s)^32 < 1e-9 — the
  *     verified output equals the exact-threshold pair set;
  *   - SimHash buckets by fingerprint band (4 bands × 8 bits): any pair at
  *     Hamming distance ≤ 3 shares at least one full band (pigeonhole), so
  *     banding loses NOTHING while cutting the join to near-linear.
  */
object Dedup {

  /** d1: exact duplicate groups on normalized text. One row per doc with
    * its canonical (minimum) doc id and group size.
    *
    * @param hashShuffleKey default true: the window partitions on
    *   `xxhash64(norm)` so the shuffle ships 8-byte keys, and column
    *   pruning drops the text entirely — the rows in flight are
    *   (id, hash). Two distinct texts colliding would merge groups; at
    *   64 bits that is P ≈ n²/2⁶⁵ (1e-7 at a BILLION docs), and the
    *   hash is deterministic so results are reproducible either way.
    *   Pass false to shuffle on the full normalized string (bitwise
    *   guarantee, wide shuffle rows). */
  def exactGroups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      hashShuffleKey: Boolean = true): DataFrame = {
    val key = if (hashShuffleKey) xxhash64(col("__norm")) else col("__norm")
    val w = Window.partitionBy(key)
    docs
      .withColumn("__norm", normText(col(textCol)))
      .select(
        col(idCol),
        min(col(idCol)).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("group_size"))
  }

  /** The whale-safe form of [[exactGroups]], same output (spec-asserted):
    * a two-phase aggregate + join instead of a window. A mass-duplicated
    * corpus (one text owning half the rows) puts half the data in ONE
    * window partition that nothing can split; here the duplicate group
    * collapses map-side in the partial aggregation (one row per partition
    * per text reaches the shuffle), and the join back on the hash is
    * AQE-skew-splittable like any key join. Prefer this at scale;
    * [[exactGroups]] stays the reference formulation. */
  def exactGroupsAgg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = docs.select(col(idCol), xxhash64(normText(col(textCol))).as("__h"))
    val groups = keyed.groupBy(col("__h")).agg(
      min(col(idCol)).as("canonical_id"),
      count(lit(1)).as("group_size"))
    keyed.join(groups, Seq("__h"))
      .select(col(idCol), col("canonical_id"), col("group_size"))
  }

  /** Per-doc distinct shingle-string arrays (the shared input of the
    * near-dup operators). Output: idCol, sg (array<string>), n_sh. */
  def shingleDocs(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .withColumn("sg", shingleSet(col(textCol), n))
      .select(col(idCol), col("sg"), size(col("sg")).as("n_sh"))

  /** d2: n-gram Jaccard near-dup pairs via posting lists.
    *
    * @param maxShingleDf optional document-frequency cap: shingles appearing
    *   in more than this many docs are dropped from posting lists AND from
    *   the per-doc set sizes (both sides of the Jaccard stay consistent).
    *   None = exact Jaccard on full sets (what the SQL oracle computes).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Long] = None,
      checkpointPostings: Boolean = true): DataFrame = {
    // one native pass: distinct 55-bit window-hash set per doc — no
    // shingle STRING is ever materialized; posting lists, set sizes, and
    // the self-join all run on 8-byte longs (collision odds ~1e-8 — see
    // TextHash.wideHash; value-equal to hashing the string shingle set)
    val sh = docs
      .select(col(idCol), windowHashSet(col(textCol), n).as("sgh"))
      .select(col(idCol), col("sgh"), size(col("sgh")).as("n_sh"))
    val posting0 = sh.select(col(idCol).as("__id"), explode(col("sgh")).as("__sh"))
    val posting = maxShingleDf match {
      case Some(cap) =>
        // anti-join against the OVER-cap set, which is mathematically tiny:
        // shingles with df > n/k number at most k·(avg shingles per doc),
        // independent of corpus size — so it broadcasts at any scale,
        // and the posting lists are not shuffled a second time
        val drop = posting0.groupBy("__sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap).select("__sh")
        // three consumers (sizes + both join sides): materialize the
        // filtered postings once instead of re-running shingle + anti-join
        // for the sizes branch (the join sides dedupe via exchange reuse);
        // checkpointPostings=false keeps the plan inspectable for audits
        val filtered = posting0.join(broadcast(drop), Seq("__sh"), "left_anti")
        if (checkpointPostings) filtered.localCheckpoint(eager = false) else filtered
      case None => posting0
    }
    val sizes = maxShingleDf match {
      case Some(_) => posting.groupBy(col("__id")).agg(count(lit(1)).as("n_sh"))
      case None    => sh.select(col(idCol).as("__id"), col("n_sh"))
    }
    // pair generation: posting-list self-join on the 8-byte shingle hash.
    // (A collect_list + combination-explode variant was measured ~20%
    // SLOWER here: the object aggregation buffers cost more than the
    // second shuffle copy of 16-byte posting rows. The join also gets
    // AQE exchange reuse — the postings physically shuffle once.)
    val common = posting.as("a")
      .join(posting.as("b"),
        col("a.__sh") === col("b.__sh") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("ida"), col("b.__id").as("idb"))
      .agg(count(lit(1)).as("__common"))
    common
      .join(sizes.select(col("__id").as("ida"), col("n_sh").as("__na")), "ida")
      .join(sizes.select(col("__id").as("idb"), col("n_sh").as("__nb")), "idb")
      .withColumn("jaccard",
        col("__common").cast("double") / (col("__na") + col("__nb") - col("__common")))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), col("jaccard"))
  }

  /** d3: MinHash + LSH candidates, exact-Jaccard verified.
    *
    * Banded signature: k = bands·bandRows minhashes; a pair is a candidate
    * iff some band's bandRows values ALL collide. Candidate probability at
    * similarity s is 1-(1-s^r)^b — the classic S-curve. Defaults (b=24,
    * r=3): a true pair at s=0.8 is missed with p=(1-0.512)^24 ≈ 3e-8,
    * while background pairs at s≈0.05 survive with p ≈ 3e-3 — the
    * candidate set is near-linear in corpus size instead of O(n²).
    * Verification recomputes Jaccard on the shingle STRINGS, so the output
    * is exactly the ≥ threshold pair set (minus the negligible LSH miss).
    *
    * bandRows=1 degrades to any-single-collision banding — maximal recall
    * but at word-salad similarity levels the candidate set approaches all
    * pairs; r≥2 is what makes LSH near-linear (SURVEY.md §5). */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bands: Int,
      bandRows: Int,
      threshold: Double): DataFrame = {
    val k = bands * bandRows
    // two native passes, zero shingle strings: the NARROW (1e9+7) hash
    // set feeds the minhash signature (value-identical to the historical
    // shingleHashes-of-string-set input), the WIDE (55-bit) set feeds the
    // exact-Jaccard verify (the repo-wide ~1e-8 string↔hash equivalence —
    // narrow intersects would admit ~1e-5 spurious common elements per
    // pair, enough to flip a borderline jaccard vs the oracle)
    val shN = docs
      .select(col(idCol), windowHashSetNarrow(col(textCol), n).as("__sgn"))
      .filter(size(col("__sgn")) > 0)
    val shW = docs
      .select(col(idCol), windowHashSet(col(textCol), n).as("sgh"))
      .select(col(idCol), col("sgh"), size(col("sgh")).as("n_sh"))
    // band key = the band's r consecutive signature values (1-based slice)
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band") +:
        (0 until bandRows).map(r => element_at(col("__sig"), b * bandRows + r + 1).as(s"v$r")): _*)
    }: _*)
    val sigs = shN
      .withColumn("__sig", minhashSig(col("__sgn"), k))
      .select(col(idCol).as("__id"), explode(bandStructs).as("__bk"))
    val cands = sigs.as("a")
      .join(sigs.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("ida"), col("b.__id").as("idb"))
      .distinct()
    val withSets = cands
      .join(shW.select(col(idCol).as("ida"), col("sgh").as("__sga"), col("n_sh").as("__na")), "ida")
      .join(shW.select(col(idCol).as("idb"), col("sgh").as("__sgb"), col("n_sh").as("__nb")), "idb")
      .withColumn("__common", size(array_intersect(col("__sga"), col("__sgb"))))
      .withColumn("jaccard",
        col("__common").cast("double") / (col("__na") + col("__nb") - col("__common")))
      .filter(col("jaccard") >= threshold)
    withSets.select(col("ida"), col("idb"), col("jaccard"))
  }

  /** Default simhash width: 52 bits = 4 lossless bands × 13 under the
    * Hamming ≤ 3 contract, every bit fully uniform under the 55-bit
    * wide-hash input space. WHY not 32: the r3 scaling run measured d4
    * superlinear (12.4× time at 10× docs) — 8-bit bands collide for
    * random fingerprint pairs at p = 4/2⁸, a quadratic chance-candidate
    * term; 13-bit bands cut that constant 32× (and the old 1e9+7 shingle
    * hashes left bits ≥ 30 constant-zero, silently halving one band's
    * entropy). Scale the width with log₂(corpus) if Hamming stays ≤ 3. */
  val SimHashBits: Int = 52

  /** SimHash fingerprints: one `bits`-wide fingerprint per doc from its
    * distinct WIDE (55-bit) shingle hashes, computed by the native typed
    * aggregate [[graft.plans.SimHashAgg]] — the shingle arrays are folded
    * in place, never exploded into rows, with map-side partials and an
    * O(bits) merge. Docs with zero shingles get no fingerprint (callers
    * guarantee non-empty text). */
  /** d8: exact substring-window duplicate COVERAGE (the corpus-level
    * measure of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", 2021: how much of each document is text that occurs
    * verbatim elsewhere). A doc's k-word windows (distinct, via the
    * native [[graft.functions.TextHash.shingleSet]]) are posted against
    * the corpus; a window is DUPLICATED when ≥ 2 docs contain it.
    * Output per doc: distinct window count, duplicated-window count, and
    * the duplicated fraction — docs shorter than k words keep a 0-row.
    *
    * Scale: explode is map-side; the df aggregation and the posting join
    * both key on the 55-bit window hash (8-byte shuffle rows, same
    * string↔hash equivalence as d2b's cap — exact up to a ~1e-8 birthday
    * bound that only ever perturbs counts, never crashes). Wordcount
    * shape throughout: map-side partials, near-linear at any corpus
    * size. Unlike d2 nothing is quadratic even on a pathological corpus —
    * per-window work is O(df), aggregated, not joined pairwise. */
  def windowDupStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    // one native pass per doc: positional hashes → distinct hash set —
    // no window STRING is ever materialized (distinct-by-hash equals
    // distinct-by-string modulo the accepted ~1e-8 birthday bound)
    val posts = docs
      .select(col(idCol), explode(array_distinct(
        transform(positionalWindowHashes(col(textCol), k),
          g => g.getField("h")))).as("__h"))
    val dfCounts = posts.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    val perDoc = posts
      .join(dfCounts, "__h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        when(col("n_windows") > 0,
          col("n_dup_windows").cast("double") / col("n_windows").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** d9: benchmark DECONTAMINATION (the eval-leakage check every training
    * corpus needs — Brown et al. 2020 §4 run exactly this before training):
    * per corpus doc, how many of its k-word windows occur verbatim in the
    * benchmark/eval set. Downstream policy (drop the doc, or excise the
    * overlapping spans) keys off `n_contaminated`/`contaminated_frac`.
    *
    * Scale: eval suites are bounded (millions of windows) while the corpus
    * is not — so the benchmark's DISTINCT window hashes are BROADCAST and
    * the corpus side never shuffles for the probe; the only shuffle is the
    * per-doc count aggregation on the doc id (map-side partials). Window
    * identity is the 55-bit [[graft.functions.TextHash.wideHash]], the
    * same string↔hash equivalence (≈1e-8 birthday bound) the d2b/d8
    * oracles already accept. Set `broadcastBench = false` if the
    * benchmark outgrows broadcast range — the probe degrades to a plain
    * 8-byte-key equi-join, still wordcount-shaped. */
  def contaminationStats(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      broadcastBench: Boolean = true): DataFrame = {
    // benchmark windows need no id column — the bench frame only has to
    // carry `textCol` (any schema around it is fine). Both sides use the
    // native one-pass window hasher: no window string is materialized.
    def hashSet(c: org.apache.spark.sql.Column) = array_distinct(
      transform(positionalWindowHashes(c, k), g => g.getField("h")))
    val benchSet0 = benchmark
      .select(explode(hashSet(col(textCol))).as("__h")).distinct()
      .withColumn("__hit", lit(1L))
    val benchSet = if (broadcastBench) broadcast(benchSet0) else benchSet0
    val perDoc = docs
      .select(col(idCol), explode(hashSet(col(textCol))).as("__h"))
      .join(benchSet, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated_frac",
        when(col("n_windows") > 0,
          col("n_contaminated").cast("double") / col("n_windows").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** d9b: [[contaminationStats]] with WINDOW POSITIONS — the executable
    * form of the "excise the overlapping span" policy: per corpus doc,
    * every k-word window START INDEX (0-based, over the normalized word
    * sequence) whose window occurs verbatim in the benchmark set, as a
    * sorted comma-joined list. Windows here are POSITIONAL (one row per
    * occurrence, so `n_windows = max(len-k+1, 0)`), unlike the distinct-set
    * counts of [[contaminationStats]] — a doc repeating a contaminated
    * window reports every site to cut.
    *
    * Scale shape is unchanged from d9: the benchmark's distinct window
    * hashes broadcast, the corpus explode is map-side, and the only
    * shuffle is the per-doc aggregation; positions add O(1) per window
    * row. The span list itself is bounded by the doc's window count —
    * per-doc state, same class as any collect over one document. */
  def contaminationSpans(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val benchSet = broadcast(
      benchmark.select(explode(array_distinct(
          transform(positionalWindowHashes(col(textCol), k),
            g => g.getField("h")))).as("__h")).distinct()
        .withColumn("__hit", lit(1L)))
    val perDoc = docs
      .select(col(idCol),
        explode(positionalWindowHashes(col(textCol), k)).as("__g"))
      .select(col(idCol), col("__g.p").as("__p"), col("__g.h").as("__h"))
      .join(benchSet, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__hit").isNotNull, col("__p")))),
            p => p.cast("string")),
          ",").as("spans"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(coalesce(col("n_windows"), lit(0L)) > 0,
          col("n_contaminated").cast("double") / col("n_windows").cast("double"))
          .otherwise(lit(0.0)).as("contaminated_frac"),
        coalesce(col("spans"), lit("")).as("spans"))
  }

  /** d8b: MAXIMAL DUPLICATED SPANS — the excision unit of Lee et al.
    * 2021's exact-substring dedup: where [[windowDupStats]] reports HOW
    * MUCH of a doc is duplicated text, this reports WHERE. Every
    * positional k-word window occurring verbatim in ≥ 2 docs is a dup
    * site; overlapping and token-adjacent sites merge (gaps-and-islands:
    * window [p, p+k) joins the open span [s, e) iff p ≤ e) into maximal
    * `start-end` token spans (0-based, end-exclusive, over the normalized
    * word sequence) — what a cut-the-span pass actually consumes. Output
    * per doc: positional dup-window count, span count, tokens covered,
    * and the sorted comma-joined span list ('' when clean).
    *
    * Scale: identical shape to d8 — map-side native window hashing, df
    * agg and posting join on 8-byte hashes, one per-doc aggregation. The
    * merge itself is a single fold over each doc's SORTED dup positions
    * (per-doc state, bounded by the doc's window count) in one projection
    * after the agg — no extra shuffle, no window-function pass. */
  def duplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    // df over per-doc DISTINCT hashes (a doc counts once per window)
    val distinctPosts = docs
      .select(col(idCol), explode(array_distinct(
        transform(positionalWindowHashes(col(textCol), k),
          g => g.getField("h")))).as("__h"))
    val dupSet = distinctPosts
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
      .select(col("__h"))
    // every positional occurrence of a duplicated window is a cut site
    val dupPos = docs
      .select(col(idCol),
        explode(positionalWindowHashes(col(textCol), k)).as("__g"))
      .select(col(idCol), col("__g.p").cast("long").as("__p"), col("__g.h").as("__h"))
      .join(dupSet, Seq("__h"))
    val perDoc = dupPos
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_dup_windows"),
        array_sort(collect_list(col("__p"))).as("__ps"))
      .withColumn("__sp", mergeWindowSpans(col("__ps"), k))
      .select(
        col(idCol),
        col("n_dup_windows"),
        size(col("__sp")).cast("long").as("n_spans"),
        coalesce(aggregate(col("__sp"), lit(0L),
          (t, s) => t + s.getField("e") - s.getField("s")), lit(0L)).as("dup_tokens"),
        array_join(transform(col("__sp"),
          s => concat(s.getField("s").cast("string"), lit("-"),
            s.getField("e").cast("string"))), ",").as("spans"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("spans"), lit("")).as("spans"))
  }

  /** Gaps-and-islands fold shared by the span reporters and the excision
    * appliers: SORTED window start positions → merged maximal `[s, e)`
    * token spans (window `[p, p+k)` joins the open span iff `p ≤ e`).
    * One `aggregate` HOF over a per-doc array — codegen'd, no extra
    * shuffle, state bounded by the doc's window count. */
  private def mergeWindowSpans(sortedPs: Column, k: Int): Column = {
    val spanType = "array<struct<s: bigint, e: bigint>>"
    def acc(sp: Column, cs: Column, ce: Column) =
      struct(sp.as("sp"), cs.as("cs"), ce.as("ce"))
    val folded = aggregate(
      sortedPs,
      acc(array().cast(spanType), lit(-1L), lit(-1L)),
      (a, p) => {
        val (sp, cs, ce) = (a.getField("sp"), a.getField("cs"), a.getField("ce"))
        when(cs < 0, acc(sp, p, p + k))                 // open the first span
          .when(p <= ce, acc(sp, cs, p + k))            // overlap/adjacent: extend
          .otherwise(acc(                               // gap: close and reopen
            concat(sp, array(struct(cs.as("s"), ce.as("e")))), p, p + k))
      },
      a => when(a.getField("cs") < 0, a.getField("sp"))
        .otherwise(concat(a.getField("sp"),
          array(struct(a.getField("cs").as("s"), a.getField("ce").as("e"))))))
    folded
  }

  /** Shared rebuild step of the excision appliers: given per-doc merged
    * spans (`__sp`, possibly null from a left join), cut the covered
    * tokens out of the NORMALIZED word sequence and re-join. The output
    * contract is over the normalized token stream — the span positions'
    * domain — so excision composes with every window operator above
    * without an offset mapping back into raw text. Pure HOF projection:
    * `O(tokens × spans)` per doc, map-side, zero shuffle. */
  private def exciseProjection(
      docs: DataFrame, spans: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // MATERIALIZE the normalized words as an attribute before the HOFs:
    // `element_at(<wordsOf expr>, i)` inside the rebuild lambda would
    // re-run the normalize-regex + split PER TOKEN (O(tokens²) regex
    // work per doc — measured 6–8× the whole reporter's wall time);
    // bound to a column the array is computed once per row and the
    // lambdas index into it
    val joined = docs.join(spans, Seq(idCol), "left")
      .withColumn("__sp", coalesce(col("__sp"),
        array().cast("array<struct<s: bigint, e: bigint>>")))
      .withColumn("__ws", wordsOf(col(textCol)))
    val ws = col("__ws")
    val keepIdx = filter(
      sequence(lit(0), size(ws) - 1),
      i => !exists(col("__sp"),
        s => i.cast("long") >= s.getField("s") && i.cast("long") < s.getField("e")))
    joined.select(
      col(idCol),
      size(ws).cast("long").as("n_tokens"),
      coalesce(aggregate(col("__sp"), lit(0L),
        (t, s) => t + s.getField("e") - s.getField("s")), lit(0L)).as("n_removed"),
      array_join(transform(keepIdx, i => element_at(ws, i + 1)), " ")
        .as("clean_text"))
  }

  /** d12: DUPLICATE-SPAN EXCISION — the rewrite step that makes
    * [[duplicateSpans]]' report actionable (Lee et al. 2021 excise "all
    * but one occurrence of each duplicated substring"; this is that
    * policy at window granularity): every positional occurrence of a
    * cross-doc duplicated k-word window EXCEPT its globally CANONICAL
    * occurrence — the minimal `(doc, position)`, so exactly one site of
    * each duplicated window survives, deterministically — is an excision
    * site; sites merge gaps-and-islands into maximal spans and the
    * covered tokens are cut, the remainder re-joined. Output per doc:
    * token count, tokens removed, and the excised text (normalized token
    * stream — the spans' domain).
    *
    * Scale: identical shape to d8b — map-side native window hashing, df
    * agg and posting join on 8-byte hashes, ONE extra aggregation for
    * the per-window canonical site (`min(struct(doc, p))`, map-side
    * partials), one per-doc fold, HOF rebuild projection. Nothing
    * pairwise, nothing quadratic. */
  def exciseDuplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    // cross-doc duplicated windows (the d8/d8b df rule: ≥ 2 DOCS)
    val distinctPosts = docs
      .select(col(idCol), explode(array_distinct(
        transform(positionalWindowHashes(col(textCol), k),
          g => g.getField("h")))).as("__h"))
    val dupSet = distinctPosts
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
      .select(col("__h"))
    val occ = docs
      .select(col(idCol),
        explode(positionalWindowHashes(col(textCol), k)).as("__g"))
      .select(col(idCol), col("__g.p").cast("long").as("__p"), col("__g.h").as("__h"))
      .join(dupSet, Seq("__h"))
    // the one surviving site per duplicated window: minimal (doc, p)
    val canon = occ
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("d"), col("__p").as("p"))).as("__c"))
    val excised = occ
      .join(canon, Seq("__h"))
      .filter(!(col(idCol) === col("__c.d") && col("__p") === col("__c.p")))
    val spans = excised
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("__p"))).as("__ps"))
      .select(col(idCol), mergeWindowSpans(col("__ps"), k).as("__sp"))
    exciseProjection(docs, spans, idCol, textCol)
  }

  /** d9c: DECONTAMINATION APPLY — the excision form of
    * [[contaminationSpans]]' report (the "excise the overlapping span"
    * policy of Brown et al. 2020 §4 run for real): every k-word window
    * occurring verbatim in the benchmark set is cut from the corpus doc
    * — no canonical-keep here, leaked eval text has no legitimate
    * occurrence — sites merged to maximal spans, covered tokens removed,
    * the remainder re-joined. Output per doc: token count, tokens
    * removed, and the decontaminated text (normalized token stream).
    *
    * Scale shape is d9b's: the benchmark's distinct window hashes
    * BROADCAST, the corpus explode is map-side, the only shuffle is the
    * per-doc span aggregation; the rebuild is a map-side HOF projection. */
  def exciseContamination(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val benchSet = broadcast(
      benchmark.select(explode(array_distinct(
          transform(positionalWindowHashes(col(textCol), k),
            g => g.getField("h")))).as("__h")).distinct())
    val spans = docs
      .select(col(idCol),
        explode(positionalWindowHashes(col(textCol), k)).as("__g"))
      .select(col(idCol), col("__g.p").cast("long").as("__p"), col("__g.h").as("__h"))
      .join(benchSet, Seq("__h"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("__p"))).as("__ps"))
      .select(col(idCol), mergeWindowSpans(col("__ps"), k).as("__sp"))
    exciseProjection(docs, spans, idCol, textCol)
  }

  /** d10: INCREMENTAL cross-corpus dedup — flag each NEW-batch doc against
    * the already-curated corpus without ever re-deduplicating the corpus
    * itself (at 100 TB you dedup the daily arrivals against the standing
    * index, never corpus×corpus). Per batch doc:
    * `is_exact_dup` (normalized text occurs in the corpus), `n_near`
    * (corpus docs at Jaccard ≥ threshold), `max_jaccard` (0.0 when none).
    *
    * Scale: the corpus contributes exactly two index-shaped tables — its
    * distinct norm-hashes and its banded MinHash signatures, both
    * persistable once and reused every batch (same pattern as
    * [[Similarity.buildIvfIndex]]). The daily batch is orders of magnitude
    * smaller than the corpus, so its hash set and band table BROADCAST:
    * the corpus is probed map-side, never shuffled, never self-joined.
    * Candidates are verified with exact Jaccard on the shingle sets, so
    * the output is the true ≥ threshold neighbor count (minus the
    * (1-s^r)^b LSH miss, ≈3e-8 at planted similarity). */
  def incrementalDedupFlags(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bands: Int,
      bandRows: Int,
      threshold: Double): DataFrame = {
    val (normHashes, bandSigs, shingles) =
      corpusIndexFrames(corpus, idCol, textCol, n, bands, bandRows)
    probeFrames(normHashes, bandSigs, shingles,
      batch, idCol, textCol, n, bands, bandRows, threshold)
  }

  /** Per-doc hashed shingle sets: idCol, sgh (array<long>, 55-bit), n_sh.
    * Hashes replace strings everywhere downstream (band signatures AND the
    * exact-Jaccard verify) — the repo-wide string↔hash equivalence with a
    * ~1e-8 birthday bound, and the reason a persisted index never has to
    * store corpus text. */
  private def hashedShingleDocs(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol), windowHashSet(col(textCol), n).as("sgh"))
      .select(col(idCol), col("sgh"), size(col("sgh")).as("n_sh"))
      .filter(col("n_sh") > 0)

  /** Exploded per-band MinHash keys: (idCol as `as`, __bk struct). */
  private def bandKeyFrame(
      hashed: DataFrame, idCol: String, as: String,
      bands: Int, bandRows: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band") +:
        (0 until bandRows).map(r =>
          element_at(col("__sig"), b * bandRows + r + 1).as(s"v$r")): _*)
    }: _*)
    hashed.withColumn("__sig", minhashSig(col("sgh"), bands * bandRows))
      .select(col(idCol).as(as), explode(bandStructs).as("__bk"))
  }

  /** The corpus's three index-shaped frames — exactly what
    * [[buildDedupIndex]] persists and [[incrementalDedupFlags]] derives
    * on the fly: distinct norm-hashes (exact probe), banded signatures
    * (candidate probe), hashed shingle sets (Jaccard verify). */
  private def corpusIndexFrames(
      corpus: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, bandRows: Int): (DataFrame, DataFrame, DataFrame) = {
    val normHashes = corpus
      .select(xxhash64(normText(col(textCol))).as("__nh"))
    val hashed = hashedShingleDocs(corpus, idCol, textCol, n)
    (normHashes,
      bandKeyFrame(hashed, idCol, "__cid", bands, bandRows),
      hashed.select(col(idCol).as("__cid"), col("sgh"), col("n_sh")))
  }

  /** The probe itself, corpus side abstracted to its three index frames
    * (live or persisted — identical code path, so the spec's
    * probe-equals-recompute check covers both). */
  private def probeFrames(
      corpusNormHashes: DataFrame,
      corpusBands: DataFrame,
      corpusShingles: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bands: Int,
      bandRows: Int,
      threshold: Double): DataFrame = {
    // exact: batch norm-hash ∈ corpus norm-hash set (8-byte probe keys;
    // string-equality semantics modulo the repo-wide 64-bit hash bound).
    // The batch hash set broadcasts BOTH ways: the corpus is probed
    // map-side (never shuffled, never distinct-ed), and only the matched
    // hashes — at most |batch| after the partial-agg distinct — come back.
    val batchNorm = batch
      .select(col(idCol), xxhash64(normText(col(textCol))).as("__nh"))
    val batchHashes = batchNorm.select(col("__nh")).distinct()
    val matched = corpusNormHashes
      .join(broadcast(batchHashes), Seq("__nh"), "left_semi")
      .distinct()
    val exact = batchNorm
      .join(broadcast(matched), Seq("__nh"), "left_semi")
      .select(col(idCol)).withColumn("__ex", lit(1L))
    // near: banded signatures batch↔corpus, batch side broadcast
    val batchSh = hashedShingleDocs(batch, idCol, textCol, n)
    val batchBands = bandKeyFrame(batchSh, idCol, "__bid", bands, bandRows)
    val cands = corpusBands
      .join(broadcast(batchBands), Seq("__bk"))
      .select(col("__bid"), col("__cid")).distinct()
    // verify: candidates + batch shingle sets stay broadcast-sized, so the
    // corpus shingle table is probed map-side here too
    val withBatch = cands
      .join(batchSh.select(col(idCol).as("__bid"), col("sgh").as("__sga"),
        col("n_sh").as("__na")), "__bid")
    val near = corpusShingles
      .select(col("__cid"), col("sgh").as("__sgb"), col("n_sh").as("__nb"))
      .join(broadcast(withBatch), Seq("__cid"))
      .withColumn("__common", size(array_intersect(col("__sga"), col("__sgb"))))
      .withColumn("__j",
        col("__common").cast("double") / (col("__na") + col("__nb") - col("__common")))
      .filter(col("__j") >= threshold)
      .groupBy(col("__bid"))
      .agg(count(lit(1)).as("__nn"), max(col("__j")).as("__mj"))
    batch.select(col(idCol))
      .join(exact, Seq(idCol), "left")
      .join(near.withColumnRenamed("__bid", idCol), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("__ex"), lit(0L)).as("is_exact_dup"),
        coalesce(col("__nn"), lit(0L)).as("n_near"),
        coalesce(col("__mj"), lit(0.0)).as("max_jaccard"))
  }

  /** PERSIST the d10 corpus index: the three index-shaped frames of
    * [[incrementalDedupFlags]]'s corpus side, committed as
    * [[graft.sources.VersionedTable]]s so a daily index refresh is one
    * transactional snapshot flip (readers mid-probe keep their resolved
    * version) — the [[Similarity.buildIvfIndex]] pattern for text dedup.
    * Layout under `indexRoot`:
    * {{{
    *   norm_hashes/  distinct xxhash64(norm text)        exact-dup probe
    *   band_sigs/    (__cid, __bk)  banded MinHash keys  candidate probe
    *   shingles/     (__cid, sgh, n_sh)  hashed shingles Jaccard verify
    *   params.tsv    n / bands / bandRows manifest
    * }}}
    * The corpus TEXT never enters the index — probe-only runs load hashes
    * exclusively (spec-proven via scan-path audit). [[probeDedupIndex]]
    * reads the geometry from the manifest and uses it, so a probe can
    * never run with the wrong banding (the probeIvfIndex lesson). */
  def buildDedupIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bands: Int,
      bandRows: Int,
      indexRoot: String): Unit = {
    import graft.sources.VersionedTable
    val (normHashes, bandSigs, shingles) =
      corpusIndexFrames(corpus, idCol, textCol, n, bands, bandRows)
    VersionedTable.commit(normHashes.distinct(), s"$indexRoot/norm_hashes")
    VersionedTable.commit(bandSigs, s"$indexRoot/band_sigs")
    VersionedTable.commit(shingles, s"$indexRoot/shingles")
    val spark = corpus.sparkSession
    val p = new org.apache.hadoop.fs.Path(s"$indexRoot/params.tsv")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    try out.write(s"$n\t$bands\t$bandRows\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** APPEND a batch of accepted documents to a persisted dedup index —
    * O(batch): the batch's three frames (norm hashes, band signatures,
    * shingle sets) are computed with the INDEX's own persisted geometry
    * and land as append commits (current snapshot carried by reference,
    * nothing rewritten). This closes the incremental-dedup loop: probe
    * the batch ([[probeDedupIndex]]), keep the survivors, append them so
    * the NEXT batch dedups against corpus + this batch. Unlike the ANN
    * appends there is no trained state to drift — MinHash geometry is
    * per-document arithmetic, so an appended index is semantically
    * identical to a full rebuild (spec-pinned). Batch ids must be new. */
  def appendToDedupIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexRoot: String,
      batch: DataFrame,
      idCol: String,
      textCol: String): Unit = {
    import graft.sources.VersionedTable
    val p = new org.apache.hadoop.fs.Path(s"$indexRoot/params.tsv")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
               finally in.close()
    val Array(n, bands, bandRows) = line.split('\t').map(_.toInt)
    val (normHashes, bandSigs, shingles) =
      corpusIndexFrames(batch, idCol, textCol, n, bands, bandRows)
    VersionedTable.commitAppend(normHashes.distinct(), s"$indexRoot/norm_hashes")
    VersionedTable.commitAppend(bandSigs, s"$indexRoot/band_sigs")
    VersionedTable.commitAppend(shingles, s"$indexRoot/shingles")
  }

  /** [[incrementalDedupFlags]] against a PERSISTED [[buildDedupIndex]]
    * index: identical output (the corpus frames are the same, modulo the
    * explicit distinct on norm-hashes, which the probe's semi-join never
    * observes), but the per-batch run reads only the index tables — no
    * corpus text, no corpus-side recompute. Banding geometry comes from
    * the index manifest, never from the caller. */
  def probeDedupIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexRoot: String,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    import graft.sources.VersionedTable
    val p = new org.apache.hadoop.fs.Path(s"$indexRoot/params.tsv")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
               finally in.close()
    val Array(n, bands, bandRows) = line.split('\t').map(_.toInt)
    probeFrames(
      VersionedTable.read(spark, s"$indexRoot/norm_hashes"),
      VersionedTable.read(spark, s"$indexRoot/band_sigs"),
      VersionedTable.read(spark, s"$indexRoot/shingles"),
      batch, idCol, textCol, n, bands, bandRows, threshold)
  }

  def simhashFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bits: Int = SimHashBits): DataFrame = {
    val agg = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.SimHashAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__sgh")),
        bits).toAggregateExpression())
    // native one-pass wide hash set — same values as
    // wideShingleHashes(shingleSet(text)), no shingle strings built
    docs.select(col(idCol), windowHashSet(col(textCol), n).as("__sgh"))
      .filter(size(col("__sgh")) > 0)
      .groupBy(col(idCol))
      .agg(agg.as("fingerprint"))
  }

  /** Relational reference formulation of [[simhashFingerprints]] (explode
    * + `bits` conditional sums) — the semantic spec the aggregate must
    * match value-for-value. */
  def simhashFingerprintsRelational(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bits: Int = SimHashBits): DataFrame = {
    val exploded = shingleDocs(docs, idCol, textCol, n)
      .select(col(idCol), explode(wideShingleHashes(col("sg"))).as("__x"))
    // bit extraction via &1 (as the SQL oracle and SimHashAgg do): `% 2`
    // would yield -1 for negative hashes and silently diverge
    val sums = (0 until bits).map(j =>
      sum((shiftright(col("__x"), j).bitwiseAND(1L)) * 2L - 1L).as(s"__s$j"))
    val agg = exploded.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val fp = (0 until bits)
      .map(j => when(col(s"__s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col(idCol), fp.as("fingerprint"))
  }

  /** d4: SimHash near-dup pairs at Hamming distance ≤ maxHamming.
    * Candidate generation by fingerprint banding (bands of width
    * bits/(maxHamming+1)); exact `bit_count(xor)` verification. With
    * maxHamming+1 bands the banding is LOSSLESS (pigeonhole). */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxHamming: Int = 3,
      bits: Int = SimHashBits): DataFrame = {
    val nBands = maxHamming + 1
    val bandWidth = bits / nBands
    val mask = (1L << bandWidth) - 1L
    val fps = simhashFingerprints(docs, idCol, textCol, n)
    val banded = fps.select(
      col(idCol).as("__id"), col("fingerprint"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("fingerprint"), b * bandWidth).bitwiseAND(mask)).as("v"))): _*))
        .as("__b"))
      .select(col("__id"), col("fingerprint"), col("__b.band").as("__band"), col("__b.v").as("__v"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.__band") === col("b.__band") && col("a.__v") === col("b.__v") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("ida"), col("b.__id").as("idb"),
        col("a.fingerprint").as("__fa"), col("b.fingerprint").as("__fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("__fa").bitwiseXOR(col("__fb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("ida"), col("idb"), col("hamming"))
  }

  /** d11: BLOCKED FUZZY JOIN — the entity-resolution primitive: doc pairs
    * whose normalized `prefixLen`-char prefixes are within `maxDist` edit
    * distance, candidate pairs generated by EXACT-match blocking on the
    * first `blockLen` chars (the classic prefix-blocking scheme; two
    * records must agree on the block key to ever be compared).
    *
    * Unlike the shingle/minhash family (set similarity), this is SEQUENCE
    * similarity — typos, small insertions, reorderings at the edit level —
    * the matcher record-linkage pipelines run on titles/names/addresses.
    * `levenshtein` is the classic DP edit distance with identical
    * semantics in Spark and DuckDB, so the operator stays hash-checkable.
    *
    * Scale: the only shuffle is the equi-join on the block key; the
    * quadratic term is bounded per block (choose `blockLen` so blocks are
    * small; skewed blocks split via AQE). The O(prefixLen²) DP runs only
    * on within-block pairs. Blocking trades recall for that bound — a
    * typo INSIDE the block key hides the pair (the spec pins this) —
    * production stacks run several complementary block keys unioned. */
  def fuzzyJoinPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int,
      blockLen: Int,
      maxDist: Int): DataFrame = {
    val p = docs.select(col(idCol),
        substring(normText(col(textCol)), 1, prefixLen).as("__pfx"))
      .withColumn("__blk", substring(col("__pfx"), 1, blockLen))
    val a = p.select(col(idCol).as("ida"), col("__pfx").as("__pa"), col("__blk"))
    val b = p.select(col(idCol).as("idb"), col("__pfx").as("__pb"), col("__blk"))
    // bounded-distance levenshtein (Spark 3.5+ threshold form): the DP
    // runs a 2·maxDist+1 band — O(maxDist·len) per pair instead of
    // O(len²) — and returns −1 past the bound; for kept pairs the value
    // equals the unbounded distance, so the oracle's plain
    // `levenshtein(a,b) <= maxDist` filter selects the identical rows
    a.join(b, Seq("__blk")).filter(col("ida") < col("idb"))
      .withColumn("edit_dist",
        levenshtein(col("__pa"), col("__pb"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col("ida"), col("idb"), col("edit_dist"))
  }

  /** [[fuzzyJoinPairs]] with the RECALL DIAL production stacks actually
    * run: several COMPLEMENTARY block keys, candidates unioned, pairs
    * deduplicated, ONE edit-distance verification. Single-key prefix
    * blocking misses any pair whose edits fall inside the block key
    * itself; each extra key covers a failure mode of the others:
    *
    *  - `b0` leading block — `substr(pfx, 1, blockLen)` (the single-key
    *    form): edits beyond position blockLen;
    *  - `b1` second slice — `substr(pfx, blockLen+1, blockLen)`:
    *    substitutions/transpositions INSIDE the leading block (alignment
    *    past it is unshifted — insertions/deletions there still shift it,
    *    which is why this key alone is not enough either);
    *  - `b2` char-sorted first 2·blockLen chars: transpositions and
    *    reorderings anywhere in that window (a bag-of-chars key — the
    *    sorted form is insensitive to position, sensitive to content).
    *
    * All three are deterministic string arithmetic, so the DuckDB oracle
    * re-derives them and the UNION stays hash-checked. Keys are tagged
    * (key-space id, value) so blocks never collide across key spaces.
    *
    * Scale: still ONE equi-join shuffle — the key id rides inside the
    * join key; candidate volume is ≤ 3× the single-key form (before the
    * pair dedup), per-block quadratic bounded and AQE-splittable exactly
    * as before. Recall rises with each key; cost is the dial's price. */
  /** The three complementary block-key spaces of [[fuzzyJoinPairsMulti]],
    * as one (i, k)-struct array over the normalized `__pfx` column —
    * shared with the candidate-volume measurement so the SCALING.md
    * numbers can never drift from what the operator joins on. */
  private def multiBlockKeys(blockLen: Int): org.apache.spark.sql.Column = array(
    struct(lit(0).as("i"),
      substring(col("__pfx"), 1, blockLen).as("k")),
    struct(lit(1).as("i"),
      substring(col("__pfx"), blockLen + 1, blockLen).as("k")),
    struct(lit(2).as("i"),
      array_join(array_sort(split(
        substring(col("__pfx"), 1, 2 * blockLen), "")), "").as("k")))

  def fuzzyJoinPairsMulti(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int,
      blockLen: Int,
      maxDist: Int): DataFrame = {
    val p = docs.select(col(idCol),
        substring(normText(col(textCol)), 1, prefixLen).as("__pfx"))
      .withColumn("__bk", explode(multiBlockKeys(blockLen)))
      // empty SECONDARY block keys (prefix shorter than the slice the key
      // reads) would funnel EVERY short doc into one block per key space —
      // a per-block quadratic blowup at scale. Drop them: short docs stay
      // covered by the leading b0 key, which is kept EVEN WHEN EMPTY so
      // empty-normalized-text docs (mutual duplicates at dist 0) remain
      // candidates, matching the single-key fuzzyJoinPairs' recall; the
      // empty-b0 block is quadratic only in the count of empty docs,
      // whose all-pairs output is inherently that size.
      .filter(col("__bk.i") === 0 || col("__bk.k") =!= lit(""))
    val a = p.select(col(idCol).as("ida"), col("__pfx").as("__pa"), col("__bk"))
    val b = p.select(col(idCol).as("idb"), col("__pfx").as("__pb"), col("__bk"))
    a.join(b, Seq("__bk")).filter(col("ida") < col("idb"))
      // pair-level dedup BEFORE the DP: a pair agreeing on 2 keys must be
      // verified once, not twice (prefixes ride along — functionally
      // determined by the ids, so distinct() keys on the pair)
      .select(col("ida"), col("idb"), col("__pa"), col("__pb"))
      .distinct()
      .withColumn("edit_dist",
        levenshtein(col("__pa"), col("__pb"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col("ida"), col("idb"), col("edit_dist"))
  }

  /** Candidate-pair volume BEFORE the edit-distance verification, for the
    * single-key form vs the multi-key union — the measurement behind the
    * multi form's "≤3× candidates" scale claim (the DP verification is
    * the dominant per-candidate cost, so candidate count is the number
    * that must not blow up). Both counts are computed from the operators'
    * own key expressions: single = the b0 equi-join as
    * [[fuzzyJoinPairs]] runs it; multi = the deduplicated
    * [[multiBlockKeys]] union as [[fuzzyJoinPairsMulti]] runs it. */
  def fuzzyCandidateCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int,
      blockLen: Int): (Long, Long) = {
    val p = docs.select(col(idCol),
      substring(normText(col(textCol)), 1, prefixLen).as("__pfx"))
    val s = p.withColumn("__blk", substring(col("__pfx"), 1, blockLen))
    val nSingle = s.select(col(idCol).as("ida"), col("__blk"))
      .join(s.select(col(idCol).as("idb"), col("__blk")), Seq("__blk"))
      .filter(col("ida") < col("idb"))
      .count()
    val m = p.withColumn("__bk", explode(multiBlockKeys(blockLen)))
      .filter(col("__bk.i") === 0 || col("__bk.k") =!= lit(""))
    val nMulti = m.select(col(idCol).as("ida"), col("__bk"))
      .join(m.select(col(idCol).as("idb"), col("__bk")), Seq("__bk"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
      .count()
    (nSingle, nMulti)
  }
}
