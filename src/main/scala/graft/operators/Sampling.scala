package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash.charPolyHash

/** Deterministic stratified sampling — the training-mix construction
  * primitive (SURVEY.md §2c/§2e context: after curation, a corpus is
  * down/up-weighted per source to hit a target data mixture).
  *
  * Mechanism: each row gets a stable pseudo-uniform bucket in [0, 1000)
  * from the explicit polynomial hash of `salt|id` (engine-neutral — the
  * oracle re-derives it; NO rand(), which is neither reproducible across
  * retries nor cross-engine). A row survives iff bucket < the per-stratum
  * permille rate. Properties a mix pipeline needs and rand() lacks:
  *   - deterministic: re-runs, retries, and speculative tasks agree;
  *   - nested: raising a rate r→r' keeps every previously sampled row
  *     (sample sets grow monotonically with the rate);
  *   - independent per salt: a fresh salt draws a fresh sample.
  *
  * Scale: the rates table is broadcast (a mix config is dozens-to-
  * thousands of strata); the filter is map-side — ZERO shuffles, so this
  * runs at scan speed on 100 TB and composes with pushed-down pruning
  * (the scan reads only id/stratum columns plus whatever the caller
  * keeps).
  */
object Sampling {

  /** Permille buckets: hash(salt|id|mix) mod 1000. The constant "|mix"
    * SUFFIX matters: a short key ending in the id's digits never wraps the
    * 1e9+7 modulus, so buckets would inherit decimal structure (measured
    * 81% kept at permille 400); folding constant chars AFTER the digits
    * multiplies the id variation through the modulus and restores
    * uniformity (measured 39.7–40.2% across id ranges). */
  val Buckets: Long = 1000L

  def bucketOf(idCol: String, salt: String) =
    pmod(
      charPolyHash(concat(lit(salt + "|"), col(idCol).cast("string"), lit("|mix"))),
      lit(Buckets))

  /** Sample `rows` keeping `permille`/1000 of each stratum, deterministic
    * in (salt, id). `rates` = (stratum value, permille); strata absent
    * from the config are DROPPED (rate 0) — a mix config is a whitelist.
    * Output = surviving rows + `bucket`/`permille` audit columns. */
  def stratified(
      spark: SparkSession,
      rows: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Seq[(String, Int)],
      salt: String): DataFrame = {
    import spark.implicits._
    val ratesDf = rates.toDF(stratumCol, "permille")
    rows
      .withColumn("bucket", bucketOf(idCol, salt))
      .join(broadcast(ratesDf), stratumCol)
      .filter(col("bucket") < col("permille"))
  }

  /** p4: TOKEN-BUDGET sampling — the other half of training-mix
    * construction: a mix config is usually expressed as "B tokens from
    * stratum s", not a rate (rates need the corpus token count known in
    * advance; budgets are what the training run actually consumes).
    *
    * Semantics: within each stratum, documents are taken in a
    * deterministic pseudo-random order — (hash bucket, id) ascending, the
    * same `salt|id|mix` polynomial buckets as [[stratified]] — and a doc
    * is kept iff the running token total THROUGH it is ≤ the stratum's
    * budget (never overshoot; an early over-budget doc is skipped only if
    * it itself crosses the line, and then everything after it is too,
    * because the cumulative sum only grows). Deterministic, nested in the
    * budget (B→B' ⊇), fresh per salt — the [[stratified]] properties,
    * restated for budgets.
    *
    * Scale — the naive form is a cumulative-sum window over the WHOLE
    * stratum: one partition per stratum, dead at 100 TB. This runs the
    * classic two-level distributed prefix sum instead:
    *   1. per-(stratum, bucket) token sums — ordinary map-side-partial agg;
    *   2. EXCLUSIVE prefix over the ≤`Buckets` bucket sums per stratum — a
    *      window over a config-sized aggregate, broadcast back;
    *   3. buckets whose prefix already exceeds the budget are dropped
    *      map-side BEFORE any big window — the per-doc cumsum runs only
    *      inside buckets that can still contribute, each 1/`Buckets` of a
    *      stratum (and only the ≈budget-sized prefix of those survive the
    *      filter at all).
    * The only corpus-wide shuffle is the (stratum, bucket) exchange the
    * window needs; everything else is broadcast-sized. */
  def tokenBudget(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      textCol: String,
      budgets: Seq[(String, Long)],
      salt: String,
      tokenCount: Option[Column] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val budgetDf = budgets.toDF(stratumCol, "budget")
    // pluggable token unit (default whitespace words; see
    // Packing.packSequences — Bpe.tokenCount swaps in real subwords)
    val toks = docs.select(
      col(idCol),
      col(stratumCol),
      bucketOf(idCol, salt).as("bucket"),
      tokenCount.getOrElse(
        size(graft.functions.TextHash.wordsOf(col(textCol))).cast("long"))
        .cast("long").as("n_tokens"))
    // (1) bucket totals; (2) exclusive prefix per stratum over ≤Buckets rows
    val bucketPrefix = toks
      .groupBy(col(stratumCol), col("bucket"))
      .agg(sum(col("n_tokens")).as("__bsum"))
      .withColumn("__bpre",
        coalesce(
          sum(col("__bsum")).over(Window.partitionBy(stratumCol)
            .orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .join(budgetDf, stratumCol)
      // (3) a bucket whose exclusive prefix is already ≥ budget cannot
      // contribute — prune it before the per-doc window ever runs
      .filter(col("__bpre") < col("budget"))
      .select(col(stratumCol), col("bucket"), col("__bpre"), col("budget"))
    val withinW = Window.partitionBy(col(stratumCol), col("bucket"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .join(broadcast(bucketPrefix), Seq(stratumCol, "bucket"))
      .withColumn("cum_tokens", col("__bpre") + sum(col("n_tokens")).over(withinW))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col(idCol), col(stratumCol), col("bucket"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** `pos` resolution for [[mixInterleave]]: rank·PosScale/weight keeps
    * integer precision for weights up to PosScale permille-like units. */
  val PosScale: Long = 1000000L

  /** p6: deterministic MIXTURE INTERLEAVE — the step that turns a curated
    * corpus + a mix config into the actual TRAINING ORDER. Stride
    * scheduling: stratum `s` with weight `w_s` emits its `r`-th document
    * (in the same deterministic (bucket, id) order [[tokenBudget]] uses)
    * at virtual position `pos = r·PosScale div w_s`; ascending `pos`
    * (ties: stratum, id) is a global order whose every prefix holds the
    * strata near their configured proportions (the classic stride /
    * virtual-time scheduler, here as pure integer arithmetic —
    * reproducible across retries and engines). Strata absent from the
    * config are dropped (a mix config is a whitelist, as [[stratified]]).
    *
    * Scale: the intra-stratum rank is computed WITHOUT a whole-stratum
    * window — the [[tokenBudget]] two-level prefix sum: per-(stratum,
    * bucket) counts (one map-side-combined shuffle of 8-byte keys), a
    * config-sized exclusive prefix broadcast back, and row_number only
    * inside (stratum, bucket) groups — ×[[Buckets]] more parallelism than
    * a per-stratum window, with per-group state bounded by the bucket,
    * not the stratum. The output deliberately does NOT materialize a
    * global row_number (that would be one total-order window): `pos` IS
    * the order key — a consumer `ORDER BY pos` (a range-partitioned sort,
    * the same cost class as any global sort) or range-buckets it into
    * shards directly. */
  def mixInterleave(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Seq[(String, Int)],
      salt: String): DataFrame = {
    // a zero (or negative) weight would make the integer `div` emit null
    // positions silently, corrupting the training order — fail fast
    require(weights.forall(_._2 > 0),
      s"mixInterleave weights must be > 0, got: " +
        weights.filter(_._2 <= 0).map { case (s, w) => s"$s:$w" }.mkString(","))
    import spark.implicits._
    val weightsDf = weights.toDF(stratumCol, "weight")
    rankByBucket(docs, idCol, stratumCol, salt)
      .join(broadcast(weightsDf), stratumCol)
      .withColumn("pos", expr(s"(rank * ${PosScale}L) div weight"))
      .select(col(idCol), col(stratumCol), col("bucket"),
        col("rank"), col("weight").cast("long").as("weight"), col("pos"))
  }

  /** The shared per-stratum PSEUDO-RANDOM RANK (1-based, in (bucket, id)
    * order) via the two-level distributed prefix sum: per-(stratum,
    * bucket) counts → exclusive prefix over the ≤[[Buckets]] bucket
    * sums per stratum (a window over a config-sized aggregate,
    * broadcast back) → within-bucket row_number. NEVER a whole-stratum
    * window — each window partition is 1/[[Buckets]] of a stratum.
    * Used by [[mixInterleave]] and [[temperatureMix]]. */
  private def rankByBucket(
      docs: DataFrame, idCol: String, stratumCol: String,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = docs.select(
      col(idCol), col(stratumCol), bucketOf(idCol, salt).as("bucket"))
    val bucketPrefix = rows
      .groupBy(col(stratumCol), col("bucket"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__bpre",
        coalesce(
          sum(col("__bn")).over(Window.partitionBy(stratumCol)
            .orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(stratumCol), col("bucket"), col("__bpre"))
    val withinW = Window.partitionBy(col(stratumCol), col("bucket"))
      .orderBy(col(idCol))
    rows
      .join(broadcast(bucketPrefix), Seq(stratumCol, "bucket"))
      .withColumn("rank",
        col("__bpre") + row_number().over(withinW).cast("long"))
      .drop("__bpre")
  }

  /** p7: TEMPERATURE-WEIGHTED DOMAIN MIX — the multilingual / data-
    * mixture resampling rule (mBERT/XLM sampling, the DoReMi baseline):
    * target share q_d ∝ n_d^α with α = 1/2, so LOW-RESOURCE domains
    * up-sample (by REPETITION, with an epoch counter) and high-resource
    * ones down-sample, against a total budget of `totalTarget` rows.
    *
    * Integer-exact by construction, so an independent engine re-derives
    * the same mix bit-for-bit: w_d = floor(sqrt(n_d · 10^6)) (IEEE sqrt
    * is correctly rounded — every engine computes the same double, so
    * the same floor), take_d = totalTarget · w_d div Σw — NO float sums
    * whose addend ORDER could drift across engines. Each domain takes
    * its first take_d docs in the deterministic (bucket, id) pseudo-
    * random order, wrapping with `epoch` = 0,1,… for up-sampled domains
    * (a doc's k-th repetition is epoch k; kept iff epoch·n_d + rank ≤
    * take_d).
    *
    * Scale: domain counts are a map-side agg COLLECTED (config-sized —
    * #domains rows, the legitimate driver-side scale) so the take
    * arithmetic runs once in sorted order; the per-doc rank is the same
    * two-level prefix sum as [[mixInterleave]] (bucket sums → tiny
    * prefix window → within-bucket row_number, never a whole-stratum
    * window); the epoch fan-out is a map-side sequence+explode bounded
    * by ⌈take_d/n_d⌉. */
  def temperatureMix(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      totalTarget: Option[Long],
      salt: String): DataFrame = {
    require(totalTarget.forall(_ >= 0),
      s"totalTarget must be >= 0, got $totalTarget")
    // null strata are DROPPED (there is no whitelist join here to drop
    // them, and a null domain has no meaningful resample weight); the
    // stratum compares as STRING internally so any atomic stratum type
    // works — the output surfaces it as string
    val rows = docs
      .filter(col(stratumCol).isNotNull)
      .withColumn(stratumCol, col(stratumCol).cast("string"))
    val cts = rows.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // None = the corpus's own size: on-average one epoch, small domains
    // up, large down — and no extra counting scan for the caller
    val target = totalTarget.getOrElse(cts.map(_._2).sum)
    val ws = cts.map { case (s, n) =>
      (s, n, math.floor(math.sqrt(n.toDouble * 1000000.0)).toLong)
    }
    val wSum = math.max(1L, ws.map(_._3).sum)
    // BigInt keeps target·w exact for any Long-sized corpus (a 10¹²-row
    // target times a 10⁸ weight wraps a Long); take ≤ target, so the
    // result always fits back
    val takes = ws.map { case (s, n, w) =>
      (s, n, (BigInt(target) * w / wSum).toLong)
    }
    import spark.implicits._
    val takesDf = takes.toSeq.toDF(stratumCol, "__n", "take")
    rankByBucket(rows, idCol, stratumCol, salt)
      .join(broadcast(takesDf), stratumCol)
      // greatest(...) guards sequence's descending-on-negative gotcha for
      // take = 0 domains; the filter then drops every epoch of them
      .withColumn("epoch", explode(expr(
        "sequence(0L, greatest((take + __n - 1) div __n, 1L) - 1)")))
      .filter(col("epoch") * col("__n") + col("rank") <= col("take"))
      .select(col(idCol), col(stratumCol), col("rank"), col("epoch"),
        col("take"))
  }
}
