package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}
import graft.sources.Tables

/** SURVEY.md §2c/§2e — corpus-to-training-run plumbing: deterministic
  * stratified sampling (the data-mix step) and greedy sequence packing
  * (the batching step). Both are pure deterministic arithmetic, so the
  * DuckDB oracle re-derives them exactly (sampling: the same polynomial
  * hash buckets; packing: the same greedy fold as a recursive CTE).
  */
object CurationQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p2_sample_stratified" -> ((s, d) => p2(s, d)),
    "p3_pack_sequences"    -> ((s, d) => p3(s, d)),
    "p4_token_budget"      -> ((s, d) => p4(s, d)),
    "p6_mix_interleave"    -> ((s, d) => p6(s, d)),
    "p7_temperature_mix"   -> ((s, d) => p7(s, d))
  )

  private val SampleSalt = "p2"
  /** The mix config: an explicit per-source permille whitelist (strata
    * omitted from a mix config are dropped). Spread over [100, 950) so
    * every stratum is non-trivially sampled. */
  val Rates: Seq[(String, Int)] =
    (0 until 20).map(i => (s"src$i", 100 + (i * 43) % 850))

  private val PackCapacity  = 128L // whitespace tokens per packed sequence
  private val PackShardSize = 200L // docs per sequential packing unit

  /** p2: deterministic stratified sample of the documents table under the
    * [[Rates]] mix config — zero-shuffle (broadcast rates + map-side
    * hash filter). */
  def p2(s: SparkSession, dir: String): DataFrame =
    Sampling.stratified(s, Tables.documents(s, dir), "doc_id", "source",
        Rates, SampleSalt)
      .select(col("doc_id"), col("source"), col("bucket"),
        col("permille").cast("long").as("permille"))
      .orderBy(col("doc_id"))

  /** p3: greedy sequence packing of the documents table into
    * 128-token sequences within (source, doc_id/200) shards. */
  def p3(s: SparkSession, dir: String): DataFrame =
    Packing.packSequences(s, Tables.documents(s, dir), "doc_id", "source",
        "text", PackCapacity, PackShardSize)
      .orderBy(col("stratum"), col("shard"), col("id"))

  private val BudgetSalt = "p4"
  /** Per-source token budgets, spread over [300, 1200) so each stratum
    * keeps a nontrivial strict subset at the verify scale (per-source
    * corpus totals are ≈1300–1550 tokens at sf0.01). */
  val Budgets: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", 300L + (i * 181) % 900))

  /** p4: token-budget sample — deterministic (bucket, id)-ordered prefix
    * of each stratum under the [[Budgets]] config, via the two-level
    * distributed prefix sum (bucket sums → tiny prefix window → per-doc
    * cumsum only inside still-contributing buckets). */
  def p4(s: SparkSession, dir: String): DataFrame =
    Sampling.tokenBudget(s, Tables.documents(s, dir), "doc_id", "source",
        "text", Budgets, BudgetSalt)
      .orderBy(col("doc_id"))

  private val MixSalt = "p6"
  /** Per-source interleave weights, spread over [20, 200) — unequal so the
    * stride positions genuinely interleave rather than round-robin. */
  val MixWeights: Seq[(String, Int)] =
    (0 until 20).map(i => (s"src$i", 20 + (i * 53) % 180))

  /** p6: deterministic mixture interleave — the global training-order
    * construction (stride scheduling over the [[MixWeights]] mix config);
    * `pos` is the order key, ranks via the two-level prefix sum. */
  def p6(s: SparkSession, dir: String): DataFrame =
    Sampling.mixInterleave(s, Tables.documents(s, dir), "doc_id", "source",
        MixWeights, MixSalt)
      .orderBy(col("pos"), col("source"), col("doc_id"))

  private val TempSalt = "p7"
  /** The p7 skew filter: domains keep every 1st/2nd/3rd/4th doc by index
    * class, so per-domain counts genuinely differ and the temperature
    * rule has something to rebalance (the raw test corpus is uniform). */
  private val SkewSql =
    "doc_id % (1 + CAST(substring(source, 4) AS INT) % 4) = 0"

  /** p7: temperature-weighted domain mix (q_d ∝ n_d^½) over a skewed
    * slice of the documents table, total budget = the slice's own size —
    * small domains up-sample by repetition (epoch > 0 rows appear),
    * large ones truncate. Integer-exact arithmetic end to end, so the
    * oracle re-derives the identical mix. */
  def p7(s: SparkSession, dir: String): DataFrame = {
    val skewed = Tables.documents(s, dir).where(expr(SkewSql))
    // None = budget is the slice's own size, derived from the operator's
    // per-domain counts — no separate counting scan
    Sampling.temperatureMix(s, skewed, "doc_id", "source", None, TempSalt)
      .orderBy(col("doc_id"), col("epoch"))
  }

  // ---- oracle SQL ---------------------------------------------------------

  private val NormExpr =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

  /** Rolling polynomial hash (acc*31 + ascii) % 1000000007 over `e` —
    * identical to TextHash.charPolyHash (see TextQueries.polyHashSql). */
  private def polyHashSql(e: String) =
    s"""list_reduce(list_transform(range(1, length($e) + 1), i -> ascii(($e)[i])::BIGINT),
       |      (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  def oracles: Map[String, String] = Map(
    "p2_sample_stratified" -> {
      val values = Rates.map { case (s, p) => s"('$s', $p)" }.mkString(", ")
      val keyExpr = s"'$SampleSalt|' || doc_id::VARCHAR || '|mix'"
      s"""WITH r(source, permille) AS (VALUES $values),
         |h AS (SELECT doc_id, source,
         |    ${polyHashSql(keyExpr)} % ${Sampling.Buckets} AS bucket
         |  FROM documents)
         |SELECT h.doc_id, h.source, h.bucket, r.permille::BIGINT AS permille
         |FROM h JOIN r USING (source)
         |WHERE h.bucket < r.permille
         |ORDER BY h.doc_id""".stripMargin
    },

    // the naive whole-stratum cumulative sum over the SAME deterministic
    // (bucket, doc_id) order — provably equal to the two-level prefix sum
    // the Spark side runs (prefix(bucket) + within-bucket cumsum telescopes
    // to the flat cumsum)
    "p4_token_budget" -> {
      val values = Budgets.map { case (s, b) => s"('$s', $b)" }.mkString(", ")
      val keyExpr = s"'$BudgetSalt|' || doc_id::VARCHAR || '|mix'"
      s"""WITH b(source, budget) AS (VALUES $values),
         |w AS (SELECT doc_id, source,
         |    ${polyHashSql(keyExpr)} % ${Sampling.Buckets} AS bucket,
         |    len(string_split($NormExpr, ' '))::BIGINT AS n_tokens
         |  FROM documents),
         |c AS (SELECT *, (sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY bucket, doc_id ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
         |  FROM w)
         |SELECT doc_id, source, bucket, n_tokens, cum_tokens
         |FROM c JOIN b USING (source) WHERE cum_tokens <= budget
         |ORDER BY doc_id""".stripMargin
    },

    // the naive whole-stratum row_number over the SAME deterministic
    // (bucket, doc_id) order — equal to the Spark side's two-level
    // prefix-sum rank (bucket-count prefix + within-bucket row_number
    // telescopes to the flat rank); pos = rank·1e6 div weight
    "p6_mix_interleave" -> {
      val values = MixWeights.map { case (s, w) => s"('$s', $w)" }.mkString(", ")
      val keyExpr = s"'$MixSalt|' || doc_id::VARCHAR || '|mix'"
      s"""WITH m(source, weight) AS (VALUES $values),
         |h AS (SELECT doc_id, source,
         |    ${polyHashSql(keyExpr)} % ${Sampling.Buckets} AS bucket
         |  FROM documents),
         |r AS (SELECT doc_id, source, bucket,
         |    row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id)::BIGINT AS rank
         |  FROM h)
         |SELECT r.doc_id, r.source, r.bucket, r.rank, m.weight::BIGINT AS weight,
         |  (r.rank * ${Sampling.PosScale}) // m.weight AS pos
         |FROM r JOIN m USING (source)
         |ORDER BY pos, source, doc_id""".stripMargin
    },

    // the identical integer-exact arithmetic: counts → w = floor(sqrt
    // (n·10⁶)) (IEEE sqrt, same double in every engine) → take = T·w
    // div Σw → rank over the same (bucket, id) order → epoch fan-out
    "p7_temperature_mix" -> {
      val keyExpr = s"'$TempSalt|' || doc_id::VARCHAR || '|mix'"
      s"""WITH base AS (
         |  SELECT doc_id, source FROM documents
         |  WHERE ($SkewSql) AND source IS NOT NULL),
         |h AS (SELECT doc_id, source,
         |    ${polyHashSql(keyExpr)} % ${Sampling.Buckets} AS bucket
         |  FROM base),
         |n AS (SELECT source, count(*)::BIGINT AS n FROM h GROUP BY source),
         |w AS (SELECT source, n,
         |    CAST(floor(sqrt(n * 1000000.0)) AS BIGINT) AS w FROM n),
         |t AS (SELECT source, n,
         |    ((SELECT count(*) FROM base) * w)
         |      // (SELECT sum(w)::BIGINT FROM w) AS take FROM w),
         |r AS (SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY bucket, doc_id)::BIGINT AS rank
         |  FROM h),
         |e AS (SELECT CAST(unnest(range(0, (SELECT CAST(max(
         |    greatest((take + n - 1) // n, 1)) AS BIGINT) FROM t))) AS BIGINT)
         |    AS epoch)
         |SELECT r.doc_id, r.source, r.rank, e.epoch, t.take
         |FROM r JOIN t USING (source) CROSS JOIN e
         |WHERE e.epoch * t.n + r.rank <= t.take
         |ORDER BY doc_id, epoch""".stripMargin
    },

    // the identical greedy fold, unrolled as a recursive CTE over the
    // row_number chain within each (stratum, shard) group
    "p3_pack_sequences" ->
      s"""WITH RECURSIVE
         |w AS (SELECT doc_id, source, string_split($NormExpr, ' ') AS ws FROM documents),
         |d AS (SELECT source AS stratum, doc_id // $PackShardSize AS shard,
         |    doc_id AS id, len(ws)::BIGINT AS n_tokens,
         |    row_number() OVER (PARTITION BY source, doc_id // $PackShardSize
         |      ORDER BY doc_id) AS rn
         |  FROM w),
         |p AS (
         |  SELECT stratum, shard, id, n_tokens, rn,
         |    1::BIGINT AS seq_id, 0::BIGINT AS seq_offset, n_tokens AS fill
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.stratum, d.shard, d.id, d.n_tokens, d.rn,
         |    CASE WHEN p.fill + d.n_tokens > $PackCapacity
         |      THEN p.seq_id + 1 ELSE p.seq_id END,
         |    CASE WHEN p.fill + d.n_tokens > $PackCapacity
         |      THEN 0::BIGINT ELSE p.fill END,
         |    CASE WHEN p.fill + d.n_tokens > $PackCapacity
         |      THEN d.n_tokens ELSE p.fill + d.n_tokens END
         |  FROM d JOIN p ON d.stratum = p.stratum AND d.shard = p.shard
         |    AND d.rn = p.rn + 1)
         |SELECT stratum, shard, id, n_tokens, seq_id, seq_offset
         |FROM p ORDER BY stratum, shard, id""".stripMargin
  )
}
