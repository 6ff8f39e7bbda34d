package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 versioning — Spark-first re-expression of the reference's
  * dbt/models/marts/retail_transactions_scd.sql:
  *
  *   - change detection: a new version only when tracked columns change
  *     (`is distinct from` comparisons, lines 60-68);
  *   - expire: the superseded version gets `valid_to = snapshot_time,
  *     is_current = false` (lines 80-97);
  *   - new version: `valid_from = snapshot_time,
  *     valid_to = '9999-12-31 23:59:59', is_current = true` (lines 100-115);
  *   - soft delete annotation per version: `deleted_at = updated_at` while
  *     the status is terminal (lines 18-21).
  *
  * The reference applies one snapshot per run against the accumulated table;
  * given the full change log, the same table is produced in ONE pass with
  * window functions — `buildFromHistory` below. That formulation is the
  * scalable one: a single shuffle on the entity key, then lag/lead within
  * partitions; no iterative merge, no driver loop. (Equivalently: running
  * the reference's per-snapshot algorithm over every snapshot in order
  * yields exactly this output; the ScalaTest spec asserts that.)
  */
object Scd2 {

  val EndOfTime = "9999-12-31 23:59:59"

  /** Build the full SCD2 table from an event history.
    *
    * @param events    change log (one row per observed state)
    * @param key       entity key column
    * @param tsCol     observation timestamp column
    * @param statusCol tracked attribute (version boundary = change in it)
    * @param seqCol    deterministic tiebreak for equal timestamps
    * @param doneValue terminal status → deleted_at annotation
    */
  def buildFromHistory(
      events: DataFrame,
      key: String,
      tsCol: String,
      statusCol: String,
      seqCol: String,
      doneValue: String,
      endOfTime: String = EndOfTime): DataFrame = {
    val byTime  = Window.partitionBy(col(key)).orderBy(col(tsCol), col(seqCol))
    // change detection: drop rows equal to their predecessor (NO_CHANGE)
    val changes = events
      .withColumn("__prev", lag(col(statusCol), 1).over(byTime))
      .filter(col("__prev").isNull || !(col("__prev") <=> col(statusCol)))
    val byFrom = Window.partitionBy(col(key)).orderBy(col(tsCol), col(seqCol))
    changes
      .withColumn("valid_to_raw", lead(col(tsCol), 1).over(byFrom))
      .select(
        col(key).as("id"),
        col(statusCol).as("last_status"),
        col(tsCol).as("valid_from"),
        coalesce(col("valid_to_raw"), lit(endOfTime).cast("timestamp")).as("valid_to"),
        col("valid_to_raw").isNull.as("is_current"),
        when(col(statusCol) === doneValue, col(tsCol)).as("deleted_at"))
  }

  /** Current-state view (reference scd model "USEFUL QUERIES" #1/#8). */
  def currentState(scd: DataFrame, activeOnly: Boolean = false): DataFrame = {
    val cur = scd.filter(col("is_current"))
    if (activeOnly) cur.filter(col("deleted_at").isNull) else cur
  }

  /** Time-travel: state as of `t` (reference "USEFUL QUERIES" #3).
    * Half-open interval [valid_from, valid_to) — at a version boundary the
    * new version holds (exactly one row per entity alive at `t`). */
  def asOf(scd: DataFrame, t: Column): DataFrame =
    scd.filter(col("valid_from") <= t && t < col("valid_to"))

  /** The reference's literal formulation — `t BETWEEN valid_from AND
    * valid_to` (closed; at an exact boundary instant both the expired and
    * the new version match, as in the reference's documented query). */
  def asOfBetween(scd: DataFrame, t: Column): DataFrame =
    scd.filter(t.between(col("valid_from"), col("valid_to")))

  /** Point-in-time dimension join: every fact row picks up the dimension
    * VERSION that was valid at the fact's own timestamp — the
    * training-data/feature-store correctness primitive (joining current
    * state instead leaks the future into history). Same half-open
    * interval as [[asOf]], so a fact exactly at a version boundary takes
    * the new version and matches exactly one row.
    *
    * Scale: an equi-join on the entity key with the interval as a
    * residual condition — hash/sort-merge partitioned by key, never a
    * range cartesian; per-key version counts are small, so the residual
    * scans a handful of rows per fact. Skewed entities are AQE
    * skew-join territory like any key join. */
  def pointInTime(
      scd: DataFrame,
      facts: DataFrame,
      factKeyCol: String,
      factTsCol: String): DataFrame =
    facts.join(scd,
      facts(factKeyCol) === scd("id") &&
        scd("valid_from") <= facts(factTsCol) &&
        facts(factTsCol) < scd("valid_to"))

  /** Audit rollup: versions per entity (reference "USEFUL QUERIES" #5). */
  def audit(scd: DataFrame): DataFrame =
    scd.groupBy(col("id")).agg(
      count(lit(1)).as("version_count"),
      min(col("valid_from")).as("first_seen"),
      max(col("valid_from")).as("last_change"))
}
