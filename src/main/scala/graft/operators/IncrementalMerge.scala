package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental merge (upsert) with soft delete — the Spark-first
  * re-expression of the reference's dbt model
  * dbt/models/marts/retail_transactions.sql (materialized='incremental',
  * unique_key='id', incremental_strategy='merge'):
  *
  *   - staging rows replace matched target rows and insert unmatched ones;
  *   - target rows absent from staging are kept untouched;
  *   - `created_at = coalesce(staging.created_at, run_ts)` (lines 24-27);
  *   - `updated_at = run_ts` for every written row (line 30);
  *   - soft delete: `deleted_at = run_ts` when status is the terminal value,
  *     preserving an earlier `deleted_at` (`coalesce(t.deleted_at, run_ts)`,
  *     lines 33-40); cleared when the status moves off terminal.
  *
  * Scale notes: a single equi-join on the unique key. In production the
  * target is the big side (full history) and staging is the hourly delta —
  * Catalyst broadcast-joins the delta automatically under the 10 MB/AQE
  * threshold; above it, bucketing the target by `id` makes every
  * incremental run shuffle only the delta. No driver-side state.
  */
object IncrementalMerge {

  /** @param target   current mart contents (must have key, created_at, deleted_at)
    * @param staging  full staging snapshot (key, statusCol, created_at, ...)
    * @param key      unique merge key
    * @param runTs    the run timestamp written to updated_at / deleted_at
    * @param statusCol column holding the lifecycle status
    * @param doneValue terminal status value triggering soft delete
    */
  def merge(
      target: DataFrame,
      staging: DataFrame,
      key: String,
      runTs: Column,
      statusCol: String,
      doneValue: String): DataFrame = {
    val s = staging.select(
      col(key),
      col(statusCol).as("__s_status"),
      col("created_at").as("__s_created_at"))
    val t = target.select(
      col(key),
      col(statusCol).as("__t_status"),
      col("created_at").as("__t_created_at"),
      col("updated_at").as("__t_updated_at"),
      col("deleted_at").as("__t_deleted_at"))

    val merged = s.join(t, Seq(key), "full_outer")
      .select(
        col(key),
        // staging wins when present; untouched target rows pass through
        coalesce(col("__s_status"), col("__t_status")).as(statusCol),
        // the reference takes the SOURCE's created_at on every write
        // (retail_transactions.sql:30 `coalesce(s.created_at, s._run_ts)`),
        // not the target's previously stored value
        when(col("__s_status").isNotNull,
          coalesce(col("__s_created_at"), runTs))
          .otherwise(col("__t_created_at")).as("created_at"),
        when(col("__s_status").isNotNull, runTs)
          .otherwise(col("__t_updated_at")).as("updated_at"),
        when(col("__s_status").isNotNull,
          when(col("__s_status") === doneValue,
            coalesce(col("__t_deleted_at"), runTs)))
          .otherwise(col("__t_deleted_at")).as("deleted_at"))
    merged
  }

  /** An empty mart with the merge output schema (first-run target: the
    * reference's dbt model creates the table on its first incremental
    * run). Types derive from the staging frame itself. */
  def emptyTarget(staging: DataFrame, key: String, statusCol: String): DataFrame =
    staging.select(
      col(key), col(statusCol), col("created_at"),
      col("created_at").as("updated_at"),
      col("created_at").as("deleted_at"))
      .limit(0)
}
