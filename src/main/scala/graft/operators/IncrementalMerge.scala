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

  /** Bookkeeping columns the merge derives itself; everything else in the
    * two frames is payload and is carried through (and schema-synced). */
  private def bookkeeping(key: String, statusCol: String): Set[String] =
    Set(key, statusCol, "created_at", "updated_at", "deleted_at")

  /** [[merge]] generalized to ARBITRARY payload columns with schema
    * evolution — the reference's `on_schema_change='sync_all_columns'`
    * (retail_transactions.sql:6) re-expressed for a snapshot-replace lake
    * merge. Each merge run is a full-row replace, so a schema change needs
    * no DDL: the output schema is simply the union of both frames and the
    * next committed snapshot IS the evolved table.
    *
    *   - payload column in BOTH: staging value for merged/inserted rows,
    *     target value for untouched rows. If the types differ, the target
    *     side is cast to the STAGING type (the new schema wins — dbt's
    *     sync semantics for a type change);
    *   - column ADDED by staging: staging value for merged/inserted rows,
    *     null-backfilled for untouched target rows (exactly what
    *     `ALTER TABLE ADD COLUMN` + merge produces in the dbt flow);
    *   - column DROPPED from staging: retained in the target schema so no
    *     history is destroyed, with the value nulled on rows the new
    *     staging rewrites and preserved on untouched rows. (dbt's literal
    *     sync would also drop the column's DDL; on an immutable-snapshot
    *     table that is a lossy choice a merge should not make silently —
    *     pass `dropRemoved = true` for the literal behavior.)
    *
    * Bookkeeping columns (key, status, created_at/updated_at/deleted_at)
    * keep [[merge]]'s exact reference semantics. Output column order:
    * key, status, payload (target order, then added columns in staging
    * order), created_at, updated_at, deleted_at.
    *
    * Scale notes: identical plan shape to [[merge]] — one full-outer
    * equi-join on the key; the schema union is resolved at plan time on
    * the driver, so evolution adds zero runtime cost. */
  def mergeEvolving(
      target: DataFrame,
      staging: DataFrame,
      key: String,
      runTs: Column,
      statusCol: String,
      doneValue: String,
      dropRemoved: Boolean = false): DataFrame = {
    val spec = evolvedSpec(target, staging, key, runTs, statusCol, doneValue, dropRemoved)
    val present = col("__s_present").isNotNull
    spec.s.join(spec.t, Seq(key), "full_outer")
      .select(col(key) +: spec.outCols.map { c =>
        when(present, c.fromStaging).otherwise(c.fromTarget).as(c.name)
      }: _*)
  }

  /** One output column of the evolving merge, split by provenance:
    * `fromStaging` is the value a (re)written row takes — it may read
    * BOTH join sides (created_at/deleted_at coalesce against the target);
    * `fromTarget` is the value an untouched target row keeps, aligned to
    * the evolved output type. [[mergeEvolving]] combines them per row;
    * [[changeFeed]] reads them separately as post-/pre-image. */
  private final case class OutCol(name: String, fromStaging: Column, fromTarget: Column)
  private final case class MergeSpec(s: DataFrame, t: DataFrame, outCols: Seq[OutCol])

  private def evolvedSpec(
      target: DataFrame,
      staging: DataFrame,
      key: String,
      runTs: Column,
      statusCol: String,
      doneValue: String,
      dropRemoved: Boolean): MergeSpec = {
    val book = bookkeeping(key, statusCol)
    val tPayload = target.columns.filterNot(book)
    val sPayload = staging.columns.filterNot(book)
    val sTypes = staging.schema.map(f => f.name -> f.dataType).toMap
    val tTypes = target.schema.map(f => f.name -> f.dataType).toMap

    // explicit presence markers (not a status-null probe): robust to
    // rows that legitimately carry a null status
    val s = staging.select(
      (col(key) +: lit(1).as("__s_present") +:
        col(statusCol).as("__s_status") +:
        col("created_at").as("__s_created_at") +:
        sPayload.map(c => col(c).as(s"__s_$c"))): _*)
    val tHasDeleted = target.columns.contains("deleted_at")
    val t = target.select(
      (col(key) +: lit(1).as("__t_present") +:
        col(statusCol).as("__t_status") +:
        col("created_at").as("__t_created_at") +:
        col("updated_at").as("__t_updated_at") +:
        (if (tHasDeleted) col("deleted_at") else lit(null).cast("timestamp"))
          .as("__t_deleted_at") +:
        tPayload.map(c => col(c).as(s"__t_$c"))): _*)

    val payloadCols: Seq[OutCol] =
      tPayload.filterNot(c => dropRemoved && !sTypes.contains(c)).map { c =>
        if (sTypes.contains(c)) {
          val tc = if (tTypes(c) == sTypes(c)) col(s"__t_$c")
                   else col(s"__t_$c").cast(sTypes(c)) // type change: new schema wins
          OutCol(c, col(s"__s_$c"), tc)
        } else // dropped from staging: retained, nulled on rewritten rows
          OutCol(c, lit(null).cast(tTypes(c)), col(s"__t_$c"))
      } ++
      sPayload.filterNot(tTypes.contains).map { c => // added by staging
        OutCol(c, col(s"__s_$c"), lit(null).cast(sTypes(c)))
      }

    val outCols =
      (OutCol(statusCol,
        // staging wins when it has a status; a present-but-null-status
        // staging row falls through to the target's (q3 oracle coalesce)
        coalesce(col("__s_status"), col("__t_status")), col("__t_status")) +:
        payloadCols) ++ Seq(
        OutCol("created_at",
          coalesce(col("__s_created_at"), runTs), col("__t_created_at")),
        OutCol("updated_at", runTs, col("__t_updated_at")),
        OutCol("deleted_at",
          when(col("__s_status") === doneValue,
            coalesce(col("__t_deleted_at"), runTs)).otherwise(lit(null).cast("timestamp")),
          col("__t_deleted_at")))
    MergeSpec(s, t, outCols)
  }

  /** CHANGE DATA FEED for one [[mergeEvolving]] run — the Delta/Iceberg
    * CDF idea on this merge: one row per CHANGE the run makes, in the
    * evolved output schema plus `_change_type` ∈
    * {{{insert | update_preimage | update_postimage}}}
    * (a staging row whose key is new inserts; a matched key emits its old
    * row as pre-image and its rewritten row as post-image). This merge
    * never hard-deletes — the reference's terminal status is a SOFT
    * delete, visible in the feed as an update whose post-image
    * `deleted_at` turns non-null.
    *
    * Exactly consistent with the merge by construction: both read the
    * same per-column provenance split ([[OutCol]]), so the post-image of
    * a key equals the merged table's row for that key, and the pre-image
    * equals the previous snapshot's row aligned to the evolved schema
    * (added columns null, dropped columns still populated).
    *
    * Scale notes: the feed is O(delta), never O(table) — a staging-side
    * LEFT join (the full-outer's untouched-target branch is exactly what
    * a change feed omits), and pre/post images inflate from one joined
    * row via a 2-element array explode, not a second join or a union of
    * two scans. Same join key, same broadcast/bucket options as the merge
    * itself. */
  def changeFeed(
      target: DataFrame,
      staging: DataFrame,
      key: String,
      runTs: Column,
      statusCol: String,
      doneValue: String,
      dropRemoved: Boolean = false): DataFrame = {
    val spec = evolvedSpec(target, staging, key, runTs, statusCol, doneValue, dropRemoved)
    val matched = col("__t_present").isNotNull
    def img(changeType: Column, of: OutCol => Column) =
      struct(changeType.as("_change_type") +: spec.outCols.map(c => of(c).as(c.name)): _*)
    val pre  = img(lit("update_preimage"), _.fromTarget)
    val post = img(when(matched, lit("update_postimage")).otherwise(lit("insert")),
      _.fromStaging)
    spec.s.join(spec.t, Seq(key), "left")
      .select(col(key),
        explode(when(matched, array(pre, post)).otherwise(array(post))).as("__c"))
      .select(col(key) +: (spec.outCols.map(c => col(s"__c.${c.name}")) :+
        col("__c._change_type").as("_change_type")): _*)
  }

  /** An empty mart with the merge output schema (first-run target: the
    * reference's dbt model creates the table on its first incremental
    * run). Types derive from the staging frame itself — payload columns
    * included, so the first [[mergeEvolving]] run lands the full staging
    * schema. */
  def emptyTarget(staging: DataFrame, key: String, statusCol: String): DataFrame = {
    val payload = staging.columns.filterNot(bookkeeping(key, statusCol))
    staging.select(
      ((col(key) +: col(statusCol) +: payload.map(col)) ++ Seq(
        col("created_at"),
        col("created_at").as("updated_at"),
        col("created_at").cast("timestamp").as("deleted_at"))): _*)
      .limit(0)
  }
}
