package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, IncrementalMerge, Scd2, Snapshots}
import graft.sources.Tables

/** SURVEY.md §2a — the reference's ETL surface (q2–q9), wired to the
  * synthetic tables per the §3 data-model mapping:
  * events(user_id, ts, event_type, ...) plays the transaction change log;
  * `event_type='purchase'` is the terminal status (reference: 'DONE').
  *
  * All timestamps fixed (no now()) so results are oracle-comparable.
  */
object EtlQueries {

  private val T1     = "2024-01-15 00:00:00" // target-state cutoff (mid-range of events)
  private val RunTs  = "2024-02-01 00:00:00" // merge run timestamp
  private val AsOfTs = "2024-01-20 00:00:00" // time-travel point
  private val LoadTs = "2026-01-01 00:00:00" // staging load timestamp
  // end-of-time sentinel: the reference's 9999-12-31 overflows nanosecond
  // timestamp readers (pandas/pyarrow); a ns-safe sentinel keeps the same
  // semantics for this data (which ends in 2024)
  private val EotTs  = "2200-01-01 00:00:00" 

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_staging_ingest"    -> ((s, d) => q2(s, d)),
    "q3_incremental_merge" -> ((s, d) => q3(s, d)),
    "q3b_merge_evolve"     -> ((s, d) => q3b(s, d)),
    "q4_scd2_history"      -> ((s, d) => q4(s, d)),
    "q5_scd2_current"      -> ((s, d) => q5(s, d)),
    "q6_scd2_timetravel"   -> ((s, d) => q6(s, d)),
    "q7_scd2_audit"        -> ((s, d) => q7(s, d)),
    "q8_metrics_rollup"    -> ((s, d) => q8(s, d)),
    "q9_json_ingest"       -> ((s, d) => q9(s, d)),
    "q22_reconcile"        -> ((s, d) => q22(s, d)),
    "q25_changelog"        -> ((s, d) => q25(s, d)),
    "q26_incremental_rollup" -> ((s, d) => q26(s, d)),
    "q23_profile"          -> ((s, d) => q23(s, d)),
    "q24_pit_join"         -> ((s, d) => q24(s, d))
  )

  /** q24: point-in-time fact-to-dimension join — every event annotated
    * with the SCD2 version valid AT ITS OWN TIMESTAMP (not current
    * state): the feature-store primitive that keeps training data free
    * of future leakage. See [[graft.operators.Scd2.pointInTime]]. */
  def q24(s: SparkSession, dir: String): DataFrame = {
    val facts = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    Scd2.pointInTime(scd(s, dir), facts, "user_id", "ts")
      .select(col("event_id"), col("id"), col("ts"),
        col("last_status").as("status_at_event"), col("valid_from"))
      .orderBy(col("event_id"))
  }

  private val ProfileCols = Seq(
    "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** q23: column profiling of the staging source (the stats that inform a
    * [[graft.sources.Contracts]] declaration). One aggregation pass. */
  def q23(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.describe(Tables.orders(s, dir), ProfileCols)
      .orderBy(col("col_name"))

  /** q2: staging truncate-load — typed projection + audit load timestamp
    * (source_transaction_lion_parcel.py extract/load: fixed column list +
    * loaded_at). Pure narrow projection: no shuffle, column-pruned scan. */
  def q2(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey").as("id"),
      col("o_custkey").as("customer_id"),
      col("o_orderstatus").as("last_status"),
      col("o_orderpriority").as("priority"),
      col("o_orderdate").as("created_at"),
      lit(LoadTs).cast("timestamp").as("loaded_at"))
      .orderBy(col("id"))

  private def targetState(s: SparkSession, dir: String): DataFrame =
    Snapshots.stateAsOf(Tables.events(s, dir), "user_id", "ts", "event_type",
        "event_id", Some(lit(T1).cast("timestamp")))
      .withColumn("deleted_at",
        when(col("last_status") === "purchase", col("updated_at")))

  /** q3: incremental merge + soft delete (retail_transactions.sql). */
  def q3(s: SparkSession, dir: String): DataFrame = {
    val staging = Snapshots.stateAsOf(Tables.events(s, dir), "user_id", "ts",
      "event_type", "event_id", None)
    IncrementalMerge.merge(targetState(s, dir), staging, "id",
        lit(RunTs).cast("timestamp"), "last_status", "purchase")
      .orderBy(col("id"))
  }

  /** q3b: the merge with SCHEMA EVOLUTION (dbt on_schema_change=
    * 'sync_all_columns', retail_transactions.sql:6): the target carries a
    * column the new staging dropped (`legacy_flag` — retained, nulled on
    * rewritten rows) and staging carries a column the target lacks
    * (`channel` — null-backfilled onto untouched rows). Staging is a
    * PARTIAL batch (id % 3 != 0) so all three row classes occur: updated,
    * untouched, inserted. See [[IncrementalMerge.mergeEvolving]]. */
  def q3b(s: SparkSession, dir: String): DataFrame = {
    val target = targetState(s, dir)
      .withColumn("legacy_flag", concat(lit("f"), (col("id") % 7).cast("string")))
    val staging = Snapshots.stateAsOf(Tables.events(s, dir), "user_id", "ts",
        "event_type", "event_id", None)
      .filter(col("id") % 3 =!= 0)
      .withColumn("channel", concat(lit("c"), (col("id") % 4).cast("string")))
    IncrementalMerge.mergeEvolving(target, staging, "id",
        lit(RunTs).cast("timestamp"), "last_status", "purchase")
      .orderBy(col("id"))
  }

  /** q25: CHANGE DATA FEED of the q3 merge run — one row per change the
    * hourly merge makes (insert / update pre- and post-image), the
    * incremental-consumer contract [[graft.sources.VersionedTable.readChanges]]
    * serves from storage. O(delta) by construction: staging-side left
    * join, untouched target rows never appear. See
    * [[IncrementalMerge.changeFeed]]. */
  def q25(s: SparkSession, dir: String): DataFrame = {
    val staging = Snapshots.stateAsOf(Tables.events(s, dir), "user_id", "ts",
      "event_type", "event_id", None)
    IncrementalMerge.changeFeed(targetState(s, dir), staging, "id",
        lit(RunTs).cast("timestamp"), "last_status", "purchase")
      .orderBy(col("id"), col("_change_type"))
  }

  /** The q26 maintained-rollup shape: group keys + self-maintainable
    * measures (see [[IncrementalAgg]]). `key_checksum` = sum of ids, the
    * reconcile-style health metric; `n_deleted` counts soft-deleted rows. */
  private val RollupKeys = Seq("last_status", "created_day")
  private def rollupMeasures: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "n_deleted"    -> when(col("deleted_at").isNotNull, lit(1L)).otherwise(lit(0L)),
    "key_checksum" -> col("id"))
  private def withCreatedDay(df: DataFrame): DataFrame =
    df.withColumn("created_day", date_trunc("day", col("created_at")))

  /** q26: INCREMENTALLY-MAINTAINED ROLLUP — the mart aggregate the
    * reference recomputes from the full table every hourly run, maintained
    * instead from the O(delta) change feed of the q3/q25 merge:
    * `merge(rollup(target_before), Δ(changes))`. The oracle recomputes the
    * rollup from the merged state, so the hash match PROVES the
    * maintenance algebra equals a full recompute (counts + exact integer
    * sums; group-key churn — a row changing status — subtracts from the
    * old group and adds to the new one via the pre/post images). Scale:
    * one delta-sized shuffle + a |groups|-sized merge join; untouched
    * target rows are never read. See [[IncrementalAgg]]. */
  def q26(s: SparkSession, dir: String): DataFrame = {
    val target = targetState(s, dir)
    val staging = Snapshots.stateAsOf(Tables.events(s, dir), "user_id", "ts",
      "event_type", "event_id", None)
    val changes = IncrementalMerge.changeFeed(target, staging, "id",
      lit(RunTs).cast("timestamp"), "last_status", "purchase")
    val base = IncrementalAgg.rollup(withCreatedDay(target), RollupKeys, rollupMeasures)
    IncrementalAgg.applyChanges(base, withCreatedDay(changes), RollupKeys, rollupMeasures)
      .orderBy(col("last_status"), col("created_day"))
  }

  private def scd(s: SparkSession, dir: String): DataFrame =
    Scd2.buildFromHistory(Tables.events(s, dir), "user_id", "ts",
      "event_type", "event_id", "purchase", endOfTime = EotTs)

  /** q4: full SCD2 history (retail_transactions_scd.sql). */
  def q4(s: SparkSession, dir: String): DataFrame =
    scd(s, dir).orderBy(col("id"), col("valid_from"))

  /** q5: current active state (scd "USEFUL QUERIES" #1/#8). */
  def q5(s: SparkSession, dir: String): DataFrame =
    Scd2.currentState(scd(s, dir), activeOnly = true)
      .select(col("id"), col("last_status"), col("valid_from"))
      .orderBy(col("id"))

  /** q6: time-travel (scd "USEFUL QUERIES" #3). */
  def q6(s: SparkSession, dir: String): DataFrame =
    Scd2.asOf(scd(s, dir), lit(AsOfTs).cast("timestamp"))
      .select(col("id"), col("last_status"), col("valid_from"), col("valid_to"))
      .orderBy(col("id"))

  /** q7: audit rollup (scd "USEFUL QUERIES" #5). */
  def q7(s: SparkSession, dir: String): DataFrame =
    Scd2.audit(scd(s, dir)).orderBy(col("id"))

  /** q8: per-id metric rollup (aggregate_one_row_per_id in the bonus
    * pipeline): max-timestamp, weighted mean (decimal-exact sum), sorted
    * distinct message list. One shuffle, map-side partial agg. */
  def q8(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).groupBy(col("user_id").as("id")).agg(
      max(col("ts")).as("runtime_date"),
      count(lit(1)).as("cnt"),
      (sum(col("value").cast("decimal(12,2)")).cast("double")
        / count(lit(1)) / lit(60000.0)).as("load_time"),
      array_join(array_sort(collect_set(col("event_type"))), "; ").as("message"))
      .orderBy(col("id"))

  /** q9: semi-structured JSON field extraction + aggregate
    * (process_one_file's payload parsing, on events.props). */
  def q9(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** q22: migration/merge validation — full-outer reconciliation of the
    * T1 target state against the latest staging state (the diff a user
    * switching engines runs to prove equivalence). See
    * [[graft.operators.Reconcile]]: one full-outer key join. */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val staging = Snapshots.stateAsOf(Tables.events(s, dir), "user_id", "ts",
      "event_type", "event_id", None)
    graft.operators.Reconcile
      .diff(targetState(s, dir), staging, "id", Seq("last_status", "updated_at"))
      .select(col("id"), col("status"),
        col("l_last_status"), col("r_last_status"))
      .orderBy(col("id"))
  }

  private val stateCte =
    s"""te AS (
       |  SELECT user_id, ts, event_id, event_type,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
       |         min(ts) OVER (PARTITION BY user_id) AS created_at
       |  FROM events WHERE ts <= TIMESTAMP '$T1'
       |), target AS (
       |  SELECT user_id AS id, event_type AS last_status, created_at, ts AS updated_at,
       |         CASE WHEN event_type = 'purchase' THEN ts END AS deleted_at
       |  FROM te WHERE rn = 1
       |), se AS (
       |  SELECT user_id, ts, event_id, event_type,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
       |         min(ts) OVER (PARTITION BY user_id) AS created_at
       |  FROM events
       |), staging AS (
       |  SELECT user_id AS id, event_type AS last_status, created_at, ts AS updated_at
       |  FROM se WHERE rn = 1
       |)""".stripMargin

  private val scdCte =
    """ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events
      |), changes AS (
      |  SELECT user_id, ts, event_id, event_type FROM ordered
      |  WHERE prev IS NULL OR prev <> event_type
      |), versioned AS (
      |  SELECT user_id AS id, event_type AS last_status, ts AS valid_from,
      |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_raw
      |  FROM changes
      |)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q2_staging_ingest" ->
      s"""SELECT o_orderkey AS id, o_custkey AS customer_id,
         |  o_orderstatus AS last_status, o_orderpriority AS priority,
         |  o_orderdate AS created_at,
         |  TIMESTAMP '$LoadTs' AS loaded_at
         |FROM orders ORDER BY id""".stripMargin,

    "q3_incremental_merge" ->
      s"""WITH $stateCte
         |SELECT coalesce(s.id, t.id) AS id,
         |  coalesce(s.last_status, t.last_status) AS last_status,
         |  CASE WHEN s.id IS NOT NULL
         |       THEN coalesce(s.created_at, TIMESTAMP '$RunTs')
         |       ELSE t.created_at END AS created_at,
         |  CASE WHEN s.id IS NOT NULL THEN TIMESTAMP '$RunTs'
         |       ELSE t.updated_at END AS updated_at,
         |  CASE WHEN s.id IS NOT NULL
         |       THEN (CASE WHEN s.last_status = 'purchase'
         |                  THEN coalesce(t.deleted_at, TIMESTAMP '$RunTs') END)
         |       ELSE t.deleted_at END AS deleted_at
         |FROM staging s FULL OUTER JOIN target t ON s.id = t.id
         |ORDER BY id""".stripMargin,

    // schema-evolution merge: target has legacy_flag (dropped by staging →
    // retained, nulled on rewritten rows), staging has channel (added →
    // null-backfilled onto untouched rows); staging is the id%3!=0 slice
    "q3b_merge_evolve" ->
      s"""WITH $stateCte,
         |t2 AS (SELECT *, 'f' || CAST(id % 7 AS VARCHAR) AS legacy_flag FROM target),
         |s2 AS (SELECT *, 'c' || CAST(id % 4 AS VARCHAR) AS channel
         |       FROM staging WHERE id % 3 <> 0)
         |SELECT coalesce(s.id, t.id) AS id,
         |  coalesce(s.last_status, t.last_status) AS last_status,
         |  CASE WHEN s.id IS NULL THEN t.legacy_flag END AS legacy_flag,
         |  CASE WHEN s.id IS NOT NULL THEN s.channel END AS channel,
         |  CASE WHEN s.id IS NOT NULL
         |       THEN coalesce(s.created_at, TIMESTAMP '$RunTs')
         |       ELSE t.created_at END AS created_at,
         |  CASE WHEN s.id IS NOT NULL THEN TIMESTAMP '$RunTs'
         |       ELSE t.updated_at END AS updated_at,
         |  CASE WHEN s.id IS NOT NULL
         |       THEN (CASE WHEN s.last_status = 'purchase'
         |                  THEN coalesce(t.deleted_at, TIMESTAMP '$RunTs') END)
         |       ELSE t.deleted_at END AS deleted_at
         |FROM s2 s FULL OUTER JOIN t2 t ON s.id = t.id
         |ORDER BY id""".stripMargin,

    // change feed of the q3 merge: matched keys emit pre+post images with
    // the exact q3 merged values; staging-only keys emit inserts;
    // untouched target keys emit nothing
    "q25_changelog" ->
      s"""WITH $stateCte
         |SELECT s.id AS id, t.last_status, t.created_at, t.updated_at, t.deleted_at,
         |  'update_preimage' AS _change_type
         |FROM staging s JOIN target t ON s.id = t.id
         |UNION ALL
         |SELECT s.id AS id,
         |  coalesce(s.last_status, t.last_status) AS last_status,
         |  coalesce(s.created_at, TIMESTAMP '$RunTs') AS created_at,
         |  TIMESTAMP '$RunTs' AS updated_at,
         |  CASE WHEN s.last_status = 'purchase'
         |       THEN coalesce(t.deleted_at, TIMESTAMP '$RunTs') END AS deleted_at,
         |  'update_postimage' AS _change_type
         |FROM staging s JOIN target t ON s.id = t.id
         |UNION ALL
         |SELECT s.id AS id, s.last_status,
         |  coalesce(s.created_at, TIMESTAMP '$RunTs') AS created_at,
         |  TIMESTAMP '$RunTs' AS updated_at,
         |  CASE WHEN s.last_status = 'purchase'
         |       THEN TIMESTAMP '$RunTs' END AS deleted_at,
         |  'insert' AS _change_type
         |FROM staging s LEFT JOIN target t ON s.id = t.id
         |WHERE t.id IS NULL
         |ORDER BY id, _change_type""".stripMargin,

    // maintained rollup ≡ full recompute: the oracle aggregates the q3
    // merged state directly; the Spark side never does — it merges the
    // pre-merge rollup with the change-feed deltas
    "q26_incremental_rollup" ->
      s"""WITH $stateCte,
         |merged AS (
         |  SELECT coalesce(s.id, t.id) AS id,
         |    coalesce(s.last_status, t.last_status) AS last_status,
         |    CASE WHEN s.id IS NOT NULL
         |         THEN coalesce(s.created_at, TIMESTAMP '$RunTs')
         |         ELSE t.created_at END AS created_at,
         |    CASE WHEN s.id IS NOT NULL
         |         THEN (CASE WHEN s.last_status = 'purchase'
         |                    THEN coalesce(t.deleted_at, TIMESTAMP '$RunTs') END)
         |         ELSE t.deleted_at END AS deleted_at
         |  FROM staging s FULL OUTER JOIN target t ON s.id = t.id)
         |SELECT last_status, date_trunc('day', created_at) AS created_day,
         |  count(*) AS n_rows,
         |  sum(CASE WHEN deleted_at IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_deleted,
         |  sum(id)::BIGINT AS key_checksum
         |FROM merged GROUP BY 1, 2
         |ORDER BY last_status, created_day""".stripMargin,

    "q4_scd2_history" ->
      s"""WITH $scdCte
         |SELECT id, last_status, valid_from,
         |  coalesce(valid_to_raw, TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
         |  valid_to_raw IS NULL AS is_current,
         |  CASE WHEN last_status = 'purchase' THEN valid_from END AS deleted_at
         |FROM versioned ORDER BY id, valid_from""".stripMargin,

    "q5_scd2_current" ->
      s"""WITH $scdCte
         |SELECT id, last_status, valid_from
         |FROM versioned
         |WHERE valid_to_raw IS NULL AND last_status <> 'purchase'
         |ORDER BY id""".stripMargin,

    "q6_scd2_timetravel" ->
      s"""WITH $scdCte
         |SELECT id, last_status, valid_from,
         |  coalesce(valid_to_raw, TIMESTAMP '2200-01-01 00:00:00') AS valid_to
         |FROM versioned
         |WHERE valid_from <= TIMESTAMP '$AsOfTs'
         |  AND TIMESTAMP '$AsOfTs' < coalesce(valid_to_raw, TIMESTAMP '2200-01-01 00:00:00')
         |ORDER BY id""".stripMargin,

    "q7_scd2_audit" ->
      s"""WITH $scdCte
         |SELECT id, count(*) AS version_count,
         |  min(valid_from) AS first_seen, max(valid_from) AS last_change
         |FROM versioned GROUP BY id ORDER BY id""".stripMargin,

    "q8_metrics_rollup" ->
      """SELECT user_id AS id, max(ts) AS runtime_date, count(*) AS cnt,
        |  (sum(value::DECIMAL(12,2)))::DOUBLE / count(*) / 60000.0 AS load_time,
        |  string_agg(DISTINCT event_type, '; ' ORDER BY event_type) AS message
        |FROM events GROUP BY user_id ORDER BY id""".stripMargin,

    "q22_reconcile" ->
      s"""WITH $stateCte
         |SELECT coalesce(t.id, s.id) AS id,
         |  CASE WHEN t.id IS NULL THEN 'only_right'
         |       WHEN s.id IS NULL THEN 'only_left'
         |       WHEN t.last_status IS DISTINCT FROM s.last_status
         |         OR t.updated_at IS DISTINCT FROM s.updated_at THEN 'changed'
         |       ELSE 'same' END AS status,
         |  t.last_status AS l_last_status, s.last_status AS r_last_status
         |FROM target t FULL OUTER JOIN staging s ON t.id = s.id
         |ORDER BY id""".stripMargin,

    "q24_pit_join" ->
      s"""WITH $scdCte,
         |v AS (SELECT id, last_status, valid_from,
         |    coalesce(valid_to_raw, TIMESTAMP '$EotTs') AS valid_to
         |  FROM versioned)
         |SELECT e.event_id, v.id, e.ts,
         |  v.last_status AS status_at_event, v.valid_from
         |FROM events e JOIN v
         |  ON e.user_id = v.id AND v.valid_from <= e.ts AND e.ts < v.valid_to
         |ORDER BY e.event_id""".stripMargin,

    "q23_profile" -> ProfileCols.map(c =>
      s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
         |  (count(*) - count($c))::BIGINT AS n_nulls,
         |  count(DISTINCT $c)::BIGINT AS n_distinct,
         |  min($c)::VARCHAR AS min_value, max($c)::VARCHAR AS max_value
         |FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "q9_json_ingest" ->
      """SELECT event_type, count(*) AS n,
        |  (sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)))::BIGINT AS sum_k,
        |  max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
