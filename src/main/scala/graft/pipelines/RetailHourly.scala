package graft.pipelines

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Pipeline
import graft.Pipeline.Stage
import graft.operators.{MetricsIngest, Scd2, Snapshots}
import graft.sources.{Sinks, Tables}

/** The reference's hourly ETL (`dags/retail_hourly_etl.py`:
  * extract >> scd, plus the bonus export pipeline) re-expressed as a
  * graft [[Pipeline]] over the synthetic tables: every stage is one of
  * the engine's operators writing through an idempotent sink, so a
  * re-run (Airflow retry / backfill) converges to identical output —
  * spec-asserted in RetailHourlySpec.
  *
  * Stage graph:
  * {{{
  *   extract_staging ─▶ merge_mart
  *                  └─▶ scd_history ─▶ export_audit_csv
  * }}}
  */
object RetailHourly {

  final case class Paths(root: String) {
    val staging  = s"$root/staging"
    val mart     = s"$root/mart"
    val scd      = s"$root/scd"
    val auditCsv = s"$root/audit.csv"
  }

  /** Build the stage list (pure — nothing runs until [[Pipeline.run]]). */
  def stages(spark: SparkSession, sfDir: String, p: Paths,
      runTs: String = "2026-01-01 00:00:00"): Seq[Stage] = Seq(

    Stage("extract_staging")(() =>
      // source_transaction_lion_parcel.py: latest-state extract,
      // truncate-load into staging
      Sinks.truncateLoad(
        Snapshots.stateAsOf(Tables.events(spark, sfDir),
          "user_id", "ts", "event_type", "event_id", None),
        p.staging)),

    Stage("merge_mart", deps = Seq("extract_staging"))(() =>
      // dbt retail_transactions: incremental merge with soft delete
      Sinks.upsertByKey(spark, p.mart,
        spark.read.parquet(p.staging), "id",
        lit(runTs).cast("timestamp"), "last_status", "purchase")),

    Stage("scd_history", deps = Seq("extract_staging"))(() =>
      // retail_transactions_scd.py: full SCD2 table rebuild
      Sinks.truncateLoad(
        Scd2.buildFromHistory(Tables.events(spark, sfDir),
          "user_id", "ts", "event_type", "event_id", "purchase",
          endOfTime = "2200-01-01 00:00:00"),
        p.scd)),

    Stage("export_audit_csv", deps = Seq("scd_history"))(() =>
      // the bonus pipeline's single-file CSV deliverable shape
      Sinks.csvExport(
        Scd2.audit(spark.read.parquet(p.scd)).orderBy(col("id")),
        p.auditCsv)))

  def run(spark: SparkSession, sfDir: String, root: String): Seq[Pipeline.StageResult] =
    Pipeline.run(stages(spark, sfDir, Paths(root)))
}

/** The reference's SECOND DAG (`dags/bonus_test.py`:
  * lion_parcell_bonus_test_stg >> lion_parcell_bonus_test) — the JSON
  * metric-drop ingest whose committed inputs AND outputs ship in the
  * reference repo, run as a graft [[Pipeline]]: flatten the drops, land
  * the per-file detail, roll up per metric id, export the final CSV.
  * BonusDailySpec proves the pipeline output equals the reference's own
  * committed `combined_table.csv`. */
object BonusDaily {

  final case class Paths(root: String) {
    val detail   = s"$root/detail"
    val rollup   = s"$root/rollup"
    val finalCsv = s"$root/combined_table.csv"
  }

  def stages(spark: SparkSession, dropGlob: String, p: Paths): Seq[Pipeline.Stage] = Seq(

    Pipeline.Stage("bonus_stg")(() =>
      // lion_parcell_bonus_test_stg.py: per-(file, metric) detail rows
      Sinks.truncateLoad(MetricsIngest.flatten(spark, dropGlob), p.detail)),

    Pipeline.Stage("bonus_final", deps = Seq("bonus_stg"))(() => {
      // lion_parcell_bonus_test.py: one row per id + the CSV deliverable
      val rolled = MetricsIngest.rollup(spark.read.parquet(p.detail))
      Sinks.truncateLoad(rolled, p.rollup)
      Sinks.csvExport(
        spark.read.parquet(p.rollup)
          .select(col("id"), col("runtime_date"), col("load_time"),
            col("message").as("Message"))
          .orderBy(col("id")),
        p.finalCsv)
    }))

  def run(spark: SparkSession, dropGlob: String, root: String): Seq[Pipeline.StageResult] =
    Pipeline.run(stages(spark, dropGlob, Paths(root)))
}
