package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the classic event-stream operator the
  * reference's hourly pipeline (dags/retail_hourly_etl.py feeding
  * retail_transactions) implies when users analyze activity runs: split each
  * entity's event sequence into sessions wherever the inter-event gap
  * exceeds a threshold.
  *
  * Formulation: session boundary flag via `lag`, then a running sum of the
  * flag assigns session ids — both window functions share one
  * `partitionBy(key)` so the whole operator is a SINGLE shuffle; the final
  * per-session aggregate re-uses the same hash partitioning (Catalyst sees
  * the child output partitioned by `key`, a superset-compatible grouping of
  * `(key, session_id)` is not automatic, but AQE coalesces; at 100 TB the
  * event log is date-partitioned so each run sessionizes only recent
  * partitions).
  *
  * Gap arithmetic is integer microseconds (`unix_micros`) — exact, and
  * bit-identical to DuckDB's `epoch_us` for oracle comparison.
  */
object Sessionize {

  /** Tag every event with its session id (1-based per key, increasing by
    * event time). Deterministic tiebreak on `seqCol`. */
  def tag(
      events: DataFrame,
      key: String,
      tsCol: String,
      seqCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(seqCol))
    val us = unix_micros(col(tsCol))
    events
      .withColumn("__prev_us", lag(us, 1).over(w))
      .withColumn("__new",
        (col("__prev_us").isNull || us - col("__prev_us") > gapSeconds * 1000000L)
          .cast("long"))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_us", "__new")
  }

  /** One row per session: bounds, event count, exact (decimal) value sum. */
  def sessions(
      events: DataFrame,
      key: String,
      tsCol: String,
      seqCol: String,
      gapSeconds: Long,
      valueCol: String): DataFrame =
    tag(events, key, tsCol, seqCol, gapSeconds)
      .groupBy(col(key).as("id"), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(12,2)")).cast("double").as("sum_value"))
}
