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

  /** Whale-key-safe sessionization, bit-identical to [[sessions]]
    * (spec-asserted): the window-skew mitigation SURVEY §5 describes,
    * implemented.
    *
    * [[sessions]] puts a key's ENTIRE history in one window partition —
    * irreducible for a whale key that owns half the events. Here the
    * partition key is (key, time-chunk), so no task ever sorts more than
    * one key's events within one chunk:
    *
    *  1. sessionize within each (key, chunk) — the standard lag/running
    *     sum, over bounded partitions;
    *  2. aggregate each partial session to one summary row (bounds,
    *     count, exact decimal sum);
    *  3. sessionize the SUMMARIES per key with the same gap rule — two
    *     partial sessions merge iff the gap between them is ≤ the
    *     threshold, which transitively stitches sessions spanning any
    *     number of chunk boundaries; additive aggregates re-combine
    *     exactly, and the phase-3 input is O(chunks + sessions) rows per
    *     key, not O(events).
    *
    * Choose `chunkSeconds` so one key's events per chunk fit a task
    * (e.g. a day of a whale user), and ≥ gapSeconds so most sessions
    * close inside their chunk. */
  def sessionsChunked(
      events: DataFrame,
      key: String,
      tsCol: String,
      seqCol: String,
      gapSeconds: Long,
      valueCol: String,
      chunkSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val us = unix_micros(col(tsCol))
    val wc = Window.partitionBy(col(key), col("__chunk"))
      .orderBy(col(tsCol), col(seqCol))
    val partial = events
      .withColumn("__chunk", floor(us / lit(chunkSeconds * 1000000L)))
      .withColumn("__prev_us", lag(us, 1).over(wc))
      .withColumn("__new",
        (col("__prev_us").isNull || us - col("__prev_us") > gapUs).cast("long"))
      .withColumn("__sid",
        sum(col("__new")).over(wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("__chunk"), col("__sid"))
      .agg(
        min(col(tsCol)).as("__s"), max(col(tsCol)).as("__e"),
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(12,2)")).as("__v"))
    // chunks are disjoint in time per key, so ordering summaries by start
    // is the global session order; same gap rule merges across boundaries
    val wk = Window.partitionBy(col(key)).orderBy(col("__s"), col("__e"))
    partial
      .withColumn("__prev_e", lag(unix_micros(col("__e")), 1).over(wk))
      .withColumn("__new",
        (col("__prev_e").isNull || unix_micros(col("__s")) - col("__prev_e") > gapUs)
          .cast("long"))
      .withColumn("session_id",
        sum(col("__new")).over(wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key).as("id"), col("session_id"))
      .agg(
        min(col("__s")).as("session_start"),
        max(col("__e")).as("session_end"),
        sum(col("__n")).as("n_events"),
        sum(col("__v")).cast("double").as("sum_value"))
  }
}
