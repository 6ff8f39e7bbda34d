package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Builds "current state" snapshots from an append-only event/change log —
  * the shape the reference keeps in its source table
  * (`schema_punten.source_transaction_lion_parcel`, see
  * public/source_transaction_lion_parcel.py:31-46) and re-extracts every run.
  *
  * Scale notes: one shuffle on the entity key; both window functions and the
  * min/max aggregates run within the same hash partitioning. At 100 TB the
  * event log is typically date-partitioned parquet, so `asOf` prunes whole
  * partitions before the shuffle.
  */
object Snapshots {

  /** Latest-state-per-entity as of `asOf` (inclusive), with first/last
    * activity timestamps. Deterministic tiebreak on `seqCol` for equal
    * timestamps.
    *
    * Output: key, last_status, created_at (= min ts), updated_at (= max ts).
    */
  def stateAsOf(
      events: DataFrame,
      key: String,
      tsCol: String,
      statusCol: String,
      seqCol: String,
      asOf: Option[Column] = None): DataFrame = {
    val filtered = asOf.map(t => events.filter(col(tsCol) <= t)).getOrElse(events)
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol).desc, col(seqCol).desc)
    filtered
      .withColumn("__rn", row_number().over(w))
      .withColumn("created_at", min(col(tsCol)).over(Window.partitionBy(col(key))))
      .filter(col("__rn") === 1)
      .select(
        col(key).as("id"),
        col(statusCol).as("last_status"),
        col("created_at"),
        col(tsCol).as("updated_at"))
  }
}
