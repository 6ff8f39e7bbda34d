package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuously-maintained entity state — the STREAMING face of the
  * reference's core merge pipeline (truncate-extract + incremental merge,
  * `public/source_transaction_lion_parcel.py` +
  * `dbt/models/marts/retail_transactions.sql`): instead of re-deriving
  * latest-state-per-entity every run ([[graft.operators.Snapshots]]), the
  * state updates incrementally per micro-batch with
  * `mapGroupsWithState`.
  *
  * The per-key state is an ASSOCIATIVE fold — (latest (ts, seq) wins the
  * status, min ts is created_at) — so arrival order across micro-batches
  * cannot change the result: stream output ≡ batch output, spec-asserted.
  * Soft delete follows the reference's terminal-status rule:
  * `deleted_at = updated_at` while the latest status is terminal, cleared
  * when the entity moves off terminal (dbt model lines 18-21 semantics).
  *
  * Scale: O(1) state per entity (four scalars), hash-partitioned by key —
  * the one shuffle; emission is Update-mode (one row per touched key per
  * micro-batch). The batch face runs the SAME fold via mapGroups.
  */
object StateStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)

  case class EntityState(
      id: Long,
      last_status: String,
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp,
      deleted_at: Option[java.sql.Timestamp])

  /** Internal fold state: latest (ts, seq) owns the status. */
  case class Acc(lastUs: Long, lastSeq: Long, status: String, minUs: Long)

  private def us(t: java.sql.Timestamp): Long = SessionStream.tsUs(t)

  /** Merge one event into the state — associative and commutative over
    * event multisets (argmax by (ts, seq) and min are both order-free). */
  def merge(a: Option[Acc], e: Ev): Acc = a match {
    case None => Acc(us(e.ts), e.event_id, e.event_type, us(e.ts))
    case Some(s) =>
      val newer = us(e.ts) > s.lastUs || (us(e.ts) == s.lastUs && e.event_id > s.lastSeq)
      Acc(
        if (newer) us(e.ts) else s.lastUs,
        if (newer) e.event_id else s.lastSeq,
        if (newer) e.event_type else s.status,
        math.min(s.minUs, us(e.ts)))
  }

  /** Exact inverse of [[SessionStream.tsUs]]: whole seconds first, then
    * the full sub-second nanos. */
  private def usToTs(usv: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(usv, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(usv, 1000000L) * 1000L).toInt)
    t
  }

  def toState(id: Long, s: Acc, terminal: String): EntityState =
    EntityState(id, s.status, usToTs(s.minUs), usToTs(s.lastUs),
      if (s.status == terminal) Some(usToTs(s.lastUs)) else None)

  /** Batch face: one `mapGroups` pass with the identical fold. */
  def currentStates(events: Dataset[Ev], terminal: String): Dataset[EntityState] = {
    implicit val e: org.apache.spark.sql.Encoder[EntityState] = Encoders.product[EntityState]
    implicit val l: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id).mapGroups { (id, it) =>
      val acc = it.foldLeft(Option.empty[Acc])((a, ev) => Some(merge(a, ev)))
      toState(id, acc.get, terminal)
    }
  }

  /** Streaming face: Update-mode state maintenance, no timeout (entity
    * state lives for the life of the entity — it IS the table). */
  def updateStates(events: Dataset[Ev], terminal: String): Dataset[EntityState] = {
    implicit val sa: org.apache.spark.sql.Encoder[Acc] = Encoders.product[Acc]
    implicit val se: org.apache.spark.sql.Encoder[EntityState] = Encoders.product[EntityState]
    implicit val l: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (id: Long, rows: Iterator[Ev], state: GroupState[Acc]) => {
          val acc = rows.foldLeft(state.getOption)((a, ev) => Some(merge(a, ev)))
          state.update(acc.get)
          toState(id, acc.get, terminal)
        })
  }

  /** Start the streaming state table over an events parquet dir into a
    * memory sink (update mode — latest row per key per batch). */
  def start(
      spark: SparkSession,
      dir: String,
      sinkTable: String,
      terminal: String,
      availableNow: Boolean = false,
      statePartitions: Option[Int] = None): StreamingQuery =
    EventStream.withStatePartitions(spark, statePartitions) {
      import spark.implicits._
      val typed = EventStream.readEvents(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .as[Ev]
      val w = updateStates(typed, terminal)
        .writeStream
        .format("memory")
        .queryName(sinkTable)
        .outputMode("update")
      (if (availableNow)
         w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
       else w).start()
    }
}
