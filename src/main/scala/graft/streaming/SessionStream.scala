package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Stateful streaming sessionization (SURVEY.md §2f supporting component):
  * the incremental, unbounded-stream counterpart of the batch
  * [[graft.operators.Sessionize]] operator, built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState`.
  *
  * Semantics match the batch operator: events of one key are split into
  * sessions wherever the inter-event gap EXCEEDS `gapSeconds` (strict >,
  * microsecond arithmetic). A session closes when a later event arrives
  * past the gap, or when the event-time watermark passes its expiry
  * (EventTimeTimeout) — so state is bounded: one open session per active
  * key, closed sessions are emitted and dropped.
  *
  * Scale: state lives in the state store partitioned by key (the one
  * shuffle); per-key state is O(1) regardless of history length — this is
  * the 100 TB-stream answer to the batch operator's
  * partitionBy(key)+window formulation.
  */
object SessionStream {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Exact microsecond epoch of a Timestamp (getTime is ms-truncated;
    * the sub-ms part lives in getNanos). */
  def tsUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long, sumValue: Double)
  case class Session(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      sum_value: Double)

  /** Core gap fold shared by the streaming ([[updateKey]]) and batch
    * ([[sessionizeBatch]]) paths: fold time-sorted events of one key into
    * the open-session state, returning the sessions closed by a gap and
    * the still-open tail.
    *
    * Late data: an event the watermark still admits but whose ts precedes
    * the open session's last event merges conservatively (delta is
    * negative, hence <= gap) and lowers the session start. Exact
    * retroactive splitting for lateness beyond the gap would need a
    * multi-interval merge state; bound the watermark delay <= gap to make
    * the conservative merge exact. */
  def foldSorted(
      userId: Long,
      sorted: Iterator[Event],
      open0: Option[OpenSession],
      gapUs: Long): (List[Session], Option[OpenSession]) = {
    val closed = List.newBuilder[Session]
    var open = open0
    sorted.foreach { e =>
      val us = tsUs(e.ts)
      open match {
        case Some(s) if us - s.lastUs <= gapUs =>
          // min() on start: a late event admitted by the watermark can sort
          // before the open session's first event of an earlier micro-batch
          open = Some(OpenSession(math.min(s.startUs, us), math.max(s.lastUs, us),
            s.nEvents + 1, s.sumValue + e.value))
        case Some(s) =>
          closed += Session(userId, s.startUs, s.lastUs, s.nEvents, s.sumValue)
          open = Some(OpenSession(us, us, 1L, e.value))
        case None =>
          open = Some(OpenSession(us, us, 1L, e.value))
      }
    }
    (closed.result(), open)
  }

  /** Fold a key's new (unordered) micro-batch events into the open-session
    * state; emit every session closed by a gap. On event-time timeout the
    * open session is flushed. */
  def updateKey(
      userId: Long,
      rows: Iterator[Event],
      state: GroupState[OpenSession],
      gapSeconds: Long): Iterator[Session] = {
    val gapUs = gapSeconds * 1000000L
    if (!rows.hasNext) {
      // timeout path: watermark passed the open session's expiry → flush
      val out = state.getOption.map(s =>
        Session(userId, s.startUs, s.lastUs, s.nEvents, s.sumValue)).toList
      state.remove()
      return out.iterator
    }
    val sorted = rows.toArray.sortBy(e => tsUs(e.ts))
    val (closed, open) = foldSorted(userId, sorted.iterator, state.getOption, gapUs)
    open.foreach { s =>
      state.update(s)
      // close when the watermark passes last-event + gap; a very late key's
      // computed expiry can already be <= the current watermark, which
      // setTimeoutTimestamp rejects — clamp to watermark+1 so it fires on
      // the next watermark advance instead of throwing
      val wm = state.getCurrentWatermarkMs()
      if (wm >= 0)
        state.setTimeoutTimestamp(
          math.max(s.lastUs / 1000L + gapSeconds * 1000L + 1L, wm + 1L))
    }
    closed.iterator
  }

  /** Batch run of the SAME stateful fold (st2): each key's full history is
    * one group, the fold closes sessions at every gap and the final open
    * session is flushed — so the output covers every event, matching the
    * batch window formulation exactly.
    *
    * Scale: one shuffle on the key (same as the window formulation); the
    * per-key buffer is O(events of that key) — the trade for running
    * arbitrary imperative state logic. Keys here are users; a pathological
    * single-key skew would call for pre-splitting by (key, coarse time). */
  def sessionizeBatch(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    implicit val so: org.apache.spark.sql.Encoder[Session] = Encoders.product[Session]
    implicit val sl: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    val gapUs = gapSeconds * 1000000L
    events.groupByKey(_.user_id).flatMapGroups { (k: Long, rows: Iterator[Event]) =>
      val sorted = rows.toArray.sortBy(e => tsUs(e.ts))
      val (closed, open) = foldSorted(k, sorted.iterator, None, gapUs)
      (closed ++ open.map(s => Session(k, s.startUs, s.lastUs, s.nEvents, s.sumValue))).iterator
    }
  }

  /** Sessionize a (streaming or batch) typed event Dataset. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    implicit val se: org.apache.spark.sql.Encoder[OpenSession] = Encoders.product[OpenSession]
    implicit val so: org.apache.spark.sql.Encoder[Session] = Encoders.product[Session]
    implicit val sl: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: Long, rows: Iterator[Event], st: GroupState[OpenSession]) =>
          updateKey(k, rows, st, gapSeconds))
  }

  /** Streaming pipeline over an events parquet directory into a memory
    * sink: file source → watermark → stateful sessionize → append. */
  def start(
      spark: SparkSession,
      dir: String,
      sinkTable: String,
      gapSeconds: Long,
      availableNow: Boolean = false,
      statePartitions: Option[Int] = None): StreamingQuery =
    EventStream.withStatePartitions(spark, statePartitions) {
      import spark.implicits._
      val typed = EventStream.readEvents(spark, dir)
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("ts"), col("value"))
        .as[Event]
      val w = sessionize(typed, gapSeconds)
        .writeStream
        .format("memory")
        .queryName(sinkTable)
        .outputMode("append")
      (if (availableNow)
         w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
       else w).start()
    }
}
