package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The stateful streaming sessionizer must agree with the batch window
  * formulation (graft.operators.Sessionize) on every session the watermark
  * has closed. */
class SessionStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val gap = 3600L

  test("streamed closed sessions equal the batch operator's closed set") {
    val events = graft.sources.Tables.events(spark, dir)
    val maxTsUs = events.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)

    // batch truth: sessions whose expiry the final watermark passed
    val batch = graft.operators.Sessionize
      .sessions(events, "user_id", "ts", "event_id", gap, "value")
      .select(col("id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter { case (_, _, e, _) => e + gap * 1000000L + 1000L <= maxTsUs }
      .toSet

    val stage = java.nio.file.Files.createTempDirectory("graft_sess_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val q = SessionStream.start(spark, stage.toString, "sess_sink", gap)
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sess_sink")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(streamed.nonEmpty)
    assert(batch.subsetOf(streamed))
    // streamed may additionally contain timeout-flushed sessions right at
    // the watermark boundary; it must never contain a session batch lacks
    val batchAll = graft.operators.Sessionize
      .sessions(events, "user_id", "ts", "event_id", gap, "value")
      .select(col("id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed.subsetOf(batchAll))
  }

  test("foldSorted lowers the open session's start for an admitted late event") {
    import SessionStream.{Event, OpenSession}
    def ev(us: Long) = Event(1L, new java.sql.Timestamp(us / 1000L), 1.0)
    // open session started at 10s; a late event at 7s (within gap) arrives
    // in the next micro-batch — the merged session must start at 7s
    val open0 = Some(OpenSession(10000000L, 10000000L, 1L, 1.0))
    val (closed, open) =
      SessionStream.foldSorted(1L, Iterator(ev(7000000L)), open0, gapUs = 5000000L)
    assert(closed.isEmpty)
    assert(open.get.startUs == 7000000L && open.get.lastUs == 10000000L
      && open.get.nEvents == 2L)
    // any watermark-admitted late event merges conservatively (negative
    // delta always <= gap) — the session absorbs it and lowers its start
    val (closed2, open2) =
      SessionStream.foldSorted(1L, Iterator(ev(1000000L)), open0, gapUs = 5000000L)
    assert(closed2.isEmpty)
    assert(open2.get.startUs == 1000000L && open2.get.lastUs == 10000000L)
  }

  test("batch run of the stateful fold equals the window formulation exactly") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, dir)
    // fold values as exact integer cents so the imperative running sum is
    // comparable without FP-order concerns (same trick as st2)
    val cents = (col("value").cast("decimal(12,2)") * 100).cast("long")
    val typed = events
      .select(col("user_id"), col("ts"), cents.cast("double").as("value"))
      .as[SessionStream.Event]
    val folded = SessionStream.sessionizeBatch(typed, gap).collect()
      .map(s => (s.user_id, s.session_start_us, s.session_end_us,
        s.n_events, s.sum_value.toLong)).toSet

    val windowed = graft.operators.Sessionize
      .sessions(events.withColumn("cents", cents),
        "user_id", "ts", "event_id", gap, "cents")
      .select(col("id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"),
        col("sum_value").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    assert(folded.nonEmpty)
    assert(folded == windowed)
  }
}
