package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming event pipeline (SURVEY.md §2f). The reference runs
  * its ETL on an hourly Airflow schedule (dags/retail_hourly_etl.py:43
  * `schedule_interval="0 * * * *"`); the Spark-native expression of that
  * cadence is a streaming tumbling-window aggregation — same transform,
  * incremental execution, watermark-bounded state instead of a cron re-scan.
  *
  * [[windowedAgg]] is ONE transform applied to both batch and stream
  * inputs (the Structured Streaming unification): the driver-checked st1
  * query runs it over the batch events table; [[start]] runs the identical
  * code as an incremental stream with a 2-hour watermark bounding state.
  *
  * Scale: aggregation state is (window × event_type) — tiny; the shuffle
  * keys on the group key with map-side partial aggregation; late data past
  * the watermark is dropped deterministically.
  */
object EventStream {

  /** events.parquet schema as the CURRENT driver generation writes it
    * (`ts` = TIMESTAMP_NTZ micros; see graft.sources.Tables.events for
    * the generation history). [[readEvents]] peeks at the actual files
    * and overrides the `ts` type when the directory carries an older
    * representation. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", org.apache.spark.sql.types.TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour aggregation per event type. Works on batch AND
    * streaming inputs. Sums in DECIMAL (exact, order-insensitive — safe
    * for both the DuckDB oracle and stream re-ordering), final cast to
    * double. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("__w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"),
        max(col("value")).as("max_value"))
      .select(col("__w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("max_value"))

  /** Streaming source over an events parquet directory (file source —
    * each newly-landed file becomes a micro-batch; the cloud-scale analog
    * is a Kafka/queue source with the same downstream plan). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // a streaming source needs an explicit schema; peek at the files
    // already present to honor whichever `ts` representation this
    // directory carries (falling back to the current generation's NTZ)
    val rawSchema =
      try {
        val s = spark.read.parquet(dir).schema
        if (s.fieldNames.contains("ts"))
          StructType(eventSchema.map(f =>
            if (f.name == "ts") f.copy(dataType = s("ts").dataType) else f))
        else eventSchema
      } catch { case _: Exception => eventSchema }
    graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(dir))
  }

  /** Run `startQuery` under an overridden `spark.sql.shuffle.partitions`
    * and restore the previous value as soon as `.start()` returns —
    * SAFE because StreamExecution clones the session (conf included)
    * while the query is constructed inside start(), so the running
    * stream keeps the override and the caller's session gets its batch
    * setting back.
    *
    * WHY a per-stream knob exists at all: every stateful operator runs
    * one state store PER shuffle partition, and each micro-batch pays a
    * checkpoint commit per store — so the per-batch latency FLOOR is
    * proportional to the partition count regardless of data volume.
    * The batch engine's partitioning (sized for scan/join throughput)
    * is usually far too wide for a stream's per-batch rate: measured on
    * the bench's 100k-row batches, the stream-stream join fell from
    * 15.5 to 2.2 s/batch going 32 → 8 partitions. Size state
    * partitions to the stream's throughput, not the cluster's cores —
    * raise it only when per-batch state volume actually needs the
    * parallelism. */
  private[streaming] def withStatePartitions(
      spark: SparkSession, n: Option[Int])(
      startQuery: => StreamingQuery): StreamingQuery = n match {
    case None => startQuery
    case Some(p) =>
      require(p > 0, "statePartitions must be positive")
      // LOCKED set→start→restore: two unserialized pairs interleaving
      // can capture each other's in-flight value and leave the session
      // mutated forever (the round-18 outputTimestampType class). The
      // stream PLANS under the pin (state partitioning is fixed at
      // start); the lock only covers query start, never execution.
      confPinLock.synchronized {
        val key = "spark.sql.shuffle.partitions"
        val prev = spark.conf.get(key)
        spark.conf.set(key, p.toString)
        try startQuery finally spark.conf.set(key, prev)
      }
  }
  private val confPinLock = new Object

  /** Start the pipeline into an in-memory sink (tests / smoke checks; a
    * production deployment swaps the sink for parquet/Kafka + checkpoint).
    * `availableNow = true` processes everything currently in the
    * directory as real micro-batches and then terminates — the mode the
    * micro-batch bench and catch-up/backfill runs use.
    * `statePartitions` sizes the stateful operators' store count (see
    * [[withStatePartitions]]); None keeps the session's setting. */
  def start(
      spark: SparkSession,
      dir: String,
      sinkTable: String,
      availableNow: Boolean = false,
      statePartitions: Option[Int] = None): StreamingQuery =
    withStatePartitions(spark, statePartitions) {
      val w = windowedAgg(readEvents(spark, dir))
        .writeStream
        .format("memory")
        .queryName(sinkTable)
        .outputMode("complete")
      (if (availableNow)
         w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
       else w).start()
    }

  /** Stream-static enrichment: every event joined to a slowly-changing
    * dimension snapshot, then the tumbling-window aggregation keyed by a
    * dim attribute — the standard "enrich the stream against the
    * warehouse dim" pipeline (the reference does the batch analog when
    * its hourly DAG joins staging to customer attributes).
    *
    * In stream mode Spark re-plans the static side per micro-batch (a
    * dim refresh is picked up on the next batch); the dim is explicitly
    * broadcast — the stream side never shuffles for the join, only for
    * the windowed aggregate. Same transform runs on batch inputs
    * (unification, as [[windowedAgg]]). */
  def enrichedWindowedAgg(
      events: DataFrame,
      dim: DataFrame,
      dimKey: String,
      dimAttr: String): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .join(broadcast(dim.select(col(dimKey), col(dimAttr))),
        col("user_id") === col(dimKey))
      .groupBy(window(col("ts"), "1 hour").as("__w"), col(dimAttr).as("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      .select(col("__w.start").as("window_start"), col("segment"),
        col("n_events"), col("sum_value"))

  /** Start the enrichment pipeline: streaming events joined to the static
    * dim table, into a memory sink. */
  def startEnriched(
      spark: SparkSession,
      dir: String,
      dim: DataFrame,
      dimKey: String,
      dimAttr: String,
      sinkTable: String,
      availableNow: Boolean = false,
      statePartitions: Option[Int] = None): StreamingQuery =
    withStatePartitions(spark, statePartitions) {
      val w = enrichedWindowedAgg(readEvents(spark, dir), dim, dimKey, dimAttr)
        .writeStream
        .format("memory")
        .queryName(sinkTable)
        .outputMode("complete")
      (if (availableNow)
         w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
       else w).start()
    }

  /** Streaming exactly-once-per-key dedup: drop events whose `keyCols`
    * were already seen, keeping state only within the event-time
    * watermark (`dropDuplicatesWithinWatermark`) so it never grows
    * unboundedly — the streaming face of the d1 exact-dedup operator and
    * the idempotent-ingest guard an at-least-once source (queue replay,
    * file re-drop) needs in front of the merge pipeline.
    *
    * Scale: state is one entry per distinct key within the watermark
    * horizon, hash-partitioned by key (the one shuffle). */
  def dedupStream(events: DataFrame, watermarkDelay: String, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Start a deduplicated pass-through of the event stream into a memory
    * sink, keyed by event_id. */
  def startDedup(spark: SparkSession, dir: String, sinkTable: String): StreamingQuery =
    dedupStream(readEvents(spark, dir), "2 hours", Seq("event_id"))
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .start()

  /** st5's AT-LEAST-ONCE feed: the base events plus a byte-identical
    * replayed slice (`[from, to)` arrives twice — a queue replay or file
    * re-drop). One transform for batch and stream inputs, like
    * [[windowedAgg]]: the st5 query key applies it to the batch table,
    * [[startDedupReplay]] to the file stream. */
  def replayedFeed(events: DataFrame, from: String, to: String): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"), col("ts"),
      col("event_type"), col("value"))
    ev.unionAll(ev.filter(
      col("ts") >= lit(from).cast("timestamp") &&
      col("ts") < lit(to).cast("timestamp")))
  }

  /** STREAM-STREAM interval join: each purchase joined to the same user's
    * clicks in the preceding hour — last-touch-window attribution, the
    * canonical two-stream correlation (the batch analog is an interval
    * self-join on the events table). One transform for batch and stream
    * inputs, like [[windowedAgg]].
    *
    * Streaming semantics: both sides carry event-time watermarks and the
    * join condition bounds click time relative to purchase time, so Spark
    * can expire buffered rows — state per side is one watermark horizon
    * (+ the 1 h join range), NOT the stream history. Unbounded-state
    * stream-stream joins (no time bound) are rejected by Spark's
    * unsupported-operations check; this shape is the supported one.
    *
    * Scale: both sides hash-partition on `user_id` (the equi-key); the
    * interval is a residual filter on the joined pairs, not a range
    * cartesian. In batch the same plan is a shuffled hash join with the
    * interval as a post-join predicate. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    p.join(c,
        col("c_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("purchase_ts"), col("click_ts"), col("purchase_value"))
  }

  /** Run [[attributionJoin]] over two event streams (clicks / purchases
    * filtered from the same file source) into a memory sink. */
  def startAttribution(
      spark: SparkSession,
      dir: String,
      sinkTable: String,
      availableNow: Boolean = false,
      statePartitions: Option[Int] = None): StreamingQuery =
    withStatePartitions(spark, statePartitions) {
      val ev = readEvents(spark, dir)
      val w = attributionJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .writeStream
        .format("memory")
        .queryName(sinkTable)
        .outputMode("append")
      (if (availableNow)
         w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
       else w).start()
    }

  /** Run [[dedupStream]] over the replayed at-least-once feed as a real
    * stream into a memory sink — exactly-once output per event_id, state
    * bounded by the watermark. */
  def startDedupReplay(
      spark: SparkSession,
      dir: String,
      sinkTable: String,
      from: String,
      to: String,
      availableNow: Boolean = false,
      statePartitions: Option[Int] = None): StreamingQuery =
    withStatePartitions(spark, statePartitions) {
      val w = dedupStream(replayedFeed(readEvents(spark, dir), from, to),
          "2 hours", Seq("event_id"))
        .writeStream
        .format("memory")
        .queryName(sinkTable)
        .outputMode("append")
      (if (availableNow)
         w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
       else w).start()
    }
}
