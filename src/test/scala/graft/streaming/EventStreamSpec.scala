package graft.streaming

import graft.SparkSpec

/** Batch/stream unification check: the streaming run of windowedAgg over
  * the events parquet (file source, memory sink) must produce exactly the
  * batch run's result. */
class EventStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowedAgg equals the batch run on the same input") {
    val batch = EventStream.windowedAgg(graft.sources.Tables.events(spark, dir))
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    // the file stream source requires a directory; stage the single
    // parquet file into one (testdata itself is read-only)
    val stage = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))

    val q = EventStream.start(spark, stage.toString, "st1_sink")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("st1_sink")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming enrichedWindowedAgg equals the batch run on the same input") {
    val customer = graft.sources.Tables.customer(spark, dir)
    val batch = EventStream.enrichedWindowedAgg(
        graft.sources.Tables.events(spark, dir), customer, "c_custkey", "c_mktsegment")
      .orderBy("window_start", "segment")
      .collect().map(_.toSeq).toSeq

    val stage = java.nio.file.Files.createTempDirectory("graft_stream_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))

    val q = EventStream.startEnriched(spark, stage.toString, customer,
      "c_custkey", "c_mktsegment", "st3_sink")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("st3_sink")
      .orderBy("window_start", "segment")
      .collect().map(_.toSeq).toSeq

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("dedupStream drops re-delivered events across micro-batches") {
    val src = s"$dir/events.parquet"
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_dedup")
    // the same file lands twice (at-least-once delivery / re-drop)
    java.nio.file.Files.copy(java.nio.file.Paths.get(src), stage.resolve("a.parquet"))

    val q = EventStream.startDedup(spark, stage.toString, "dedup_sink")
    try {
      q.processAllAvailable()
      java.nio.file.Files.copy(java.nio.file.Paths.get(src), stage.resolve("b.parquet"))
      q.processAllAvailable()
    } finally q.stop()

    val n = graft.sources.Tables.events(spark, dir).count()
    val out = spark.table("dedup_sink")
    assert(out.count() == n) // every event exactly once despite double delivery
    assert(out.select("event_id").distinct().count() == n)
  }

  test("streaming replayed-feed dedup equals the batch st5 row set") {
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_st5")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val q = EventStream.startDedupReplay(spark, stage.toString, "st5_sink",
      graft.queries.TextQueries.ReplayFrom, graft.queries.TextQueries.ReplayTo)
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("st5_sink")
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.TextQueries.st5(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream-stream attribution join equals the batch interval join") {
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_join")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))

    val q = EventStream.startAttribution(spark, stage.toString, "st6_sink")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("st6_sink").collect().map(_.toSeq).toSet

    val batch = graft.queries.TextQueries.st6(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream-stream join emits across micro-batch boundaries") {
    // clicks land in batch 1, their purchases in batch 2: the join must
    // buffer the click side in state and match when the purchase arrives
    import org.apache.spark.sql.functions.col
    // stage the RAW (ts-as-long) rows so the file stream source sees the
    // same schema as the source table
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.schema(EventStream.eventSchema)
      .parquet(s"$dir/events.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_join2")
    raw.filter(col("event_type") === "click").coalesce(1)
      .write.mode("overwrite").parquet(stage.resolve("b1").toString)
    val q = EventStream.startAttribution(spark, stage.toString + "/*", "st6b_sink")
    try {
      q.processAllAvailable()
      raw.filter(col("event_type") === "purchase").coalesce(1)
        .write.mode("overwrite").parquet(stage.resolve("b2").toString)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("st6b_sink").collect().map(_.toSeq).toSet
    val ev = graft.sources.Tables.events(spark, dir)
    val batch = EventStream.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
