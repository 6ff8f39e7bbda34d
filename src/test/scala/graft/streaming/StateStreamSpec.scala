package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The incrementally-maintained entity state must equal the batch window
  * formulation — per micro-batch, across adversarial batch splits (late
  * events in later batches), and at the end of the stream. */
class StateStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchTruth = {
    import spark.implicits._
    val typed = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[StateStream.Ev]
    StateStream.currentStates(typed, "purchase")
      .collect()
      .map(s => s.id -> (s.last_status, s.created_at.getTime, s.updated_at.getTime,
        s.deleted_at.map(_.getTime)))
      .toMap
  }

  test("batch fold equals the window formulation (Snapshots + soft delete)") {
    val win = graft.operators.Snapshots
      .stateAsOf(graft.sources.Tables.events(spark, dir),
        "user_id", "ts", "event_type", "event_id", None)
      .withColumn("deleted_at",
        when(col("last_status") === "purchase", col("updated_at")))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime, Option(r.getTimestamp(4)).map(_.getTime)))
      .toMap
    assert(batchTruth == win)
    assert(batchTruth.nonEmpty)
  }

  test("streamed state across adversarial batch splits equals the batch fold") {
    import spark.implicits._
    // split by event_id parity: each micro-batch interleaves in time, so
    // the second batch delivers events EARLIER than already-folded ones —
    // only an associative merge survives this
    val all = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val stage = java.nio.file.Files.createTempDirectory("graft_state_stream")
    def drop(n: Int, filter: org.apache.spark.sql.Column): Unit =
      all.filter(filter).coalesce(1).write.mode("append").parquet(s"$stage/in")

    drop(1, col("event_id") % 2 === 0)
    val states = scala.collection.concurrent.TrieMap[Long, (String, Long, Long, Option[Long])]()
    val typed = spark.readStream
      .schema(all.schema)
      .parquet(s"$stage/in")
      .as[StateStream.Ev]
    val q = StateStream.updateStates(typed, "purchase")
      .writeStream
      .outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[StateStream.EntityState], _: Long) =>
        ds.collect().foreach { s =>
          states(s.id) = (s.last_status, s.created_at.getTime, s.updated_at.getTime,
            s.deleted_at.map(_.getTime))
        }
      }
      .start()
    try {
      q.processAllAvailable()
      drop(2, col("event_id") % 2 === 1)
      q.processAllAvailable()
    } finally q.stop()

    assert(states.nonEmpty)
    assert(states.toMap == batchTruth)
  }
}
