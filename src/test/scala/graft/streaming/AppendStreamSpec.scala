package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.VersionedTable

/** Streaming append sink: one O(batch) append commit per micro-batch,
  * exactly-once under foreachBatch replay via the atomic txn stamp, first
  * batch creates the table. */
class AppendStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("file stream appends batch-per-commit; restart with new input continues, no dupes") {
    val root = java.nio.file.Files.createTempDirectory("graft_app").toString + "/t"
    val stage = java.nio.file.Files.createTempDirectory("graft_app_src")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.schema(EventStream.eventSchema)
      .parquet(s"$dir/events.parquet")
    val cut = lit("2024-01-10 00:00:00")
      .cast(org.apache.spark.sql.types.TimestampNTZType)
    raw.filter(col("ts") < cut).coalesce(1)
      .write.parquet(stage.resolve("b1").toString)

    AppendStream.start(spark, stage.toString + "/*", root, "app1",
      availableNow = true).awaitTermination()
    val n1 = VersionedTable.read(spark, root).count()
    assert(n1 == raw.filter(col("ts") < cut).count())

    // restart against the same checkpoint with more input: only the new
    // file is consumed, and it lands as an O(batch) append (all previous
    // files carried by reference)
    raw.filter(col("ts") >= cut).coalesce(1)
      .write.parquet(stage.resolve("b2").toString)
    AppendStream.start(spark, stage.toString + "/*", root, "app1",
      availableNow = true).awaitTermination()
    assert(VersionedTable.read(spark, root).count() == raw.count())
    assert(VersionedTable.read(spark, root).select("event_id").distinct().count()
      == raw.count(), "replayed rows detected")
    assert(VersionedTable.lastTxn(spark, root, "app1").nonEmpty)
  }

  test("replayed batch id skipped; empty batch skipped; zombie aborts in-claim") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_app2").toString + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "x")

    // first batch creates the table
    assert(AppendStream.appendBatch(spark, root, b0, 0L, "app").nonEmpty)
    val v1 = VersionedTable.currentVersion(spark, root).get
    // at-least-once replay of the same id: no-op
    assert(AppendStream.appendBatch(spark, root, b0, 0L, "app").isEmpty)
    assert(VersionedTable.currentVersion(spark, root).get == v1)
    // empty batch: no commit, no stamp regression
    assert(AppendStream.appendBatch(spark, root, b0.limit(0), 1L, "app").isEmpty)
    // next id commits as an append
    assert(AppendStream.appendBatch(spark, root, b0, 2L, "app").nonEmpty)
    assert(VersionedTable.read(spark, root).count() == 4)
    assert(VersionedTable.lastTxn(spark, root, "app").contains(2L))
    // zombie: gate passed before a replacement committed the same id —
    // the in-claim re-validation aborts, nothing published
    val vBefore = VersionedTable.currentVersion(spark, root).get
    intercept[UpsertStream.StaleBatchException] {
      VersionedTable.commitAppend(b0, root,
        extras = Map("txn" -> Seq(("app", 2L)).toDF("app_id", "batch_id")),
        preCommit = _ =>
          if (VersionedTable.lastTxn(spark, root, "app").exists(_ >= 2L))
            throw new UpsertStream.StaleBatchException("app", 2L))
    }
    assert(VersionedTable.currentVersion(spark, root).get == vBefore)
  }

  test("appends respect table constraints and land the opt-in insert feed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_app3").toString + "/t"
    assert(AppendStream.appendBatch(spark, root,
      Seq((1L, 10L)).toDF("id", "amount"), 0L, "app").nonEmpty)
    VersionedTable.addConstraint(spark, root, "amount_pos", "amount > 0")
    // a violating batch aborts the commit; the stamp does not advance, so
    // a corrected replay of the SAME batch id can land
    intercept[VersionedTable.ConstraintViolationException] {
      AppendStream.appendBatch(spark, root,
        Seq((2L, -1L)).toDF("id", "amount"), 1L, "app")
    }
    assert(VersionedTable.lastTxn(spark, root, "app").contains(0L))
    val v = AppendStream.appendBatch(spark, root,
      Seq((2L, 20L)).toDF("id", "amount"), 1L, "app", changeFeed = true)
    assert(v.nonEmpty)
    val feed = VersionedTable.readChanges(spark, root, v.get, v.get)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    assert(feed.count() == 1)
  }
}
