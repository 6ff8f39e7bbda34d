package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.VersionedTable

/** STREAMING APPEND into the versioned table — the insert-only ingest
  * counterpart of [[UpsertStream]] (Delta's append-mode streaming write):
  * each micro-batch lands as ONE O(batch) [[VersionedTable.commitAppend]]
  * — every existing file rides by reference, so commit cost never grows
  * with table size, which is what a continuous 100 TB feed needs.
  *
  * EXACTLY-ONCE exactly as [[UpsertStream]]: `foreachBatch` is
  * at-least-once, so each commit carries a `txn` extra
  * `(app_id, batch_id)` inside the same atomic snapshot;
  * [[appendBatch]] consults [[VersionedTable.lastTxn]] first (replays
  * skip) and RE-VALIDATES the mark inside the commit claim (a zombie
  * writer that stalled past a replacement's commit aborts instead of
  * double-appending). Concurrent appenders under DIFFERENT appIds are
  * safe by commitAppend's own OCC rebase — both batches' files end up in
  * the final manifest.
  *
  * Scale: the query is stateless (no watermark, no state store); restart
  * cost is O(1); each batch pays its own write + a metadata commit. Table
  * constraints, blooms and the opt-in insert change feed all apply — the
  * staged batch is validated/indexed exactly like any other append. */
object AppendStream {

  /** One micro-batch → one append snapshot (the FIRST batch creates the
    * table), or None when this `(appId, batchId)` already committed or
    * the batch is empty. */
  def appendBatch(
      spark: SparkSession,
      tableRoot: String,
      batch: DataFrame,
      batchId: Long,
      appId: String,
      bloomCols: Seq[String] = Nil,
      changeFeed: Boolean = false): Option[Long] = {
    import spark.implicits._
    if (VersionedTable.lastTxn(spark, tableRoot, appId).exists(_ >= batchId)) None
    else if (batch.isEmpty) None // nothing to land; later batches stamp higher
    else {
      val txn = Map("txn" -> Seq((appId, batchId)).toDF("app_id", "batch_id"))
      val guard: Long => Unit = _ =>
        if (VersionedTable.lastTxn(spark, tableRoot, appId).exists(_ >= batchId))
          throw new UpsertStream.StaleBatchException(appId, batchId)
      try Some(
        if (VersionedTable.currentVersion(spark, tableRoot).isEmpty)
          VersionedTable.commit(batch, tableRoot, extras = txn,
            bloomCols = bloomCols, preCommit = guard)
        else
          VersionedTable.commitAppend(batch, tableRoot, extras = txn,
            bloomCols = bloomCols, preCommit = guard, changeFeed = changeFeed))
      catch { case _: UpsertStream.StaleBatchException => None }
    }
  }

  /** Run the event file stream as an append-only feed into the versioned
    * table. One append snapshot per micro-batch; idempotent under replay
    * via the txn stamp; per-appId checkpoint (the [[UpsertStream]]
    * contract — one live writer per `(tableRoot, appId)`). */
  def start(
      spark: SparkSession,
      dir: String,
      tableRoot: String,
      appId: String,
      bloomCols: Seq[String] = Nil,
      changeFeed: Boolean = false,
      availableNow: Boolean = false): StreamingQuery = {
    val w = EventStream.readEvents(spark, dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(spark, tableRoot, batch, batchId, appId,
          bloomCols, changeFeed)
        ()
      }
      .option("checkpointLocation", tableRoot + "_checkpoint_" + appId)
    (if (availableNow)
       w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else w).start()
  }
}
