package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{ChangeReplica, VersionedTable}

/** CONTINUOUS `APPLY CHANGES` — the streaming face of
  * [[graft.sources.ChangeReplica]]: the source table's change feed as a
  * structured-streaming source ([[ChangeFeedStream]] — offsets are
  * version numbers, the engine's offset log is the consumer
  * checkpoint), each micro-batch applied to the replica as ONE net-
  * effect MERGE ([[ChangeReplica.applyBatch]]) carrying an
  * `(app_id, batch_id)` txn stamp inside the same atomic commit.
  *
  * EXACTLY-ONCE, the same story as [[UpsertStream]]: `foreachBatch` is
  * at-least-once (a crash between the apply's commit and the engine's
  * checkpoint write replays the batch), so every apply stamps its
  * `(appId, batchId)` atomically with the merged rows and consults
  * [[VersionedTable.lastTxn]] first — a replayed batch is detected and
  * SKIPPED before any work, and a zombie writer that stalls across a
  * replacement's commit aborts inside the claim
  * ([[ChangeReplica.StaleBatchException]]). Kill the query at any
  * point and restart it: the replica converges to exactly the
  * batch-poll [[ChangeReplica.applyChanges]] state, each source
  * version applied once.
  *
  * Scale shape: identical to the batch poll per micro-batch — the
  * net-effect window partitions by key over O(batch) rows, the MERGE
  * is the format's touched-file COW/MOR, and the stream itself is
  * STATELESS (state lives in the replica table), so restart cost is
  * O(1) and no watermark or state store is involved. Rate-limit a
  * catch-up from deep history with `maxVersionsPerBatch`.
  *
  * CONTRACT: one live writer per `(dstRoot, appId)` — the Delta
  * txnAppId rule — and the source's vacuum retention must cover the
  * slowest stream ([[ChangeFeedStream]]'s operating contract). */
object ReplicaStream {

  /** One micro-batch → one transactional net-effect apply (or a no-op
    * replay skip). Returns false on skip. Exposed for tests. */
  def applyBatchTxn(
      spark: SparkSession, dstRoot: String, keyCols: Seq[String],
      batch: DataFrame, appId: String, batchId: Long): Boolean =
    ChangeReplica.applyBatch(spark, dstRoot, keyCols, batch,
      txn = Some((appId, batchId)))

  /** Start the continuous apply: `srcRoot`'s feed → `dstRoot` replica.
    * The engine checkpoint lives under `checkpointDir` (per
    * `(dstRoot, appId)` by contract — do not share it across apps).
    *
    * `availableNow` note: the engine snapshots a V1 source's NEXT offset
    * at start, so combining it with `maxVersionsPerBatch` stops after
    * the FIRST rate-limited batch — use availableNow for unlimited
    * catch-up-and-stop, and a continuous trigger when rate-limiting. */
  def start(
      spark: SparkSession,
      srcRoot: String,
      dstRoot: String,
      keyCols: Seq[String],
      checkpointDir: String,
      appId: String = "graft-apply-changes",
      maxVersionsPerBatch: Option[Int] = None,
      availableNow: Boolean = false): StreamingQuery = {
    require(keyCols.nonEmpty, "ReplicaStream needs at least one key column")
    val w = ChangeFeedStream.read(spark, srcRoot, maxVersionsPerBatch)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch rides the engine's CLONED session — the apply's temp
        // view registers there, so everything must resolve there too
        applyBatchTxn(batch.sparkSession, dstRoot, keyCols, batch,
          appId, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (availableNow)
       w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else w).start()
  }
}
