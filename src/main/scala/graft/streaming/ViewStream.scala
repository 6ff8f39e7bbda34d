package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** CONTINUOUS incremental view maintenance — the streaming face of
  * [[graft.sources.AggReplica]], structurally [[ReplicaStream]]: the
  * source's change feed as a streaming source (offsets are version
  * numbers), each micro-batch folded into the aggregate view as ONE
  * retraction-algebra MERGE carrying the `(app_id, batch_id)` txn
  * stamp inside the same atomic commit.
  *
  * Scale shape: the per-batch work is one map-side-combined groupBy
  * over O(batch) feed rows (NO per-key ordering window — retraction
  * sums commute across versions) plus a keyed merge touching O(changed
  * groups) of the view; the stream itself is STATELESS (state lives in
  * the view table), so restart cost is O(1) and no state store is
  * involved. This is the engine-grade form of a recompute-the-mart
  * scheduler job: a 100 TB source's hourly changes fold into the view
  * in O(changes), where the reference's dbt rollup re-reads staging
  * every run.
  *
  * EXACTLY-ONCE and the one-writer-per-`(dstRoot, appId)` contract are
  * [[ReplicaStream]]'s, verbatim. */
object ViewStream {

  /** One micro-batch → one transactional retraction fold (or a no-op
    * replay skip). Returns false on skip. Exposed for tests.
    *
    * `extrema` additionally maintains `n_vals`/`value_min`/`value_max`
    * ([[graft.sources.AggReplica]]'s extended shape); it needs
    * `srcRoot` for the extremum-retraction recompute, pinned to the
    * batch's own max `_commit_version` (the feed stamps every row), so
    * a recompute can never see source rows from versions the batch's
    * counts haven't folded yet. */
  def applyBatchTxn(
      spark: SparkSession, dstRoot: String, keyCols: Seq[String],
      valueCol: String, batch: DataFrame, appId: String,
      batchId: Long, extrema: Boolean = false,
      srcRoot: Option[String] = None): Boolean = {
    require(!extrema || srcRoot.isDefined,
      "extrema maintenance needs srcRoot for the retraction recompute")
    val source = if (extrema) {
      val hi = batch.agg(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col("_commit_version"))).head
      // an all-empty-feed batch folds nothing — no recompute can fire,
      // so the pin is never read; -1 keeps the call total
      Some((srcRoot.get, if (hi.isNullAt(0)) -1L else hi.getLong(0)))
    } else None
    graft.sources.AggReplica.applyAggBatch(spark, dstRoot, keyCols,
      valueCol, batch, txn = Some((appId, batchId)), extrema = extrema,
      source = source)
  }

  /** Start the continuous maintenance: `srcRoot`'s feed → the
    * `GROUP BY keyCols` count/sum view at `dstRoot`. The consumer must
    * start at a feed offset covering every row the view should count
    * ([[graft.sources.AggReplica]]'s contract — a feed-carrying birth
    * commit covers the whole table). */
  def start(
      spark: SparkSession,
      srcRoot: String,
      dstRoot: String,
      keyCols: Seq[String],
      valueCol: String,
      checkpointDir: String,
      appId: String = "graft-ivm",
      maxVersionsPerBatch: Option[Int] = None,
      availableNow: Boolean = false,
      extrema: Boolean = false): StreamingQuery = {
    require(keyCols.nonEmpty, "ViewStream needs at least one group column")
    val w = ChangeFeedStream.read(spark, srcRoot, maxVersionsPerBatch)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchTxn(batch.sparkSession, dstRoot, keyCols, valueCol,
          batch, appId, batchId, extrema = extrema,
          srcRoot = if (extrema) Some(srcRoot) else None)
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (availableNow)
       w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else w).start()
  }
}
