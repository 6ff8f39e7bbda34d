package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** APPLY CHANGES INTO — row-level CDC replication on the versioned
  * format (the Delta Live Tables verb, public semantics): maintain
  * `dstRoot` as a keyed replica of `srcRoot` by consuming the source's
  * CHANGE FEED incrementally and applying each batch's NET effect as
  * one MERGE. This closes the last CDC gap: the feed existed
  * ([[VersionedTable.readChanges]], [[VersionedTable.consumeChanges]],
  * the streaming source), but a downstream table still had to hand-roll
  * the apply.
  *
  * Semantics per batch (a contiguous version range of the feed):
  *  - `update_preimage` rows are audit, not state — dropped;
  *  - per key, the LAST event wins (ordered by `_commit_version`); a
  *    delete and an image of one key in the SAME version is a replace
  *    (the image outranks — the shape `overwritePartitions` emits);
  *  - net images MERGE as upserts, net deletes as `WHEN MATCHED THEN
  *    DELETE`; a key inserted and deleted inside one range never
  *    touches the replica.
  *
  * Delivery is [[VersionedTable.consumeChanges]]'s at-least-once with a
  * caller-owned checkpoint; the apply is STATE-idempotent (replaying a
  * range merges the same images to the same values and re-deletes
  * absent keys), so crash/replay converges — the same contract a
  * foreachBatch upsert sink gives. Scale shape: the net-effect window
  * partitions by key over O(batch) rows; the MERGE is the format's
  * touched-file COW (or DV form when enabled on the replica) — O(delta
  * + touched files), never O(table). */
object ChangeReplica {

  /** Consume everything new in `srcRoot`'s feed since this consumer's
    * checkpoint and apply it to `dstRoot`; returns the applied version
    * range, or None when there was nothing new. An unborn `dstRoot` is
    * created from the first batch's net images (the snapshot-free
    * bootstrap: start the checkpoint at a fed version range that covers
    * the rows you need — a table born through the SQL face's CTAS /
    * INSERT OVERWRITE carries insert feeds from birth). */
  def applyChanges(
      spark: SparkSession, srcRoot: String, dstRoot: String,
      keyCols: Seq[String], checkpointDir: String): Option[(Long, Long)] = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    VersionedTable.consumeChanges(spark, srcRoot, checkpointDir) { batch =>
      applyBatch(spark, dstRoot, keyCols, batch)
    }
  }

  /** Thrown inside the apply's commit when the batch's txn stamp is at
    * or below the replica's published high-water mark — the batch was
    * applied by a replacement writer while this one stalled (the same
    * zombie defense as [[graft.streaming.UpsertStream]]). */
  final class StaleBatchException(appId: String, batchId: Long)
    extends RuntimeException(
      s"batch $batchId for app $appId already applied — aborting stale apply")

  /** Apply one feed batch (must carry `_change_type` and
    * `_commit_version`) to `dstRoot`. Exposed for tests and for callers
    * wiring their own delivery (e.g. a foreachBatch over the streaming
    * change-feed source).
    *
    * `txn = Some((appId, batchId))` makes the apply TRANSACTIONAL for a
    * streaming caller: the stamp rides the SAME atomic commit as the
    * merged data (Delta's txnAppId/txnVersion idempotent-sink pattern),
    * [[VersionedTable.lastTxn]] gates a replayed batch into a no-op
    * BEFORE any work, and the in-claim re-check aborts a zombie writer
    * with [[StaleBatchException]]. Returns false when the batch was
    * skipped as a replay. */
  private[graft] def applyBatch(
      spark: SparkSession, dstRoot: String, keyCols: Seq[String],
      batch: DataFrame, txn: Option[(String, Long)] = None): Boolean = {
    txn match {
      case Some((appId, batchId))
          if VersionedTable.lastTxn(spark, dstRoot, appId).exists(_ >= batchId) =>
        false // replayed batch: already atomically applied and stamped
      case _ =>
        try { applyBatchInternal(spark, dstRoot, keyCols, batch, txn); true }
        catch { case _: StaleBatchException => false }
    }
  }

  private def applyBatchInternal(
      spark: SparkSession, dstRoot: String, keyCols: Seq[String],
      batch: DataFrame, txn: Option[(String, Long)]): Unit = {
    val missing = keyCols.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"key column(s) missing from the feed: ${missing.mkString(", ")}")
    // NET EFFECT per key: last version wins; within a version an image
    // outranks a delete (delete+reinsert of one key in one version is a
    // replace). row_number, not rank — exactly one survivor per key.
    val net = batch
      .where(col("_change_type")
        .isin("insert", "update_postimage", "delete"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("_commit_version").desc,
            when(col("_change_type") === "delete", 0).otherwise(1).desc)))
      .where(col("__rank") === 1)
      .drop("__rank", "_commit_version")
    val dataCols = net.columns.filterNot(_ == "_change_type").toSeq
    // the txn stamp (if any) publishes INSIDE the same commit as the
    // applied rows; the in-claim re-check aborts a stalled zombie writer
    import spark.implicits._
    val txnExtra: Map[String, DataFrame] = txn.map { case (appId, batchId) =>
      "txn" -> Seq((appId, batchId)).toDF("app_id", "batch_id")
    }.toMap
    val zombieCheck: Long => Unit = _ => txn.foreach { case (appId, batchId) =>
      if (VersionedTable.lastTxn(spark, dstRoot, appId).exists(_ >= batchId))
        throw new StaleBatchException(appId, batchId)
    }
    if (VersionedTable.currentVersion(spark, dstRoot).isEmpty) {
      // bootstrap: the replica is born from the net images, feed-carrying
      // so a replica OF the replica can chain
      val images = net.where(col("_change_type") =!= "delete")
        .select(dataCols.map(col): _*)
      VersionedTable.commit(images, dstRoot,
        extras = Map("changes" -> VersionedTable.feedWritable(
          images.withColumn("_change_type", lit("insert")))) ++ txnExtra,
        preCommit = zombieCheck)
    } else {
      val view = "__graft_apply_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      net.createOrReplaceTempView(view)
      try {
        def bq(c: String) = "`" + c + "`"
        // NULL-SAFE key equality when the batch carries a NULL key: the
        // netting window groups NULL keys as one key, so the apply join
        // must too — under plain `=` a NULL-key image re-inserts every
        // batch and its delete never lands. The common all-keyed batch
        // keeps `=` so a bucketized replica keeps the claimed merge road
        // (`<=>` is not a bucket-eligible equi); the probe is one
        // limit(1) count over the O(batch) net frame.
        val hasNullKey = net
          .where(keyCols.map(col(_).isNull).reduce(_ || _))
          .limit(1).count() > 0
        val eq = if (hasNullKey) "<=>" else "="
        val on = keyCols.map(k => s"t.${bq(k)} $eq s.${bq(k)}").mkString(" AND ")
        val sets = dataCols.map(c => s"${bq(c)} = s.${bq(c)}").mkString(", ")
        val insCols = dataCols.map(bq).mkString(", ")
        val insVals = dataCols.map(c => s"s.${bq(c)}").mkString(", ")
        val sql =
          s"""MERGE INTO `$dstRoot` AS t USING $view AS s
             |ON $on
             |WHEN MATCHED AND s._change_type = 'delete' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET $sets
             |WHEN NOT MATCHED AND s._change_type <> 'delete'
             |  THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin
        if (txn.isEmpty) graft.plans.GraftSql.execute(spark, sql)
        else graft.plans.GraftSql.mergeWithExtras(spark, sql, txnExtra, zombieCheck)
      } finally spark.catalog.dropTempView(view)
    }
  }
}
