package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE with retractions — maintain
  * `SELECT keyCols, count(*) AS n_rows, sum(valueCol) AS value_sum
  * GROUP BY keyCols` over a source table by consuming its CHANGE FEED,
  * never rescanning the source (the Materialize/Flink retraction idea
  * and Delta Live Tables' aggregate flows, public semantics; the
  * reference's dbt models recompute marts per run —
  * `dbt/models/marts/lion_parcell_bonus_test.sql` re-aggregates its
  * staging table hourly — this operator is the engine-grade form of
  * that same rollup, updated in O(changes)).
  *
  * RETRACTION ALGEBRA per feed row: `insert` / `update_postimage`
  * contribute (+1, +value); `delete` / `update_preimage` contribute
  * (-1, -value). Sums are commutative and associative, so a batch
  * spanning many versions needs NO per-key ordering window (unlike the
  * row-replica's last-wins netting): one map-side-combined groupBy over
  * O(batch) rows yields per-group deltas, and a delete+reinsert of a
  * key inside one version cancels/adds exactly. The deltas then MERGE
  * into the view keyed by the group columns — touched-file COW (or the
  * recorded bucket road when the view is bucketized), O(delta + touched
  * files), never O(view): a group whose count reaches zero is DELETED,
  * existing groups accumulate, new groups insert.
  *
  * SUM semantics: `value_sum` accumulates `coalesce(value, 0)` — SQL
  * SUM ignores NULLs, but a retractable sum must subtract exactly what
  * it added, so the NULL-as-zero convention is part of the view's
  * definition (state the view that way; `n_rows` is count(*)).
  *
  * CONTRACT: the consumer must start at a feed offset at or before the
  * first row it should count (a table born with a feed-carrying commit
  * covers its whole history — the CTAS/commit-with-feed shape);
  * retractions against rows the view never saw would go negative, and
  * the merge REFUSES that loudly rather than serving a wrong aggregate.
  *
  * EXACTLY-ONCE: same txn story as [[ChangeReplica.applyBatch]] — the
  * `(appId, batchId)` stamp rides the same atomic commit as the merged
  * groups, a replayed batch no-ops before any work, and a zombie
  * writer aborts inside the claim. */
object AggReplica {

  /** Thrown when a batch retracts below zero for some group — the feed
    * was consumed from an offset past rows the view needed. */
  final class NegativeGroupException(root: String)
    extends RuntimeException(
      s"aggregate view $root would go NEGATIVE applying this batch — " +
        "the change-feed consumer started past rows the view never " +
        "counted; rebuild the view from a feed-covering offset")

  /** Apply one feed batch (must carry `_change_type`) to the aggregate
    * view at `dstRoot`. Returns false when the batch was skipped as a
    * transactional replay. */
  private[graft] def applyAggBatch(
      spark: SparkSession, dstRoot: String, keyCols: Seq[String],
      valueCol: String, batch: DataFrame,
      txn: Option[(String, Long)] = None): Boolean = {
    require(keyCols.nonEmpty, "applyAggBatch needs at least one group column")
    txn match {
      case Some((appId, batchId))
          if VersionedTable.lastTxn(spark, dstRoot, appId).exists(_ >= batchId) =>
        false
      case _ =>
        try { applyAggInternal(spark, dstRoot, keyCols, valueCol, batch, txn); true }
        catch { case _: ChangeReplica.StaleBatchException => false }
    }
  }

  private def applyAggInternal(
      spark: SparkSession, dstRoot: String, keyCols: Seq[String],
      valueCol: String, batch: DataFrame,
      txn: Option[(String, Long)]): Unit = {
    val missing = (keyCols :+ valueCol).filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"column(s) missing from the feed: ${missing.mkString(", ")}")
    // one map-side-combined aggregation over O(batch) rows — the whole
    // cross-version batch collapses to one delta row per touched group
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
    val deltas = batch
      .where(sign.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("__dc"),
        sum(sign * coalesce(col(valueCol), lit(0))).as("__dv"))
      // a group whose batch fully cancels (insert+delete of the same
      // rows in one range) is a provable no-op — drop it before the join
      .where(col("__dc") =!= 0 || col("__dv") =!= 0)
    import spark.implicits._
    val txnExtra: Map[String, DataFrame] = txn.map { case (appId, batchId) =>
      "txn" -> Seq((appId, batchId)).toDF("app_id", "batch_id")
    }.toMap
    val zombieCheck: Long => Unit = _ => txn.foreach { case (appId, batchId) =>
      if (VersionedTable.lastTxn(spark, dstRoot, appId).exists(_ >= batchId))
        throw new ChangeReplica.StaleBatchException(appId, batchId)
    }
    if (VersionedTable.currentVersion(spark, dstRoot).isEmpty) {
      // bootstrap: the view is born from the first batch's positive
      // groups; a leading retraction means the consumer started too late
      val neg = deltas.where(col("__dc") < 0 ||
        (col("__dc") === 0 && col("__dv") =!= 0)).limit(1).count()
      if (neg > 0) throw new NegativeGroupException(dstRoot)
      val images = deltas.select(
        (keyCols.map(col) :+ col("__dc").as("n_rows")
          :+ col("__dv").as("value_sum")): _*)
      VersionedTable.commit(images, dstRoot,
        extras = Map("changes" -> VersionedTable.feedWritable(
          images.withColumn("_change_type", lit("insert")))) ++ txnExtra,
        preCommit = zombieCheck)
    } else {
      val view = "__graft_ivm_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      deltas.createOrReplaceTempView(view)
      try {
        def bq(c: String) = "`" + c + "`"
        // NULL-SAFE key equality when the batch carries a NULL group:
        // SQL GROUP BY treats NULL as ONE group, so the maintenance join
        // must too — under plain `=` a NULL group's delta never matches
        // its own view row (a duplicate NULL row per refresh, its
        // retractions silently dropped). But `<=>` is not a
        // bucket-road-eligible equi (a raw-key HashPartitioning cannot
        // co-locate null-safe join keys), so the common no-null-groups
        // batch keeps `=` and a bucketized view keeps its claimed road —
        // the probe is ONE count over the already-group-sized delta.
        val hasNullKey = deltas
          .where(keyCols.map(k => col(k).isNull).reduce(_ || _))
          .limit(1).count() > 0
        val eq = if (hasNullKey) "<=>" else "="
        val on = keyCols.map(k => s"t.${bq(k)} $eq s.${bq(k)}").mkString(" AND ")
        val insCols = (keyCols :+ "n_rows" :+ "value_sum").map(bq).mkString(", ")
        val insVals = (keyCols.map(c => s"s.${bq(c)}") :+ "s.__dc" :+ "s.__dv")
          .mkString(", ")
        // fate order: negative-count groups fail loudly (raise_error
        // rides the violating fate's assignment, so it fires only for
        // those rows — no extra view pass), zeroed groups delete, live
        // groups accumulate, fresh groups insert — and an UNMATCHED
        // retraction (a delta with dc <= 0 for a group the view never
        // counted) is the same too-late-start corruption the bootstrap
        // refuses, caught by the trailing catch-all insert
        val sql =
          s"""MERGE INTO `$dstRoot` AS t USING $view AS s
             |ON $on
             |WHEN MATCHED AND t.n_rows + s.__dc < 0
             |  THEN UPDATE SET n_rows = cast(raise_error(
             |    'aggregate view would go negative: the feed consumer started past rows the view never counted') AS BIGINT)
             |WHEN MATCHED AND t.n_rows + s.__dc = 0 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET
             |  n_rows = t.n_rows + s.__dc,
             |  value_sum = t.value_sum + s.__dv
             |WHEN NOT MATCHED AND s.__dc > 0
             |  THEN INSERT ($insCols) VALUES ($insVals)
             |WHEN NOT MATCHED
             |  THEN INSERT ($insCols) VALUES (${keyCols.map(c => s"s.${bq(c)}")
            .mkString(", ")}, cast(raise_error(
             |    'aggregate view would go negative: the feed consumer started past rows the view never counted') AS BIGINT), s.__dv)""".stripMargin
        if (txn.isEmpty) graft.plans.GraftSql.execute(spark, sql)
        else graft.plans.GraftSql.mergeWithExtras(spark, sql, txnExtra, zombieCheck)
      } finally spark.catalog.dropTempView(view)
    }
  }

  /** Batch-poll face: consume everything new in `srcRoot`'s feed since
    * this consumer's checkpoint and fold it into the view; returns the
    * applied version range, or None when nothing was new. */
  def applyAggChanges(
      spark: SparkSession, srcRoot: String, dstRoot: String,
      keyCols: Seq[String], valueCol: String,
      checkpointDir: String): Option[(Long, Long)] =
    VersionedTable.consumeChanges(spark, srcRoot, checkpointDir) { batch =>
      applyAggBatch(spark, dstRoot, keyCols, valueCol, batch)
    }

  // ---- the MATERIALIZED VIEW face -----------------------------------------

  /** Table properties recording an MV's definition (written at CREATE,
    * read by REFRESH), and the txn app id whose high-water IS the
    * refresh checkpoint: `lastTxn(view, MvAppId)` = the last source
    * version folded in, stamped atomically with each refresh's merge —
    * no side-channel checkpoint file to lose or double-apply from. */
  val MvSourceProp = "graft.mv.source"
  val MvKeysProp = "graft.mv.keys"
  val MvValueProp = "graft.mv.value"
  val MvAppId = "graft-mv"

  /** CREATE MATERIALIZED VIEW: one aggregate scan of the source's
    * CURRENT version seeds the view, the definition lands as table
    * properties, and the consumed source version is txn-stamped inside
    * the same commit — a source commit racing the create is simply the
    * first refresh's work. */
  def createView(
      spark: SparkSession, dstRoot: String, srcRoot: String,
      keyCols: Seq[String], valueCol: String): Long = {
    require(keyCols.nonEmpty, "createView needs at least one group column")
    require(VersionedTable.currentVersion(spark, dstRoot).isEmpty,
      s"$dstRoot already exists — DROP it or pick another root")
    val srcCur = VersionedTable.currentVersion(spark, srcRoot).getOrElse(
      throw new java.io.IOException(s"no committed version under $srcRoot"))
    val snap = VersionedTable.readVersion(spark, srcRoot, srcCur)
    val missing = (keyCols :+ valueCol)
      .filterNot(c => snap.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"column(s) missing from $srcRoot: ${missing.mkString(", ")}")
    val agg = snap.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col(valueCol), lit(0))).as("value_sum"))
    import spark.implicits._
    VersionedTable.commit(agg, dstRoot,
      extras = Map(
        "changes" -> VersionedTable.feedWritable(
          agg.withColumn("_change_type", lit("insert"))),
        "txn" -> Seq((MvAppId, srcCur)).toDF("app_id", "batch_id")),
      recordProperties = Some(Map(
        MvSourceProp -> srcRoot,
        MvKeysProp -> keyCols.mkString(","),
        MvValueProp -> valueCol)))
  }

  /** REFRESH MATERIALIZED VIEW: fold the source's feed from the stamped
    * high-water to its current version into the view — O(changes) per
    * refresh, exactly-once (a concurrent refresh loses the claim and
    * no-ops), a no-op without a commit when the source hasn't moved.
    * Returns the view's (possibly unchanged) current version. */
  def refreshView(spark: SparkSession, dstRoot: String): Long = {
    val cur = VersionedTable.currentVersion(spark, dstRoot).getOrElse(
      throw new java.io.IOException(s"no committed version under $dstRoot"))
    val props = VersionedTable.propertiesOf(spark, dstRoot, cur)
    val src = props.getOrElse(MvSourceProp, throw new IllegalArgumentException(
      s"$dstRoot is not a materialized view (no $MvSourceProp property)"))
    val keys = props(MvKeysProp).split(',').toSeq
    val valueCol = props(MvValueProp)
    val applied = VersionedTable.lastTxn(spark, dstRoot, MvAppId).getOrElse(
      throw new java.io.IOException(
        s"materialized view $dstRoot lost its refresh high-water stamp"))
    val srcCur = VersionedTable.currentVersion(spark, src).getOrElse(
      throw new java.io.IOException(s"materialized view source $src is gone"))
    if (srcCur <= applied) cur
    else {
      val batch = VersionedTable.readChanges(spark, src, applied + 1, srcCur)
      applyAggBatch(spark, dstRoot, keys, valueCol, batch,
        txn = Some((MvAppId, srcCur)))
      VersionedTable.currentVersion(spark, dstRoot).getOrElse(cur)
    }
  }
}
