package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.{AggReplica, VersionedTable}

/** Incremental view maintenance with retractions ([[AggReplica]] +
  * [[ViewStream]]): a count/sum GROUP BY view maintained from the
  * change feed alone — deletes and update pre-images retract, inserts
  * and post-images add, zeroed groups disappear, a too-late consumer
  * fails loudly instead of serving a wrong aggregate, and replayed
  * batches are exactly-once no-ops on the txn stamp. */
class ViewStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** (group, value) history: seed, append, move a key across groups,
    * delete a whole group. */
  private def seedSource(root: String): Unit = {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "grp", "v")
    VersionedTable.commit(df, root, extras = Map("changes" ->
      VersionedTable.feedWritable(df.withColumn("_change_type", lit("insert")))))
    VersionedTable.commitAppend(
      Seq((4L, "b", 7L), (5L, "c", 100L)).toDF("id", "grp", "v"), root,
      changeFeed = true)
    // move id=2 from group a to group b: a retracts (1, 20), b adds
    VersionedTable.updateWhere(spark, root, col("id") === 2L,
      Map("grp" -> lit("b")))
    // delete group c entirely: its view row must DISAPPEAR
    VersionedTable.deleteWhere(spark, root, col("grp") === "c")
  }

  private def viewState(root: String): Seq[(String, Long, Long)] =
    VersionedTable.read(spark, root)
      .select(col("grp"), col("n_rows"), col("value_sum").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  test("the streamed view converges to the batch aggregate over the final " +
    "state: moves retract across groups, zeroed groups disappear") {
    val src = freshDir("graft_vs_src") + "/t"
    val dst = freshDir("graft_vs_dst") + "/t"
    val ck = freshDir("graft_vs_ck")
    seedSource(src)
    ViewStream.start(spark, src, dst, Seq("grp"), "v", ck,
      appId = "vs-test", availableNow = true).awaitTermination()
    assert(viewState(dst) == Seq(("a", 1L, 10L), ("b", 3L, 32L)),
      "view must equal the batch GROUP BY over the final source state")
    // restart with nothing new: a no-op, state unchanged
    ViewStream.start(spark, src, dst, Seq("grp"), "v", ck,
      appId = "vs-test", availableNow = true).awaitTermination()
    assert(viewState(dst) == Seq(("a", 1L, 10L), ("b", 3L, 32L)))
    // more source changes fold incrementally on the same checkpoint
    VersionedTable.commitAppend(
      Seq((6L, "a", 3L)).toDF("id", "grp", "v"), src, changeFeed = true)
    ViewStream.start(spark, src, dst, Seq("grp"), "v", ck,
      appId = "vs-test", availableNow = true).awaitTermination()
    assert(viewState(dst) == Seq(("a", 2L, 13L), ("b", 3L, 32L)))
  }

  test("a replayed batch is an exactly-once no-op on the txn stamp; a " +
    "stale writer aborts inside the claim") {
    val dst = freshDir("graft_vs_txn") + "/t"
    val batch = Seq(("a", 10L, "insert"), ("a", 20L, "insert"))
      .toDF("grp", "v", "_change_type")
    assert(ViewStream.applyBatchTxn(spark, dst, Seq("grp"), "v", batch,
      "vs-txn", 0L))
    assert(viewState(dst) == Seq(("a", 2L, 30L)))
    // replay of batch 0: skipped BEFORE any work
    assert(!ViewStream.applyBatchTxn(spark, dst, Seq("grp"), "v", batch,
      "vs-txn", 0L))
    assert(viewState(dst) == Seq(("a", 2L, 30L)))
    // batch 1 applies; a zombie retry of batch 1 skips again
    val b1 = Seq(("a", 10L, "delete")).toDF("grp", "v", "_change_type")
    assert(ViewStream.applyBatchTxn(spark, dst, Seq("grp"), "v", b1,
      "vs-txn", 1L))
    assert(viewState(dst) == Seq(("a", 1L, 20L)))
    assert(!ViewStream.applyBatchTxn(spark, dst, Seq("grp"), "v", b1,
      "vs-txn", 1L))
    assert(viewState(dst) == Seq(("a", 1L, 20L)))
  }

  test("a consumer starting past rows the view never counted fails " +
    "loudly — bootstrap and merged-batch forms both") {
    val dst = freshDir("graft_vs_neg") + "/t"
    // bootstrap with a leading retraction: refused
    val late = Seq(("a", 10L, "delete")).toDF("grp", "v", "_change_type")
    intercept[AggReplica.NegativeGroupException] {
      AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", late)
    }
    // live view, then a batch retracting more than the group holds
    val ok = Seq(("a", 10L, "insert")).toDF("grp", "v", "_change_type")
    assert(AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", ok))
    val over = Seq(("a", 10L, "delete"), ("a", 20L, "delete"))
      .toDF("grp", "v", "_change_type")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Exception] {
      AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", over)
    }
    assert(messages(e).exists(_.contains("would go negative")),
      s"expected the loud negative-view error, got: ${messages(e)}")
    assert(viewState(dst) == Seq(("a", 1L, 10L)),
      "a refused batch must leave the view untouched")
    // an UNMATCHED retraction — a group the view never counted — is the
    // same corruption and must fail just as loudly, never drop silently
    val ghost = Seq(("zz", 9L, "delete")).toDF("grp", "v", "_change_type")
    val e2 = intercept[Exception] {
      AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", ghost)
    }
    assert(messages(e2).exists(_.contains("would go negative")),
      s"expected the loud unmatched-retraction error, got: ${messages(e2)}")
    assert(viewState(dst) == Seq(("a", 1L, 10L)))
  }

  test("a NULL group key is ONE group, exactly as SQL GROUP BY treats " +
    "it: updates retract across, the null group can zero out") {
    val dst = freshDir("graft_vs_null") + "/t"
    val b0 = Seq[(Option[String], Long, String)](
      (Some("a"), 10L, "insert"), (None, 5L, "insert"),
      (None, 7L, "insert")).toDF("grp", "v", "_change_type")
    assert(AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", b0))
    def state(): Seq[(Option[String], Long, Long)] =
      VersionedTable.read(spark, dst)
        .select(col("grp"), col("n_rows"), col("value_sum").cast("long"))
        .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    assert(state() == Seq((None, 2L, 12L), (Some("a"), 1L, 10L)))
    // a second batch must MERGE into the null group, not duplicate it —
    // and its retraction must land, not silently drop
    val b1 = Seq[(Option[String], Long, String)](
      (None, 5L, "delete"), (None, 3L, "insert"))
      .toDF("grp", "v", "_change_type")
    assert(AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", b1))
    assert(state() == Seq((None, 2L, 10L), (Some("a"), 1L, 10L)),
      "the null group must accumulate as one group across batches")
    // and zero out like any other group
    val b2 = Seq[(Option[String], Long, String)](
      (None, 7L, "delete"), (None, 3L, "delete"))
      .toDF("grp", "v", "_change_type")
    assert(AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", b2))
    assert(state() == Seq((Some("a"), 1L, 10L)),
      "a zeroed null group must disappear")
  }

  test("a BUCKETIZED view's maintenance merges ride the claimed layout " +
    "and keep it: the IVM composes with the bucket road") {
    val src = freshDir("graft_vs_bsrc") + "/t"
    val dst = freshDir("graft_vs_bdst") + "/t"
    val ck = freshDir("graft_vs_bck")
    // many groups so the layout has something to hash
    val df = (0L until 200L).map(i => (i, s"g${i % 40}", i))
      .toDF("id", "grp", "v")
    VersionedTable.commit(df, src, extras = Map("changes" ->
      VersionedTable.feedWritable(df.withColumn("_change_type", lit("insert")))))
    ViewStream.start(spark, src, dst, Seq("grp"), "v", ck,
      appId = "vs-bkt", availableNow = true).awaitTermination()
    graft.sources.Bucketing.bucketize(spark, dst, "grp", 8)
    // further changes fold through SQL MERGEs against the bucketized view
    VersionedTable.updateWhere(spark, src, col("id") === 7L,
      Map("grp" -> lit("g0")))
    VersionedTable.deleteWhere(spark, src, col("grp") === "g1")
    ViewStream.start(spark, src, dst, Seq("grp"), "v", ck,
      appId = "vs-bkt", availableNow = true).awaitTermination()
    val cur = VersionedTable.currentVersion(spark, dst).get
    assert(graft.sources.Bucketing
      .pureBuckets(spark, dst, cur, "grp", 8).isDefined,
      "the maintenance merge must keep the view's layout provably pure")
    // the view still equals the batch aggregate over the final source
    val want = VersionedTable.read(spark, src)
      .groupBy("grp").agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("v"), lit(0L))).as("value_sum"))
      .select(col("grp"), col("n_rows"), col("value_sum").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(viewState(dst) == want)
    assert(!want.exists(_._1 == "g1"), "the deleted group must be gone")
  }

  test("the SQL MATERIALIZED VIEW face: strict-shape create, O(changes) " +
    "refresh, no-op refresh without a commit, loud misuse") {
    val tmp = freshDir("graft_vs_mv")
    val src = s"$tmp/src"; val mv = s"$tmp/mv"
    val df = Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("id", "grp", "v")
    VersionedTable.commit(df, src, extras = Map("changes" ->
      VersionedTable.feedWritable(df.withColumn("_change_type", lit("insert")))))
    graft.plans.GraftSql.execute(spark,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT grp, count(*) AS n_rows, sum(v) AS value_sum
         |FROM '$src' GROUP BY grp""".stripMargin)
    assert(viewState(mv) == Seq(("a", 1L, 10L), ("b", 1L, 5L)))
    // source moves; refresh folds the feed
    VersionedTable.commitAppend(Seq((3L, "a", 7L)).toDF("id", "grp", "v"),
      src, changeFeed = true)
    VersionedTable.deleteWhere(spark, src, col("id") === 2L)
    graft.plans.GraftSql.execute(spark, s"REFRESH MATERIALIZED VIEW '$mv'")
    assert(viewState(mv) == Seq(("a", 2L, 17L)),
      "refresh must fold adds and retractions; the zeroed group goes")
    // nothing new: no commit
    val v0 = VersionedTable.currentVersion(spark, mv).get
    graft.plans.GraftSql.execute(spark, s"REFRESH MATERIALIZED VIEW '$mv'")
    assert(VersionedTable.currentVersion(spark, mv).contains(v0),
      "an up-to-date refresh must not commit a version")
    // misuse fails loudly: wrong SELECT shape, refresh of a non-view
    val e1 = intercept[IllegalArgumentException] {
      graft.plans.GraftSql.execute(spark,
        s"""CREATE MATERIALIZED VIEW '$tmp/bad' AS
           |SELECT grp, max(v) AS value_sum, count(*) AS n_rows
           |FROM '$src' GROUP BY grp""".stripMargin)
    }
    assert(e1.getMessage.contains("count(*) AS n_rows"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.GraftSql.execute(spark, s"REFRESH MATERIALIZED VIEW '$src'")
    }
    assert(e2.getMessage.contains("not a materialized view"), e2.getMessage)
  }

  test("cross-version cancellation inside one batch needs no ordering: " +
    "insert+delete of the same rows is a no-op, replace accumulates") {
    val dst = freshDir("graft_vs_can") + "/t"
    val seed = Seq(("a", 5L, "insert")).toDF("grp", "v", "_change_type")
    assert(AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", seed))
    // one batch spanning versions: b inserted then fully deleted (nets
    // out), a updated 5 -> 9 (pre-image retracts, post-image adds)
    val span = Seq(
      ("b", 50L, "insert"), ("b", 50L, "delete"),
      ("a", 5L, "update_preimage"), ("a", 9L, "update_postimage"))
      .toDF("grp", "v", "_change_type")
    assert(AggReplica.applyAggBatch(spark, dst, Seq("grp"), "v", span))
    assert(viewState(dst) == Seq(("a", 1L, 9L)),
      "cancelled group must never touch the view; the replace must land")
  }
}
