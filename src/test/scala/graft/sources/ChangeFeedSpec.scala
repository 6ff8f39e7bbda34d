package graft.sources

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.operators.IncrementalMerge

/** Change data feed: per-run insert/update pre+post rows, consistent with
  * the merge by construction, stored atomically with their snapshot and
  * readable as an incremental range. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_cdf").toString + "/t"

  private val runTs = lit("2024-06-02 00:00:00").cast("timestamp")

  private def stg(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "last_status", "c")
      .withColumn("created_at", col("c").cast("timestamp")).drop("c")

  test("feed rows are exactly the merge's writes: inserts + pre/post pairs") {
    val target = IncrementalMerge.mergeEvolving(
      IncrementalMerge.emptyTarget(stg(Nil), "id", "last_status"),
      stg(Seq((1L, "OPEN", "2024-05-30 10:00:00"), (2L, "OPEN", "2024-05-30 11:00:00"))),
      "id", lit("2024-06-01 00:00:00").cast("timestamp"), "last_status", "DONE")
    // staging: rewrites 1 (-> DONE), leaves 2 untouched, inserts 3
    val staging = stg(Seq((1L, "DONE", "2024-05-30 10:00:00"), (3L, "OPEN", "2024-06-01 09:00:00")))
    val merged = IncrementalMerge.mergeEvolving(
      target, staging, "id", runTs, "last_status", "DONE")
    val feed = IncrementalMerge.changeFeed(
      target, staging, "id", runTs, "last_status", "DONE")

    val byType = feed.collect().groupBy(_.getAs[String]("_change_type"))
    assert(byType("insert").map(_.getLong(0)).toSeq == Seq(3L))
    assert(byType("update_preimage").map(_.getLong(0)).toSeq == Seq(1L))
    assert(byType("update_postimage").map(_.getLong(0)).toSeq == Seq(1L))
    // untouched key 2 emits nothing
    assert(feed.filter(col("id") === 2L).count() == 0)

    // post-images equal the merged table's rows for the touched keys
    val dataCols = merged.columns.map(col)
    assert(feed
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(dataCols: _*)
      .exceptAll(merged.filter(col("id").isin(1L, 3L))).count() == 0)
    // pre-images equal the previous snapshot's rows
    assert(feed
      .filter(col("_change_type") === "update_preimage")
      .select(dataCols: _*)
      .exceptAll(target.filter(col("id") === 1L)).count() == 0)
    // the soft delete is visible in the feed: pre null -> post non-null
    assert(byType("update_preimage").head.getAs[Any]("deleted_at") == null)
    assert(byType("update_postimage").head.getAs[Any]("deleted_at") != null)
  }

  test("feed is O(delta): staging-side left join, never the merge's full outer") {
    val target = stg(Seq((1L, "OPEN", "2024-05-30 10:00:00")))
      .withColumn("updated_at", col("created_at"))
      .withColumn("deleted_at", lit(null).cast("timestamp"))
    val feed = IncrementalMerge.changeFeed(
      target, stg(Seq((1L, "DONE", "2024-05-30 10:00:00"))),
      "id", runTs, "last_status", "DONE")
    val joins = feed.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(joins.nonEmpty)
    assert(!joins.exists(_ == org.apache.spark.sql.catalyst.plans.FullOuter),
      s"change feed must not full-outer join (untouched rows are omitted): $joins")
  }

  test("feed rides the versioned upsert and reads back as a stamped range") {
    val root = freshRoot()
    val t1 = lit("2024-06-01 00:00:00").cast("timestamp")
    val v1 = Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq((1L, "OPEN", "2024-05-30 10:00:00"), (2L, "OPEN", "2024-05-30 11:00:00"))),
      "id", t1, "last_status", "DONE")
    // run 2 evolves the schema: staging adds `channel`
    val v2 = Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq((1L, "DONE", "2024-05-30 10:00:00"), (3L, "OPEN", "2024-06-01 09:00:00")))
        .withColumn("channel", lit("web")),
      "id", runTs, "last_status", "DONE")

    val all = VersionedTable.readChanges(spark, root, v1, v2)
    // v1 is a first run on an empty target: all inserts
    assert(all.filter(col("_commit_version") === v1)
      .collect().forall(_.getAs[String]("_change_type") == "insert"))
    // v2: key 1 pre+post, key 3 insert, key 2 silent
    val r2 = all.filter(col("_commit_version") === v2)
    assert(r2.count() == 3 && r2.filter(col("id") === 2L).count() == 0)
    // evolution across the range unions by name: v1 feed rows carry a
    // null channel, v2 post-images carry the staged value
    assert(all.columns.contains("channel"))
    assert(all.filter(col("_commit_version") === v1)
      .collect().forall(_.getAs[String]("channel") == null))
    assert(r2.filter(col("_change_type") === "update_postimage")
      .head().getAs[String]("channel") == "web")
    // replaying the feed's post-images over v1 reproduces v2's snapshot
    val replayCols = VersionedTable.read(spark, root).columns
    val replayed = VersionedTable.readVersion(spark, root, v1)
      .withColumn("channel", lit(null).cast("string"))
      .join(r2.select("id").distinct(), Seq("id"), "left_anti")
      .unionByName(r2.filter(col("_change_type").isin("insert", "update_postimage"))
        .select(replayCols.map(col): _*))
      .select(replayCols.map(col): _*) // exceptAll resolves positionally
    assert(replayed.exceptAll(VersionedTable.read(spark, root)).count() == 0)
    assert(VersionedTable.read(spark, root).exceptAll(replayed).count() == 0)
  }

  test("consumeChanges: checkpointed incremental polls, replay on failure, independent consumers") {
    val root = freshRoot()
    val ck1 = java.nio.file.Files.createTempDirectory("graft_cdf_c1").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft_cdf_c2").toString
    val t1 = lit("2024-06-01 00:00:00").cast("timestamp")
    Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq((1L, "OPEN", "2024-05-30 10:00:00"))), "id", t1, "last_status", "DONE")
    Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq((2L, "OPEN", "2024-05-30 11:00:00"))), "id", runTs, "last_status", "DONE")

    // first poll: both versions' feeds in one micro-batch
    var seen = Seq.empty[(Long, String)]
    def collectBatch(df: org.apache.spark.sql.DataFrame): Unit =
      seen = df.select("id", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(VersionedTable.consumeChanges(spark, root, ck1)(collectBatch)
      .contains((1L, 2L)))
    assert(seen.map(_._1).sorted == Seq(1L, 2L))
    // nothing new: no-op poll, process not invoked
    seen = Seq.empty
    assert(VersionedTable.consumeChanges(spark, root, ck1)(collectBatch).isEmpty)
    assert(seen.isEmpty)

    // a third commit: the next poll sees exactly that version's feed
    Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq((1L, "DONE", "2024-05-30 10:00:00"))), "id", runTs, "last_status", "DONE")
    assert(VersionedTable.consumeChanges(spark, root, ck1)(collectBatch)
      .contains((3L, 3L)))
    assert(seen.forall(_._1 == 1L) && seen.map(_._2).sorted ==
      Seq("update_postimage", "update_preimage"))

    // AT-LEAST-ONCE: a crash inside process leaves the checkpoint, the
    // next poll replays the same range
    Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq((3L, "OPEN", "2024-06-01 09:00:00"))), "id", runTs, "last_status", "DONE")
    intercept[RuntimeException] {
      VersionedTable.consumeChanges(spark, root, ck1)(_ =>
        throw new RuntimeException("consumer crashed"))
    }
    assert(VersionedTable.consumeChanges(spark, root, ck1)(collectBatch)
      .contains((4L, 4L)))
    assert(seen.map(_._1) == Seq(3L))

    // an independent consumer starts from the beginning of the log
    assert(VersionedTable.consumeChanges(spark, root, ck2)(collectBatch)
      .contains((1L, 4L)))
    assert(seen.map(_._1).distinct.sorted == Seq(1L, 2L, 3L))
  }

  test("a feedless version in range fails loudly, not as a silent gap") {
    val root = freshRoot()
    val v1 = Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq((1L, "OPEN", "2024-05-30 10:00:00"))), "id", runTs, "last_status", "DONE")
    // a full-snapshot writer commits without a feed
    val v2 = VersionedTable.commit(VersionedTable.read(spark, root), root)
    intercept[java.io.IOException] {
      VersionedTable.readChanges(spark, root, v1, v2).collect()
    }
    // but the range that stops before it still reads
    assert(VersionedTable.readChanges(spark, root, v1, v1).count() == 1)
  }
}
