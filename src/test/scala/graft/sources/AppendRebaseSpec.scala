package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Append-tolerant conflict resolution (the Delta ConflictChecker's
  * blind-append rule): a DML/append/merge commit that loses its claim
  * race to nothing but stamped BLIND APPENDS publishes its already-staged
  * work anyway, with the appended refs merged into its manifest — under
  * the default write-serializable isolation the history is equivalent to
  * the loser having serialized BEFORE the appends. The cheapness proof in
  * these tests is the CLAIM DIR NAME: tolerance publishes the loser's
  * ORIGINAL staging dir (claimed before the injected append, so its dir
  * number is LOWER than the append's), while a recompute burns it and
  * re-stages under a higher number.
  *
  * Interleaving shape as MaintenanceOccSpec: the inner append runs inside
  * the outer writer's first `preCommit` call (the version claim, before
  * the manifest is finalized — exactly the window tolerance covers). */
class AppendRebaseSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_arb").toString + "/t"

  private def ids(root: String): Set[Long] =
    VersionedTable.read(spark, root).select("id").collect().map(_.getLong(0)).toSet

  private def finalRefs(root: String): Seq[String] =
    VersionedTable.dataFileRefs(spark, root,
      VersionedTable.currentVersion(spark, root).get)

  test("append vs blind append: loser publishes its original staging (no recompute)") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "base")).toDF("id", "x"), root) // dir v1
    var interleaved = false
    VersionedTable.commitAppend(Seq((2L, "a")).toDF("id", "x"), root, // claims dir 2
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          // claims dir 3, publishes as VERSION 2
          VersionedTable.commitAppend(Seq((3L, "b")).toDF("id", "x"), root)
          ()
        })
    assert(interleaved)
    assert(ids(root) == Set(1L, 2L, 3L), s"lost append: ${ids(root)}")
    // the inner append is stamped blind
    assert(VersionedTable.commitInfoOf(spark, root, 2L)
      .get("blindAppend").contains("true"))
    // tolerance: version 3 references A's ORIGINAL dir 2 files and B's
    // dir 3 files — a recompute would have re-staged A under dir 4
    val refs = finalRefs(root)
    assert(refs.exists(_.startsWith("v00000002/")),
      s"loser's original staging was burned (recompute): $refs")
    assert(refs.exists(_.startsWith("v00000003/")),
      s"winner's appended file missing from the union: $refs")
    assert(!refs.exists(_.startsWith("v00000004/")), s"unexpected re-stage: $refs")
  }

  test("COW delete vs blind append: appended rows escape the predicate " +
      "(write-serializable) and the rewrite is not redone") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(1, 101).toDF("id").withColumn("x", concat(lit("r"), $"id"))
        .repartitionByRange(4, $"id"), root)
    var interleaved = false
    VersionedTable.deleteWhere(spark, root, $"id" <= 10,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          // id=5 MATCHES the delete predicate; under write-serializable
          // the delete serialized before the append, so it must survive
          VersionedTable.commitAppend(
            Seq((5L, "late")).toDF("id", "x"), root)
          ()
        })
    assert(interleaved)
    assert(ids(root) == (11L to 100L).toSet + 5L,
      "write-serializable: the mid-flight appended row must survive the delete")
    val refs = finalRefs(root)
    assert(refs.exists(_.startsWith("v00000002/")),
      s"delete's original rewrite was burned (recompute): $refs")
    assert(refs.exists(_.startsWith("v00000003/")),
      s"appended file missing from the rebased manifest: $refs")
    // carried metadata: the appended ref's stats and size rode the rebase
    val v = VersionedTable.currentVersion(spark, root).get
    val dir = new org.apache.hadoop.fs.Path(root, f"v$v%08d")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val appended = refs.filter(_.startsWith("v00000003/"))
    val sizes = FileSizes.load(f, dir)
    assert(appended.forall(sizes.contains),
      s"appended ref's size not carried: ${sizes.keys}")
    val stats = TableStats.load(spark,
      new org.apache.hadoop.fs.Path(dir, "_stats"))
    assert(appended.forall(stats.contains),
      "appended ref's stats not carried — data skipping would go blind")
  }

  test("serializable isolation: the same race recomputes and the delete " +
      "applies to the appended row") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(1, 101).toDF("id").withColumn("x", concat(lit("r"), $"id"))
        .repartitionByRange(4, $"id"), root)
    spark.conf.set(VersionedTable.IsolationKey, "serializable")
    try {
      var interleaved = false
      VersionedTable.deleteWhere(spark, root, $"id" <= 10,
        preCommit = _ =>
          if (!interleaved) {
            interleaved = true
            VersionedTable.commitAppend(
              Seq((5L, "late")).toDF("id", "x"), root)
            ()
          })
      assert(interleaved)
      assert(ids(root) == (11L to 100L).toSet,
        "serializable: the recomputed delete must apply to the appended row")
    } finally spark.conf.unset(VersionedTable.IsolationKey)
  }

  test("MOR delete vs blind append: mask commit rebases, appended rows visible") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(1, 101).toDF("id").withColumn("x", concat(lit("r"), $"id"))
        .repartitionByRange(4, $"id"), root)
    var interleaved = false
    VersionedTable.deleteWhere(spark, root, $"id" <= 10, mor = true,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.commitAppend(Seq((5L, "late")).toDF("id", "x"), root)
          ()
        })
    assert(interleaved)
    assert(ids(root) == (11L to 100L).toSet + 5L,
      "MOR delete lost the concurrent append or masked the appended row")
  }

  test("non-blind intervening commit still conflicts: no lost update") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(1, 101).toDF("id").withColumn("x", concat(lit("r"), $"id")),
      root)
    var interleaved = false
    // the injected writer REPLACES the table — opaque (no blindAppend
    // stamp), so the delete must abort and recompute against it
    VersionedTable.deleteWhere(spark, root, $"id" <= 10,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.commit(
            Seq((200L, "new"), (201L, "new")).toDF("id", "x"), root)
          ()
        })
    assert(interleaved)
    assert(ids(root) == Set(200L, 201L),
      s"the full-snapshot writer's state was lost: ${ids(root)}")
  }

  test("disjoint DML vs DML: delete loser composes with an update winner " +
      "by manifest arithmetic (no recompute)") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(1, 101).toDF("id").withColumn("x", concat(lit("r"), $"id"))
        .repartitionByRange(4, $"id"), root)
    var interleaved = false
    // loser deletes the LOW ids; the injected winner updates the HIGH
    // ids — different files, and the winner's fresh rows (id >= 90)
    // provably refute the loser's predicate (id <= 10)
    VersionedTable.deleteWhere(spark, root, $"id" <= 10,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.updateWhere(spark, root, $"id" >= 90,
            Map("x" -> lit("upd")))
          ()
        })
    assert(interleaved)
    val out = VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == (11L to 100L).toSet, "both DML effects must land")
    assert((90L to 100L).forall(out(_) == "upd"), "update winner's effect lost")
    assert((11L to 89L).forall(i => out(i) == s"r$i"))
    // no recompute: the delete's original staging (dir 2, claimed before
    // the update's dir 3) is in the final manifest
    val refs = finalRefs(root)
    assert(refs.exists(_.startsWith("v00000002/")),
      s"delete's original rewrite was burned (recompute): $refs")
    assert(refs.exists(_.startsWith("v00000003/")),
      s"update winner's fresh file missing: $refs")
  }

  test("DML winner whose fresh rows ADMIT the loser's predicate: strict " +
      "recompute (the update moves rows INTO the delete range)") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(1, 101).toDF("id").withColumn("x", concat(lit("r"), $"id"))
        .repartitionByRange(4, $"id"), root)
    var interleaved = false
    // the winner REWRITES id=95 to id=5 — its fresh file admits the
    // loser's predicate, so composing would resurrect a row the
    // serial-order delete must kill; the loser must recompute
    VersionedTable.deleteWhere(spark, root, $"id" <= 10,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.updateWhere(spark, root, $"id" === 95L,
            Map("id" -> lit(5L)))
          ()
        })
    assert(interleaved)
    assert(ids(root) == (11L to 94L).toSet ++ (96L to 100L).toSet,
      s"the recomputed delete must kill the moved row: ${ids(root)}")
  }

  test("DML winner that rewrote the MOR loser's masked file: strict recompute") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(1, 101).toDF("id").withColumn("x", concat(lit("r"), $"id"))
        .repartitionByRange(4, $"id"), root)
    var interleaved = false
    // the winner's COW update rewrites the same low-id file the MOR
    // delete is masking — tolerating would point masks at a removed
    // file and resurrect the deletes; must recompute
    VersionedTable.deleteWhere(spark, root, $"id" <= 10, mor = true,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.updateWhere(spark, root, $"id" === 3L,
            Map("x" -> lit("sneak")))
          ()
        })
    assert(interleaved)
    assert(ids(root) == (11L to 100L).toSet,
      s"MOR delete must re-apply over the winner's rewrite: ${ids(root)}")
  }

  test("append loser vs DML winner: append survives without re-staging") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(1, 101).toDF("id").withColumn("x", concat(lit("r"), $"id"))
        .repartitionByRange(4, $"id"), root)
    var interleaved = false
    VersionedTable.commitAppend(Seq((200L, "new")).toDF("id", "x"), root,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.deleteWhere(spark, root, $"id" <= 10)
          ()
        })
    assert(interleaved)
    assert(ids(root) == (11L to 100L).toSet + 200L,
      s"append + delete must both land: ${ids(root)}")
    val refs = finalRefs(root)
    assert(refs.exists(_.startsWith("v00000002/")),
      s"append's original staging was burned (recompute): $refs")
  }

  test("COW merge vs blind append: no re-merge, both land") {
    val root = freshRoot()
    val ts0 = lit("2024-06-01 00:00:00").cast("timestamp")
    val ts1 = lit("2024-06-02 00:00:00").cast("timestamp")
    def stg(ids: Seq[Long], status: String) = ids.toDF("id")
      .withColumn("last_status", lit(status))
      .withColumn("created_at", ts0)
    Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq(1L, 2L, 3L), "OPEN"), "id", ts0, "last_status", "DONE")
    VersionedTable.optimize(spark, root, Seq("id"))
    var interleaved = false
    Sinks.upsertByKeyVersionedCow(spark, root,
      stg(Seq(2L), "DONE"), "id", ts1, "last_status", "DONE",
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.commitAppend(
            stg(Seq(9L), "OPEN").withColumn("updated_at", ts0)
              .withColumn("deleted_at", lit(null).cast("timestamp")),
            root)
          ()
        })
    assert(interleaved)
    assert(ids(root) == Set(1L, 2L, 3L, 9L), s"lost a writer: ${ids(root)}")
    val done = VersionedTable.read(spark, root)
      .where($"id" === 2L).select("last_status")
      .collect().map(_.getString(0)).toSeq
    assert(done == Seq("DONE"), s"merge's update lost: $done")
  }
}
