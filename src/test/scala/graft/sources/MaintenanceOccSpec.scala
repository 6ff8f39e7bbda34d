package graft.sources

import graft.SparkSpec

/** Optimistic concurrency on the APPEND and MAINTENANCE commit paths —
  * the two write shapes the DML OCC work (SinksSpec, DeleteSpec) did not
  * cover. Interleaving shape mirrors SinksSpec's upsert test: the inner
  * writer runs inside the outer writer's pre-publish window via the
  * `preCommit` hook, so pre-OCC the outer publish would silently drop the
  * inner writer's files (append) or rows (maintenance rewrite). */
class MaintenanceOccSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_mocc").toString + "/t"

  private def ids(root: String): Set[Long] =
    VersionedTable.read(spark, root).select("id").collect().map(_.getLong(0)).toSet

  test("commitCow with refs from a rewritten snapshot signals a CONFLICT, not a crash") {
    val root = freshRoot()
    VersionedTable.commit((1L to 8L).map(i => (i, "a")).toDF("id", "x"), root)
    val staleRefs = VersionedTable.dataFileRefs(spark, root, 1L)
    VersionedTable.compact(spark, root) // v2: v1's files replaced wholesale
    // a writer that pinned v1 now holds refs the current snapshot no
    // longer contains — that is a concurrent-write conflict the OCC
    // retry loops must catch and REBASE, not an argument error that
    // fails the batch outright
    intercept[Sinks.ConcurrentWriteException] {
      VersionedTable.commitCow(Seq((99L, "b")).toDF("id", "x"), root, staleRefs)
    }
  }

  test("concurrent appends: both batches' files survive in the final manifest") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "base")).toDF("id", "x"), root)
    // appender A computes its kept-file refs against v1; in A's claim
    // window appender B lands batch {3}. A must abort, recompute refs
    // (now including B's files), and retry.
    var interleaved = false
    VersionedTable.commitAppend(Seq((2L, "a")).toDF("id", "x"), root,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.commitAppend(Seq((3L, "b")).toDF("id", "x"), root)
          ()
        })
    assert(interleaved)
    assert(ids(root) == Set(1L, 2L, 3L), s"lost append: final snapshot has ${ids(root)}")
  }

  test("optimize vs concurrent append: the appended rows survive the layout rewrite") {
    val root = freshRoot()
    VersionedTable.commit((1L to 50L).map(i => (i, s"r$i")).toDF("id", "x"), root)
    var interleaved = false
    VersionedTable.optimize(spark, root, Seq("id"),
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.commitAppend(Seq((99L, "late")).toDF("id", "x"), root)
          ()
        })
    assert(interleaved)
    assert(ids(root) == (1L to 50L).toSet + 99L,
      "layout rewrite erased the concurrent append")
    // append-tolerant rebase (AppendRebaseSpec pins the mechanics): the
    // rewrite is NOT redone — the final version is a manifest that
    // unions the optimize's own clustered files (claimed dir 2, BEFORE
    // the append's dir 3) with the appended file by reference
    val refs = VersionedTable.manifestOf(spark, root,
      VersionedTable.currentVersion(spark, root).get).get
    assert(refs.exists(_.startsWith("v00000002/")),
      s"optimize's original rewrite was burned (recompute): $refs")
    assert(refs.exists(_.startsWith("v00000003/")),
      s"appended file missing from the rebased manifest: $refs")
  }

  test("compact vs concurrent upsert-style commit: no lost update") {
    val root = freshRoot()
    VersionedTable.commit((1L to 20L).map(i => (i, s"r$i")).toDF("id", "x"), root)
    var interleaved = false
    VersionedTable.compact(spark, root,
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          // a full-snapshot writer replacing the table mid-compaction
          VersionedTable.commit(
            (1L to 21L).map(i => (i, s"n$i")).toDF("id", "x"), root)
          ()
        })
    assert(interleaved)
    // compact rebased onto the replacement snapshot: 21 rows, new values
    val rows = VersionedTable.read(spark, root).collect()
    assert(rows.length == 21)
    assert(rows.forall(_.getString(1).startsWith("n")),
      "compaction republished the pre-replacement snapshot")
  }

  test("z-order optimize vs concurrent append: appended rows survive") {
    val root = freshRoot()
    VersionedTable.commit(
      (1L to 50L).map(i => (i, (i * 7 % 50), s"r$i")).toDF("id", "k", "x"), root)
    var interleaved = false
    VersionedTable.optimizeZOrder(spark, root, Seq("id", "k"),
      preCommit = _ =>
        if (!interleaved) {
          interleaved = true
          VersionedTable.commitAppend(
            Seq((99L, 99L, "late")).toDF("id", "k", "x"), root)
          ()
        })
    assert(interleaved)
    assert(ids(root) == (1L to 50L).toSet + 99L,
      "z-order rewrite erased the concurrent append")
  }
}
