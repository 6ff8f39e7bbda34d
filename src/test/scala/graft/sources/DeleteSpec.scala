package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Row-level COW DELETE: only files whose stats admit the predicate are
  * rewritten, everything else rides by manifest reference; SQL NULL
  * semantics; no-op deletes publish nothing. */
class DeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_del").toString + "/t"

  // 400 rows clustered into 4 disjoint id-range files
  private def table(root: String): Unit =
    VersionedTable.commit(
      spark.range(0, 400).toDF("id")
        .withColumn("grp", $"id" % 7)
        .withColumn("maybe", when($"id" % 10 =!= 0, $"id"))
        .repartitionByRange(4, $"id").sortWithinPartitions("id"),
      root)

  test("key-range delete rewrites only the admitting file; rest by reference") {
    val root = freshRoot(); table(root)
    val v2 = VersionedTable.deleteWhere(spark, root, $"id" >= 100L && $"id" < 150L)
    assert(v2 == 2L)
    // result = the filter semantics exactly
    assert(VersionedTable.read(spark, root).count() == 350)
    assert(VersionedTable.read(spark, root)
      .where($"id" >= 100L && $"id" < 150L).count() == 0)
    // the new snapshot is a manifest carrying 3 of 4 original files by
    // reference into v1's dir — only the touched range was rewritten
    val refs = VersionedTable.manifestOf(spark, root, v2).get
    assert(refs.count(_.startsWith("v00000001/")) == 3,
      s"expected 3 referenced originals, got: $refs")
    // time travel still sees the pre-delete table
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 400)
  }

  test("NULL predicate rows survive; TRUE rows go") {
    val root = freshRoot(); table(root)
    // maybe is NULL on multiples of 10: `maybe < 100` is NULL there —
    // those rows must SURVIVE the delete (SQL three-valued logic)
    VersionedTable.deleteWhere(spark, root, $"maybe" < 100L)
    val left = VersionedTable.read(spark, root)
    assert(left.count() == 400 - 90) // ids 1..99 minus the 9 null rows
    assert(left.where($"maybe".isNull).count() == 40) // all null rows kept
  }

  test("a provably-absent predicate is a no-op: no new version published") {
    val root = freshRoot(); table(root)
    val v = VersionedTable.deleteWhere(spark, root, $"id" === 100000L)
    assert(v == 1L)
    assert(VersionedTable.versions(spark, root) == Seq(1L))
    assert(VersionedTable.read(spark, root).count() == 400)
  }

  test("stat-less snapshots degrade to a correct full rewrite") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(0, 100).toDF("id").repartitionByRange(4, $"id"),
      root, collectStats = false)
    val v = VersionedTable.deleteWhere(spark, root, $"id" < 10L)
    assert(v == 2L)
    assert(VersionedTable.read(spark, root).count() == 90)
    // nothing prunable → nothing carried by reference
    assert(VersionedTable.manifestOf(spark, root, v)
      .forall(_.forall(_.startsWith("v00000002/"))))
  }

  test("updateWhere rewrites only admitting files; SET casts; NULL rows untouched") {
    val root = freshRoot(); table(root)
    val v2 = VersionedTable.updateWhere(spark, root,
      $"id" >= 100L && $"id" < 150L,
      Map("grp" -> lit(999), "maybe" -> ($"maybe" + 1)))
    assert(v2 == 2L)
    // only the [100,200) file rewritten, 3 originals by reference
    val refs = VersionedTable.manifestOf(spark, root, v2).get
    assert(refs.count(_.startsWith("v00000001/")) == 3)
    val t = VersionedTable.read(spark, root)
    assert(t.count() == 400)
    // updated slice: grp = 999 (int literal cast to the long column),
    // maybe incremented where non-null, still null on multiples of 10
    assert(t.where($"id" >= 100L && $"id" < 150L && $"grp" =!= 999L).count() == 0)
    assert(t.where($"id" === 101L).select("maybe").as[Long].head() == 102L)
    assert(t.where($"id" === 110L).select($"maybe".isNull).as[Boolean].head())
    // untouched rows identical
    assert(t.where($"id" < 100L && $"grp" === 999L).count() == 0)
    // schema unchanged
    assert(t.schema == VersionedTable.readVersion(spark, root, 1L).schema)
    // NULL-predicate rows are not updated: maybe<120 is NULL on id%10==0
    VersionedTable.updateWhere(spark, root, $"maybe" < 120L, Map("grp" -> lit(-1)))
    val t2 = VersionedTable.read(spark, root)
    assert(t2.where($"maybe".isNull && $"grp" === -1L).count() == 0)
    // no-op + bad column
    assert(VersionedTable.updateWhere(spark, root, $"id" === 99999L,
      Map("grp" -> lit(0))) == VersionedTable.currentVersion(spark, root).get)
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, $"id" === 1L, Map("nope" -> lit(0)))
    }
  }

  test("delete composes with data skipping and later commits") {
    val root = freshRoot(); table(root)
    VersionedTable.deleteWhere(spark, root, $"id" < 100L)
    // pruning still works on the manifest snapshot (stats carried/written)
    val v = VersionedTable.currentVersion(spark, root).get
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v, $"id" === 250L)
    assert(kept.size == 1 && total >= 3)
    // a later plain commit and vacuum behave normally
    VersionedTable.commit(VersionedTable.read(spark, root).limit(10), root)
    VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(VersionedTable.read(spark, root).count() == 10)
  }
}
