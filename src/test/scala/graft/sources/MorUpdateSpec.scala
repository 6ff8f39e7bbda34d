package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read updates: `updateWhere(mor = true)` masks the matched
  * rows' old copies via the `_dv` sidecar and appends the SET-projected
  * replacements as fresh files — bytes written scale with matched rows,
  * not touched files — and every read path folds mask + union so results
  * equal the copy-on-write form. Updates compose (a MOR update of a
  * MOR-updated row masks the replacement, not the original), the change
  * feed carries pre/post images, and compaction folds everything back to
  * a clean layout. */
class MorUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_moru").toString + "/t"

  private def fsOf(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Bytes of data files physically inside version `v`'s own dir. */
  private def ownBytes(root: String, v: Long): Long = {
    val f = fsOf(root)
    val dir = new org.apache.hadoop.fs.Path(root, f"v$v%08d")
    f.listStatus(dir).filter(s => s.getPath.getName.startsWith("part-") &&
      s.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
  }

  /** A 3-file key-clustered table (1000 rows/file) with a distinct wide
    * payload per row, so a COW file rewrite is visibly more expensive
    * than the handful of rows MOR appends. */
  private def seed(root: String): Unit = {
    VersionedTable.commit(
      // distinct per-row payload: dictionary/RLE can't collapse it, so a
      // COW file rewrite carries real bytes and the O(matched rows) claim
      // is visible above parquet's fixed footer overhead
      (1L to 3000L).map(i => (i, s"r$i", s"pad-$i-" * 40)).toDF("id", "x", "pad")
        .repartitionByRange(3, col("id")).sortWithinPartitions("id"),
      root)
  }

  test("mor update == cow update, with O(matched rows) bytes written") {
    val rootM = freshRoot(); val rootC = freshRoot()
    seed(rootM); seed(rootC)
    val pred = col("id") % 100 === 7 // 10 rows per file: touches all 3 files
    val set = Map("x" -> lit("hit"))
    val vM = VersionedTable.updateWhere(spark, rootM, pred, set, mor = true)
    val vC = VersionedTable.updateWhere(spark, rootC, pred, set)
    val gotM = VersionedTable.read(spark, rootM).orderBy("id").collect().toSeq
    val gotC = VersionedTable.read(spark, rootC).orderBy("id").collect().toSeq
    assert(gotM == gotC)
    assert(gotM.size == 3000)
    assert(gotM.count(_.getString(1) == "hit") == 30)
    assert(VersionedTable.hasDeletionVectors(spark, rootM, vM))
    // COW rewrote all three admitting files; MOR wrote three rows
    assert(ownBytes(rootM, vM) < ownBytes(rootC, vC) / 2,
      s"mor wrote ${ownBytes(rootM, vM)} vs cow ${ownBytes(rootC, vC)}")
    // time travel still sees the pre-update values
    assert(VersionedTable.readVersion(spark, rootM, 1L)
      .where(col("x") === "hit").count() == 0)
  }

  test("mor updates compose: the second update masks the replacement, not the original") {
    val root = freshRoot()
    seed(root)
    VersionedTable.updateWhere(spark, root, col("id") === 7L,
      Map("x" -> lit("v1")), mor = true)
    VersionedTable.updateWhere(spark, root, col("id") === 7L,
      Map("x" -> lit("v2")), mor = true)
    val rows = VersionedTable.read(spark, root)
    assert(rows.count() == 3000, "an update must never change the row count")
    val got = rows.where(col("id") === 7L).select("x").collect().map(_.getString(0))
    assert(got.toSeq == Seq("v2"), s"expected exactly one live copy, got ${got.toSeq}")
  }

  test("mor update then mor delete: the replacement row is deletable") {
    val root = freshRoot()
    seed(root)
    VersionedTable.updateWhere(spark, root, col("id") === 42L,
      Map("x" -> lit("doomed")), mor = true)
    VersionedTable.deleteWhere(spark, root, col("x") === "doomed", mor = true)
    val rows = VersionedTable.read(spark, root)
    assert(rows.count() == 2999)
    assert(rows.where(col("id") === 42L).count() == 0)
  }

  test("change feed carries pre/post images; no-ops publish nothing; typos throw") {
    val root = freshRoot()
    seed(root)
    val v = VersionedTable.updateWhere(spark, root, col("id") === 9L,
      Map("x" -> lit("updated")), mor = true)
    val feed = VersionedTable.readChanges(spark, root, v, v)
    val byType = feed.collect().map(r =>
      r.getAs[String]("_change_type") -> r.getAs[String]("x")).toMap
    assert(byType == Map("update_preimage" -> "r9", "update_postimage" -> "updated"))
    // no row matches → current version unchanged
    assert(VersionedTable.updateWhere(spark, root, col("id") === -1L,
      Map("x" -> lit("z")), mor = true) == v)
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, col("id") === 9L,
        Map("nope" -> lit(0)), mor = true)
    }
  }

  test("compact folds masks and small update files; stats re-enable") {
    val root = freshRoot()
    seed(root)
    VersionedTable.updateWhere(spark, root, col("id") <= 10L,
      Map("x" -> lit("u")), mor = true)
    val before = VersionedTable.read(spark, root).orderBy("id").collect().toSeq
    val vc = VersionedTable.compact(spark, root)
    assert(!VersionedTable.hasDeletionVectors(spark, root, vc))
    assert(VersionedTable.read(spark, root).orderBy("id").collect().toSeq == before)
    assert(VersionedTable.statsAggregate(spark, root, Seq("id"))
      .exists(_._1 == 3000L))
  }
}
