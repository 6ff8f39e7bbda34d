package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Table maintenance: small-file compaction and sort-order optimize —
  * fewer files opened / files actually prunable, data identical, old
  * layout time-travelable. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"

  private def nDataFiles(root: String, v: Long): Int = {
    val dir = new org.apache.hadoop.fs.Path(root, f"v$v%08d")
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(dir).count(s => s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
  }

  test("compact folds a fragmented snapshot into few files, data identical") {
    val root = freshRoot()
    // 64 tiny files — the shape 64 hourly micro-commits leave behind
    val v1 = VersionedTable.commit(
      spark.range(0, 400).toDF("id").repartition(64), root)
    assert(nDataFiles(root, v1) == 64)
    val v2 = VersionedTable.compact(spark, root) // default target ≫ table size
    assert(nDataFiles(root, v2) == 1)
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq
      == (0L until 400L))
    // fragmented history still time-travels until vacuum
    assert(VersionedTable.readVersion(spark, root, v1).count() == 400)
  }

  test("compact honors the byte target when it implies multiple files") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(0, 4000).toDF("id")
        .withColumn("pad", lpad($"id".cast("string"), 100, "x"))
        .repartition(32), root)
    val perFile = {
      val dir = new org.apache.hadoop.fs.Path(root, "v00000001")
      val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum / 4
    }
    val v2 = VersionedTable.compact(spark, root, targetFileBytes = perFile)
    val n = nDataFiles(root, v2)
    assert(n >= 2 && n <= 8, s"expected ~4 files, got $n")
    assert(VersionedTable.read(spark, root).count() == 4000)
  }

  test("optimize makes range predicates prune; write-order layout cannot") {
    val root = freshRoot()
    // write-order layout: ids striped round-robin, every file spans the
    // full id range → min/max stats cover everything, nothing prunes
    VersionedTable.commit(
      spark.range(0, 4000).toDF("id")
        .withColumn("pad", lpad($"id".cast("string"), 100, "x"))
        .repartition(4), root)
    val v1 = VersionedTable.currentVersion(spark, root).get
    val pred = $"id" >= 3500L
    val (keptBefore, totalBefore) = VersionedTable.prunedFiles(spark, root, v1, pred)
    assert(totalBefore == 4 && keptBefore.size == 4, "striped layout should not prune")

    // cluster on id at the same file count, then the range opens one file
    val perFileBytes = {
      val dir = new org.apache.hadoop.fs.Path(root, f"v$v1%08d")
      val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum / 4
    }
    val v2 = VersionedTable.optimize(spark, root, Seq("id"), targetFileBytes = perFileBytes)
    val (keptAfter, totalAfter) = VersionedTable.prunedFiles(spark, root, v2, pred)
    assert(totalAfter >= 2, s"optimize should keep multiple files, got $totalAfter")
    assert(keptAfter.size < totalAfter,
      s"clustered layout must prune: kept ${keptAfter.size} of $totalAfter")
    // and the pruned read is still exactly the filtered table
    assert(VersionedTable.readWhere(spark, root, pred).select("id").as[Long]
      .collect().sorted.toSeq == (3500L until 4000L))
  }
}
