package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom-filter file skipping: point lookups on an UNCLUSTERED column —
  * where every file's min/max range admits the value and stats pruning is
  * powerless — prune via the per-file parquet bloom filters written by
  * `commit(bloomCols = ...)`. Conservative everywhere: no bloom, no
  * pruning, never a wrong result. */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/t"

  // 4 striped files: labels are spread round-robin, so every file's
  // [min,max] label range covers (almost) the whole domain
  private def table(root: String, bloom: Boolean): Unit = {
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("label", concat(lit("u"), format_string("%05d", $"id")))
      .repartition(4)
    VersionedTable.commit(df, root,
      bloomCols = if (bloom) Seq("label", "id") else Nil)
  }

  test("point lookup on an unclustered column prunes via blooms") {
    val root = freshRoot(); table(root, bloom = true)
    val v = VersionedTable.currentVersion(spark, root).get
    // the label lives in exactly one of the 4 striped files; min/max alone
    // cannot know which — the bloom can
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v, $"label" === "u02500")
    assert(total == 4 && kept.size <= 2,
      s"bloom should prune most striped files, kept ${kept.size} of $total")
    assert(VersionedTable.readWhere(spark, root, $"label" === "u02500")
      .select("id").as[Long].collect().toSeq == Seq(2500L))
    // IN over a small set: keep exactly the files that may hold any member
    val (keptIn, _) = VersionedTable.prunedFiles(spark, root, v,
      $"id".isin(10L, 20L, 30L))
    assert(keptIn.size <= 3)
    assert(VersionedTable.readWhere(spark, root, $"id".isin(10L, 20L, 30L))
      .count() == 3)
  }

  test("a value absent from the table prunes every file") {
    val root = freshRoot(); table(root, bloom = true)
    val v = VersionedTable.currentVersion(spark, root).get
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v,
      $"label" === "zzz-not-there")
    assert(total == 4 && kept.isEmpty)
    val res = VersionedTable.readWhere(spark, root, $"label" === "zzz-not-there")
    assert(res.count() == 0)
    assert(res.columns.toSeq == Seq("id", "label"))
  }

  test("bloom-less snapshots keep every file and stay correct") {
    val root = freshRoot(); table(root, bloom = false)
    val v = VersionedTable.currentVersion(spark, root).get
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v, $"label" === "u02500")
    assert(total == 4 && kept.size == 4) // conservative: nothing to probe
    assert(VersionedTable.readWhere(spark, root, $"label" === "u02500")
      .select("id").as[Long].collect().toSeq == Seq(2500L))
  }

  test("a wide snapshot probes blooms DISTRIBUTED and prunes identically") {
    // 40 striped files > the 32-file driver budget → the probe loop runs
    // as a Spark job; pruning decisions and results must be exactly the
    // driver path's. This is the worst case the budget exists for: an
    // unclustered point lookup where min/max keeps ALL files
    val root = freshRoot()
    val df = spark.range(0, 8000).toDF("id")
      .withColumn("label", concat(lit("u"), format_string("%05d", $"id")))
      .repartition(40)
    VersionedTable.commit(df, root, bloomCols = Seq("label"))
    val v = VersionedTable.currentVersion(spark, root).get
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v, $"label" === "u02500")
    assert(total == 40 && kept.size < 8,
      s"bloom should prune most striped files, kept ${kept.size} of $total")
    assert(VersionedTable.readWhere(spark, root, $"label" === "u02500")
      .select("id").as[Long].collect().toSeq == Seq(2500L))
    val (keptNone, _) = VersionedTable.prunedFiles(spark, root, v,
      $"label" === "zzz-not-there")
    assert(keptNone.isEmpty)
  }

  test("blooms compose with min/max: range prunes first, bloom refines") {
    val root = freshRoot()
    // clustered on id, bloom on label: an id-range + label-point query
    // prunes by range to one file, then the bloom check still applies
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("label", concat(lit("u"), format_string("%05d", $"id")))
      .repartitionByRange(4, $"id").sortWithinPartitions("id")
    VersionedTable.commit(df, root, bloomCols = Seq("label"))
    val v = VersionedTable.currentVersion(spark, root).get
    // label u00100 lives in the low-id file; an id range in the HIGH file
    // plus that label is unsatisfiable — both pruners agree on 0 files
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v,
      $"id" >= 3500L && $"label" === "u00100")
    assert(total == 4 && kept.isEmpty)
    // and a consistent query keeps exactly the one file both admit
    val (kept2, _) = VersionedTable.prunedFiles(spark, root, v,
      $"id" >= 3500L && $"label" === "u03900")
    assert(kept2.size == 1)
    assert(VersionedTable.readWhere(spark, root,
      $"id" >= 3500L && $"label" === "u03900").count() == 1)
  }
}
