package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-level data skipping on the versioned table: fewer files OPENED
  * (the runtime metric, via [[VersionedTable.prunedFiles]]), results
  * byte-identical to the unpruned scan. */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_skip").toString + "/t"

  // 400 rows range-partitioned into 4 files of disjoint id ranges, with a
  // string label, a timestamp, and a nullable col that is null only in
  // the low-id file
  private def table(root: String): Unit = {
    val df = spark.range(0, 400).toDF("id")
      .withColumn("label", concat(lit("k"), format_string("%03d", $"id")))
      .withColumn("ts", timestamp_seconds(
        unix_timestamp(to_timestamp(lit("2024-01-01 00:00:00"))) + $"id" * 3600L))
      .withColumn("maybe", when($"id" >= 100, $"id"))
      .repartitionByRange(4, $"id")
    VersionedTable.commit(df, root)
  }

  test("equality and range predicates prune to the one matching file") {
    val root = freshRoot(); table(root)
    val v = VersionedTable.currentVersion(spark, root).get
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v, $"id" === 250L)
    assert(total == 4 && kept.size == 1)
    val (kept2, _) = VersionedTable.prunedFiles(spark, root, v, $"id" >= 300L)
    assert(kept2.size == 1)
    val (kept3, _) =
      VersionedTable.prunedFiles(spark, root, v, $"id" > 150L && $"id" < 250L)
    assert(kept3.size == 2)
  }

  test("pruned read returns exactly the unpruned result") {
    val root = freshRoot(); table(root)
    for (pred <- Seq($"id" === 250L, $"id" > 150L && $"id" < 250L,
        $"label" === "k042", $"label".startsWith("k39"),
        $"ts" < to_timestamp(lit("2024-01-03 00:00:00")),
        $"maybe".isNull, $"id" % 7 === 0)) {
      val pruned = VersionedTable.readWhere(spark, root, pred)
        .orderBy("id").collect().map(_.toSeq).toSeq
      val full = VersionedTable.read(spark, root).where(pred)
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(pruned == full, s"mismatch for $pred")
    }
  }

  test("string, timestamp, and null-count stats all prune files") {
    val root = freshRoot(); table(root)
    val v = VersionedTable.currentVersion(spark, root).get
    val (k1, _) = VersionedTable.prunedFiles(spark, root, v, $"label" === "k042")
    assert(k1.size == 1)
    val (k2, _) = VersionedTable.prunedFiles(spark, root, v,
      $"ts" < to_timestamp(lit("2024-01-03 00:00:00"))) // first 48 hours
    assert(k2.size == 1)
    // `maybe` is null only for id < 100 → IS NULL prunes the other files
    val (k3, _) = VersionedTable.prunedFiles(spark, root, v, $"maybe".isNull)
    assert(k3.size == 1)
    val (k4, _) = VersionedTable.prunedFiles(spark, root, v,
      $"id".isin(42L, 43L, 44L))
    assert(k4.size == 1)
  }

  test("a predicate refuted by every file scans nothing and keeps the schema") {
    val root = freshRoot(); table(root)
    val res = VersionedTable.readWhere(spark, root, $"id" === 10000L)
    assert(res.count() == 0)
    assert(res.columns.toSeq == Seq("id", "label", "ts", "maybe"))
  }

  test("unsupported predicates and stat-less snapshots fall back to full scan") {
    val root = freshRoot(); table(root)
    val v = VersionedTable.currentVersion(spark, root).get
    // modulo is not a prunable shape → all files kept, result still right
    val (k1, t1) = VersionedTable.prunedFiles(spark, root, v, $"id" % 7 === 0)
    assert(k1.size == t1)
    // snapshot committed without stats → no pruning, readWhere still works
    val root2 = freshRoot()
    VersionedTable.commit(
      spark.range(0, 100).toDF("id").repartitionByRange(4, $"id"),
      root2, collectStats = false)
    val v2 = VersionedTable.currentVersion(spark, root2).get
    val (k2, t2) = VersionedTable.prunedFiles(spark, root2, v2, $"id" === 5L)
    assert(k2.size == t2 && t2 == 4)
    assert(VersionedTable.readWhere(spark, root2, $"id" === 5L).count() == 1)
  }

  test("statsAggregate answers count/min/max from metadata, equal to the scan") {
    val root = freshRoot(); table(root)
    val scan = VersionedTable.read(spark, root)
      .agg(count(lit(1)), count($"maybe"), min($"id"), max($"id"),
        min($"label"), max($"label"), min($"ts"), max($"ts"))
      .collect()(0)
    val Some((rows, stats)) =
      VersionedTable.statsAggregate(spark, root, Seq("id", "label", "ts", "maybe"))
    val byCol = stats.map(s => s.column -> s).toMap
    assert(rows == scan.getLong(0))
    assert(byCol("maybe").nonNulls == scan.getLong(1))
    assert(byCol("maybe").rows == rows)
    assert(byCol("id").min == scan.getLong(2) && byCol("id").max == scan.getLong(3))
    assert(byCol("label").min == scan.getString(4) && byCol("label").max == scan.getString(5))
    // timestamps surface in the canonical stats form: epoch micros
    assert(byCol("ts").kind == "long")
    assert(byCol("ts").min == scan.getTimestamp(6).getTime * 1000L)
    assert(byCol("ts").max == scan.getTimestamp(7).getTime * 1000L)
  }

  test("statsAggregate opens no data file: answers survive corrupted data") {
    val root = freshRoot(); table(root)
    val before = VersionedTable.statsAggregate(spark, root, Seq("id", "maybe"))
    // clobber every data file in place — any code path that opens one now
    // throws; the stats answers must be unaffected because they never did
    val v = VersionedTable.currentVersion(spark, root).get
    val dir = java.nio.file.Paths.get(root, f"v$v%08d")
    java.nio.file.Files.list(dir).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        java.nio.file.Files.write(p, "not parquet".getBytes)
    }
    assert(VersionedTable.statsAggregate(spark, root, Seq("id", "maybe")) == before)
    assert(before.get._1 == 400L)
  }

  test("statsAggregate refuses rather than guesses: stat-less and unknown cols") {
    val root = freshRoot()
    VersionedTable.commit(
      spark.range(0, 100).toDF("id").repartitionByRange(2, $"id"),
      root, collectStats = false)
    assert(VersionedTable.statsAggregate(spark, root, Seq("id")).isEmpty)
    val root2 = freshRoot(); table(root2)
    assert(VersionedTable.statsAggregate(spark, root2, Seq("no_such")).isEmpty)
    // all-null column in SOME file is fine (min/max fold skips it); the
    // empty requested-column list still answers count(*)
    assert(VersionedTable.statsAggregate(spark, root2, Nil).map(_._1).contains(400L))
  }

  test("a wide commit takes the DISTRIBUTED footer path and stats stay exact") {
    // 24 files > the 16-file driver budget → footers are read by a Spark
    // job, not a driver loop; everything downstream (coverage, pruning,
    // metadata aggregates) must be indistinguishable from the driver path
    val root = freshRoot()
    val df = spark.range(0, 2400).toDF("id")
      .withColumn("label", concat(lit("k"), format_string("%04d", $"id")))
      .repartitionByRange(24, $"id")
    VersionedTable.commit(df, root)
    val v = VersionedTable.currentVersion(spark, root).get
    val stats = TableStats.load(spark,
      new org.apache.hadoop.fs.Path(s"$root/v${"%08d".format(v)}/_stats"))
    assert(stats.size == 24, s"stats cover ${stats.size} of 24 files")
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v, $"id" === 1200L)
    assert(total == 24 && kept.size == 1)
    val Some((rows, cs)) = VersionedTable.statsAggregate(spark, root, Seq("id"))
    assert(rows == 2400L && cs.head.min == 0L && cs.head.max == 2399L)
    assert(VersionedTable.readWhere(spark, root, $"id" === 1200L).count() == 1)
  }

  test("stats travel with the version: vacuum removes them, time travel keeps them") {
    val root = freshRoot(); table(root)
    VersionedTable.commit(spark.range(0, 10).toDF("id")
      .withColumn("label", lit("x")).withColumn("ts", current_timestamp())
      .withColumn("maybe", $"id"), root)
    // old version still prunes
    val (k1, t1) = VersionedTable.prunedFiles(spark, root, 1L, $"id" === 250L)
    assert(k1.size == 1 && t1 == 4)
    VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(VersionedTable.versions(spark, root) == Seq(2L))
  }
}
