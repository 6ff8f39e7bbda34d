package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-granular copy-on-write merge: only files whose key range admits a
  * staging key are rewritten; everything else rides the manifest by
  * reference. Results, change feed, skipping, and vacuum must all agree
  * with the full-rewrite path. */
class CowMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_cow").toString + "/t"

  private val ts0 = lit("2024-06-01 00:00:00").cast("timestamp")
  private val ts1 = lit("2024-06-02 00:00:00").cast("timestamp")

  /** A clustered 4-file table of 400 keys via the full upsert + optimize. */
  private def seed(root: String): Unit = {
    val staging = spark.range(0, 400).toDF("id")
      .withColumn("last_status", lit("OPEN"))
      .withColumn("created_at", ts0)
      .withColumn("payload", concat(lit("p"), $"id"))
    Sinks.upsertByKeyVersioned(spark, root, staging, "id", ts0, "last_status", "DONE")
    VersionedTable.optimize(spark, root, Seq("id"),
      targetFileBytes = dataBytes(root) / 4)
  }

  private def dataBytes(root: String): Long = {
    val v = VersionedTable.currentVersion(spark, root).get
    val dir = new org.apache.hadoop.fs.Path(root, f"v$v%08d")
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(dir).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
  }

  private def delta(ids: Seq[Long], status: String) =
    ids.toDF("id")
      .withColumn("last_status", lit(status))
      .withColumn("created_at", ts0)
      .withColumn("payload", concat(lit("q"), $"id"))

  test("cow merge rewrites only the touched file and matches the full rewrite") {
    val rootCow = freshRoot(); seed(rootCow)
    val rootFull = freshRoot(); seed(rootFull)
    // a delta confined to the low-key file of the 4-file clustered layout
    val d = delta(Seq(3L, 7L, 20L), "DONE")

    val vC = Sinks.upsertByKeyVersionedCow(spark, rootCow, d, "id", ts1, "last_status", "DONE")
    val vF = Sinks.upsertByKeyVersioned(spark, rootFull, d, "id", ts1, "last_status", "DONE")

    def rows(root: String) = VersionedTable.read(spark, root)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(rows(rootCow) == rows(rootFull))

    // the snapshot is a manifest: 3 of 4 old files referenced, not copied
    val refs = VersionedTable.manifestOf(spark, rootCow, vC).get
    val prevDir = f"v${vC - 1}%08d/"
    assert(refs.count(_.startsWith(prevDir)) == 3,
      s"expected 3 referenced old files, got: $refs")
    assert(refs.size >= 4) // plus at least one fresh file
    // and the change feeds agree row-for-row
    val fc = VersionedTable.readChanges(spark, rootCow, vC, vC)
      .drop("_commit_version").orderBy("id", "_change_type").collect().map(_.toSeq).toSeq
    val ff = VersionedTable.readChanges(spark, rootFull, vF, vF)
      .drop("_commit_version").orderBy("id", "_change_type").collect().map(_.toSeq).toSeq
    assert(fc == ff && fc.nonEmpty)
  }

  test("data skipping keeps working on the manifest snapshot (stats carried forward)") {
    val root = freshRoot(); seed(root)
    Sinks.upsertByKeyVersionedCow(spark, root,
      delta(Seq(3L), "OPEN"), "id", ts1, "last_status", "DONE")
    val v = VersionedTable.currentVersion(spark, root).get
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v, $"id" === 390L)
    assert(total >= 4 && kept.size == 1,
      s"carried stats must still prune: kept ${kept.size} of $total")
    assert(VersionedTable.readWhere(spark, root, $"id" === 390L)
      .select("payload").as[String].collect().toSeq == Seq("p390"))
  }

  test("vacuum keeps files a retained manifest references, drops the rest") {
    val root = freshRoot(); seed(root)
    Sinks.upsertByKeyVersionedCow(spark, root,
      delta(Seq(3L), "OPEN"), "id", ts1, "last_status", "DONE")
    val before = VersionedTable.read(spark, root).orderBy("id")
      .collect().map(_.toSeq).toSeq
    val dropped = VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(dropped.nonEmpty)
    // the dropped versions are unreadable as versions...
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, root, dropped.last)
    }
    // ...but the retained manifest snapshot still reads in full
    assert(VersionedTable.read(spark, root).orderBy("id")
      .collect().map(_.toSeq).toSeq == before)
  }

  test("write-order layout: kept-by-reference files never contain a staged key") {
    val root = freshRoot()
    val staging = spark.range(0, 400).toDF("id")
      .withColumn("last_status", lit("OPEN"))
      .withColumn("created_at", ts0)
      .withColumn("payload", concat(lit("p"), $"id"))
      .repartition(4) // striped: files span (nearly) the whole key range
    Sinks.upsertByKeyVersioned(spark, root, staging, "id", ts0, "last_status", "DONE")
    val staged = Seq(3L, 200L, 396L) // spread across the range
    val v = Sinks.upsertByKeyVersionedCow(spark, root,
      delta(staged, "DONE"), "id", ts1, "last_status", "DONE")
    // THE invariant: any file carried by reference admits no staged key —
    // on this layout that usually means most files were rewritten (the
    // documented degradation), but whatever survives must be disjoint
    // from the delta
    val prevRefs = VersionedTable.manifestOf(spark, root, v)
      .map(_.filter(_.startsWith(f"v${v - 1}%08d/"))).getOrElse(Nil)
    prevRefs.foreach { r =>
      val ids = spark.read.parquet(
        new org.apache.hadoop.fs.Path(root, r).toString)
        .select("id").as[Long].collect().toSet
      assert(staged.forall(k => !ids(k)), s"referenced file $r contains a staged key")
    }
    val out = VersionedTable.read(spark, root)
    assert(out.count() == 400)
    assert(out.filter($"id".isin(staged: _*))
      .collect().forall(_.getAs[Any]("deleted_at") != null))
    assert(out.filter($"id" === 4L).collect()(0).getAs[Any]("deleted_at") == null)
  }

  /** Four exact-range files over ids 1..400 via commit + 3 appends
    * (repartitionByRange samples boundaries; appends pin them). */
  private def seedRanged(root: String): Seq[String] = {
    def slice(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"r$i", i * 10)).toDF("id", "x", "amount")
        .coalesce(1)
    VersionedTable.commit(slice(1, 100), root)
    VersionedTable.commitAppend(slice(101, 200), root)
    VersionedTable.commitAppend(slice(201, 300), root)
    VersionedTable.commitAppend(slice(301, 400), root)
    val v = VersionedTable.currentVersion(spark, root).get
    val refs = VersionedTable.dataFileRefs(spark, root, v)
    assert(refs.size == 4, s"seed expected 4 data files, got $refs")
    refs
  }

  test("NMBS merge: stats-prunable conditions keep the COW road — " +
    "files admitting neither an ON match nor an NMBS condition ride by reference") {
    val root = freshRoot()
    val baseRefs = seedRanged(root)
    // source confined to the low-key file; NMBS delete to the top file,
    // NMBS update to the third — the second file (ids 101..200) is
    // provably untouched and must carry by manifest reference
    Seq((3L, "upd", 33L), (7L, "upd", 77L)).toDF("id", "x", "amount")
      .createOrReplaceTempView("nmbs_cow_src")
    val v = graft.plans.GraftSql.execute(spark,
      s"""MERGE INTO `$root` t USING nmbs_cow_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET x = s.x
         |WHEN NOT MATCHED BY SOURCE AND t.id > 300 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.id > 200 THEN UPDATE SET x = 'swept'
         |""".stripMargin).collect().head.getLong(2)
    val mf = VersionedTable.manifestOf(spark, root, v).get
    assert(mf.count(baseRefs.contains) == 1,
      s"expected exactly the ids-101..200 file carried by reference, got: " +
        mf.filter(baseRefs.contains).mkString(", "))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 300) // 400 - 100 NMBS-deleted
    assert(got.filter($"id" === 3L).select("x").as[String].head() == "upd")
    assert(got.filter($"id" === 150L).select("x").as[String].head() == "r150")
    assert(got.filter($"id" === 250L).select("x").as[String].head() == "swept")
    assert(got.filter($"id" > 300).isEmpty)
    // the feed carries the NMBS fates like any merge
    val feed = VersionedTable.readChanges(spark, root, v, v)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed == Map("update_preimage" -> 102L, "update_postimage" -> 102L,
      "delete" -> 100L), s"feed: $feed")
  }

  test("NMBS merge: pure sweep (no matched/insert actions) skips detection " +
    "and touches only stats-admitting files") {
    val root = freshRoot()
    val baseRefs = seedRanged(root)
    // the source's keys overlap EVERY file — with no matched or insert
    // action the detection join is unnecessary and must not widen the
    // rewrite beyond the one file the NMBS condition admits
    Seq(50L, 150L, 250L, 350L).toDF("id")
      .createOrReplaceTempView("nmbs_sweep_src")
    val v = graft.plans.GraftSql.execute(spark,
      s"""MERGE INTO `$root` t USING nmbs_sweep_src s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND t.id <= 100 THEN DELETE
         |""".stripMargin).collect().head.getLong(2)
    val mf = VersionedTable.manifestOf(spark, root, v).get
    assert(mf.count(baseRefs.contains) == 3,
      s"expected the three non-admitting files carried, got: " +
        mf.filter(baseRefs.contains).mkString(", "))
    val got = VersionedTable.read(spark, root)
    // ids 1..100 deleted EXCEPT the source-matched 50
    assert(got.count() == 301)
    assert(got.filter($"id" === 50L).count() == 1)
    assert(got.filter($"id" === 99L).isEmpty)
  }

  test("NMBS merge: an unconditioned action takes the full-rewrite road, " +
    "same answer") {
    val root = freshRoot()
    seedRanged(root)
    Seq((3L, "upd", 33L)).toDF("id", "x", "amount")
      .createOrReplaceTempView("nmbs_full_src")
    graft.plans.GraftSql.execute(spark,
      s"""MERGE INTO `$root` t USING nmbs_full_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET x = s.x
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET x = 'all'
         |""".stripMargin)
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 400)
    assert(got.filter($"x" === "all").count() == 399)
    assert(got.filter($"id" === 3L).select("x").as[String].head() == "upd")
  }

  test("schema evolution falls back to the full-rewrite path") {
    val root = freshRoot(); seed(root)
    val evolving = delta(Seq(3L), "OPEN").withColumn("channel", lit("web"))
    val v = Sinks.upsertByKeyVersionedCow(spark, root,
      evolving, "id", ts1, "last_status", "DONE")
    assert(VersionedTable.manifestOf(spark, root, v).isEmpty) // plain snapshot
    val snap = VersionedTable.read(spark, root)
    assert(snap.columns.contains("channel"))
    assert(snap.filter($"id" === 3L).select("channel").as[String]
      .collect().toSeq == Seq("web"))
    assert(snap.filter($"id" === 4L).select("channel").collect()(0).isNullAt(0))
  }
}
