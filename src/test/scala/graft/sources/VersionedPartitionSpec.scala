package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition spec on the versioned format: Hive-style `__p_<col>=<val>/`
  * leaf dirs (write-layout duplicates — data files keep every real
  * column), recorded as the `graft.partitionBy` table property and
  * carried by every commit path. Gives: manifest-level partition pruning
  * (no stats table needed), metadata-only `DELETE WHERE <partition-pred>`
  * (the date-retention verb — 0 data bytes written), and dynamic
  * partition overwrite (the hourly-reload verb). */
class VersionedPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"

  private def fsOf(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Bytes of data files physically inside version `v`'s own dir
    * (recursive — partition subdirs included). */
  private def ownDataBytes(root: String, v: Long): Long = {
    val f = fsOf(root)
    def walk(d: org.apache.hadoop.fs.Path): Long =
      if (!f.exists(d)) 0L
      else f.listStatus(d).map { s =>
        val n = s.getPath.getName
        if (s.isDirectory && !n.startsWith("_") && !n.startsWith(".")) walk(s.getPath)
        else if (n.startsWith("part-") && n.endsWith(".parquet")) s.getLen
        else 0L
      }.sum
    walk(new org.apache.hadoop.fs.Path(root, f"v$v%08d"))
  }

  /** 3 dates x 100 rows, committed partitioned by `d`. */
  private def seed(root: String, collectStats: Boolean = true): Unit = {
    val df = (1 to 300).map { i =>
      (i.toLong, s"2024-01-0${(i - 1) % 3 + 1}", s"r$i")
    }.toDF("id", "ds", "x").withColumn("d", col("ds").cast("date")).drop("ds")
    VersionedTable.commit(df, root, collectStats = collectStats,
      partitionBy = Seq("d"))
  }

  test("partitioned commit: hive leaves, complete data files, reads round-trip") {
    val root = freshRoot()
    seed(root)
    val refs = VersionedTable.dataFileRefs(spark, root, 1L)
    assert(refs.nonEmpty && refs.forall(_.contains("p__d=")), refs.mkString(","))
    assert(refs.map(r => r.split('/')(1)).toSet ==
      Set("p__d=2024-01-01", "p__d=2024-01-02", "p__d=2024-01-03"))
    // data files are COMPLETE: the partition column is in the file too
    val one = spark.read.parquet(
      new org.apache.hadoop.fs.Path(root, refs.head).toString)
    assert(one.columns.toSet == Set("id", "d", "x"))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 300)
    assert(got.columns.toSet == Set("id", "d", "x"))
    // appends inherit the layout with no partitionBy argument
    val extra = Seq((301L, "2024-01-04", "r301")).toDF("id", "ds", "x")
      .withColumn("d", col("ds").cast("date")).drop("ds")
      .select("id", "x", "d").select("id", "d", "x")
    VersionedTable.commitAppend(extra, root)
    val v2 = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.dataFileRefs(spark, root, v2)
      .exists(_.contains("p__d=2024-01-04")))
    assert(VersionedTable.read(spark, root).count() == 301)
  }

  test("partition pruning works from refs alone (no stats table)") {
    val root = freshRoot()
    seed(root, collectStats = false)
    // the layout writes one file per (task, tuple): 4 tasks x 3 dates
    val (kept, total) = VersionedTable.prunedFiles(spark, root, 1L,
      col("d") === lit("2024-01-02").cast("date"))
    assert(kept.nonEmpty && kept.size < total,
      s"kept=${kept.size} of $total")
    assert(kept.forall(_.contains("p__d=2024-01-02")),
      "a non-matching partition's file was opened")
    // range predicate on the partition column
    val (kept2, _) = VersionedTable.prunedFiles(spark, root, 1L,
      col("d") < lit("2024-01-03").cast("date"))
    assert(kept2.nonEmpty && kept2.forall(!_.contains("p__d=2024-01-03")))
    // row-level results stay exact
    assert(VersionedTable.readWhere(spark, root,
      col("d") === lit("2024-01-02").cast("date")).count() == 100)
  }

  test("DELETE WHERE on the partition column is metadata-only (0 data bytes)") {
    val root = freshRoot()
    seed(root)
    val before = VersionedTable.read(spark, root)
      .where(col("d") >= lit("2024-01-02").cast("date"))
      .orderBy("id").collect().toSeq
    val v = VersionedTable.deleteWhere(spark, root,
      col("d") < lit("2024-01-02").cast("date"))
    assert(ownDataBytes(root, v) == 0L,
      s"partition-retention delete wrote ${ownDataBytes(root, v)} data bytes")
    assert(VersionedTable.read(spark, root).orderBy("id").collect().toSeq == before)
    assert(VersionedTable.read(spark, root).count() == 200)
    // the dropped partition's bytes still live in v1 (time travel intact)
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 300)
    // change feed carries the deleted rows
    val feed = VersionedTable.readChanges(spark, root, v, v)
    assert(feed.where(col("_change_type") === "delete").count() == 100)
    // a non-partition predicate falls back to the row-level path, exactly
    val v2 = VersionedTable.deleteWhere(spark, root, col("id") === 2L)
    assert(VersionedTable.read(spark, root).count() == 199)
    assert(ownDataBytes(root, v2) > 0L) // a rewrite, not a metadata drop
  }

  test("no-op and all-drop partition deletes behave") {
    val root = freshRoot()
    seed(root)
    val v1 = VersionedTable.currentVersion(spark, root).get
    // provably nothing matches: no new version
    assert(VersionedTable.deleteWhere(spark, root,
      col("d") > lit("2030-01-01").cast("date")) == v1)
    // drop everything: table reads empty, still schema'd
    val v = VersionedTable.deleteWhere(spark, root,
      col("d") <= lit("2030-01-01").cast("date"))
    assert(v > v1 && ownDataBytes(root, v) == 0L)
    assert(VersionedTable.read(spark, root).count() == 0)
    assert(VersionedTable.read(spark, root).columns.toSet == Set("id", "d", "x"))
  }

  test("dynamic partition overwrite replaces exactly the touched tuples") {
    val root = freshRoot()
    seed(root)
    val repl = (1 to 5).map(i =>
      (1000L + i, "2024-01-02", s"new$i")).toDF("id", "ds", "x")
      .withColumn("d", col("ds").cast("date")).drop("ds")
      .select("id", "d", "x")
    val v = VersionedTable.overwritePartitions(spark, root, repl)
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 205) // 100 + 5 + 100
    assert(got.where(col("d") === lit("2024-01-02").cast("date")).count() == 5)
    // untouched partitions ride by reference (their refs point at v1)
    val refs = VersionedTable.dataFileRefs(spark, root, v)
    assert(refs.exists(r => r.startsWith("v00000001/") &&
      r.contains("p__d=2024-01-01")))
    assert(!refs.exists(r => r.startsWith("v00000001/") &&
      r.contains("p__d=2024-01-02")))
    // feed: 100 deletes (replaced partition) + 5 inserts
    val feed = VersionedTable.readChanges(spark, root, v, v)
    assert(feed.where(col("_change_type") === "delete").count() == 100)
    assert(feed.where(col("_change_type") === "insert").count() == 5)
  }

  test("compact preserves the layout; metadata drops keep working after it") {
    val root = freshRoot()
    seed(root)
    VersionedTable.commitAppend((1 to 30).map(i =>
      (2000L + i, java.sql.Date.valueOf("2024-01-0" + (i % 3 + 1)), s"a$i"))
      .toDF("id", "d", "x"), root)
    val vc = VersionedTable.compact(spark, root)
    val refs = VersionedTable.dataFileRefs(spark, root, vc)
    assert(refs.nonEmpty && refs.forall(_.contains("p__d=")),
      s"compaction broke the partition layout: ${refs.take(3).mkString(",")}")
    assert(VersionedTable.read(spark, root).count() == 330)
    val vd = VersionedTable.deleteWhere(spark, root,
      col("d") === lit("2024-01-03").cast("date"))
    assert(ownDataBytes(root, vd) == 0L, "post-compact drop was not metadata-only")
    assert(VersionedTable.read(spark, root).count() == 220)
  }

  test("spec is immutable: repartition/unset/drop-column refused; rename follows") {
    val root = freshRoot()
    seed(root)
    intercept[IllegalArgumentException] {
      VersionedTable.commit((1 to 3).map(i => (i.toLong,
        java.sql.Date.valueOf("2024-02-01"), "y")).toDF("id", "d", "x"),
        root, partitionBy = Seq("x"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.unsetProperties(spark, root,
        Seq(VersionedTable.PartitionByProp))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.setProperties(spark, root,
        Map(VersionedTable.PartitionByProp -> "x"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "d")
    }
    // rename: the spec follows the logical name; pruning + metadata drop
    // still work (dir segments resolve through the column mapping)
    VersionedTable.renameColumn(spark, root, "d", "load_date")
    val cur = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.partitionColumnsOf(spark, root, cur) == Seq("load_date"))
    val (kept, total) = VersionedTable.prunedFiles(spark, root, cur,
      col("load_date") === lit("2024-01-02").cast("date"))
    assert(kept.nonEmpty && kept.size < total &&
      kept.forall(_.contains("p__d=2024-01-02")))
    val vd = VersionedTable.deleteWhere(spark, root,
      col("load_date") === lit("2024-01-01").cast("date"))
    assert(ownDataBytes(root, vd) == 0L)
    assert(VersionedTable.read(spark, root).count() == 200)
  }

  test("repartitionTable: spec evolution is an honest full rewrite; " +
    "old layouts stay time-travelable") {
    val root = freshRoot()
    seed(root) // v1: partitioned by d
    // de-partition: flat layout, spec gone, rows unchanged
    val v2 = VersionedTable.repartitionTable(spark, root, Nil)
    assert(VersionedTable.partitionColumnsOf(spark, root, v2).isEmpty)
    assert(VersionedTable.dataFileRefs(spark, root, v2)
      .forall(!_.contains("p__")), "de-partitioned refs still have leaves")
    assert(VersionedTable.read(spark, root).count() == 300)
    // the protocol follows: no partition-spec requirement on v2
    assert(!VersionedTable.protocolOf(spark, root, v2)._1.contains("partition-spec"))
    // re-partition by d: leaves return, and the metadata-only retention
    // verb works against the NEW spec
    val v3 = VersionedTable.repartitionTable(spark, root, Seq("d"))
    assert(VersionedTable.partitionColumnsOf(spark, root, v3) == Seq("d"))
    assert(VersionedTable.dataFileRefs(spark, root, v3)
      .forall(_.contains("p__d=")))
    val v4 = VersionedTable.deleteWhere(spark, root,
      col("d") === lit("2024-01-01").cast("date"))
    assert(ownDataBytes(root, v4) == 0L, "retention delete should be metadata-only")
    assert(VersionedTable.read(spark, root).count() == 200)
    // unknown column refused; v1's layout still time-travels
    intercept[IllegalArgumentException] {
      VersionedTable.repartitionTable(spark, root, Seq("nope"))
    }
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 300)
  }

  test("null partition values: hive default dir, IS NULL pruning, drops") {
    val root = freshRoot()
    val df = Seq(
      (1L, Some("2024-01-01"), "a"), (2L, Some("2024-01-01"), "b"),
      (3L, None, "c"), (4L, None, "d"))
      .toDF("id", "ds", "x")
      .withColumn("d", col("ds").cast("date")).drop("ds")
      .select("id", "d", "x").coalesce(1)
    VersionedTable.commit(df, root, partitionBy = Seq("d"))
    val refs = VersionedTable.dataFileRefs(spark, root, 1L)
    assert(refs.exists(_.contains("p__d=__HIVE_DEFAULT_PARTITION__")))
    val (kept, total) = VersionedTable.prunedFiles(spark, root, 1L, col("d").isNull)
    assert(kept.size == 1 && total == 2)
    assert(VersionedTable.readWhere(spark, root, col("d").isNull)
      .select("id").collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    val v = VersionedTable.deleteWhere(spark, root, col("d").isNull)
    assert(ownDataBytes(root, v) == 0L)
    assert(VersionedTable.read(spark, root).count() == 2)
  }

  test("deletion vectors on a partitioned table: masks fold, partition drop drops them") {
    val root = freshRoot()
    seed(root)
    VersionedTable.deleteWhere(spark, root, col("id").isin(1L, 2L), mor = true)
    assert(VersionedTable.read(spark, root).count() == 298)
    // partition predicate on a DV table: rows of the dropped partition go,
    // the other partitions' masks carry
    VersionedTable.deleteWhere(spark, root, col("id") === 150L, mor = true)
    val v = VersionedTable.deleteWhere(spark, root,
      col("d") === lit("2024-01-01").cast("date"))
    assert(ownDataBytes(root, v) == 0L)
    val got = VersionedTable.read(spark, root)
    // 300 - 100 (dropped partition, which held masked id 1) - 2 masks
    assert(got.count() == 198)
    assert(got.where(col("id").isin(1L, 2L, 150L)).count() == 0)
  }

  test("vacuum on a partitioned table: dropped partition files deleted, kept refs survive") {
    val root = freshRoot()
    seed(root)
    VersionedTable.deleteWhere(spark, root,
      col("d") === lit("2024-01-01").cast("date"))
    VersionedTable.compact(spark, root)
    val dropped = VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(dropped.nonEmpty)
    assert(VersionedTable.read(spark, root).count() == 200)
    val f = fsOf(root)
    assert(!f.exists(new org.apache.hadoop.fs.Path(root,
      "v00000001/p__d=2024-01-01")),
      "vacuum left the dropped partition's files")
  }

  test("SHOW PARTITIONS: live tuples with file counts and bytes; " +
      "converted hive layouts serve the same verb; unpartitioned refuses") {
    val root = freshRoot()
    seed(root) // 3 dates x 100 rows, partitioned by d
    val rows = graft.plans.GraftSql.execute(spark,
      s"SHOW PARTITIONS '$root'").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("d=2024-01-01", "d=2024-01-02", "d=2024-01-03"))
    assert(rows.forall(r => r.getInt(1) > 0 && r.getLong(2) > 0L))
    // a partition drop disappears from the listing
    VersionedTable.deleteWhere(spark, root,
      col("d") < lit("2024-01-02").cast("date"))
    assert(graft.plans.GraftSql.execute(spark, s"SHOW PARTITIONS '$root'")
      .collect().map(_.getString(0)).toSeq ==
      Seq("d=2024-01-02", "d=2024-01-03"))
    // converted-in-place hive layout: same verb, bare segments decode
    val conv = freshRoot()
    (1 to 60).map(i => (i.toLong, i % 3)).toDF("id", "g")
      .write.partitionBy("g").parquet(conv)
    VersionedTable.convertToGraft(spark, conv)
    assert(graft.plans.GraftSql.execute(spark, s"SHOW PARTITIONS '$conv'")
      .collect().map(_.getString(0)).toSeq == Seq("g=0", "g=1", "g=2"))
    // unpartitioned: honest refusal, as Spark's own verb
    val plain = freshRoot()
    VersionedTable.commit(Seq((1L, "x")).toDF("id", "x"), plain)
    val e = intercept[IllegalArgumentException](
      graft.plans.GraftSql.execute(spark, s"SHOW PARTITIONS '$plain'"))
    assert(e.getMessage.contains("partitioned tables"), e.getMessage)
  }
}
