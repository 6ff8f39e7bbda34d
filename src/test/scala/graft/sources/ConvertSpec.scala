package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** CONVERT TO GRAFT ([[VersionedTable.convertToGraft]] — Delta's
  * CONVERT TO DELTA on this format): an existing plain-parquet dir
  * becomes version 1 by manifest reference — zero data bytes move —
  * with schema, stats, and sizes recorded. The converted table must be
  * a FULL citizen afterwards: pruned reads, append, COW delete, MOR
  * delete (the absolute-ref file identity), optimize, time travel. */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_conv").toString

  test("convert references files in place; read, stats pruning, and sizes all serve") {
    val dir = freshDir() + "/t"
    val df = (1L to 1000L).map(i => (i, i % 7, s"row-$i")).toDF("id", "g", "x")
    df.repartitionByRange(4, col("id")).write.parquet(dir)
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = f.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap

    val v = VersionedTable.convertToGraft(spark, dir)
    assert(v == 1L)
    // zero data movement: the original files are untouched
    val after = f.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    assert(after == before, "convert must not rewrite or move data files")
    // content identical
    assert(VersionedTable.read(spark, dir).orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // footer stats were collected for the external files: a key-range
    // read opens a strict subset of the range-partitioned files
    val (kept, total) = VersionedTable.prunedFiles(spark, dir, v,
      col("id") <= 100L)
    assert(total == 4 && kept.size < total,
      s"converted stats must prune: kept ${kept.size} of $total")
    // sizes recorded: no stat walk needed for maintenance
    val sizes = VersionedTable.fileSizes(spark, dir, v)
    assert(sizes.keySet == VersionedTable.dataFileRefs(spark, dir, v).toSet)
    assert(VersionedTable.maintenanceReport(spark, dir).tableBytes ==
      sizes.values.sum)
  }

  test("a converted table is a full citizen: append, COW + MOR delete, time travel") {
    val dir = freshDir() + "/t"
    val df = (1L to 500L).map(i => (i, s"r$i")).toDF("id", "x")
    df.repartition(2).write.parquet(dir)
    VersionedTable.convertToGraft(spark, dir)
    // append lands in a version dir beside the originals
    VersionedTable.commitAppend((501L to 600L).map(i => (i, s"r$i"))
      .toDF("id", "x"), dir)
    assert(VersionedTable.read(spark, dir).count() == 600L)
    // COW delete rewrites only admitting files, carries the rest by ref
    VersionedTable.deleteWhere(spark, dir, col("id") > 550L)
    assert(VersionedTable.read(spark, dir).count() == 550L)
    // MOR delete: the deletion vector must key converted files by their
    // FULL path (no vNNNNNNNN tail exists) without cross-file collisions
    VersionedTable.setProperties(spark, dir,
      Map("graft.enableDeletionVectors" -> "true"))
    VersionedTable.deleteWhere(spark, dir, col("id") % 10 === 0, mor = true)
    val got = VersionedTable.read(spark, dir).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == (1L to 550L).filterNot(_ % 10 == 0).toSet,
      "MOR delete on converted files must mask exactly the matching rows")
    // ...and the mask survives a FURTHER commit's carry (the refTail
    // normalization between manifest refs and scanned file paths)
    VersionedTable.commitAppend(Seq((601L, "fresh")).toDF("id", "x"), dir)
    val got2 = VersionedTable.read(spark, dir).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got2 == ((1L to 550L).filterNot(_ % 10 == 0).toSet + 601L),
      "carried DV entries must keep masking converted files")
    // history intact: version 1 still reads as the original content
    assert(VersionedTable.readVersion(spark, dir, 1L).count() == 500L)
  }

  test("refusals: existing tables, empty dirs; SQL verb works") {
    val dir = freshDir() + "/t"
    Seq((1L, "a")).toDF("id", "x").write.parquet(dir)
    // SQL face
    val row = graft.plans.GraftSql.execute(spark,
      s"CONVERT TO GRAFT '$dir'").collect().head
    assert(row.getString(0) == "CONVERT TO GRAFT" && row.getLong(2) == 1L)
    // idempotence guard: a second convert refuses
    val e2 = intercept[IllegalArgumentException](
      VersionedTable.convertToGraft(spark, dir))
    assert(e2.getMessage.contains("already holds"))
    val empty = freshDir() + "/e"
    new Path(empty).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new Path(empty))
    intercept[IllegalArgumentException](
      VersionedTable.convertToGraft(spark, empty))
  }

  test("hive-partitioned layout converts in place: values synthesize, " +
      "pruning prunes, partition drop is metadata-only") {
    val dir = freshDir() + "/p"
    // Spark's own partitioned writer: `d=.../part-*.parquet` leaves,
    // the partition column NOT in the files — the classic lake layout
    val df = (1 to 300).map { i =>
      (i.toLong, s"2024-01-0${(i - 1) % 3 + 1}", s"r$i")
    }.toDF("id", "ds", "x").withColumn("d", col("ds").cast("date")).drop("ds")
    df.repartition(2).write.partitionBy("d").parquet(dir)
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = f.listStatus(new Path(dir)).filter(_.isDirectory)
      .flatMap(d => f.listStatus(d.getPath))
      .map(s => s.getPath.toString -> s.getModificationTime).toMap

    val v = VersionedTable.convertToGraft(spark, dir)
    assert(v == 1L)
    // zero data movement
    val after = f.listStatus(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("d="))
      .flatMap(d => f.listStatus(d.getPath))
      .map(s => s.getPath.toString -> s.getModificationTime).toMap
    assert(after == before, "convert must not rewrite or move data files")
    // spec + type inference recorded: d came back as a DATE column
    assert(VersionedTable.partitionColumnsOf(spark, dir, v) == Seq("d"))
    assert(VersionedTable.read(spark, dir).schema("d").dataType ==
      org.apache.spark.sql.types.DateType)
    // values synthesize from the dir names: full content round-trips
    assert(VersionedTable.read(spark, dir)
      .orderBy("id").collect().toSeq ==
      df.select("id", "x", "d").orderBy("id").collect().toSeq)
    // partition pruning works from the bare `d=` segments
    val (kept, total) = VersionedTable.prunedFiles(spark, dir, v,
      col("d") === lit("2024-01-02").cast("date"))
    assert(kept.nonEmpty && kept.size < total, s"kept ${kept.size} of $total")
    assert(kept.forall(_.contains("d=2024-01-02")))
    // retention delete on the partition column: METADATA-ONLY drop
    val vd = VersionedTable.deleteWhere(spark, dir,
      col("d") < lit("2024-01-02").cast("date"))
    val dropInfo = VersionedTable.commitInfoOf(spark, dir, vd)
    assert(dropInfo.get("partitionDrop").contains("true"),
      s"retention delete took the rewrite road: $dropInfo")
    assert(VersionedTable.read(spark, dir).count() == 200)
    // full citizen: appends land in the native layout, reads mix both
    VersionedTable.commitAppend(
      Seq((400L, "new", java.sql.Date.valueOf("2024-01-05")))
        .toDF("id", "x", "d"), dir)
    assert(VersionedTable.read(spark, dir).count() == 201)
    assert(VersionedTable.read(spark, dir)
      .where(col("d") === lit("2024-01-05").cast("date"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(400L))
    // row-level COW delete reads synthesized values and rewrites them
    // MATERIALIZED (the rewritten files are complete)
    VersionedTable.deleteWhere(spark, dir, col("id") % 2 === 0)
    val got = VersionedTable.read(spark, dir)
    assert(got.count() == 100)
    assert(got.where(col("d").isNull).count() == 0,
      "rewrite lost synthesized partition values")
    // time travel: v1 still serves the full original content
    assert(VersionedTable.readVersion(spark, dir, 1L).count() == 300)
  }

  test("hive convert refusals: colliding column, inconsistent chain; " +
      "typed values infer long") {
    // a partition dir whose column ALSO exists inside the files
    val dirC = freshDir() + "/c"
    Seq((1L, "a", "x1")).toDF("id", "d", "x").write
      .parquet(dirC + "/d=a")
    val e = intercept[IllegalArgumentException](
      VersionedTable.convertToGraft(spark, dirC))
    assert(e.getMessage.contains("also exist inside"), e.getMessage)
    // files at the root NEXT TO a partition dir: inconsistent chain
    val dirI = freshDir() + "/i"
    Seq((1L, "r")).toDF("id", "x").write.parquet(dirI + "/g=1")
    Seq((2L, "r")).toDF("id", "x").write.mode("append").parquet(dirI)
    val e2 = intercept[IllegalArgumentException](
      VersionedTable.convertToGraft(spark, dirI))
    assert(e2.getMessage.contains("inconsistent Hive partition layout"),
      e2.getMessage)
    // integer-looking values infer LongType and prune numerically
    val dirL = freshDir() + "/l"
    (1 to 100).map(i => (i.toLong, i % 4)).toDF("id", "g")
      .write.partitionBy("g").parquet(dirL)
    val v = VersionedTable.convertToGraft(spark, dirL)
    assert(VersionedTable.read(spark, dirL).schema("g").dataType ==
      org.apache.spark.sql.types.LongType)
    val (kept, total) = VersionedTable.prunedFiles(spark, dirL, v,
      col("g") >= 2L)
    assert(kept.nonEmpty && kept.size < total)
    assert(VersionedTable.read(spark, dirL).where(col("g") === 3L).count() ==
      25L)
  }

  test("multi-byte %XX partition values: scan, pruning, and partition " +
      "drop agree on the decoded value") {
    // a layout escaped by an external writer (URL-style UTF-8 escapes —
    // `caf%C3%A9` = "café"): the read expression decodes %XX as UTF-8
    // BYTES, so the prune/drop side must too, or DELETE silently no-ops
    // on a partition SELECT still serves
    val dir = freshDir() + "/mb"
    Seq((1L, "a"), (2L, "b")).toDF("id", "x").write
      .parquet(dir + "/d=caf%C3%A9")
    Seq((3L, "c")).toDF("id", "x").write.parquet(dir + "/d=plain")
    val v = VersionedTable.convertToGraft(spark, dir)
    // the scan synthesizes the UTF-8 decode
    assert(VersionedTable.read(spark, dir)
      .where(col("d") === "café").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // pruning keeps exactly the escaped dir for the decoded literal
    val (kept, total) = VersionedTable.prunedFiles(spark, dir, v,
      col("d") === "café")
    assert(total == 3 && kept.size == 2 && kept.forall(_.contains("d=caf")),
      s"kept $kept of $total")
    // partition DELETE on the decoded value takes the metadata road and
    // actually removes the rows (the char-wise-decode bug made this a
    // silent no-op)
    val vd = VersionedTable.deleteWhere(spark, dir, col("d") === "café")
    assert(VersionedTable.commitInfoOf(spark, dir, vd)
      .get("partitionDrop").contains("true"))
    assert(VersionedTable.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("distributed listing road (budget=1) lists exactly the driver road's files") {
    val dir = freshDir() + "/big"
    val df = (1 to 200).map(i => (i.toLong, i % 5, s"r$i")).toDF("id", "g", "x")
    df.repartition(2).write.partitionBy("g").parquet(dir)
    try {
      spark.conf.set(VersionedTable.ConvertListBudgetKey, "1")
      val v = VersionedTable.convertToGraft(spark, dir)
      assert(VersionedTable.read(spark, dir).count() == 200)
      assert(VersionedTable.read(spark, dir).where(col("g") === 2L).count() ==
        df.where(col("g") === 2).count())
      // every data file referenced (no file lost between the two roads)
      val refs = VersionedTable.dataFileRefs(spark, dir, v)
      assert(refs.size == 2 * 5, s"expected 10 files, got ${refs.size}")
    } finally spark.conf.unset(VersionedTable.ConvertListBudgetKey)
  }
}
