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

  test("refusals: partitioned layouts, existing tables, empty dirs; SQL verb works") {
    val part = freshDir() + "/p"
    Seq((1L, "a"), (2L, "b")).toDF("id", "d")
      .write.partitionBy("d").parquet(part)
    val e = intercept[IllegalArgumentException](
      VersionedTable.convertToGraft(spark, part))
    assert(e.getMessage.contains("Hive-partitioned"))
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
}
