package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** DEEP CLONE ([[VersionedTable.deepClone]]): an independent byte-level
  * copy — content identical, stats and sizes carried without footer
  * re-reads, and full independence (vacuuming or mutating either side
  * never touches the other — the exact hazard shallow clones accept).
  * Masked and partitioned sources take the rewrite road. */
class DeepCloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("byte-copy road: identical content, carried stats prune, carried sizes serve") {
    val src = freshRoot("graft_dc_src")
    val dst = freshRoot("graft_dc_dst")
    VersionedTable.commit(
      (1L to 1000L).map(i => (i, s"r$i")).toDF("id", "x")
        .repartitionByRange(4, col("id")), src)
    val v = VersionedTable.deepClone(spark, dst, src)
    assert(v == 1L)
    assert(VersionedTable.read(spark, dst).orderBy("id").collect().toSeq ==
      VersionedTable.read(spark, src).orderBy("id").collect().toSeq)
    // stats carried (no footer re-read): a key-range read prunes
    val (kept, total) = VersionedTable.prunedFiles(spark, dst, 1L,
      col("id") <= 100L)
    assert(total == 4 && kept.size < total,
      s"carried stats must prune: ${kept.size} of $total")
    // sizes carried: bytes equal the source's
    assert(VersionedTable.fileSizes(spark, dst, 1L).values.sum ==
      VersionedTable.fileSizes(spark, src,
        VersionedTable.currentVersion(spark, src).get).values.sum)
    // INDEPENDENCE both ways: mutate each side, the other is untouched
    VersionedTable.commitAppend(Seq((2000L, "clone-only")).toDF("id", "x"), dst)
    VersionedTable.deleteWhere(spark, src, col("id") <= 500L)
    assert(VersionedTable.read(spark, src).count() == 500L)
    assert(VersionedTable.read(spark, dst).count() == 1001L)
    // ...including after the SOURCE is vacuumed away entirely (the
    // shallow-clone stranding hazard a deep clone exists to avoid)
    val f = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(src), true)
    assert(VersionedTable.read(spark, dst).count() == 1001L,
      "a deep clone must survive its source's deletion")
  }

  test("masked source clones byte-for-byte with the mask intact and re-keyed") {
    val srcM = freshRoot("graft_dc_mor")
    val dstM = freshRoot("graft_dc_mord")
    VersionedTable.commit(
      (1L to 300L).map(i => (i, i % 5)).toDF("id", "g")
        .repartitionByRange(3, col("id")), srcM)
    VersionedTable.deleteWhere(spark, srcM, col("id") % 3 === 0, mor = true)
    val srcV = VersionedTable.currentVersion(spark, srcM).get
    VersionedTable.deepClone(spark, dstM, srcM)
    // BYTE COPY, not a rewrite: the clone carries the mask and its data
    // files are length-identical to the source's (renamed only)
    assert(VersionedTable.hasDeletionVectors(spark, dstM, 1L),
      "the byte-copy road must carry the mask, not fold it")
    val srcLens = VersionedTable.fileSizes(spark, srcM, srcV).values.toSeq.sorted
    val dstLens = VersionedTable.fileSizes(spark, dstM, 1L).values.toSeq.sorted
    assert(dstLens == srcLens,
      s"clone files are not byte-identical: $dstLens vs $srcLens")
    // ...and the re-keyed mask serves: read-equal to the source
    assert(VersionedTable.read(spark, dstM).orderBy("id").collect().toSeq ==
      VersionedTable.read(spark, srcM).orderBy("id").collect().toSeq)
    assert(VersionedTable.read(spark, dstM).count() == 200L)
    // independence: further masking the clone never touches the source
    VersionedTable.deleteWhere(spark, dstM, col("id") === 1L, mor = true)
    assert(VersionedTable.read(spark, dstM).count() == 199L)
    assert(VersionedTable.read(spark, srcM).count() == 200L)
  }

  test("partitioned sources take the rewrite road; SQL verb + AS OF work") {
    // partitioned source: the layout is rebuilt, partition verbs work
    val srcP = freshRoot("graft_dc_part")
    val dstP = freshRoot("graft_dc_partd")
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "d"), srcP,
      partitionBy = Seq("d"))
    // version-pinned clone THROUGH THE SQL VERB (AS OF 1), after a
    // second commit moves the source head
    VersionedTable.commitAppend(Seq((4L, "c")).toDF("id", "d"), srcP)
    graft.plans.GraftSql.execute(spark,
      s"CREATE TABLE '$dstP' DEEP CLONE '$srcP' VERSION AS OF 1")
    assert(VersionedTable.read(spark, dstP).count() == 3L,
      "AS OF 1 must clone the pinned snapshot, not the head")
    assert(VersionedTable.partitionColumnsOf(spark, dstP, 1L) == Seq("d"),
      "the clone must carry the partition spec")
    // the rebuilt layout serves the metadata-only partition verbs
    val dropped = VersionedTable.deleteWhere(spark, dstP, col("d") === "a")
    assert(dropped > 1L && VersionedTable.read(spark, dstP)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
