package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reader/writer PROTOCOL gate (Delta table-features shape): each
  * version records the format features it actually uses; a build that
  * does not support a required feature must refuse to read (serving
  * anyway would be silently wrong — ignored DV masks resurrect deleted
  * rows) or to write (it could break the feature's invariants). Absent
  * record = pre-upgrade table = no requirements. */
class ProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_proto").toString + "/t"

  test("features are recorded from what each version carries") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1, "a"), (2, "b")).toDF("id", "x"), root)
    // a plain table requires nothing
    assert(VersionedTable.protocolOf(spark, root, 1L) == (Set.empty, Set.empty))
    // DV delete → deletion-vectors required
    VersionedTable.setProperties(spark, root,
      Map("graft.enableDeletionVectors" -> "true"))
    graft.plans.GraftSql.execute(spark, s"DELETE FROM `$root` WHERE id = 1")
    val cur = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.protocolOf(spark, root, cur)._1
      .contains("deletion-vectors"))
    // rename → column-mapping required from the next version on
    VersionedTable.renameColumn(spark, root, "x", "y")
    val cur2 = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.protocolOf(spark, root, cur2)._1
      .contains("column-mapping"))
    // widening → widened-types required, sticky across later commits
    VersionedTable.widenColumn(spark, root,
      "id", org.apache.spark.sql.types.LongType)
    VersionedTable.commitAppend(Seq((9L, "c")).toDF("id", "y"), root)
    val cur3 = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.protocolOf(spark, root, cur3)._1
      .contains("widened-types"))
    // everything this build writes, it reads
    VersionedTable.read(spark, root).count()
  }

  test("a version requiring an unknown feature refuses reads and writes loudly") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "x"), root) // v2
    // inject a future feature into v2's protocol record (what a newer
    // build would have written)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(
      s"$root/v00000002/_protocol/features.properties")
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write("reader=time-machine\nwriter=time-machine\n".getBytes("UTF-8"))
    finally out.close()

    val readErr = intercept[VersionedTable.ProtocolException] {
      VersionedTable.read(spark, root).count()
    }
    assert(readErr.getMessage.contains("time-machine"))
    val writeErr = intercept[VersionedTable.ProtocolException] {
      VersionedTable.commitAppend(Seq((3L, "c")).toDF("id", "x"), root)
    }
    assert(writeErr.getMessage.contains("time-machine"))
    // nothing landed, and OLDER versions (no requirement) still time-travel
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L))
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 1L)
  }
}
