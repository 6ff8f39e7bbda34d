package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TIMESTAMP-based time travel: versionAsOf resolves the snapshot
  * current at a wall-clock instant from the commit markers' publish
  * times; the graft_table_asof TVF is its SQL face. */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  test("versionAsOf picks the version current at the instant; too-early throws") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString + "/t"
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root) // v1
    val afterV1 = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1100) // commit-marker mtimes are second-granular on some filesystems
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "x"), root) // v2
    val afterV2 = new java.sql.Timestamp(System.currentTimeMillis())

    assert(VersionedTable.versionAsOf(spark, root, afterV1) == 1L)
    assert(VersionedTable.versionAsOf(spark, root, afterV2) == 2L)
    val tooEarly = new java.sql.Timestamp(afterV1.getTime - 3600 * 1000)
    val e = intercept[java.io.IOException] {
      VersionedTable.versionAsOf(spark, root, tooEarly)
    }
    assert(e.getMessage.contains("no committed version"))

    // SQL face
    graft.plans.GraftExtensions.install(spark)
    val got = spark.sql(
      s"SELECT id FROM graft_table_asof('$root', '${afterV1.toString}')")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("in-commit timestamps: resolution survives rewritten marker mtimes " +
    "(the copied/restored-table case)") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt2").toString + "/t"
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root) // v1
    val afterV1 = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20) // in-commit stamps are millisecond-granular
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "x"), root) // v2
    val afterV2 = new java.sql.Timestamp(System.currentTimeMillis())
    val t1 = VersionedTable.commitTimeOf(spark, root, 1L)
    val t2 = VersionedTable.commitTimeOf(spark, root, 2L)
    assert(t1 < t2, "in-commit stamps must be strictly monotone")
    // simulate a copy/restore: every marker's MTIME becomes "now + 1h" —
    // the mtime road would re-date the whole history to the copy time
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val future = System.currentTimeMillis() + 3600 * 1000
    Seq(1L, 2L).foreach { v =>
      f.setTimes(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, "_commits"), f"$v%08d"), future, -1)
    }
    // resolution is UNAFFECTED: the stamps live in the marker content
    assert(VersionedTable.versionAsOf(spark, root, afterV1) == 1L)
    assert(VersionedTable.versionAsOf(spark, root, afterV2) == 2L)
    assert(VersionedTable.commitTimeOf(spark, root, 1L) == t1)
    assert(VersionedTable.commitTimeOf(spark, root, 2L) == t2)
    // history reports the same clock
    val hist = VersionedTable.history(spark, root)
      .select("version", "committed_at").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(hist(1L) == t1 && hist(2L) == t2)
  }

  test("a skewed writer's past-dated stamp resolves monotone (read-side clamp)") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt3").toString + "/t"
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "x"), root)
    VersionedTable.commitAppend(Seq((3L, "c")).toDF("id", "x"), root)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def craft(v: Long, ts: Long): Unit = {
      val marker = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, "_commits"), f"$v%08d")
      val dirName = {
        val in = f.open(marker)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().next().trim
        finally in.close()
      }
      val out = f.create(marker, true)
      try out.write(s"$dirName\n$ts\n".getBytes("UTF-8")) finally out.close()
    }
    // a legacy/skewed writer dated v3 BEFORE v2 — version order is the
    // truth, so v3 must resolve at-or-after v2's instant, never before
    craft(1L, 1000L); craft(2L, 5000L); craft(3L, 2000L)
    assert(VersionedTable.versionAsOf(spark, root,
      new java.sql.Timestamp(2500L)) == 1L)
    assert(VersionedTable.versionAsOf(spark, root,
      new java.sql.Timestamp(4999L)) == 1L)
    assert(VersionedTable.versionAsOf(spark, root,
      new java.sql.Timestamp(5000L)) == 3L)
  }
}
