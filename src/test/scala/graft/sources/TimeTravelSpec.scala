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
}
