package graft.sources

import graft.SparkSpec
import graft.plans.GraftSql
import org.apache.spark.sql.functions._

/** APPLY CHANGES INTO ([[ChangeReplica]]): a downstream replica
  * maintained purely from the source's change feed must track the source
  * row-for-row through inserts, updates, deletes, and merges — across
  * multiple incremental applies, under replay (at-least-once delivery),
  * and with multi-version churn of one key netting to its last state. */
class ChangeReplicaSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def assertReplica(src: String, dst: String): Unit = {
    val s = VersionedTable.read(spark, src).orderBy("id").collect().toSeq
    val d = VersionedTable.read(spark, dst).orderBy("id").collect().toSeq
    assert(d == s, s"replica diverged:\nsrc=$s\ndst=$d")
  }

  test("replica tracks the source through the full DML surface, incrementally") {
    val dir = fresh("graft_replica")
    val src = s"$dir/src"; val dst = s"$dir/dst"; val ck = s"$dir/ck"
    // birth THROUGH THE SQL FACE so the creation commit carries a feed
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "x", "n").createOrReplaceTempView("cr_seed")
    GraftSql.execute(spark, s"CREATE TABLE '$src' AS SELECT * FROM cr_seed")
    // apply #1: bootstrap from the insert feed
    val r1 = ChangeReplica.applyChanges(spark, src, dst, Seq("id"), ck)
    assert(r1.isDefined)
    assertReplica(src, dst)
    // churn: update, delete, insert, and a MERGE, across several versions
    GraftSql.execute(spark, s"UPDATE `$src` SET x = 'a2' WHERE id = 1")
    GraftSql.execute(spark, s"DELETE FROM `$src` WHERE id = 2")
    GraftSql.execute(spark, s"INSERT INTO `$src` VALUES (4, 'd', 40)")
    Seq((3L, "c9", 99L), (5L, "e", 50L)).toDF("id", "x", "n")
      .createOrReplaceTempView("cr_m")
    GraftSql.execute(spark,
      s"""MERGE INTO `$src` AS t USING cr_m AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // apply #2: the whole range in one incremental consume
    val r2 = ChangeReplica.applyChanges(spark, src, dst, Seq("id"), ck)
    assert(r2.isDefined)
    assertReplica(src, dst)
    // nothing new -> no-op poll, no commit on the replica
    val dstV = VersionedTable.currentVersion(spark, dst)
    assert(ChangeReplica.applyChanges(spark, src, dst, Seq("id"), ck).isEmpty)
    assert(VersionedTable.currentVersion(spark, dst) == dstV)
  }

  test("multi-version churn of one key nets to its last state; insert+delete in range never lands") {
    val dir = fresh("graft_replica_net")
    val src = s"$dir/src"; val dst = s"$dir/dst"; val ck = s"$dir/ck"
    Seq((1L, "v1")).toDF("id", "x").createOrReplaceTempView("crn_seed")
    GraftSql.execute(spark, s"CREATE TABLE '$src' AS SELECT * FROM crn_seed")
    GraftSql.execute(spark, s"UPDATE `$src` SET x = 'v2' WHERE id = 1")
    GraftSql.execute(spark, s"UPDATE `$src` SET x = 'v3' WHERE id = 1")
    GraftSql.execute(spark, s"INSERT INTO `$src` VALUES (9, 'ghost')")
    GraftSql.execute(spark, s"DELETE FROM `$src` WHERE id = 9")
    ChangeReplica.applyChanges(spark, src, dst, Seq("id"), ck)
    val got = VersionedTable.read(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "v3"), s"net effect wrong: $got")
  }

  test("the SQL verb drives the same apply") {
    val dir = fresh("graft_replica_sql")
    val src = s"$dir/src"; val dst = s"$dir/dst"; val ck = s"$dir/ck"
    Seq((1L, "a")).toDF("id", "x").createOrReplaceTempView("crs_seed")
    GraftSql.execute(spark, s"CREATE TABLE '$src' AS SELECT * FROM crs_seed")
    GraftSql.execute(spark, s"INSERT INTO `$src` VALUES (2, 'b')")
    val res = GraftSql.execute(spark,
      s"APPLY CHANGES INTO '$dst' FROM '$src' KEYS (id) CHECKPOINT '$ck'")
      .collect().head
    assert(res.getLong(2) == VersionedTable.currentVersion(spark, src).get)
    assertReplica(src, dst)
    // idle poll through SQL: -1 signals nothing new
    assert(GraftSql.execute(spark,
      s"APPLY CHANGES INTO '$dst' FROM '$src' KEYS (id) CHECKPOINT '$ck'")
      .collect().head.getLong(2) == -1L)
  }

  test("replay converges: re-applying a delivered batch is state-idempotent") {
    val dir = fresh("graft_replica_replay")
    val src = s"$dir/src"; val dst = s"$dir/dst"
    Seq((1L, "a"), (2L, "b")).toDF("id", "x").createOrReplaceTempView("crr_seed")
    GraftSql.execute(spark, s"CREATE TABLE '$src' AS SELECT * FROM crr_seed")
    GraftSql.execute(spark, s"UPDATE `$src` SET x = 'a2' WHERE id = 1")
    GraftSql.execute(spark, s"DELETE FROM `$src` WHERE id = 2")
    val hi = VersionedTable.currentVersion(spark, src).get
    val batch = VersionedTable.readChanges(spark, src, 1L, hi)
    // deliver the SAME range twice — the crash-between-process-and-
    // checkpoint shape of at-least-once delivery
    ChangeReplica.applyBatch(spark, dst, Seq("id"), batch)
    val after1 = VersionedTable.read(spark, dst).orderBy("id").collect().toSeq
    ChangeReplica.applyBatch(spark, dst, Seq("id"), batch)
    val after2 = VersionedTable.read(spark, dst).orderBy("id").collect().toSeq
    assert(after1 == after2, "replay must converge to the same state")
    assertReplica(src, dst)
  }
}
