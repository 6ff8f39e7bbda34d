package graft.plans

import graft.SparkSpec
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** Table properties (TBLPROPERTIES): per-version metadata map carried by
  * every commit, SET/UNSET as metadata-only commits, and the
  * `graft.enableDeletionVectors` knob that flips SQL DELETE/UPDATE/MERGE
  * to the merge-on-read deletion-vector forms. */
class TblPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_props").toString + "/t"

  private def seed(root: String, n: Long = 100L): Unit =
    VersionedTable.commit(
      (1L to n).map(i => (i, s"r$i", i * 10)).toDF("id", "x", "amount")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"), root)

  test("SET/UNSET/SHOW TBLPROPERTIES; properties carry across commits") {
    val root = freshRoot(); seed(root)
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('owner'='etl', 'tier'='gold')")
    val shown = GraftSql.execute(spark, s"SHOW TBLPROPERTIES '$root'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown == Map("owner" -> "etl", "tier" -> "gold"))
    // a data commit carries them forward
    VersionedTable.commitAppend(Seq((101L, "a", 1L)).toDF("id", "x", "amount"), root)
    val cur = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.propertiesOf(spark, root, cur)("owner") == "etl")
    // UNSET drops one, keeps the other; unknown keys ignored
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' UNSET TBLPROPERTIES ('tier', 'nope')")
    val after = GraftSql.execute(spark, s"SHOW TBLPROPERTIES '$root'")
      .collect().map(_.getString(0)).toSeq
    assert(after == Seq("owner"))
  }

  test("graft.enableDeletionVectors flips SQL DELETE/UPDATE to merge-on-read") {
    val root = freshRoot(); seed(root)
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('graft.enableDeletionVectors'='true')")
    GraftSql.execute(spark, s"DELETE FROM `$root` WHERE id = 3")
    val v1 = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.hasDeletionVectors(spark, root, v1),
      "SQL DELETE should have gone merge-on-read")
    GraftSql.execute(spark, s"UPDATE `$root` SET x = 'upd' WHERE id = 4")
    val v2 = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.hasDeletionVectors(spark, root, v2))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 99)
    assert(got.where(col("id") === 4).head.getString(1) == "upd")
    // the masked original did not resurface
    assert(got.where(col("id") === 4).count() == 1)
  }

  test("MOR MERGE masks matched rows and appends only affected images") {
    val root = freshRoot(); seed(root, 1000L)
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('graft.enableDeletionVectors'='true')")
    Seq((5L, "DEL", 0L), (7L, "upd", 700L), (2001L, "new", 1L))
      .toDF("id", "x", "amount").createOrReplaceTempView("mor_merge_src")
    val v = GraftSql.execute(spark,
      s"""MERGE INTO `$root` AS t USING mor_merge_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.x = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET x = s.x, amount = s.amount
         |WHEN NOT MATCHED THEN INSERT (id, x, amount) VALUES (s.id, s.x, s.amount)
         |""".stripMargin).collect().head.getLong(2)
    assert(VersionedTable.hasDeletionVectors(spark, root, v))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 1000) // 1000 - 1 deleted + 1 inserted
    assert(got.where(col("id") === 5).count() == 0)
    assert(got.where(col("id") === 7).head.getString(1) == "upd")
    assert(got.where(col("id") === 2001).count() == 1)
    // the DV sidecar holds exactly the two affected rows (delete + update)
    val dv = VersionedTable.readExtra(spark, root, v, "dv").get
    assert(dv.count() == 2, s"expected 2 masked rows, got ${dv.count()}")
    // the version's own fresh data is just the updated image + the insert
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root, f"v$v%08d")
    val freshRows = spark.read.parquet(
      f.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .map(_.toString): _*).count()
    assert(freshRows == 2L, s"MOR merge appended $freshRows rows, expected 2")
    // feed intact: delete preimage, update pre/post, insert
    val feed = VersionedTable.readChanges(spark, root, v, v)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L), s"feed was $byType")
    // the result equals the COW form on a twin table
    val rootC = freshRoot(); seed(rootC, 1000L)
    Seq((5L, "DEL", 0L), (7L, "upd", 700L), (2001L, "new", 1L))
      .toDF("id", "x", "amount").createOrReplaceTempView("cow_merge_src")
    GraftSql.execute(spark,
      s"""MERGE INTO `$rootC` AS t USING cow_merge_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.x = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET x = s.x, amount = s.amount
         |WHEN NOT MATCHED THEN INSERT (id, x, amount) VALUES (s.id, s.x, s.amount)
         |""".stripMargin)
    assert(VersionedTable.read(spark, root).orderBy("id").collect().toSeq ==
      VersionedTable.read(spark, rootC).orderBy("id").collect().toSeq)
  }

  test("MOR merge composes with compaction and later merges") {
    val root = freshRoot(); seed(root)
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('graft.enableDeletionVectors'='true')")
    Seq((1L, "m1", 11L)).toDF("id", "x", "amount")
      .createOrReplaceTempView("mor_src1")
    GraftSql.execute(spark,
      s"""MERGE INTO `$root` AS t USING mor_src1 AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET x = s.x, amount = s.amount
         |""".stripMargin)
    // second merge hits the REPLACEMENT row (it lives in a fresh file)
    Seq((1L, "m2", 12L)).toDF("id", "x", "amount")
      .createOrReplaceTempView("mor_src2")
    GraftSql.execute(spark,
      s"""MERGE INTO `$root` AS t USING mor_src2 AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET x = s.x, amount = s.amount
         |""".stripMargin)
    val one = VersionedTable.read(spark, root).where(col("id") === 1)
    assert(one.count() == 1)
    assert(one.head.getString(1) == "m2" && one.head.getLong(2) == 12L)
    val vc = VersionedTable.compact(spark, root)
    assert(!VersionedTable.hasDeletionVectors(spark, root, vc))
    assert(VersionedTable.read(spark, root).count() == 100)
  }
}
