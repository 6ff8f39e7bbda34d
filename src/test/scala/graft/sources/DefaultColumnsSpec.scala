package graft.sources

import graft.SparkSpec
import graft.plans.GraftSql
import org.apache.spark.sql.functions._

/** Column DEFAULT values (Delta's defaultColumns on this format):
  * `ADD COLUMNS (c INT DEFAULT 5)` records Spark's NATIVE
  * EXISTS_DEFAULT / CURRENT_DEFAULT schema metadata — pre-evolution
  * files serve the default through the parquet reader's own
  * missing-column fill (zero data bytes move), and INSERTs that omit
  * the column store it. Explicit values — including explicit NULL —
  * always win. */
class DefaultColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_dflt").toString + "/t"

  test("backfill: pre-evolution files serve the default; explicit values win") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "x"), root)
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD COLUMNS (n INT DEFAULT 42, " +
        "note STRING DEFAULT 'none', d DATE DEFAULT DATE'2024-01-01')")
    // old files: reader fills the defaults, no rewrite happened
    val got = VersionedTable.read(spark, root).orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(2), r.getString(3),
      r.getDate(4).toString)).toSeq == Seq(
      (1L, 42, "none", "2024-01-01"), (2L, 42, "none", "2024-01-01")))
    // INSERT with a column list omitting the defaults: they fill
    GraftSql.execute(spark,
      s"INSERT INTO `$root` (id, x) VALUES (3, 'c')")
    // INSERT naming them: explicit values win, explicit NULL stays null
    GraftSql.execute(spark,
      s"INSERT INTO `$root` (id, x, n, note, d) " +
        "VALUES (4, 'd', 7, NULL, DATE'2030-05-05')")
    val all = VersionedTable.read(spark, root).orderBy("id").collect()
    assert(all.map(r => (r.getLong(0),
      if (r.isNullAt(2)) -1 else r.getInt(2),
      if (r.isNullAt(3)) "NULL" else r.getString(3))).toSeq == Seq(
      (1L, 42, "none"), (2L, 42, "none"), (3L, 42, "none"), (4L, 7, "NULL")))
    // the protocol marks the requirement: an old reader must refuse
    // rather than serve null where the contract says 42
    val cur = VersionedTable.currentVersion(spark, root).get
    // time travel BEFORE the evolution is unaffected
    assert(VersionedTable.readVersion(spark, root, 1L).columns.toSeq ==
      Seq("id", "x"))
    assert(cur >= 3L)
  }

  test("parser edges: comparison/commas in defaults, COMMENT interplay, " +
      "column references refused, overwrite keeps the contract") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    // comparison operators and commas inside the DEFAULT expression; a
    // MAP type with angle brackets beside it; COMMENT after the default
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD COLUMNS (" +
        "f INT DEFAULT IF(1 > 0, 5, 6) COMMENT 'five when positive', " +
        "tags MAP<STRING, INT>, " +
        "w STRING DEFAULT 'has DEFAULT 9 inside')")
    val got = VersionedTable.read(spark, root).head
    assert(got.getInt(2) == 5)
    assert(got.getString(4) == "has DEFAULT 9 inside")
    // a column-referencing default is refused at DDL time, loudly
    val e = intercept[IllegalArgumentException](GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD COLUMN n INT DEFAULT id + 1"))
    assert(e.getMessage.contains("DEFAULT"), e.getMessage)
    // INSERT OVERWRITE re-records the TABLE schema: the default
    // contract survives the projection that strips field metadata
    GraftSql.execute(spark,
      s"INSERT OVERWRITE `$root` (id, x) VALUES (9, 'z')")
    GraftSql.execute(spark, s"INSERT INTO `$root` (id, x) VALUES (10, 'y')")
    val after = VersionedTable.read(spark, root).orderBy("id").collect()
    assert(after.map(r => (r.getLong(0), r.getInt(2))).toSeq ==
      Seq((9L, 5), (10L, 5)),
      "INSERT OVERWRITE erased the default contract")
  }

  test("every full-rewrite road inherits the contract; DDL edges loud") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), root)
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD COLUMN p INT DEFAULT 11")
    // a PLAIN full-rewrite commit (no recordSchema — the streaming
    // upsert / merge-evolve shape) through a metadata-stripping
    // projection: the defaults metadata carries via the commit's
    // metadata-merge fallback
    val rewritten = VersionedTable.read(spark, root)
      .select(col("id"), concat(col("x"), lit("!")).as("x"), col("p"))
    VersionedTable.commit(rewritten, root)
    GraftSql.execute(spark, s"INSERT INTO `$root` (id, x) VALUES (3, 'c')")
    val got = VersionedTable.read(spark, root).orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(2))).toSeq ==
      Seq((1L, 11), (2L, 11), (3L, 11)),
      "full rewrite erased the default contract")
    // backtick-quoted names containing the word DEFAULT parse; a
    // DEFAULT with no column definition is refused loudly
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD COLUMNS (`the default one` STRING)")
    assert(VersionedTable.read(spark, root).columns
      .contains("the default one"))
    val e = intercept[IllegalArgumentException](GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD COLUMNS (q INT, DEFAULT 5)"))
    assert(e.getMessage.contains("DEFAULT without a column"), e.getMessage)
  }

  test("defaults survive compaction and constraints; bad DEFAULT refused at DDL") {
    val root = freshRoot()
    VersionedTable.commit(
      (1L to 50L).map(i => (i, s"r$i")).toDF("id", "x")
        .repartition(4), root)
    GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD COLUMN flag INT DEFAULT 7")
    VersionedTable.compact(spark, root)
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 50 && got.where(col("flag") =!= 7).count() == 0,
      "compaction lost the default backfill")
    // a DEFAULT that cannot fold to the column type fails at DDL time,
    // loudly, before anything commits
    val e = intercept[Exception](GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD COLUMN bad INT DEFAULT 'not-a-number'"))
    assert(e.getMessage.contains("DEFAULT") || e.getMessage.contains("fold"),
      e.getMessage)
  }
}
