package graft.plans

import graft.SparkSpec
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** COPY INTO — idempotent landing-zone ingestion: the loaded-file ledger
  * commits atomically with the rows, so each source file loads exactly
  * once across re-runs, crashes, interleaved DML, maintenance rewrites,
  * and clones. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_copy_$tag").toString

  private def seedTable(root: String): Unit =
    VersionedTable.commit(
      Seq((0L, "seed")).toDF("id", "src"), root)

  private def land(dir: String, ids: Range, tag: String): Unit =
    ids.map(i => (i.toLong, tag)).toDF("id", "src")
      .coalesce(1).write.mode("append").parquet(dir)

  test("loads landed files once; re-runs and later landings are incremental") {
    val root = freshDir("t") + "/t"; seedTable(root)
    val landing = freshDir("land")
    land(landing, 1 to 10, "batch1")
    val n1 = GraftSql.execute(spark,
      s"COPY INTO '$root' FROM '$landing' FILEFORMAT = PARQUET")
      .collect().head.getLong(2)
    assert(n1 == 1L, "one landed part file expected")
    assert(VersionedTable.read(spark, root).count() == 11)
    // idempotent re-run: nothing new, no commit
    val vBefore = VersionedTable.currentVersion(spark, root)
    assert(GraftSql.execute(spark,
      s"COPY INTO '$root' FROM '$landing' FILEFORMAT = PARQUET")
      .collect().head.getLong(2) == 0L)
    assert(VersionedTable.currentVersion(spark, root) == vBefore)
    // a second landing batch loads only its own files
    land(landing, 11 to 15, "batch2")
    assert(GraftSql.execute(spark,
      s"COPY INTO '$root' FROM '$landing' FILEFORMAT = PARQUET")
      .collect().head.getLong(2) == 1L)
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 16)
    assert(got.select("id").distinct().count() == 16, "a file double-loaded")
  }

  test("ledger survives unrelated DML, maintenance rewrites, and clones") {
    val root = freshDir("t2") + "/t"; seedTable(root)
    val landing = freshDir("land2")
    land(landing, 1 to 5, "b1")
    GraftSql.execute(spark,
      s"COPY INTO '$root' FROM '$landing' FILEFORMAT = PARQUET")
    // unrelated writes between copies: delete, update, full layout rewrite
    GraftSql.execute(spark, s"DELETE FROM `$root` WHERE id = 2")
    GraftSql.execute(spark, s"UPDATE `$root` SET src = 'upd' WHERE id = 3")
    VersionedTable.compact(spark, root)
    assert(GraftSql.execute(spark,
      s"COPY INTO '$root' FROM '$landing' FILEFORMAT = PARQUET")
      .collect().head.getLong(2) == 0L,
      "ledger lost through DML/compaction — files re-loaded")
    // the clone inherits the ledger
    val dest = freshDir("t3") + "/t"
    GraftSql.execute(spark, s"CREATE TABLE '$dest' SHALLOW CLONE '$root'")
    assert(GraftSql.execute(spark,
      s"COPY INTO '$dest' FROM '$landing' FILEFORMAT = PARQUET")
      .collect().head.getLong(2) == 0L,
      "clone re-loaded files its source already ingested")
  }

  test("CSV under the table schema with FORMAT_OPTIONS; PATTERN filters") {
    val root = freshDir("t4") + "/t"; seedTable(root)
    val landing = freshDir("land4")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "a.csv"),
      "id,src\n100,csvrow\n101,csvrow\n".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "skip.txt"),
      "not,data\n".getBytes("UTF-8"))
    val n = GraftSql.execute(spark,
      s"COPY INTO '$root' FROM '$landing' FILEFORMAT = CSV " +
        "PATTERN = '*.csv' FORMAT_OPTIONS ('header'='true')")
      .collect().head.getLong(2)
    assert(n == 1L)
    val got = VersionedTable.read(spark, root).where(col("src") === "csvrow")
    assert(got.count() == 2 &&
      got.select(min(col("id"))).head.getLong(0) == 100L)
  }

  test("racing COPY threads never double-load a file") {
    val root = freshDir("t6") + "/t"; seedTable(root)
    val landing = freshDir("land6")
    (1 to 4).foreach(b => land(landing, b * 100 until b * 100 + 5, s"b$b"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val loaded = new java.util.concurrent.atomic.AtomicLong(0)
    val threads = (1 to 3).map(i => new Thread(() => {
      try loaded.addAndGet(GraftSql.execute(spark,
        s"COPY INTO '$root' FROM '$landing' FILEFORMAT = PARQUET")
        .collect().head.getLong(2))
      catch { case t: Throwable => errors.add(t) }
    }, s"copier-$i"))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"copier failed: ${errors.peek()}")
    // between them the three copiers loaded each file exactly once
    assert(loaded.get() == 4L, s"files loaded ${loaded.get()} times, not 4")
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 21)
    assert(got.select("id").distinct().count() == 21, "a file double-loaded")
  }

  test("refuses a missing table and unknown formats") {
    val landing = freshDir("land5")
    val e1 = intercept[Exception](GraftSql.execute(spark,
      s"COPY INTO '${freshDir("nope")}/t' FROM '$landing' FILEFORMAT = PARQUET"))
    assert(e1.getMessage.contains("existing versioned table"))
    val root = freshDir("t5") + "/t"; seedTable(root)
    val e2 = intercept[Exception](GraftSql.execute(spark,
      s"COPY INTO '$root' FROM '$landing' FILEFORMAT = AVRO"))
    assert(e2.getMessage.contains("FILEFORMAT"))
  }
}
