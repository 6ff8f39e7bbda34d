package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CROSS-PROCESS publish arbitration: the winner-takes-version-N commit
  * (marker written tmp-then-rename, content naming the data dir) must
  * hold WITHOUT the per-root in-JVM monitor — two separate processes
  * share no monitor. Simulated here by addressing one physical table
  * through a real path and a SYMLINKED one: the publish monitor keys on
  * the canonicalized root STRING (spelling variants of one path now
  * share a monitor — the in-JVM fast path), but textual
  * canonicalization cannot see through a symlink, so the two writers
  * take two unrelated locks and race the filesystem protocol exactly as
  * two driver processes would, while every read resolves to the same
  * files. */
class CrossProcessPublishSpec extends SparkSpec {
  import spark.implicits._

  private val runTs = lit("2024-06-01 00:00:00").cast("timestamp")

  private def stg(ids: Seq[Long], tag: String) =
    ids.map(i => (i, "OPEN", tag)).toDF("id", "last_status", "c")
      .withColumn("created_at", lit("2024-05-30 10:00:00").cast("timestamp"))
      .drop("c")

  test("two monitor-disjoint writers (distinct root spellings): " +
    "no lost update, dense version numbers, every id present") {
    val baseDir = java.nio.file.Files.createTempDirectory("graft_xproc")
    val real = baseDir.resolve("real")
    java.nio.file.Files.createDirectory(real)
    val link = baseDir.resolve("link")
    java.nio.file.Files.createSymbolicLink(link, real)
    val spellingA = real.toString + "/t" // real path → one monitor key
    val spellingB = link.toString + "/t" // symlink → another (canonicalization is textual)
    Sinks.upsertByKeyVersioned(spark, spellingA, stg(Seq(0L), "seed"),
      "id", runTs, "last_status", "DONE")

    val perWriter = 6
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(root: String, ids: Range, name: String) = new Thread(() => {
      try ids.foreach { i =>
        Sinks.upsertByKeyVersioned(spark, root, stg(Seq(i.toLong), name),
          "id", runTs, "last_status", "DONE")
      } catch { case t: Throwable => errors.add(t) }
    }, name)
    val a = writer(spellingA, 1 to perWriter, "xproc-a")
    val b = writer(spellingB, 101 to 100 + perWriter, "xproc-b")
    a.start(); b.start(); a.join(300000); b.join(300000)
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")

    // no lost update: every id from both writers is in the final state
    val ids = VersionedTable.read(spark, spellingA)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = (Set(0L) ++ (1 to perWriter).map(_.toLong)
      ++ (101 to 100 + perWriter).map(_.toLong))
    assert(ids == want, s"lost updates: missing ${want -- ids}")

    // winner-takes-N: published numbers are DENSE (1..2N+1), whatever
    // dir names the burned claims consumed
    val vs = VersionedTable.versions(spark, spellingA)
    assert(vs == (1L to (2L * perWriter + 1L)),
      s"published versions not dense: $vs")

    // every published version resolves and time-travels, including any
    // whose marker points at a claim-named dir above its own number
    vs.foreach(v => VersionedTable.readVersion(spark, spellingA, v).count())

    // the change feed is contiguous across the whole interleaving
    val feed = VersionedTable.readChanges(spark, spellingA, 2L, vs.max)
    assert(feed.where(col("_change_type") === "insert").count() ==
      2L * perWriter)
  }

  test("a marker above a burned claim maps to its claim-named dir and " +
    "survives restore + vacuum") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_xproc2").toString + "/t"
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    // burn claim 2: an aborted commit (preCommit throws) keeps the claim
    intercept[RuntimeException](VersionedTable.commit(
      Seq((9L, "never")).toDF("id", "x"), root,
      preCommit = _ => throw new RuntimeException("abort")))
    // the next commit stages under dir v00000003 but publishes as v2
    val v = VersionedTable.commit(Seq((2L, "b")).toDF("id", "x"), root)
    assert(v == 2L)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/v00000003")),
      "expected the diverged claim-named dir")
    assert(VersionedTable.readVersion(spark, root, 2L)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // restore back to v1 (a third commit, dir v00000004, number 3)
    VersionedTable.restore(spark, root, 1L)
    assert(VersionedTable.read(spark, root)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // vacuum drops v1..v2 and must delete the DIVERGED dirs they own
    VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(VersionedTable.versions(spark, root) == Seq(3L))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/v00000003")),
      "vacuum left the diverged dir of a dropped version behind")
    assert(VersionedTable.read(spark, root)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
