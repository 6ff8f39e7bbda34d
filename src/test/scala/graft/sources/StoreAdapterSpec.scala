package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The storage-adapter seam ([[StoreAdapter]]): commit arbitration must
  * hold on stores WITHOUT atomic rename-no-overwrite — i.e. where 100 TB
  * tables actually live. [[BrokenRenameFileSystem]] simulates that store
  * class: rename overwrites (copy+delete move semantics), and the only
  * atomic primitive is conditional create (S3 If-None-Match PUT,
  * materializing content at close). The spec proves (1) the broken store
  * really does break the rename road's core assumption, (2) the
  * conditional-put adapter arbitrates exactly one winner there, and
  * (3) end-to-end: monitor-disjoint writers racing full commits through
  * the conditional-put road lose nothing. */
class StoreAdapterSpec extends SparkSpec {
  import spark.implicits._

  private def hc = spark.sparkContext.hadoopConfiguration

  override def beforeAll(): Unit = {
    super.beforeAll()
    hc.set("fs.broken.impl", classOf[BrokenRenameFileSystem].getName)
    hc.set("graft.store.adapter.broken", "conditional-put")
  }

  private def freshBase() =
    java.nio.file.Files.createTempDirectory("graft_store").toString

  test("spelling variants of one root share the in-JVM publish monitor; symlinks do not") {
    val baseDir = java.nio.file.Files.createTempDirectory("graft_lockkey")
    val real = baseDir.resolve("real")
    java.nio.file.Files.createDirectory(real)
    val link = baseDir.resolve("link")
    java.nio.file.Files.createSymbolicLink(link, real)
    val f = new Path(real.toString).getFileSystem(hc)
    val a = VersionedTable.publishLock(f, real.toString + "/t")
    val b = VersionedTable.publishLock(f, "file:" + real.toString + "/t")
    val c = VersionedTable.publishLock(f, real.toString + "/./t")
    assert((a eq b) && (b eq c),
      "three spellings of one path must canonicalize to one monitor")
    val d = VersionedTable.publishLock(f, link.toString + "/t")
    assert(!(a eq d),
      "textual canonicalization must not pretend to see through symlinks")
  }

  test("adapter selection: per-scheme conf, sane defaults, unknown names refuse") {
    val local = new Path("file:///tmp").getFileSystem(hc)
    assert(StoreAdapter.forFs(local) == LocalStoreAdapter)
    val broken = new Path("broken:///tmp").getFileSystem(hc)
    assert(StoreAdapter.forFs(broken) == ConditionalPutStoreAdapter)
    intercept[IllegalArgumentException](StoreAdapter.byName("mystery"))
  }

  test("the broken store overwrites on rename — the assumption the rename road needs is gone") {
    val base = freshBase()
    val f = new Path("broken://" + base).getFileSystem(hc)
    val target = new Path("broken://" + base + "/marker")
    val o1 = f.create(target, true); o1.write("first".getBytes("UTF-8")); o1.close()
    val tmp = new Path("broken://" + base + "/tmp")
    val o2 = f.create(tmp, true); o2.write("second".getBytes("UTF-8")); o2.close()
    // on HDFS this rename FAILS (destination exists); here it overwrites —
    // so rename carries no arbitration power on this store class
    assert(f.rename(tmp, target), "object-store move should clobber")
    val in = f.open(target)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    assert(got == "second", "destination was replaced — rename overwrote")
  }

  test("conditional-put arbitration: exactly one of N concurrent publishers wins, content = winner's") {
    val base = freshBase()
    val f = new Path("broken://" + base).getFileSystem(hc)
    val target = new Path("broken://" + base + "/m")
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        try {
          gate.await()
          if (ConditionalPutStoreAdapter.putIfAbsent(
              f, target, s"writer-$i".getBytes("UTF-8"))) wins.add(i)
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(60000))
    assert(errors.isEmpty, s"publisher threw: ${errors.peek()}")
    assert(wins.size == 1, s"expected exactly one winner, got $wins")
    val in = f.open(target)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  finally in.close()
    assert(content == s"writer-${wins.peek()}",
      "the surviving content must be the winner's — no torn/clobbered marker")
    // claims ride the same primitive
    val claimTarget = new Path("broken://" + base + "/c")
    assert(ConditionalPutStoreAdapter.claim(f, claimTarget))
    assert(!ConditionalPutStoreAdapter.claim(f, claimTarget))
  }

  test("end-to-end on the broken store: monitor-disjoint writers, zero lost updates, dense versions") {
    // a real path and a symlinked one → two unrelated in-JVM monitors
    // (the publish lock canonicalizes SPELLINGS, but text cannot see
    // through a symlink): the race is decided by the store's conditional
    // create, exactly as two processes would
    val baseDir = java.nio.file.Files.createTempDirectory("graft_store_e2e")
    val real = baseDir.resolve("real")
    java.nio.file.Files.createDirectory(real)
    val link = baseDir.resolve("link")
    java.nio.file.Files.createSymbolicLink(link, real)
    val spellingA = "broken://" + real.toString + "/t"
    val spellingB = "broken://" + link.toString + "/t"
    val runTs = lit("2024-06-01 00:00:00").cast("timestamp")
    def stg(ids: Seq[Long]) =
      ids.map(i => (i, "OPEN")).toDF("id", "last_status")
        .withColumn("created_at", lit("2024-05-30 10:00:00").cast("timestamp"))
    Sinks.upsertByKeyVersioned(spark, spellingA, stg(Seq(0L)),
      "id", runTs, "last_status", "DONE")
    val perWriter = 5
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(root: String, ids: Range, name: String) = new Thread(() => {
      try ids.foreach { i =>
        Sinks.upsertByKeyVersioned(spark, root, stg(Seq(i.toLong)),
          "id", runTs, "last_status", "DONE")
      } catch { case t: Throwable => errors.add(t) }
    }, name)
    val a = writer(spellingA, 1 to perWriter, "store-a")
    val b = writer(spellingB, 101 to 100 + perWriter, "store-b")
    a.start(); b.start(); a.join(300000); b.join(300000)
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
    val ids = VersionedTable.read(spark, spellingA)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = Set(0L) ++ (1 to perWriter).map(_.toLong) ++
      (101 to 100 + perWriter).map(_.toLong)
    assert(ids == want, s"lost updates on the broken store: ${want -- ids}")
    val vs = VersionedTable.versions(spark, spellingA)
    assert(vs == (1L to (2L * perWriter + 1L)),
      s"published versions not dense: $vs")
    vs.foreach(v => VersionedTable.readVersion(spark, spellingA, v).count())
  }
}
