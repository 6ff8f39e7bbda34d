package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Version-log checkpointing: a streaming table committing one snapshot
  * per micro-batch must resolve its idempotence state (lastTxn) and
  * validate versions in O(1) — from the `_checkpoint` summary plus at
  * most the suffix of versions published after it — never by scanning
  * O(#commits) txn extras or listing the whole log. The "reads nothing
  * old" claims are proven by DELETING the old state and observing the
  * answers survive. */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_ckpt").toString + "/t"

  private def hfs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One tiny commit stamped (appId, batchId) — the shape UpsertStream
    * lands per micro-batch, minus the merge. */
  private def commitTxn(root: String, appId: String, batchId: Long): Long =
    VersionedTable.commit(
      Seq((batchId, appId)).toDF("id", "x").coalesce(1), root,
      extras = Map("txn" -> Seq((appId, batchId)).toDF("app_id", "batch_id")))

  test("checkpoint tracks the log: latest version + per-app txn high-water") {
    val root = freshRoot()
    (0L to 4L).foreach(b => commitTxn(root, "appA", b))
    (0L to 2L).foreach(b => commitTxn(root, "appB", b))
    val ckpt = VersionedTable.readCheckpoint(spark, root).get
    assert(ckpt.version == VersionedTable.currentVersion(spark, root).get)
    assert(ckpt.txns == Map("appA" -> 4L, "appB" -> 2L))
  }

  test("100 micro-batch commits: lastTxn answers without touching ANY per-version txn extra") {
    val root = freshRoot()
    (0L until 100L).foreach(b => commitTxn(root, "stream", b))
    assert(VersionedTable.lastTxn(spark, root, "stream").contains(99L))
    // destroy every per-version txn extra — a scan-based lastTxn would now
    // return None (or crash); the checkpoint-first one must not notice,
    // which PROVES it reads none of the 100 extras
    val f = hfs(root)
    VersionedTable.versions(spark, root).foreach { v =>
      f.delete(new Path(root, f"v$v%08d/_txn"), true)
    }
    assert(VersionedTable.lastTxn(spark, root, "stream").contains(99L))
    // an app the log never saw is still a miss, not a false positive
    assert(VersionedTable.lastTxn(spark, root, "other").isEmpty)
    // readVersion validates membership with one marker probe (no log
    // listing): every one of the 100 versions still resolves
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 1)
    assert(VersionedTable.readVersion(spark, root, 100L).count() == 1)
  }

  test("a commit that crashed before checkpointing is healed by the next one") {
    val root = freshRoot()
    commitTxn(root, "app", 0L)
    commitTxn(root, "app", 1L)
    // simulate the crash window: version 2's publish landed but its
    // checkpoint write didn't — roll the file back to the v1 state
    val f = hfs(root)
    val ck = new Path(root, "_checkpoint/ckpt.tsv")
    f.delete(ck, false)
    commitTxn(root, "app", 2L) // v3's checkpoint must re-cover v1..v3
    val ckpt = VersionedTable.readCheckpoint(spark, root).get
    assert(ckpt.version == 3L && ckpt.txns == Map("app" -> 2L))
    // and with no checkpoint at all, lastTxn falls back to the full scan
    f.delete(ck, false)
    assert(VersionedTable.lastTxn(spark, root, "app").contains(2L))
  }

  test("txn high-water marks survive vacuum; claims are truncated with it") {
    val root = freshRoot()
    (0L to 7L).foreach(b => commitTxn(root, "appA", b))
    commitTxn(root, "appB", 0L) // v9: appA's newest stamp (v8) gets dropped? no —
    // appA's newest stamp lives in v8; keepLast=1 retains only v9 (appB's)
    val dropped = VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(dropped == (1L to 8L))
    // pre-checkpoint this was a replay hole: appA's stamps were vacuumed
    // away, lastTxn returned None, and a restarted appA re-applied batches
    assert(VersionedTable.lastTxn(spark, root, "appA").contains(7L))
    assert(VersionedTable.lastTxn(spark, root, "appB").contains(0L))
    // the claim log is truncated below the dropped max — a year of
    // micro-batch commits can no longer accrete an unbounded _claims dir
    val f = hfs(root)
    val claims = f.listStatus(new Path(root, "_claims")).map(_.getPath.getName.toLong)
    assert(claims.forall(_ > 8L), s"stale claims survived: ${claims.sorted.toSeq}")
    // and the table still commits + reads normally afterwards
    val v = commitTxn(root, "appB", 1L)
    assert(VersionedTable.read(spark, root).count() == 1 && v == 10L)
  }

  test("deep history answers snapshot sizing from the checkpoint + tail, " +
      "not per-version sidecars") {
    val root = freshRoot()
    (0L until 25L).foreach(b => commitTxn(root, "s", b))
    val ckpt = VersionedTable.readCheckpoint(spark, root).get
    assert(ckpt.bytes.keySet == (1L to 25L).toSet,
      s"checkpoint must cover every version's bytes: ${ckpt.bytes.keySet}")
    val truth = VersionedTable.history(spark, root)
      .select("version", "bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.values.forall(_ > 0L))
    // POISON every per-version `_sizes` sidecar (real refs, absurd
    // sizes) and BUST the marker-mtime memo keys — if any sizing road
    // still consulted a sidecar, history would now report the poison
    val f = hfs(root)
    VersionedTable.versions(spark, root).foreach { v =>
      val dir = new Path(root, f"v$v%08d")
      FileSizes.write(f, dir,
        VersionedTable.dataFileRefs(spark, root, v).map(_ -> 7L))
      val now = System.currentTimeMillis()
      f.setTimes(new Path(root, f"_commits/${f"$v%08d"}"), now, now)
    }
    val again = VersionedTable.history(spark, root)
      .select("version", "bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == truth,
      "history read per-version sidecars instead of the checkpoint")
  }

  test("checkpoint is advisory: a stale or unreadable file never changes answers") {
    val root = freshRoot()
    commitTxn(root, "app", 0L)
    commitTxn(root, "app", 1L)
    val f = hfs(root)
    val ck = new Path(root, "_checkpoint/ckpt.tsv")
    // corrupt the checkpoint — readers must fall back to the log scan
    val out = f.create(ck, true)
    try out.write("not a checkpoint".getBytes("UTF-8")) finally out.close()
    assert(VersionedTable.readCheckpoint(spark, root).isEmpty)
    assert(VersionedTable.lastTxn(spark, root, "app").contains(1L))
    // the next commit replaces the corrupt file with a full re-summary
    commitTxn(root, "app", 2L)
    val ckpt = VersionedTable.readCheckpoint(spark, root).get
    assert(ckpt.version == 3L && ckpt.txns == Map("app" -> 2L))
  }

  test("deep history: a cold open is O(1) sidecar reads — metadata " +
    "resolution stays flat while the version log grows, and the read " +
    "cost follows the LIVE FILE COUNT, not the version count") {
    // This format has no Delta-style log replay to checkpoint away:
    // every version dir carries the FULL manifest, stats and sizes, so
    // cold metadata resolution is a constant handful of reads whatever
    // the history depth. Measured at 1,000 versions (SCALING.md):
    // currentVersion 12 ms, dataFileRefs 13 ms, cold maintenanceReport
    // 116 ms — while readVersion was 2.9 s at 1,000 one-row files and
    // 80 ms after ONE compact (36x): the deep-open cost lives in scan
    // setup over manifest files, which compaction owns, not in the log.
    // The spec re-proves the shape at 200 versions inside suite budget.
    val root = freshRoot()
    val n = 200
    VersionedTable.commit(Seq((0L, "seed")).toDF("id", "x"), root)
    (1 until n).foreach { i =>
      VersionedTable.commitAppend(Seq((i.toLong, s"r$i")).toDF("id", "x"),
        root, changeFeed = false)
    }
    def ms[A](body: => A): Double = {
      val s = System.nanoTime(); body; (System.nanoTime() - s) / 1e6
    }
    // metadata-only resolution at depth n: milliseconds-class, one
    // version dir's sidecars (generous bound — CI hosts are noisy)
    val v = VersionedTable.currentVersion(spark, root).get
    assert(v == n.toLong)
    val tRefs = ms(VersionedTable.dataFileRefs(spark, root, v))
    val tMaint = ms(VersionedTable.maintenanceReport(spark, root,
      measureAnnDrift = false))
    assert(tRefs < 2000 && tMaint < 5000,
      f"deep-history metadata resolution regressed: refs $tRefs%.0f ms, " +
        f"maintenance $tMaint%.0f ms")
    // the scan cost follows live file count: after one compact the same
    // 200-row read collapses with the file count while the version log
    // is 1 DEEPER than before
    // best-of-3 both sides: single-shot wall times flake under host CPU
    // steal (±15% is normal here); the 200-vs-few file gap is ~10×, so
    // best-of-3 with no margin is a stable assertion of the SHAPE
    val tReadDeep = (1 to 3).map(_ =>
      ms(VersionedTable.read(spark, root).count())).min
    VersionedTable.compact(spark, root)
    val tReadCompact = (1 to 3).map(_ =>
      ms(VersionedTable.read(spark, root).count())).min
    assert(VersionedTable.read(spark, root).count() == n.toLong)
    assert(tReadCompact < tReadDeep,
      f"post-compact read ($tReadCompact%.0f ms) should beat the " +
        f"$n-file manifest read ($tReadDeep%.0f ms)")
    val refsAfter = VersionedTable.dataFileRefs(spark, root,
      VersionedTable.currentVersion(spark, root).get)
    assert(refsAfter.size < 20, s"compact left ${refsAfter.size} files")
  }
}
