package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DELTA-MANIFEST commit form: commits past the carried-ref floor write
  * only their adds/removes (base pointer + depth), readers fold the
  * chain, every fold-interval-th commit writes the full form again, and
  * vacuum materializes a retained version whose chain it severs. The
  * folded view must be INDISTINGUISHABLE from the full form — same
  * rows, same refs, same stats coverage, same sizes. */
class DeltaManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_dmf").toString + "/t"

  /** Delta form on (floor 0) with a small fold interval, reset after. */
  private def withDelta[A](interval: Int = 4)(body: => A): A = {
    spark.conf.set(VersionedTable.DeltaFloorKey, "0")
    spark.conf.set(VersionedTable.DeltaFoldIntervalKey, interval.toString)
    try body
    finally {
      spark.conf.unset(VersionedTable.DeltaFloorKey)
      spark.conf.unset(VersionedTable.DeltaFoldIntervalKey)
    }
  }

  private def batch(lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("id").withColumn("grp", $"id" % 3)
      .withColumn("payload", concat(lit("p"), $"id"))

  test("append chain: deltas between folds, folded reads equal full form, " +
    "stats and sizes flow across the chain") {
    val root = freshRoot()
    withDelta(interval = 4) {
      VersionedTable.commit(batch(0, 10), root) // v1: plain snapshot
      (1 to 6).foreach { i =>                   // v2..v7
        VersionedTable.commitAppend(batch(i * 10L, i * 10L + 10), root)
      }
    }
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasFull(v: Long) = f.exists(new org.apache.hadoop.fs.Path(
      f"$root/v$v%08d/_manifest/manifest.txt"))
    def hasDelta(v: Long) =
      VersionedTable.manifestDeltaOf(spark, root, v).isDefined
    // v2 = first manifest commit (base v1 has no manifest → full);
    // v3..v5 = depths 1..3 under interval 4; v6 = the fold; v7 = delta
    assert(hasFull(2) && !hasDelta(2))
    (3L to 5L).foreach(v => assert(hasDelta(v) && !hasFull(v), s"v$v"))
    assert(hasFull(6) && !hasDelta(6), "v6 must fold the chain")
    assert(hasDelta(7) && !hasFull(7))
    // folded refs reach into every contributing version dir
    val refs7 = VersionedTable.dataFileRefs(spark, root, 7)
    (1L to 7L).foreach(v => assert(refs7.exists(_.startsWith(f"v$v%08d/")),
      s"v7's folded manifest must reference v$v files"))
    // reads: head and every time-travel point serve the right rows
    assert(VersionedTable.read(spark, root).count() == 70L)
    (2L to 7L).foreach { v =>
      val got = VersionedTable.readVersion(spark, root, v)
      assert(got.count() == v * 10L, s"v$v row count")
      assert(got.agg(sum("id")).as[Long].head ==
        (0L until v * 10).sum, s"v$v content")
    }
    // stats flowed: every folded ref covered at a delta version, and
    // key-range pruning answers (fileKeyRanges is all-or-nothing)
    val stats7 = VersionedTable.statsOf(spark, root, 7)
    assert(refs7.forall(stats7.contains), "folded stats must cover all refs")
    val ranges = VersionedTable.fileKeyRanges(spark, root, 7, "id")
    assert(ranges.exists(_.size == refs7.size))
    // sizes flowed: complete without the distributed stat fallback
    val sizes = VersionedTable.fileSizes(spark, root, 7)
    assert(refs7.forall(r => sizes.get(r).exists(_ > 0L)))
    // the protocol records the reader feature on delta versions only
    assert(VersionedTable.protocolOf(spark, root, 3)._1.contains("delta-manifest"))
    assert(!VersionedTable.protocolOf(spark, root, 2)._1.contains("delta-manifest"))
  }

  test("equivalence: the same append/delete/append sequence under delta " +
    "and full form serves identical rows and ref sets") {
    def run(delta: Boolean): (String, Seq[Seq[Any]], Set[String]) = {
      val root = freshRoot()
      def go(): Unit = {
        VersionedTable.commit(batch(0, 30), root)
        VersionedTable.commitAppend(batch(30, 60), root)
        VersionedTable.commitAppend(batch(60, 90), root)
        VersionedTable.deleteWhere(spark, root, col("id") < 10)
        VersionedTable.commitAppend(batch(90, 120), root)
      }
      if (delta) withDelta(interval = 8)(go()) else go()
      val rows = VersionedTable.read(spark, root)
        .orderBy("id").collect().map(_.toSeq).toSeq
      val v = VersionedTable.currentVersion(spark, root).get
      // refs differ in dir naming only when roads diverge — compare the
      // TAIL-free shape: per-version-dir counts
      val refs = VersionedTable.dataFileRefs(spark, root, v).toSet
      (root, rows, refs)
    }
    val (_, rowsD, refsD) = run(delta = true)
    val (_, rowsF, _) = run(delta = false)
    assert(rowsD == rowsF)
    // the delete's delta recorded removes: no ref may resurrect
    assert(rowsD.forall(r => r.head.asInstanceOf[Long] >= 10L))
    assert(refsD.nonEmpty)
  }

  test("change feed and history stay whole across a delta chain") {
    val root = freshRoot()
    withDelta(interval = 6) {
      VersionedTable.commit(batch(0, 10), root)
      (1 to 3).foreach { i =>
        VersionedTable.commitAppend(batch(i * 10L, i * 10L + 10), root,
          changeFeed = true)
      }
      val feed = VersionedTable.readChanges(spark, root, 2, 4)
      assert(feed.count() == 30L)
      assert(feed.where(col("_change_type") === "insert").count() == 30L)
      val h = VersionedTable.history(spark, root)
      assert(h.count() == 4L)
    }
  }

  test("vacuum severing a chain materializes the retained version: full " +
    "sidecars appear, the delta record goes, reads survive") {
    val root = freshRoot()
    withDelta(interval = 10) {
      VersionedTable.commit(batch(0, 10), root)     // v1
      (1 to 4).foreach { i =>                       // v2..v5 (v3..v5 delta)
        VersionedTable.commitAppend(batch(i * 10L, i * 10L + 10), root)
      }
      assert(VersionedTable.manifestDeltaOf(spark, root, 4).isDefined)
      val dropped = VersionedTable.vacuum(spark, root, keepLast = 2)
      assert(dropped == Seq(1L, 2L, 3L))
      // v4 (oldest retained) had base v3 dropped → materialized full
      assert(VersionedTable.manifestDeltaOf(spark, root, 4).isEmpty,
        "v4's delta record must be gone")
      val refs4 = VersionedTable.manifestOf(spark, root, 4).get
      assert(refs4.size == VersionedTable.dataFileRefs(spark, root, 4).size)
      // v5 still folds — through the materialized v4
      assert(VersionedTable.manifestDeltaOf(spark, root, 5).isDefined)
      assert(VersionedTable.read(spark, root).count() == 50L)
      assert(VersionedTable.readVersion(spark, root, 4).count() == 40L)
      // stats + sizes materialized along: coverage holds at both
      Seq(4L, 5L).foreach { v =>
        val refs = VersionedTable.dataFileRefs(spark, root, v)
        val st = VersionedTable.statsOf(spark, root, v)
        assert(refs.forall(st.contains), s"v$v stats coverage after vacuum")
        val sz = VersionedTable.fileSizes(spark, root, v)
        assert(refs.forall(r => sz.get(r).exists(_ > 0L)), s"v$v sizes")
      }
    }
  }

  test("concurrent appenders under the delta form: rebased-in refs land " +
    "in the loser's delta adds, every row survives the fold") {
    val root = freshRoot()
    withDelta(interval = 12) {
      VersionedTable.commit(batch(0, 10), root)
      VersionedTable.commitAppend(batch(10, 20), root) // v2: first manifest
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      // 4 concurrent blind appends: losers rebase the winner's files in
      // by manifest-union — under the delta form those arrive as the
      // loser's delta ADDS (extraRefs), and the fold must carry them
      val writers = (0 until 4).map { w =>
        Future {
          VersionedTable.commitAppend(
            batch(100L + w * 10, 100L + w * 10 + 10), root)
        }
      }
      Await.result(Future.sequence(writers), 120.seconds)
      val cur = VersionedTable.currentVersion(spark, root).get
      val got = VersionedTable.read(spark, root).agg(
        count(lit(1)), sum("id")).as[(Long, Long)].head
      val wantIds = (0L until 20L) ++ (100L until 140L)
      assert(got == ((60L, wantIds.sum)), got.toString)
      // every time-travel point along the contended chain folds whole
      (2L to cur).foreach { v =>
        val refs = VersionedTable.dataFileRefs(spark, root, v)
        assert(refs.nonEmpty && refs.toSet.size == refs.size, s"v$v dup refs")
        assert(VersionedTable.readVersion(spark, root, v).count() >= 20L)
      }
      // sizes stay complete through rebased-in refs (no stat fallback gap)
      val sizes = VersionedTable.fileSizes(spark, root, cur)
      assert(VersionedTable.dataFileRefs(spark, root, cur)
        .forall(r => sizes.get(r).exists(_ > 0L)))
    }
  }

  test("a streaming writer's per-micro-batch commits ride the delta form " +
    "and the change-feed stream reads through the chain") {
    val root = freshRoot()
    withDelta(interval = 5) {
      VersionedTable.commit(batch(0, 10), root)
      (1 to 7).foreach { i =>
        VersionedTable.commitAppend(batch(i * 10L, i * 10L + 10), root,
          changeFeed = true)
      }
      // the chain wrapped once (interval 5): a CDC consumer spanning the
      // fold boundary still gets every version's feed
      val feed = VersionedTable.readChanges(spark, root, 2L, 8L)
      assert(feed.count() == 70L)
      assert(feed.select("_commit_version").distinct().count() == 7L)
    }
  }

  test("metadata-only DDL (ALTER ADD COLUMNS, rename) rides the delta " +
    "form: O(1) sidecar bytes however many files the table carries") {
    val root = freshRoot()
    withDelta(interval = 10) {
      VersionedTable.commit(batch(0, 10), root)
      VersionedTable.commitAppend(batch(10, 20), root) // v2: first manifest
      VersionedTable.addColumns(spark, root, org.apache.spark.sql.types
        .StructType(Seq(org.apache.spark.sql.types.StructField("note",
          org.apache.spark.sql.types.StringType))))     // v3
      VersionedTable.renameColumn(spark, root, "payload", "body") // v4
      (3L to 4L).foreach { v =>
        val d = VersionedTable.manifestDeltaOf(spark, root, v)
        assert(d.isDefined, s"v$v must be delta-formed")
        assert(d.get.removed.isEmpty && d.get.added.size <= 1,
          s"v$v metadata-only delta must be O(1): $d")
      }
      val got = VersionedTable.read(spark, root)
      assert(got.columns.toSet == Set("id", "grp", "body", "note"))
      assert(got.count() == 20L && got.where(col("note").isNull).count() == 20L)
      // stats survive the chain through both DDLs: pruning still answers
      val refs = VersionedTable.dataFileRefs(spark, root, 4L)
      val st = VersionedTable.statsOf(spark, root, 4L)
      assert(refs.filter(_.contains("part-")).forall(st.contains))
    }
  }

  test("a truncated manifest.txt beside a live delta record never serves: " +
    "delta is authoritative, and re-materialization heals in place") {
    val root = freshRoot()
    withDelta(interval = 10) {
      VersionedTable.commit(batch(0, 10), root)       // v1
      (1 to 3).foreach { i =>                         // v2 full, v3/v4 delta
        VersionedTable.commitAppend(batch(i * 10L, i * 10L + 10), root)
      }
      assert(VersionedTable.manifestDeltaOf(spark, root, 4).isDefined)
      // simulate a crash mid-materialize under the OLD in-place write:
      // a truncated (here: empty) manifest.txt beside the delta record
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mf = new org.apache.hadoop.fs.Path(
        s"$root/v00000004/_manifest/manifest.txt")
      f.create(mf, true).close()
      // the fold serves, not the sliver — for refs, reads, stats, sizes
      assert(VersionedTable.read(spark, root).count() == 40L)
      val refs = VersionedTable.dataFileRefs(spark, root, 4)
      (1L to 4L).foreach(v => assert(refs.exists(_.startsWith(f"v$v%08d/")),
        s"v4 must still reference v$v files"))
      // vacuum severing the base re-runs materialization: the truncated
      // file is replaced (temp+rename), the delta retired, reads survive
      VersionedTable.vacuum(spark, root, keepLast = 1)
      assert(VersionedTable.manifestDeltaOf(spark, root, 4).isEmpty)
      assert(VersionedTable.manifestOf(spark, root, 4).get.size == refs.size)
      assert(VersionedTable.read(spark, root).count() == 40L)
    }
  }

  test("a delta sidecar body line without its +/- prefix fails loudly") {
    val root = freshRoot()
    withDelta(interval = 10) {
      VersionedTable.commit(batch(0, 10), root)
      VersionedTable.commitAppend(batch(10, 20), root) // v2: first manifest
      VersionedTable.commitAppend(batch(20, 30), root) // v3: delta form
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val df = new org.apache.hadoop.fs.Path(
        s"$root/v00000003/_manifest/delta.txt")
      val text = {
        val in = f.open(df)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      // strip the first body line's prefix — external corruption shape
      val lines = text.split('\n').toVector
      val i = lines.indexWhere(l => l.startsWith("+") || l.startsWith("-"))
      val corrupt = lines.updated(i, lines(i).drop(1)).mkString("\n")
      val out = f.create(df, true)
      try out.write(corrupt.getBytes("UTF-8")) finally out.close()
      val e = intercept[java.io.IOException] {
        VersionedTable.manifestDeltaOf(spark, root, 3)
      }
      assert(e.getMessage.contains("corrupt delta-manifest"))
    }
  }

  test("small tables under the default floor keep the full form") {
    val root = freshRoot()
    VersionedTable.commit(batch(0, 10), root)
    VersionedTable.commitAppend(batch(10, 20), root)
    VersionedTable.commitAppend(batch(20, 30), root)
    (2L to 3L).foreach(v =>
      assert(VersionedTable.manifestDeltaOf(spark, root, v).isEmpty))
  }
}
