package graft.sources

import graft.SparkSpec

/** Vacuum safety rails: the age-based retention window (an in-flight
  * reader of a RECENT version must not lose files under it, however many
  * commits landed since) and the txn-stamp coverage guard (an idempotence
  * stamp is only destroyed once the version-log checkpoint provably
  * carries its high-water mark forward). */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_vac").toString + "/t"

  test("retention window: young versions survive keepLast, aged ones drop") {
    val root = freshRoot()
    (1 to 4).foreach(i => VersionedTable.commit(Seq((i.toLong, "x")).toDF("id", "x"), root))
    // all four commits are seconds old: an hour-long window drops nothing
    assert(VersionedTable.vacuum(spark, root, keepLast = 1,
      olderThanMs = Some(3600L * 1000)) == Seq.empty)
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L, 3L, 4L))
    // a zero window degenerates to plain keepLast
    assert(VersionedTable.vacuum(spark, root, keepLast = 2,
      olderThanMs = Some(0L)) == Seq(1L, 2L))
    assert(VersionedTable.versions(spark, root) == Seq(3L, 4L))
  }

  test("txn-stamped commits survive vacuum when the checkpoint cannot cover them") {
    val root = freshRoot()
    def stamp(b: Long) = Seq(("appA", b)).toDF("app_id", "batch_id")
    VersionedTable.commit(Seq((1L, "x")).toDF("id", "x"), root,
      extras = Map("txn" -> stamp(10L)))
    VersionedTable.commit(Seq((2L, "x")).toDF("id", "x"), root,
      extras = Map("txn" -> stamp(11L)))
    VersionedTable.commit(Seq((3L, "x")).toDF("id", "x"), root)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a table whose checkpoint was never written and CANNOT be
    // (pre-upgrade table + failing checkpoint writes): blow away the dir
    // and wedge a FILE in its place so mkdirs/create inside
    // writeCheckpoint fail and the best-effort write is skipped
    val ckDir = new org.apache.hadoop.fs.Path(root, "_checkpoint")
    f.delete(ckDir, true)
    f.create(ckDir, false).close()
    val dropped = VersionedTable.vacuum(spark, root, keepLast = 1)
    // v1/v2 carry appA's stamps and no checkpoint covers them: KEPT.
    // (pre-guard, vacuum destroyed them and lastTxn reset — the replay
    // hole the checkpoint was meant to close, reopened.)
    assert(dropped == Seq.empty)
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L, 3L))
    assert(VersionedTable.lastTxn(spark, root, "appA").contains(11L))
    // unwedge the checkpoint: vacuum can now establish coverage and drop
    f.delete(ckDir, false)
    val dropped2 = VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(dropped2 == Seq(1L, 2L))
    // the stamps live on in the checkpoint
    assert(VersionedTable.lastTxn(spark, root, "appA").contains(11L))
  }

  test("feed loss guard: a vacuumed version in range raises; fresh consumers start past it") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    def feedCommit(i: Long) = VersionedTable.commit(
      Seq((i, "x")).toDF("id", "x"), root,
      extras = Map("changes" ->
        Seq((i, "x")).toDF("id", "x").withColumn("_change_type", lit("insert"))))
    (1L to 4L).foreach(feedCommit)
    assert(VersionedTable.vacuum(spark, root, keepLast = 2) == Seq(1L, 2L))
    assert(VersionedTable.vacuumedVersions(spark, root) == Set(1L, 2L))
    // a consumer whose checkpoint predates the drop fails LOUDLY
    val e = intercept[java.io.IOException] {
      VersionedTable.readChanges(spark, root, 1L, 4L)
    }
    assert(e.getMessage.contains("lost version"))
    // ranges past the drop line read fine
    assert(VersionedTable.readChanges(spark, root, 3L, 4L).count() == 2)
    // fresh consumers begin past every dropped version
    assert(VersionedTable.earliestFeedStart(spark, root) == 3L)
    val ck = java.nio.file.Files.createTempDirectory("graft_vac_ck").toString
    assert(VersionedTable.consumeChanges(spark, root, ck)(df =>
      assert(df.count() == 2)).contains((3L, 4L)))
    // pre-upgrade table (no ledger): the guard stands down — old behavior
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root, "_vacuumed"), true)
    assert(VersionedTable.readChanges(spark, root, 1L, 4L).count() == 2)
  }

  test("feed loss guard: stream restarted below the drop line stops loudly") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    def feedCommit(i: Long) = VersionedTable.commit(
      Seq((i, "x")).toDF("id", "x"), root,
      extras = Map("changes" ->
        Seq((i, "x")).toDF("id", "x").withColumn("_change_type", lit("insert"))))
    (1L to 3L).foreach(feedCommit)
    VersionedTable.vacuum(spark, root, keepLast = 1)
    // fresh stream on the vacuumed table: starts at earliestFeedStart
    // and drains only the retained version
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vac_st").toString
    val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.streaming.ChangeFeedStream.read(spark, root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.select("id").collect().map(_.getLong(0)) }
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(rows.toSeq == Seq(3L))
  }

  test("unstamped aged versions drop even while an uncovered stamped one is held") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "x")).toDF("id", "x"), root) // no stamp
    VersionedTable.commit(Seq((2L, "x")).toDF("id", "x"), root,
      extras = Map("txn" -> Seq(("appB", 5L)).toDF("app_id", "batch_id")))
    VersionedTable.commit(Seq((3L, "x")).toDF("id", "x"), root)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckDir = new org.apache.hadoop.fs.Path(root, "_checkpoint")
    f.delete(ckDir, true)
    f.create(ckDir, false).close()
    val dropped = VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(dropped == Seq(1L)) // v2 held back (stamped, uncovered), v1 goes
    assert(VersionedTable.versions(spark, root) == Seq(2L, 3L))
    assert(VersionedTable.lastTxn(spark, root, "appB").contains(5L))
  }

  test("janitor: vacuum removes hour-old orphaned staging dirs, keeps fresh ones") {
    import org.apache.hadoop.fs.Path
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "x")).toDF("id", "x"), root)
    VersionedTable.commit(Seq((2L, "x")).toDF("id", "x"), root)
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed writer's leftover (old) and an in-flight writer's (fresh)
    val old = new Path(root, "_staging/dead-writer")
    val fresh = new Path(root, "_staging/in-flight")
    f.mkdirs(old); f.mkdirs(fresh)
    f.setTimes(old, System.currentTimeMillis() - 2L * 3600 * 1000, -1)
    VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(!f.exists(old), "orphaned staging dir survived vacuum")
    assert(f.exists(fresh), "in-flight staging dir must not be touched")
  }

  test("converted-in-place originals reclaim once a rewrite absorbs them; " +
      "a clone's vacuum never reaches its source") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_vac_cv").toString + "/t"
    (1 to 200).map(i => (i.toLong, i % 4, s"r$i")).toDF("id", "g", "x")
      .repartition(2).write.partitionBy("g").parquet(dir)
    VersionedTable.convertToGraft(spark, dir)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hiveDirs() = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("g="))
    assert(hiveDirs().nonEmpty)
    // compact absorbs the originals into the native layout...
    VersionedTable.compact(spark, dir)
    // ...but they stay until retention lets the referencing version go
    VersionedTable.vacuum(spark, dir, keepLast = 2)
    assert(hiveDirs().nonEmpty, "retained v1 still references the originals")
    VersionedTable.vacuum(spark, dir, keepLast = 1)
    assert(hiveDirs().isEmpty,
      "unreferenced originals must reclaim (the 2x-storage-forever leak)")
    assert(VersionedTable.read(spark, dir).count() == 200)
    assert(VersionedTable.read(spark, dir).where(col("g") === 2L).count() == 50)

    // shallow clone: the clone's refs point into the SOURCE root; its
    // vacuum must never delete across the table boundary
    val src = freshRoot()
    VersionedTable.commit((1L to 100L).map(i => (i, s"r$i")).toDF("id", "x")
      .repartition(2), src)
    val clone = freshRoot()
    VersionedTable.shallowClone(spark, clone, src)
    VersionedTable.compact(spark, clone) // clone now owns all its files
    VersionedTable.vacuum(spark, clone, keepLast = 1)
    assert(VersionedTable.read(spark, src).count() == 100,
      "vacuuming a clone deleted its source's files")
    assert(VersionedTable.read(spark, clone).count() == 100)
  }
}
