package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, VersionedTable}

/** Copy-on-write merge bench:
  * `runMain graft.tools.CowBench <sfDir> [nFiles] [deltaKeys]`
  *
  * Seeds a versioned mart from the events table (one row per user, the
  * q3 target shape), clusters it into `nFiles` files, then runs the SAME
  * hourly delta through the full-rewrite upsert and the copy-on-write
  * upsert, reporting bytes written and wall time for each. The claim
  * under test: COW's write volume tracks the TOUCHED FILE COUNT
  * (≈ deltaKeys/nFiles of the table when the delta is key-local), not
  * the table size. */
object CowBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(16)
    val deltaKeys = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import org.apache.hadoop.fs.Path

    val ts0 = lit("2024-06-01 00:00:00").cast("timestamp")
    val ts1 = lit("2024-06-02 00:00:00").cast("timestamp")
    val base = graft.operators.Snapshots.stateAsOf(
      graft.sources.Tables.events(spark, sfDir),
      "user_id", "ts", "event_type", "event_id", None)

    def seed(root: String): Unit = {
      Sinks.upsertByKeyVersioned(spark, root, base, "id", ts0, "last_status", "purchase")
      val v = VersionedTable.currentVersion(spark, root).get
      val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = f.listStatus(new Path(root, f"v$v%08d")).toSeq
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
      VersionedTable.optimize(spark, root, Seq("id"),
        targetFileBytes = math.max(1L, bytes / nFiles))
    }
    // key-local delta: the lowest `deltaKeys` ids — the shape of an
    // hourly batch touching one region of a clustered table
    val delta = base.orderBy(col("id")).limit(deltaKeys)
      .withColumn("last_status", lit("purchase"))
      .localCheckpoint(eager = true)

    def newBytes(root: String, v: Long): Long = {
      val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(new Path(root, f"v$v%08d")).toSeq
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val rootFull = java.nio.file.Files.createTempDirectory("cow_full").toString + "/t"
    seed(rootFull)
    val (vF, tFull) = timed(Sinks.upsertByKeyVersioned(
      spark, rootFull, delta, "id", ts1, "last_status", "purchase"))
    val bFull = newBytes(rootFull, vF)

    val rootCow = java.nio.file.Files.createTempDirectory("cow_cow").toString + "/t"
    seed(rootCow)
    val (vC, tCow) = timed(Sinks.upsertByKeyVersionedCow(
      spark, rootCow, delta, "id", ts1, "last_status", "purchase"))
    val bCow = newBytes(rootCow, vC)
    val refs = VersionedTable.manifestOf(spark, rootCow, vC).map(_.size).getOrElse(0)
    val keptRefs = VersionedTable.manifestOf(spark, rootCow, vC)
      .map(_.count(!_.startsWith(f"v$vC%08d/"))).getOrElse(0)

    // BUCKET ROAD ([[graft.sources.Bucketing]]) on a SCATTERED delta —
    // the realistic hourly-upsert shape at 100 TB (random keys touch
    // every region, so the key-range road's pruning stops helping and
    // the merge's exchanges dominate). The bucketized target merges
    // with ZERO target-side exchange: only the O(delta) staging
    // repartition moves through a shuffle. Measured directly as
    // per-road SHUFFLE WRITE BYTES via a listener; the key-LOCAL delta
    // above stays the clustered layout's win (bucketing scatters it
    // over every bucket by design — the layouts trade).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def measured[A](f: => A): (A, Double, Long) = {
      Thread.sleep(500); shuffleBytes.set(0L)
      val (a, t) = timed(f)
      Thread.sleep(500) // let the listener bus drain
      (a, t, shuffleBytes.get)
    }
    val scattered = base.where(col("id") % lit(17) === 0).limit(deltaKeys)
      .withColumn("last_status", lit("purchase"))
      .localCheckpoint(eager = true)

    val rootRng = java.nio.file.Files.createTempDirectory("cow_rng").toString + "/t"
    seed(rootRng)
    val (_, tRng, shRng) = measured(Sinks.upsertByKeyVersionedCow(
      spark, rootRng, scattered, "id", ts1, "last_status", "purchase"))

    val rootBkt = java.nio.file.Files.createTempDirectory("cow_bkt").toString + "/t"
    Sinks.upsertByKeyVersioned(spark, rootBkt, base, "id", ts0, "last_status", "purchase")
    graft.sources.Bucketing.bucketize(spark, rootBkt, "id", nFiles)
    val (vB, tBkt, shBkt) = measured(Sinks.upsertByKeyVersionedCow(
      spark, rootBkt, scattered, "id", ts1, "last_status", "purchase"))
    val bktStamped = VersionedTable.commitInfoOf(spark, rootBkt, vB)
      .get(graft.sources.Bucketing.BucketedInfoKey).contains(s"id,$nFiles")
    // the layout survives its own merge: the SECOND run rides it too
    val (vB2, tBkt2, shBkt2) = measured(Sinks.upsertByKeyVersionedCow(
      spark, rootBkt, scattered.withColumn("last_status", lit("second")),
      "id", ts1, "last_status", "purchase"))
    val bkt2Stamped = VersionedTable.commitInfoOf(spark, rootBkt, vB2)
      .get(graft.sources.Bucketing.BucketedInfoKey).contains(s"id,$nFiles")

    // row-level equality of the results (the bench is also a check)
    val same = VersionedTable.read(spark, rootFull)
      .exceptAll(VersionedTable.read(spark, rootCow)).isEmpty &&
      VersionedTable.read(spark, rootCow)
        .exceptAll(VersionedTable.read(spark, rootFull)).isEmpty
    val sameBkt = VersionedTable.readVersion(spark, rootBkt, vB)
      .exceptAll(VersionedTable.readVersion(spark, rootRng,
        VersionedTable.versions(spark, rootRng).max)).isEmpty

    println(s"""{"metric":"cow_merge","sf":"$sfDir","n_files":$nFiles,"delta_keys":$deltaKeys,"full_bytes":$bFull,"cow_bytes":$bCow,"bytes_ratio":${bCow.toDouble / bFull},"full_sec":$tFull,"cow_sec":$tCow,"manifest_files":$refs,"kept_by_ref":$keptRefs,"results_equal":$same,"scattered_range_sec":$tRng,"scattered_range_shuffle_bytes":$shRng,"scattered_bucket_sec":$tBkt,"scattered_bucket_shuffle_bytes":$shBkt,"scattered_bucket_second_sec":$tBkt2,"scattered_bucket_second_shuffle_bytes":$shBkt2,"bucket_road_used":${bktStamped && bkt2Stamped},"bucket_equal":$sameBkt}""")
    spark.stop()
  }
}
