package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** SQL MERGE write-volume bench:
  * `runMain graft.tools.MergeBench <sfDir> [nFiles] [deltaKeys]`
  *
  * Seeds a versioned table from the events table, clusters it into
  * `nFiles` files, then runs the SAME key-local merge (update a few
  * clustered keys + insert a few new ones) through both MERGE roads:
  * the full-rewrite form (forced by an identity NOT MATCHED BY SOURCE
  * update — by-source actions disable pruning) and the touched-file
  * copy-on-write form (the default when no by-source action exists).
  * Reports bytes written, files carried by reference, and row equality.
  * The claim under test: a MERGE touching k of n clustered files writes
  * ≈ k/n of the table, not all of it. */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(16)
    val deltaKeys = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import org.apache.hadoop.fs.Path

    // one row per event: a wide-ish clustered mart keyed by event_id
    val base = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id").as("id"), col("user_id"), col("event_type"),
        col("ts"), col("value").as("amount"))

    def seed(root: String): Unit = {
      VersionedTable.commit(base, root)
      val v = VersionedTable.currentVersion(spark, root).get
      val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = f.listStatus(new Path(root, f"v$v%08d")).toSeq
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
      VersionedTable.optimize(spark, root, Seq("id"),
        targetFileBytes = math.max(1L, bytes / nFiles))
    }
    // key-local delta: update the lowest `deltaKeys` ids, insert as many
    // brand-new ones — the hourly-batch shape against a clustered table
    val updates = base.orderBy(col("id")).limit(deltaKeys)
      .withColumn("event_type", lit("merged"))
    val maxId = base.agg(max(col("id"))).head.getLong(0)
    val inserts = updates.withColumn("id", col("id") + lit(maxId + 1000L))
    updates.unionByName(inserts).localCheckpoint(eager = true)
      .createOrReplaceTempView("merge_bench_src")

    def newBytes(root: String, v: Long): Long = {
      val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(new Path(root, f"v$v%08d")).toSeq
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def mergeSql(root: String, forceFull: Boolean): String =
      s"""MERGE INTO `$root` t USING merge_bench_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET event_type = s.event_type
         |WHEN NOT MATCHED THEN INSERT (id, user_id, event_type, ts, amount)
         |  VALUES (s.id, s.user_id, s.event_type, s.ts, s.amount)
         |""".stripMargin +
        (if (forceFull) "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET event_type = t.event_type\n"
         else "")

    val rootFull = java.nio.file.Files.createTempDirectory("merge_full").toString + "/t"
    seed(rootFull)
    val (_, tFull) = timed(
      graft.plans.GraftSql.execute(spark, mergeSql(rootFull, forceFull = true)).collect())
    val vF = VersionedTable.currentVersion(spark, rootFull).get
    val bFull = newBytes(rootFull, vF)

    val rootCow = java.nio.file.Files.createTempDirectory("merge_cow").toString + "/t"
    seed(rootCow)
    val (_, tCow) = timed(
      graft.plans.GraftSql.execute(spark, mergeSql(rootCow, forceFull = false)).collect())
    val vC = VersionedTable.currentVersion(spark, rootCow).get
    val bCow = newBytes(rootCow, vC)
    val refs = VersionedTable.manifestOf(spark, rootCow, vC).map(_.size).getOrElse(0)
    val keptRefs = VersionedTable.manifestOf(spark, rootCow, vC)
      .map(_.count(!_.startsWith(f"v$vC%08d/"))).getOrElse(0)

    // third road: MERGE-ON-READ (deletion vectors enabled by table
    // property) — matched rows masked in place, only updated images +
    // inserts written fresh
    val rootMor = java.nio.file.Files.createTempDirectory("merge_mor").toString + "/t"
    seed(rootMor)
    VersionedTable.setProperties(spark, rootMor,
      Map("graft.enableDeletionVectors" -> "true"))
    val (_, tMor) = timed(
      graft.plans.GraftSql.execute(spark, mergeSql(rootMor, forceFull = false)).collect())
    val vM = VersionedTable.currentVersion(spark, rootMor).get
    val bMor = newBytes(rootMor, vM)
    val dvBytes = {
      val f = new Path(rootMor).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new Path(new Path(rootMor, f"v$vM%08d"), "_dv")
      if (!f.exists(p)) 0L
      else f.listStatus(p).toSeq.map(_.getLen).sum
    }

    // fourth road: the RECORDED BUCKET LAYOUT (graft.sources.Bucketing)
    // under the SQL MERGE — the claimed target side moves ZERO bytes
    // through any exchange; only the delta and the written rows shuffle.
    // Measured as shuffle WRITE bytes per merge, against the key-range
    // COW road above on the same delta. The second merge shows the
    // stamped commit keeps the road (no re-bucketize between runs).
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
      Thread.sleep(500)
      (a, t, shuffleBytes.get)
    }
    // measured with broadcast OFF: the comparison targets the shuffle
    // behavior at the scale the roads exist for — a 100 TB table's
    // hourly delta does not broadcast, so letting the toy delta ride a
    // BroadcastHashJoin would vacuously flatten both columns
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // key-range road's shuffle bytes on a fresh seed (same delta)
    val rootRng = java.nio.file.Files.createTempDirectory("merge_rng").toString + "/t"
    seed(rootRng)
    val (_, tRng, shRng) = measured(
      graft.plans.GraftSql.execute(spark, mergeSql(rootRng, forceFull = false)).collect())
    val rootBkt = java.nio.file.Files.createTempDirectory("merge_bkt").toString + "/t"
    seed(rootBkt)
    graft.sources.Bucketing.bucketize(spark, rootBkt, "id", nFiles)
    val (_, tBkt, shBkt) = measured(
      graft.plans.GraftSql.execute(spark, mergeSql(rootBkt, forceFull = false)).collect())
    val vB1 = VersionedTable.currentVersion(spark, rootBkt).get
    val bkt1Stamped = VersionedTable.commitInfoOf(spark, rootBkt, vB1)
      .get(graft.sources.Bucketing.BucketedInfoKey).contains(s"id,$nFiles")
    val (_, tBkt2, shBkt2) = measured(
      graft.plans.GraftSql.execute(spark, mergeSql(rootBkt, forceFull = false)).collect())
    val vB2 = VersionedTable.currentVersion(spark, rootBkt).get
    val bkt2Stamped = VersionedTable.commitInfoOf(spark, rootBkt, vB2)
      .get(graft.sources.Bucketing.BucketedInfoKey).contains(s"id,$nFiles")
    // fifth road: MOR x BUCKET — the masked target's merge rides the
    // claimed TAGGED slice (zero target-side exchange) and its written
    // delta re-enters the layout through one explicit O(delta)
    // repartition. Compared against MOR on the key-range road (same
    // delta, DVs enabled, no layout).
    val rootMorRng = java.nio.file.Files.createTempDirectory("merge_mr").toString + "/t"
    seed(rootMorRng)
    VersionedTable.setProperties(spark, rootMorRng,
      Map("graft.enableDeletionVectors" -> "true"))
    val (_, tMorRng, shMorRng) = measured(
      graft.plans.GraftSql.execute(spark, mergeSql(rootMorRng, forceFull = false)).collect())
    val rootMorBkt = java.nio.file.Files.createTempDirectory("merge_mb").toString + "/t"
    seed(rootMorBkt)
    graft.sources.Bucketing.bucketize(spark, rootMorBkt, "id", nFiles)
    VersionedTable.setProperties(spark, rootMorBkt,
      Map("graft.enableDeletionVectors" -> "true"))
    val (_, tMorBkt, shMorBkt) = measured(
      graft.plans.GraftSql.execute(spark, mergeSql(rootMorBkt, forceFull = false)).collect())
    val (_, tMorBkt2, shMorBkt2) = measured(
      graft.plans.GraftSql.execute(spark, mergeSql(rootMorBkt, forceFull = false)).collect())
    val vMB = VersionedTable.currentVersion(spark, rootMorBkt).get
    val morBktStamped = VersionedTable.commitInfoOf(spark, rootMorBkt, vMB)
      .get(graft.sources.Bucketing.BucketedInfoKey).contains(s"id,$nFiles") &&
      VersionedTable.hasDeletionVectors(spark, rootMorBkt, vMB)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // row-level equality of the results (the bench is also a check)
    def sameAs(a: String, b: String): Boolean =
      VersionedTable.read(spark, a).exceptAll(VersionedTable.read(spark, b)).isEmpty &&
        VersionedTable.read(spark, b).exceptAll(VersionedTable.read(spark, a)).isEmpty
    val same = sameAs(rootFull, rootCow) && sameAs(rootCow, rootMor)
    val sameBkt = sameAs(rootRng, rootBkt)
    val sameMorBkt = sameAs(rootMorRng, rootMorBkt)

    println(s"""{"metric":"merge_cow","sf":"$sfDir","n_files":$nFiles,"delta_keys":$deltaKeys,"full_bytes":$bFull,"cow_bytes":$bCow,"mor_bytes":$bMor,"mor_dv_bytes":$dvBytes,"bytes_ratio":${bCow.toDouble / bFull},"mor_ratio":${(bMor + dvBytes).toDouble / bFull},"full_sec":$tFull,"cow_sec":$tCow,"mor_sec":$tMor,"manifest_files":$refs,"kept_by_ref":$keptRefs,"results_equal":$same,"sql_range_sec":$tRng,"sql_range_shuffle_bytes":$shRng,"sql_bucket_sec":$tBkt,"sql_bucket_shuffle_bytes":$shBkt,"sql_bucket_second_sec":$tBkt2,"sql_bucket_second_shuffle_bytes":$shBkt2,"sql_bucket_road_used":${bkt1Stamped && bkt2Stamped},"sql_bucket_equal":$sameBkt,"mor_range_sec":$tMorRng,"mor_range_shuffle_bytes":$shMorRng,"mor_bucket_sec":$tMorBkt,"mor_bucket_shuffle_bytes":$shMorBkt,"mor_bucket_second_sec":$tMorBkt2,"mor_bucket_second_shuffle_bytes":$shMorBkt2,"mor_bucket_road_used":$morBktStamped,"mor_bucket_equal":$sameMorBkt}""")
    spark.stop()
  }
}
