package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, VersionedTable}

/** Bucket-COUNT scaling probe:
  * `runMain graft.tools.BucketScaleBench <sfDir> [counts]`
  *
  * The bucket road's honest driver-side cost is O(n) per merge: the
  * aligned slice builds one per-bucket plan for the detection scan and
  * one for the merge slice (2n analyzed frames), whatever the data
  * size. This probe holds the TABLE and the DELTA fixed and sweeps the
  * bucket count, so the per-merge wall difference across n isolates
  * that driver term — the number a workload uses to pick its bucket
  * count (shuffle savings scale with data; the driver term scales with
  * n). Reports per-n: merge wall (second merge, riding the stamp — the
  * steady-state shape) and shuffle-write bytes. */
object BucketScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16, 64, 256))
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val base = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id").as("id"), col("user_id"), col("event_type"),
        col("ts"), col("value").as("amount"))
    val maxId = base.agg(max(col("id"))).head.getLong(0)
    val updates = base.orderBy(col("id")).limit(50)
      .withColumn("event_type", lit("merged"))
    val inserts = updates.withColumn("id", col("id") + lit(maxId + 1000L))
    updates.unionByName(inserts).localCheckpoint(eager = true)
      .createOrReplaceTempView("bkt_scale_src")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def mergeSql(root: String): String =
      s"""MERGE INTO `$root` t USING bkt_scale_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET event_type = s.event_type
         |WHEN NOT MATCHED THEN INSERT (id, user_id, event_type, ts, amount)
         |  VALUES (s.id, s.user_id, s.event_type, s.ts, s.amount)
         |""".stripMargin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val rows = counts.map { n =>
      val root = java.nio.file.Files
        .createTempDirectory(s"bkt_scale_$n").toString + "/t"
      VersionedTable.commit(base, root)
      Bucketing.bucketize(spark, root, "id", n)
      // first merge warms the road; the SECOND is the steady state
      graft.plans.GraftSql.execute(spark, mergeSql(root)).collect()
      Thread.sleep(300); shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      graft.plans.GraftSql.execute(spark, mergeSql(root)).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val sh = shuffleBytes.get
      val v = VersionedTable.currentVersion(spark, root).get
      val rode = VersionedTable.commitInfoOf(spark, root, v)
        .get(Bucketing.BucketedInfoKey).contains(s"id,$n")
      s""""n$n":{"merge_sec":$wall,"shuffle_bytes":$sh,"road":$rode}"""
    }
    println(s"""{"metric":"bucket_scale","sf":"$sfDir",${rows.mkString(",")}}""")
    spark.stop()
  }
}
