package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Measures the round-8 table-format motions against their naive roads
  * on a real table (orders at `SPARK_GRAFT_SF_DIR`): metadata-only
  * RENAME COLUMN vs the full rewrite a mapping-less format needs,
  * SHALLOW CLONE vs a data copy, and the bytes each publishes. One JSON
  * line on stdout; numbers land in SCALING.md. */
object FormatBench {
  private def dirBytes(p: String): Long = {
    val f = new java.io.File(p)
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty)
      .map(x => dirBytes(x.getPath)).sum
  }
  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the CANONICAL session builder — a hand-rolled "mirror" here had
    // already drifted (it missed the AQE-cached-plan and codegen-cache
    // confs, so this profiler measured a session no query key runs in)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val scratch = java.nio.file.Files.createTempDirectory("graft_fmtbench").toString
    val root = scratch + "/t"
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")

    val (_, tBuild) = time { VersionedTable.commit(orders, root) }
    val tableBytes = dirBytes(root)

    // metadata-only rename vs the rewrite road (what a format without
    // column mapping must do): same logical outcome, measured both ways
    val preRename = dirBytes(root)
    val (_, tRename) = time {
      VersionedTable.renameColumn(spark, root, "o_totalprice", "price")
    }
    val renameBytes = dirBytes(root) - preRename
    val rewriteRoot = scratch + "/rw"
    val (_, tRewrite) = time {
      VersionedTable.commit(
        VersionedTable.read(spark, root).withColumnRenamed("price", "o_totalprice"),
        rewriteRoot)
    }
    val rewriteBytes = dirBytes(rewriteRoot)

    // zero-copy clone vs a data copy of the same snapshot
    val cloneRoot = scratch + "/clone"
    val (_, tClone) = time {
      VersionedTable.shallowClone(spark, cloneRoot, root)
    }
    val cloneBytes = dirBytes(cloneRoot)

    val rows = orders.count()
    println(
      s"""{"metric":"format_bench","sf":"$sfDir","rows":$rows,""" +
      s""""table_bytes":$tableBytes,""" +
      s""""build_s":${f"$tBuild%.3f"},""" +
      s""""rename_s":${f"$tRename%.3f"},"rename_bytes":$renameBytes,""" +
      s""""rewrite_s":${f"$tRewrite%.3f"},"rewrite_bytes":$rewriteBytes,""" +
      s""""clone_s":${f"$tClone%.3f"},"clone_bytes":$cloneBytes}""")

    // COMMIT-COST DECOMPOSITION (the round-17 ask): where does one
    // commit's second go? Run the two commit-heaviest bench keys' own
    // motions (q28: DV DML; q44: a full MV lifecycle — seed commits with
    // feeds, CREATE, churn, REFRESH) under [[CommitProfiler]] and print
    // per-phase wall totals. The phases are the sidecar writes and Spark
    // jobs a commit pays; at 100 TB each is an object-store round trip
    // class, so the widest phase is the group-commit target.
    // job-level accounting beside the phase decomposition: the MV keys
    // are JOB-LAUNCH-bound (dozens of group-sized probe/commit jobs whose
    // compute is milliseconds), so #jobs and their summed wall are the
    // numbers that say whether a change removed driver round trips
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(j.jobId)
          if (t0 != 0L) {
            jobCount.incrementAndGet()
            jobNanos.addAndGet(System.nanoTime() - t0)
          }
        }
      })
    for ((label, body) <- Seq[(String, () => Unit)](
        ("q28_dv_dml", () => { graft.queries.FormatQueries.q28(spark, sfDir).count(); () }),
        ("q44_mv_lifecycle", () => { graft.queries.FormatQueries.q44(spark, sfDir).count(); () }),
        ("q41_mv_extrema", () => { graft.queries.FormatQueries.q41(spark, sfDir).count(); () }),
        ("q48_mv_rollup_minmax", () => { graft.queries.FormatQueries.q48(spark, sfDir).count(); () }))) {
      graft.sources.CommitProfiler.reset()
      graft.sources.CommitProfiler.enable()
      jobCount.set(0); jobNanos.set(0)
      val (_, tAll) = time { body() }
      Thread.sleep(500) // listener bus drains async
      graft.sources.CommitProfiler.disable()
      val snap = graft.sources.CommitProfiler.snapshot()
      val phases = snap.map { case (k, s, n) =>
        s""""$k":{"s":${f"$s%.3f"},"n":$n}"""
      }.mkString(",")
      println(
        s"""{"metric":"commit_profile","key":"$label",""" +
        s""""wall_s":${f"$tAll%.3f"},"n_jobs":${jobCount.get},""" +
        s""""jobs_wall_s":${f"${jobNanos.get / 1e9}%.3f"},$phases}""")
    }
    spark.stop()
  }
}
