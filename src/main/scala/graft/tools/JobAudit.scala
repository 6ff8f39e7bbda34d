package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job decomposition of one query key's wall time:
  * `runMain graft.tools.JobAudit <queryKey> [sfDir]` runs the key once
  * (steady-state: after an untimed warmup of the same key) under a
  * listener that records every Spark job's call site and duration, then
  * prints jobs grouped by call site, widest first. The r20 optimization
  * loop's microscope: the MV lifecycle keys run 90+ jobs of ~85 ms whose
  * compute is milliseconds, and THIS says which call sites own them. */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // (jobId, site, durationNs, startNs, nTasks)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Int)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    var on = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (on) {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .map("exec " + _).getOrElse(
            j.stageInfos.lastOption.map(_.name).getOrElse("?"))
        starts.put(j.jobId, (site, System.nanoTime(), j.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) rows.add((j.jobId, s._1, System.nanoTime() - s._2, s._2, s._3))
      }
    })
    // per-SQL-execution names: funcName + the action's call signature
    val execs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val execNames = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            // first physical-plan line names the root operator
            val head = s.physicalPlanDescription.linesIterator
              .find(l => l.contains("(1)") || l.startsWith("Execute"))
              .getOrElse(s.description.linesIterator.next()).take(120)
            execNames.put(s.executionId, head.trim)
          case _ => ()
        }
    })
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = if (on) {
          val head = qe.analyzed.nodeName
          execs.add((durationNs, s"$funcName/$head", durationNs))
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup (JIT, codegen)
    spark.catalog.clearCache(); System.gc()
    on = true
    val wall = run()
    on = false
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq
    println(f"[jobaudit] $name wall=$wall%.3f s, jobs=${all.size}, " +
      f"jobs_wall=${all.map(_._3).sum / 1e9}%.3f s, " +
      f"tasks=${all.map(_._5).sum}")
    all.groupBy(_._2).toSeq
      .map { case (site, js) => (site, js.map(_._3).sum / 1e9, js.size) }
      .sortBy(-_._2)
      .foreach { case (site, s, n) =>
        val nm = if (site.startsWith("exec "))
          Option(execNames.get(site.stripPrefix("exec ").toLong)).getOrElse("")
        else ""
        println(f"[jobaudit]   $s%8.3f s  n=$n%-4d $site  $nm")
      }
    // chronological micro-shape of the top-3 widest executions: per-job
    // (offset since prev job end in this exec, duration, tasks) — big
    // offsets = driver-side AQE re-optimization / planning gaps
    val widest = all.groupBy(_._2).toSeq.map { case (k, js) =>
      (k, js.map(_._3).sum) }.sortBy(-_._2).take(3).map(_._1)
    widest.foreach { site =>
      val js = all.filter(_._2 == site).sortBy(_._4)
      val t0 = js.head._4
      var prevEnd = t0
      val parts = js.map { case (_, _, dur, st, nt) =>
        val gap = (st - prevEnd) / 1e6
        prevEnd = math.max(prevEnd, st + dur)
        f"[gap ${gap}%.0f ms, run ${dur / 1e6}%.0f ms, $nt t]"
      }
      println(s"[jobaudit-shape] $site: ${parts.mkString(" ")}")
    }
    val ex = execs.asScala.toSeq
    println(f"[jobaudit] sql executions=${ex.size}, " +
      f"exec_wall=${ex.map(_._3).sum / 1e9}%.3f s (overlaps possible)")
    ex.groupBy(_._2).toSeq
      .map { case (k, js) => (k, js.map(_._3).sum / 1e9, js.size) }
      .sortBy(-_._2)
      .foreach { case (k, s, n) => println(f"[jobaudit-exec] $s%8.3f s  n=$n%-4d $k") }
    spark.stop()
  }
}
