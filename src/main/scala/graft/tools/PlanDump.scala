package graft.tools

/** Deliverable helper: `runMain graft.tools.PlanDump <outDir> <suffix> k1,k2,...`
  * writes `<outDir>/<key>_<suffix>.txt` with the `.explain("formatted")`
  * output of each key's returned frame (the optimization rounds' plan
  * evidence files). Lifecycle keys' side-effect work (commits, refreshes)
  * does not appear in the returned frame's plan — their evidence is the
  * CommitProfiler / JobAudit numbers in OPTIMIZATION notes — but the
  * formatted plan still pins the comparison surface's shape. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { k =>
      try {
        val df = graft.SparkEntry.queries(k)(spark, sfDir)
        // run once so AQE finalizes and the executed plan is real
        df.write.format("noop").mode("overwrite").save()
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val executed = df.queryExecution.executedPlan.toString
        val w = new java.io.PrintWriter(
          new java.io.File(outDir, s"${k}_$suffix.txt"), "UTF-8")
        try {
          w.println(s"== $k @ $sfDir ($suffix) ==")
          w.println(formatted)
          w.println("== executed (AQE-final) ==")
          w.println(executed)
        } finally w.close()
        println(s"[plandump] wrote $k")
      } catch {
        case e: Throwable => println(s"[plandump] $k FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
