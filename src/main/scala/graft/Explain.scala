package graft

/** Plan-inspection main: `runMain graft.Explain <queryKey> [sfDir]`
  * prints the steady-state (second-run) wall time and the executed plan
  * of one SparkEntry query — the loop used to audit new operators' plans
  * before they ship. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(s"[explain] $name steady-state ${(System.nanoTime() - t0) / 1e9}s at $sfDir")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
