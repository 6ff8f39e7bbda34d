/** Dev tool: print executed-plan summaries for the headline queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // the canonical builder (plan shape must be audited under the same
    // conf the queries ship with)
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary", "q10_star_join", "q14_asof_join", "q3_incremental_merge")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.write.format("noop").mode("overwrite").save() // let AQE finalize
      println(s"========== $n ==========")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
