import org.apache.spark.sql.SparkSession

/** Dev tool: print executed-plan summaries for the headline queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
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
