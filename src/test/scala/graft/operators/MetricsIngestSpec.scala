package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class MetricsIngestSpec extends SparkSpec {

  // two payload files in the reference's Google-Drive drop format
  // (CloudWatch GetMetricData shape handled by process_one_file)
  private lazy val dropDir = {
    val dir = Files.createTempDirectory("graft-drop")
    Files.writeString(dir.resolve("a.json"),
      """{"MetricDataResults": [
        |  {"Id": "m1", "Timestamps": ["2024-01-02T00:00:00+00:00", "2024-01-01T00:00:00+00:00"],
        |   "Values": [60000.0, 120000.0]},
        |  {"Id": "m2", "Timestamps": ["2024-01-03T00:00:00+00:00"], "Values": [240000.0, null]}
        |], "Messages": ["warn-a"]}""".stripMargin)
    Files.writeString(dir.resolve("b.json"),
      """{"MetricDataResults": [
        |  {"Id": "m1", "Timestamps": ["2024-01-05T00:00:00+00:00"], "Values": [180000.0]}
        |], "Messages": []}""".stripMargin)
    dir.toString
  }

  private lazy val detail = MetricsIngest.flatten(spark, dropDir)
  private lazy val rollup = MetricsIngest.rollup(detail)
    .orderBy("id").collect()

  test("flatten: one row per (file, metric id), null values dropped") {
    val rows = detail.orderBy("id", "source_file").collect()
    assert(rows.length == 3)
    val m2 = rows.find(_.getString(0) == "m2").get
    assert(m2.getAs[Double]("sum_ms") == 240000.0)
    assert(m2.getAs[Int]("cnt") == 1) // the null was dropped, as in the reference
  }

  test("rollup: one row per id, runtime_date = max timestamp across files") {
    assert(rollup.length == 2)
    val m1 = rollup(0)
    assert(m1.getString(0) == "m1")
    assert(m1.getAs[String]("runtime_date") == "2024-01-05T00:00:00+00:00")
  }

  test("rollup: load_time is the cross-file weighted mean in minutes") {
    // m1: (60000+120000+180000)/3/60000 = 2.0 minutes
    assert(rollup(0).getAs[Double]("load_time") == 2.0)
    // m2: 240000/1/60000 = 4.0
    assert(rollup(1).getAs[Double]("load_time") == 4.0)
  }

  test("rollup: messages are distinct, sorted, ';'-joined; empties dropped") {
    assert(rollup(0).getAs[String]("message") == "warn-a")
  }
}
