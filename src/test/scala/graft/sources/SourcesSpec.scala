package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.MetricsIngest

/** Raw-drop ingest formats (the reference's CSV/JSON surfaces). */
class SourcesSpec extends SparkSpec {

  test("csv ingest reads a headered file") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("t.csv"),
      "id,status\n1,DONE\n2,OPEN\n")
    val df = Tables.csv(spark, dir.toString)
    assert(df.columns.toSeq == Seq("id", "status"))
    assert(df.count() == 2)
  }

  test("jsonDrop + MetricsIngest reproduce the bonus-pipeline semantics") {
    // two CloudWatch GetMetricData-shaped payload files, like the drops
    // the reference's stg script downloads (one JSON object per file)
    val dir = Files.createTempDirectory("graft_json")
    Files.writeString(dir.resolve("a.json"),
      """{"MetricDataResults": [
        |  {"Id": "m1", "Timestamps": ["2024-01-02T00:00:00", "2024-01-01T00:00:00"],
        |   "Values": [60000.0, 120000.0]},
        |  {"Id": "m2", "Timestamps": ["2024-01-01T06:00:00"], "Values": [30000.0]}
        |], "Messages": ["b-msg", "a-msg"]}""".stripMargin)
    Files.writeString(dir.resolve("b.json"),
      """{"MetricDataResults": [
        |  {"Id": "m1", "Timestamps": ["2024-01-03T00:00:00"], "Values": [180000.0]}
        |], "Messages": ["a-msg"]}""".stripMargin)

    val raw = Tables.jsonDrop(spark, dir.toString + "/*.json")
    assert(raw.count() == 2)

    val rolled = MetricsIngest.rollup(MetricsIngest.flatten(spark, dir.toString + "/*.json"))
      .orderBy("id").collect()
    assert(rolled.length == 2)
    val m1 = rolled(0)
    assert(m1.getString(0) == "m1")
    assert(m1.getString(1) == "2024-01-03T00:00:00+00:00") // max instant, ISO +00:00
    // weighted mean over ALL values of the id: (60000+120000+180000)/3/60000
    assert(math.abs(m1.getDouble(2) - 2.0) < 1e-12)
    // per reference semantics (lion_parcell_bonus_test_stg.py:161-173,
    // 222-225): messages join per FILE first, dedup happens on those
    // joined strings — so "b-msg; a-msg" and "a-msg" are distinct values
    assert(m1.getString(3) == "a-msg; b-msg; a-msg")
    val m2 = rolled(1)
    assert(m2.getString(0) == "m2" && math.abs(m2.getDouble(2) - 0.5) < 1e-12)
  }

  test("message fallback chain skips falsy and non-string fields like the reference") {
    val dir = Files.createTempDirectory("graft_json_msgs")
    Files.writeString(dir.resolve("m.json"),
      """{"MetricDataResults": [{"Id": "x", "Timestamps": ["2024-01-01T00:00:00"],
        |  "Values": [60000.0]}],
        | "Messages": [{"Message": 0, "text": "disk full"},
        |              {"Message": "", "message": "fallback hit"},
        |              "plain", "", {"other": 1}]}""".stripMargin)
    val msg = MetricsIngest.flatten(spark, dir.toString + "/*.json")
      .collect()(0).getString(4)
    // 0 is falsy (skipped), "" is falsy (skipped), dict with no text-ish
    // field renders as JSON — mirroring extract_messages + `if s` filter
    assert(msg == """disk full; fallback hit; plain; {"other":1}""")
  }

  test("jsonLinesWithQuarantine routes malformed lines with raw preserved") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonq")
    java.nio.file.Files.write(dir.resolve("drop.jsonl"), java.util.Arrays.asList(
      """{"id": 1, "v": "a"}""",
      """{"id": 2 "v": "b"}""", // malformed: missing comma
      """not json at all""",
      """{"id": 4, "v": "d"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val (valid, rejected) =
      Tables.jsonLinesWithQuarantine(spark, dir.toString, schema)
    val ok = valid.orderBy("id").collect()
    assert(ok.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (4L, "d")))
    val bad = rejected.collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"id": 2 "v": "b"}""", "not json at all"))
  }

  test("ORC round-trips exactly and pushes filter + projection to the reader") {
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/orders"
    Sinks.orc(src, dir)
    val back = Tables.orc(spark, dir)
    assert(back.orderBy("o_orderkey").collect().map(_.toSeq).toSeq ==
      src.orderBy("o_orderkey").collect().map(_.toSeq).toSeq)
    // predicate + column pruning reach the ORC scan like parquet
    val q = back.filter(org.apache.spark.sql.functions.col("o_orderkey") < 100)
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(o_orderkey"))
    assert(plan.contains("ReadSchema: struct<o_orderkey"))
    assert(!plan.contains("o_comment"))
  }
}
