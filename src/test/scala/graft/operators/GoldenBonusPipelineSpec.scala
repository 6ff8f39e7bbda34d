package graft.operators

import graft.SparkSpec

/** Golden-file equivalence with the reference: the reference repo ships
  * BOTH the raw input of its bonus pipeline (the downloads_json drops) and
  * the output it produced from them (combined_table.parquet). Running
  * graft's MetricsIngest over the same input must reproduce that output.
  *
  * Message strings are compared with JSON-spacing normalized: the
  * reference renders dict messages via Python json.dumps (", " / ": "
  * separators), Spark's to_json renders compact JSON — same content,
  * different whitespace.
  */
class GoldenBonusPipelineSpec extends SparkSpec {

  private val refDir = "/root/reference"

  private def normJson(s: String): String = graft.CsvGolden.normJson(s)

  private def assertCsvLineEq(got: String, golden: String): Unit =
    graft.CsvGolden.assertLineEq(got, golden)

  test("MetricsIngest reproduces the reference's combined_table.parquet") {
    val golden = spark.read.parquet(s"$refDir/combined_table.parquet")
      .collect()
      .map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double]), normJson(r.getString(3))))
      .toMap

    val got = MetricsIngest.rollup(
      MetricsIngest.flatten(spark, s"$refDir/downloads_json/*.json"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double]), normJson(r.getString(3))))
      .toMap

    assert(got.keySet == golden.keySet)
    assert(golden.nonEmpty)
    golden.foreach { case (id, (gDate, gLoad, gMsg)) =>
      val (aDate, aLoad, aMsg) = got(id)
      assert(aDate == gDate, s"$id runtime_date: $aDate != $gDate")
      assert(aMsg == gMsg, s"$id message: $aMsg != $gMsg")
      (gLoad, aLoad) match {
        case (None, None) => ()
        case (Some(g), Some(a)) => assert(math.abs(a - g) <= math.abs(g) * 1e-12,
          s"$id load_time: $a != $g")
        case other => fail(s"$id load_time null mismatch: $other")
      }
    }
  }

  test("csvExport reproduces the reference's committed combined_table.csv") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_golden_csv")
      .resolve("combined_table.csv").toString
    val finalDf = MetricsIngest.rollup(
      MetricsIngest.flatten(spark, s"$refDir/downloads_json/*.json"))
      .select(col("id"), col("runtime_date"), col("load_time"),
        col("message").as("Message"))
      .orderBy(col("id"))
    graft.sources.Sinks.csvExport(finalDf, out)
    val got = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out))
    val golden = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$refDir/combined_table.csv"))
    assert(got.size == golden.size)
    got.toArray.zip(golden.toArray).foreach { case (a, g) =>
      assertCsvLineEq(a.toString, g.toString)
    }
  }

  test("csvExport reproduces the reference's combined_detail_per_file.csv") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_golden_csv2")
      .resolve("combined_detail_per_file.csv").toString
    val detail = MetricsIngest.flatten(spark, s"$refDir/downloads_json/*.json")
      .withColumn("load_time",
        when(col("cnt") > 0, col("sum_ms") / col("cnt") / lit(60000.0)))
      .withColumn("source_file", element_at(split(col("source_file"), "/"), -1))
      .select(col("id"), col("runtime_date"), col("sum_ms"), col("cnt"),
        col("load_time"), col("message").as("Message"), col("source_file"))
      .orderBy(col("id"), col("source_file"))
    graft.sources.Sinks.csvExport(detail, out)
    val got = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out))
    val golden = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$refDir/combined_detail_per_file.csv"))
    assert(got.size == golden.size)
    got.toArray.zip(golden.toArray).foreach { case (a, g) =>
      assertCsvLineEq(a.toString, g.toString)
    }
  }

  test("flatten matches the reference's per-file detail rows") {
    val golden = spark.read.parquet(s"$refDir/combined_detail_per_file.parquet")
      .collect()
      .map(r => (r.getString(0), r.getString(6)) ->
        (r.getString(1), r.getDouble(2), r.getLong(3), normJson(r.getString(5))))
      .toMap

    val got = MetricsIngest.flatten(spark, s"$refDir/downloads_json/*.json")
      .collect()
      .map { r =>
        val file = r.getString(5).split("/").last
        (r.getString(0), file) ->
          (r.getString(1), r.getDouble(2), r.getInt(3).toLong, normJson(r.getString(4)))
      }
      .toMap

    assert(got.keySet == golden.keySet)
    golden.foreach { case (k, (gDate, gSum, gCnt, gMsg)) =>
      val (aDate, aSum, aCnt, aMsg) = got(k)
      assert(aDate == gDate && aCnt == gCnt, s"$k: ($aDate,$aCnt) != ($gDate,$gCnt)")
      assert(aMsg == gMsg, s"$k message: $aMsg != $gMsg")
      assert(math.abs(aSum - gSum) <= math.max(1e-9, math.abs(gSum) * 1e-12), s"$k sum: $aSum != $gSum")
    }
  }
}
