package graft.pipelines

import graft.{Pipeline, SparkSpec}
import graft.Pipeline.{Failed, Skipped, Stage, Succeeded}

/** Pipeline semantics: DAG ordering, fail-fast skip of dependents,
  * malformed-DAG rejection, and idempotent re-runs of the reference
  * pipeline end-to-end. */
class RetailHourlySpec extends SparkSpec {

  test("stages run in dependency order; failures skip transitive dependents only") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = Pipeline.run(Seq(
      Stage("c", deps = Seq("b"))(() => ran += "c"),
      Stage("a")(() => ran += "a"),
      Stage("b", deps = Seq("a"))(() => { ran += "b"; sys.error("boom") }),
      Stage("d")(() => ran += "d")))
    assert(ran.toSeq == Seq("a", "d", "b")) // c never runs
    val st = results.map(r => r.name -> r.status).toMap
    assert(st("a") == Succeeded && st("d") == Succeeded)
    assert(st("b").isInstanceOf[Failed])
    assert(st("c") == Skipped("b"))
  }

  test("malformed DAGs are rejected before anything runs") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    intercept[IllegalArgumentException] {
      Pipeline.run(Seq(Stage("a", deps = Seq("missing"))(() => ran += "a")))
    }
    intercept[IllegalArgumentException] {
      Pipeline.run(Seq(
        Stage("a", deps = Seq("b"))(() => ran += "a"),
        Stage("b", deps = Seq("a"))(() => ran += "b")))
    }
    assert(ran.isEmpty)
  }

  test("bonus pipeline reproduces the reference's committed final CSV") {
    val root = java.nio.file.Files.createTempDirectory("graft_bonus_pipe").toString
    val results = BonusDaily.run(spark, "/root/reference/downloads_json/*.json", root)
    assert(results.forall(_.status == Succeeded), results.mkString("; "))
    graft.CsvGolden.assertFileEq(s"$root/combined_table.csv",
      "/root/reference/combined_table.csv")
  }

  test("retail hourly pipeline runs end-to-end and re-runs idempotently") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    val first = RetailHourly.run(spark, dir, root)
    assert(first.forall(_.status == Succeeded), first.mkString("; "))

    def snapshot() = (
      spark.read.parquet(s"$root/staging").orderBy("id").collect().map(_.toSeq).toSeq,
      spark.read.parquet(s"$root/mart").orderBy("id").collect().map(_.toSeq).toSeq,
      spark.read.parquet(s"$root/scd").orderBy("id", "valid_from").collect().map(_.toSeq).toSeq,
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$root/audit.csv"))))

    val once = snapshot()
    assert(once._1.nonEmpty && once._2.nonEmpty && once._3.nonEmpty && once._4.nonEmpty)
    // mart equals the merge of staging into the first run's mart — and the
    // SECOND run (an Airflow retry / backfill) must converge to the same
    // state through every sink
    val second = RetailHourly.run(spark, dir, root)
    assert(second.forall(_.status == Succeeded), second.mkString("; "))
    assert(snapshot() == once)
  }
}
