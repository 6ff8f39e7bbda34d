package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SURVEY.md §5: pre-bucketing the merge target by the business key means
  * an incremental run shuffles only the (small) staging delta — the big
  * side's distribution comes from the bucketed layout, not an Exchange.
  * This spec proves that plan property end to end. */
class BucketedMergeSpec extends SparkSpec {
  import spark.implicits._

  test("merge against a bucketed target shuffles only the staging delta") {
    val path = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val target = (1L to 1000L).map(i =>
      (i, if (i % 3 == 0) "DONE" else "OPEN",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "last_status", "created_at", "updated_at", "deleted_at")

    spark.sql("DROP TABLE IF EXISTS graft_merge_target")
    target.write
      .bucketBy(8, "id").sortBy("id")
      .option("path", s"$path/t")
      .saveAsTable("graft_merge_target")

    val staging = Seq(
      (5L, "DONE", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (2000L, "OPEN", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
      .toDF("id", "last_status", "created_at")

    val bucketed = spark.table("graft_merge_target")
    val merged = IncrementalMerge.merge(
      bucketed, staging, "id",
      lit("2024-02-02 00:00:00").cast("timestamp"), "last_status", "DONE")

    // force a shuffle join so the exchange structure is visible
    val plan = merged.hint("merge").queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges == 1, s"expected only the staging-side shuffle, got $exchanges:\n$plan")

    val out = merged.collect()
    assert(out.length == 1001)                       // 1000 existing + 1 insert
    val r5 = out.find(_.getLong(0) == 5L).get
    assert(r5.getString(1) == "DONE" && r5.getTimestamp(4) != null) // soft-deleted
    spark.sql("DROP TABLE graft_merge_target")
  }
}
