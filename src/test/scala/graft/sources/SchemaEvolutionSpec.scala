package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Three consecutive "hourly" merge runs through the versioned table whose
  * staging schema CHANGES between runs — the reference's
  * `on_schema_change='sync_all_columns'` (retail_transactions.sql:6) driven
  * end-to-end: run 1 establishes the table, run 2 adds a column, run 3
  * drops it again. Every intermediate schema stays time-travelable. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"

  test("hourly runs with add-column then drop-column evolve the versioned table") {
    val root = freshRoot()

    // hour 1: base schema (id, last_status, created_at)
    val h1 = Seq(
      (1L, "Created", Some(ts("2024-06-01 00:00:00"))),
      (2L, "Created", Some(ts("2024-06-01 00:00:00"))),
      (3L, "Created", Some(ts("2024-06-01 00:00:00"))))
      .toDF("id", "last_status", "created_at")
    Sinks.upsertByKeyVersioned(spark, root, h1,
      "id", lit("2024-06-01 01:00:00").cast("timestamp"), "last_status", "DONE")

    // hour 2: staging ADDS `channel`; only ids 1,4 are delivered
    val h2 = Seq(
      (1L, "On Way", Some(ts("2024-06-01 00:00:00")), "web"),
      (4L, "Created", Some(ts("2024-06-01 02:00:00")), "app"))
      .toDF("id", "last_status", "created_at", "channel")
    Sinks.upsertByKeyVersioned(spark, root, h2,
      "id", lit("2024-06-01 02:00:00").cast("timestamp"), "last_status", "DONE")

    val v2 = VersionedTable.read(spark, root).orderBy("id").collect()
    assert(VersionedTable.read(spark, root).columns.contains("channel"))
    assert(v2.find(_.getLong(0) == 1L).get.getAs[String]("channel") == "web")
    // rows hour 2 did not deliver: the new column is null-backfilled
    assert(v2.find(_.getLong(0) == 2L).get.getAs[String]("channel") == null)
    assert(v2.length == 4)

    // hour 3: staging DROPS `channel` again; only id 4 is re-delivered
    val h3 = Seq((4L, "DONE", Some(ts("2024-06-01 02:00:00"))))
      .toDF("id", "last_status", "created_at")
    Sinks.upsertByKeyVersioned(spark, root, h3,
      "id", lit("2024-06-01 03:00:00").cast("timestamp"), "last_status", "DONE")

    val v3 = VersionedTable.read(spark, root).orderBy("id").collect()
    // the column survives (history retained) …
    assert(VersionedTable.read(spark, root).columns.contains("channel"))
    assert(v3.find(_.getLong(0) == 1L).get.getAs[String]("channel") == "web")
    // … but the rewritten row no longer carries a value for it
    assert(v3.find(_.getLong(0) == 4L).get.getAs[String]("channel") == null)
    // and the soft delete fired on the terminal status
    assert(v3.find(_.getLong(0) == 4L).get.getAs[Timestamp]("deleted_at") ==
      ts("2024-06-01 03:00:00"))

    // every pre-evolution schema stays time-travelable
    assert(!VersionedTable.readVersion(spark, root, 1).columns.contains("channel"))
    assert(VersionedTable.readVersion(spark, root, 2).columns.contains("channel"))
  }
}
