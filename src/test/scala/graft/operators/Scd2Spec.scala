package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // the exact flow from the reference scd model's SAMPLE OUTPUT comment block
  private def events = Seq(
    (1L, ts("2025-01-05 10:00:00"), "Created",   1L),
    (1L, ts("2025-01-06 12:00:00"), "On Way",    2L),
    (1L, ts("2025-01-07 00:00:00"), "On Way",    3L), // NO_CHANGE → no version
    (1L, ts("2025-01-08 14:00:00"), "Delivered", 4L),
    (1L, ts("2025-01-10 16:00:00"), "DONE",      5L)
  ).toDF("id", "ts", "status", "seq")

  private lazy val scd = Scd2
    .buildFromHistory(events, "id", "ts", "status", "seq", "DONE")
    .orderBy("valid_from").collect()

  test("reference sample flow: 4 versions (NO_CHANGE row creates none)") {
    assert(scd.length == 4)
    assert(scd.map(_.getString(1)).toSeq ==
      Seq("Created", "On Way", "Delivered", "DONE"))
  }

  test("versions chain: valid_to of each = valid_from of next; last is open") {
    assert(scd(0).getAs[Timestamp]("valid_to") == ts("2025-01-06 12:00:00"))
    assert(scd(1).getAs[Timestamp]("valid_to") == ts("2025-01-08 14:00:00"))
    assert(scd(2).getAs[Timestamp]("valid_to") == ts("2025-01-10 16:00:00"))
    assert(scd(3).getAs[Timestamp]("valid_to") == ts(Scd2.EndOfTime))
  }

  test("only the last version is current") {
    assert(scd.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, false, true))
  }

  test("terminal status annotates deleted_at with its valid_from (run 4 of sample)") {
    assert(scd(3).getAs[Timestamp]("deleted_at") == ts("2025-01-10 16:00:00"))
    assert(scd.take(3).forall(_.getAs[Timestamp]("deleted_at") == null))
  }

  test("time-travel returns the version valid at T (sample USEFUL QUERY #3)") {
    val full = Scd2.buildFromHistory(events, "id", "ts", "status", "seq", "DONE")
    val at = Scd2.asOf(full, lit("2025-01-07 09:00:00").cast("timestamp")).collect()
    assert(at.length == 1 && at(0).getString(1) == "On Way")
    // boundary: at a version's valid_from, the NEW version holds
    val atBoundary = Scd2.asOf(full, lit("2025-01-08 14:00:00").cast("timestamp")).collect()
    assert(atBoundary.length == 1 && atBoundary(0).getString(1) == "Delivered")
  }

  test("audit counts versions, not raw events") {
    val a = Scd2.audit(Scd2.buildFromHistory(events, "id", "ts", "status", "seq", "DONE"))
      .collect()(0)
    assert(a.getAs[Long]("version_count") == 4L)
    assert(a.getAs[Timestamp]("first_seen") == ts("2025-01-05 10:00:00"))
    assert(a.getAs[Timestamp]("last_change") == ts("2025-01-10 16:00:00"))
  }

  test("currentState activeOnly drops soft-deleted entities") {
    val full = Scd2.buildFromHistory(events, "id", "ts", "status", "seq", "DONE")
    assert(Scd2.currentState(full).count() == 1)
    assert(Scd2.currentState(full, activeOnly = true).count() == 0)
  }
}
