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

  test("one-pass window build equals the reference's iterative algorithm on real events") {
    // the reference applies one snapshot per run (expire current on change,
    // append new version — retail_transactions_scd.sql steps 1-2); replaying
    // that algorithm snapshot-by-snapshot over every observed state must
    // yield exactly the one-shuffle window formulation's table
    val dir = "/root/testdata/sf0.001"
    val raw = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))

    val eot = Timestamp.valueOf("9999-12-31 23:59:59")
    case class V(id: Long, status: String, from: Timestamp, var to: Timestamp,
        var current: Boolean)
    val table = scala.collection.mutable.ArrayBuffer.empty[V]
    raw.groupBy(_._1).foreach { case (id, evs) =>
      var cur: Option[V] = None
      evs.sortBy(e => (e._2.getTime, e._4)).foreach { case (_, t, status, _) =>
        cur match {
          case Some(v) if v.status == status => () // NO_CHANGE
          case Some(v) =>                          // UPDATE: expire + append
            v.to = t; v.current = false
            val nv = V(id, status, t, eot, current = true)
            table += nv; cur = Some(nv)
          case None =>                             // INSERT
            val nv = V(id, status, t, eot, current = true)
            table += nv; cur = Some(nv)
        }
      }
    }
    val expected = table.map(v =>
      (v.id, v.status, v.from, v.to, v.current,
        if (v.status == "purchase") Some(v.from) else None)).toSet

    val got = Scd2.buildFromHistory(
      graft.sources.Tables.events(spark, dir), "user_id", "ts", "event_type",
      "event_id", "purchase")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getBoolean(4), Option(r.getTimestamp(5)))).toSet

    assert(got.size > 100)
    assert(got == expected)
  }

  test("currentState activeOnly drops soft-deleted entities") {
    val full = Scd2.buildFromHistory(events, "id", "ts", "status", "seq", "DONE")
    assert(Scd2.currentState(full).count() == 1)
    assert(Scd2.currentState(full, activeOnly = true).count() == 0)
  }

  test("pointInTime joins each fact to exactly the version valid at its ts") {
    val full = Scd2.buildFromHistory(events, "id", "ts", "status", "seq", "DONE")
    val facts = Seq(
      (101L, 1L, ts("2025-01-05 23:00:00")), // inside 'Created'
      (102L, 1L, ts("2025-01-06 12:00:00")), // exactly at a boundary → NEW version
      (103L, 1L, ts("2025-01-09 00:00:00")), // inside 'Delivered'
      (104L, 1L, ts("2025-01-11 00:00:00"))  // after last change → current
    ).toDF("fact_id", "user", "fts")
    val out = Scd2.pointInTime(full, facts, "user", "fts")
      .select(col("fact_id"), col("last_status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(101L -> "Created", 102L -> "On Way",
      103L -> "Delivered", 104L -> "DONE"))
    // exactly one version per fact — no duplicates, no misses
    assert(Scd2.pointInTime(full, facts, "user", "fts").count() == 4)
  }
}
