package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalMergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val run = lit("2024-02-01 00:00:00").cast("timestamp")

  // target: (id, last_status, created_at, updated_at, deleted_at)
  private def target = Seq(
    (1L, "Created",  ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), None),
    (2L, "DONE",     ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"), Some(ts("2024-01-03 00:00:00"))),
    (3L, "On Way",   ts("2024-01-01 00:00:00"), ts("2024-01-04 00:00:00"), None)
  ).toDF("id", "last_status", "created_at", "updated_at", "deleted_at")

  // staging: (id, last_status, created_at)
  private def staging = Seq(
    (1L, "DONE",      Some(ts("2024-01-01 00:00:00"))), // newly terminal → deleted_at = run
    (2L, "DONE",      Some(ts("2024-01-01 00:00:00"))), // re-delete → preserve old deleted_at
    (4L, "Created",   None)                             // brand-new row, null created_at → run ts
  ).toDF("id", "last_status", "created_at")

  private lazy val out = IncrementalMerge
    .merge(target, staging, "id", run, "last_status", "DONE")
    .orderBy("id").collect()

  test("staging rows replace matched target rows; updated_at = run ts") {
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getString(1) == "DONE")
    assert(r1.getTimestamp(3) == ts("2024-02-01 00:00:00"))
  }

  test("newly terminal status sets deleted_at to run ts") {
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getTimestamp(4) == ts("2024-02-01 00:00:00"))
  }

  test("earlier deleted_at is preserved on re-delete") {
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getTimestamp(4) == ts("2024-01-03 00:00:00"))
  }

  test("target rows absent from staging pass through untouched") {
    val r3 = out.find(_.getLong(0) == 3L).get
    assert(r3.getString(1) == "On Way")
    assert(r3.getTimestamp(3) == ts("2024-01-04 00:00:00"))
    assert(r3.getTimestamp(4) == null)
  }

  test("new row with null created_at gets the run ts (coalesce)") {
    val r4 = out.find(_.getLong(0) == 4L).get
    assert(r4.getTimestamp(2) == ts("2024-02-01 00:00:00"))
    assert(r4.getTimestamp(4) == null)
  }

  test("merge is idempotent: re-applying the same staging is a no-op") {
    val once = IncrementalMerge.merge(target, staging, "id", run, "last_status", "DONE")
    val twice = IncrementalMerge.merge(once, staging, "id", run, "last_status", "DONE")
    assert(twice.orderBy("id").collect().map(_.toSeq).toSeq ==
      once.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("created_at on update comes from staging, not the stored target value") {
    // reference semantics: coalesce(s.created_at, run_ts) — the source
    // system owns created_at; a corrected source value overwrites
    val corrected = Seq((1L, "OPEN", Some(ts("2023-12-31 00:00:00"))))
      .toDF("id", "last_status", "created_at")
    val res = IncrementalMerge.merge(target, corrected, "id", run, "last_status", "DONE")
      .filter($"id" === 1L).collect()(0)
    assert(res.getAs[Timestamp]("created_at") == ts("2023-12-31 00:00:00"))
  }

  test("empty staging leaves target unchanged") {
    val empty = staging.limit(0)
    val res = IncrementalMerge.merge(target, empty, "id", run, "last_status", "DONE")
    assert(res.count() == 3)
    val r2 = res.filter($"id" === 2L).collect()(0)
    assert(r2.getAs[Timestamp]("deleted_at") == ts("2024-01-03 00:00:00"))
  }

  test("status moving off terminal clears deleted_at") {
    val reopen = Seq((2L, "On Way", Some(ts("2024-01-01 00:00:00"))))
      .toDF("id", "last_status", "created_at")
    val res = IncrementalMerge.merge(target, reopen, "id", run, "last_status", "DONE")
    val r2 = res.filter($"id" === 2L).collect()(0)
    assert(r2.getAs[Timestamp]("deleted_at") == null)
  }

  // ---- mergeEvolving: on_schema_change='sync_all_columns' ----

  test("mergeEvolving matches merge exactly on an unchanged schema") {
    val a = IncrementalMerge.merge(target, staging, "id", run, "last_status", "DONE")
    val b = IncrementalMerge.mergeEvolving(target, staging, "id", run, "last_status", "DONE")
    assert(b.columns.toSeq == a.columns.toSeq)
    assert(b.orderBy("id").collect().map(_.toSeq).toSeq ==
      a.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("added staging column lands with null backfill on untouched rows") {
    val s2 = staging.withColumn("channel", concat(lit("c"), $"id"))
    val res = IncrementalMerge
      .mergeEvolving(target, s2, "id", run, "last_status", "DONE")
      .orderBy("id").collect()
    assert(res.find(_.getLong(0) == 1L).get.getAs[String]("channel") == "c1")
    assert(res.find(_.getLong(0) == 4L).get.getAs[String]("channel") == "c4")
    // id=3 is untouched target-only: the new column is null-backfilled
    assert(res.find(_.getLong(0) == 3L).get.getAs[String]("channel") == null)
  }

  test("column dropped from staging is retained, nulled only on rewritten rows") {
    val t2 = target.withColumn("legacy_flag", concat(lit("f"), $"id"))
    val res = IncrementalMerge
      .mergeEvolving(t2, staging, "id", run, "last_status", "DONE")
      .orderBy("id").collect()
    // untouched target row keeps its value
    assert(res.find(_.getLong(0) == 3L).get.getAs[String]("legacy_flag") == "f3")
    // rewritten rows: staging carries no legacy_flag → nulled
    assert(res.find(_.getLong(0) == 1L).get.getAs[String]("legacy_flag") == null)
    // inserted row never had one
    assert(res.find(_.getLong(0) == 4L).get.getAs[String]("legacy_flag") == null)
  }

  test("dropRemoved=true drops the column entirely (literal dbt sync)") {
    val t2 = target.withColumn("legacy_flag", lit("x"))
    val res = IncrementalMerge.mergeEvolving(
      t2, staging, "id", run, "last_status", "DONE", dropRemoved = true)
    assert(!res.columns.contains("legacy_flag"))
  }

  test("payload column present in both: staging wins on rewrite, type synced to staging") {
    val t2 = target.withColumn("score", lit(1))                 // int in the old schema
    val s2 = staging.withColumn("score", lit(2.5))              // double in the new
    val res = IncrementalMerge
      .mergeEvolving(t2, s2, "id", run, "last_status", "DONE")
    assert(res.schema("score").dataType.typeName == "double")
    val rows = res.orderBy("id").collect()
    assert(rows.find(_.getLong(0) == 1L).get.getAs[Double]("score") == 2.5)
    assert(rows.find(_.getLong(0) == 3L).get.getAs[Double]("score") == 1.0) // cast target value
  }

  test("evolution round-trip: add then drop across two runs keeps history") {
    // run 1: schema grows a column
    val s1 = staging.withColumn("channel", lit("web"))
    val after1 = IncrementalMerge.mergeEvolving(target, s1, "id", run, "last_status", "DONE")
    // run 2: the column is gone again; only id=1 is re-delivered
    val s2 = Seq((1L, "OPEN", Some(ts("2024-01-05 00:00:00"))))
      .toDF("id", "last_status", "created_at")
    val after2 = IncrementalMerge.mergeEvolving(after1, s2, "id",
      lit("2024-02-02 00:00:00").cast("timestamp"), "last_status", "DONE")
      .orderBy("id").collect()
    // rows run 2 did not touch keep their run-1 channel value
    assert(after2.find(_.getLong(0) == 2L).get.getAs[String]("channel") == "web")
    // the re-delivered row loses it (staging no longer supplies it)
    assert(after2.find(_.getLong(0) == 1L).get.getAs[String]("channel") == null)
  }
}
