package graft.operators

import graft.SparkSpec

/** Full-outer reconciliation diff: per-key classification and the
  * rolled-up migration health check. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "OPEN", 10.0), (2L, "DONE", 20.0), (3L, "HOLD", 30.0),
    (4L, null.asInstanceOf[String], 40.0))
    .toDF("id", "st", "amt")
  private val right = Seq(
    (1L, "OPEN", 10.0),              // same
    (2L, "OPEN", 20.0),              // changed (st)
    (4L, null.asInstanceOf[String], 40.0), // same (null-safe compare)
    (5L, "NEW", 50.0))               // only_right
    .toDF("id", "st", "amt")

  test("diff classifies every key, null-safe") {
    val out = Reconcile.diff(left, right, "id", Seq("st", "amt"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("status"))).toMap
    assert(out == Map(1L -> "same", 2L -> "changed", 3L -> "only_left",
      4L -> "same", 5L -> "only_right"))
  }

  test("summary counts statuses") {
    val s = Reconcile.summary(Reconcile.diff(left, right, "id", Seq("st", "amt")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("same" -> 2L, "changed" -> 1L, "only_left" -> 1L, "only_right" -> 1L))
  }

  test("duplicate keys fan out: diff expects unique-keyed snapshots") {
    // the operator contract is snapshot inputs (one row per key); with a
    // duplicated key the full-outer join fans out — pin that behavior so
    // callers reconcile snapshots, not logs
    val dupRight = right.union(Seq((1L, "OPEN", 10.0)).toDF("id", "st", "amt"))
    val out = Reconcile.diff(left, dupRight, "id", Seq("st", "amt"))
    assert(out.filter("id = 1").count() == 2)
  }

  test("identical frames reconcile to all-same") {
    val d = Reconcile.diff(left, left, "id", Seq("st", "amt"))
    assert(d.filter("status != 'same'").count() == 0)
    assert(d.count() == 4)
  }
}
