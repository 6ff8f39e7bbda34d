package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[IncrementalAgg]]: maintained aggregate ≡ full recompute, including
  * group-key churn and groups emptied to zero. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val runTs = lit("2024-02-01 00:00:00").cast("timestamp")

  private val keys = Seq("last_status", "created_day")
  private def measures = Seq(
    "n_deleted"    -> when(col("deleted_at").isNotNull, lit(1L)).otherwise(lit(0L)),
    "key_checksum" -> col("id"))
  private def withDay(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("created_day", date_trunc("day", col("created_at")))

  test("maintained rollup equals a full recompute of the merged table") {
    val events = graft.sources.Tables.events(spark, dir)
    val target = Snapshots.stateAsOf(events, "user_id", "ts", "event_type",
        "event_id", Some(lit("2024-01-15 00:00:00").cast("timestamp")))
      .withColumn("deleted_at",
        when(col("last_status") === "purchase", col("updated_at")))
    val staging = Snapshots.stateAsOf(events, "user_id", "ts", "event_type",
      "event_id", None)

    val changes = IncrementalMerge.changeFeed(target, staging, "id", runTs,
      "last_status", "purchase")
    val maintained = IncrementalAgg.applyChanges(
        IncrementalAgg.rollup(withDay(target), keys, measures),
        withDay(changes), keys, measures)
      .orderBy(keys.map(col): _*).collect().map(_.toSeq).toSeq

    val merged = IncrementalMerge.merge(target, staging, "id", runTs,
      "last_status", "purchase")
    val recomputed = IncrementalAgg.rollup(withDay(merged), keys, measures)
      .orderBy(keys.map(col): _*).collect().map(_.toSeq).toSeq

    assert(maintained.nonEmpty)
    assert(maintained == recomputed)
  }

  test("group-key churn moves counts across groups; emptied groups vanish") {
    // group g1 = {1, 2}, g2 = {3}. Changes: id 1 stays in g1, id 3 moves
    // g2 → g1 (pre-image subtracts g2's only row → g2 must disappear),
    // id 4 inserts into g3.
    val agg = IncrementalAgg.rollup(
      Seq((1L, "g1"), (2L, "g1"), (3L, "g2")).toDF("id", "grp"),
      Seq("grp"), Seq("key_checksum" -> col("id")))
    val changes = Seq(
      (3L, "g2", "update_preimage"),
      (3L, "g1", "update_postimage"),
      (4L, "g3", "insert")).toDF("id", "grp", "_change_type")
    val out = IncrementalAgg.applyChanges(agg, changes,
        Seq("grp"), Seq("key_checksum" -> col("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "g1" -> ((3L, 6L)),  // {1,2} + moved 3
      "g3" -> ((1L, 4L)))) // fresh insert; g2 emptied → absent
  }

  test("null group keys maintain as ONE group (null-safe merge join)") {
    // groupBy puts all null-key rows in one group; the maintenance join
    // must match that group too — a plain equi-join would emit a split
    // null-group row and break maintenance ≡ recompute
    val agg = IncrementalAgg.rollup(
      Seq((1L, Some("g1")), (2L, None), (3L, None))
        .toDF("id", "grp"),
      Seq("grp"), Seq("key_checksum" -> col("id")))
    val changes = Seq(
      (4L, None: Option[String], "insert"),          // null group grows
      (2L, None: Option[String], "update_preimage"), // null group shrinks
      (2L, Some("g1"), "update_postimage"))          // ... row moves to g1
      .toDF("id", "grp", "_change_type")
    val out = IncrementalAgg.applyChanges(agg, changes,
        Seq("grp"), Seq("key_checksum" -> col("id")))
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      Some("g1") -> ((2L, 3L)),  // {1} + moved 2
      None       -> ((2L, 7L)))) // {3} + inserted 4 - moved 2 → one row
    // and it matches a recompute of the post-change state
    val recomputed = IncrementalAgg.rollup(
      Seq((1L, Some("g1")), (2L, Some("g1")), (3L, None), (4L, None))
        .toDF("id", "grp"),
      Seq("grp"), Seq("key_checksum" -> col("id")))
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == recomputed)
  }
}
