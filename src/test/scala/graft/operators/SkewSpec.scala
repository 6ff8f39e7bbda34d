package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.SessionStream

/** Skew hardening (SURVEY.md §5): the operators that partition by an
  * entity key must stay correct — and their mitigation paths exact — when
  * 1% of keys own 50% of the rows (the "one whale user" distribution that
  * breaks naive partitioning at scale).
  *
  * AQE's skew-join splits oversized JOIN partitions at runtime, but it
  * cannot split a single window partition or aggregation group; for those
  * the mitigations are salted two-phase aggregation
  * ([[graft.functions.Salting]]) and (for sessionize-like folds)
  * pre-splitting by coarse time. These specs pin the EXACTNESS of the
  * mitigations against the plain formulations on a hot-key dataset.
  */
class SkewSpec extends SparkSpec {

  // 100k events, 100 keys; key 0 owns every even row = 50% of the data
  private lazy val hot: DataFrame = {
    val baseUs = 1700000000000000L // 2023-11-14T22:13:20Z
    spark.range(100000)
      .select(
        when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(99)) + 1).as("user_id"),
        // 2s steps inside a 997-row block (block span 1994s), blocks 7300s
        // apart → the inter-block gap of 5306s exceeds the 3600s session
        // gap, so every key sessionizes into ~100 sessions
        timestamp_micros(lit(baseUs) + (col("id") % 997) * 2000000L
          + (col("id").divide(997).cast("long")) * 7300000000L).as("ts"),
        col("id").as("event_id"),
        element_at(array(lit("OPEN"), lit("HOLD"), lit("DONE")), (col("id") % 3 + 1).cast("int"))
          .as("status"),
        // integer-valued doubles: addition is exact and order-independent
        (col("id") % 100).cast("double").as("value"))
  }

  test("salted two-phase aggregation is exact under hot keys and bounds partials") {
    import graft.functions.Salting
    val plain = hot.groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"), sum("value").as("sum_value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Salting.saltedSumCount(hot, Seq("user_id"), "value", "event_id", 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
    assert(plain(0L)._1 == 50000L) // the whale key really is 50% of rows
    // first-phase groups: the whale spreads over 32 salts, so no single
    // reducer group exceeds ~1/32 of its rows (2x slack for hash spread)
    val maxPartial = hot
      .withColumn("__salt", Salting.saltOf(col("event_id"), 32))
      .groupBy("user_id", "__salt").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPartial <= 50000 / 32 * 2,
      s"hot group not spread: max partial group $maxPartial")
  }

  test("sessionize window formulation matches the stateful fold on hot keys") {
    import spark.implicits._
    val gap = 3600L
    val windowed = Sessionize
      .sessions(hot, "user_id", "ts", "event_id", gap, "value")
      .select(col("id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"),
        col("sum_value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val folded = SessionStream
      .sessionizeBatch(hot.select(col("user_id"), col("ts"), col("value"))
        .as[SessionStream.Event], gap)
      .collect()
      .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events, s.sum_value))
      .toSet
    assert(windowed.nonEmpty && windowed == folded)
    // the whale key sessionizes correctly, not just the uniform tail
    assert(windowed.count(_._1 == 0L) > 1)
    // the whale-key mitigation (bounded (key, chunk) partitions) is exact
    // on the same hot data, chunk chosen so the whale splits ~50 ways
    val chunked = Sessionize
      .sessionsChunked(hot, "user_id", "ts", "event_id", gap, "value", 14600L)
      .select(col("id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"),
        col("sum_value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(chunked == windowed)
  }

  test("SCD2 version chains stay consistent under hot keys") {
    val scd = Scd2.buildFromHistory(hot, "user_id", "ts", "status", "event_id", "DONE")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("valid_from"))
    val checked = scd
      .withColumn("__next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("__next_status", lead(col("last_status"), 1).over(w))
    // intervals chain exactly: each version ends where the next begins
    assert(checked.filter(col("__next_from").isNotNull &&
      col("valid_to") =!= col("__next_from")).count() == 0)
    // consecutive versions always differ in the tracked attribute
    assert(checked.filter(col("__next_status").isNotNull &&
      col("last_status") === col("__next_status")).count() == 0)
    // exactly one current version per key, for all 100 keys
    val cur = scd.filter(col("is_current")).groupBy("id").count()
    assert(cur.filter(col("count") =!= 1).count() == 0)
    assert(cur.count() == 100)
    // the whale key's chain is long (statuses cycle every 3 events)
    assert(scd.filter(col("id") === 0L).count() > 1000)
  }
}
