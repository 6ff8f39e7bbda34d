package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The banded time-range join must return exactly the pairs the naive
  * (cartesian) BETWEEN join returns — banding is an execution strategy,
  * never a semantics change. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def mkDf(name: String, uss: Seq[Long]) =
    uss.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF(s"${name}_id", "us")
      .select(col(s"${name}_id"), expr("timestamp_micros(us)").as("ts"))

  private def naive(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      beforeUs: Long,
      afterUs: Long): Set[(Long, Long)] =
    left.crossJoin(right.select(col("r_id"), col("ts").as("rts")))
      .filter(unix_micros(col("rts")) >= unix_micros(col("ts")) - beforeUs &&
        unix_micros(col("rts")) <= unix_micros(col("ts")) + afterUs)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet

  private def banded(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      beforeUs: Long,
      afterUs: Long,
      bucketUs: Long = 0L): Set[(Long, Long)] =
    RangeJoin.timeBand(left, "ts", right, "ts", beforeUs, afterUs, bucketUs = bucketUs)
      .select("l_id", "r_id_r").as[(Long, Long)].collect().toSet

  test("banded pairs equal the naive BETWEEN join, boundaries inclusive") {
    // cluster points around bucket boundaries: band ±10, bucket 20
    val l = mkDf("l", Seq(0L, 19L, 20L, 25L, 40L, 100L))
    val r = mkDf("r", Seq(5L, 10L, 20L, 29L, 31L, 50L, 90L, 110L, 111L))
    for ((before, after) <- Seq((10L, 10L), (0L, 15L), (7L, 0L)) if before + after > 0) {
      assert(banded(l, r, before, after) == naive(l, r, before, after),
        s"band=-$before/+$after")
    }
  }

  test("asymmetric band and explicit bucket width agree with naive") {
    val l = mkDf("l", 0L.to(200L, 13).map(_ * 7))
    val r = mkDf("r", 0L.to(300L, 11).map(_ * 5))
    val (before, after) = (30L, 90L)
    val expected = naive(l, r, before, after)
    for (bucket <- Seq(1L, 17L, 120L, 1000L))
      assert(banded(l, r, before, after, bucket) == expected, s"bucket=$bucket")
  }

  test("pre-epoch (negative microsecond) timestamps band correctly") {
    val l = mkDf("l", Seq(-100L, -1L, 0L, 1L))
    val r = mkDf("r", Seq(-101L, -95L, -2L, 3L))
    assert(banded(l, r, 5L, 5L) == naive(l, r, 5L, 5L))
  }

  test("each matching pair appears exactly once (no bucket-fanout dupes)") {
    val l = mkDf("l", Seq(50L))
    val r = mkDf("r", Seq(45L, 50L, 55L))
    val rows = RangeJoin.timeBand(l, "ts", r, "ts", 10L, 10L)
      .select("l_id", "r_id_r").collect()
    assert(rows.length == 3)
  }

  test("banded plan is an equi-join on the bucket, not a nested loop") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"))
    val p = RangeJoin.timeBand(ev, "ts", ev, "ts", 60000000L, 60000000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
