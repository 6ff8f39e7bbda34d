package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("splits on gaps strictly greater than the threshold") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (1L, "2024-01-01 00:30:00", 2L, 2.0), // 30m gap → same session
      (1L, "2024-01-01 01:30:00", 3L, 3.0), // exactly 1h gap → same (strict >)
      (1L, "2024-01-01 03:30:01", 4L, 4.0), // 2h1s gap → new session
      (2L, "2024-01-01 00:00:00", 5L, 5.0)
    ).toDF("user_id", "s", "event_id", "value")
      .selectExpr("user_id", "cast(s as timestamp) as ts", "event_id", "value")

    val out = Sessionize.sessions(ev, "user_id", "ts", "event_id", 3600L, "value")
      .orderBy("id", "session_id").collect()

    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq ==
      Seq((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L)))
    val s1 = out(0)
    assert(s1.getTimestamp(2) == ts("2024-01-01 00:00:00"))
    assert(s1.getTimestamp(3) == ts("2024-01-01 01:30:00"))
    assert(s1.getDouble(5) == 6.0)
  }

  test("sessionsChunked equals sessions for any chunk size, incl. multi-chunk spans") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "session_id", "session_start", "session_end", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
    val plain = res(Sessionize.sessions(ev, "user_id", "ts", "event_id", 7200L, "value"))
    assert(plain.nonEmpty)
    // chunk >> gap (few boundary merges), chunk == gap, and chunk << gap
    // (every real session spans MANY chunks — maximal stitching)
    Seq(86400L, 7200L, 600L).foreach { chunk =>
      val chunked = res(Sessionize.sessionsChunked(
        ev, "user_id", "ts", "event_id", 7200L, "value", chunk))
      assert(chunked == plain, s"chunkSeconds=$chunk diverged")
    }
  }

  test("session ids are 1-based and dense per key") {
    val ev = Seq(
      (7L, "2024-01-01 00:00:00", 1L, 0.0),
      (7L, "2024-01-02 00:00:00", 2L, 0.0),
      (7L, "2024-01-03 00:00:00", 3L, 0.0)
    ).toDF("user_id", "s", "event_id", "value")
      .selectExpr("user_id", "cast(s as timestamp) as ts", "event_id", "value")
    val ids = Sessionize.sessions(ev, "user_id", "ts", "event_id", 60L, "value")
      .orderBy("session_id").select("session_id").as[Long].collect().toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
