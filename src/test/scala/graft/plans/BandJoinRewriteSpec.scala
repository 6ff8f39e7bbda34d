package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The band-join optimizer rule must (a) remove the nested-loop plan,
  * (b) change no results, (c) leave equi-joins and non-band theta joins
  * alone, (d) honor its kill switch. */
class BandJoinRewriteSpec extends SparkSpec {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.install(spark)
  }

  private lazy val l: DataFrame =
    Seq.tabulate(300)(i => (i.toLong, i.toLong * 7)).toDF("lid", "lus")
  private lazy val r: DataFrame =
    Seq.tabulate(400)(i => (i.toLong, i.toLong * 5)).toDF("rid", "rus")

  private def bandJoin(band: Long): DataFrame =
    l.join(r, r("rus") >= l("lus") - band && r("rus") <= l("lus") + band)

  test("naive band predicate plans as a bucket equi-join, results unchanged") {
    val joined = bandJoin(10L)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)

    val got = joined.select("lid", "rid").as[(Long, Long)].collect().toSet
    val expected = (for {
      i <- 0L until 300L; j <- 0L until 400L
      if math.abs(i * 7 - j * 5) <= 10
    } yield (i, j)).toSet
    assert(got == expected)
  }

  test("asymmetric band and swapped comparison spellings rewrite too") {
    val j1 = l.join(r, r("rus") >= l("lus") - 3L && l("lus") + 14L >= r("rus"))
    val p1 = j1.queryExecution.executedPlan.toString
    assert(!p1.contains("BroadcastNestedLoopJoin") && !p1.contains("CartesianProduct"))
    val got = j1.select("lid", "rid").as[(Long, Long)].collect().toSet
    val expected = (for {
      i <- 0L until 300L; j <- 0L until 400L
      d = j * 5 - i * 7
      if d >= -3 && d <= 14
    } yield (i, j)).toSet
    assert(got == expected)
  }

  test("extra conjuncts are preserved through the rewrite") {
    val j = l.join(r,
      r("rus") >= l("lus") - 10L && r("rus") <= l("lus") + 10L && r("rid") =!= l("lid"))
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(j.filter(col("rid") === col("lid")).count() == 0)
  }

  test("equi-joins and non-band theta joins are left untouched") {
    val equi = l.join(r, l("lid") === r("rid") && r("rus") >= l("lus") - 5L)
    assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bkt"))
    // one-sided bound: no band, must stay a nested loop (semantically so)
    val oneSided = l.join(r, r("rus") >= l("lus") - 5L)
    assert(!oneSided.queryExecution.optimizedPlan.toString.contains("__graft_bkt"))
  }

  test("kill switch disables the rewrite") {
    spark.conf.set("spark.graft.bandJoin.enabled", "false")
    try {
      val p = bandJoin(10L).queryExecution.optimizedPlan.toString
      assert(!p.contains("__graft_bkt"))
    } finally spark.conf.unset("spark.graft.bandJoin.enabled")
  }

  test("null timestamps never match, same as the naive join") {
    val ln = Seq((1L, Some(100L)), (2L, None)).toDF("lid", "lus")
    val rn = Seq((10L, Some(95L)), (11L, None)).toDF("rid", "rus")
    val j = ln.join(rn, rn("rus") >= ln("lus") - 10L && rn("rus") <= ln("lus") + 10L)
    assert(j.select("lid", "rid").as[(Long, Long)].collect().toSet == Set((1L, 10L)))
  }
}
