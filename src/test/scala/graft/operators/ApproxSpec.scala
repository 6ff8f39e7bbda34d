package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SURVEY.md §5 documents the extreme-cardinality switches for the exact
  * operators (q17 exact percentiles, q20 exact multi-distinct): HLL
  * `approx_count_distinct` and t-digest `percentile_approx`. These specs
  * pin the error those switches actually deliver on the real tables, so
  * the documented trade-off is a measured one, not a claim. Both sketches
  * are deterministic for a given input — the bounds are stable, not
  * flaky. */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within 5% of exact per group") {
    val ev = graft.sources.Tables.events(spark, dir)
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx $a vs exact $n")
    }
  }

  test("percentile_approx lands within 1% rank distance of the exact percentile") {
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast("double").as("v"))
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val exact = li.agg(expr(s"percentile(v, array(${qs.mkString(",")}))"))
      .collect()(0).getSeq[Double](0)
    val approx = li.agg(expr(s"percentile_approx(v, array(${qs.mkString(",")}), 10000)"))
      .collect()(0).getSeq[Double](0)
    val n = li.count()
    val sorted = li.orderBy("v") // rank lookup via counts, no full collect
    qs.indices.foreach { i =>
      val rankOfApprox = sorted.filter(col("v") <= approx(i)).count().toDouble / n
      assert(math.abs(rankOfApprox - qs(i)) <= 0.01,
        s"q=${qs(i)}: approx ${approx(i)} sits at rank $rankOfApprox (exact ${exact(i)})")
    }
  }
}
