package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics checks for the rank-arithmetic statistics of q17 and the
  * zero-match handling of q15 (the oracle gate covers full-result equality;
  * these pin the formulas themselves on controlled inputs). */
class AnalyticsQueriesSpec extends SparkSpec {

  import spark.implicits._

  test("q17 rank arithmetic: median and nearest-rank p90 on known groups") {
    // odd group: median = middle; even group: midpoint of the two middles
    val odd  = Seq(10.0, 20.0, 30.0, 40.0, 50.0)            // median 30, p90 @ ceil(4.5)=5 → 50
    val even = Seq(1.0, 2.0, 3.0, 4.0)                      // median 2.5, p90 @ ceil(3.6)=4 → 4
    val df = (odd.map(("odd", _)) ++ even.map(("even", _)))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("o_orderpriority", "o_totalprice", "o_orderkey")

    // run the exact q17 expression tree on the synthetic frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("v"), col("o_orderkey"))
    val ranked = df
      .select(col("o_orderpriority"), col("o_totalprice").cast("decimal(14,2)").as("v"),
        col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderpriority"))))
    val k1 = (col("n") + 1).divide(2).cast("long")
    val k2 = (col("n") + 2).divide(2).cast("long")
    val k90 = (col("n") * 9 + 9).divide(10).cast("long")
    val out = ranked.groupBy(col("o_orderpriority").as("priority"))
      .agg(
        ((sum(when(col("rn") === k1, col("v"))) +
          sum(when(col("rn") === k2, col("v")))).cast("double") / 2).as("median"),
        sum(when(col("rn") === k90, col("v"))).cast("double").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    assert(out("odd") == ((30.0, 50.0)))
    assert(out("even") == ((2.5, 4.0)))
  }

  test("q17 median equals Spark's exact percentile built-in on real data") {
    val dir = "/root/testdata/sf0.001"
    val q17 = AnalyticsQueries.q17(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(cast(o_totalprice as decimal(14,2)), 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    q17.foreach { case (g, m) =>
      assert(math.abs(m - builtin(g)) <= math.ulp(m) * 4, s"group $g: $m vs ${builtin(g)}")
    }
  }

  test("q15 keeps zero-match events with n_concurrent = 0") {
    val dir = "/root/testdata/sf0.001"
    val out = AnalyticsQueries.q15(spark, dir)
    val nEvents = graft.sources.Tables.events(spark, dir).count()
    assert(out.count() == nEvents) // LEFT semantics: every event present
    assert(out.filter(col("n_concurrent") === 0).count() > 0)
  }
}
