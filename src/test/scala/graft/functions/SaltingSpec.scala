package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: one hot key with 10k rows, a tail of singletons
  private lazy val skewed = ((1 to 10000).map(i => (1L, i.toLong, 1.0)) ++
    (2L to 50L).map(k => (k, k * 1000, 2.0)))
    .toDF("key", "event_id", "value")

  test("saltedSumCount equals the plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n_rows"), sum("value").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Salting.saltedSumCount(skewed, Seq("key"), "value", "event_id", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salt actually spreads the hot key") {
    val spread = skewed.filter("key = 1")
      .select(Salting.saltOf(col("event_id"), 16))
      .distinct().count()
    assert(spread == 16)
  }

  test("saltedJoin equals the plain join") {
    val dim = (1L to 50L).map(k => (k, s"name$k")).toDF("key", "name")
    val plain = skewed.join(dim, "key")
      .select("key", "event_id", "name")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(skewed, dim, "key", "event_id", 8)
      .select("key", "event_id", "name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
