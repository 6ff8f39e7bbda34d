package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0L until 600L).map(i => (i, s"s${i % 3}")).toDF("id", "g")

  private def ids(rates: Seq[(String, Int)], salt: String = "t"): Set[Long] =
    Sampling.stratified(spark, rows, "id", "g", rates, salt)
      .select("id").collect().map(_.getLong(0)).toSet

  test("deterministic: identical runs produce identical samples") {
    val r = Seq("s0" -> 500, "s1" -> 200, "s2" -> 800)
    assert(ids(r) == ids(r))
  }

  test("nested: raising a rate only ever ADDS rows") {
    val low  = ids(Seq("s0" -> 300, "s1" -> 300, "s2" -> 300))
    val high = ids(Seq("s0" -> 600, "s1" -> 600, "s2" -> 600))
    assert(low.subsetOf(high))
    assert(low.size < high.size)
  }

  test("whitelist: strata absent from the config are dropped entirely") {
    val s = Sampling.stratified(spark, rows, "id", "g", Seq("s1" -> 1000), "t")
    val gs = s.select("g").distinct().collect().map(_.getString(0)).toSet
    assert(gs == Set("s1"))
    assert(s.count() == 200) // permille 1000 keeps the whole stratum
  }

  test("rate: sampled fraction tracks the permille within binomial noise") {
    val n = ids(Seq("s0" -> 400, "s1" -> 400, "s2" -> 400)).size
    // 600 draws at p=0.4: mean 240, sd ≈ 12 — assert within ±5 sd
    assert(math.abs(n - 240) < 60, s"got $n of 600 at permille 400")
  }

  test("independent per salt: different salts draw different samples") {
    val r = Seq("s0" -> 500, "s1" -> 500, "s2" -> 500)
    assert(ids(r, "saltA") != ids(r, "saltB"))
  }
}
