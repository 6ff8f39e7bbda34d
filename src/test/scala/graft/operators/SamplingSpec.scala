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

  // ---- tokenBudget (p4) ---------------------------------------------------

  private val docs = (0L until 300L)
    .map(i => (i, s"s${i % 3}", Seq.fill((i % 7).toInt + 1)("w").mkString(" ")))
    .toDF("id", "g", "txt")

  private def budgetIds(budgets: Seq[(String, Long)], salt: String = "t"): Set[Long] =
    Sampling.tokenBudget(spark, docs, "id", "g", "txt", budgets, salt)
      .select("id").collect().map(_.getLong(0)).toSet

  test("tokenBudget equals the naive whole-stratum cumulative sum") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val budgets = Seq("s0" -> 120L, "s1" -> 57L, "s2" -> 200L)
    // reference: flat cumsum over (bucket, id) per stratum — the form the
    // two-level prefix sum must telescope to exactly
    val bdf = budgets.toDF("g", "budget")
    val naive = docs
      .select(col("id"), col("g"), Sampling.bucketOf("id", "t").as("bucket"),
        size(graft.functions.TextHash.wordsOf(col("txt"))).cast("long").as("n"))
      .withColumn("cum", sum(col("n")).over(Window.partitionBy(col("g"))
        .orderBy(col("bucket"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(bdf, "g").filter(col("cum") <= col("budget"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(budgetIds(budgets) == naive)
  }

  test("tokenBudget never overshoots: kept tokens per stratum ≤ budget") {
    val budgets = Seq("s0" -> 101L, "s1" -> 63L, "s2" -> 140L)
    val kept = Sampling.tokenBudget(spark, docs, "id", "g", "txt", budgets, "t")
      .groupBy("g").sum("n_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bm = budgets.toMap
    kept.foreach { case (g, t) => assert(t <= bm(g), s"stratum $g: $t tokens") }
    assert(kept.nonEmpty)
  }

  test("tokenBudget is nested: raising a budget only ever ADDS docs") {
    val low  = budgetIds(Seq("s0" -> 60L, "s1" -> 60L, "s2" -> 60L))
    val high = budgetIds(Seq("s0" -> 160L, "s1" -> 160L, "s2" -> 160L))
    assert(low.subsetOf(high))
    assert(low.size < high.size)
  }

  test("mixInterleave equals the naive whole-stratum window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val weights = Seq("s0" -> 100, "s1" -> 50, "s2" -> 25)
    val out = Sampling.mixInterleave(spark, rows, "id", "g", weights, "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(5)))
      .toSet
    val wdf = weights.toDF("g", "w")
    val naive = rows
      .withColumn("bucket", Sampling.bucketOf("id", "t"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("bucket"), col("id"))).cast("long"))
      .join(wdf, "g")
      .select(col("id"), col("g"), col("rank"),
        expr(s"(rank * ${Sampling.PosScale}L) div w").as("pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == naive)
  }

  test("mixInterleave prefixes hold the configured mix proportions") {
    // weights 100:50:25 over 200-doc strata — in the virtual-time prefix
    // pos ≤ 1e6 (no stratum exhausted yet: s0 runs out at pos 2e6) the
    // stride scheduler emits exactly r ≤ T·w/1e6 docs per stratum
    val weights = Seq("s0" -> 100, "s1" -> 50, "s2" -> 25)
    val counts = Sampling.mixInterleave(spark, rows, "id", "g", weights, "t")
      .filter(org.apache.spark.sql.functions.col("pos") <= Sampling.PosScale)
      .groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s0" -> 100L, "s1" -> 50L, "s2" -> 25L))
  }

  test("mixInterleave rejects non-positive weights (div-by-zero guard)") {
    // a zero weight would silently emit null positions via integer div
    val e = intercept[IllegalArgumentException] {
      Sampling.mixInterleave(spark, rows, "id", "g",
        Seq("s0" -> 10, "s1" -> 0), "t")
    }
    assert(e.getMessage.contains("s1:0"))
    intercept[IllegalArgumentException] {
      Sampling.mixInterleave(spark, rows, "id", "g", Seq("s0" -> -3), "t")
    }
  }

  test("mixInterleave: strata absent from the mix config are dropped") {
    val out = Sampling.mixInterleave(spark, rows, "id", "g", Seq("s1" -> 10), "t")
    val gs = out.select("g").distinct()
      .collect().map(_.getString(0)).toSet
    assert(gs == Set("s1"))
    assert(out.count() == 200)
  }

  test("tokenBudget: cum_tokens is the running total in (bucket, id) order") {
    val out = Sampling.tokenBudget(spark, docs, "id", "g", "txt",
        Seq("s0" -> 120L, "s1" -> 120L, "s2" -> 120L), "t")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(0), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)) // (bucket, id)
      var cum = 0L
      sorted.foreach { case (_, _, _, n, c) => cum += n; assert(c == cum) }
    }
  }

  test("temperatureMix: q_d ∝ √n_d — small domains up-sample by " +
    "repetition, large ones truncate, the budget holds exactly") {
    // skewed corpus: 400 / 100 / 25 docs per domain
    val skewed = ((0L until 400L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "mid")) ++
      (2000L until 2025L).map(i => (i, "small"))).toDF("id", "g")
    val total = 525L
    val out = Sampling.temperatureMix(spark, skewed, "id", "g", Some(total), "t7")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // exact integer arithmetic: w = floor(sqrt(n·10⁶)), take = T·w div Σw
    val w = Map("big" -> 20000L, "mid" -> 10000L,
      "small" -> math.floor(math.sqrt(25000000.0)).toLong)
    val wSum = w.values.sum
    val expTake = w.map { case (g, ww) => g -> total * ww / wSum }
    val byG = out.groupBy(_._2)
    expTake.foreach { case (g, t) =>
      assert(byG(g).length == t, s"$g: ${byG(g).length} != $t")
    }
    // the small domain up-sampled: epochs beyond 0 present, and each
    // epoch repeats the SAME deterministic prefix order
    val small = byG("small")
    assert(small.exists(_._4 > 0), "small domain should repeat (epoch > 0)")
    val e0 = small.filter(_._4 == 0).map(t => (t._1, t._3)).sortBy(_._2).toSeq
    val e1 = small.filter(_._4 == 1).map(t => (t._1, t._3)).sortBy(_._2).toSeq
    assert(e1.nonEmpty && e1 == e0.take(e1.length),
      s"epoch 1 must replay epoch 0's prefix")
    // the big domain truncated: a strict deterministic prefix
    val big = byG("big")
    assert(big.forall(_._4 == 0L) && big.length < 400)
    // deterministic end to end
    val again = Sampling.temperatureMix(spark, skewed, "id", "g", Some(total), "t7")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSet == again.toSet)
  }
}
