package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Greedy BPE: hand-checked training order and application semantics
  * (incl. the boundary cases a naive separator formulation gets
  * wrong), determinism, and the p3/p4 re-key on real token counts. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training follows frequency with lexicographic ties; application " +
    "is left-to-right non-overlapping per word") {
    // words: "aa"x3, "ab"x1  →  round 1 merges (a,a) [weight 3 beats 1],
    // round 2 merges (a,b), round 3 finds nothing and stops early
    val docs = Seq("aa ab", "aa aa").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 10)
    assert(merges == Seq(("a", "a"), ("a", "b")), merges.toString)

    def tok(t: String): Seq[String] =
      Seq(t).toDF("text").select(Bpe.tokens(col("text"), merges).as("t"))
        .as[Seq[String]].head

    assert(tok("aa ab") == Seq("aa", "ab"))
    // non-overlap: "aaa" under (a,a) is [aa, a] — the second pair must
    // not reuse the first's right symbol
    assert(tok("aaa") == Seq("aa", "a"))
    // BOUNDARY: in "aab" the (a,a) merge runs first, leaving [aa, b];
    // (a,b) must NOT then match the tail of symbol "aa" — the bug a
    // trailing-separator replace formulation has
    assert(tok("aab") == Seq("aa", "b"))
    // both adjacent pairs merge (no shared-boundary miss): "abab" after
    // (a,a) no-op, (a,b) twice → [ab, ab]
    assert(tok("abab") == Seq("ab", "ab"))
    // merges never cross word boundaries
    assert(tok("a a") == Seq("a", "a"))
  }

  test("deterministic: same corpus, same merges, same counts") {
    val docs = Seq("key agg row scan", "row scan row agg", "agg agg key")
      .toDF("text")
    val m1 = Bpe.trainMerges(docs, "text", 8)
    val m2 = Bpe.trainMerges(docs, "text", 8)
    assert(m1 == m2 && m1.size == 8)
    val c1 = docs.select(Bpe.tokenCount(col("text"), m1)).as[Long].collect().toSeq
    val c2 = docs.select(Bpe.tokenCount(col("text"), m2)).as[Long].collect().toSeq
    assert(c1 == c2 && c1.forall(_ > 0))
  }

  test("native encoder equals the replace-fold specification form, " +
    "duplicate-rank pairs included") {
    val docs = (0 until 40).map(i =>
      s"tok ${"ab" * (1 + i % 3)} cd${i % 7} scan row agg key$i value")
      .toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 24)
    assert(merges.size == 24)
    // the spec form: symbolize → nested replaces → split → drop gaps
    val specToks = filter(
      Bpe.symbols(Bpe.applyMerges(
        Bpe.symbolize(graft.functions.TextHash.normText(col("text"))), merges)),
      t => t =!= " ")
    val got = docs.select(
      Bpe.tokens(col("text"), merges).as("native"), specToks.as("spec"))
      .where(not(col("native") <=> col("spec"))).count()
    assert(got == 0L, "native and spec tokenization must agree row-for-row")
    // a hand-built table with a DUPLICATE pair at two ranks: both passes
    // must run (after (b,c) makes 'bc', (a,bc) re-merges what the rank-0
    // (a,b) pass could not) — the fold form is the semantics
    val dup = Seq(("a", "b"), ("b", "c"), ("a", "bc"), ("a", "b"))
    val one = Seq("abc ab").toDF("text")
    val n = one.select(Bpe.tokens(col("text"), dup).as("t"),
      filter(Bpe.symbols(Bpe.applyMerges(Bpe.symbolize(
        graft.functions.TextHash.normText(col("text"))), dup)),
        t => t =!= " ").as("s")).head
    assert(n.getSeq[String](0) == n.getSeq[String](1), n.toString)
  }

  test("batched training (batchK > 1) equals single-merge greedy " +
    "(batchK = 1), and 512-merge training compiles and runs") {
    val docs = (0 until 30).map(i =>
      s"alpha beta gamma delta eps$i zeta eta theta " * (1 + i % 3))
      .toDF("text")
    // all three roads must train the identical table: the in-memory
    // driver road (default — the corpus vocabulary is tiny), the
    // cluster road merge-by-merge, and the cluster road batched
    val driver = Bpe.trainMerges(docs, "text", 40)
    spark.conf.set(Bpe.DriverVocabLimitKey, "0") // force the cluster road
    val (single, batched) =
      try (Bpe.trainMerges(docs, "text", 40, batchK = 1),
        Bpe.trainMerges(docs, "text", 40, batchK = 64))
      finally spark.conf.unset(Bpe.DriverVocabLimitKey)
    assert(single == batched,
      s"batched greedy must equal single-merge greedy:\n$single\n$batched")
    assert(driver == single,
      s"driver-road greedy must equal the cluster road:\n$driver\n$single")
    // production scale, NATURAL text (Zipf-shaped counts — the flat
    // synthetic corpus above is the adversarial case where ties force
    // 1-merge batches, correctly): 512 merges must train in well under
    // 512 Spark rounds, and the trained table must APPLY (the
    // nested-replace fold would fail to compile here)
    // the testdata documents' closed ~90-merge vocabulary exhausts long
    // before 512 — synthesize a rich Zipf corpus instead: 3000 distinct
    // pseudo-words (10-letter alphabet), frequency ∝ 1/rank
    val zipf = (0 until 3000).map { r =>
      val w = scala.util.hashing.MurmurHash3.stringHash("w" + r)
        .abs.toString.map(c => ('a' + (c - '0')).toChar).mkString
      ((w + " ") * math.max(1, 300 / (r + 1))).trim
    }
    val big = zipf.toDF("text")
    val (merges512, rounds) = Bpe.trainMergesDetailed(big, "text", 512)
    assert(merges512.size == 512, s"vocabulary exhausted at ${merges512.size}")
    assert(rounds < 300,
      s"batching must land multiple merges per Spark round on natural " +
        s"text: $rounds rounds for ${merges512.size} merges")
    val total = big.select(sum(Bpe.tokenCount(col("text"), merges512)))
      .as[Long].head
    assert(total > 0L)
  }

  test("p3 packing and p4 token budgets run unchanged re-keyed on real " +
    "BPE token counts") {
    val docs = (0L until 60L).map(i =>
      (i, s"s${i % 2}", "key agg row scan slow fast " * (1 + (i % 4)).toInt))
      .toDF("doc_id", "source", "text")
    val merges = Bpe.trainMerges(docs, "text", 12)
    val bpeCount = Bpe.tokenCount(col("text"), merges)

    // p3: packing on BPE counts — same invariants as the word-count run:
    // every doc packed once, fills never exceed capacity, offsets are
    // the running sum within each sequence
    val packed = Packing.packSequences(spark, docs, "doc_id", "source",
      "text", capacity = 120L, shardSize = 30L, tokenCount = Some(bpeCount))
      .collect()
    assert(packed.length == 60)
    val bySeq = packed.groupBy(r => (r.getAs[String]("stratum"),
      r.getAs[Long]("shard"), r.getAs[Long]("seq_id")))
    bySeq.foreach { case (k, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("id"))
      var off = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("seq_offset") == off, s"$k offset chain")
        off += r.getAs[Long]("n_tokens")
      }
      assert(off <= 120L || rs.length == 1, s"$k overfilled: $off")
    }
    // and the BPE unit is genuinely different from whitespace words
    val words = docs.select(sum(size(split(trim(lower(col("text"))), " "))))
      .as[Long].head
    val bpe = docs.select(sum(bpeCount)).as[Long].head
    assert(bpe != words, "BPE counts should differ from word counts")

    // p4: budget selection on BPE counts — cumulative totals never
    // exceed the budget, and selection is a prefix in (bucket, id) order
    val sel = Sampling.tokenBudget(spark, docs, "doc_id", "source", "text",
      budgets = Seq(("s0", 300L), ("s1", 200L)), salt = "bpespec",
      tokenCount = Some(bpeCount)).collect()
    assert(sel.nonEmpty)
    sel.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val budget = if (src == "s0") 300L else 200L
      assert(rs.map(_.getAs[Long]("cum_tokens")).max <= budget, src)
    }
  }
}
