package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "the quick  brown FOX jumps over the lazy dog!"), // exact dup of 1 after normalization
    (3L, "The quick brown fox jumps over the sleepy dog"), // near-dup of 1 (1 word changed)
    (4L, "completely different content about spark engines and parquet files"),
    (5L, "xy") // fewer than 3 words → zero shingles
  ).toDF("doc_id", "text")

  test("exactGroups maps normalized duplicates to the min canonical id") {
    val out = Dedup.exactGroups(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq(
      (1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L), (4L, 4L, 1L), (5L, 5L, 1L)))
  }

  test("hash-keyed exactGroups equals the string-keyed formulation on the corpus") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def res(hashKey: Boolean) =
      Dedup.exactGroups(corpus, "doc_id", "text", hashShuffleKey = hashKey)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res(true) == res(false))
    // and the whale-safe aggregate+join form matches both
    val agg = Dedup.exactGroupsAgg(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg == res(true))
  }

  test("exactGroupsAgg on a mass-duplicated corpus (one text = half the rows)") {
    import org.apache.spark.sql.functions._
    val whale = spark.range(20000).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, lit("the exact same boilerplate text"))
        .otherwise(concat(lit("unique "), col("id"))).as("text"))
    val out = Dedup.exactGroupsAgg(whale, "doc_id", "text")
    assert(out.count() == 20000)
    val dupGroup = out.filter(col("group_size") === 10000)
    assert(dupGroup.count() == 10000)
    assert(dupGroup.agg(min("canonical_id")).collect()(0).getLong(0) == 0L)
    assert(out.filter(col("group_size") === 1).count() == 10000)
  }

  test("shingleDocs emits distinct n-grams, empty below n words") {
    val sh = Dedup.shingleDocs(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    val byId = sh.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(1L).head == "the quick brown")
    assert(byId(1L).size == 7)
    assert(byId(5L).isEmpty)
    // repeated trigram appears once
    val rep = Seq((9L, "a b a b a b a b")).toDF("doc_id", "text")
    val repSh = Dedup.shingleDocs(rep, "doc_id", "text", 3).collect()(0).getSeq[String](1)
    assert(repSh.toSet == Set("a b a", "b a b"))
  }

  test("ngramJaccardPairs finds near-dups above threshold with exact jaccard") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .orderBy("ida", "idb").collect()
    // docs 1,2 identical (jaccard 1.0); 1-3 and 2-3 share 5 of the 9
    // distinct shingles in their union (jaccard 5/9); all else below
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val j = out.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(math.abs(j((1L, 3L)) - 5.0 / 9.0) < 1e-12)
  }

  test("maxShingleDf cap drops ubiquitous shingles consistently on both sides") {
    val corpus = Seq(
      (1L, "common prefix words alpha beta gamma"),
      (2L, "common prefix words delta epsilon zeta"),
      (3L, "common prefix words eta theta iota")
    ).toDF("doc_id", "text")
    // "common prefix words" (and the two bridging trigrams per doc) — only
    // "common prefix words" has df=3; cap at 2 removes it everywhere.
    val uncapped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.1, Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(capped.isEmpty) // the only shared shingle was the capped one
  }

  test("df cap on the real corpus: planted near-dups survive, df>cap lists dropped") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def pairs(cap: Option[Long]) =
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(None)
    val capped = pairs(Some(5L)) // sf0.01 max df is 7: the cap bites
    assert(uncapped.nonEmpty)
    // planted near-dup pairs ride doc-specific shingles (df ≈ cluster
    // size), not boilerplate — capping boilerplate must not lose them
    assert(capped == uncapped, s"capped diverged: -${uncapped -- capped} +${capped -- uncapped}")
    // a cap of 1 removes every shared shingle by definition → no pairs:
    // proof the cap path really drops posting lists, not just re-filters
    assert(pairs(Some(1L)).isEmpty)
  }

  test("minhashLshPairs equals the exact ngram pair set after verification") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .orderBy("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 24, 3, 0.3)
      .orderBy("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(lsh == exact)
  }

  test("all-duplicate corpus: every pair found, jaccard 1.0") {
    val corpus = (1L to 6L).map(i => (i, "same words repeated here exactly"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5).collect()
    assert(pairs.length == 15) // C(6,2)
    assert(pairs.forall(_.getDouble(2) == 1.0))
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 24, 3, 0.5).collect()
    assert(lsh.length == 15)
  }

  test("docs below n words are excluded from near-dup ops, kept by exact dedup") {
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.1).count() == 0)
    assert(Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 24, 3, 0.1).count() == 0)
    val exact = Dedup.exactGroups(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 3L)))
  }

  test("SimHashAgg equals the relational explode+sum formulation") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "completely different words in this document about data engines"),
      (3L, "the quick brown fox jumps over the lazy dog and runs away fast"))
      .toDF("doc_id", "text")
    val native = Dedup.simhashFingerprints(corpus, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rel = Dedup.simhashFingerprintsRelational(corpus, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native == rel)
    assert(native(0)._2 == native(2)._2)
  }

  test("windowDupStats: shared k-windows counted, short docs keep 0-rows") {
    val corpus = Seq(
      // docs 1/2 share the 8-word prefix "w1 … w8"; doc 1 has 3 windows
      // (10 words), doc 2 has 2 (9 words)
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 y1"),
      (3L, "entirely different words here that never collide with anything else"),
      (4L, "too short for windows") // < 8 words
    ).toDF("doc_id", "text")
    val out = Dedup.windowDupStats(corpus, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // only the exact shared window "w1 … w8" is duplicated (df = 2)
    assert(out(0) == ((1L, 3L, 1L, 1.0 / 3.0)))
    assert(out(1) == ((2L, 2L, 1L, 0.5)))
    assert(out(2) == ((3L, 3L, 0L, 0.0)))
    assert(out(3) == ((4L, 0L, 0L, 0.0)))
  }

  test("contaminationStats: benchmark windows flagged, clean and short docs 0") {
    val bench = Seq(
      (100L, "b1 b2 b3 b4 b5 b6 b7 b8 tail words here")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "b1 b2 b3 b4 b5 b6 b7 b8 x1 x2"),   // 3 windows, 1 contaminated
      (2L, "clean words that never appear in the benchmark at all ok"),
      (3L, "too short")                          // < 8 words → 0-row
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationStats(corpus, bench, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((1L, 3L, 1L, 1.0 / 3.0)))
    assert(out(1) == ((2L, 4L, 0L, 0.0)))
    assert(out(2) == ((3L, 0L, 0L, 0.0)))
    // non-broadcast probe path: identical output
    val plain = Dedup.contaminationStats(corpus, bench, "doc_id", "text", 8,
        broadcastBench = false)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(plain.toSeq == out.toSeq)
  }

  test("contaminationSpans: positional hits, sorted span list, bench schema free of ids") {
    // bench deliberately has NO doc_id column (only text is required)
    val bench = Seq(
      Tuple1("b1 b2 b3 b4 b5 b6 b7 b8 tail words here")
    ).toDF("text")
    val corpus = Seq(
      // windows at 0..4; hits at 0 (b1..b8) and, via the bench's own
      // shifted window, at 1 (b2..tail)
      (1L, "b1 b2 b3 b4 b5 b6 b7 b8 tail x1 x2 x3"),
      (2L, "clean words that never appear in the benchmark at all ok"),
      (3L, "too short"),
      // the SAME contaminated window twice → both positions reported
      (4L, "b1 b2 b3 b4 b5 b6 b7 b8 b1 b2 b3 b4 b5 b6 b7 b8")
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(corpus, bench, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    assert(out(0) == ((1L, 5L, 2L, "0,1")))
    assert(out(1) == ((2L, 4L, 0L, "")))
    assert(out(2) == ((3L, 0L, 0L, "")))
    assert(out(3) == ((4L, 9L, 2L, "0,8")))
  }

  test("duplicateSpans: overlapping and adjacent dup windows merge, gaps split") {
    val k = 4
    val corpus = Seq(
      // docs 1/2 share "a1..a6" (dup windows at 1-positions 0,1,2 in doc 1 —
      // overlapping → ONE span [0,6)) and "z1..z4" (doc-1 window at 8 —
      // gap after position 2 → its own span [8,12))
      (1L, "a1 a2 a3 a4 a5 a6 q1 q2 z1 z2 z3 z4"),
      (2L, "a1 a2 a3 a4 a5 a6 r1 r2 r3"),
      (3L, "p1 p2 z1 z2 z3 z4 p3 p4 p5"),
      (4L, "nothing shared with any other document at all"),
      (5L, "a1 a2") // < k words → clean 0-row
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(corpus, "doc_id", "text", k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0) == ((1L, 4L, 2L, 10L, "0-6,8-12")))
    assert(out(1) == ((2L, 3L, 1L, 6L, "0-6")))
    assert(out(2) == ((3L, 1L, 1L, 4L, "2-6")))
    assert(out(3) == ((4L, 0L, 0L, 0L, "")))
    assert(out(4) == ((5L, 0L, 0L, 0L, "")))
  }

  test("duplicateSpans: token-adjacent spans merge; within-doc repeats count") {
    val k = 4
    val corpus = Seq(
      // doc 1: dup windows at 0 ("c1..c4") and 4 ("d1..d4") — spans [0,4)
      // and [4,8) are ADJACENT → one merged span [0,8)
      (1L, "c1 c2 c3 c4 d1 d2 d3 d4"),
      (2L, "c1 c2 c3 c4 x y z w"),
      (3L, "d1 d2 d3 d4 u v w1 w2"),
      // doc 4 repeats the shared window "c1..c4" twice with a gap — both
      // positional occurrences are cut sites, two spans
      (4L, "c1 c2 c3 c4 gap1 gap2 c1 c2 c3 c4")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(corpus, "doc_id", "text", k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0) == ((1L, 2L, 1L, 8L, "0-8")))
    assert(out(1) == ((2L, 1L, 1L, 4L, "0-4")))
    assert(out(2) == ((3L, 1L, 1L, 4L, "0-4")))
    assert(out(3) == ((4L, 2L, 2L, 8L, "0-4,6-10")))
  }

  test("exciseDuplicateSpans: canonical occurrence survives, every other cut") {
    val k = 4
    val corpus = Seq(
      // doc 1 holds the canonical (minimal (doc, p)) occurrence of every
      // shared window → nothing excised from it
      (1L, "a1 a2 a3 a4 a5 a6 q1 q2"),
      // doc 2's occurrences of a1..a6's windows (p = 0,1,2) are all
      // non-canonical → one merged span [0,6)
      (2L, "a1 a2 a3 a4 a5 a6 r1 r2 r3"),
      (3L, "p1 p2 unique words only here x"),
      // doc 4 repeats the shared window "a1..a4" at 0 and 6 — both
      // non-canonical (canonical is (1, 0)) → two spans, gap kept
      (4L, "a1 a2 a3 a4 gap1 gap2 a1 a2 a3 a4")
    ).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicateSpans(corpus, "doc_id", "text", k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 8L, 0L, "a1 a2 a3 a4 a5 a6 q1 q2")))
    assert(out(1) == ((2L, 9L, 6L, "r1 r2 r3")))
    assert(out(2) == ((3L, 7L, 0L, "p1 p2 unique words only here x")))
    assert(out(3) == ((4L, 10L, 8L, "gap1 gap2")))
  }

  test("exciseContamination: leaked windows cut everywhere, clean docs intact") {
    val bench = Seq(
      Tuple1("b1 b2 b3 b4 b5 b6 b7 b8 tail words here")
    ).toDF("text")
    val corpus = Seq(
      // hits at 0 and 1 (the bench's own shifted window) → span [0,9)
      (1L, "b1 b2 b3 b4 b5 b6 b7 b8 tail x1 x2 x3"),
      (2L, "clean words that never appear in the benchmark at all ok"),
      (3L, "too short"),
      // the contaminated window twice, spans [0,8) and [8,16) ADJACENT →
      // everything goes
      (4L, "b1 b2 b3 b4 b5 b6 b7 b8 b1 b2 b3 b4 b5 b6 b7 b8")
    ).toDF("doc_id", "text")
    val out = Dedup.exciseContamination(corpus, bench, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 12L, 9L, "x1 x2 x3")))
    assert(out(1) == ((2L, 11L, 0L,
      "clean words that never appear in the benchmark at all ok")))
    assert(out(2) == ((3L, 2L, 0L, "too short")))
    assert(out(3) == ((4L, 16L, 16L, "")))
  }

  test("incrementalDedupFlags: exact, near, and clean batch docs flagged vs corpus") {
    val corpus = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines and parquet files"),
      (3L, "some standing corpus document with plenty of ordinary words")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick  brown FOX jumps over the lazy dog!"), // exact dup of 1
      (11L, "The quick brown fox jumps over the sleepy dog"), // near-dup of 1
      (12L, "brand new material sharing nothing with anything already stored"),
      (13L, "xy") // < n words → zero shingles, never a near-dup
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedupFlags(corpus, batch, "doc_id", "text",
        3, 24, 3, 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0)._1 == 10L && out(0)._2 == 1L && out(0)._3 == 1L && out(0)._4 == 1.0)
    assert(out(1)._1 == 11L && out(1)._2 == 0L && out(1)._3 == 1L
      && out(1)._4 > 0.5 && out(1)._4 < 1.0)
    assert(out(2) == ((12L, 0L, 0L, 0.0)))
    assert(out(3) == ((13L, 0L, 0L, 0.0)))
  }

  test("incrementalDedupFlags: batch-internal duplicates do not flag each other") {
    val corpus = Seq((1L, "standing corpus text unrelated to the batch")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "twin text arriving twice in the same batch today"),
      (11L, "twin text arriving twice in the same batch today")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedupFlags(corpus, batch, "doc_id", "text",
        3, 24, 3, 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // within-batch dedup is d1's job, not the cross-corpus probe's
    assert(out(0) == ((10L, 0L, 0L, 0.0)))
    assert(out(1) == ((11L, 0L, 0L, 0.0)))
  }

  test("simhash: identical docs collide, near-dups within small hamming") {
    val fps = Dedup.simhashFingerprints(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(!fps.contains(5L)) // zero shingles → no fingerprint
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0L })
    // banding is lossless: brute-force hamming ≤ 16 pair set must match
    val brute = for {
      Seq((a, fa), (b, fb)) <- fps.toSeq.sortBy(_._1).combinations(2).toSeq
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 16
    } yield (a, b, h.toLong)
    assert(pairs.sorted == brute.sorted.toList)
  }

  test("fuzzyJoinPairs: within-block edit-distance pairs; blocking bounds recall") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamme delta"),   // 1 edit from doc 1, same block
      (3L, "alpha beta XXXXX YYYYY"),   // same block, far from 1/2
      (4L, "alpho beta gamma delta"),   // 1 edit from doc 1 INSIDE the block key
      (5L, "zeta eta theta iota"))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyJoinPairs(docs, "doc_id", "text",
        prefixLen = 20, blockLen = 6, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.contains((1L, 2L, 1L)))                 // caught: 1 edit, same block
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L)) // blocking recall limit:
    // the typo sits inside the 6-char block key, so doc 4 is never compared
    assert(!out.exists(p => p._2 == 3L && p._3 <= 3L)) // far pair excluded
    assert(!out.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("fuzzyJoinPairsMulti: the union recovers typo-in-block-key pairs, dedups, never loses") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamme delta"),   // 1 edit from doc 1, same leading block
      (3L, "alpha beta XXXXX YYYYY"),   // same leading block, far from 1/2
      (4L, "alpho beta gamma delta"),   // 1 edit from doc 1 INSIDE the leading block key
      (5L, "lapha beta gamma delta"),   // transposition in the leading block
      (6L, "zeta eta theta iota"))
      .toDF("doc_id", "text")
    val single = Dedup.fuzzyJoinPairs(docs, "doc_id", "text",
        prefixLen = 20, blockLen = 6, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val multi = Dedup.fuzzyJoinPairsMulti(docs, "doc_id", "text",
        prefixLen = 20, blockLen = 6, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // the recall dial: single-key blocking misses (1,4) — the substitution
    // sits inside the leading block — the second-slice key recovers it;
    // (1,5)'s transposition is recovered by the char-sorted window key
    assert(!single.contains((1L, 4L, 1L)) && multi.contains((1L, 4L, 1L)))
    assert(!single.contains((1L, 5L, 2L)) && multi.contains((1L, 5L, 2L)))
    // monotone: everything the single key finds, the union finds
    assert(single.subsetOf(multi.toSet))
    // a pair agreeing on several block keys is emitted ONCE (1,2 agrees
    // on all three) — and verification semantics are unchanged
    assert(multi.size == multi.distinct.size)
    assert(multi.contains((1L, 2L, 1L)))
    assert(!multi.exists(p => p._2 == 3L && p._3 <= 3L))
    assert(!multi.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("fuzzy multi/single recall parity on empty-normalized-text docs") {
    // docs whose text normalizes to empty (punctuation only): b0 is empty
    // too, so a drop-all-empty-keys rule would exclude them from the
    // multi form while the single-key form still pairs them — the empty
    // b0 key must survive the secondary-key empty filter
    val docs = Seq(
      (1L, "!!! ???"), (2L, "..."), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val single = Dedup.fuzzyJoinPairs(docs, "doc_id", "text",
        prefixLen = 20, blockLen = 6, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val multi = Dedup.fuzzyJoinPairsMulti(docs, "doc_id", "text",
        prefixLen = 20, blockLen = 6, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(single.contains((1L, 2L, 0L)))
    assert(multi.contains((1L, 2L, 0L)), "multi form lost the empty-text pair")
    assert(single.subsetOf(multi))
  }
}
