package graft.pipelines

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** End-to-end corpus curation: each stage's effect is independently
  * checkable on a hand-built corpus, and the composition never drops a
  * doc for the wrong reason. */
class CurateCorpusSpec extends SparkSpec {
  import spark.implicits._

  // hand-built corpus covering every drop reason:
  //  1: good unique doc                      -> survives
  //  2: exact duplicate of 3 (normalized)    -> 2 kept (canonical), 3 dropped
  //  3: exact duplicate of 2                 -> dropped (exact dedup)
  //  4: near-duplicate of 1 (1-word change)  -> dropped (near-dup, canon = 1)
  //  5: low quality (repeated single word)   -> dropped (quality filter)
  private val good =
    "the quick brown fox jumps over a lazy dog and then it runs far away " +
      "to find more of that good food for the long winter that is coming soon"
  private val near = good.replace("winter", "summer")
  private val docs = Seq(
    (1L, good),
    (2L, "a different doc that is about the sea and the sky and all of it " +
      "shines in the sun for a while and then it is dark again at night"),
    (3L, "A different doc that is about the sea and the sky and all of it " +
      "shines in the sun for a while and then it is dark again at night!"),
    (4L, near),
    (5L, ("spam " * 40).trim)
  ).toDF("doc_id", "text")

  test("curation drops low-quality, exact-dup and near-dup docs; keeps canonicals") {
    val r = CurateCorpus.run(docs, "doc_id", "text",
      minQuality = 0.55, shingleN = 3, jaccardThreshold = 0.5,
      minDfCap = 1000L, dfCapDivisor = 100L)
    val kept = r.curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
    // every stage ran and succeeded, in declaration order
    assert(r.stages.map(_.name) ==
      Seq("quality_filter", "exact_dedup", "neardup_pairs", "keep_canonical"))
    assert(r.stages.forall(_.status == graft.Pipeline.Succeeded))
    // quality_score rides through to the output
    val cols = r.curated.columns.toSet
    assert(cols == Set("doc_id", "text", "quality_score"))
  }

  test("a corpus with nothing to drop passes through unchanged") {
    val clean = Seq(
      (10L, "the sun rises over the hill and a bird sings of the morning " +
        "while people walk to work in the cool air that smells of rain"),
      (11L, "it was the best of times and it was the worst of times for a " +
        "city that never knew which of the two it wanted to be that year")
    ).toDF("doc_id", "text")
    val r = CurateCorpus.run(clean, "doc_id", "text",
      minQuality = 0.55, shingleN = 3, jaccardThreshold = 0.5,
      minDfCap = 1000L, dfCapDivisor = 100L)
    assert(r.curated.select("doc_id").collect().map(_.getLong(0)).toSet == Set(10L, 11L))
  }

  test("pipeline matches running the stages by hand on the real corpus") {
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val r = CurateCorpus.run(real, "doc_id", "text",
      minQuality = 0.55, shingleN = 3, jaccardThreshold = 0.5,
      minDfCap = 5L, dfCapDivisor = 100L)
    val kept = r.curated.select("doc_id").collect().map(_.getLong(0)).toSet

    // by hand: the same chain, no Pipeline runner
    val q = graft.operators.TextAnalysis.quality(real, "doc_id", "text")
      .filter(col("quality_score") >= 0.55).select(col("doc_id"))
    val qd = real.join(q, Seq("doc_id"), "left_semi")
    val canon = graft.operators.Dedup.exactGroupsAgg(qd, "doc_id", "text")
      .filter(col("doc_id") === col("canonical_id")).select(col("doc_id"))
    val ed = qd.join(canon, Seq("doc_id"), "left_semi")
    val cap = math.max(5L, ed.count() / 100L)
    val pairs = graft.operators.Dedup.ngramJaccardPairs(ed, "doc_id", "text", 3, 0.5, Some(cap))
    val byHand = graft.operators.Components.keepCanonical(ed, "doc_id", pairs, "ida", "idb")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(kept == byHand)
    assert(kept.nonEmpty && kept.size < real.count())
  }
}
