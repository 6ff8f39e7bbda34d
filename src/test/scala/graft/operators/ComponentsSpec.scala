package graft.operators

import graft.SparkSpec

/** Connected-components labeling: exactness on known graph shapes,
  * multi-round convergence, and the non-convergence guard. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 20) =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques resolve to their minimum ids") {
    val out = cc(Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a path graph needs multiple rounds and still converges") {
    // 8-vertex path with the min at one end: label must walk the diameter
    val path = (1L to 7L).map(i => (i, i + 1))
    val out = cc(path)
    assert(out.values.toSet == Set(1L))
    assert(out.keySet == (1L to 8L).toSet)
  }

  test("label direction does not matter: min can sit at either edge end") {
    val out = cc(Seq((5L, 9L), (9L, 2L))) // min (2) arrives via dst side
    assert(out == Map(5L -> 2L, 9L -> 2L, 2L -> 2L))
  }

  test("non-convergence within maxIter throws instead of mislabeling") {
    val path = (1L to 7L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Components.connectedComponents(path.toDF("a", "b"), "a", "b", maxIter = 2)
        .collect()
    }
  }

  test("alternating star algorithm matches propagation on clique unions") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (5L, 9L), (9L, 2L))
    val expect = cc(edges)
    val alt = Components
      .connectedComponentsAlternating(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt == expect)
  }

  test("1000-vertex chain: propagation alone cannot finish, the hybrid converges") {
    // diameter 999 → label propagation needs ~999 rounds; the alternating
    // large-star/small-star fallback contracts the path multiplicatively
    val path = (1L to 999L).map(i => (i, i + 1)).toDF("a", "b")
    // propagation-only (fallback disabled) provably cannot label the chain
    intercept[IllegalStateException] {
      Components.connectedComponents(path, "a", "b", maxIter = 20, switchAfter = 20)
        .collect()
    }
    // the default hybrid switches after 5 rounds and finishes inside 20
    val out = Components.connectedComponents(path, "a", "b", maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (1L to 1000L).toSet)
    assert(out.values.toSet == Set(1L))
  }

  test("dedupClusters sizes match and singletons stay absent") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("ida", "idb")
    val out = Components.dedupClusters(pairs, "ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }

  test("keepCanonical removes exactly the non-canonical cluster members") {
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 7L), (9L, 10L)).toDF("ida", "idb")
    val kept = Components.keepCanonical(docs, "doc_id", pairs, "ida", "idb")
      .collect().map(_.getLong(0)).toSet
    // clusters {2,5,7}→keep 2 and {9,10}→keep 9; singletons untouched
    assert(kept == Set(1L, 2L, 3L, 4L, 6L, 8L, 9L))
  }

  test("clusters on the real corpus: every pair endpoint shares its component") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 24, 3, 0.5)
    val labels = Components.connectedComponents(pairs, "ida", "idb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ps = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty)
    ps.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across components") }
    // canonical id is a member of its own component
    labels.values.foreach(cid => assert(labels(cid) == cid))
  }
}
