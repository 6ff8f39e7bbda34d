package graft.operators

import graft.SparkSpec
import graft.operators.Packing.{DocTokens, Packed}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def d(id: Long, t: Long, g: String = "g", sh: Long = 0L) =
    DocTokens(g, sh, id, t)

  test("foldShard: greedy first-fit with strict-overflow boundary") {
    // capacity 10: [4,6] fills seq 1 exactly (4+6 = 10 is NOT overflow),
    // 5 overflows → seq 2; [5,5] fills it; 1 → seq 3
    val out = Packing.foldShard(
      Seq(d(1, 4), d(2, 6), d(3, 5), d(4, 5), d(5, 1)), 10)
    assert(out.map(p => (p.id, p.seq_id, p.seq_offset)) ==
      Seq((1L, 1L, 0L), (2L, 1L, 4L), (3L, 2L, 0L), (4L, 2L, 5L), (5L, 3L, 0L)))
  }

  test("foldShard: an oversized doc occupies a sequence alone") {
    val out = Packing.foldShard(Seq(d(1, 3), d(2, 99), d(3, 3)), 10)
    assert(out.map(p => (p.id, p.seq_id, p.seq_offset)) ==
      Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L)))
  }

  test("packSequences: distributed result equals the per-shard fold") {
    val docs = (0L until 50L)
      .map(i => (i, s"src${i % 2}", Seq.fill((i % 7 + 3).toInt)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Packing.packSequences(spark, docs, "doc_id", "source", "text",
        capacity = 12L, shardSize = 20L)
      .as[Packed].collect().sortBy(p => (p.stratum, p.id)).toSeq
    // reference: group rows in plain Scala, fold each shard independently
    val expected = (0L until 50L)
      .map(i => DocTokens(s"src${i % 2}", i / 20L, i, i % 7 + 3))
      .groupBy(dt => (dt.stratum, dt.shard)).toSeq
      .flatMap { case (_, ds) => Packing.foldShard(ds.sortBy(_.id), 12L) }
      .sortBy(p => (p.stratum, p.id))
    assert(got == expected)
    // shard boundaries really partition the fold: ids 18..20 of one source
    // never share a sequence numbering chain across shard 0 → 1
    assert(got.filter(_.shard == 1L).forall(_.seq_id >= 1L))
    assert(got.count(_.seq_offset == 0L) ==
      expected.count(_.seq_offset == 0L))
  }
}
