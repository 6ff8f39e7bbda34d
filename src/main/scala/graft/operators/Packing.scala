package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash.wordsOf

/** Greedy sequence packing — the step between a curated corpus and a
  * training run: concatenate documents (in a deterministic order) into
  * fixed-capacity token sequences, starting a new sequence whenever the
  * next document would overflow. Packing density drives training
  * throughput; the assignment must be reproducible so a re-run shards
  * examples identically.
  *
  * The fold is inherently sequential, so the unit of sequential work must
  * be BOUNDED: documents are packed within (stratum, shard) where
  * shard = id / shardSize — each group is ≤ shardSize docs by
  * construction, groups are independent, and the result is deterministic
  * (id order within a shard). That is the 100 TB answer: a petabyte
  * corpus packs as millions of independent bounded folds (one shuffle on
  * the group key), not one driver-side loop; sequences never span a shard
  * boundary, which costs at most one partially-filled sequence per shard
  * — negligible for shardSize ≫ capacity/avg_tokens.
  *
  * First-fit semantics: a document lands in the open sequence iff
  * fill + tokens ≤ capacity, else it OPENS a new sequence (an oversized
  * single document therefore occupies a sequence alone — callers chunk
  * long docs upstream; nothing is silently truncated).
  */
object Packing {

  case class DocTokens(stratum: String, shard: Long, id: Long, n_tokens: Long)
  case class Packed(
      stratum: String,
      shard: Long,
      id: Long,
      n_tokens: Long,
      seq_id: Long,
      seq_offset: Long)

  /** The per-shard greedy fold (docs MUST be id-sorted). Pure and public:
    * specs and the streaming/batch parity argument both call it. */
  def foldShard(docs: Seq[DocTokens], capacity: Long): Seq[Packed] = {
    var seq = 1L
    var fill = 0L
    var first = true
    docs.map { d =>
      if (!first && fill + d.n_tokens > capacity) { seq += 1; fill = 0L }
      first = false
      val out = Packed(d.stratum, d.shard, d.id, d.n_tokens, seq, fill)
      fill += d.n_tokens
      out
    }
  }

  /** Pack `docs` into sequences of `capacity` whitespace tokens within
    * (stratumCol, id/shardSize) groups. Output: one row per doc with its
    * sequence id (1-based per group) and token offset inside it. */
  def packSequences(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      textCol: String,
      capacity: Long,
      shardSize: Long,
      tokenCount: Option[Column] = None): DataFrame = {
    import spark.implicits._
    // the token unit is pluggable: default whitespace words; pass e.g.
    // Bpe.tokenCount(col(textCol), merges) to pack on REAL subword
    // counts (BpeSpec pins that swap) — the fold is unit-agnostic
    val typed: Dataset[DocTokens] = docs
      .select(
        col(stratumCol).cast("string").as("stratum"),
        expr(s"CAST(`$idCol` AS BIGINT) div ${shardSize}L").as("shard"),
        col(idCol).cast("long").as("id"),
        tokenCount.getOrElse(size(wordsOf(col(textCol))).cast("long"))
          .cast("long").as("n_tokens"))
      .as[DocTokens]
    typed
      .groupByKey(d => (d.stratum, d.shard))
      .flatMapGroups { (_: (String, Long), it: Iterator[DocTokens]) =>
        // bounded by shardSize rows — the group, not the stratum, is the
        // unit of memory
        foldShard(it.toSeq.sortBy(_.id), capacity).iterator
      }
      .toDF()
  }
}
