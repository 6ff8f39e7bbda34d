package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash.normText

/** Deterministic greedy BPE (SURVEY.md §2e, the t11 key) — byte-pair
  * encoding trained on the corpus and applied as a pure column
  * expression, so the token unit the curation operators consume (p3
  * packing, p4 token budgets, p7 temperature mixing) is a REAL subword
  * tokenization instead of the ceil(len/4) estimate t3 reports.
  *
  * SHAPE (the Sennrich et al. 2016 algorithm, public):
  *   - TRAINING runs on the corpus WORD HISTOGRAM — one wordcount
  *     (the only corpus-scale job, the t5 shape), then `rounds`
  *     iterations over the vocabulary-sized histogram: count adjacent
  *     symbol pairs weighted by word frequency, take the most frequent
  *     (ties broken lexicographically — deterministic in any engine),
  *     merge it everywhere, repeat. Each round is one small aggregation
  *     plus a ONE-ROW collect; at 100 TB the histogram is
  *     vocabulary-sized (millions of rows, not trillions) and the
  *     rounds never touch the corpus again.
  *   - APPLICATION is a fold of `replace` calls over the
  *     SEPARATOR-PREFIXED symbol string (`\u0001` before every symbol,
  *     written `^` here): merge (a, b) rewrites `^a^b` to `^ab`.
  *     Plain string replace scans left to right without overlap —
  *     exactly BPE's application order — and the LEADING separator is
  *     the boundary proof in both directions: the pattern can match
  *     neither a longer symbol's prefix (the symbol's own text follows
  *     its separator) nor its suffix (no separator precedes the
  *     matched `a` there — a trailing-separator formulation gets
  *     exactly this wrong: "a b " matches the tail of symbol "aa"
  *     inside "aa b "), and adjacent matches never share a boundary
  *     char (the pattern claims no trailing separator), so `^a^b^a^b`
  *     merges BOTH pairs like real BPE. The whole normalized document
  *     is encoded in ONE pass: the inter-word gap is a space SYMBOL no
  *     trained merge contains (training runs on words), so merges
  *     never cross word boundaries. Zero UDFs, zero shuffles —
  *     `rounds` nested codegen'd string replaces, identical semantics
  *     in DuckDB (the oracle re-derives training and application with
  *     the same `replace`).
  *
  * Reference note: the reference stack counts tokens by whitespace
  * proxy (`public/lion_parcell_bonus_test_stg.py` has no tokenizer);
  * this operator exists for the training-data-pipeline surface. */
object Bpe {

  /** Symbol separator — a control char the normalized text (lowercase
    * alphanumerics + single spaces) can never contain. */
  val Sep = "\u0001"

  /** Every character of `w` prefixed with [[Sep]] — the initial symbol
    * string ("abc" becomes `^a^b^c`). */
  def symbolize(w: Column): Column = regexp_replace(w, "(.)", Sep + "$1")

  /** Apply `merges` in rank order to a symbol string. */
  def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (c, (a, b)) =>
      replace(c, lit(Sep + a + Sep + b), lit(Sep + a + b))
    }

  /** The symbol array of a symbol string (drops the leading empty the
    * separator-prefix split produces). */
  def symbols(sym: Column): Column =
    filter(split(sym, Sep), x => length(x) > 0)

  /** The token array of a document under `merges`: normalize, symbolize
    * the WHOLE text (word gaps become space symbols no merge touches),
    * fold the merges, split, drop the gaps. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    filter(symbols(applyMerges(symbolize(normText(text)), merges)),
      t => t =!= " ")

  /** Token count under `merges` — the column p3/p4/p7 re-key on. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(tokens(text, merges)).cast("long")

  /** Train `rounds` merges from the corpus. Returns them in RANK ORDER.
    * Stops early when no adjacent pair remains (every word fully
    * merged). The per-round collect is ONE row; the histogram never
    * leaves the cluster. */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int)
      : Seq[(String, String)] = {
    val hist = docs
      .select(explode(split(normText(col(textCol)), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(symbolize(col("w")).as("s"), col("n"))
      // pinned for the rounds: each round re-aggregates THIS frame — an
      // unpinned histogram would re-run the corpus wordcount per round
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    try while (merges.size < rounds && !done) {
      // the current symbolization = the merges so far, re-applied
      // map-side over the vocabulary-sized histogram (rounds × vocab
      // string work — no caching needed at this size)
      val cur = hist.select(
        symbols(applyMerges(col("s"), merges.toSeq)).as("arr"), col("n"))
      val best = cur
        .where(size(col("arr")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("arr")) - 1),
          i => struct(element_at(col("arr"), i).as("a"),
            element_at(col("arr"), i + 1).as("b")))).as("p"), col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else merges += ((best(0).getString(0), best(0).getString(1)))
    }
    // finally: a failed round must not leak the pinned histogram
    finally hist.unpersist(blocking = false)
    merges.toSeq
  }
}
