package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text hashing building blocks for the dedup / fingerprint
  * operators (SURVEY.md §2c/§2e).
  *
  * Every hash here is EXPLICIT modular polynomial arithmetic — no
  * engine-native hash() — so the same numbers are computable in any SQL
  * engine (the driver's DuckDB oracle re-derives them); see SURVEY.md §4
  * "oracle-determinism rules". All arithmetic stays < 2^62 between mods
  * (Spark 4 runs ANSI mode: overflow throws rather than wraps).
  *
  * Everything is pure `org.apache.spark.sql.functions` composition —
  * usable inside higher-order-function lambdas (the shingle hasher is a
  * fold nested inside a transform).
  */
object TextHash {

  /** Large prime modulus for all polynomial hashing. */
  val Mod: Long = 1000000007L

  /** Base for the character-level polynomial hash. */
  val CharBase: Long = 31L

  /** Lowercase, strip non-alphanumerics to single spaces, trim — the
    * canonical normalization applied before tokenizing / exact dedup. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text (normalization collapses all
    * separators to single spaces, so a plain split is exact). */
  def wordsOf(c: Column): Column = split(normText(c), " ")

  /** Polynomial rolling hash over the characters of a string:
    * fold acc = (acc*31 + ascii(char)) % Mod. Deterministic, engine-neutral,
    * and exactly DuckDB's
    * `list_reduce(list_transform(range(1,length+1), i -> ascii(s[i])::BIGINT),
    *              (acc,x) -> (acc*31+x) % 1000000007)`. */
  def charPolyHash(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.PolyHash(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Higher-order-function reference formulation of [[charPolyHash]]
    * (engine-neutral; the native path must match it bit-for-bit). */
  def charPolyHashHof(c: Column): Column =
    when(length(c) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(c)),
          i => ascii(c.substr(i, lit(1))).cast("long")),
        lit(0L),
        (acc, x) => (acc * CharBase + x) % Mod))

  /** Distinct word n-gram shingles straight from the raw text — native
    * one-pass [[graft.plans.WordShingles]] (normalize → split → n-grams →
    * distinct). Value-identical to `shinglesFromWords(wordsOf(c), n)`, and
    * being one opaque expression it cannot be exploded into per-element
    * re-normalization by projection collapse. */
  def shingleSet(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.WordShingles(org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  /** Distinct word n-gram shingles from a (pre-materialized) words array
    * (HOF reference formulation of [[shingleSet]]).
    * 1-based positions; empty array when the doc has fewer than n words. */
  def shinglesFromWords(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      array_distinct(
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Hash each shingle string (aligned with the input array). Distinctness
    * of the STRING shingles is preserved; a (negligible, but possible) hash
    * collision therefore only ever affects candidate generation — exact
    * verification always re-checks on the strings themselves. */
  def shingleHashes(shArr: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.PolyHashArray(org.apache.spark.sql.graft.ColumnBridge.expression(shArr)))

  /** MinHash signature: k permutations h_i(x) = ((2i+3)·x + (5i+7)) % Mod,
    * signature[i] = min over the doc's shingle hashes. The affine constants
    * are tied to i so SQL oracles can re-derive them without literal
    * tables. Computed by the native one-pass [[graft.plans.MinHashSignature]]. */
  def minhashSig(hashArr: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.MinHashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression(hashArr), k))

  /** Higher-order-function reference formulation of [[minhashSig]]
    * (engine-neutral; the native path must match it value-for-value). */
  def minhashSigHof(hashArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hashArr,
        x => ((i.cast("long") * 2L + 3L) * x + (i.cast("long") * 5L + 7L)) % Mod)))

  /** Positional k-word window hashes — native one-pass
    * [[graft.plans.WordWindowHashes]]: array<struct<p:int, h:bigint>>,
    * one element per window start position over the normalized words,
    * hash = [[wideHash]] of the space-joined k-gram. */
  def positionalWindowHashes(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.WordWindowHashes(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), k))

  /** Distinct WIDE (55-bit) window-hash set per doc in one native pass —
    * value-equal to `wideShingleHashes(shingleSet(c, n))` as a SET
    * (first-occurrence order preserved by both). The string-free form of
    * the shingle set: posting lists, Jaccard verifies, and simhash inputs
    * all consume hashes, so nothing downstream ever needs the strings. */
  def windowHashSet(c: Column, n: Int): Column =
    array_distinct(transform(positionalWindowHashes(c, n), g => g.getField("h")))

  /** Narrow-space (1e9+7) variant — value-equal to
    * `shingleHashes(shingleSet(c, n))` element-for-element: the minhash
    * input space, kept for paths whose oracle re-derives the narrow
    * arithmetic. */
  def windowHashSetNarrow(c: Column, n: Int): Column =
    array_distinct(transform(
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.WordWindowHashes(
          org.apache.spark.sql.graft.ColumnBridge.expression(c), n,
          CharBase, Mod)),
      g => g.getField("h")))

  /** Higher-order-function reference formulation of
    * [[positionalWindowHashes]] (engine-neutral; the native path must
    * match it value-for-value). */
  def positionalWindowHashesHof(c: Column, k: Int): Column = {
    val ws = wordsOf(c)
    when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - k),
        i => struct(i.as("p"),
          wideHash(concat_ws(" ", slice(ws, i + 1, lit(k)))).as("h"))))
      .otherwise(array().cast("array<struct<p:int,h:bigint>>"))
  }

  /** Wide-space (55-bit prime) polynomial hash for collision-sensitive
    * JOIN KEYS — shuffling 8-byte longs instead of shingle strings. Not
    * oracle-visible: results derived from it (candidate sets, match
    * counts) are identical to string-keyed joins up to a ~1e-8 birthday
    * bound (see graft.plans.GraftExpressions.WideMod). */
  def wideHash(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.PolyHash(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        graft.plans.GraftExpressions.WideBase, graft.plans.GraftExpressions.WideMod))

  /** Wide-space variant of [[shingleHashes]] — one 55-bit hash per shingle.
    * The SimHash input: fingerprint bits j ≥ 30 are only meaningful when
    * the underlying hash actually populates them (the 1e9+7 space leaves
    * them constant-zero, which silently empties the high simhash bands).
    * IS oracle-visible (unlike [[wideHash]]'s join keys): d4's fingerprint
    * arithmetic re-derives in SQL — acc·131 + byte stays < 2⁶³, BIGINT-safe
    * in any engine. */
  def wideShingleHashes(shArr: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.PolyHashArray(org.apache.spark.sql.graft.ColumnBridge.expression(shArr),
        graft.plans.GraftExpressions.WideBase, graft.plans.GraftExpressions.WideMod))
}
