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

  /** Apply `merges` in rank order to a symbol string — the nested-
    * replace SPECIFICATION form (and the oracle's). Fine at spec scale;
    * at production vocabulary scale the nested expression tree stops
    * compiling, which is what [[encode]] exists for.
    *
    * KNOWN DIVERGENCE from atomic-symbol BPE: the leading separator
    * proves the LEFT element's boundary (`^a` cannot match inside a
    * longer symbol — its own text follows its separator), but the
    * pattern claims nothing AFTER `b`, so `^a^b` also matches where the
    * adjacent symbol merely STARTS with `b` (`^a^bx` under merge (a,b)
    * becomes `^abx`). [[encode]] compares whole symbols — correct BPE —
    * so the forms differ exactly when a trained pair's right element is
    * a proper prefix of a longer current symbol adjacent to the left
    * element. The pinned corpora never train such a table (BpeSpec's
    * row-for-row equality and the t11/t12 oracle hashes are the
    * evidence); a corpus that did would need the oracle reformulated
    * rather than the encoder weakened. */
  def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (c, (a, b)) =>
      replace(c, lit(Sep + a + Sep + b), lit(Sep + a + b))
    }

  /** The symbol array of a symbol string (drops the leading empty the
    * separator-prefix split produces). */
  def symbols(sym: Column): Column =
    filter(split(sym, Sep), x => length(x) > 0)

  // ---- native application (the production-scale tokenizer) ---------------

  /** The trained merges as an executor-shared lookup table: rank-indexed
    * pair arrays plus pair → ranks (ASCENDING — the same pair can
    * retrain at a later rank after other merges recreate it, and the
    * encoder must then run BOTH passes, exactly as the replace fold
    * does). Baked into [[graft.plans.BpeTokens]] as a plan reference
    * object — ~32k merges is a few hundred KB, shipped with the plan. */
  // (class BpeTable is top-level below: generated code must name it by a
  // plain Java class name — an object-nested class's binary name would
  // not resolve from janino source)

  /** Native BPE application over a NORMALIZED string — the executor-side
    * body of [[graft.plans.BpeTokens]]. Semantics are EXACTLY the
    * separator-prefixed replace fold's (the oracle's formulation): each
    * rank runs one left-to-right non-overlapping pass, a merged symbol
    * never re-matches as the left element within its own pass, and
    * merges never cross word boundaries (words encode independently —
    * the replace fold's space-symbol filter is implicit). Cost per
    * word: a pending-rank set of the pairs actually PRESENT drives the
    * loop, so a 32k-merge vocabulary costs O(applied passes x word
    * length), not O(32k) — the fold pays the full vocabulary in
    * expression size AND per-row work, and stops compiling in the
    * hundreds. */
  def encode(
      text: org.apache.spark.unsafe.types.UTF8String,
      table: BpeTable): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = s.length
    while (i < n) {
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) encodeWord(s, i, j, table, out)
      i = j + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  private def encodeWord(
      s: String, from: Int, to: Int, table: BpeTable,
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val len = to - from
    if (len == 1) {
      out += org.apache.spark.unsafe.types.UTF8String
        .fromString(s.substring(from, to))
      return
    }
    val syms = new Array[String](len)
    var i = 0
    while (i < len) { syms(i) = String.valueOf(s.charAt(from + i)); i += 1 }
    var m = len
    val pending = new java.util.TreeSet[Integer]
    // queue each PRESENT pair's first rank above `cur`: ranks below were
    // already passed (the fold never returns), later duplicates of the
    // same pair chain in when their predecessor pass applies
    def queueAbove(cur: Int): Unit = {
      var k = 0
      while (k < m - 1) {
        val rs = table.ranks.get(syms(k) + Sep + syms(k + 1))
        if (rs != null) {
          var x = 0
          while (x < rs.length && rs(x) <= cur) x += 1
          if (x < rs.length) pending.add(rs(x))
        }
        k += 1
      }
    }
    queueAbove(-1)
    while (!pending.isEmpty) {
      val r = pending.pollFirst().intValue()
      val a = table.pairsA(r)
      val b = table.pairsB(r)
      // one left-to-right pass, in place (write index trails read); the
      // rd += 2 on a merge = the scan resumes AFTER the replacement —
      // the string-replace semantics the boundary proof above rests on
      var w = 0
      var rd = 0
      var merged = false
      while (rd < m) {
        if (rd + 1 < m && syms(rd) == a && syms(rd + 1) == b) {
          syms(w) = a + b; merged = true; rd += 2
        } else { syms(w) = syms(rd); rd += 1 }
        w += 1
      }
      if (merged) { m = w; queueAbove(r) }
    }
    var k = 0
    while (k < m) {
      out += org.apache.spark.unsafe.types.UTF8String.fromString(syms(k))
      k += 1
    }
  }

  /** The token array of a document under `merges`: normalize, then the
    * NATIVE per-word encoder ([[encode]] via [[graft.plans.BpeTokens]]
    * — identical semantics to the replace-fold specification above,
    * constant plan size in the merge count). */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.BpeTokens.forMerges(
        org.apache.spark.sql.graft.ColumnBridge.expression(normText(text)),
        BpeTable(merges)))

  /** Token count under `merges` — the column p3/p4/p7 re-key on. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(tokens(text, merges)).cast("long")

  /** Train `rounds` merges from the corpus. Returns them in RANK ORDER.
    * Stops early when no adjacent pair remains (every word fully
    * merged).
    *
    * BATCHED: each Spark round collects the top `batchK` pair counts
    * (one small aggregation over the vocabulary-sized histogram) and
    * lands every merge the single-merge greedy would provably pick
    * next, in order — the maximal sorted PREFIX of pairwise
    * symbol-DISJOINT pairs whose counts strictly exceed the best
    * excluded count. Exactness: a merge only changes counts of pairs
    * sharing a symbol with it (destroyed neighbors) or containing the
    * merged symbol (created pairs, each bounded by a destroyed
    * neighbor's count) — so disjoint batch members keep their exact
    * counts, and the strict margin over the first excluded pair means
    * no created pair can tie into the order. Created occurrences can
    * never STACK onto a pre-existing pair either (which would evade the
    * per-pair bound): a standing pair (w, ab) coexisting with batch
    * member (a, b) would need two exact covers of the same char content
    * — symbol "ab" somewhere, symbols a·b elsewhere — but a span's
    * within-pass evolution depends only on its content (the rank-r scan
    * enters every exact cover at its left edge, and any match crossing
    * a cover's boundary DESTROYS that cover rather than re-segmenting
    * it), so all surviving exact covers of equal content carry
    * identical symbols, and a pair whose concatenation names an
    * existing symbol has count zero by construction. Worst case the batch is
    * one merge (the old behavior); on Zipf-shaped histograms it lands
    * tens per round, so a 32k-merge training runs hundreds of Spark
    * rounds, not 32k. The per-round re-symbolization is the NATIVE
    * encoder — constant plan size however many merges accumulated. */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int,
      batchK: Int = 256): Seq[(String, String)] =
    trainMergesDetailed(docs, textCol, rounds, batchK)._1

  /** Vocabulary ceiling for DRIVER-SIDE training: at or below it the
    * word histogram (the only corpus-scale artifact — types, not
    * tokens) collects once and the whole greedy loop runs in memory
    * with an updatable pair-priority structure — 32k merges in seconds,
    * ONE Spark job total. Above it, training stays on the cluster in
    * batched rounds. This is how production BPE trainers work (the
    * histogram of a 100 TB web corpus is ~10^7 types); the gate keeps
    * the collect bounded. */
  val DriverVocabLimitKey = "spark.graft.bpe.driverVocabLimit"
  val DriverVocabLimitDefault: Long = 1000000L

  /** In-memory greedy trainer over the collected word histogram —
    * EXACTLY the cluster road's semantics: count adjacent pairs
    * weighted by word frequency, take the (count desc, a asc, b asc)
    * best, run ONE left-to-right merge pass per affected word (the
    * fold/application semantics), update counts incrementally, repeat.
    * ASCII tie-break order (normText output) matches UTF8String binary
    * order, so the two roads train identical tables — BpeSpec pins it. */
  private def trainDriver(
      words: Array[(String, Long)], rounds: Int): Seq[(String, String)] = {
    val syms = words.map { case (w, _) =>
      val a = new Array[String](w.length)
      var i = 0
      while (i < w.length) { a(i) = String.valueOf(w.charAt(i)); i += 1 }
      (a, w.length) // (symbols, live length)
    }
    val live = syms.map(_._2).toArray
    val freq = words.map(_._2)
    val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering[Long].reverse, Ordering[String], Ordering[String])
    val queue = new java.util.TreeSet[(Long, String, String)](ord)
    def bump(p: (String, String), delta: Long, wordId: Int): Unit = {
      val c0 = cnt.getOrElse(p, 0L)
      val c1 = c0 + delta
      if (c0 > 0) queue.remove((c0, p._1, p._2))
      if (c1 > 0) { cnt.put(p, c1); queue.add((c1, p._1, p._2)) }
      else cnt.remove(p)
      if (delta > 0)
        where.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wordId
    }
    def contribute(i: Int, sign: Long): Unit = {
      val (a, m) = (syms(i)._1, live(i))
      var k = 0
      while (k < m - 1) {
        bump((a(k), a(k + 1)), sign * freq(i), i)
        k += 1
      }
    }
    var i = 0
    while (i < syms.length) { contribute(i, 1L); i += 1 }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (merges.size < rounds && !queue.isEmpty) {
      val (_, a, b) = queue.first()
      merges += ((a, b))
      val hits = where.getOrElse((a, b), scala.collection.mutable.Set.empty)
        .toArray
      hits.foreach { wi =>
        val (w, m) = (syms(wi)._1, live(wi))
        // present check: `where` is add-only (a stale id just no-ops)
        var present = false
        var k = 0
        while (!present && k < m - 1) {
          present = w(k) == a && w(k + 1) == b; k += 1
        }
        if (present) {
          contribute(wi, -1L)
          // one left-to-right pass, the application semantics
          var wr = 0; var rd = 0
          while (rd < m) {
            if (rd + 1 < m && w(rd) == a && w(rd + 1) == b) {
              w(wr) = a + b; rd += 2
            } else { w(wr) = w(rd); rd += 1 }
            wr += 1
          }
          live(wi) = wr
          contribute(wi, 1L)
        }
      }
      // the merged pair may legitimately RECUR later (recreated by other
      // merges): its queue entry, if re-added by contribute, stays — but
      // the JUST-TAKEN occurrence set was consumed; a fully-applied pair
      // has cnt 0 and no entry. Nothing to do here: bump() maintained
      // both structures.
    }
    merges.toSeq
  }

  /** [[trainMerges]] plus the number of SPARK ROUNDS it ran — the
    * batching's sub-linearity evidence (ScaleBench reports both). */
  def trainMergesDetailed(docs: DataFrame, textCol: String, rounds: Int,
      batchK: Int = 256): (Seq[(String, String)], Int) = {
    val hist = docs
      .select(explode(split(normText(col(textCol)), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      // pinned for the rounds: each round re-aggregates THIS frame — an
      // unpinned histogram would re-run the corpus wordcount per round
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val limit = docs.sparkSession.conf
      .get(DriverVocabLimitKey, DriverVocabLimitDefault.toString).toLong
    val vocab = hist.count()
    if (vocab <= limit) {
      // DRIVER ROAD: one collect of the type histogram, the whole greedy
      // loop in memory — total Spark work = the wordcount (+ this count)
      val words = hist.collect().map(r => (r.getString(0), r.getLong(1)))
      try return (trainDriver(words, rounds), 1)
      finally hist.unpersist(blocking = false)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var sparkRounds = 0
    try while (merges.size < rounds && !done) {
      sparkRounds += 1
      // the current symbolization = the merges so far, re-applied
      // map-side over the vocabulary-sized histogram by the native
      // encoder (a single word has no gaps: its tokens ARE its symbols)
      val cur = hist.select(
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.plans.BpeTokens.forMerges(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("w")),
            BpeTable(merges.toSeq))).as("arr"),
        col("n"))
      val top = cur
        .where(size(col("arr")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("arr")) - 1),
          i => struct(element_at(col("arr"), i).as("a"),
            element_at(col("arr"), i + 1).as("b")))).as("p"), col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(batchK).collect()
      if (top.isEmpty) done = true
      else {
        // maximal disjoint prefix + the strict-margin cut (see doc)
        val used = scala.collection.mutable.Set.empty[String]
        val prefix = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stopped = false
        var excludedCnt = Long.MinValue // best count outside the prefix
        top.foreach { r =>
          val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
          if (!stopped && !used(a) && !used(b) && !used(a + b)) {
            prefix += ((a, b, c)); used += a; used += b; used += (a + b)
          } else if (!stopped) { stopped = true; excludedCnt = c }
        }
        // an exhausted top-K (no conflict seen) bounds the unknown tail
        // by the last collected count — conservative, never wrong
        if (!stopped && top.length == batchK)
          excludedCnt = top.last.getLong(2)
        val batch0 = prefix.takeWhile(_._3 > excludedCnt)
        // the head alone is ALWAYS exact (ties included): it is what the
        // single-merge greedy picks
        val batch =
          if (batch0.nonEmpty) batch0
          else prefix.take(1)
        batch.take(rounds - merges.size).foreach { case (a, b, _) =>
          merges += ((a, b))
        }
      }
    }
    // finally: a failed round must not leak the pinned histogram
    finally hist.unpersist(blocking = false)
    (merges.toSeq, sparkRounds)
  }
}

/** The trained merges as an executor-shared lookup table: rank-indexed
  * pair arrays plus pair → ranks (ASCENDING — the same pair can retrain
  * at a later rank after other merges recreate it, and the encoder must
  * then run BOTH passes, exactly as the replace fold does). Baked into
  * [[graft.plans.BpeTokens]] as a plan reference object — ~32k merges
  * is a few hundred KB, shipped with the plan. Top-level on purpose:
  * generated code names the class directly. */
final class BpeTable(
    val pairsA: Array[String], val pairsB: Array[String])
  extends Serializable {
  @transient lazy val ranks: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < pairsA.length) {
      val k = pairsA(i) + Bpe.Sep + pairsB(i)
      var b = m.get(k)
      if (b == null) {
        b = scala.collection.mutable.ArrayBuffer.empty[Int]; m.put(k, b)
      }
      b += i
      i += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size * 2)
    m.forEach((k, b) => out.put(k, b.toArray))
    out
  }
  /** Plan-equality fingerprint ([[graft.plans.BpeTokens]] carries it
    * inside case equality so two tokenizers never compare equal).
    * Order-SENSITIVE combine: an XOR would collide the left/right-swapped
    * table — a semantically different tokenizer — with this one. */
  lazy val fingerprint: Int =
    scala.util.hashing.MurmurHash3.orderedHash(
      pairsA.iterator.zip(pairsB.iterator))
}

object BpeTable {
  def apply(merges: Seq[(String, String)]): BpeTable =
    new BpeTable(merges.map(_._1).toArray, merges.map(_._2).toArray)
}
