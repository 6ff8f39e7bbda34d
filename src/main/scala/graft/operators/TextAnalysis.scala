package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash._

/** Text-analysis suite for training-data curation (SURVEY.md §2e):
  * language-ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything is columnar `functions._` composition (codegen'd, no UDFs);
  * per-doc work is embarrassingly parallel — map-side only, no shuffle
  * except the explicit per-source rollup in [[tokenCounts]].
  *
  * Oracle determinism: scores use only +,*,/ on doubles in a fixed order
  * and explicit modular hashing, so a SQL engine re-derives identical
  * values (SURVEY.md §4).
  */
object TextAnalysis {

  /** Function-word profiles (public linguistic knowledge) used by the
    * stopword-hit language scorer. Alphabetical language order is the
    * deterministic argmax tie-break. */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "los", "las", "y", "un", "una", "es", "por", "como", "pero"),
    "fr" -> Seq("le", "la", "les", "et", "des", "du", "est", "que", "dans", "pour"))

  private def hitRatio(ws: Column, profile: Seq[String]): Column = {
    val hits = size(filter(ws, w => w.isInCollection(profile)))
    when(size(ws) > 0, hits.cast("double") / size(ws).cast("double")).otherwise(lit(0.0))
  }

  /** t1: language-ID. Scores each doc against every stopword profile
    * (hits / words) and predicts the argmax, earlier-alphabetical language
    * winning ties. Output: id, score_<lang>..., pred_lang. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = docs
      .withColumn("__ws", wordsOf(col(textCol)))
      .select(col(idCol) +: StopwordProfiles.map { case (lang, prof) =>
        hitRatio(col("__ws"), prof).as(s"score_$lang") }: _*)
    // argmax by CASE chain: lang i wins if its score is >= all later ones
    // (earlier langs already lost when their WHEN fell through)
    val langs = StopwordProfiles.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, i), rest) =>
        val geAllLater = langs.drop(i + 1)
          .map(l2 => col(s"score_$lang") >= col(s"score_$l2"))
          .reduce(_ && _)
        when(geAllLater, lit(lang)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** t2: document quality scoring. Emits the standard curation ratios —
    * word count, mean word length, type-token ratio, stopword ratio — and
    * a composite quality score in [0,1]:
    * 0.4·min(1, words/50) + 0.3·ttr + 0.3·clamp(stopword presence).
    * Short docs, low-diversity (boilerplate) docs, and stopword-free
    * (non-linguistic) docs all lose points. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enProfile = StopwordProfiles.toMap.apply("en")
    docs
      .withColumn("__norm", normText(col(textCol)))
      .withColumn("__ws", split(col("__norm"), " "))
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn("avg_word_len",
        // single-space normalization ⇒ letters = chars − (words − 1)
        (length(col("__norm")) - col("n_words") + lit(1)).cast("double") /
          col("n_words").cast("double"))
      .withColumn("ttr",
        size(array_distinct(col("__ws"))).cast("double") / col("n_words").cast("double"))
      .withColumn("stopword_ratio",
        size(filter(col("__ws"), w => w.isInCollection(enProfile))).cast("double") /
          col("n_words").cast("double"))
      .withColumn("quality_score",
        least(col("n_words").cast("double") / 50.0, lit(1.0)) * 0.4 +
          col("ttr") * 0.3 +
          least(col("stopword_ratio") * 10.0, lit(1.0)) * 0.3)
      .select(col(idCol), col("n_words"), col("avg_word_len"), col("ttr"),
        col("stopword_ratio"), col("quality_score"))
  }

  /** t3: token counting, rolled up per source. `ws_tokens` is the
    * whitespace tokenization; `bpe_tokens` is the BPE-ish estimate (the
    * REAL trained tokenizer is [[graft.operators.Bpe]] / the t11 key —
    * this rollup keeps the cheap per-source heuristic) — each
    * word contributes ceil(len/4) pieces (subword chunking; the classic
    * ~4-chars-per-token heuristic, computed exactly per word). One shuffle
    * on the group key with map-side partials. */
  def tokenCounts(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__ws", wordsOf(col(textCol)))
      .withColumn("__wst", size(col("__ws")).cast("long"))
      .withColumn("__bpe",
        aggregate(col("__ws"), lit(0L),
          (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long")))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__wst")).as("ws_tokens"),
        sum(col("__bpe")).as("bpe_tokens"),
        (sum(col("__bpe")).cast("double") / sum(col("__wst")).cast("double"))
          .as("bpe_per_word"))

  /** t5: corpus vocabulary — the top-K terms by total frequency with
    * per-term document frequency, the table a tokenizer/vocab build
    * starts from. Explode is map-side; the one shuffle keys on the word
    * WITH map-side partial aggregation (word counts collapse before the
    * exchange — the classic wordcount shape, linear at any corpus size).
    * The global top-K is a TakeOrdered over the aggregated vocabulary
    * (size = distinct terms, not corpus size).
    *
    * The rank needs NO window: after `limit(topK)` at most topK rows
    * remain, so they ride one deterministic-sorted partition and
    * `monotonically_increasing_id` (= the within-partition row index on
    * partition 0) numbers them — avoiding the unpartitioned-WindowExec
    * plan that (harmlessly but alarmingly) warns about moving all data
    * to a single partition. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame = {
    val counts = docs
      .withColumn("__ws", wordsOf(col(textCol)))
      .select(col(idCol), explode(col("__ws")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("tf"), count_distinct(col(idCol)).as("df"))
    counts
      .orderBy(col("tf").desc, col("word")).limit(topK)
      .coalesce(1)
      .sortWithinPartitions(col("tf").desc, col("word"))
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
  }

  /** t6: per-document top terms by tf·idf. The idf factor is the RATIO
    * n_docs/df rather than ln(n_docs/df): ln is monotone, so the per-doc
    * ranking is identical, while the ratio stays in +,*,/ arithmetic that
    * reproduces bit-for-bit across engines (ln's last-ulp varies by libm
    * — it would break exact oracle comparison for no ranking gain).
    *
    * Plan: two wordcount-shaped aggregations (doc-term tf, term df) and
    * one equi-join on the term, then a per-doc top-k window. df comes
    * from the same exploded frame — at scale materialize it once (it IS
    * [[vocabulary]] without the top-K). */
  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val nDocs = docs.count()
    val words = docs
      .withColumn("__ws", wordsOf(col(textCol)))
      .select(col(idCol), explode(col("__ws")).as("word"))
      .filter(col("word") =!= "")
    val tf = words.groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val df = words.groupBy(col("word")).agg(count_distinct(col(idCol)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf_ratio").desc, col("word"))
    tf.join(df, Seq("word"))
      .withColumn("tfidf_ratio",
        col("tf").cast("double") * lit(nDocs.toDouble) / col("df").cast("double"))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("term_rank"), col("word"), col("tf"), col("df"),
        col("tfidf_ratio"))
  }

  /** t7: repetition / boilerplate signals (the Gopher-style repetition
    * rules — Rae et al. 2021 §A1.1, public): per doc,
    *   - `top_word_frac`    — occurrences of the most frequent word / words,
    *   - `top_bigram_frac`  — occurrences of the most frequent word bigram
    *                          / total bigrams,
    *   - `dup_trigram_frac` — fraction of trigram OCCURRENCES whose trigram
    *                          appears more than once (Gopher counts the
    *                          characters inside duplicated n-grams; the
    *                          occurrence fraction is the same signal over
    *                          uniform-length tokens).
    * Machine-generated / template text scores high on all three; natural
    * prose stays low. Everything is per-row higher-order-function
    * composition — map-side only, no shuffle, no UDF. Per-array cost is
    * one sort + one fold (equal grams are adjacent once sorted, so the
    * most-frequent count is the longest RUN and the duplicated-occurrence
    * total is the sum of runs ≥ 2 — O(n log n), not the naive
    * O(distinct·n) count-per-distinct-gram, measured 5× slower at sf0.1).
    * Grams are compared as LONGS, not strings: each word's 1e9+7 poly
    * hash fits 30 bits, so `h1·2³⁰ + h2` is an INJECTIVE bigram key and
    * `struct(bigramKey, h3)` an exact trigram key — no concat, no string
    * sort; only word-level hash collisions (~n²/2³¹ of the vocabulary,
    * the repo-wide accepted bound) can perturb counts.
    * Ratios are exact-integer divisions — bit-reproducible. */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // one pass over the sorted array: m = longest equal-run, d = total
    // occurrences inside runs of length ≥ 2 (state: prev, run, max, dup)
    def runStats(arr: Column, zeroElem: Column): Column =
      aggregate(
        array_sort(arr),
        struct(zeroElem.as("p"), lit(0L).as("r"), lit(0L).as("m"), lit(0L).as("d")),
        (acc, x) => {
          val nr = when(acc.getField("r") > 0 && x === acc.getField("p"),
            acc.getField("r") + 1L).otherwise(lit(1L))
          struct(
            x.as("p"),
            nr.as("r"),
            greatest(acc.getField("m"), nr).as("m"),
            (acc.getField("d") +
              when(nr === 2L, 2L).when(nr > 2L, 1L).otherwise(0L)).as("d"))
        })
    val B = lit(1L << 30)
    def seqGrams(hw: Column, n: Int)(key: Column => Column): Column =
      when(size(hw) >= n,
        transform(sequence(lit(1), size(hw) - (n - 1)), key))
        .otherwise(array().cast(if (n == 2) "array<bigint>"
          else "array<struct<bk:bigint,h3:bigint>>"))
    docs
      .withColumn("__hw", shingleHashes(wordsOf(col(textCol))))
      .withColumn("__ws", col("__hw")) // word keys are already longs
      .withColumn("__sw", runStats(col("__hw"), lit(0L)))
      .withColumn("__sb", runStats(
        seqGrams(col("__hw"), 2)(i =>
          element_at(col("__hw"), i) * B + element_at(col("__hw"), i + lit(1))),
        lit(0L)))
      .withColumn("__st", runStats(
        seqGrams(col("__hw"), 3)(i => struct(
          (element_at(col("__hw"), i) * B + element_at(col("__hw"), i + lit(1))).as("bk"),
          element_at(col("__hw"), i + lit(2)).as("h3"))),
        struct(lit(0L).as("bk"), lit(0L).as("h3"))))
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn("top_word_frac",
        when(col("n_words") > 0,
          col("__sw").getField("m").cast("double") / col("n_words").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("top_bigram_frac",
        when(col("n_words") >= 2,
          col("__sb").getField("m").cast("double") /
            (col("n_words") - 1L).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("dup_trigram_frac",
        when(col("n_words") >= 3,
          col("__st").getField("d").cast("double") /
            (col("n_words") - 2L).cast("double"))
          .otherwise(lit(0.0)))
      .select(col(idCol), col("n_words"), col("top_word_frac"),
        col("top_bigram_frac"), col("dup_trigram_frac"))
  }

  /** t10: corpus-trained BIGRAM SURPRISE — the perplexity-filter shape
    * (CCNet/Gopher filter training text by LM perplexity; both public)
    * with the corpus itself as the model, no external LM. Per document:
    *
    *   avg_surprise_bits = mean over its bigrams (u,v) of
    *     bitlen(c1(u) + V) − bitlen(c2(u,v) + 1)
    *
    * where c2 = corpus count of the bigram, c1 = corpus count of u as a
    * bigram PREFIX, V = corpus vocabulary size, and bitlen(x) =
    * ⌊log2 x⌋ + 1 — an INTEGER-QUANTIZED −log2 of the add-one-smoothed
    * bigram probability (c2+1)/(c1+V). Common phrasing scores LOW;
    * incoherent / out-of-domain / shuffled text scores HIGH — the
    * two-sided trim the perplexity filters apply. The quantization is
    * the reproducibility trick: bitlen computes as `length(bin(x))` in
    * BOTH engines, every sum is over integers, and the one floating
    * division happens last — so the score is bit-reproducible and the
    * DuckDB oracle re-derives it exactly (a float log-sum would diverge
    * in the last ulp and the order of summation).
    *
    * Scale shape: bigram extraction is MAP-SIDE (slice+zip over the
    * token array, no join); the model is two count aggregations (one
    * over per-doc bigram counts, one tiny over distinct bigrams); the
    * probe is one join of per-doc bigram counts against the
    * distinct-bigram model — every shuffle key is a short string, no
    * all-pairs term anywhere, nothing on the driver. */
  def bigramSurprise(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenization feeds two consumers with different downstream shapes
    // (the bigram explode and the vocab-size scalar) — materialize the
    // token arrays once instead of re-running wordsOf over the corpus
    val toks = docs
      .withColumn("__ts", filter(wordsOf(col(textCol)), w => w =!= ""))
      .localCheckpoint(eager = false)
    val bg = toks
      .withColumn("__bg",
        when(size(col("__ts")) >= 2,
          zip_with(
            slice(col("__ts"), lit(1), size(col("__ts")) - 1),
            slice(col("__ts"), lit(2), size(col("__ts")) - 1),
            (u, v) => concat(u, lit(" "), v)))
          .otherwise(array().cast("array<string>")))
      .select(col(idCol), explode(col("__bg")).as("bigram"))
    // per-doc bigram multiset (the probe side), then the corpus model
    val docBg = bg.groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("occ"))
    val c2 = docBg.groupBy("bigram").agg(sum("occ").as("c2"))
    val c1 = c2.withColumn("prefix", substring_index(col("bigram"), " ", 1))
      .groupBy("prefix").agg(sum("c2").as("c1"))
    // V as an eager scalar (the tfidfTopTerms docs.count() pattern): one
    // driver-side long, folded into the plan as a literal — no 1-row
    // cross join for the audit to mistake for a cartesian
    val vocabSize = toks.select(explode(col("__ts")).as("w"))
      .agg(countDistinct(col("w"))).first().getLong(0)
    val model = c2
      .withColumn("prefix", substring_index(col("bigram"), " ", 1))
      .join(c1, "prefix")
      .withColumn("bits",
        (length(bin(col("c1") + lit(vocabSize))) -
          length(bin(col("c2") + lit(1L)))).cast("long"))
      .select(col("bigram"), col("bits"))
    val perDoc = docBg.join(model, "bigram")
      .groupBy(col(idCol))
      .agg(sum(col("occ") * col("bits")).as("total_bits"),
        sum(col("occ")).as("n_bigrams"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("total_bits", coalesce(col("total_bits"), lit(0L)))
      .withColumn("avg_surprise_bits",
        when(col("n_bigrams") > 0L,
          col("total_bits").cast("double") / col("n_bigrams").cast("double")))
      .select(col(idCol), col("n_bigrams"), col("total_bits"),
        col("avg_surprise_bits"))
  }

  /** t4: document fingerprint — the rolling polynomial hash of the
    * normalized text (explicit modular arithmetic, engine-neutral) — and
    * the duplicate groups it induces. At corpus scale the fingerprint is
    * the shuffle key (a long, not the document), which is the point:
    * dedup shuffles 8-byte keys instead of documents. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("fingerprint"))
    docs
      .withColumn("fingerprint", charPolyHash(normText(col(textCol))))
      .select(
        col(idCol),
        col("fingerprint"),
        min(col(idCol)).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("group_size"))
  }

  /** t8's rule set: (name, regex, replacement tag), applied in this fixed
    * order. Patterns restricted to the Java-regex ∩ RE2 common subset
    * (no backreferences/lookaround; `\b`/`\d` are ASCII in both), so the
    * DuckDB oracle runs the IDENTICAL expressions. Public patterns only —
    * the standard PII-scrub rule shapes (email / NANP-style phone / IPv4 /
    * SSN-format id). */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ip",    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn",   "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"))

  /** t8: rule-based PII detection + redaction — the scrub pass an LLM
    * corpus runs before anything else sees the text. Per doc: a match
    * count per rule (counted on the ORIGINAL text, so counts are
    * independent of redaction order), the total, and the redacted text
    * with each match replaced by its type tag, rules applied in
    * [[PiiPatterns]] order.
    *
    * Scale: map-side only — per-row codegen'd regex evaluation, zero
    * shuffle, zero driver state; the scan prunes to (id, text). Rule
    * order is part of the contract: overlapping matches resolve by
    * earlier-rule-wins, identically in any engine that applies the same
    * ordered chain. */
  def piiRedact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = PiiPatterns.map { case (name, re, _) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$name")
    }
    val total = PiiPatterns.map { case (_, re, _) =>
      regexp_count(col(textCol), lit(re)).cast("long")
    }.reduce(_ + _).as("n_pii")
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (_, re, tag)) => regexp_replace(c, lit(re), lit(tag))
    }.as("redacted")
    docs.select(col(idCol) +: counts :+ total :+ redacted: _*)
  }

  /** t9's weight table size: feature weights live in [-(WeightRange-1)/2,
    * (WeightRange-1)/2] = [-1000, 1000]. */
  val WeightRange: Long = 2001L

  /** t9: MODEL-BASED quality filtering — a hashed bag-of-words linear
    * classifier in the fastText architecture (the CCNet / GPT-3-style
    * learned quality filter, the step after t2's rule-based ratios):
    * unigram + adjacent-word-bigram features, each hashed to an integer
    * id, a weight looked up per feature, the doc scored by the mean
    * weight and kept on sign.
    *
    * The weight table here is a DETERMINISTIC ARITHMETIC STUB —
    * `w(h) = h % 2001 − 1000` — standing in for trained parameters
    * exactly like the m1/m2 codec stubs stand in for image decoders: the
    * real plumbing (tokenize → feature-hash → weight lookup → mean-score
    * → threshold) is what's exercised, and the oracle re-derives the stub
    * weights from the same hash, hash-checking the whole chain. A
    * production deployment swaps `weightOf` for an `element_at` lookup
    * into a broadcast trained weight array (same plan shape: map-side
    * scalar per feature).
    *
    * Exactness: feature ids and weights are integers, the per-doc sum is
    * an integer, and the mean is a single double division — bit-equal in
    * any engine. Scale: map-side only, zero shuffle, scan pruned to
    * (id, text); the keep decision is `weight_sum >= 0` (sign of the
    * mean, integer compare — no float threshold). */
  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def weightOf(h: Column): Column = h % WeightRange - lit((WeightRange - 1) / 2)
    docs
      .withColumn("__ws", wordsOf(col(textCol)))
      .withColumn("__bg",
        zip_with(
          slice(col("__ws"), lit(1), size(col("__ws")) - 1),
          slice(col("__ws"), lit(2), size(col("__ws")) - 1),
          (a, b) => concat(a, lit(" "), b)))
      .withColumn("__feats",
        concat(
          transform(col("__ws"), w => charPolyHash(w)),
          transform(col("__bg"), g => charPolyHash(g))))
      .withColumn("n_feats", size(col("__feats")).cast("long"))
      .withColumn("weight_sum",
        aggregate(col("__feats"), lit(0L), (acc, h) => acc + weightOf(h)))
      .select(col(idCol), col("n_feats"), col("weight_sum"),
        (col("weight_sum").cast("double") / col("n_feats").cast("double"))
          .as("score"),
        (col("weight_sum") >= 0).as("keep"))
  }
}
