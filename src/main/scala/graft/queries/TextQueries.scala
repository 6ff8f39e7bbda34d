package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis}
import graft.sources.Tables
import graft.streaming.{EventStream, SessionStream, StateStream}

/** SURVEY.md §2e/§2f — text analysis (t1–t4), multimodal metadata (m1),
  * and the batch face of the streaming pipeline (st1).
  *
  * Every oracle re-derives the exact arithmetic (same double-op order,
  * same modular hashes) in DuckDB SQL; see SURVEY.md §4 determinism rules.
  */
object TextQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_langid"          -> ((s, d) => t1(s, d)),
    "t2_quality"         -> ((s, d) => t2(s, d)),
    "t3_token_count"     -> ((s, d) => t3(s, d)),
    "t4_fingerprint"     -> ((s, d) => t4(s, d)),
    "t5_vocabulary"      -> ((s, d) => t5(s, d)),
    "t6_tfidf"           -> ((s, d) => t6(s, d)),
    "t7_repetition"      -> ((s, d) => t7(s, d)),
    "t8_pii_redact"      -> ((s, d) => t8(s, d)),
    "t9_quality_classifier" -> ((s, d) => t9(s, d)),
    "t10_perplexity"     -> ((s, d) => t10(s, d)),
    "t11_bpe_tokenize"   -> ((s, d) => t11(s, d)),
    "t12_bpe_vocab"      -> ((s, d) => t12(s, d)),
    "t13_bpe_ids"        -> ((s, d) => t13(s, d)),
    "m1_multimodal_meta" -> ((s, d) => m1(s, d)),
    "m3_multimodal_frames" -> ((s, d) => m3(s, d)),
    "m2_multimodal_resize" -> ((s, d) => m2(s, d)),
    "st1_stream_window"  -> ((s, d) => st1(s, d)),
    "st2_stream_session" -> ((s, d) => st2(s, d)),
    "st3_stream_enrich"  -> ((s, d) => st3(s, d)),
    "st4_stream_state"   -> ((s, d) => st4(s, d)),
    "st5_stream_dedup"   -> ((s, d) => st5(s, d)),
    "st6_stream_join"    -> ((s, d) => st6(s, d)),
    "st7_stream_apply"   -> ((s, d) => st7(s, d)),
    "st8_stream_ivm"     -> ((s, d) => st8(s, d))
  )

  private val SessionGapSeconds = 7200L // same boundary as q13

  def t1(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  def t2(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  def t3(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(s, dir), "source", "text")
      .orderBy(col("source"))

  def t4(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Fixed training rounds for t11 — the unrolled-iteration oracle
    * trick (each round is one CTE stage in the DuckDB twin). */
  private val BpeRounds = 12

  /** t11: REAL subword tokenization — greedy BPE trained on this
    * corpus ([[graft.operators.Bpe]]), applied as a pure fold of
    * codegen'd string replaces. The token unit p3/p4/p7 can re-key on
    * (BpeSpec pins that swap); t3's ceil(len/4) estimate stays as the
    * cheap per-source rollup. */
  def t11(s: SparkSession, dir: String): DataFrame =
    t11Apply(s, dir, t11Train(s, dir))

  /** TRAIN once (the amortized half the bench times separately — the
    * faiss-style build/probe split the ANN keys already use): one
    * corpus wordcount + [[BpeRounds]] vocabulary-sized rounds. */
  def t11Train(s: SparkSession, dir: String): Seq[(String, String)] =
    graft.operators.Bpe.trainMerges(Tables.documents(s, dir), "text", BpeRounds)

  /** APPLY a trained merges table: one map-side pass over the corpus. */
  def t11Apply(
      s: SparkSession, dir: String,
      merges: Seq[(String, String)]): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs
      .withColumn("toks", graft.operators.Bpe.tokens(col("text"), merges))
      .withColumn("n_words",
        size(filter(split(graft.functions.TextHash.normText(col("text")), " "),
          w => w =!= "")).cast("long"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .select(
        col("doc_id"), col("n_words"), col("n_tokens"),
        (col("n_tokens").cast("double") /
          nullif(col("n_words"), lit(0L)).cast("double")).as("tokens_per_word"),
        concat_ws("|", slice(col("toks"), 1, 12)).as("preview"))
      .orderBy(col("doc_id"))
  }

  /** t12: the SUBWORD VOCABULARY the trained tokenizer induces — per
    * token its total count, document frequency, and frequency rank:
    * the artifact a training run pairs with the merges table (vocab
    * size, coverage, and the id space). Wordcount-shaped: one map-side
    * explode of [[t11Apply]]'s token arrays, one shuffle on the token
    * with map-side partials; doc frequency via a per-doc
    * array_distinct BEFORE the explode (never a count-distinct over
    * the corpus). Deterministic rank: (count DESC, token ASC) — a
    * GLOBAL window, deliberately: it orders the VOCABULARY (type
    * count, ~10^6-10^7 at web scale — a once-per-corpus artifact
    * build), never corpus rows; the corpus-scale stages before it are
    * all map-side-combined shuffles. */
  def t12(s: SparkSession, dir: String): DataFrame = {
    val merges = t11Train(s, dir)
    // tokenization (greedy BPE per doc — the expensive part) feeds TWO
    // aggregations with different shapes (explode vs explode∘distinct),
    // so exchange reuse can't dedupe it: materialize the token arrays
    // once instead of tokenizing the corpus per consumer
    val docs = Tables.documents(s, dir)
      .withColumn("toks", graft.operators.Bpe.tokens(col("text"), merges))
      .localCheckpoint(eager = false)
    val counts = docs.select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_total"))
    val dfreq = docs.select(explode(array_distinct(col("toks"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_docs"))
    counts.join(dfreq, "token")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("n_total"), asc("token"))).cast("long"))
      .select(col("rank"), col("token"), col("n_total"), col("n_docs"))
      .orderBy(col("rank"))
  }

  private val VocabTopK  = 100
  private val TfidfTopK  = 3

  def t5(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(Tables.documents(s, dir), "doc_id", "text", VocabTopK)
      .orderBy(col("rank"))

  def t6(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", TfidfTopK)
      .orderBy(col("doc_id"), col("term_rank"))

  def t10(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramSurprise(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** t7's per-row fold is interpreted (HOF lambdas don't codegen), so its
    * wall time is compute-bound, not scan-bound — and the test corpus is a
    * single small parquet split, which would pin all of it to ONE core.
    * The round-robin repartition fans the rows across the executor threads
    * first (measured 2.8 s → 0.9 s at sf0.1); at production scale the scan
    * already yields thousands of splits and the extra exchange of raw text
    * is noise next to the per-row work it parallelizes. */
  def t7(s: SparkSession, dir: String): DataFrame =
    // fan-out sized from the session, not a local[32] constant
    TextAnalysis.repetition(
        Tables.documents(s, dir).repartition(s.sparkContext.defaultParallelism),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  def m1(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractMeta(
      Multimodal.withPayload(Tables.documents(s, dir), "text"), "doc_id", "payload")
      .orderBy(col("doc_id"))

  private val ResizeW = 8
  private val ResizeH = 4

  /** m2: the decode pipeline end-to-end — opaque payload → fixed-size
    * resample (resizeStub) → per-payload feature extraction
    * (decodeFeatures), both stages real iterator-based mapPartitions
    * plumbing. The stub arithmetic is deterministic byte math, so the
    * oracle re-derives it from the ASCII codes and hash-checks the whole
    * chain, not just row counts. */
  def m2(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(
      Multimodal.resizeStub(
        Multimodal.withPayload(Tables.documents(s, dir), "text"),
        "doc_id", "payload", ResizeW, ResizeH),
      "id", "resized")
      .orderBy(col("id"))

  private val FrameBytes  = 64
  private val FrameStride = 2

  /** m3: FRAME SAMPLING over opaque media payloads — every `stride`-th
    * fixed-size chunk of each payload becomes its own row (the video
    * frame-extraction shape: one input row fans out to many, iterator
    * flatMap, memory bounded by one payload), then a per-frame content
    * hash + size — the columns a frame-level dedup or embedding pass
    * keys on. Chunking is the codec stub (as m1/m2); the fan-out
    * plumbing, schema, and per-frame hashing are real and the oracle
    * re-derives every frame byte-for-byte. */
  def m3(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(
        Multimodal.withPayload(Tables.documents(s, dir), "text"),
        "doc_id", "payload", FrameBytes, FrameStride)
      .select(col("id"), col("frame_idx"),
        length(col("frame_bytes")).cast("long").as("n_bytes"),
        graft.functions.TextHash.charPolyHash(col("frame_bytes").cast("string"))
          .as("frame_hash"))
      .orderBy(col("id"), col("frame_idx"))

  /** st1: the batch run of the SAME transform the streaming job executes
    * (graft.streaming.EventStream.windowedAgg) — batch/stream unification
    * is the operator's contract. */
  def st1(s: SparkSession, dir: String): DataFrame =
    EventStream.windowedAgg(Tables.events(s, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** st2: batch run of the STATEFUL streaming sessionizer — the same
    * flatMapGroupsWithState fold (graft.streaming.SessionStream) that runs
    * incrementally on the unbounded stream, executed over the full history
    * with the final open session flushed. Values are folded as exact
    * integer cents (doubles hold integers exactly ≤ 2^53), so the
    * order-sensitive imperative sum is still oracle-exact. */
  def st2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val typed = Tables.events(s, dir)
      .select(col("user_id"), col("ts"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").cast("double").as("value"))
      .as[SessionStream.Event]
    SessionStream.sessionizeBatch(typed, SessionGapSeconds).toDF()
      .select(col("user_id").as("id"),
        timestamp_micros(col("session_start_us")).as("session_start"),
        timestamp_micros(col("session_end_us")).as("session_end"),
        col("n_events"),
        col("sum_value").cast("long").as("sum_cents"))
      .orderBy(col("id"), col("session_start"))
  }

  /** st3: batch run of the stream-static enrichment join + windowed agg
    * (graft.streaming.EventStream.enrichedWindowedAgg) — the dim is
    * broadcast, the stream side shuffles only for the aggregate. */
  def st3(s: SparkSession, dir: String): DataFrame =
    EventStream.enrichedWindowedAgg(Tables.events(s, dir),
        Tables.customer(s, dir), "c_custkey", "c_mktsegment")
      .orderBy(col("window_start"), col("segment"))

  /** st4: batch run of the streaming entity-state maintenance
    * (graft.streaming.StateStream) — the mapGroupsWithState fold that
    * incrementally maintains the reference's latest-state-per-entity
    * table, executed over the full history. The fold is associative, so
    * this equals the window formulation (Snapshots.stateAsOf); the spec
    * additionally proves stream ≡ batch across adversarial multi-batch
    * splits. */
  def st4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val typed = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[StateStream.Ev]
    StateStream.currentStates(typed, "purchase").toDF()
      .orderBy(col("id"))
  }

  // st5's simulated at-least-once redelivery: this slice of the feed
  // arrives twice (a queue replay / file re-drop), byte-identical.
  // Public: the micro-batch bench replays the same window.
  val ReplayFrom = "2024-01-05 00:00:00"
  val ReplayTo   = "2024-01-10 00:00:00"

  /** t8: PII scrub over the documents, the synthetic corpus carrying no
    * natural PII — so each doc gets a DETERMINISTIC contact footer
    * synthesized from its id (email always; phone / IPv4 / SSN-format id
    * on id-modulus subsets, so counts vary per doc), the same
    * decorate-then-compute pattern as the m1/m2 codec stubs: the footer
    * is re-derived by the oracle, and the Spark-side rule evaluation,
    * counting, and ordered redaction chain are fully real. See
    * [[TextAnalysis.piiRedact]]. */
  def t8(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def z(c: Column) = c.cast("string")
    val decorated = Tables.documents(s, dir).select(id, concat(
      col("text"),
      lit(" contact user"), z(id), lit("@mail.example.com"),
      when(id % 2 === 0, concat(lit(" call 555-"),
        lpad(z(id % 1000), 3, "0"), lit("-"), lpad(z(id % 10000), 4, "0")))
        .otherwise(lit("")),
      when(id % 3 === 0, concat(lit(" from 10."),
        z(id % 256), lit(".0."), z((id * 7) % 256))).otherwise(lit("")),
      when(id % 5 === 0, concat(lit(" id 123-45-"),
        lpad(z(id % 10000), 4, "0"))).otherwise(lit(""))).as("text"))
    TextAnalysis.piiRedact(decorated, "doc_id", "text").orderBy(id)
  }

  /** st5: batch face of the streaming idempotent-ingest dedup
    * ([[EventStream.dedupStream]], `dropDuplicatesWithinWatermark`) — an
    * at-least-once feed (the base stream plus a byte-identical replayed
    * slice) collapses back to exactly-once per event. Redelivered events
    * are identical payloads, so the batch equivalent is row-distinct;
    * the stream keys on event_id with watermark-bounded state and is
    * row-equal (asserted in the micro-batch bench).
    *
    * Scale: one hash exchange on the distinct key — the same shuffle the
    * streaming form pays once per state partition, with state bounded by
    * the watermark horizon, not the stream length. */
  def st5(s: SparkSession, dir: String): DataFrame =
    EventStream.replayedFeed(Tables.events(s, dir), ReplayFrom, ReplayTo)
      .distinct().orderBy(col("event_id"))

  /** t9: model-based quality filtering — the hashed-feature linear
    * classifier ([[TextAnalysis.qualityClassifier]]); stub weight table,
    * real feature-hash → lookup → mean-score → sign-threshold chain. */
  def t9(s: SparkSession, dir: String): DataFrame =
    // same rationale as t7: per-word HOF hashing is interpreted
    // (compute-bound), so fan the small parquet split across cores first
    TextAnalysis.qualityClassifier(
        Tables.documents(s, dir).repartition(s.sparkContext.defaultParallelism),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  /** st6: batch face of the STREAM-STREAM interval join
    * ([[EventStream.attributionJoin]]) — each purchase matched to the same
    * user's clicks in the preceding hour (last-touch-window attribution).
    * The identical transform runs as a two-stream watermarked join with
    * bounded state; the spec asserts stream ≡ batch. */
  def st6(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    EventStream.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** st7: CONTINUOUS APPLY CHANGES run end to end — unlike st1–st6
    * (batch faces, stream ≡ batch spec-asserted) this key runs the REAL
    * streaming query: a feed-carrying source table takes an insert
    * seed, an append, an update, and a delete; [[ReplicaStream]] then
    * replays the whole feed through the change-feed source into a fresh
    * replica, each micro-batch one txn-stamped net-effect merge. The
    * result is the replica's final content, which the oracle states
    * relationally — so the correctness gate covers the stream source,
    * the net-effect fold, AND the transactional apply in one key. */
  def st7(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val tmp = java.nio.file.Files.createTempDirectory("graft_st7").toString
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val ck = s"$tmp/ck"
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val seed = orders.where(col("o_orderkey") % 4 === 1)
    VersionedTable.commit(seed, src, extras = Map("changes" ->
      VersionedTable.feedWritable(
        seed.withColumn("_change_type", lit("insert")))))
    VersionedTable.commitAppend(
      orders.where(col("o_orderkey") % 4 === 2), src, changeFeed = true)
    VersionedTable.updateWhere(s, src, col("o_orderkey") % 10 === 0,
      Map("o_orderstatus" -> lit("X")))
    VersionedTable.deleteWhere(s, src, col("o_totalprice") < lit(50000.0))
    graft.streaming.ReplicaStream.start(s, src, dst, Seq("o_orderkey"), ck,
      appId = "st7", availableNow = true).awaitTermination()
    VersionedTable.read(s, dst).orderBy(col("o_orderkey"))
  }

  /** st8: INCREMENTAL VIEW MAINTENANCE with retractions — the same
    * change history as st7 (seed, append, update moving keys across
    * groups, delete), but the consumer maintains a GROUP BY aggregate
    * (count + sum per order status) from the feed alone: deletes and
    * update pre-images RETRACT, inserts and post-images add, zeroed
    * groups disappear. The view converges to exactly the batch
    * aggregate over the source's final state — which is what the
    * oracle computes ([[graft.sources.AggReplica]] for the algebra,
    * [[graft.streaming.ViewStream]] for the exactly-once transport). */
  def st8(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val tmp = java.nio.file.Files.createTempDirectory("graft_st8").toString
    val src = s"$tmp/src"; val dst = s"$tmp/view"; val ck = s"$tmp/ck"
    // accumulate in DECIMAL: an incrementally-maintained double sum
    // drifts with addition order (the q1 exactness rule); the final
    // projection casts once
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
    val seed = orders.where(col("o_orderkey") % 4 === 1)
    VersionedTable.commit(seed, src, extras = Map("changes" ->
      VersionedTable.feedWritable(
        seed.withColumn("_change_type", lit("insert")))))
    VersionedTable.commitAppend(
      orders.where(col("o_orderkey") % 4 === 2), src, changeFeed = true)
    VersionedTable.updateWhere(s, src, col("o_orderkey") % 10 === 0,
      Map("o_orderstatus" -> lit("X")))
    VersionedTable.deleteWhere(s, src, col("o_totalprice") < lit(50000.0))
    graft.streaming.ViewStream.start(s, src, dst, Seq("o_orderstatus"),
      "o_totalprice", ck, appId = "st8", availableNow = true)
      .awaitTermination()
    VersionedTable.read(s, dst)
      .select(col("o_orderstatus"), col("n_rows"),
        col("value_sum").cast("double").as("value_sum"))
      .orderBy(col("o_orderstatus"))
  }

  /** t13: ENCODE to vocabulary IDS — the step that turns tokenized text
    * into model input: each document's token array mapped through the
    * t12 frequency-rank vocabulary (rank = token id). The id arrays are
    * compared as a '|'-joined preview plus a full checksum (the oracle
    * hashes cell values, so array columns stay out of the surface — the
    * t11 preview rule). Pipeline shape: the vocabulary is metadata-scale
    * (types, not tokens) and BROADCASTS into the position-exploded
    * corpus; the per-doc re-assembly groups on doc_id with the ordered
    * collect running inside the group — one corpus-scale shuffle, the
    * wordcount class. Token-less documents keep a row (empty ids). */
  def t13(s: SparkSession, dir: String): DataFrame = {
    val merges = t11Train(s, dir)
    // THREE consumers (vocab counts, the id join, the keep-every-doc
    // left side) — materialize the token arrays once (same rationale as
    // t12; tokenizing 3x dominated this key's wall time)
    val docs = Tables.documents(s, dir)
      .withColumn("toks", graft.operators.Bpe.tokens(col("text"), merges))
      .localCheckpoint(eager = false)
    val vocab = docs.select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_total"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("n_total"), asc("token"))).cast("long"))
      .select("token", "rank")
    val ids = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
      .join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("rank")))),
        x => x.getField("rank")).as("ids"))
    docs.select("doc_id").join(ids, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(size(col("ids")), lit(0)).cast("long").as("n_tokens"),
        coalesce(concat_ws("|", slice(col("ids"), 1, 12)), lit(""))
          .as("ids_preview"),
        coalesce(aggregate(col("ids"), lit(0L), (a, x) => a + x), lit(0L))
          .as("ids_sum"))
      .orderBy(col("doc_id"))
  }

  // ---- oracle SQL ---------------------------------------------------------

  private val NormExpr =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
  private val WsCte =
    s"w AS (SELECT *, string_split($NormExpr, ' ') AS ws FROM documents)"

  private def profSql(words: Seq[String]) = words.map("'" + _ + "'").mkString("[", ", ", "]")
  private def scoreSql(lang: String, words: Seq[String]) =
    s"len(list_filter(ws, x -> list_contains(${profSql(words)}, x)))::DOUBLE / len(ws)::DOUBLE AS score_$lang"

  /** CASE chain identical to TextAnalysis.langId's argmax fold. */
  private val PredSql = {
    val langs = TextAnalysis.StopwordProfiles.map(_._1)
    val whens = langs.init.zipWithIndex.map { case (lang, i) =>
      val cond = langs.drop(i + 1).map(l2 => s"score_$lang >= score_$l2").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${langs.last}' END"
  }

  /** Rolling polynomial hash (acc*31 + ascii) % 1000000007 over `e`.
    * DuckDB's list_reduce has no seed — it folds from the first element,
    * which equals the 0-seeded fold since 0*31 + c = c. */
  private def polyHashSql(e: String) =
    s"""list_reduce(list_transform(range(1, length($e) + 1), i -> ascii($e[i])::BIGINT),
       |      (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  /** The t11/t12 shared oracle machinery: unrolled BPE training rounds
    * + whole-corpus application, ending in a `tok` CTE of per-doc token
    * arrays. chr(1) = the symbol separator (prefix form — see
    * Bpe.scala's boundary argument); chr(2) no-ops an exhausted round,
    * matching the operator's early stop. MATERIALIZED round CTEs: each
    * references its predecessor three times (two merge subqueries +
    * FROM) — default inlining would expand the chain 3^rounds times. */
  private lazy val BpeTokCte: String = {
    def pat(i: Int) =
      s"coalesce((SELECT chr(1)||a||chr(1)||b FROM m$i), chr(2))"
    def rep(i: Int) = s"coalesce((SELECT chr(1)||a||b FROM m$i), chr(2))"
    val rounds = (1 to BpeRounds).map { i =>
      s"""m$i AS MATERIALIZED (SELECT arr[i] AS a, arr[i+1] AS b FROM
         |    (SELECT list_filter(string_split(s, chr(1)), x -> x <> '')
         |       AS arr, n FROM s${i - 1}) t,
         |    unnest(range(1, len(arr))) AS u(i)
         |  GROUP BY a, b ORDER BY sum(n) DESC, a, b LIMIT 1),
         |s$i AS MATERIALIZED (
         |  SELECT replace(s, ${pat(i)}, ${rep(i)}) AS s, n FROM s${i - 1})"""
        .stripMargin
    }.mkString(",\n")
    val applied = (1 to BpeRounds)
      .foldLeft("regexp_replace(nt, '(.)', e'\\x01\\\\1', 'g')") { (acc, i) =>
        s"replace($acc, ${pat(i)}, ${rep(i)})"
      }
    s"""WITH w AS MATERIALIZED (SELECT doc_id, $NormExpr AS nt FROM documents),
       |hist AS (SELECT word, count(*) AS n FROM
       |    (SELECT unnest(string_split(nt, ' ')) AS word FROM w)
       |  WHERE word <> '' GROUP BY word),
       |s0 AS MATERIALIZED (
       |  SELECT regexp_replace(word, '(.)', e'\\x01\\\\1', 'g') AS s, n FROM hist),
       |$rounds,
       |tok AS MATERIALIZED (SELECT doc_id,
       |    list_filter(string_split($applied, chr(1)),
       |      x -> x <> '' AND x <> ' ') AS toks,
       |    len(list_filter(string_split(nt, ' '), x -> x <> ''))::BIGINT AS n_words
       |  FROM w)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "t1_langid" -> {
      val scores = TextAnalysis.StopwordProfiles.map { case (l, p) => scoreSql(l, p) }
      s"""WITH $WsCte,
         |s AS (SELECT doc_id, ${scores.mkString(",\n    ")} FROM w)
         |SELECT doc_id, score_de, score_en, score_es, score_fr,
         |  $PredSql AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "t2_quality" -> {
      val en = profSql(TextAnalysis.StopwordProfiles.toMap.apply("en"))
      s"""WITH $WsCte,
         |q AS (SELECT doc_id,
         |    len(ws)::BIGINT AS n_words,
         |    (length($NormExpr) - len(ws) + 1)::DOUBLE / len(ws)::DOUBLE AS avg_word_len,
         |    len(list_distinct(ws))::DOUBLE / len(ws)::DOUBLE AS ttr,
         |    len(list_filter(ws, x -> list_contains($en, x)))::DOUBLE / len(ws)::DOUBLE AS stopword_ratio
         |  FROM w)
         |SELECT doc_id, n_words, avg_word_len, ttr, stopword_ratio,
         |  least(n_words::DOUBLE / 50.0, 1.0) * 0.4 + ttr * 0.3
         |    + least(stopword_ratio * 10.0, 1.0) * 0.3 AS quality_score
         |FROM q ORDER BY doc_id""".stripMargin
    },

    "t3_token_count" ->
      s"""WITH $WsCte,
         |d AS (SELECT source, len(ws)::BIGINT AS wst,
         |    list_sum(list_transform(ws, x -> ceil(length(x)::DOUBLE / 4.0)::BIGINT))::BIGINT AS bpe
         |  FROM w)
         |SELECT source, count(*) AS n_docs, sum(wst)::BIGINT AS ws_tokens,
         |  sum(bpe)::BIGINT AS bpe_tokens,
         |  sum(bpe)::DOUBLE / sum(wst)::DOUBLE AS bpe_per_word
         |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "t11_bpe_tokenize" ->
      s"""$BpeTokCte
         |SELECT doc_id, n_words, len(toks)::BIGINT AS n_tokens,
         |  len(toks)::DOUBLE / nullif(n_words, 0)::DOUBLE AS tokens_per_word,
         |  array_to_string(toks[1:12], '|') AS preview
         |FROM tok ORDER BY doc_id""".stripMargin,

    "t12_bpe_vocab" ->
      s"""$BpeTokCte,
         |cnt AS (SELECT t AS token, count(*)::BIGINT AS n_total FROM
         |    (SELECT unnest(toks) AS t FROM tok) GROUP BY t),
         |dfq AS (SELECT t AS token, count(*)::BIGINT AS n_docs FROM
         |    (SELECT unnest(list_distinct(toks)) AS t FROM tok) GROUP BY t)
         |SELECT row_number() OVER (ORDER BY n_total DESC, token)::BIGINT AS rank,
         |  token, n_total, n_docs
         |FROM cnt JOIN dfq USING (token)
         |ORDER BY rank""".stripMargin,

    "t13_bpe_ids" ->
      s"""$BpeTokCte,
         |cnt AS (SELECT t AS token, count(*)::BIGINT AS n_total FROM
         |    (SELECT unnest(toks) AS t FROM tok) GROUP BY t),
         |rnk AS MATERIALIZED (SELECT token,
         |    row_number() OVER (ORDER BY n_total DESC, token)::BIGINT AS rank
         |  FROM cnt),
         |e AS (SELECT doc_id, toks[i] AS token, i AS pos FROM tok,
         |    unnest(range(1, len(toks) + 1)) AS u(i)),
         |ids AS (SELECT doc_id, list(rank ORDER BY pos) AS ids
         |  FROM e JOIN rnk USING (token) GROUP BY doc_id)
         |SELECT t.doc_id,
         |  coalesce(len(ids), 0)::BIGINT AS n_tokens,
         |  coalesce(array_to_string(ids[1:12], '|'), '') AS ids_preview,
         |  coalesce(list_sum(ids), 0)::BIGINT AS ids_sum
         |FROM tok t LEFT JOIN ids USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "t4_fingerprint" ->
      s"""WITH n AS (SELECT doc_id, $NormExpr AS nt FROM documents),
         |f AS (SELECT doc_id, ${polyHashSql("nt")} AS fingerprint FROM n)
         |SELECT doc_id, fingerprint,
         |  min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
         |  count(*) OVER (PARTITION BY fingerprint) AS group_size
         |FROM f ORDER BY doc_id""".stripMargin,

    "t5_vocabulary" ->
      s"""WITH $WsCte,
         |x AS (SELECT doc_id, unnest(ws) AS word FROM w),
         |x2 AS (SELECT doc_id, word FROM x WHERE word <> ''),
         |g AS (SELECT word, count(*)::BIGINT AS tf,
         |    count(DISTINCT doc_id)::BIGINT AS df FROM x2 GROUP BY word),
         |r AS (SELECT *, row_number() OVER (ORDER BY tf DESC, word) AS rank FROM g)
         |SELECT word, tf, df, rank FROM r WHERE rank <= $VocabTopK
         |ORDER BY rank""".stripMargin,

    "t6_tfidf" ->
      s"""WITH $WsCte,
         |x AS (SELECT doc_id, unnest(ws) AS word FROM w),
         |x2 AS (SELECT doc_id, word FROM x WHERE word <> ''),
         |tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM x2 GROUP BY 1, 2),
         |df AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM x2 GROUP BY word),
         |j AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
         |    tf.tf::DOUBLE * (SELECT count(*) FROM documents)::DOUBLE / df.df::DOUBLE
         |      AS tfidf_ratio
         |  FROM tf JOIN df USING (word)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf_ratio DESC, word) AS term_rank FROM j)
         |SELECT doc_id, term_rank, word, tf, df, tfidf_ratio
         |FROM r WHERE term_rank <= $TfidfTopK
         |ORDER BY doc_id, term_rank""".stripMargin,

    "t10_perplexity" ->
      s"""WITH $WsCte,
         |x AS (SELECT doc_id, list_filter(ws, t -> t <> '') AS ts FROM w),
         |b AS (SELECT doc_id,
         |    CASE WHEN len(ts) >= 2 THEN list_transform(range(1, len(ts)),
         |      i -> ts[i] || ' ' || ts[i+1]) ELSE []::VARCHAR[] END AS bg
         |  FROM x),
         |e AS (SELECT doc_id, unnest(bg) AS bigram FROM b),
         |db AS (SELECT doc_id, bigram, count(*)::BIGINT AS occ
         |  FROM e GROUP BY 1, 2),
         |c2 AS (SELECT bigram, sum(occ)::BIGINT AS c2 FROM db GROUP BY bigram),
         |c1 AS (SELECT split_part(bigram, ' ', 1) AS prefix,
         |    sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1),
         |vv AS (SELECT count(DISTINCT t)::BIGINT AS v
         |  FROM (SELECT unnest(ts) AS t FROM x)),
         |model AS (SELECT c2.bigram,
         |    (length(bin(c1.c1 + vv.v)) - length(bin(c2.c2 + 1)))::BIGINT AS bits
         |  FROM c2
         |  JOIN c1 ON split_part(c2.bigram, ' ', 1) = c1.prefix
         |  CROSS JOIN vv),
         |pd AS (SELECT doc_id, sum(occ * bits)::BIGINT AS total_bits,
         |    sum(occ)::BIGINT AS n_bigrams
         |  FROM db JOIN model USING (bigram) GROUP BY doc_id)
         |SELECT x.doc_id,
         |  coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
         |  coalesce(pd.total_bits, 0)::BIGINT AS total_bits,
         |  CASE WHEN pd.n_bigrams > 0
         |    THEN pd.total_bits::DOUBLE / pd.n_bigrams::DOUBLE END
         |    AS avg_surprise_bits
         |FROM x LEFT JOIN pd USING (doc_id)
         |ORDER BY x.doc_id""".stripMargin,

    "t7_repetition" ->
      s"""WITH $WsCte,
         |b AS (SELECT doc_id, ws, len(ws) AS n,
         |    CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1]) ELSE []::VARCHAR[] END AS bg,
         |    CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) ELSE []::VARCHAR[] END AS tg
         |  FROM w)
         |SELECT doc_id, n::BIGINT AS n_words,
         |  CASE WHEN n > 0 THEN
         |    list_max(list_transform(list_distinct(ws),
         |      g -> len(list_filter(ws, x -> x = g))))::DOUBLE / n::DOUBLE
         |    ELSE 0.0 END AS top_word_frac,
         |  CASE WHEN len(bg) > 0 THEN
         |    list_max(list_transform(list_distinct(bg),
         |      g -> len(list_filter(bg, x -> x = g))))::DOUBLE / len(bg)::DOUBLE
         |    ELSE 0.0 END AS top_bigram_frac,
         |  CASE WHEN len(tg) > 0 THEN
         |    list_sum(list_transform(list_distinct(tg),
         |      g -> CASE WHEN len(list_filter(tg, x -> x = g)) > 1
         |        THEN len(list_filter(tg, x -> x = g)) ELSE 0 END))::DOUBLE
         |      / len(tg)::DOUBLE
         |    ELSE 0.0 END AS dup_trigram_frac
         |FROM b ORDER BY doc_id""".stripMargin,

    "m1_multimodal_meta" ->
      s"""WITH h AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
         |    ${polyHashSql("md5(text)")} AS fp FROM documents)
         |SELECT doc_id, n_bytes, fp AS content_hash,
         |  (['png', 'jpeg', 'wav'])[(fp % 3 + 1)::INT] AS format,
         |  (16 + fp % 480)::BIGINT AS width,
         |  (16 + (fp // 480) % 270)::BIGINT AS height,
         |  ((16 + fp % 480) * (16 + (fp // 480) % 270))::BIGINT AS n_pixels
         |FROM h ORDER BY doc_id""".stripMargin,

    // m3: frames re-derived by substring arithmetic (ASCII corpus: chars
    // ≡ bytes, the same equivalence m1/m2 already rely on); the per-row
    // list range enumerates ceil(len/frameBytes) frames — derived from
    // EACH payload's length, so no payload size can overflow a fixed
    // enumeration cap — stride filters
    "m3_multimodal_frames" ->
      s"""WITH f AS (SELECT doc_id, text,
         |    unnest(range(0, ceil(length(text) / $FrameBytes.0)::BIGINT)) AS frame_idx
         |  FROM documents),
         |f2 AS (SELECT doc_id, text, frame_idx FROM f
         |  WHERE frame_idx % $FrameStride = 0),
         |s AS (SELECT doc_id, frame_idx,
         |    substr(text, (frame_idx * $FrameBytes + 1)::INT, $FrameBytes) AS fr
         |  FROM f2)
         |SELECT doc_id AS id, frame_idx, length(fr)::BIGINT AS n_bytes,
         |  ${polyHashSql("fr")} AS frame_hash
         |FROM s ORDER BY id, frame_idx""".stripMargin,

    "st4_stream_state" ->
      """WITH se AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |    min(ts) OVER (PARTITION BY user_id) AS created_at
        |  FROM events)
        |SELECT user_id AS id, event_type AS last_status, created_at,
        |  ts AS updated_at,
        |  CASE WHEN event_type = 'purchase' THEN ts END AS deleted_at
        |FROM se WHERE rn = 1 ORDER BY id""".stripMargin,

    "m2_multimodal_resize" -> {
      val nOut = ResizeW * ResizeH
      s"""WITH r AS (SELECT doc_id,
         |    list_transform(range(0, $nOut),
         |      i -> ascii(text[((i * length(text)) // $nOut + 1)])::DOUBLE) AS v
         |  FROM documents),
         |s AS (SELECT doc_id,
         |    list_reduce(v, (a, x) -> a + x) AS sum1,
         |    list_reduce(list_transform(v, x -> x * x), (a, x) -> a + x) AS sum2
         |  FROM r)
         |SELECT doc_id AS id, $nOut::BIGINT AS n_bytes,
         |  sum1 / $nOut.0 AS mean_byte,
         |  sum2 / $nOut.0 - (sum1 / $nOut.0) * (sum1 / $nOut.0) AS var_byte
         |FROM s ORDER BY id""".stripMargin
    },

    // t8: the oracle derives its regex chain FROM TextAnalysis.PiiPatterns,
    // so the two sides cannot drift (patterns are in the Java∩RE2 subset;
    // DuckDB needs the 'g' flag to replace all occurrences as Spark does)
    "t8_pii_redact" -> {
      val pats = TextAnalysis.PiiPatterns
      def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"
      val counts = pats.map { case (n, re, _) =>
        s"len(regexp_extract_all(text, ${sqlLit(re)}))::BIGINT AS n_$n"
      }.mkString(",\n         |  ")
      val total = pats.map { case (_, re, _) =>
        s"len(regexp_extract_all(text, ${sqlLit(re)}))"
      }.mkString(" + ")
      val red = pats.foldLeft("text") { case (acc, (_, re, tag)) =>
        s"regexp_replace($acc, ${sqlLit(re)}, '$tag', 'g')"
      }
      s"""WITH dec AS (SELECT doc_id,
         |  text || ' contact user' || doc_id::VARCHAR || '@mail.example.com'
         |  || CASE WHEN doc_id % 2 = 0 THEN ' call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
         |       || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
         |  || CASE WHEN doc_id % 3 = 0 THEN ' from 10.' || (doc_id % 256)::VARCHAR
         |       || '.0.' || ((doc_id * 7) % 256)::VARCHAR ELSE '' END
         |  || CASE WHEN doc_id % 5 = 0 THEN ' id 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
         |  AS text FROM documents)
         |SELECT doc_id,
         |  $counts,
         |  ($total)::BIGINT AS n_pii,
         |  $red AS redacted
         |FROM dec ORDER BY doc_id""".stripMargin
    },

    // t9: stub weights re-derived from the same char-polynomial hash the
    // Spark side uses; bigram strings are built BEFORE hashing so the
    // hash's inner lambda variables cannot shadow the outer index
    "t9_quality_classifier" ->
      s"""WITH $WsCte,
         |b AS (SELECT doc_id, ws,
         |    CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1]) ELSE []::VARCHAR[] END AS bg
         |  FROM w),
         |f AS (SELECT doc_id, list_concat(
         |    list_transform(ws, x -> ${polyHashSql("x")}),
         |    list_transform(bg, x -> ${polyHashSql("x")})) AS hs
         |  FROM b),
         |s AS (SELECT doc_id, len(hs)::BIGINT AS n_feats,
         |    coalesce(list_sum(list_transform(hs,
         |      h -> (h % ${TextAnalysis.WeightRange}) - ${(TextAnalysis.WeightRange - 1) / 2})), 0)::BIGINT
         |      AS weight_sum
         |  FROM f)
         |SELECT doc_id, n_feats, weight_sum,
         |  weight_sum::DOUBLE / n_feats::DOUBLE AS score,
         |  weight_sum >= 0 AS keep
         |FROM s ORDER BY doc_id""".stripMargin,

    // st6: the batch formulation of the watermarked stream-stream join —
    // an interval self-join on the events table
    "st6_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
        |  p.value AS purchase_value
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |ORDER BY purchase_id, click_id""".stripMargin,
    // the replica's final state, stated relationally: seed + append,
    // then the update's CASE, then the delete's complement
    "st7_stream_apply" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders
        |WHERE o_orderkey % 4 IN (1, 2)
        |  AND NOT (o_totalprice < 50000.0)
        |ORDER BY o_orderkey""".stripMargin,

    // st8: the batch formulation of the retraction-maintained view —
    // the GROUP BY aggregate over the source's FINAL state (st7's final
    // state expression), which the incremental fold must equal exactly
    "st8_stream_ivm" ->
      """WITH fin AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    o_totalprice
        |  FROM orders
        |  WHERE o_orderkey % 4 IN (1, 2)
        |    AND NOT (o_totalprice < 50000.0))
        |SELECT o_orderstatus, count(*)::BIGINT AS n_rows,
        |  sum(coalesce(CAST(o_totalprice AS DECIMAL(18,2)), 0))::DOUBLE
        |    AS value_sum
        |FROM fin GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "st5_stream_dedup" ->
      s"""WITH feed AS (
         |  SELECT event_id, user_id, ts, event_type, value FROM events
         |  UNION ALL
         |  SELECT event_id, user_id, ts, event_type, value FROM events
         |  WHERE ts >= TIMESTAMP '$ReplayFrom' AND ts < TIMESTAMP '$ReplayTo')
         |SELECT DISTINCT event_id, user_id, ts, event_type, value
         |FROM feed ORDER BY event_id""".stripMargin,

    "st1_stream_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events,
        |  (sum(value::DECIMAL(14,2)))::DOUBLE AS sum_value,
        |  max(value) AS max_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,

    "st3_stream_enrich" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |  c_mktsegment AS segment,
        |  count(*) AS n_events,
        |  (sum(value::DECIMAL(14,2)))::DOUBLE AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2
        |ORDER BY window_start, segment""".stripMargin,

    "st2_stream_session" ->
      s"""WITH e AS (
         |  SELECT user_id, ts, event_id,
         |    (value::DECIMAL(12,2) * 100)::BIGINT AS cents,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN prev_us IS NULL
         |      OR epoch_us(ts) - prev_us > ${SessionGapSeconds}000000 THEN 1 ELSE 0 END AS is_new
         |  FROM e),
         |g AS (
         |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                              ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM f)
         |SELECT user_id AS id, min(ts) AS session_start, max(ts) AS session_end,
         |  count(*) AS n_events, sum(cents)::BIGINT AS sum_cents
         |FROM g GROUP BY user_id, session_id
         |ORDER BY id, session_start""".stripMargin
  )
}
