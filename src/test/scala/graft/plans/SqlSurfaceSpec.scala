package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The engine driven from PURE SQL: the p1 curation chain — quality
  * filter → exact dedup → capped near-dup pairs → components →
  * keep-canonical — executed via `spark.sql` and the graft_* table
  * functions only, must reproduce the p1 query key exactly. */
class SqlSurfaceSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.install(spark)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW docs AS " +
      s"SELECT doc_id, text, lang FROM parquet.`$Sf/documents.parquet`")
  }

  test("p1's curation chain runs from spark.sql only and matches the query key") {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sql_q1 AS
        |SELECT d.doc_id, d.text, q.quality_score
        |FROM docs d JOIN graft_quality('docs', 'doc_id', 'text') q USING (doc_id)
        |WHERE q.quality_score >= 0.55""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sql_q2 AS
        |SELECT sql_q1.* FROM sql_q1
        |JOIN graft_exact_groups('sql_q1', 'doc_id', 'text') g USING (doc_id)
        |WHERE g.doc_id = g.canonical_id""".stripMargin)
    val cap = spark.sql(
      "SELECT greatest(5L, CAST(floor(count(*) / 100) AS BIGINT)) FROM sql_q2")
      .collect()(0).getLong(0)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW sql_pairs AS
         |SELECT * FROM graft_dedup_pairs('sql_q2', 'doc_id', 'text', 3, 0.5, $cap)"""
        .stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sql_comp AS
        |SELECT * FROM graft_components('sql_pairs', 'ida', 'idb')""".stripMargin)
    val sqlRes = spark.sql(
      """SELECT sql_q2.doc_id, sql_q2.quality_score FROM sql_q2
        |LEFT ANTI JOIN (SELECT id AS doc_id FROM sql_comp
        |                WHERE id <> component_id) losers USING (doc_id)
        |ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val key = graft.SparkEntry.queries("p1_curate_corpus")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sqlRes.nonEmpty)
    assert(sqlRes == key)
  }

  test("graft_sample_stratified from SQL equals the Scala operator") {
    val fromSql = spark.sql(
      """SELECT doc_id FROM graft_sample_stratified(
        |  'docs', 'doc_id', 'lang', 'en:300,de:500', 's1')""".stripMargin)
      .collect().map(_.getLong(0)).sorted.toSeq
    val direct = graft.operators.Sampling.stratified(spark,
        spark.table("docs"), "doc_id", "lang", Seq("en" -> 300, "de" -> 500), "s1")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(fromSql == direct)
  }

  test("graft_pii_redact from SQL equals the Scala operator") {
    val fromSql = spark.sql(
      "SELECT doc_id, n_pii, redacted FROM graft_pii_redact('docs', 'doc_id', 'text')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val direct = graft.operators.TextAnalysis
      .piiRedact(spark.table("docs"), "doc_id", "text")
      .select("doc_id", "n_pii", "redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(fromSql == direct)
  }

  test("graft_changes serves the stored change feed from SQL") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sql_cdf").toString + "/t"
    def stg(rows: Seq[(Long, String)]) =
      rows.toDF("id", "last_status")
        .withColumn("created_at", lit("2024-05-30 10:00:00").cast("timestamp"))
    val ts = lit("2024-06-01 00:00:00").cast("timestamp")
    val v1 = graft.sources.Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq(1L -> "OPEN", 2L -> "OPEN")), "id", ts, "last_status", "DONE")
    val v2 = graft.sources.Sinks.upsertByKeyVersioned(spark, root,
      stg(Seq(1L -> "DONE", 3L -> "OPEN")), "id", ts, "last_status", "DONE")
    val out = spark.sql(
      s"SELECT id, _change_type, _commit_version FROM graft_changes('$root', $v1, $v2)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.count(_._3 == v1) == 2) // first run: two inserts
    assert(out.filter(_._3 == v2).map(t => (t._1, t._2)).sorted.toSeq ==
      Seq((1L, "update_postimage"), (1L, "update_preimage"), (3L, "insert")))
  }

  test("graft_table / graft_table_at read and time-travel the versioned table from SQL") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sql_tt").toString + "/t"
    graft.sources.VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    graft.sources.VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "x"), root)
    assert(spark.sql(s"SELECT count(*) FROM graft_table('$root')")
      .collect()(0).getLong(0) == 2)
    // time travel from SQL: v1 still shows the single-row world, and it
    // composes with ordinary SQL (joins, filters) like any subquery
    assert(spark.sql(s"SELECT id FROM graft_table_at('$root', 1)")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql(
      s"""SELECT cur.id FROM graft_table('$root') cur
         |LEFT ANTI JOIN graft_table_at('$root', 1) old ON cur.id = old.id
         |""".stripMargin).collect().map(_.getLong(0)).toSeq == Seq(2L))
    // an uncommitted version is an analysis-time error, not silent empties
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table_at('$root', 99)").collect()
    }
  }

  test("SELECT ... FROM '<root>' VERSION AS OF / TIMESTAMP AS OF — the " +
    "read face is symmetric with RESTORE/CLONE's AS OF") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sql_tt2")
      .toString + "/t"
    graft.sources.VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    graft.sources.VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "x"), root)
    // via GraftSql.execute (this session's parser is not injectable
    // post-build; sessions built with GraftExtensions get the same
    // rewrite inside GraftSqlParser.parsePlan/parseQuery)
    assert(GraftSql.execute(spark, s"SELECT id FROM '$root' VERSION AS OF 1")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // composes as a subquery: alias, filter, join against the current read
    assert(GraftSql.execute(spark,
      s"""SELECT cur.id FROM graft_table('$root') cur
         |LEFT ANTI JOIN (SELECT * FROM '$root' VERSION AS OF 1) old
         |ON cur.id = old.id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // TIMESTAMP AS OF: any time at/after the last commit reads the
    // current snapshot (the commit-marker clock)
    val ts = new java.sql.Timestamp(System.currentTimeMillis() + 60000)
    assert(GraftSql.execute(spark,
      s"SELECT count(*) FROM '$root' TIMESTAMP AS OF '$ts'")
      .collect()(0).getLong(0) == 2L)
    // COPY INTO's own FROM '<dir>' clause is untouched by the rewrite
    assert(GraftSql.rewriteTimeTravel(
      s"COPY INTO '$root' FROM '/landing' FILEFORMAT = PARQUET")
      .contains("FROM '/landing' FILEFORMAT"))
  }

  test("graft_quality_classifier from SQL equals the Scala operator") {
    val fromSql = spark.sql(
      "SELECT doc_id, weight_sum, keep FROM graft_quality_classifier('docs', 'doc_id', 'text')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val direct = graft.operators.TextAnalysis
      .qualityClassifier(spark.table("docs"), "doc_id", "text")
      .select("doc_id", "weight_sum", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(fromSql.nonEmpty && fromSql == direct)
  }

  test("graft_mix_interleave from SQL equals the Scala operator") {
    val fromSql = spark.sql(
      """SELECT doc_id, rank, pos FROM graft_mix_interleave(
        |  'docs', 'doc_id', 'lang', 'en:100,de:40', 'm1')""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val direct = graft.operators.Sampling.mixInterleave(spark,
        spark.table("docs"), "doc_id", "lang", Seq("en" -> 100, "de" -> 40), "m1")
      .select("doc_id", "rank", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(fromSql.nonEmpty && fromSql == direct)
  }

  test("graft_knn_pq from SQL equals the Scala operator") {
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW embs AS " +
      s"SELECT vec_id, embedding FROM parquet.`$Sf/embeddings.parquet`")
    spark.sql(
      "CREATE OR REPLACE TEMPORARY VIEW embq AS " +
      "SELECT * FROM embs WHERE vec_id % 20 = 0")
    val fromSql = spark.sql(
      "SELECT query_id, rank, neighbor_id FROM graft_knn_pq('embq', 'embs', 'vec_id', 'embedding', 3)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val direct = graft.operators.Similarity.pqTopK(
        spark.table("embq"), spark.table("embs"), "vec_id", "embedding",
        3, 4, 16, 16, 2, 12)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(fromSql.nonEmpty && fromSql == direct)
  }

  test("graft_knn_ivfpq from SQL equals the Scala operator") {
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW embs AS " +
      s"SELECT vec_id, embedding FROM parquet.`$Sf/embeddings.parquet`")
    spark.sql(
      "CREATE OR REPLACE TEMPORARY VIEW embq AS " +
      "SELECT * FROM embs WHERE vec_id % 20 = 0")
    val fromSql = spark.sql(
      "SELECT query_id, rank, neighbor_id FROM graft_knn_ivfpq('embq', 'embs', 'vec_id', 'embedding', 3, 16, 3)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val direct = graft.operators.Similarity.ivfPqTopK(
        spark.table("embq"), spark.table("embs"), "vec_id", "embedding",
        3, 16, 3, 2, 4, 16, 16, 2, 12)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(fromSql.nonEmpty && fromSql == direct)
  }

  test("graft_fuzzy_join from SQL equals the Scala operator") {
    val fromSql = spark.sql(
      "SELECT ida, idb, edit_dist FROM graft_fuzzy_join('docs', 'doc_id', 'text', 40, 6, 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val direct = graft.operators.Dedup
      .fuzzyJoinPairs(spark.table("docs"), "doc_id", "text", 40, 6, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(fromSql == direct)
  }

  test("table functions reject non-literal arguments with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_quality(lower('DOCS'), 'doc_id', 'text')")
        .collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
