package graft.operators

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Persisted d10 corpus index: probe-only runs read ONLY the index tables
  * (scan-path audit) and reproduce the recompute-everything operator. */
class DedupIndexSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"
  private val (n, bands, bandRows, thr) = (3, 24, 3, 0.5)

  private lazy val corpusPath = {
    val p = java.nio.file.Files.createTempDirectory("graft_didx").toString + "/corpus"
    Tables.documents(spark, Sf).filter(col("doc_id") % 5 =!= 4)
      .write.parquet(p)
    p
  }
  private lazy val corpus = spark.read.parquet(corpusPath)
  private lazy val batch = Tables.documents(spark, Sf).filter(col("doc_id") % 5 === 4)
  private lazy val indexRoot = {
    val r = java.nio.file.Files.createTempDirectory("graft_didx").toString + "/index"
    Dedup.buildDedupIndex(corpus, "doc_id", "text", n, bands, bandRows, r)
    r
  }

  test("probe against the persisted index equals the recompute operator") {
    val probed = Dedup.probeDedupIndex(spark, indexRoot, batch, "doc_id", "text", thr)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val live = Dedup.incrementalDedupFlags(corpus, batch, "doc_id", "text",
        n, bands, bandRows, thr)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(probed == live)
    assert(probed.nonEmpty)
  }

  test("probe-only runs touch no corpus text: every file scan is an index table") {
    val probe = Dedup.probeDedupIndex(spark, indexRoot, batch, "doc_id", "text", thr)
    val scanned = probe.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten
    // the probe reads SOMETHING from disk (the three index tables) …
    assert(scanned.nonEmpty)
    // … and nothing outside the index root except the batch's own source
    val offenders = scanned.filterNot(_.contains("/index"))
      .filterNot(_.contains(Sf)) // the batch side IS allowed to read its text
    assert(offenders.isEmpty, s"unexpected scans: $offenders")
    assert(!scanned.exists(_.contains("/corpus")), "corpus text was scanned")
  }

  test("appendToDedupIndex: appended index probes identically to a full rebuild") {
    // build on half the corpus, append the other half — MinHash geometry
    // is per-document arithmetic (no trained state), so probe(append)
    // must equal probe(full rebuild) EXACTLY
    val half1 = corpus.filter(col("doc_id") % 2 === 0)
    val half2 = corpus.filter(col("doc_id") % 2 =!= 0)
    val appRoot = java.nio.file.Files.createTempDirectory("graft_didx_app")
      .toString + "/index"
    val fullRoot = java.nio.file.Files.createTempDirectory("graft_didx_app")
      .toString + "/index"
    Dedup.buildDedupIndex(half1, "doc_id", "text", n, bands, bandRows, appRoot)
    Dedup.appendToDedupIndex(spark, appRoot, half2, "doc_id", "text")
    Dedup.buildDedupIndex(corpus, "doc_id", "text", n, bands, bandRows, fullRoot)
    val viaAppend = Dedup.probeDedupIndex(spark, appRoot, batch, "doc_id", "text", thr)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val viaRebuild = Dedup.probeDedupIndex(spark, fullRoot, batch, "doc_id", "text", thr)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaAppend == viaRebuild)
    assert(viaAppend.nonEmpty)
    // the append was O(batch): every pre-existing index file is carried
    // by reference (manifest), none rewritten
    val shRoot = s"$appRoot/shingles"
    val v = graft.sources.VersionedTable.currentVersion(spark, shRoot).get
    val refs = graft.sources.VersionedTable.manifestOf(spark, shRoot, v).get
    assert(refs.exists(_.startsWith("v00000001/")),
      s"append rewrote the index instead of referencing it: $refs")
  }

  test("index refresh is transactional: a rebuild flips versions, old probe state intact") {
    val v1 = graft.sources.VersionedTable
      .currentVersion(spark, s"$indexRoot/norm_hashes").get
    Dedup.buildDedupIndex(corpus, "doc_id", "text", n, bands, bandRows, indexRoot)
    val v2 = graft.sources.VersionedTable
      .currentVersion(spark, s"$indexRoot/norm_hashes").get
    assert(v2 == v1 + 1)
    // probing after the refresh still matches
    val probed = Dedup.probeDedupIndex(spark, indexRoot, batch, "doc_id", "text", thr)
    assert(probed.count() == batch.count())
  }
}
