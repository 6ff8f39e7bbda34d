package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SparkSessionExtensions hook registering graft's native expressions as
  * SQL functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works and
  * plain SQL users get the codegen'd hot paths — plus TABLE functions
  * exposing the headline operators (`SELECT * FROM
  * graft_dedup_pairs('docs', 'doc_id', 'text', 3, 0.5, 0)`), so the whole
  * curation chain is drivable from pure SQL like the dbt models it
  * replaces — plus the [[BandJoinRewrite]] optimizer rule that turns
  * naive band-join predicates into bucketed equi-joins.
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
object GraftExtensions {
  /** Register the graft functions + optimizer rule on a live session (for
    * sessions built without `spark.sql.extensions`). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.ColumnBridge.installFunctions(spark, new GraftExtensions)
    if (!spark.experimental.extraOptimizations.contains(BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandJoinRewrite
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  // ---- table-function plumbing ----
  // Args must be literals (table/column names, thresholds). They are
  // evaluated at ANALYSIS time: the builder resolves the named table via
  // the active session and returns the operator's logical plan, which the
  // analyzer then resolves like any subquery.
  private def arg(e: Expression, fn: String): Any = e match {
    case l: Literal => l.value match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case v => v
    }
    case _ => throw new IllegalArgumentException(
      s"$fn expects literal arguments, got: $e")
  }
  private def str(a: Any): String = a.toString
  private def int(a: Any): Int = a.asInstanceOf[Number].intValue
  private def lng(a: Any): Long = a.asInstanceOf[Number].longValue
  private def dbl(a: Any): Double = a match {
    case n: Number => n.doubleValue
    case other => other.toString.toDouble
  }
  private def table(name: String): DataFrame = SparkSession.active.table(name)
  /** A versioned-table ROOT argument: a path passes through; a bare
    * identifier resolves through the named catalog when registered —
    * `graft_table('events')` and `graft_table('/lake/events')` are the
    * same read (symmetric with GraftSql.resolveNames). */
  private def rootArg(a: Any): String = {
    val s = str(a)
    if (s.contains("/")) s
    else graft.sources.GraftCatalog.resolve(SparkSession.active, s).getOrElse(s)
  }
  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  private def tvf(ext: SparkSessionExtensions, name: String, usage: String)(
      build: Seq[Any] => DataFrame): Unit =
    ext.injectTableFunction((
      FunctionIdentifier(name),
      info(name, usage),
      (args: Seq[Expression]) => plan(build(args.map(arg(_, name))))))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BandJoinRewrite)
    // the SQL DML face: DELETE/UPDATE/MERGE against a versioned-table
    // path, plus the OPTIMIZE/VACUUM maintenance verbs (GraftSql) —
    // injected at parse level, so plain spark.sql speaks them
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double-precision dot product of two float/double arrays"),
      (args: Seq[Expression]) => FloatDotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "graft_poly_hash(s) - rolling polynomial hash (base 31 mod 1e9+7) of a string's bytes"),
      (args: Seq[Expression]) => PolyHash(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash_array"),
      info("graft_poly_hash_array", "graft_poly_hash_array(arr) - polynomial hash of each string in an array"),
      (args: Seq[Expression]) => PolyHashArray(args(0))))

    // ---- operator surface as table functions (SQL-only driving) ----
    tvf(ext, "graft_quality",
      "graft_quality(table, idCol, textCol) - t2 per-doc quality scores") { a =>
      graft.operators.TextAnalysis.quality(table(str(a(0))), str(a(1)), str(a(2)))
    }
    tvf(ext, "graft_exact_groups",
      "graft_exact_groups(table, idCol, textCol) - d1 exact-dup groups (id, canonical_id, group_size)") { a =>
      graft.operators.Dedup.exactGroupsAgg(table(str(a(0))), str(a(1)), str(a(2)))
    }
    tvf(ext, "graft_dedup_pairs",
      "graft_dedup_pairs(table, idCol, textCol, n, threshold, dfCap) - d2/d2b n-gram Jaccard near-dup pairs; dfCap <= 0 disables the cap") { a =>
      graft.operators.Dedup.ngramJaccardPairs(table(str(a(0))), str(a(1)), str(a(2)),
        int(a(3)), dbl(a(4)), Some(lng(a(5))).filter(_ > 0L))
    }
    tvf(ext, "graft_components",
      "graft_components(pairsTable, srcCol, dstCol) - d7 connected components (id, component_id, component_size); the iterative propagation runs when the query is analyzed") { a =>
      graft.operators.Components.connectedComponents(table(str(a(0))), str(a(1)), str(a(2)))
    }
    tvf(ext, "graft_sample_stratified",
      "graft_sample_stratified(table, idCol, stratumCol, 'S1:300,S2:500', salt) - p2 deterministic stratified sample; rates in permille, absent strata dropped") { a =>
      val rates = str(a(3)).split(',').toSeq.map { kv =>
        val Array(k, v) = kv.split(':'); (k.trim, v.trim.toInt)
      }
      graft.operators.Sampling.stratified(SparkSession.active,
        table(str(a(0))), str(a(1)), str(a(2)), rates, str(a(4)))
    }
    tvf(ext, "graft_pii_redact",
      "graft_pii_redact(table, idCol, textCol) - t8 per-rule PII match counts + tag-redacted text") { a =>
      graft.operators.TextAnalysis.piiRedact(table(str(a(0))), str(a(1)), str(a(2)))
    }
    tvf(ext, "graft_changes",
      "graft_changes(tableRoot, fromVersion, toVersion) - the versioned table's stored change feed over a commit range, stamped with _commit_version") { a =>
      graft.sources.VersionedTable.readChanges(
        SparkSession.active, str(a(0)), lng(a(1)), lng(a(2)))
    }
    tvf(ext, "graft_table",
      "graft_table(tableRoot) - the versioned table's latest committed snapshot (manifest-aware)") { a =>
      graft.sources.VersionedTable.read(SparkSession.active, rootArg(a(0)))
    }
    tvf(ext, "graft_history",
      "graft_history(tableRoot) - the versioned table's commit log, newest first (DESCRIBE HISTORY as a table function)") { a =>
      graft.sources.VersionedTable.history(SparkSession.active, rootArg(a(0)))
    }
    tvf(ext, "graft_table_at",
      "graft_table_at(tableRoot, version) - TIME TRAVEL: an exact committed snapshot of the versioned table (the SQL face of readVersion)") { a =>
      graft.sources.VersionedTable.readVersion(
        SparkSession.active, rootArg(a(0)), lng(a(1)))
    }
    tvf(ext, "graft_table_asof",
      "graft_table_asof(tableRoot, 'yyyy-MM-dd HH:mm:ss') - TIME TRAVEL by TIMESTAMP: the snapshot current at that wall-clock time (Delta's TIMESTAMP AS OF; commit-marker clock)") { a =>
      val s = SparkSession.active
      graft.sources.VersionedTable.readVersion(s, rootArg(a(0)),
        graft.sources.VersionedTable.versionAsOf(s, rootArg(a(0)),
          java.sql.Timestamp.valueOf(str(a(1)))))
    }
    tvf(ext, "graft_quality_classifier",
      "graft_quality_classifier(table, idCol, textCol) - t9 hashed linear quality-classifier scores (n_feats, weight_sum, score, keep)") { a =>
      graft.operators.TextAnalysis.qualityClassifier(
        table(str(a(0))), str(a(1)), str(a(2)))
    }
    tvf(ext, "graft_mix_interleave",
      "graft_mix_interleave(table, idCol, stratumCol, 'S1:100,S2:50', salt) - p6 stride-scheduled mixture interleave; weights per stratum, pos is the training-order key") { a =>
      val weights = str(a(3)).split(',').toSeq.map { kv =>
        val Array(k, v) = kv.split(':'); (k.trim, v.trim.toInt)
      }
      graft.operators.Sampling.mixInterleave(SparkSession.active,
        table(str(a(0))), str(a(1)), str(a(2)), weights, str(a(4)))
    }
    tvf(ext, "graft_fuzzy_join",
      "graft_fuzzy_join(table, idCol, textCol, prefixLen, blockLen, maxDist) - d11 blocked edit-distance pairs (ida, idb, edit_dist)") { a =>
      graft.operators.Dedup.fuzzyJoinPairs(table(str(a(0))), str(a(1)), str(a(2)),
        lng(a(3)).toInt, lng(a(4)).toInt, lng(a(5)).toInt)
    }
    tvf(ext, "graft_knn_pq",
      "graft_knn_pq(queriesTable, corpusTable, idCol, vecCol, k) - s4 product-quantization ANN (4x16-dim codebooks, ADC shortlist 4k, exact rerank; rejects non-64-dim vectors)") { a =>
      val k = lng(a(4)).toInt
      graft.operators.Similarity.pqTopK(
        table(str(a(0))), table(str(a(1))), str(a(2)), str(a(3)),
        k, nSub = 4, subDim = 16, kPerSub = 16, kmeansIters = 2,
        shortlist = 4 * k)
    }
    tvf(ext, "graft_knn_ivfpq",
      "graft_knn_ivfpq(queriesTable, corpusTable, idCol, vecCol, k, nCells, nProbes) - s5 IVF-PQ ANN: cell-probed ADC code scan + exact rerank (4x16-dim codebooks; rejects non-64-dim vectors)") { a =>
      val k = lng(a(4)).toInt
      graft.operators.Similarity.ivfPqTopK(
        table(str(a(0))), table(str(a(1))), str(a(2)), str(a(3)),
        k, lng(a(5)).toInt, lng(a(6)).toInt, coarseIters = 2,
        nSub = 4, subDim = 16, kPerSub = 16, pqIters = 2,
        shortlist = 4 * k)
    }
  }
}
