package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Pipeline
import graft.operators.{Components, Dedup, TextAnalysis}

/** End-to-end training-corpus curation — the pipeline a real LLM data run
  * ends with, composed from the individually-verified operators:
  *
  *   quality filter (t2) → exact dedup, agg form (d1) →
  *   df-capped n-gram near-dup pairs (d2b) → connected components +
  *   keep-canonical (d7) → curated corpus out.
  *
  * Expressed as a [[graft.Pipeline]] DAG (the engine-side contract of the
  * reference's Airflow hourly DAG, dags/retail_hourly_etl.py): dependency
  * gating, fail-fast, per-stage timing. Stage boundaries materialize with
  * an eager localCheckpoint because each intermediate feeds two downstream
  * consumers (the corpus side of the next join AND the survivor set) — at
  * 100 TB each boundary becomes a parquet table write, which also makes
  * every stage independently restartable.
  *
  * Scale shape: every stage is an operator whose plan is already
  * individually audited — hash-keyed groupBys (d1 agg form), 8-byte
  * posting-list joins with the df cap bounding the quadratic term (d2b),
  * and the hybrid label-propagation/star components (d7). Nothing in the
  * composition adds a shuffle beyond the stages' own.
  */
object CurateCorpus {

  final case class Result(curated: DataFrame, stages: Seq[Pipeline.StageResult])

  /** Run the curation DAG. Returns the curated corpus — one row per
    * surviving doc: (idCol, textCol, quality_score) — plus per-stage
    * results for observability. Throws if any stage fails (a half-curated
    * corpus must never look like a finished one). */
  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double,
      shingleN: Int,
      jaccardThreshold: Double,
      minDfCap: Long,
      dfCapDivisor: Long): Result = {
    var qualityKept: DataFrame = null
    var exactKept: DataFrame = null
    var pairs: DataFrame = null
    var curated: DataFrame = null

    val stages = Seq(
      Pipeline.Stage("quality_filter")(() => {
        val scores = TextAnalysis.quality(docs, idCol, textCol)
          .select(col(idCol), col("quality_score"))
          .filter(col("quality_score") >= minQuality)
        qualityKept = docs.select(col(idCol), col(textCol))
          .join(scores, Seq(idCol))
          .localCheckpoint()
      }),
      Pipeline.Stage("exact_dedup", Seq("quality_filter"))(() => {
        val canon = Dedup.exactGroupsAgg(qualityKept, idCol, textCol)
          .filter(col(idCol) === col("canonical_id"))
          .select(col(idCol))
        exactKept = qualityKept.join(canon, Seq(idCol), "left_semi")
          .localCheckpoint()
      }),
      Pipeline.Stage("neardup_pairs", Seq("exact_dedup"))(() => {
        // production df cap, relative to the CURRENT corpus size (d2b)
        val cap = math.max(minDfCap, exactKept.count() / dfCapDivisor)
        pairs = Dedup.ngramJaccardPairs(exactKept, idCol, textCol, shingleN,
          jaccardThreshold, Some(cap))
      }),
      Pipeline.Stage("keep_canonical", Seq("neardup_pairs"))(() => {
        curated = Components.keepCanonical(exactKept, idCol, pairs, "ida", "idb")
      }))

    val results = Pipeline.run(stages)
    results.foreach { r =>
      r.status match {
        case Pipeline.Succeeded => ()
        case Pipeline.Failed(e) =>
          throw new IllegalStateException(s"curation stage '${r.name}' failed", e)
        case Pipeline.Skipped(dep) =>
          throw new IllegalStateException(
            s"curation stage '${r.name}' skipped (failed dep '$dep')")
      }
    }
    Result(curated, results)
  }
}
