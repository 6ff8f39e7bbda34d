package graft.tools

import graft.operators.Dedup
import graft.sources.Tables

/** Candidate-volume measurement for the d11 multi-block-key fuzzy join:
  * `runMain graft.tools.FuzzyScale <sfDir>` prints one JSON line with the
  * pre-verification candidate-pair counts of the single-key form vs the
  * deduplicated three-key union (the number behind the "multi ≤ 3×
  * single" SCALING.md claim), at the d11 query key's own parameters
  * (prefixLen 40, blockLen 6). Run against [[ScaleData]] replicas for the
  * growth curve. */
object FuzzyScale {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val (single, multi) = Dedup.fuzzyCandidateCounts(
      Tables.documents(spark, sfDir), "doc_id", "text", 40, 6)
    val ratio = if (single > 0) multi.toDouble / single else Double.NaN
    println(s"""{"metric":"fuzzy_candidates","single":$single,"multi":$multi,"ratio":$ratio,"sf":"$sfDir"}""")
    spark.stop()
  }
}
