package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed workloads (SURVEY.md §5).
  *
  * Spark's AQE skew-join splits oversized post-shuffle partitions at
  * runtime, which covers most skew. Salting remains the right tool when
  * the skew is in an AGGREGATION key (AQE cannot split a single group) or
  * when a deterministic, planner-independent layout is required. The salt
  * here is derived from a caller-chosen high-cardinality spread column —
  * deterministic, so re-runs and retries partition identically.
  */
object Salting {

  /** Deterministic salt in [0, nSalts) from a spread column. */
  def saltOf(spread: Column, nSalts: Int): Column =
    pmod(abs(hash(spread)), lit(nSalts))

  /** Two-phase additive aggregation for skewed group keys: partial
    * count/sum per (key, salt) — spreading one hot group over nSalts
    * reducers — then final re-aggregation per key. Exact for additive
    * aggregates (count, sum; extend with min/max as needed). */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      spreadCol: String,
      nSalts: Int): DataFrame = {
    val keys = keyCols.map(col)
    df
      .withColumn("__salt", saltOf(col(spreadCol), nSalts))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(keys: _*)
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("sum_value"))
  }

  /** Salted equi-join for a skewed LEFT side: the left side gets a
    * deterministic salt; the right (small, but above the broadcast
    * threshold) side is replicated nSalts-fold; the join keys on
    * (key, salt) so one hot key spreads over nSalts reducers. Result
    * equals the plain equi-join. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      spreadCol: String,
      nSalts: Int): DataFrame = {
    val salted = skewed.withColumn("__salt", saltOf(col(spreadCol), nSalts))
    val replicated = other.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
