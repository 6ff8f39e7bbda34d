package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-vs-target reconciliation — the validation query every ETL
  * migration runs (and the check a user switching from the reference
  * stack to this engine runs FIRST): full-outer key diff of two
  * snapshots with per-row classification.
  *
  * The reference validates implicitly (dbt re-runs + manual checks);
  * here it is an operator: one full-outer hash join on the key, null-safe
  * column comparison, no collect. At 100 TB both sides hash-partition on
  * the key (co-partitioned/bucketed tables elide the shuffle), and the
  * output is usually filtered to `status != 'same'` — push that filter
  * below any sink.
  */
object Reconcile {

  /** Classify every key of `left` ∪ `right`:
    * `only_left` / `only_right` / `changed` (some compared column
    * differs, null-safe) / `same`. Output: id, status, then
    * `l_<col>`/`r_<col>` for each compared column. */
  def diff(
      left: DataFrame,
      right: DataFrame,
      key: String,
      compareCols: Seq[String]): DataFrame = {
    val l = left.select(
      (col(key).as("id") +: compareCols.map(c => col(c).as(s"l_$c"))) :+
        lit(true).as("__inl"): _*)
    val r = right.select(
      (col(key).as("id") +: compareCols.map(c => col(c).as(s"r_$c"))) :+
        lit(true).as("__inr"): _*)
    val anyDiff = compareCols
      .map(c => !(col(s"l_$c") <=> col(s"r_$c")))
      .reduce(_ || _)
    l.join(r, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__inl").isNull, lit("only_right"))
          .when(col("__inr").isNull, lit("only_left"))
          .when(anyDiff, lit("changed"))
          .otherwise(lit("same")))
      .drop("__inl", "__inr")
  }

  /** Roll the diff up to counts per status — the one-line migration
    * health check. */
  def summary(diffed: DataFrame): DataFrame =
    diffed.groupBy(col("status")).agg(count(lit(1)).as("n"))
}
