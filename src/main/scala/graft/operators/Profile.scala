package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality statistics a pipeline computes
  * before trusting a new source (row count, null rate, exact distinct
  * count, min/max per column), the operational sibling of
  * [[graft.sources.Contracts]]: contracts enforce what you declared,
  * profiling tells you what to declare.
  *
  * One independent aggregation branch PER COLUMN, unioned into a
  * long-format frame (column, n_rows, n_nulls, n_distinct, min_value,
  * max_value) whose shape is independent of the profiled schema.
  *
  * Why per-column rather than one wide multi-distinct aggregate: the
  * combined form Expands every row once per distinct column and then
  * sort-aggregates on ALL profiled columns as one composite key
  * (string/timestamp min-max buffers are not hash-aggregable) —
  * measured ~5s for a 150k-row, 5-column profile. Per-column branches
  * each scan ONLY their own column (columnar pruning makes total bytes
  * read identical to one wide scan), aggregate on a single-column key,
  * and run concurrently within one job. At extreme cardinality swap
  * `count_distinct` for `approx_count_distinct` (HLL) per branch.
  * No collect anywhere.
  */
object Profile {

  /** Profile `cols` of `df`. min/max are rendered as strings so the
    * output schema is type-uniform across profiled columns. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionAll _)
}
