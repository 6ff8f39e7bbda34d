package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality statistics a pipeline computes
  * before trusting a new source (row count, null rate, exact distinct
  * count, min/max per column), the operational sibling of
  * [[graft.sources.Contracts]]: contracts enforce what you declared,
  * profiling tells you what to declare.
  *
  * One aggregation pass over the table produces every metric; the
  * per-column results are then exploded into a long-format frame
  * (column, n_rows, n_nulls, n_distinct, min_value, max_value) whose
  * shape is independent of the profiled schema.
  *
  * Scale: the multi-`count(distinct)` plans through Spark's Expand (one
  * input row per distinct-column, partially aggregated map-side — the
  * exact path, same trade as q20); at extreme cardinality swap in
  * `approx_count_distinct` (HLL) per column. min/max/counts are plain
  * algebraic aggregates. No collect; the wide→long pivot is an explode
  * of a single aggregate row.
  */
object Profile {

  /** Profile `cols` of `df` in one pass. min/max are rendered as strings
    * so the output schema is type-uniform across profiled columns. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val metrics = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      count_distinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    val wide = df.agg(metrics.head, metrics.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").as("min_value"),
      col(s"__mx_$c").as("max_value"))): _*)
    wide.select(explode(entries).as("__p")).select(col("__p.*"))
  }
}
