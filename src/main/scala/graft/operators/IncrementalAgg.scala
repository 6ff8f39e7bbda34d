package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregates (materialized-view maintenance)
  * driven by the merge CHANGE FEED.
  *
  * The reference recomputes its mart aggregations from the full table on
  * every hourly run (dbt `retail_transactions.sql` feeding aggregation
  * models). At 100 TB a full re-aggregation per run is the dominant cost;
  * the Spark-native answer is to maintain the aggregate from the O(delta)
  * change feed the merge already produces ([[IncrementalMerge.changeFeed]],
  * stored per-version by [[graft.sources.VersionedTable.writeChanges]]):
  *
  *   maintained = merge(old_agg, Δ(changes))      — O(delta + |groups|)
  *
  * instead of `recompute(table)` — O(table). The algebra is restricted to
  * the self-maintainable measures (count and sum — group-wise abelian, so
  * update pre-images subtract and post-images add, and a row whose group
  * KEY changes simply subtracts from the old group and adds to the new
  * one). min/max are deliberately NOT offered: they are not maintainable
  * under deletes without keeping per-group value multisets.
  *
  * Exactness: counts are longs and sums must be exact types (long /
  * decimal) — the maintained result is then BIT-IDENTICAL to a full
  * recompute, which is exactly what the q26 oracle checks (it recomputes
  * the rollup from the merged state in SQL; the Spark side never
  * materializes the merged table's aggregate directly).
  *
  * Scale: Δ(changes) is one map-side-combined shuffle of the delta rows on
  * the group keys; the outer merge join is |groups|-sized (dashboard
  * cardinality, usually broadcastable). Nothing touches untouched rows.
  */
object IncrementalAgg {

  /** `_change_type` → contribution sign: inserts and update post-images
    * add, update pre-images subtract (delete images would subtract the
    * same way — the feed's `dropRemoved` variant). */
  private val signExpr: Column =
    when(col("_change_type") === "update_preimage", lit(-1L)).otherwise(lit(1L))

  /** Full rollup of `rows`: `count(*) AS n_rows` plus `sum(expr) AS name`
    * per measure. The bootstrap aggregate (run once), and the shape
    * [[applyChanges]] maintains thereafter. */
  def rollup(
      rows: DataFrame,
      keys: Seq[String],
      measures: Seq[(String, Column)]): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        measures.map { case (n, e) => sum(e).as(n) }: _*)

  /** Merge a change-feed batch into a maintained aggregate. `agg` must
    * have the [[rollup]] shape over the same `keys`/`measures`; `changes`
    * is a [[IncrementalMerge.changeFeed]] output (row-image columns +
    * `_change_type`). Groups whose maintained count reaches 0 are
    * dropped, so group-key churn cannot leak empty groups. */
  def applyChanges(
      agg: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      measures: Seq[(String, Column)]): DataFrame = {
    val measureNames = measures.map(_._1)
    val deltas = changes
      .select(keys.map(col) ++ (signExpr.as("__sign") +:
        measures.map { case (n, e) => e.as(n) }): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        measureNames.map(n => sum(col(n) * col("__sign")).as(s"__d_$n")): _*)
    // NULL-SAFE join on the group keys: groupBy puts all null-key rows in
    // ONE group, so the merge must match them too (a plain equi-join would
    // emit two rows for a null-valued group key — e.g. a day derived from
    // a null timestamp — breaking maintenance ≡ recompute)
    val a = agg.alias("__a")
    val d = deltas.alias("__d")
    val cond = keys.map(k => col(s"__a.$k") <=> col(s"__d.$k")).reduce(_ && _)
    a.join(d, cond, "full_outer")
      .select(keys.map(k => coalesce(col(s"__a.$k"), col(s"__d.$k")).as(k)) ++
        ((coalesce(col("__a.n_rows"), lit(0L)) + coalesce(col("__d.__dn"), lit(0L)))
          .as("n_rows") +:
          measureNames.map(n =>
            (coalesce(col(s"__a.$n"), lit(0L)) + coalesce(col(s"__d.__d_$n"), lit(0L)))
              .as(n))): _*)
      .filter(col("n_rows") > 0)
  }
}
